"""Hash-join hygiene helpers.

Ray Data's hash ``Dataset.join`` crashes when a downstream join partition
is fed only SCHEMA-LESS empty blocks (its aggregator builds ``pa.table({})``
and key resolution fails with "No match ... on left side of the join").
Empty-schema blocks appear as the empty partitions of an upstream join's
output — and ``map_batches`` does NOT run its UDF on them, so they cannot
be normalized in-stream. The fix is to drop them by block metadata before
the next join consumes the dataset.
"""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import ray.data as rd


def drop_schemaless_empties(ds: rd.Dataset, empty_table: Callable[[], pa.Table]) -> rd.Dataset:
    """Materialize and rebuild ``ds`` without its 0-row schema-less blocks.

    ``empty_table`` supplies a correctly-typed empty table when every block
    is empty (so downstream schema resolution still works).
    """
    ds = ds.materialize()
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return rd.from_arrow(empty_table())
    return rd.from_arrow_refs(refs)


def empty_table_factory(schema: Dict[str, pa.DataType]) -> Callable[[], pa.Table]:
    return lambda: pa.table({c: pa.array([], ty) for c, ty in schema.items()})
