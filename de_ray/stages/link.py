"""Entity linking stage (A3/J4): surface-form IRI → canonical entity IRI.

An actor-pool ``map_batches`` stage holding a shared alias dictionary. The
dictionary is built once on the driver, broadcast via ``ray.put`` (ONE copy
in the object store, zero-copy read by every actor), and loaded per actor in
``__init__`` — never re-shipped per batch (reference's shared-state pattern:
``AggregateHdtSnapshot`` loaded once and reused, src/sparql.rs:78-118).

The canonical alias table is deterministic so the DuckDB oracle can inline
it as a VALUES list.
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa
import pyarrow.compute as pc

from de_ray.stages.triples import ENT

# surface token → canonical token (deterministic; oracle SQL mirrors this
# as a CASE expression). Groups chosen over the synthetic corpus vocabulary.
ALIAS_GROUPS: Dict[str, str] = {
    "agg": "aggregate",
    "dup": "duplicate",
    "big": "large",
    "fast": "quick",
    "sort": "order",  # 'sort' and 'order' mentions merge into ent:order
    "line": "row",    # 'line' and 'row' merge into ent:row
}


def build_alias_dict() -> Dict[str, str]:
    """Full IRI → IRI alias map (surface entity IRI → canonical entity IRI)."""
    return {ENT + s: ENT + c for s, c in ALIAS_GROUPS.items()}


class EntityLinker:
    """map_batches(EntityLinker, concurrency=N) over triple rows.

    Rewrites subject and object IRIs through the alias dictionary using a
    vectorized Arrow dictionary-encode + take: each batch column is
    dict-encoded, only the (few) distinct values are looked up in Python,
    then re-expanded — O(distinct) lookups per batch instead of O(rows).
    """

    def __init__(self, alias_ref=None, alias: Optional[Dict[str, str]] = None):
        if alias is not None:
            self.alias = alias
        elif alias_ref is not None:
            import ray

            self.alias = ray.get(alias_ref)  # zero-copy object-store read
        else:
            self.alias = build_alias_dict()

    def _map_col(self, col: pa.ChunkedArray) -> pa.Array:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        enc = pc.dictionary_encode(arr)
        dict_vals = enc.dictionary.to_pylist()
        mapped = [self.alias.get(v, v) for v in dict_vals]
        if mapped == dict_vals:
            return arr
        new_dict = pa.array(mapped, type=pa.large_string())
        return pc.take(new_dict, enc.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        for name in ("subj", "obj"):
            idx = batch.schema.get_field_index(name)
            batch = batch.set_column(idx, name, self._map_col(batch.column(name)))
        return batch


def link_entities_stage(ds, alias: Optional[Dict[str, str]] = None, concurrency=(1, 8),
                        batch_size: Optional[int] = None, compute: str = "tasks"):
    """Apply entity linking over a triples Dataset with a broadcast alias dict.

    ``compute="tasks"`` (default): stateless tasks reading the alias dict
    through the process-local broadcast cache — fuses with neighbouring map
    stages. ``compute="actors"``: explicit actor pool (the pattern for
    heavyweight linkers holding big in-memory indexes).

    ``batch_size=None`` (whole blocks) is deliberate on the tasks path:
    the lookup is a vectorized dict-encode that handles any batch size,
    and a large fixed batch_size makes the FUSED chain bundle that many
    *input* rows per task — a 64k floor was silently capping the
    flagship's read→extract→triples→link chain at ceil(n_docs/65536)
    tasks (8 tasks for the 500k-doc bench corpus, 2× the chain wall on
    32 CPUs).
    """
    import ray

    alias_ref = ray.put(alias if alias is not None else build_alias_dict())
    if compute == "actors":
        return ds.map_batches(
            EntityLinker,
            fn_constructor_kwargs={"alias_ref": alias_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
        )

    def link_batch(batch: pa.Table) -> pa.Table:
        from de_ray.state.broadcast import get_broadcast

        linker = get_broadcast(alias_ref, transform=lambda a: EntityLinker(alias=a))
        return linker(batch)

    return ds.map_batches(
        link_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
