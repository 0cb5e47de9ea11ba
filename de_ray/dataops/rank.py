"""Exact global ranking and NTILE bucketing as distributed operators.

SQL surface covered: ``ROW_NUMBER() OVER (ORDER BY ...)`` and
``NTILE(n) OVER (ORDER BY ...)`` — global order statistics by *position*
(complementing ``dataops.stats.quantile_disc``, which is by *value*).

Distributed shape (same as the dictionary dense-rank final, SURVEY §7.4):
one range-partitioned sort on the key (the only all-to-all), per-block row
counts collected on the driver (a tiny metadata barrier — O(blocks) ints,
never rows), then a zero-shuffle per-block pass attaches
``rank = block offset + local index``. NTILE bucket ids derive
arithmetically from the rank with the SQL fill rule (the first
``total % n`` buckets get one extra row), so a DuckDB window oracle can
gate the result exactly. Ties must be broken by including a unique column
in ``by`` — otherwise block boundaries make the rank of tied rows
nondeterministic (same caveat as SQL's ROW_NUMBER).
"""

from __future__ import annotations

from typing import List, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _coerce_table(tbl) -> pa.Table:
    """Internal block refs may hold Arrow tables, record batches, or
    pandas DataFrames (from_pandas-backed datasets) — normalize."""
    if isinstance(tbl, pa.Table):
        return tbl
    import pandas as pd

    if isinstance(tbl, pd.DataFrame):
        return pa.Table.from_pandas(tbl, preserve_index=False)
    return pa.Table.from_batches([tbl])


@ray.remote
def _block_nrows(tbl) -> int:
    return _coerce_table(tbl).num_rows


@ray.remote
def _attach_rank(tbl, offset: int, total: int, n_tiles, out_col: str) -> pa.Table:
    t = _coerce_table(tbl)
    ranks = np.arange(offset, offset + t.num_rows, dtype="int64")
    if n_tiles is None:
        return t.append_column(out_col, pa.array(ranks + 1, pa.int64()))
    q, extra = divmod(total, n_tiles)
    if q == 0:
        # fewer rows than tiles: SQL NTILE gives one row per bucket 1..total
        buckets = ranks + 1
    else:
        big = extra * (q + 1)
        buckets = np.where(ranks < big, ranks // (q + 1), extra + (ranks - big) // q) + 1
    return t.append_column(out_col, pa.array(buckets, pa.int64()))


def _sorted_with_offsets(
    ds: rd.Dataset,
    by: Union[str, List[str]],
    descending: bool,
    n_tiles,
    out_col: str,
) -> rd.Dataset:
    keys = [by] if isinstance(by, str) else list(by)
    s = ds.sort(keys, descending=descending).materialize()
    # block row counts from METADATA (iter_internal_ref_bundles preserves
    # block order) — no per-block task wave just to read num_rows
    refs, counts = [], []
    missing = False
    for bundle in s.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            refs.append(ref)
            counts.append(meta.num_rows)
            missing = missing or meta.num_rows is None
    if missing:  # metadata gap: fall back to the task count (rare)
        counts = ray.get([_block_nrows.remote(r) for r in refs])
    total = int(sum(counts))
    offset = 0
    new_refs = []
    for r, c in zip(refs, counts):
        new_refs.append(_attach_rank.remote(r, offset, total, n_tiles, out_col))
        offset += c
    return rd.from_arrow_refs(new_refs)


def global_rank(
    ds: rd.Dataset,
    by: Union[str, List[str]],
    *,
    descending: bool = False,
    out_col: str = "rank",
) -> rd.Dataset:
    """1-based global dense position: ROW_NUMBER() OVER (ORDER BY by)."""
    return _sorted_with_offsets(ds, by, descending, None, out_col)


def ntile(
    ds: rd.Dataset,
    by: Union[str, List[str]],
    n: int,
    *,
    descending: bool = False,
    out_col: str = "bucket",
) -> rd.Dataset:
    """NTILE(n) OVER (ORDER BY by): equal-count buckets 1..n, the first
    ``total % n`` buckets one row larger (SQL fill rule)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return _sorted_with_offsets(ds, by, descending, int(n), out_col)
