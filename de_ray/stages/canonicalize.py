"""Canonicalization / exact triple dedup (D2/D5) — the first wide stage.

After entity linking, distinct surface forms in one document can collapse to
the same canonical IRI, and the same triple can be asserted by many pages —
the graph must contain each (subj, pred, obj, graph) once (HDT build dedups
on sorted unique triples; reference behavior visible in
tests/test-commands.rs:300-326 where unioned inputs answer without dupes).

Scale design (100 TB): a naive ``groupby([subj,pred,obj])`` shuffles every
row on wide string keys. Instead:

1. **per-batch local dedup** inside ``map_batches`` (combiner — cuts the
   shuffle volume before it happens; most dupes are doc-local),
2. **stable int64 bucket key** = deterministic string hash of the triple
   modulo ``num_buckets`` (pandas ``hash_pandas_object``, fixed hash key →
   identical across processes/nodes; never Python ``hash()`` which is
   per-process salted),
3. ``groupby(bucket).map_groups(drop_duplicates)`` — the shuffle moves rows
   keyed by a small int; dedup within each bucket is vectorized pandas.

Bucket count is the parallelism knob: hub-entity skew does NOT concentrate
here because the key hashes the whole triple, which is near-uniform.
"""

from __future__ import annotations

import pandas as pd

KEY_COLS = ["subj", "pred", "obj", "graph"]


def stable_row_hash(df: pd.DataFrame, cols) -> pd.Series:
    """Deterministic uint64 per row from the given string columns."""
    key = df[cols[0]].astype(str)
    for c in cols[1:]:
        key = key + "\x00" + df[c].astype(str)
    return pd.util.hash_pandas_object(key, index=False)


class _LocalDedupAndBucket:
    """Bucket on the FIRST key column only (e.g. ``subj``): duplicate rows
    agree on every key column, so same-first-column bucketing is still a
    correct dedup partition — and it PRESERVES subject locality, which keeps
    downstream per-batch partials (dictionary role discovery, adjacency
    packing) small. Whole-row hashing scattered each document's triples
    across all buckets and inflated later combiner outputs ~18×."""

    def __init__(self, num_buckets: int, cols):
        self.num_buckets = num_buckets
        self.cols = cols

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=self.cols)
        df = df.assign(
            _bucket=(stable_row_hash(df, self.cols[:1]) % self.num_buckets).astype("int64")
        )
        return df


def _dedup_group(g: pd.DataFrame, cols) -> pd.DataFrame:
    return g.drop_duplicates(subset=cols).drop(columns=["_bucket"])


DRIVER_FINAL_LIMIT = 500_000


def canonicalize_stage(ds, num_buckets: int = 64, cols=None,
                       driver_final_limit: int = DRIVER_FINAL_LIMIT):
    """Global exact dedup; returns distinct rows (keyed on ``cols``).

    The per-batch local dedup (combiner) always runs; the global final is
    size-adaptive: small survivor sets merge in one pandas task (Ray's
    shuffle has a multi-second fixed floor), large ones take the
    bucket-groupby shuffle. Both paths are exact — the limit only trades
    latency, and at 10^12-doc scale the distributed path always runs.
    """
    if cols is not None:
        cols = list(cols)
    else:
        sch = ds.schema()  # None for a fully-empty schema-less Dataset
        if sch is None:
            return ds  # nothing to dedup
        cols = [c for c in KEY_COLS if c in sch.names]
    import ray.data as rd

    local = ds.map_batches(
        lambda df: df.drop_duplicates(subset=cols),
        batch_format="pandas",
        batch_size=128 * 1024,
    ).materialize()
    if local.count() <= driver_final_limit:
        from de_ray.functions.agg import (
            from_pandas_keep_schema,
            to_pandas_keep_schema,
        )

        df = to_pandas_keep_schema(local)
        if df.shape[1] == 0:  # fully-empty input: typed empty result
            df = pd.DataFrame(columns=cols)
        df = df.drop_duplicates(subset=cols).reset_index(drop=True)
        return from_pandas_keep_schema(df)
    bucketed = local.map_batches(
        _LocalDedupAndBucket(num_buckets, cols),
        batch_format="pandas",
        batch_size=128 * 1024,
    )
    return bucketed.groupby("_bucket").map_groups(
        lambda g: _dedup_group(g, cols), batch_format="pandas"
    )
