"""Deduplication operators over a documents table.

- exact: content-hash partition + per-group min doc_id (one shuffle over
  hashes, never over full texts)
- MinHash + LSH: shingle → minhash sig per batch → explode to
  (band, band_hash) rows → groupby bands → candidate pairs → Jaccard verify
- SimHash: 64-bit weighted token hash; near-dups share the hash (or a band)
- n-gram Jaccard: verification kernel for candidate pairs
- embedding cosine near-dup: see de_ray.dataops.similarity

All hashing is deterministic (md5-derived or fixed-seed numpy), never
Python ``hash()``.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds,
    key_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    driver_final_limit: int = 500_000,
):
    """Keep the min-id row per distinct key. Per-batch local min (combiner)
    always runs, so the shuffle moves one row per (batch, key); the final is
    size-adaptive — one pandas task for small survivor sets, a stable-hash
    bucket groupby (vectorized within each bucket, never one Python call per
    key) at scale."""

    def local_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col, kind="mergesort").drop_duplicates(
            subset=[key_col], keep="first"
        )

    part = ds.map_batches(local_min, batch_format="pandas", batch_size=64 * 1024).materialize()
    if part.count() <= driver_final_limit:
        df = part.to_pandas()
        out = local_min(df).reset_index(drop=True)
        import ray.data as rd

        return rd.from_pandas(out)

    from de_ray.stages.canonicalize import stable_row_hash

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _bucket=(stable_row_hash(df, [key_col]) % num_buckets).astype("int64")
        )

    bucketed = part.map_batches(bucketize, batch_format="pandas")

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        return local_min(g).drop(columns=["_bucket"])

    return bucketed.groupby("_bucket").map_groups(bucket_min, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingles / minhash
# ---------------------------------------------------------------------------


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingle hash set (uint64)."""
    toks = [t for t in text.split(" ") if t]
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([_stable_u64(s) for s in shingles], dtype=np.uint64))


_MERSENNE = (1 << 61) - 1


class MinHasher:
    """n_perm universal-hash minhash; coefficients from a fixed seed
    (once per actor in __init__). Hashes use uint64 wraparound arithmetic —
    deterministic everywhere and fully vectorized (no Python-object math)."""

    def __init__(self, n_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 1 << 62, size=n_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.randint(0, 1 << 62, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (n_perm, n_shingles) multiply-shift hashes, uint64 wraparound
            h = self.a[:, None] * shingles[None, :] + self.b[:, None]
        return h.min(axis=1)


class MinHashLSH:
    """map_batches stage: text → (doc_id, band, band_hash) exploded rows."""

    def __init__(self, n_perm: int = 64, bands: int = 16, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert n_perm % bands == 0
        self.mh = MinHasher(n_perm)
        self.bands = bands
        self.rows_per_band = n_perm // bands
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: List[int] = []
        band_out: List[int] = []
        bh_out: List[int] = []
        for doc_id, text in zip(
            batch.column(self.id_col).to_pylist(), batch.column(self.text_col).to_pylist()
        ):
            sig = self.mh.signature(shingle_set(text, self.k))
            for b in range(self.bands):
                band = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                bh = _stable_u64(",".join(map(str, band.tolist())))
                ids_out.append(doc_id)
                band_out.append(b)
                bh_out.append(bh & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "band": pa.array(band_out, pa.int32()),
                "band_hash": pa.array(bh_out, pa.int64()),
            }
        )


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = shingle_set(text_a, k), shingle_set(text_b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def minhash_candidate_pairs(ds, n_perm: int = 64, bands: int = 16):
    """documents Dataset → candidate near-dup pairs (doc_a < doc_b) from LSH
    band collisions. One shuffle on (band, band_hash)."""
    sigs = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"n_perm": n_perm, "bands": bands},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )

    # shuffle on a small int bucket (not per-band groups — thousands of tiny
    # map_groups calls); the per-bucket kernel handles its many band groups
    # with one vectorized pandas groupby.
    num_buckets = 32

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df["_bucket"] = (df["band_hash"] % num_buckets).astype("int64")
        return df

    sigs = sigs.map_batches(bucketize, batch_format="pandas")

    def pairs_from_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a: List[int] = []
        out_b: List[int] = []
        for _, sub in g.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(sub["doc_id"].unique())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.extend(ids[ia].tolist())
            out_b.extend(ids[ib].tolist())
        return pd.DataFrame(
            {"doc_a": pd.Series(out_a, dtype="int64"), "doc_b": pd.Series(out_b, dtype="int64")}
        ).drop_duplicates()

    cand = sigs.groupby("_bucket").map_groups(pairs_from_bucket, batch_format="pandas")
    from de_ray.stages.canonicalize import canonicalize_stage

    return canonicalize_stage(cand, cols=["doc_a", "doc_b"])


def minhash_dedup(ds, threshold: float = 0.8, n_perm: int = 64, bands: int = 16):
    """Full near-dup pipeline: LSH candidates → Jaccard verify → connected
    components (min-label propagation) → (doc_id, cluster_id) rows.

    The label propagation runs as driver-coordinated rounds over a pairs
    DataFrame — candidates are a tiny fraction of the corpus (documented
    assumption; at 10^12 docs the rounds stay groupby jobs per round).
    """
    pairs = minhash_candidate_pairs(ds, n_perm=n_perm, bands=bands).to_pandas()
    cand_ids = set(pairs["doc_a"]) | set(pairs["doc_b"]) if len(pairs) else set()
    # pull ONLY candidate texts to the driver (candidates << corpus)
    if cand_ids:
        texts_df = ds.map_batches(
            lambda df: df[df["doc_id"].isin(cand_ids)][["doc_id", "text"]],
            batch_format="pandas",
        ).to_pandas()
        text_of = dict(zip(texts_df["doc_id"], texts_df["text"]))
    if len(pairs) == 0:
        return ds.map_batches(
            lambda df: df[["doc_id"]].assign(cluster_id=df["doc_id"]),
            batch_format="pandas",
        )
    keep = [
        jaccard(text_of[a], text_of[b]) >= threshold
        for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    ]
    verified = pairs[pd.Series(keep, index=pairs.index)]
    # union-find on the (small) verified pair set
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(verified["doc_a"], verified["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cluster = {d: find(d) for d in set(verified["doc_a"]) | set(verified["doc_b"])}

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "cluster_id": df["doc_id"].map(lambda d: cluster.get(d, d)).astype("int64"),
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


class SimHash:
    """64-bit simhash over whitespace tokens (map_batches stage)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        vals, counts = np.unique(np.array(toks), return_counts=True)
        for tok, cnt in zip(vals, counts):
            h = _stable_u64(tok)
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), cnt, -cnt)
        bits = (acc > 0).astype(np.uint64)
        return int((bits << np.arange(64, dtype=np.uint64)).sum() & np.uint64(0x7FFFFFFFFFFFFFFF))

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash64(t) for t in batch.column(self.text_col).to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "simhash": pa.array(hs, pa.int64()),
            }
        )


def simhash_stage(ds, concurrency=(1, 8)):
    return ds.map_batches(
        SimHash, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
