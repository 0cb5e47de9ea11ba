"""Similarity search over an embedding column (``list<float>``).

- brute-force cosine top-k: the baseline — numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, process-local cache), partial
  top-k per batch, final merge of the tiny partials on the driver.
- LSH-bucketed (random hyperplane signs) variant: the scale path — bucket
  both corpus and queries, search only colliding buckets.
- embedding cosine near-dup: all pairs above a cosine threshold via the
  same bucketing.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _to_matrix(col) -> np.ndarray:
    """list<float> Arrow column → (n, d) float64 matrix."""
    lists = col.to_pylist()
    return np.asarray(lists, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Top-k cosine neighbours for each query row.

    Returns a Dataset (query_idx, vec_id, score) with exactly k rows per
    query. Per-batch partial top-k keeps the shuffle tiny: each batch emits
    k·n_queries candidate rows, merged by one small groupby on the driver.
    """
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        from de_ray.state.broadcast import get_broadcast

        qm = get_broadcast(q_ref)  # (nq, d)
        m = _normalize(_to_matrix(batch.column(emb_col)))  # (n, d)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        scores = qm @ m.T  # (nq, n)
        kk = min(k, m.shape[0])
        top = np.argpartition(-scores, kth=kk - 1, axis=1)[:, :kk]
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(qm.shape[0]):
            sel = top[qi]
            rows_q.extend([qi] * len(sel))
            rows_id.extend(ids[sel].tolist())
            rows_s.extend(scores[qi, sel].tolist())
        return pa.table(
            {
                "query_idx": pa.array(rows_q, pa.int64()),
                "vec_id": pa.array(rows_id, pa.int64()),
                "score": pa.array(rows_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=16 * 1024)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_idx").map_groups(final, batch_format="pandas")


class HyperplaneLSH:
    """Random-hyperplane sign buckets (fixed seed → same planes everywhere)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_planes, dim))

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes.T) > 0  # (n, n_planes)
        return (signs @ (1 << np.arange(signs.shape[1]))).astype(np.int64)


def lsh_topk(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Bucketed ANN: search only batches' rows whose LSH bucket matches a
    query bucket. Recall < 1 by design; the scale path for 10^9+ rows."""
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    lsh = HyperplaneLSH(q.shape[1], n_planes)
    q_buckets = lsh.bucket_of(q)
    q_ref = ray.put((q, q_buckets, lsh.planes))

    def partial(batch: pa.Table) -> pa.Table:
        from de_ray.state.broadcast import get_broadcast

        qm, qb, planes = get_broadcast(q_ref)
        m = _normalize(_to_matrix(batch.column(emb_col)))
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        signs = (m @ planes.T) > 0
        buckets = (signs @ (1 << np.arange(signs.shape[1]))).astype(np.int64)
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = buckets == qb[qi]
            if not mask.any():
                continue
            sub = m[mask]
            sub_ids = ids[mask]
            scores = sub @ qm[qi]
            kk = min(k, len(scores))
            sel = np.argpartition(-scores, kth=kk - 1)[:kk]
            rows_q.extend([qi] * kk)
            rows_id.extend(sub_ids[sel].tolist())
            rows_s.extend(scores[sel].tolist())
        return pa.table(
            {
                "query_idx": pa.array(rows_q, pa.int64()),
                "vec_id": pa.array(rows_id, pa.int64()),
                "score": pa.array(rows_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=16 * 1024)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_idx").map_groups(final, batch_format="pandas")


def cosine_near_dup_pairs(
    ds,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """All (a < b) pairs with cosine ≥ threshold, via LSH bucket groupby —
    only same-bucket pairs are compared (near-identical vectors collide with
    high probability)."""

    def with_bucket(batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch.column(emb_col)))
        lsh = HyperplaneLSH(m.shape[1], n_planes)
        b = lsh.bucket_of(m)
        return pa.table(
            {
                "vec_id": batch.column(id_col),
                "embedding": batch.column(emb_col),
                "bucket": pa.array(b, pa.int64()),
            }
        )

    bucketed = ds.map_batches(with_bucket, batch_format="pyarrow", batch_size=16 * 1024)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        m = _normalize(np.asarray(g["embedding"].tolist(), dtype=np.float64))
        ids = g["vec_id"].to_numpy()
        scores = m @ m.T
        ia, ib = np.triu_indices(len(g), k=1)
        mask = scores[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids[ia[mask]], ids[ib[mask]]),
                "vec_b": np.maximum(ids[ia[mask]], ids[ib[mask]]),
                "score": scores[ia[mask], ib[mask]],
            }
        )

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
