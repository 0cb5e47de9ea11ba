"""Test-set decontamination: flag training documents that share any word
n-gram with a held-out evaluation set.

Standard LLM training-data hygiene (GPT-3 appendix C / Gopher-style
13-gram overlap scan). The evaluation side is tiny relative to the
training corpus, so its distinct n-gram hashes are collected once,
deduplicated, and shipped through the object store with ``ray.put``;
every training batch then runs a vectorized sorted-membership probe
(``np.searchsorted``) against the broadcast array — the 100-TB training
side streams through ``map_batches`` with NO shuffle and no per-row
Python.

The reference engine has no decontamination operator; this belongs to
the training-data extension surface alongside dedup/similarity
(SURVEY.md §2.10-style extensions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from de_ray.dataops.dedup import _POLY_C, _hash_token_array
from de_ray.state.broadcast import get_broadcast

# test sets are held-out eval suites — thousands of docs, not billions.
# The guard fails loudly rather than silently degrading (VERDICT r2 style).
TEST_GRAM_LIMIT = 50_000_000


def _batch_ngrams(texts, n: int):
    """(values, offsets): concatenated per-doc word n-gram hashes (uint64)
    with ``offsets`` delimiting each doc's span. STRICT windows — a doc
    with fewer than ``n`` tokens contributes no gram (exact parity with a
    SQL oracle that only enumerates full windows). One vectorized
    token-hash pass + n-1 vectorized polynomial combines."""
    tok_lists = [t.split() for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    total = int(lens.sum())
    all_toks = np.empty(total, dtype=object)
    pos = 0
    for toks in tok_lists:
        all_toks[pos : pos + len(toks)] = toks
        pos += len(toks)
    th = _hash_token_array(all_toks)

    counts = np.where(lens >= n, lens - n + 1, 0)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    if total < n:
        return np.empty(0, dtype=np.uint64), offsets

    nwin = total - n + 1
    with np.errstate(over="ignore"):
        acc = th[:nwin].copy()
        for j in range(1, n):
            acc = acc * _POLY_C + th[j : nwin + j]
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # a window is a real n-gram only when it stays inside one document
    return acc[doc_idx[:nwin] == doc_idx[n - 1 :]], offsets


def collect_test_ngrams(
    test_ds: rd.Dataset,
    *,
    text_col: str = "text",
    n: int = 5,
    limit: int = TEST_GRAM_LIMIT,
) -> "ray.ObjectRef":
    """Distinct n-gram hashes of the (small) test set, sorted, as one
    broadcast ``ray.put`` ref. Dedup happens inside each map task first so
    only unique-per-batch hashes cross the wire."""

    def grams(t: pa.Table) -> pd.DataFrame:
        vals, _ = _batch_ngrams(t.column(text_col).to_pylist(), n)
        return pd.DataFrame({"g": np.unique(vals)})

    parts = [
        b["g"]
        for b in test_ds.map_batches(grams, batch_format="pyarrow").iter_batches(
            batch_format="numpy", batch_size=None
        )
    ]
    hashes = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
    )
    if len(hashes) > limit:
        raise ValueError(
            f"test set has {len(hashes)} distinct {n}-grams > limit {limit}; "
            "decontaminate expects a held-out-eval-sized test side — shard it "
            "or raise the limit"
        )
    return ray.put(hashes)


def decontaminate(
    train_ds: rd.Dataset,
    test_ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    mode: str = "flag",
) -> rd.Dataset:
    """Flag (``mode='flag'``: adds bool ``contaminated``) or drop
    (``mode='drop'``) training docs sharing ≥1 word n-gram with the test
    set. Training side streams; test side broadcasts once."""
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be flag|drop, got {mode!r}")
    ref = collect_test_ngrams(test_ds, text_col=text_col, n=n)

    def probe(t: pa.Table) -> pa.Table:
        test_hashes = get_broadcast(ref)
        vals, offsets = _batch_ngrams(t.column(text_col).to_pylist(), n)
        if len(test_hashes):
            pos = np.searchsorted(test_hashes, vals)
            pos[pos == len(test_hashes)] = 0
            hit = test_hashes[pos] == vals
        else:
            hit = np.zeros(len(vals), dtype=bool)
        # any-hit per doc: sum hits over each NON-EMPTY doc span, scattered
        # back (reduceat over clipped indices would instead truncate the
        # segment preceding an empty/trailing doc — a false negative)
        spans = np.diff(offsets)
        doc_hits = np.zeros(len(spans), dtype=bool)
        nonempty = spans > 0
        if len(vals) and nonempty.any():
            doc_hits[nonempty] = (
                np.add.reduceat(hit, offsets[:-1][nonempty]) > 0
            )
        if mode == "drop":
            return t.filter(pa.array(~doc_hits))
        return t.append_column("contaminated", pa.array(doc_hits))

    return train_ds.map_batches(probe, batch_format="pyarrow")
