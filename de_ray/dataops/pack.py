"""Sequence packing for LLM pretraining: concatenate documents and cut
fixed-size token windows (the standard GPT-style chunk-and-pack — docs may
straddle a boundary; nothing is padded or dropped except block tails).

Packing is per Ray block: each ``map_batches`` task packs the documents it
holds and emits its own chunk rows, so the op streams at any scale with no
shuffle. Chunk ids are content-derived (first doc id + offset) — stable
across reruns and resumable writes. The cross-block tail waste is bounded
by (max_tokens - 1) tokens per block, negligible at production block
sizes; exact global packing would serialize the corpus for no training
benefit.

The reference engine has no packing operator; this belongs to the
training-data extension surface (SURVEY.md §7.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def pack_token_chunks(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    drop_tail: bool = False,
) -> rd.Dataset:
    """Pack whitespace-token documents into ``max_tokens``-sized training
    chunks. Output rows: ``chunk_id`` (str, "<first_doc>:<k>"),
    ``first_doc``/``last_doc`` (ids spanning the chunk), ``n_docs``,
    ``n_tokens`` (== max_tokens except a block's final chunk).

    Fully vectorized: one split+length pass, cumsum boundaries,
    searchsorted doc↔chunk mapping — no per-doc Python loop."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "chunk_id": pd.Series([], dtype="string"),
                "first_doc": pd.Series([], dtype="int64"),
                "last_doc": pd.Series([], dtype="int64"),
                "n_docs": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
            }
        )

    def chunk(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return _empty()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        # count NON-EMPTY tokens: split("") yields [""] (length 1, not 0),
        # so a raw list_value_length would give every empty doc one token
        toks = pc.split_pattern(t.column(text_col), pattern=" ")
        ll = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.cumsum(ll)[:-1]])
        lens = np.add.reduceat(flat != "", starts)  # split rows are never empty
        keep = lens > 0
        ids, lens = ids[keep], lens[keep].astype(np.int64)
        if len(ids) == 0:
            return _empty()
        ends = np.cumsum(lens)  # doc i occupies tokens [ends[i]-lens[i], ends[i])
        total = int(ends[-1])
        n_chunks = total // max_tokens if drop_tail else -(-total // max_tokens)
        if n_chunks == 0:
            return _empty()
        starts = np.arange(n_chunks, dtype=np.int64) * max_tokens
        stops = np.minimum(starts + max_tokens, total)
        # first doc overlapping a chunk: first doc whose end > chunk start;
        # last doc: first doc whose end >= chunk stop
        first_i = np.searchsorted(ends, starts, side="right")
        last_i = np.searchsorted(ends, stops, side="left")
        last_i = np.minimum(last_i, len(ids) - 1)
        return pd.DataFrame(
            {
                "chunk_id": pd.Series(
                    [f"{ids[0]}:{k}" for k in range(n_chunks)], dtype="string"
                ),
                "first_doc": ids[first_i].astype(np.int64),
                "last_doc": ids[last_i].astype(np.int64),
                "n_docs": (last_i - first_i + 1).astype(np.int64),
                "n_tokens": (stops - starts).astype(np.int64),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def chunk_token_windows(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> rd.Dataset:
    """RAG-style per-document chunking: overlapping token windows of
    ``window`` tokens every ``stride`` tokens (window starts 0, stride,
    2·stride, … while start < n_tokens — the last windows shrink rather
    than pad). Output rows: ``(doc_id, chunk_id, n_tokens, chunk_text)``
    with ``chunk_text`` the single-space join of the window's non-empty
    whitespace tokens.

    Pure per-batch kernel, zero shuffle. Vectorized throughout: one token
    explode, cumsum char offsets into each doc's normalized join, numpy
    repeat/arange chunk enumeration — the only Python-level loop builds
    the output strings themselves by slicing (O(output bytes), the
    minimum possible string work; no per-token join calls)."""
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1, got {window}/{stride}")

    def kern(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t.column(text_col), pattern=" ")
        lens_all = pc.list_value_length(toks).to_numpy()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t)), lens_all)
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        n_per_doc = np.bincount(doc_idx, minlength=len(t)).astype(np.int64)
        tok_len = pd.Series(flat).str.len().to_numpy(dtype=np.int64)

        # char offsets of each token inside its doc's ' '-joined clean text
        gc = np.concatenate([[0], np.cumsum(tok_len + 1)])  # global starts
        doc_tok0 = np.concatenate([[0], np.cumsum(n_per_doc)])  # first token per doc
        base = gc[doc_tok0[:-1]]
        clean = (
            pd.Series(flat)
            .groupby(doc_idx)
            .agg(" ".join)
            .reindex(np.arange(len(t)), fill_value="")
            .to_numpy()
        )

        n_chunks = -(-n_per_doc // stride)  # ceil; 0 tokens -> 0 chunks
        cdoc = np.repeat(np.arange(len(t)), n_chunks)
        offs = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        within = np.arange(len(cdoc)) - offs
        starts = within * stride
        ends = np.minimum(starts + window, n_per_doc[cdoc])
        g0 = doc_tok0[cdoc] + starts
        g1 = doc_tok0[cdoc] + ends
        cs = gc[g0] - base[cdoc]
        ce = gc[g1] - 1 - base[cdoc]
        ids = t.column(id_col).to_numpy(zero_copy_only=False)[cdoc]
        texts = [clean[d][a:b] for d, a, b in zip(cdoc, cs, ce)]
        return pd.DataFrame(
            {
                id_col: ids,
                "chunk_id": within.astype("int64"),
                "n_tokens": (ends - starts).astype("int64"),
                "chunk_text": texts,
            }
        )

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=16 * 1024)
