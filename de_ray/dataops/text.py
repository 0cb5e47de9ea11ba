"""Text analysis stages over a documents table: token counting, quality
scoring, language ID, fingerprinting. All vectorized per batch; the
regex/profile state compiles once per actor (callable classes) or once per
process (module level).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count, fully vectorized (split + list_value_length)."""
    toks = pc.split_pattern(batch.column(text_col), pattern=" ")
    # count non-empty tokens: total minus empties
    n = pc.list_value_length(toks).cast(pa.int64())
    return batch.append_column("n_tokens", n)


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: length, token count, mean token length, stopword
    ratio. Deterministic and SQL-mirrorable (oracle uses the same formulas)."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    toks = pc.split_pattern(text, pattern=" ")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    # stopword ratio via pandas (list ops)
    s = text.to_pandas().str.split(" ")
    stop = s.map(lambda ws: sum(1 for w in ws if w in STOPWORDS))
    ratio = (stop / s.map(len).clip(lower=1)).astype("float64")
    mean_len = s.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
    out = batch.append_column("n_chars_calc", n_chars)
    out = out.append_column("n_tokens", n_tokens)
    out = out.append_column("stopword_ratio", pa.array(ratio, pa.float64()))
    out = out.append_column("mean_token_len", pa.array(mean_len, pa.float64()))
    return out


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint = md5 hex of the text (content-addressable id,
    byte-stable across workers; DuckDB's md5() matches)."""
    fp = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch.column(text_col).to_pylist()]
    return batch.append_column("fingerprint", pa.array(fp, pa.string()))


def rolling_fingerprint_batch(batch: pa.Table, text_col: str = "text", window: int = 8) -> pa.Table:
    """Rolling (Rabin-Karp-style) 64-bit hash over byte windows, min-sampled:
    a shift-resistant fingerprint (winnowing lite). Deterministic."""
    B = np.uint64(1000003)
    out = []
    for t in batch.column(text_col).to_pylist():
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < window:
            out.append(int(b.sum()) if len(b) else 0)
            continue
        # polynomial rolling hash of each window, vectorized via cumulative trick
        pw = B ** np.arange(window, dtype=np.uint64)
        h = np.convolve(b, pw[::-1], mode="valid").astype(np.uint64)
        out.append(int(h.min()))
    return batch.append_column("rolling_fp", pa.array(out, pa.int64()))


class LangId:
    """Character-bigram language identifier (actor-pool stage).

    Profiles are tiny bigram frequency tables built deterministically in
    ``__init__`` (once per actor). This is a capability stub with real
    plumbing: on the synthetic corpus (English-ish words for every lang
    label) it predicts from text evidence, not from the lang column.
    """

    PROFILES = {
        "en": "th he in er an re on at en nd",
        "de": "en er ch de ei te in nd ie ge",
        "fr": "es le de en re nt on er ou ai",
        "es": "de en el la os es ar er as on",
        "zh": "zh on ng sh ia ua ei ao iu an",
    }

    def __init__(self):
        self.profiles = {
            lang: set(p.split(" ")) for lang, p in self.PROFILES.items()
        }

    def predict(self, text: str) -> str:
        bigrams = {text[i : i + 2] for i in range(len(text) - 1)}
        best, best_score = "en", -1.0
        for lang, prof in sorted(self.profiles.items()):
            score = len(bigrams & prof) / max(1, len(prof))
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def analyze_documents(ds, with_lang_id: bool = False, concurrency=(1, 4)):
    """documents Dataset → + n_tokens, quality metrics, fingerprint columns."""
    ds = ds.map_batches(quality_score_batch, batch_format="pyarrow", batch_size=8192)
    ds = ds.map_batches(fingerprint_batch, batch_format="pyarrow", batch_size=8192)
    if with_lang_id:
        ds = ds.map_batches(
            LangId, batch_format="pyarrow", batch_size=8192, concurrency=concurrency
        )
    return ds
