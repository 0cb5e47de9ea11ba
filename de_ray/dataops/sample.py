"""Deterministic sampling operators.

Training-data pipelines need samples that are (a) reproducible across
runs and cluster sizes, (b) computable without any coordination — a pure
per-row predicate, no shuffle, no RNG state — and (c) auditable (the
same predicate can be evaluated by any SQL engine over the same data).

``hash_sample`` keeps a row iff a multiplicative hash of its integer key
falls below ``rate`` of the 32-bit space (Knuth's 2654435761 multiplier):

    keep  ⇔  ((key + salt) * 2654435761) mod 2^32  <  floor(rate · 2^32)

Pure vectorized integer arithmetic (uint64, wrap-around well-defined),
embarrassingly parallel, and expressible verbatim in ANSI SQL at test
scale (``sql_predicate`` emits it; int64 SQL engines overflow only once
key·2654435761 exceeds 2^63, i.e. keys above ~3.5e9 — our own kernel
wraps in uint64 and keeps working).

``stratified_sample`` applies a different rate per value of a strata
column (e.g. oversample rare languages) with the same predicate.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

KNUTH = 2654435761
_M32 = np.uint64(2**32)


def _hash32(keys: np.ndarray, salt: int) -> np.ndarray:
    k = keys.astype(np.uint64, copy=False) + np.uint64(salt)
    return (k * np.uint64(KNUTH)) % _M32


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * 2**32)


def hash_sample(ds: rd.Dataset, key: str, rate: float, salt: int = 0) -> rd.Dataset:
    """Keep a deterministic ``rate`` fraction of rows by integer ``key``."""
    thr = np.uint64(_threshold(rate))

    def flt(t: pa.Table) -> pa.Table:
        h = _hash32(t.column(key).to_numpy(zero_copy_only=False), salt)
        return t.filter(pa.array(h < thr))

    return ds.map_batches(flt, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    key: str,
    strata_col: str,
    rates: Dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
) -> rd.Dataset:
    """Per-stratum deterministic sampling: a row of stratum ``s`` is kept
    iff its key hash < rates[s]·2^32 (``default_rate`` for unlisted
    strata). Vectorized: one hash pass + a threshold lookup per batch."""
    thr_map = {s: _threshold(r) for s, r in rates.items()}
    thr_default = _threshold(default_rate)

    def flt(t: pa.Table) -> pa.Table:
        h = _hash32(t.column(key).to_numpy(zero_copy_only=False), salt)
        vals = t.column(strata_col).to_numpy(zero_copy_only=False)
        u, inv = np.unique(vals, return_inverse=True)
        thr_u = np.array(
            [thr_map.get(s, thr_default) for s in u], dtype=np.uint64
        )  # Python touches only the UNIQUE strata, not rows
        return t.filter(pa.array(h < thr_u[inv]))

    return ds.map_batches(flt, batch_format="pyarrow")


def sql_predicate(key: str, rate: float, salt: int = 0) -> str:
    """The ANSI-SQL form of the keep predicate (test-scale audit oracle)."""
    return f"(({key} + {salt}) * {KNUTH}) % 4294967296 < {_threshold(rate)}"
