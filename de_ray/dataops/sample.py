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

``quota_sample`` keeps EXACTLY ``min(quota, |stratum|)`` rows per stratum
— the rows whose ``(hash32(key+salt), key)`` rank smallest within the
stratum — for balanced-corpus construction where binomial rate sampling
is not enough ("exactly 10 k docs per language"). Deterministic,
order- and partitioning-independent, and auditable in ANSI SQL as
``ROW_NUMBER() OVER (PARTITION BY strata ORDER BY hash, key) <= quota``.
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


def quota_sample(
    ds: rd.Dataset,
    key: str,
    strata_col: str,
    quotas: Dict[str, int],
    default_quota: int = 0,
    salt: int = 0,
    driver_limit: Optional[int] = None,
) -> rd.Dataset:
    """Exact per-stratum quotas: keep the ``quota`` rows of each stratum
    whose ``(hash32(key+salt), key)`` sort smallest (all rows when the
    stratum is smaller than its quota; ``default_quota`` for unlisted
    strata).

    Scale shape: a per-batch COMBINER first prunes each block to its local
    per-stratum top-``quota`` (a block can contribute at most ``quota``
    survivors per stratum), so the wide exchange moves at most
    ``quota · n_blocks`` rows per stratum regardless of corpus size; the
    exact global cut then runs per complete stratum group through
    :func:`adaptive_grouped_apply` (bucket-vectorized, never per-key
    Python). Both passes are pure vectorized numpy/pandas.
    """
    if default_quota < 0 or any(q < 0 for q in quotas.values()):
        raise ValueError("quotas must be >= 0")

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _hash32(t.column(key).to_numpy(zero_copy_only=False), salt)
        k = t.column(key).to_numpy(zero_copy_only=False)
        strat = t.column(strata_col).to_numpy(zero_copy_only=False)
        u, inv = np.unique(strat, return_inverse=True)
        q = np.array(
            [quotas.get(s, default_quota) for s in u], dtype=np.int64
        )  # Python touches only the UNIQUE strata
        order = np.lexsort((k, h, inv))  # stratum-major, then hash, then key
        inv_sorted = inv[order]
        starts = np.searchsorted(inv_sorted, np.arange(len(u)))
        rank = np.arange(len(order)) - starts[inv_sorted]
        keep = order[rank < q[inv_sorted]]
        keep.sort()
        return t.take(pa.array(keep))

    def final(df):
        h = _hash32(df[key].to_numpy(), salt)
        srt = df.assign(_h=h.astype("uint64")).sort_values(
            [strata_col, "_h", key], kind="mergesort"
        )
        qrow = (
            srt[strata_col].map(quotas).fillna(default_quota).astype("int64")
        )
        kept = srt[srt.groupby(strata_col, sort=False).cumcount() < qrow]
        return kept.drop(columns=["_h"])

    from de_ray.functions.agg import adaptive_grouped_apply

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    kw = {} if driver_limit is None else {"limit": driver_limit}
    return adaptive_grouped_apply(pruned, strata_col, final, **kw)


def temperature_rates(
    counts: Dict[str, int], coeff: float
) -> Dict[str, float]:
    """Per-stratum keep rates for τ = 0.5 temperature sampling:
    ``rate_s = min(1, coeff / sqrt(n_s))`` — the multilingual-corpus
    rebalancing rule (sample stratum s proportionally to n_s^τ, i.e. keep
    each row with rate ∝ n_s^(τ-1)); τ is fixed at 0.5 because sqrt and
    division are IEEE correctly-rounded, so ANY engine recomputing the
    rate from the same counts lands on the bit-identical float64 (pow()
    for general τ is not correctly rounded and may differ across libms).
    """
    import math

    if coeff < 0:
        raise ValueError(f"coeff must be >= 0, got {coeff}")
    return {s: min(1.0, coeff / math.sqrt(n)) for s, n in counts.items() if n}


def temperature_sample(
    ds: rd.Dataset,
    key: str,
    strata_col: str,
    coeff: float,
    salt: int = 0,
) -> rd.Dataset:
    """Data-derived mixture rebalancing (XLM-R-style temperature τ = 0.5):
    down-sample large strata and keep small ones, with per-stratum rate
    ``min(1, coeff / sqrt(n_s))`` computed from the corpus itself.

    Two passes: (A) per-stratum counts via a per-batch combiner — the
    merge handles one row per (block, stratum), so the driver only ever
    sees n_blocks × |strata| rows, never data rows; (B) the same pure
    per-row hash predicate as :func:`stratified_sample` with the derived
    rates — zero shuffle, reproducible across runs and cluster sizes.
    """

    def partial(df):
        return df.groupby(strata_col, as_index=False).size().rename(
            columns={"size": "n"}
        )

    parts = ds.select_columns([strata_col]).map_batches(
        partial, batch_format="pandas", batch_size=256 * 1024
    )
    cdf = parts.to_pandas().groupby(strata_col)["n"].sum()
    rates = temperature_rates(cdf.to_dict(), coeff)
    return stratified_sample(ds, key, strata_col, rates, salt=salt)


def sql_temperature_predicate(
    key: str, strata_count_col: str, coeff: float, salt: int = 0
) -> str:
    """ANSI-SQL form of the temperature keep predicate, recomputing the
    rate from a per-stratum count column (bit-identical float64: sqrt,
    divide and least are all correctly rounded; the threshold truncates
    exactly like ``_threshold``'s int())."""
    return (
        f"(({key} + {salt}) * {KNUTH}) % 4294967296 < CAST(floor("
        f"LEAST(1.0, {coeff!r} / sqrt({strata_count_col})) * 4294967296.0"
        ") AS BIGINT)"
    )


def sql_predicate(key: str, rate: float, salt: int = 0) -> str:
    """The ANSI-SQL form of the keep predicate (test-scale audit oracle)."""
    return f"(({key} + {salt}) * {KNUTH}) % 4294967296 < {_threshold(rate)}"


def sql_quota_rank(key: str, strata_col: str, salt: int = 0) -> str:
    """ANSI-SQL ``ROW_NUMBER()`` expression ranking rows within a stratum
    by the same (hash, key) order ``quota_sample`` uses (test-scale audit;
    int64 SQL engines match our uint64 wrap while key·KNUTH < 2^63)."""
    return (
        f"ROW_NUMBER() OVER (PARTITION BY {strata_col} "
        f"ORDER BY (({key} + {salt}) * {KNUTH}) % 4294967296, {key})"
    )
