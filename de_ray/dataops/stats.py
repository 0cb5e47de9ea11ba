"""Distributed order statistics without a global sort.

``quantile_disc(ds, col, qs)`` returns the EXACT discrete quantiles
(DuckDB ``quantile_disc`` convention: the sorted[ceil(q·n) − 1] element,
nulls ignored) using histogram refinement instead of ``ds.sort``:

1. one pass for (count, min, max) — per-batch partials, tiny merge;
2. one histogram pass per refinement round: every batch bins its values
   into B buckets per still-unresolved quantile (vectorized
   ``np.searchsorted``), partials summed driver-side (B·|qs| ints per
   batch cross the wire, never the data);
3. when a quantile's bracket holds ≤ ``collect_limit`` values, one final
   filtered-collect pass pulls just those values and picks the k-th.

For n rows the expected rounds are ⌈log_B(n / collect_limit)⌉ — with the
defaults (B = 4096, limit = 4 M) a single histogram round resolves up to
~16 G rows, so the whole thing is 3 passes over the data and O(B·|qs|)
driver state, versus a full all-to-all shuffle for ``Dataset.sort``.

Brackets are half-open ``[lo, hi)`` intervals (bucket j of a round's
edges is exactly ``[edges[j], edges[j+1})``), with one explicit
``hi_inc`` flag for the bracket that still ends at the global maximum —
so a value equal to a bucket edge is routed identically in every round
and in the final collect (consistency is what exactness needs; float
edges only move WHERE the cuts fall, never double-count a value).
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np
import pandas as pd
import ray.data as rd


def _clean(df: pd.DataFrame, col: str) -> np.ndarray:
    v = df[col].to_numpy()
    if v.dtype == object:
        v = pd.to_numeric(df[col], errors="coerce").to_numpy()
    v = v.astype(np.float64, copy=False)
    return v[~np.isnan(v)]


def _mask(v: np.ndarray, b: dict) -> np.ndarray:
    m = (v >= b["lo"]) & (v < b["hi"])
    if b["hi_inc"]:
        m |= v == b["hi"]
    return m


def quantile_disc(
    ds: rd.Dataset,
    col: str,
    qs: Sequence[float],
    bins: int = 4096,
    collect_limit: int = 4_000_000,
    max_rounds: int = 8,
) -> List[float]:
    """Exact discrete quantiles of ``ds[col]`` (DuckDB quantile_disc
    semantics). Returns one value per q, in input order."""
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q}")
    ds = ds.select_columns([col]).materialize()

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = _clean(df, col)
        if len(v) == 0:
            return pd.DataFrame({"n": [0], "lo": [np.inf], "hi": [-np.inf]})
        return pd.DataFrame({"n": [len(v)], "lo": [v.min()], "hi": [v.max()]})

    st = ds.map_batches(stats, batch_format="pandas", batch_size=256 * 1024).to_pandas()
    if st.shape[1] == 0 or st.empty:
        # fully-empty input: the stats map never ran (Ray skips empty
        # datasets) — same answer as n == 0 below
        return [math.nan] * len(qs)
    n = int(st["n"].sum())
    if n == 0:
        return [math.nan] * len(qs)
    glo, ghi = float(st["lo"].min()), float(st["hi"].max())
    if glo == ghi:
        # every value equal: all quantiles are that value — the refinement
        # loop would exclude the degenerate bracket and the collect pass
        # would pull the whole column to the driver for nothing
        return [glo] * len(qs)

    # bracket: values in [lo, hi) (+hi if hi_inc); k = 1-based rank of the
    # target within the bracket; cnt = values in the bracket
    brackets = [
        {
            "lo": glo,
            "hi": ghi,
            "hi_inc": True,
            "k": int(math.ceil(q * n)),
            "cnt": n,
        }
        for q in qs
    ]

    for _ in range(max_rounds):
        open_idx = [
            i
            for i, b in enumerate(brackets)
            if b["cnt"] > collect_limit and b["lo"] < b["hi"]
        ]
        if not open_idx:
            break
        edge_sets = [
            (i, np.linspace(brackets[i]["lo"], brackets[i]["hi"], bins + 1))
            for i in open_idx
        ]
        snap = [dict(brackets[i]) for i in open_idx]

        def hist(df: pd.DataFrame, _edges=edge_sets, _snap=snap) -> pd.DataFrame:
            v = _clean(df, col)
            row = {}
            for (i, edges), b in zip(_edges, _snap):
                sel = v[_mask(v, b)]
                # bucket j ⇔ exactly j inner edges ≤ x ⇔ x ∈ [edges[j], edges[j+1})
                buck = np.searchsorted(edges[1:-1], sel, side="right")
                row[f"h{i}"] = [np.bincount(buck, minlength=bins).astype(np.int64)]
            return pd.DataFrame(row)

        parts = ds.map_batches(hist, batch_format="pandas", batch_size=256 * 1024).to_pandas()
        for (i, edges), prev in zip(edge_sets, snap):
            total = np.sum(np.stack([np.asarray(a) for a in parts[f"h{i}"]]), axis=0)
            cum = np.cumsum(total)
            b = brackets[i]
            j = int(np.searchsorted(cum, b["k"], side="left"))
            below = int(cum[j - 1]) if j > 0 else 0
            b["k"] -= below
            new_cnt = int(total[j])
            b["lo"], b["hi"] = float(edges[j]), float(edges[j + 1])
            b["hi_inc"] = prev["hi_inc"] and j == bins - 1
            if new_cnt >= b["cnt"] or new_cnt <= 0:
                # float-degenerate bracket (all mass on one edge): stop
                # refining, the collect pass resolves it exactly
                b["cnt"] = 0
            else:
                b["cnt"] = new_cnt

    # final pass: collect each remaining bracket's (few) values once and
    # pick the k-th. A bracket refined down to lo == hi IS its answer —
    # never collect it (a point-mass duplicate pile can exceed any limit)
    open_brs = {i: b for i, b in enumerate(brackets) if b["lo"] < b["hi"]}

    def collect(df: pd.DataFrame, _brackets={i: dict(b) for i, b in open_brs.items()}) -> pd.DataFrame:
        v = _clean(df, col)
        return pd.DataFrame(
            {f"v{i}": [v[_mask(v, b)]] for i, b in _brackets.items()}
        )

    got = (
        ds.map_batches(collect, batch_format="pandas", batch_size=256 * 1024).to_pandas()
        if open_brs
        else None
    )
    results = []
    for i, b in enumerate(brackets):
        if b["lo"] >= b["hi"]:
            results.append(float(b["lo"]))
            continue
        vals = np.sort(np.concatenate([np.asarray(a) for a in got[f"v{i}"]]))
        results.append(float(vals[b["k"] - 1]))
    return results


def approx_distinct(ds: rd.Dataset, col: str, precision: int = 14) -> int:
    """HyperLogLog distinct-count estimate (Flajolet et al. 2007, public
    algorithm): each batch folds its values into m = 2^p registers
    (vectorized hash → bucket → leading-zero rank → np.maximum.at), only
    the m-byte register array crosses the wire per batch, and merge is an
    elementwise max — associative, so any batch/block split gives the
    same sketch. Standard error ≈ 1.04/√m (p=14 → ~0.8%); small
    cardinalities fall back to exact linear counting. p must be ≥ 12 so
    the (64−p)-bit suffix stays float64-exact for the log2 rank trick."""
    if not 12 <= precision <= 18:
        raise ValueError("precision must be in [12, 18]")
    m = 1 << precision
    suffix_bits = 64 - precision

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[col].dropna(), index=False).to_numpy()
        regs = np.zeros(m, dtype=np.int8)
        if len(h):
            idx = (h >> np.uint64(suffix_bits)).astype(np.int64)
            w = h & np.uint64((1 << suffix_bits) - 1)
            # rank = leading zeros in the suffix + 1; suffix < 2^52 is
            # float64-exact so floor(log2) is safe
            bl = np.zeros(len(w), dtype=np.int64)
            nz = w > 0
            fl = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
            # float log2 rounds w=2^k-1 UP to k for large k: correct the
            # floor exactly with one integer comparison (2^fl must be <= w)
            fl -= (np.uint64(1) << fl.astype(np.uint64)) > w[nz]
            bl[nz] = fl + 1
            rank = (suffix_bits - bl + 1).astype(np.int8)
            np.maximum.at(regs, idx, rank)
        return pd.DataFrame({"regs": [regs]})

    parts = ds.select_columns([col]).map_batches(
        sketch, batch_format="pandas", batch_size=256 * 1024
    ).to_pandas()
    regs = np.max(np.stack([np.asarray(r, dtype=np.int8) for r in parts["regs"]]), axis=0)

    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting for the small range
    return int(round(est))


def grouped_quantile_disc(
    ds: rd.Dataset,
    key: str,
    col: str,
    qs: Sequence[float],
    limit: int = 500_000,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-group exact discrete quantiles (same sorted[ceil(q·n) − 1]
    convention as ``quantile_disc``), one output row per key with a
    ``q<pct>`` column per q. Hash-partitions complete key groups
    (``adaptive_grouped_apply``) and resolves EVERY group in one
    vectorized sort + positional gather — no per-key Python loop, no
    global sort. Use when the number of groups is large and each group
    fits its bucket; for one giant group use ``quantile_disc``."""
    from de_ray.functions.agg import adaptive_grouped_apply

    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q}")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, col]].dropna(subset=[col]).sort_values(
            [key, col], kind="mergesort"
        )
        # dropna=False keeps NULL-key groups (SQL GROUP BY semantics);
        # sort_values puts NaN keys last and sorted groupby orders them
        # last too, so the cumsum positions stay aligned
        sizes = df.groupby(key, sort=True, dropna=False)[col].size()
        starts = sizes.cumsum() - sizes
        vals = df[col].to_numpy()
        out = {key: sizes.index.to_numpy()}
        for q in qs:
            pos = (starts + np.ceil(q * sizes).astype("int64") - 1).to_numpy()
            out[f"q{round(q * 100)}"] = vals[pos]
        return pd.DataFrame(out)

    empty = pd.DataFrame(
        {key: pd.Series(dtype=object)}
        | {f"q{round(q * 100)}": pd.Series(dtype="float64") for q in qs}
    )
    return adaptive_grouped_apply(
        ds.select_columns([key, col]),
        key,
        kernel,
        limit=limit,
        num_buckets=num_buckets,
        empty_result=empty,
    )


def grouped_zscore(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    *,
    out_col: str = "z",
    round_to: int = 6,
) -> rd.Dataset:
    """Per-group standardization: ``z = (x - mean_g) / std_pop_g``.

    Zero extra shuffle: one combiner pass computes per-(batch, group)
    ``(n, sum, sum_sq)`` partials, a tiny driver merge derives each group's
    moments, and a broadcast dict scores every batch in place. The moment
    arithmetic is plain float64 ``mean = s/n``, ``var = ss/n - mean²`` —
    integer-valued partials are exact below 2^53, so a DuckDB oracle using
    the *same formula* (not STDDEV_POP's Welford path) matches bitwise.
    Groups with zero variance score 0.0 on both sides. NULL group keys
    form their own group (SQL ``PARTITION BY`` semantics) via a private
    sentinel — pandas groupby would silently drop them and the broadcast
    dict cannot key on NaN (adversarial-contract-fuzz finding, round 5).
    """
    import ray

    from de_ray.functions.agg import null_safe_key as _keyed

    part = ds.map_batches(
        lambda df: df.assign(
            **{group_col: _keyed(df[group_col])},
            _sq=df[value_col].astype("float64") ** 2,
        )
        .groupby(group_col, as_index=False)
        .agg(n=(value_col, "count"), s=(value_col, "sum"), ss=("_sq", "sum")),
        batch_format="pandas",
        batch_size=256 * 1024,
    )
    from de_ray.functions.agg import adaptive_grouped_sum, to_pandas_keep_schema

    moments = to_pandas_keep_schema(
        adaptive_grouped_sum(part, group_col, ["n", "s", "ss"])
    )
    if moments.shape[1] == 0:  # fully-empty input: no groups to score
        moments = pd.DataFrame(
            {group_col: pd.Series(dtype=object)}
            | {c: pd.Series(dtype="float64") for c in ("n", "s", "ss")}
        )
    mean = moments["s"].to_numpy(dtype="float64") / moments["n"].to_numpy(dtype="float64")
    var = moments["ss"].to_numpy(dtype="float64") / moments["n"].to_numpy(dtype="float64") - mean * mean
    std = np.sqrt(np.maximum(var, 0.0))
    lut = (
        dict(zip(moments[group_col], mean)),
        dict(zip(moments[group_col], std)),
    )
    ref = ray.put(lut)

    from de_ray.state.broadcast import get_broadcast

    def score(df: pd.DataFrame) -> pd.DataFrame:
        means, stds = get_broadcast(ref, lambda x: x)
        g = _keyed(df[group_col])
        m = g.map(means).to_numpy(dtype="float64")
        sd = g.map(stds).to_numpy(dtype="float64")
        x = df[value_col].to_numpy(dtype="float64")
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0.0, (x - m) / sd, 0.0)
        df = df.copy()
        df[out_col] = np.round(z, round_to)
        return df

    return ds.map_batches(score, batch_format="pandas")


def winsorize(
    ds: rd.Dataset,
    col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    out_col: str | None = None,
) -> rd.Dataset:
    """Clip ``col`` to its exact [lo_q, hi_q] discrete quantiles
    (outlier winsorization before stats/training cuts). Composes the
    3-pass histogram-refinement quantiles with a zero-shuffle per-batch
    clip — the two cut values are plain floats in the task closure, never
    a broadcast table. Oracle: DuckDB ``quantile_disc`` + least/greatest
    (same discrete-quantile convention)."""
    lo, hi = quantile_disc(ds, col, [lo_q, hi_q])
    name = out_col or f"{col}_w"

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[name] = df[col].clip(lo, hi)
        return df

    return ds.map_batches(clip, batch_format="pandas")


def grouped_corr(
    ds: rd.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    round_to: int = 6,
) -> rd.Dataset:
    """Per-group Pearson correlation in ONE combiner pass: each batch emits
    the six sufficient statistics ``(n, Σx, Σy, Σx², Σy², Σxy)`` per group,
    the tiny merged final applies
    ``r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²))`` — the same
    float64 formula an SQL oracle can run over its own sums, avoiding
    engine-specific Welford paths. Zero-variance groups yield NULL (SQL
    corr() convention)."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].astype("float64")
        y = df[y_col].astype("float64")
        t = pd.DataFrame({group_col: df[group_col], "x": x, "y": y,
                          "xx": x * x, "yy": y * y, "xy": x * y})
        # pairwise-complete rows only (SQL corr() skips NULL pairs): with
        # NaNs left in, 'size' would count rows the sums exclude and every
        # statistic in the formula would disagree with the oracle
        t = t.dropna(subset=["x", "y"])
        g = t.groupby(group_col, as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"))
        return g

    partials = ds.map_batches(part, batch_format="pandas", batch_size=256 * 1024)
    from de_ray.functions.agg import adaptive_grouped_sum

    m = adaptive_grouped_sum(
        partials, group_col, ["n", "sx", "sy", "sxx", "syy", "sxy"]
    ).to_pandas()
    n = m["n"].to_numpy(dtype="float64")
    cov = n * m["sxy"].to_numpy() - m["sx"].to_numpy() * m["sy"].to_numpy()
    vx = n * m["sxx"].to_numpy() - m["sx"].to_numpy() ** 2
    vy = n * m["syy"].to_numpy() - m["sy"].to_numpy() ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        r = cov / np.sqrt(vx * vy)
    out = pd.DataFrame({
        group_col: m[group_col],
        "n": m["n"].astype("int64"),
        "r": np.round(r, round_to),
    })
    return rd.from_pandas(out)


def value_histogram(
    ds: rd.Dataset,
    col: str,
    lo: float,
    hi: float,
    bins: int,
) -> rd.Dataset:
    """Exact fixed-width histogram: ``bin = clamp(floor((x − lo)/width),
    0, bins−1)`` (out-of-range values land in the edge bins; NULLs are
    dropped). One vectorized bincount per batch — the shuffle carries at
    most ``bins`` rows per block; the final is a tiny grouped sum. Output
    rows ``(bin, bin_lo, n)`` for non-empty bins, matching an ANSI-SQL
    replay of the identical float64 arithmetic."""
    import pandas as pd

    if bins < 1 or not hi > lo:
        raise ValueError(f"need bins >= 1 and hi > lo, got {bins}, [{lo}, {hi})")
    width = (hi - lo) / bins

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna().to_numpy(dtype=np.float64)
        b = np.clip(np.floor((v - lo) / width), 0, bins - 1).astype(np.int64)
        c = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(c)
        return pd.DataFrame({"bin": nz, "n": c[nz]})

    from de_ray.functions.agg import adaptive_grouped_sum

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pandas", batch_size=256 * 1024
    )
    out = adaptive_grouped_sum(parts, "bin", "n")

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bin", kind="mergesort")
        df["bin_lo"] = lo + df["bin"].to_numpy(dtype=np.float64) * width
        df["n"] = df["n"].astype("int64")
        return df[["bin", "bin_lo", "n"]]

    return out.map_batches(edges, batch_format="pandas")
