"""Stream-shaped operators over an ordered event log.

Ray Data has no event-time windows/watermarks; the reference is batch-only
too (SURVEY §2.10). These operators treat the events table as an ordered,
partitioned log: partition by key, sort by ts within the partition
(``groupby(key).map_groups``), and window over the sorted group with
pandas. Ordering assumption: windows are computed per key over ALL of that
key's events — a key's history must fit one group (documented partitioning
assumption; salt by time-range for pathological hot keys).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def tumbling_window(
    ds: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    freq: str = "D",
    value_col: str = "value",
):
    """Tumbling count/sum per (key, window start). freq is a pandas offset
    alias ('D', 'H', '15min', ...)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(window=df[ts_col].dt.floor(freq))
        out = df.groupby([key, "window"], as_index=False, dropna=False).agg(
            n_events=(ts_col, "size"), sum_value=(value_col, "sum")
        )
        return out

    part = ds.map_batches(partial, batch_format="pandas", batch_size=128 * 1024)

    from de_ray.functions.agg import adaptive_grouped_sum

    return adaptive_grouped_sum(part, [key, "window"], ["n_events", "sum_value"])


def sliding_window_counts(
    ds: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    window: str = "1h",
    slide: str = "30min",
):
    """Sliding-window event counts per key: each event contributes to every
    window whose [start, start+window) contains it. Implemented by exploding
    each event to its covering window starts (window/slide is small), then a
    grouped count — no per-key state needed."""
    import numpy as np

    w = pd.Timedelta(window)
    s = pd.Timedelta(slide)
    k = int(np.ceil(w / s))

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        base = df[ts_col].dt.floor(slide)
        for i in range(k):
            start = base - i * s
            # containment: start <= ts holds by the floor; start+window > ts
            # must be CHECKED — when window is not an exact multiple of
            # slide the i-th candidate window can end before the event
            keep = (start + w) > df[ts_col]
            rows.append(
                pd.DataFrame(
                    {key: df[key][keep], "window_start": start[keep]}
                )
            )
        out = pd.concat(rows, ignore_index=True)
        return out.groupby([key, "window_start"], as_index=False, dropna=False).size().rename(
            columns={"size": "n_events"}
        )

    part = ds.map_batches(explode, batch_format="pandas", batch_size=128 * 1024)
    from de_ray.functions.agg import adaptive_grouped_sum

    return adaptive_grouped_sum(part, [key, "window_start"], "n_events")


def session_windows(
    ds: rd.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30min",
):
    """Session windows: events of one key closer than ``gap`` chain into one
    session. Returns (key, session_id 1-based by start time, n_events,
    session_start, session_end). Size-adaptive hash-bucket shuffle on key;
    the kernel handles ALL keys of its bucket with vectorized pandas groupby
    diff/cumsum — never one Python call per key."""
    gap_td = pd.Timedelta(gap)

    def sessions_many(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        diff = df.groupby(key, sort=False)[ts_col].diff()
        new_session = diff.isna() | (diff > gap_td)
        sid = new_session.groupby(df[key], sort=False).cumsum().astype("int64")
        df = df.assign(session_id=sid)
        return df.groupby([key, "session_id"], as_index=False).agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        )

    from de_ray.functions.agg import adaptive_grouped_apply

    return adaptive_grouped_apply(ds, key, sessions_many)


def topk_per_group(
    ds: rd.Dataset,
    key: str,
    order_col: str,
    k: int = 2,
    descending: bool = True,
    tiebreak: str | None = None,
):
    """Top-k rows per key (window-rank pattern): per-batch partial top-k
    (combiner) then per-key final top-k — the shuffle carries ≤ k rows per
    (batch, key). ``tiebreak`` (ascending) makes the selection deterministic
    under order_col ties."""
    by = [order_col] + ([tiebreak] if tiebreak else [])
    asc = [not descending] + ([True] if tiebreak else [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(by, ascending=asc, kind="mergesort")
            .groupby(key, as_index=False, sort=False)
            .head(k)
        )

    part = ds.map_batches(partial, batch_format="pandas", batch_size=128 * 1024)
    from de_ray.functions.agg import adaptive_grouped_apply

    # the final is the same many-key vectorized kernel as the combiner,
    # applied over whole key groups (size-adaptive bucket shuffle)
    return adaptive_grouped_apply(part, key, partial)


def funnel_counts(
    ds,
    steps,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Ordered funnel on FIRST occurrences: a user converts through step i
    iff their first step-i event is strictly later than their first
    step-(i−1) event (the standard product-analytics funnel over min
    timestamps — deterministic and exactly SQL-replicable, unlike
    sequence-scan funnels). Returns one row per step:
    ``(step, event_type, users)``.

    Scale shape: per-batch combiner collapses to one (user, step) min-ts
    row per block, complete user groups resolve in bucket-vectorized
    kernels (``adaptive_grouped_apply``), and each bucket emits just
    |steps| count rows — the driver merge sums a few hundred integers.
    """
    import pandas as pd

    from de_ray.functions.agg import adaptive_grouped_apply

    steps = list(steps)
    if len(steps) < 1 or len(set(steps)) != len(steps):
        raise ValueError("steps must be a non-empty list of distinct event types")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[type_col].isin(steps)]
        return d.groupby([user_col, type_col], as_index=False, dropna=False)[ts_col].min()

    parts = ds.select_columns([user_col, type_col, ts_col]).map_batches(
        partial, batch_format="pandas", batch_size=256 * 1024
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        p = df.groupby([user_col, type_col], dropna=False)[ts_col].min().unstack()
        counts = []
        ok = None
        prev = None
        for i, s in enumerate(steps):
            col = p[s] if s in p.columns else pd.Series(pd.NaT, index=p.index)
            if i == 0:
                ok = col.notna()
            else:
                ok = ok & col.notna() & (col > prev)
            prev = col
            counts.append(int(ok.sum()))
        return pd.DataFrame(
            {
                "step": range(1, len(steps) + 1),
                "event_type": steps,
                "users": counts,
            }
        )

    # empty corpus: the kernel on a typed empty frame yields the correct
    # all-zero step table (Ray loses mapped-empty schemas, review r5)
    per_bucket = adaptive_grouped_apply(
        parts,
        user_col,
        kernel,
        empty_result=kernel(
            pd.DataFrame(
                {user_col: pd.Series(dtype=object),
                 type_col: pd.Series(dtype=object),
                 ts_col: pd.Series(dtype="datetime64[us]")}
            )
        ),
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["step", "event_type"], as_index=False)["users"].sum()
        out["users"] = out["users"].astype("int64")
        return out.sort_values("step", kind="mergesort")

    import ray.data as rd

    return rd.from_pandas(merge(per_bucket.to_pandas()))


def event_transitions(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    k: int | None = None,
):
    """Markov-style transition counts over per-user event sequences:
    order each user's events by (ts, tiebreak), count consecutive
    (from_type → to_type) pairs corpus-wide, optionally return the top-k
    by count (ties on the pair). The deterministic tiebreak column makes
    the sequence — and therefore the counts — partitioning-independent.

    Scale shape: complete user groups resolve in bucket-vectorized kernels
    (``adaptive_grouped_apply``) that emit per-bucket PAIR COUNTS, not
    pairs — the merge sums |type|² rows per bucket; no global sort."""
    import pandas as pd

    from de_ray.functions.agg import adaptive_grouped_apply, adaptive_grouped_sum

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        srt = df.sort_values([user_col, ts_col, tiebreak_col], kind="mergesort")
        u = srt[user_col].to_numpy()
        # NaN-aware: NULL user ids form ONE partition (SQL PARTITION BY
        # groups NULLs together); plain == would split every NaN apart
        nulls = pd.isna(u)
        same = (u[1:] == u[:-1]) | (nulls[1:] & nulls[:-1])
        a = srt[type_col].to_numpy()[:-1][same]
        b = srt[type_col].to_numpy()[1:][same]
        out = (
            pd.DataFrame({"a": a, "b": b})
            .groupby(["a", "b"], as_index=False, dropna=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out

    cols = [user_col, ts_col, type_col, tiebreak_col]
    per_bucket = adaptive_grouped_apply(
        ds.select_columns(cols),
        user_col,
        kernel,
        empty_result=pd.DataFrame(
            {"a": pd.Series(dtype=object), "b": pd.Series(dtype=object),
             "n": pd.Series(dtype="int64")}
        ),
    )
    counts = adaptive_grouped_sum(per_bucket, ["a", "b"], "n")

    def as_int(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype("int64")
        return df

    counts = counts.map_batches(as_int, batch_format="pandas")
    if k is None:
        return counts
    from de_ray.functions.agg import from_pandas_keep_schema, to_pandas_keep_schema

    df = to_pandas_keep_schema(counts)
    if df.shape[1] == 0:  # zero transitions anywhere (e.g. one event total)
        df = pd.DataFrame(
            {"a": pd.Series(dtype=object), "b": pd.Series(dtype=object),
             "n": pd.Series(dtype="int64")}
        )
    head = df.sort_values(
        ["n", "a", "b"], ascending=[False, True, True], kind="mergesort"
    )
    # same return type on both paths (a Dataset), unlike a bare DataFrame
    return from_pandas_keep_schema(head.head(k).reset_index(drop=True))
