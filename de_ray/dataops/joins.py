"""Distributed as-of, range, and interval joins.

Ray Data has no asof / inequality join and the reference engine has none
either — these extend the stream-shaped operator family (SURVEY §2.10)
with the temporal joins a training-data pipeline needs (align events to
the latest preceding state row; explode events into enclosing windows).

Shape (the repo's standard co-group trick): tag each side, align the two
Arrow schemas by appending typed null columns, ``union`` the Datasets,
hash-bucket on the equality key, and run ONE vectorized pandas kernel per
bucket — ``pd.merge_asof(..., by=key)`` or an equality merge + interval
mask; never a Python loop per key. One shuffle total. Below
``DRIVER_FINAL_LIMIT`` rows the kernel runs as a single driver pandas
call instead (Ray's shuffle has a multi-second fixed floor that would
dominate CLI-scale inputs); both paths are exact.

Keyless interval joins can't bucket on a key: ``interval_join`` bins the
timeline instead — each left row lands in exactly one fixed-width bin,
each right interval is replicated to every bin it overlaps (replication
factor ≈ span/bin_width + 1, bounded by construction), and pairs meet in
the left row's unique bin so no dedup pass is needed.

Determinism contract: ``asof_join`` resolves ties on the right side's
``on`` column by position, so callers that need hash-stable output must
make (by, on) unique on the right (e.g. keep ``max(id)`` per key+time) —
the driver queries in ``pipelines/driver_queries.py`` do exactly that.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from de_ray.functions.agg import DRIVER_FINAL_LIMIT

_SIDE = "__side"
_KEY = "__k"


def _with_key(ds: rd.Dataset, col: str) -> rd.Dataset:
    """Append a canonical large_string copy of the join key. Computed on
    each side BEFORE the union: the union null-promotes each side's view
    of the other's columns (int64 → float64), so hashing the raw key
    column would route '3' and '3.0' to different buckets."""
    import pyarrow.compute as pc

    def add(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY, pc.cast(t.column(col), pa.large_string()))

    # map_batches(pyarrow) itself coerces pandas blocks — no _ensure_arrow
    # (each _ensure_arrow schema check costs a partial execution)
    return ds.map_batches(add, batch_format="pyarrow")


def _ensure_arrow(ds: rd.Dataset) -> rd.Dataset:
    """Coerce pandas-block Datasets (e.g. from_pandas) to Arrow blocks so
    schema().base_schema is a pa.Schema."""
    sch = ds.schema()
    if sch is None or isinstance(sch.base_schema, pa.Schema):
        return ds  # schema-less (fully empty) datasets pass through as-is
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _pandas_dtypes(schema: pa.Schema) -> dict:
    """{col: pandas dtype} for restoring dtypes after null-promoting union."""
    return dict(pa.schema(schema).empty_table().to_pandas().dtypes)


def _side_schema(ds: rd.Dataset, hint, extra=(_KEY, None)) -> pa.Schema:
    """Arrow schema of a join side; for an EMPTY side (Ray reports schema
    None once any map ran over an empty dataset) falls back to ``hint`` —
    the schema the caller captured BEFORE keying — plus the column the
    keying map would have added (``extra``: name, type; type None =
    large_string)."""
    sch = ds.schema()
    if sch is not None:
        return pa.schema(sch.base_schema)
    # only reached when the keyed side is EMPTY — resolving the hint (a
    # LAZY pre-keying dataset handle, or a schema) is free there
    if isinstance(hint, rd.Dataset):
        hint = hint.schema()
    if hint is None:
        raise ValueError(
            "cannot join an empty schema-less Dataset: construct empty "
            "inputs via pyarrow (rd.from_arrow) so column names survive"
        )
    try:
        base = pa.schema(hint.base_schema)
    except Exception:
        base = pa.schema([pa.field(n, pa.large_string()) for n in hint.names])
    name, typ = extra
    if name is not None and name not in base.names:
        base = base.append(pa.field(name, typ or pa.large_string()))
    return base


def _empty_union_frame(lcols, rcols, dtypes) -> pd.DataFrame:
    """Typed zero-row frame in the tagged-union layout — handed to the
    join kernel when the whole union is empty (e.g. zero purchase events
    on a shard), so the kernel still emits its real output columns."""
    cols = lcols + [c for c in rcols if c not in lcols] + [_SIDE]
    return pd.DataFrame(
        {c: pd.Series(dtype=dtypes.get(c, "int8")) for c in cols}
    )


def _tagged_union(
    left: rd.Dataset,
    right: rd.Dataset,
    shared_ok: Sequence[str] = (),
    lhint=None,
    rhint=None,
    hint_extra=(_KEY, None),
):
    """Union two Datasets with disjoint-ish schemas: each side gains the
    other's columns as typed nulls plus a ``__side`` tag. Columns named in
    ``shared_ok`` may exist on both sides (same meaning, e.g. a bin/bucket
    key) and are kept as one column. Returns
    (union_ds, left_cols, right_cols, dtype_map)."""
    left, right = _ensure_arrow(left), _ensure_arrow(right)
    ls = _side_schema(left, lhint, hint_extra)
    rs = _side_schema(right, rhint, hint_extra)
    lcols, rcols = list(ls.names), list(rs.names)
    shared = (set(lcols) & set(rcols)) - set(shared_ok)
    if shared:
        raise ValueError(
            f"asof/range join sides must have disjoint column names, got {sorted(shared)}; "
            "rename one side (e.g. prefix the right columns) before joining"
        )

    def pad(other: pa.Schema, own: pa.Schema, side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            for f in other:
                if f.name not in own.names:
                    t = t.append_column(f.name, pa.nulls(n, f.type))
            return t.append_column(_SIDE, pa.array(np.full(n, side, dtype=np.int8)))

        return fn

    order = lcols + [c for c in rcols if c not in lcols] + [_SIDE]
    lt = left.map_batches(pad(rs, ls, 0), batch_format="pyarrow").select_columns(order)
    rt = right.map_batches(pad(ls, rs, 1), batch_format="pyarrow").select_columns(order)
    dtypes = {**_pandas_dtypes(ls), **_pandas_dtypes(rs)}
    return lt.union(rt), lcols, rcols, dtypes


def _split_sides(g: pd.DataFrame, lcols, rcols, dtypes):
    """Undo the union: per-side frames with original dtypes restored
    (int columns null-promote to float64 across the union; every row of
    its own side is non-null, so the cast back is lossless)."""
    l = g.loc[g[_SIDE] == 0, lcols].astype({c: dtypes[c] for c in lcols})
    r = g.loc[g[_SIDE] == 1, rcols].astype({c: dtypes[c] for c in rcols})
    return l, r


def _bucketed_apply(
    ds: rd.Dataset, key: str, fn, limit: int, num_buckets: int, empty_frame=None
) -> rd.Dataset:
    """Size-adaptive grouped apply on a single key column (the joins' own
    variant of functions.agg.adaptive_grouped_apply: same cutover, but the
    frames carry mixed-side rows so the kernel splits them itself).
    ``empty_frame`` is the typed union-layout frame used when the whole
    union is empty (schema-less), so the kernel still runs and the result
    keeps the join's real output columns."""
    from de_ray.functions.agg import from_pandas_keep_schema, to_pandas_keep_schema

    lazy = ds
    ds = ds.materialize()
    if ds.count() <= limit or ds.schema() is None:
        df = to_pandas_keep_schema(ds)
        if df.shape[1] == 0:
            from de_ray.functions.agg import empty_df_from_schema

            rebuilt = empty_df_from_schema(lazy.schema())  # free when empty
            if rebuilt is not None:
                df = rebuilt
        if df.shape[1] == 0 and empty_frame is not None:
            df = empty_frame
        return from_pandas_keep_schema(fn(df).reset_index(drop=True))
    from de_ray.stages.canonicalize import stable_row_hash

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _bucket=(stable_row_hash(df, [key]) % num_buckets).astype("int64")
        )

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on_left: str,
    on_right: str,
    by_left: str,
    by_right: str,
    direction: str = "backward",
    tolerance=None,
    how: str = "inner",
    limit: int = DRIVER_FINAL_LIMIT,
    num_buckets: int = 64,
) -> rd.Dataset:
    """For every left row, attach the single right row of the same key
    whose ``on_right`` is nearest ``on_left`` in ``direction`` (backward:
    latest right ≤ left, ties-exact included — DuckDB ``ASOF JOIN``
    semantics). ``how='inner'`` drops unmatched left rows; ``'left'``
    keeps them with nulls. ``tolerance`` (pd.Timedelta for timestamps)
    bounds the match distance.

    Column names must be disjoint across sides. Distributed shape: one
    hash shuffle on the key, one ``pd.merge_asof(by=key)`` per bucket.
    """
    lhint, rhint = left, right  # resolved lazily, only on the empty path
    union, lcols, rcols, dtypes = _tagged_union(
        _with_key(left, by_left),
        _with_key(right, by_right),
        shared_ok=(_KEY,),
        lhint=lhint,
        rhint=rhint,
    )
    empty_frame = _empty_union_frame(lcols, rcols, dtypes)
    lcols = [c for c in lcols if c != _KEY]
    rcols = [c for c in rcols if c != _KEY]
    probe = next(c for c in rcols if c != by_right)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        l, r = _split_sides(g, lcols, rcols, dtypes)
        l = l.sort_values(on_left, kind="mergesort", ignore_index=True)
        r = r.sort_values(on_right, kind="mergesort", ignore_index=True)
        if len(l) == 0 or len(r) == 0:
            out = l.copy()
            for c in rcols:
                out[c] = pd.Series([pd.NA] * len(out), dtype="object")
        else:
            out = pd.merge_asof(
                l,
                r,
                left_on=on_left,
                right_on=on_right,
                left_by=by_left,
                right_by=by_right,
                direction=direction,
                tolerance=tolerance,
                allow_exact_matches=True,
            )
        if how == "inner":
            out = out[out[probe].notna()]
        return out.reset_index(drop=True)

    return _bucketed_apply(
        union, _KEY, kernel, limit, num_buckets, empty_frame=empty_frame
    )


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by_left: str,
    by_right: str,
    on: str,
    lo: str,
    hi: str,
    closed: str = "both",
    limit: int = DRIVER_FINAL_LIMIT,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Equality key + interval containment: all (left, right) pairs with
    ``left[by_left] == right[by_right]`` and ``left[on]`` inside
    ``[right[lo], right[hi]]`` (``closed`` ∈ both|left|right|neither).
    One hash shuffle on the key; per bucket an equality merge + one
    vectorized interval mask."""
    lhint, rhint = left, right  # resolved lazily, only on the empty path
    union, lcols, rcols, dtypes = _tagged_union(
        _with_key(left, by_left),
        _with_key(right, by_right),
        shared_ok=(_KEY,),
        lhint=lhint,
        rhint=rhint,
    )
    empty_frame = _empty_union_frame(lcols, rcols, dtypes)
    lcols = [c for c in lcols if c != _KEY]
    rcols = [c for c in rcols if c != _KEY]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        l, r = _split_sides(g, lcols, rcols, dtypes)
        out = l.merge(r, left_on=by_left, right_on=by_right)
        ge = out[on] >= out[lo] if closed in ("both", "left") else out[on] > out[lo]
        le = out[on] <= out[hi] if closed in ("both", "right") else out[on] < out[hi]
        return out[ge & le].reset_index(drop=True)

    return _bucketed_apply(
        union, _KEY, kernel, limit, num_buckets, empty_frame=empty_frame
    )


def equi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on_left: str,
    on_right: str,
    how: str = "inner",
    broadcast_limit: int = 2_000_000,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """General equality join, size-adaptive: a right side at or below
    ``broadcast_limit`` rows is shipped ONCE through the object store and
    each left batch hash-joins locally (pandas merge — no shuffle of the
    large side at all); a bigger right side goes through Ray Data's
    native distributed hash join (both sides shuffle on the key).

    ``num_partitions`` for the shuffle path defaults to the cluster CPU
    count — Ray's hash-join aggregator pool scales with it, and asking
    for many more aggregators than CPUs can stall a small cluster."""
    import ray

    from de_ray.state.broadcast import get_broadcast

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))
    right_m = right.materialize()
    if right_m.count() <= broadcast_limit:
        ref = ray.put(pa.Table.from_pandas(right_m.to_pandas()))

        def _to_df(tbl: pa.Table) -> pd.DataFrame:
            return tbl.to_pandas()

        def j(df: pd.DataFrame) -> pd.DataFrame:
            rdf = get_broadcast(ref, _to_df)
            return df.merge(rdf, left_on=on_left, right_on=on_right, how=how)

        return left.map_batches(j, batch_format="pandas")
    # Ray's hash join chokes on SCHEMA-LESS empty blocks (0-row partitions
    # of an upstream join/materialize lose their schema and the Acero
    # aggregator reports 'No match ... for key field' mid-shuffle) —
    # sanitize both sides by BLOCK METADATA (functions/joins.py helper; no
    # block ever crosses to the driver) and give the degenerate empty
    # sides the JOINED schema the other paths produce.
    from de_ray.functions.joins import drop_schemaless_empties

    left_a, right_a = _ensure_arrow(left), _ensure_arrow(right_m)
    lsch, rsch = left_a.schema(), right_a.schema()

    def _sch_cols(sch):
        return list(zip(sch.names, sch.types)) if sch is not None else []

    def _joined_empty() -> pa.Table:
        cols = {n: pa.array([], t) for n, t in _sch_cols(lsch)}
        for n, t in _sch_cols(rsch):
            if on_left == on_right and n == on_right:
                continue  # shared key collapses to one column
            cols.setdefault(n, pa.array([], t))
        return pa.table(cols)

    left_c = drop_schemaless_empties(left_a, _joined_empty)
    right_c = drop_schemaless_empties(right_a, _joined_empty)
    if left_c.count() == 0 or (right_c.count() == 0 and how == "inner"):
        return rd.from_arrow(_joined_empty())
    if right_c.count() == 0:  # how == "left": keep left rows, null right cols
        rcols = [
            (n, t)
            for n, t in _sch_cols(rsch)
            if not (on_left == on_right and n == on_right)
        ]

        def null_right(t: pa.Table) -> pa.Table:
            for n, ty in rcols:
                if n not in t.schema.names:
                    t = t.append_column(n, pa.nulls(len(t), ty))
            return t

        return left_c.map_batches(null_right, batch_format="pyarrow")
    return left_c.join(
        right_c,
        # Ray's hash join names the outer variant explicitly
        join_type={"inner": "inner", "left": "left_outer"}[how],
        num_partitions=num_partitions,
        on=(on_left,),
        right_on=(on_right,),
    )


def semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on_left: str,
    on_right: str,
    anti: bool = False,
    broadcast_limit: int = 5_000_000,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Keep left rows whose key appears (semi) / does not appear (anti)
    in the right side. The small-side set of distinct keys is broadcast
    ONCE via ``ray.put`` (plasma: one copy per node, zero-copy reads in
    every task) and each batch filters with a vectorized ``pc.is_in`` —
    no shuffle of the left side at all. Above ``broadcast_limit``
    distinct keys the sides hash-bucket through the union path and each
    bucket filters locally (one shuffle, still vectorized)."""
    import pyarrow.compute as pc
    import ray

    # per-batch unique first so only the batch vocabularies cross the wire,
    # then gate on the (upper-bound) row count BEFORE any driver collect
    keys_ds = (
        right.select_columns([on_right])
        .map_batches(
            lambda t: pa.table({on_right: t.column(on_right).unique()}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    if keys_ds.count() <= broadcast_limit:
        distinct = keys_ds.unique(on_right)
        ref = ray.put(pa.array(distinct))

        def flt(t: pa.Table) -> pa.Table:
            vs = ray.get(ref)
            m = pc.is_in(t.column(on_left), value_set=vs)
            if anti:
                m = pc.fill_null(pc.invert(m), True)
            else:
                m = pc.fill_null(m, False)
            return t.filter(m)

        return left.map_batches(flt, batch_format="pyarrow")

    # big right side: co-partition by key and filter per bucket. A key
    # named the same on both sides (e.g. two 'spog' key sets) is fine for
    # the broadcast path but would collide in the tagged union — rename
    # the right key internally
    r_key = on_right
    r_ds = keys_ds
    _lsch = left.schema()
    if on_right in (_lsch.names if _lsch is not None else []):
        r_key = f"__rkey_{on_right}"
        r_ds = keys_ds.map_batches(
            lambda t, _k=r_key: t.rename_columns([_k]), batch_format="pyarrow"
        )
    union, lcols, rcols, dtypes = _tagged_union(
        _with_key(left, on_left), _with_key(r_ds, r_key), shared_ok=(_KEY,)
    )
    lcols = [c for c in lcols if c != _KEY]
    rcols = [c for c in rcols if c != _KEY]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        l, r = _split_sides(g, lcols, rcols, dtypes)
        present = l[on_left].isin(r[r_key].unique())
        return (l[~present] if anti else l[present]).reset_index(drop=True)

    return _bucketed_apply(union, _KEY, kernel, limit=0, num_buckets=num_buckets)


def anti_join(left: rd.Dataset, right: rd.Dataset, *, on_left: str, on_right: str, **kw) -> rd.Dataset:
    """Left rows with NO key match on the right (see ``semi_join``)."""
    return semi_join(left, right, on_left=on_left, on_right=on_right, anti=True, **kw)


def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    lo: str,
    hi: str,
    bin_width,
    closed: str = "both",
    limit: int = DRIVER_FINAL_LIMIT,
    num_buckets: int = 64,
) -> rd.Dataset:
    """KEYLESS interval containment join: pairs where ``left[on]`` lies in
    ``[right[lo], right[hi]]``. No equality key to bucket on, so the
    timeline is binned: a left row lands in its one ``bin_width`` bin, a
    right interval is replicated to each overlapping bin (factor ≈
    span/bin_width + 1 — pick bin_width near the typical span), and pairs
    meet exactly once in the left row's bin. ``bin_width`` is a
    pd.Timedelta for timestamp columns, a number otherwise."""
    width = pd.Timedelta(bin_width).value if isinstance(
        bin_width, (pd.Timedelta, str)
    ) else bin_width

    def as_int(s: pd.Series) -> pd.Series:
        if pd.api.types.is_datetime64_any_dtype(s):
            # normalize RESOLUTION first: datetime64[us].astype(int64) yields
            # µs but Timedelta.value (our width) is ns — mixed-unit bins
            # replicate each interval ~10^3× (correct joins, absurd plans)
            return s.astype("datetime64[ns]").astype("int64")
        return s

    def bin_left(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_bin=(as_int(df[on]) // width).astype("int64"))

    def bin_right(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(_bin=pd.Series([], dtype="int64"))
        b0 = (as_int(df[lo]) // width).astype("int64").to_numpy()
        b1 = (as_int(df[hi]) // width).astype("int64").to_numpy()
        reps = (b1 - b0 + 1).clip(min=0)
        idx = np.repeat(np.arange(len(df)), reps)
        out = df.iloc[idx].reset_index(drop=True)
        # bin number within each row's replicated run: b0[i] + offset
        starts = np.repeat(b0, reps)
        offs = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        out["_bin"] = (starts + offs).astype("int64")
        return out

    lhint, rhint = left, right  # resolved lazily, only on the empty path
    lt = left.map_batches(bin_left, batch_format="pandas")
    rt = right.map_batches(bin_right, batch_format="pandas")
    union, lcols, rcols, dtypes = _tagged_union(
        lt, rt, shared_ok=("_bin",), lhint=lhint, rhint=rhint,
        hint_extra=("_bin", pa.int64()),
    )
    empty_frame = _empty_union_frame(lcols, rcols, dtypes)
    lcols = [c for c in lcols if c != "_bin"]
    rcols = [c for c in rcols if c != "_bin"]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        lm = g[_SIDE] == 0
        l = g.loc[lm, lcols + ["_bin"]].astype({c: dtypes[c] for c in lcols})
        r = g.loc[~lm, rcols + ["_bin"]].astype({c: dtypes[c] for c in rcols})
        out = l.merge(r, on="_bin").drop(columns=["_bin"])
        ge = out[on] >= out[lo] if closed in ("both", "left") else out[on] > out[lo]
        le = out[on] <= out[hi] if closed in ("both", "right") else out[on] < out[hi]
        return out[ge & le].reset_index(drop=True)

    return _bucketed_apply(
        union, "_bin", kernel, limit, num_buckets, empty_frame=empty_frame
    )
