"""BGP evaluation over Ray Datasets (J1/J2 + SELECT pipeline).

The reference's evaluator binds to storage through ``QueryableDataset``
(5 methods, ``src/sparql.rs:415-509``); ours binds through ``TripleSource``
(one method: ``scan``), so query planning is storage-agnostic (SURVEY §2.11):
``StoreSource`` scans the HDT-style store with filter pushdown,
``DatasetSource`` scans any in-flight triples Dataset.

Join strategy (J2): patterns are ordered greedily most-selective-first
(bound terms count), then pairwise joined on shared variables —
broadcast pandas merge when the small side fits (``ray.put`` once, merged
inside ``map_batches`` on the big side), ``Dataset.join`` hash join
otherwise. OPTIONAL = broadcast left join; UNION = aligned Dataset union.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from de_ray.model import (
    canonical_to_term,
    effective_string,
    Literal,
    typed_sort_key,
)
from de_ray.query.parser import (
    Call,
    Cmp,
    Const,
    Expr,
    GroupPattern,
    Logical,
    Query,
    TriplePattern,
    Var,
)

BROADCAST_ROWS = 1_000_000


# ---------------------------------------------------------------------------
# Triple sources
# ---------------------------------------------------------------------------


class StoreSource:
    """Scan an HDT-style store (graph union = default graph, src/serve.rs:58)."""

    def __init__(self, store, graphs: Optional[Sequence[str]] = None):
        self.store = store
        self.graphs = graphs

    def scan(self, s: Optional[str], p: Optional[str], o: Optional[str]) -> rd.Dataset:
        return self.store.pattern_scan(s=s, p=p, o=o, graphs=self.graphs)


class MultiSource:
    """Union of several TripleSources (AggregateHdt default-graph-union
    semantics, src/sparql.rs:14-22, src/serve.rs:58)."""

    def __init__(self, sources: Sequence):
        self.sources = list(sources)

    def scan(self, s, p, o) -> rd.Dataset:
        parts = [src.scan(s, p, o) for src in self.sources]
        out = parts[0]
        for d in parts[1:]:
            out = out.union(d)
        return out


def MultiStoreSource(stores, graphs: Optional[Sequence[str]] = None):
    return MultiSource([StoreSource(st, graphs) for st in stores])


class DatasetSource:
    """Scan a raw triples Dataset (query over raw RDF without a store)."""

    def __init__(self, ds: rd.Dataset):
        self.ds = ds

    def scan(self, s, p, o) -> rd.Dataset:
        bound = [(c, v) for c, v in (("subj", s), ("pred", p), ("obj", o)) if v is not None]
        if not bound:
            return self.ds

        def flt(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = None
            for col, val in bound:
                m = pc.equal(t.column(col), pa.scalar(val))
                mask = m if mask is None else pc.and_(mask, m)
            return t.filter(mask)

        return self.ds.map_batches(flt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Pattern → bindings
# ---------------------------------------------------------------------------


def _pattern_bindings(pat: TriplePattern, source) -> Tuple[List[str], rd.Dataset]:
    s = None if isinstance(pat.s, Var) else pat.s
    p = None if isinstance(pat.p, Var) else pat.p
    o = None if isinstance(pat.o, Var) else pat.o
    scan = source.scan(s, p, o)
    var_cols: List[Tuple[str, str]] = []  # (src_col, var_name)
    seen: dict[str, str] = {}
    eq_checks: List[Tuple[str, str]] = []
    for col, term in (("subj", pat.s), ("pred", pat.p), ("obj", pat.o)):
        if isinstance(term, Var):
            if term.name in seen:
                eq_checks.append((seen[term.name], col))
            else:
                seen[term.name] = col
                var_cols.append((col, term.name))
    vars_out = [v for _, v in var_cols]

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if eq_checks:
            mask = None
            for c1, c2 in eq_checks:
                m = pc.equal(t.column(c1), t.column(c2))
                mask = m if mask is None else pc.and_(mask, m)
            t = t.filter(mask)
        cols = {v: t.column(c) for c, v in var_cols}
        if not cols:  # fully-bound pattern → existence marker rows
            return pa.table({"__exists": pa.array([True] * len(t), pa.bool_())})
        return pa.table(cols)

    return vars_out, scan.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


def _broadcast_merge(big: rd.Dataset, small_df: pd.DataFrame, on: List[str], how: str = "inner") -> rd.Dataset:
    ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        from de_ray.state.broadcast import get_broadcast

        sdf = get_broadcast(ref)
        if not on:
            out = batch.merge(sdf, how="cross")
        else:
            out = batch.merge(sdf, on=on, how=how)
        if how == "left":  # unbound OPTIONAL vars: NaN → None (SPARQL unbound)
            out = out.astype(object).where(pd.notna(out), None)
        return out

    return big.map_batches(merge, batch_format="pandas", batch_size=64 * 1024)


def _join_bindings(
    a: Tuple[List[str], rd.Dataset], b: Tuple[List[str], rd.Dataset]
) -> Tuple[List[str], rd.Dataset]:
    vars_a, ds_a = a
    vars_b, ds_b = b
    shared = [v for v in vars_a if v in vars_b]
    out_vars = vars_a + [v for v in vars_b if v not in vars_a]
    ds_a = ds_a.materialize()
    ds_b = ds_b.materialize()
    na, nb = ds_a.count(), ds_b.count()
    small, big = (ds_a, ds_b) if na <= nb else (ds_b, ds_a)
    n_small = min(na, nb)
    if n_small <= BROADCAST_ROWS:
        small_df = small.to_pandas()
        joined = _broadcast_merge(big, small_df, on=shared)
    else:
        joined = big.join(
            small,
            join_type="inner",
            num_partitions=_join_partitions(),
            on=tuple(shared),
        )
    return out_vars, joined


def _join_partitions() -> int:
    """Hash-join aggregator actors each reserve a CPU slot — cap partitions
    at the session's CPU budget or the join deadlocks waiting for actors."""
    try:
        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    return max(2, min(32, n - 1))


def _left_join_optional(
    base: Tuple[List[str], rd.Dataset], opt: Tuple[List[str], rd.Dataset]
) -> Tuple[List[str], rd.Dataset]:
    vars_b, ds_b = base
    vars_o, ds_o = opt
    shared = [v for v in vars_b if v in vars_o]
    out_vars = vars_b + [v for v in vars_o if v not in vars_b]
    opt_df = ds_o.to_pandas()  # OPTIONAL side is the small side (documented)
    joined = _broadcast_merge(ds_b, opt_df, on=shared, how="left")
    return out_vars, joined


# ---------------------------------------------------------------------------
# FILTER evaluation (row-wise over canonical strings, memoized term parse)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=65536)
def _typed(s: str):
    t = canonical_to_term(s)
    if isinstance(t, Literal):
        from de_ray.model import literal_python_value

        return literal_python_value(t)
    return s


def _eval_expr(e: Expr, row: dict):
    import re as _re

    if isinstance(e, Var):
        return row.get(e.name)
    if isinstance(e, Const):
        return e.value
    if isinstance(e, Logical):
        if e.op == "!":
            return not _to_bool(_eval_expr(e.args[0], row))
        if e.op == "&&":
            return all(_to_bool(_eval_expr(a, row)) for a in e.args)
        return any(_to_bool(_eval_expr(a, row)) for a in e.args)
    if isinstance(e, Cmp):
        lv = _eval_expr(e.left, row)
        rv = _eval_expr(e.right, row)
        if lv is None or rv is None:
            return False
        lt = _typed(lv) if isinstance(lv, str) and lv else lv
        rt = _typed(rv) if isinstance(rv, str) and rv else rv
        # numeric vs string comparison coherence
        if isinstance(lt, (int, float)) != isinstance(rt, (int, float)):
            lt, rt = str(lt), str(rt)
        try:
            if e.op == "=":
                return lt == rt
            if e.op == "!=":
                return lt != rt
            if e.op == "<":
                return lt < rt
            if e.op == ">":
                return lt > rt
            if e.op == "<=":
                return lt <= rt
            if e.op == ">=":
                return lt >= rt
        except TypeError:
            return False
    if isinstance(e, Call):
        args = [_eval_expr(a, row) for a in e.args]
        if e.fn == "BOUND":
            return args[0] is not None
        if any(a is None for a in args):
            return None
        if e.fn == "STR":
            return f'"{effective_string(args[0])}"'
        if e.fn == "LANG":
            t = canonical_to_term(args[0])
            return f'"{t.lang or ""}"' if isinstance(t, Literal) else '""'
        if e.fn == "DATATYPE":
            t = canonical_to_term(args[0])
            if isinstance(t, Literal):
                from de_ray.model import XSD_STRING

                return t.datatype or XSD_STRING
            return None
        if e.fn == "REGEX":
            flags = _re.I if (len(args) > 2 and "i" in effective_string(args[2])) else 0
            return _re.search(effective_string(args[1]), effective_string(args[0]), flags) is not None
        if e.fn == "CONTAINS":
            return effective_string(args[1]) in effective_string(args[0])
        if e.fn == "STRSTARTS":
            return effective_string(args[0]).startswith(effective_string(args[1]))
        if e.fn == "STRENDS":
            return effective_string(args[0]).endswith(effective_string(args[1]))
        if e.fn == "LCASE":
            return f'"{effective_string(args[0]).lower()}"'
        if e.fn == "UCASE":
            return f'"{effective_string(args[0]).upper()}"'
        if e.fn == "STRLEN":
            return len(effective_string(args[0]))
    raise ValueError(f"cannot evaluate {e!r}")


def _to_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v is None:
        return False
    if isinstance(v, (int, float)):
        return v != 0
    if isinstance(v, str):
        t = _typed(v)
        if isinstance(t, bool):
            return t
        return bool(t)
    return bool(v)


def _apply_bind(ds: rd.Dataset, expr: Expr, name: str) -> rd.Dataset:
    def bind(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df[name] = pd.Series([], dtype=object)
            return df
        vals = []
        for r in df.to_dict("records"):
            row = {k: (None if pd.isna(v) else v) for k, v in r.items()}
            try:
                v = _eval_expr(expr, row)
            except Exception:
                v = None
            if isinstance(v, bool):
                v = f'"{str(v).lower()}"^^<http://www.w3.org/2001/XMLSchema#boolean>'
            elif isinstance(v, (int, float)):
                v = _format_numeric_literal(v)
            vals.append(v)
        df[name] = vals
        return df

    return ds.map_batches(bind, batch_format="pandas", batch_size=64 * 1024)


def _apply_filters(ds: rd.Dataset, filters: List[Expr]) -> rd.Dataset:
    if not filters:
        return ds

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        rows = df.to_dict("records")
        keep = [
            all(_to_bool(_eval_expr(f, {k: (None if pd.isna(v) else v) for k, v in r.items()})) for f in filters)
            for r in rows
        ]
        return df[pd.Series(keep, index=df.index)]

    return ds.map_batches(flt, batch_format="pandas", batch_size=64 * 1024)


# ---------------------------------------------------------------------------
# Group evaluation
# ---------------------------------------------------------------------------


def _greedy_order(patterns: List[TriplePattern]) -> List[TriplePattern]:
    """Most-selective-first, then prefer patterns sharing a variable."""

    def selectivity(p: TriplePattern) -> int:
        return sum(0 if isinstance(t, Var) else 1 for t in (p.s, p.p, p.o))

    remaining = sorted(patterns, key=selectivity, reverse=True)
    if not remaining:
        return []
    ordered = [remaining.pop(0)]
    bound = {t.name for p in ordered for t in (p.s, p.p, p.o) if isinstance(t, Var)}
    while remaining:
        nxt = None
        for cand in remaining:
            cvars = {t.name for t in (cand.s, cand.p, cand.o) if isinstance(t, Var)}
            if cvars & bound:
                nxt = cand
                break
        if nxt is None:
            nxt = remaining[0]
        remaining.remove(nxt)
        ordered.append(nxt)
        bound |= {t.name for t in (nxt.s, nxt.p, nxt.o) if isinstance(t, Var)}
    return ordered


def _eval_group(g: GroupPattern, source) -> Tuple[List[str], rd.Dataset]:
    parts: List[Tuple[List[str], rd.Dataset]] = []
    for pat in _greedy_order(g.patterns):
        parts.append(_pattern_bindings(pat, source))
    if not parts and not g.unions and not g.values:
        return [], rd.from_items([{"__exists": True}])
    cur = parts[0] if parts else None
    for nxt in parts[1:]:
        cur = _join_bindings(cur, nxt)
    for left, right in g.unions:
        lv, lds = _eval_group(left, source)
        rv, rds = _eval_group(right, source)
        uv = lv + [v for v in rv if v not in lv]
        lds = _align_columns(lds, lv, uv)
        rds = _align_columns(rds, rv, uv)
        u = (uv, lds.union(rds))
        cur = u if cur is None else _join_bindings(cur, u)
    if cur is None and g.values:
        vs, rows = g.values[0]
        vnames = [v.name for v in vs]
        cur = (vnames, rd.from_pandas(pd.DataFrame(rows, columns=vnames)))
        rest = g.values[1:]
    else:
        rest = g.values
    vars_out, ds = cur
    for vs, rows in rest:
        vnames = [v.name for v in vs]
        vdf = pd.DataFrame(rows, columns=vnames)
        shared = [v for v in vars_out if v in vnames]
        ds = _broadcast_merge(ds, vdf, on=shared, how="inner" if shared else "cross")
        vars_out = vars_out + [v for v in vnames if v not in vars_out]
    for expr, var in g.binds:
        ds = _apply_bind(ds, expr, var.name)
        if var.name not in vars_out:
            vars_out = vars_out + [var.name]
    ds = _apply_filters(ds, g.filters)
    for opt in g.optionals:
        ov, ods = _eval_group(opt, source)
        vars_out, ds = _left_join_optional((vars_out, ds), (ov, ods))
    for sub, anti in [(m, True) for m in g.minus + g.not_exists] + [
        (e, False) for e in g.exists
    ]:
        sv, sds = _eval_group(sub, source)
        shared = [v for v in vars_out if v in sv]
        if not shared:
            continue  # MINUS with disjoint vars removes nothing (SPARQL spec)
        ds = _semi_anti_join(ds, sds, shared, anti=anti)
    return vars_out, ds


def _semi_anti_join(ds: rd.Dataset, sub: rd.Dataset, on: List[str], anti: bool) -> rd.Dataset:
    """Semi/anti join via a broadcast key set (the sub-pattern result is the
    small side; at scale this becomes a Bloom-filter broadcast)."""
    keys_df = sub.select_columns(on).to_pandas().drop_duplicates()
    key_set = set(map(tuple, keys_df.itertuples(index=False)))
    ref = ray.put(key_set)

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        from de_ray.state.broadcast import get_broadcast

        ks = get_broadcast(ref)
        mask = df[on].apply(lambda r: tuple(r) in ks, axis=1) if len(df) else pd.Series([], dtype=bool)
        if anti:
            mask = ~mask
        return df[mask]

    return ds.map_batches(flt, batch_format="pandas", batch_size=64 * 1024)


def _align_columns(ds: rd.Dataset, have: List[str], want: List[str]) -> rd.Dataset:
    missing = [v for v in want if v not in have]
    if not missing:
        return ds.select_columns(want) if have != want else ds

    def add(df: pd.DataFrame) -> pd.DataFrame:
        for m in missing:
            df[m] = None
        return df[want]

    return ds.map_batches(add, batch_format="pandas")


# ---------------------------------------------------------------------------
# Results
# ---------------------------------------------------------------------------


@dataclass
class SolutionsResult:
    variables: List[str]
    ds: rd.Dataset  # columns = variables (canonical strings; None = unbound)


@dataclass
class BooleanResult:
    value: bool


@dataclass
class GraphResult:
    ds: rd.Dataset  # (subj, pred, obj)


def _order_and_slice(q: Query, vars_out: List[str], ds: rd.Dataset) -> rd.Dataset:
    if q.order_by:
        key_cols = []
        descending = []
        order_specs = [(v.name, desc) for v, desc in q.order_by]

        def add_keys(df: pd.DataFrame) -> pd.DataFrame:
            for i, (vn, _) in enumerate(order_specs):
                if vn not in df.columns:  # empty block artifacts lack columns
                    df[vn] = pd.Series([], dtype=object)
                keys = df[vn].map(lambda s: typed_sort_key(s) if isinstance(s, str) else (-1, ""))
                df[f"__k{i}_tier"] = keys.map(lambda k: k[0]).astype("int32")
                df[f"__k{i}_num"] = keys.map(
                    lambda k: k[1] if isinstance(k[1], (int, float)) else 0.0
                ).astype("float64")
                df[f"__k{i}_str"] = keys.map(
                    lambda k: k[1] if isinstance(k[1], str) else ""
                )
            return df

        ds = ds.map_batches(add_keys, batch_format="pandas")
        for i, (_, desc) in enumerate(order_specs):
            key_cols += [f"__k{i}_tier", f"__k{i}_num", f"__k{i}_str"]
            descending += [desc, desc, desc]
        ds = ds.sort(key_cols, descending=descending)
        ds = ds.drop_columns([c for c in ds.schema().names if c.startswith("__k")])
    if q.offset or q.limit is not None:
        n = (q.offset or 0) + (q.limit if q.limit is not None else 0)
        if q.limit is not None:
            ds = ds.limit(n)
        if q.offset:
            df = ds.to_pandas().iloc[q.offset :]
            ds = rd.from_pandas(df.reset_index(drop=True))
    return ds


def _distinct(ds: rd.Dataset, cols: List[str]) -> rd.Dataset:
    from de_ray.stages.canonicalize import canonicalize_stage

    return canonicalize_stage(ds, cols=cols)


def _format_numeric_literal(v) -> str:
    from de_ray.model import XSD_DECIMAL, XSD_INTEGER

    if isinstance(v, bool):
        v = int(v)
    if isinstance(v, int) or (isinstance(v, float) and v.is_integer() and abs(v) < 1e15):
        return f'"{int(v)}"^^<{XSD_INTEGER}>'
    return f'"{v}"^^<{XSD_DECIMAL}>'


def _eval_aggregates(q: Query, vars_out: List[str], ds: rd.Dataset):
    """GROUP BY + COUNT/SUM/AVG/MIN/MAX/GROUP_CONCAT/SAMPLE + HAVING (G2).

    Grouped path: ``groupby(group_vars).map_groups`` (distributed); global
    aggregates (no GROUP BY) run per-batch partials merged on the driver.
    Aggregate results are canonical literal strings so serializers and
    ORDER BY work unchanged.
    """
    group_vars = [v.name for v in q.group_by]
    aggs = q.aggregates
    out_cols = group_vars + [a.alias.name for a in aggs]

    def agg_rows(gdf: pd.DataFrame) -> dict:
        row = {v: gdf[v].iloc[0] for v in group_vars} if len(gdf) else {}
        for a in aggs:
            if a.fn == "COUNT":
                if a.var is None:
                    val = len(gdf)
                else:
                    col = gdf[a.var.name].dropna()
                    val = col.nunique() if a.distinct else len(col)
                row[a.alias.name] = _format_numeric_literal(val)
                continue
            col = gdf[a.var.name].dropna()
            if a.distinct:
                col = col.drop_duplicates()
            if a.fn == "SAMPLE":
                row[a.alias.name] = col.iloc[0] if len(col) else None
                continue
            if a.fn == "GROUP_CONCAT":
                from de_ray.model import effective_string

                row[a.alias.name] = (
                    '"' + " ".join(effective_string(x) for x in col) + '"'
                )
                continue
            typed_vals = [_typed(x) for x in col]
            nums = [v for v in typed_vals if isinstance(v, (int, float)) and not isinstance(v, bool)]
            if a.fn in ("SUM", "AVG"):
                if not nums:
                    row[a.alias.name] = _format_numeric_literal(0)
                else:
                    s = sum(nums)
                    row[a.alias.name] = _format_numeric_literal(
                        s if a.fn == "SUM" else s / len(nums)
                    )
            elif a.fn in ("MIN", "MAX"):
                if not len(col):
                    row[a.alias.name] = None
                else:
                    keyed = sorted(col, key=typed_sort_key)
                    row[a.alias.name] = keyed[0] if a.fn == "MIN" else keyed[-1]
        return row

    if group_vars:
        def per_group(gdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame([agg_rows(gdf)], columns=out_cols)

        out = ds.groupby(group_vars).map_groups(per_group, batch_format="pandas")
    else:
        # global aggregate: the binding set reduces to ONE row; collecting the
        # var columns is bounded by the pre-aggregation input here (small-side
        # assumption documented; partials-merge is the scale path)
        df = ds.to_pandas()
        out = rd.from_pandas(pd.DataFrame([agg_rows(df)], columns=out_cols))
    if q.having:
        out = _apply_filters(out, q.having)
    sel = out_cols
    if q.variables or q.aggregates:
        sel = [v.name for v in q.variables] + [a.alias.name for a in aggs]
    out = _align_columns(out, out_cols, sel)
    out = _order_and_slice(q, sel, out)
    return SolutionsResult(sel, out)


def evaluate(q: Query, source):
    """Evaluate a parsed query against a TripleSource."""
    vars_out, ds = _eval_group(q.where, source)
    if q.form == "ASK":
        try:
            row = ds.take(1)
        except Exception:
            row = []
        return BooleanResult(bool(row))
    if q.form == "SELECT" and (q.aggregates or q.group_by):
        return _eval_aggregates(q, vars_out, ds)
    if q.form == "SELECT":
        sel = [v.name for v in q.variables] if q.variables else vars_out
        # ORDER BY vars outside the projection must survive until the sort
        extra = [v.name for v, _ in q.order_by if v.name not in sel and v.name in vars_out]
        ds = _align_columns(ds, vars_out, sel + extra)
        if q.distinct:
            ds = _distinct(ds, sel + extra)
        ds = _order_and_slice(q, sel + extra, ds)
        if extra:
            ds = ds.drop_columns(extra)
        return SolutionsResult(sel, ds)
    if q.form == "CONSTRUCT":
        template = q.template

        def build(df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for r in df.to_dict("records"):
                for pat in template:
                    s = r.get(pat.s.name) if isinstance(pat.s, Var) else pat.s
                    p = r.get(pat.p.name) if isinstance(pat.p, Var) else pat.p
                    o = r.get(pat.o.name) if isinstance(pat.o, Var) else pat.o
                    if s is None or p is None or o is None:
                        continue
                    rows.append({"subj": s, "pred": p, "obj": o})
            return pd.DataFrame(rows, columns=["subj", "pred", "obj"])

        out = ds.map_batches(build, batch_format="pandas")
        return GraphResult(_distinct(out, ["subj", "pred", "obj"]))
    if q.form == "DESCRIBE":
        iris: List[str] = []
        for t in q.describe_terms:
            if isinstance(t, Var):
                col = ds.select_columns([t.name]).to_pandas()[t.name].dropna().unique()
                iris.extend(col.tolist())
            else:
                iris.append(t)
        parts = [source.scan(i, None, None) for i in sorted(set(iris))]
        if not parts:
            return GraphResult(rd.from_items([]))
        out = parts[0]
        for d in parts[1:]:
            out = out.union(d)
        out = out.map_batches(
            lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow"
        )
        return GraphResult(out)
    raise ValueError(f"unsupported query form {q.form}")
