"""Distributed graph algorithms over edge Datasets.

The KG-construction pipeline ends with a graph (documents mentioning
entities, entities linked to entities); ranking and clustering that graph
are first-class corpus-curation steps (page/entity importance for
sampling weights, component grouping for leakage-safe train/test splits).

Both operators take a plain edge ``Dataset`` and stay distributed:
per-iteration work is one size-adaptive equi-join plus one combiner-first
grouped sum keyed on the destination — no driver-side adjacency, no
per-node Python. Reference semantics: the graph the reference serves is
queried with SPARQL (``/root/reference/src/sparql.rs``); these operators
are the scale-out analytics extension over the same triple data.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from de_ray.dataops.joins import equi_join
from de_ray.functions.agg import adaptive_distinct, adaptive_grouped_sum


def _sum_by(ds: rd.Dataset, key: str, val: str) -> rd.Dataset:
    """Combiner-first grouped float sum: per-batch partials (one row per
    (block, key)) then the size-adaptive final merge."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, as_index=False)[val].sum()

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=256 * 1024)
    return adaptive_grouped_sum(parts, key, val)


def pagerank(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    node_col: str = "v",
    rank_col: str = "rank",
    driver_limit: int = 2_000_000,
) -> rd.Dataset:
    """PageRank with a FIXED iteration count (deterministic, so any SQL
    engine can replay it by unrolling the same number of rounds):

        r_0(v) = 1;   r_{i+1}(v) = (1 − d) + d · Σ_{u→v} r_i(u) / outdeg(u)

    — the original non-normalized formulation; dangling nodes simply stop
    contributing (no global mass redistribution term, which would add a
    cross-node barrier per round for no semantic gain at curation scale).

    Scale shape per iteration: one size-adaptive equi-join of the edge set
    against the node-sized weight table (broadcast below the limit, hash
    join above) and one combiner-first grouped sum keyed on ``dst`` — the
    only all-to-all is that sum, and its input is already one row per
    (block, dst). State (one row per node) is materialized per round so
    the plan does not re-execute prior rounds. Edges are assumed distinct;
    pass ``adaptive_distinct(edges, [src, dst])`` first if they are not.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    base = 1.0 - damping

    # size-adaptive fast path (repo convention): below the limit the whole
    # edge list fits one task trivially, and the distributed loop's
    # 2·iterations materialize barriers would dominate wall time — iterate
    # vectorized on the driver instead (factorize → bincount rounds).
    import numpy as np

    edges = edges.materialize()
    if edges.count() <= driver_limit:
        df = edges.to_pandas()
        sv, dv = df[src].to_numpy(), df[dst].to_numpy()
        nodes_arr = np.unique(np.concatenate([sv, dv]))
        s = np.searchsorted(nodes_arr, sv)
        d = np.searchsorted(nodes_arr, dv)
        n = len(nodes_arr)
        deg = np.bincount(s, minlength=n)
        r = np.ones(n)
        nz = deg > 0
        for _ in range(iterations):
            w = np.zeros(n)
            w[nz] = r[nz] / deg[nz]
            sums = np.bincount(d, weights=w[s], minlength=n)
            r = base + damping * sums
        return rd.from_pandas(
            pd.DataFrame({node_col: nodes_arr, rank_col: np.round(r, 6)})
        )

    srcs = edges.map_batches(
        lambda df: df[[src]].rename(columns={src: node_col}),
        batch_format="pandas",
    )
    dsts = edges.map_batches(
        lambda df: df[[dst]].rename(columns={dst: node_col}),
        batch_format="pandas",
    )
    nodes = adaptive_distinct(srcs.union(dsts), node_col)

    deg = _sum_by(
        edges.map_batches(
            lambda df: df[[src]].rename(columns={src: node_col}).assign(d=1),
            batch_format="pandas",
        ),
        node_col,
        "d",
    )
    state = equi_join(
        nodes, deg, on_left=node_col, on_right=node_col, how="left"
    ).map_batches(
        lambda df: df.assign(d=df["d"].fillna(0).astype("int64"), r=1.0),
        batch_format="pandas",
    ).materialize()

    for _ in range(iterations):
        w = state.map_batches(
            lambda df: df[df["d"] > 0].assign(w=df["r"] / df["d"])[[node_col, "w"]],
            batch_format="pandas",
        )
        contrib = equi_join(
            edges, w, on_left=src, on_right=node_col
        ).map_batches(
            lambda df: df[[dst, "w"]].rename(columns={dst: node_col}),
            batch_format="pandas",
        )
        sums = _sum_by(contrib, node_col, "w")
        state = equi_join(
            state.select_columns([node_col, "d"]),
            sums,
            on_left=node_col,
            on_right=node_col,
            how="left",
        ).map_batches(
            lambda df: df.assign(r=base + damping * df["w"].fillna(0.0)).drop(
                columns=["w"]
            ),
            batch_format="pandas",
        ).materialize()

    return state.map_batches(
        lambda df: df.assign(**{rank_col: df["r"].round(6)})[[node_col, rank_col]],
        batch_format="pandas",
    )


def connected_components(
    edges: rd.Dataset,
    node_a: str = "doc_a",
    node_b: str = "doc_b",
    node_col: str = "node",
    label_col: str = "cluster",
    driver_limit: int = 2_000_000,
) -> rd.Dataset:
    """Connected components of an undirected edge set → one row per node
    with its component label (the minimum member id). Size-adaptive:
    driver union-find below ``driver_limit`` edges, iterative distributed
    min-label propagation above it (the machinery minhash near-dup
    clustering uses, exposed as a first-class graph operator)."""
    from de_ray.dataops.dedup import _connected_components

    renamed = edges.map_batches(
        lambda df: df[[node_a, node_b]].rename(
            columns={node_a: "doc_a", node_b: "doc_b"}
        ),
        batch_format="pandas",
    )
    labels = _connected_components(renamed, driver_limit=driver_limit)
    if isinstance(labels, dict):
        out = pd.DataFrame(
            {node_col: list(labels.keys()), label_col: list(labels.values())}
        ).sort_values(node_col, kind="mergesort")
        return rd.from_pandas(out.reset_index(drop=True))
    return labels.map_batches(
        lambda df: df.rename(columns={"node": node_col, "label": label_col}),
        batch_format="pandas",
    )


def triangle_count(
    edges: rd.Dataset,
    node_a: str = "a",
    node_b: str = "b",
) -> int:
    """Exact triangle count of an undirected simple graph — the standard
    two-round distributed algorithm with DEGREE ORIENTATION for hub
    safety: every edge is directed toward its higher-(degree, id)
    endpoint, so each node's out-degree is O(√m) regardless of hubs and
    the wedge join (edges ⋈ edges on the middle node = each wedge's
    minimum-order vertex) cannot explode on a celebrity node. Each
    triangle is generated exactly once, at its minimum vertex; closure
    testing is one semi-join of the wedge's outer pair (ordered by the
    same total order) against the oriented edge set. No step collects the
    graph to the driver."""
    import pandas as pd

    from de_ray.dataops.joins import equi_join, semi_join
    from de_ray.functions.agg import adaptive_distinct

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[node_a], df[node_b]
        out = pd.DataFrame({"a": a.where(a < b, b), "b": b.where(a < b, a)})
        return out[out["a"] != out["b"]]

    e = adaptive_distinct(
        edges.map_batches(canon, batch_format="pandas"), ["a", "b"]
    ).materialize()

    # degree per node over the canonical edge set
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = pd.concat([df["a"], df["b"]], ignore_index=True)
        return v.value_counts().rename_axis("v").reset_index(name="d")

    deg = adaptive_grouped_sum(
        e.map_batches(deg_partial, batch_format="pandas"), "v", "d"
    )

    # orient toward the higher-(degree, id) endpoint
    da = deg.map_batches(
        lambda df: df.rename(columns={"v": "a", "d": "da"}), batch_format="pandas"
    )
    db = deg.map_batches(
        lambda df: df.rename(columns={"v": "b", "d": "db"}), batch_format="pandas"
    )
    ed = equi_join(
        equi_join(e, da, on_left="a", on_right="a"), db, on_left="b", on_right="b"
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        fwd = (df["da"] < df["db"]) | ((df["da"] == df["db"]) & (df["a"] < df["b"]))
        lo = df["a"].where(fwd, df["b"])
        hi = df["b"].where(fwd, df["a"])
        dlo = df["da"].where(fwd, df["db"])
        dhi = df["db"].where(fwd, df["da"])
        return pd.DataFrame({"u": lo, "v": hi, "du": dlo, "dv": dhi})

    o = ed.map_batches(orient, batch_format="pandas").materialize()

    # wedges at the minimum-order vertex: join u's out-edges pairwise,
    # keeping the outer pair ordered by the same (degree, id) order
    right = o.map_batches(
        lambda df: df.rename(columns={"u": "u", "v": "w", "du": "du2", "dv": "dw"}),
        batch_format="pandas",
    )
    wedges = equi_join(o, right, on_left="u", on_right="u")

    def key(df: pd.DataFrame, x: str, y: str) -> pd.Series:
        return df[x].astype(str) + "\x1f" + df[y].astype(str)

    def wedge_keys(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["dv"] < df["dw"]) | ((df["dv"] == df["dw"]) & (df["v"] < df["w"]))
        d = df[keep]
        return pd.DataFrame({"k": key(d, "v", "w")})

    wk = wedges.map_batches(wedge_keys, batch_format="pandas")
    ek = o.map_batches(
        lambda df: pd.DataFrame({"k": key(df, "u", "v")}), batch_format="pandas"
    )
    closed = semi_join(wk, ek, on_left="k", on_right="k")
    return closed.count()
