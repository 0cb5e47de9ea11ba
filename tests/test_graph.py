"""Graph operators: PageRank (fixed-iteration) and connected components."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _pagerank_reference(edges, iters=3, d=0.85):
    """Dense numpy replay of the same fixed-iteration formula."""
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {v: i for i, v in enumerate(nodes)}
    deg = edges.groupby("src").size()
    r = np.ones(len(nodes))
    for _ in range(iters):
        s = np.zeros(len(nodes))
        w = {u: r[idx[u]] / deg[u] for u in deg.index}
        for u, v in zip(edges["src"], edges["dst"]):
            s[idx[v]] += w[u]
        r = (1.0 - d) + d * s
    return {v: round(r[idx[v]], 6) for v in nodes}


def test_pagerank_matches_dense_replay():
    from de_ray.dataops.graph import pagerank

    edges = pd.DataFrame(
        {
            "src": ["a", "a", "b", "c", "c", "d"],
            "dst": ["b", "c", "c", "a", "d", "a"],
        }
    )
    got = pagerank(rd.from_pandas(edges), iterations=3).to_pandas()
    want = _pagerank_reference(edges)
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert row["rank"] == pytest.approx(want[row["v"]], abs=2e-6)
    # forced distributed path must agree with the driver fast path
    dist = pagerank(rd.from_pandas(edges), iterations=3, driver_limit=0).to_pandas()
    for _, row in dist.iterrows():
        assert row["rank"] == pytest.approx(want[row["v"]], abs=2e-6)


def test_pagerank_dangling_and_sources():
    from de_ray.dataops.graph import pagerank

    # x -> y only: y is dangling (no out-edges), x has no in-edges
    edges = rd.from_pandas(pd.DataFrame({"src": ["x"], "dst": ["y"]}))
    got = pagerank(edges, iterations=2).to_pandas().set_index("v")["rank"]
    assert got["x"] == pytest.approx(0.15, abs=1e-9)
    # y: 0.15 + 0.85 * (r_x / 1) with r_x = 0.15 after round 1
    assert got["y"] == pytest.approx(0.15 + 0.85 * 0.15, abs=1e-6)


def test_connected_components_both_paths():
    from de_ray.dataops.graph import connected_components

    edges = pd.DataFrame(
        {"doc_a": [1, 2, 10, 20, 21], "doc_b": [2, 3, 11, 21, 22]}
    )
    ds = rd.from_pandas(edges)
    drv = connected_components(ds).to_pandas()
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    assert dict(zip(drv["node"], drv["cluster"])) == want
    # force the distributed min-label propagation path
    dist = connected_components(ds, driver_limit=0).to_pandas()
    assert dict(zip(dist["node"], dist["cluster"])) == want


def test_funnel_counts_hand_case():
    from de_ray.dataops.windows import funnel_counts

    rows = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3, 3, 3, 4],
            "event_type": [
                "view", "click", "purchase",          # u1 full funnel
                "click", "view",                      # u2 clicked BEFORE viewing
                "view", "purchase", "click",          # u3 purchase before click
                "purchase",                           # u4 never viewed
            ],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
                    "2024-01-01 00:00", "2024-01-01 01:00",
                    "2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
                    "2024-01-01 00:00",
                ]
            ),
        }
    )
    out = (
        funnel_counts(rd.from_pandas(rows), ["view", "click", "purchase"])
        .to_pandas()
        .set_index("step")["users"]
    )
    assert out[1] == 3  # u1, u2, u3 viewed
    assert out[2] == 2  # u1 and u3 clicked after first view
    assert out[3] == 1  # only u1 purchased after the click


def test_triangle_count_hand_graph():
    from de_ray.dataops.graph import triangle_count

    # K4 on {1,2,3,4} has 4 triangles; edge (5,6) adds none; duplicate and
    # reversed edges must not double-count
    edges = pd.DataFrame(
        {
            "a": [1, 1, 1, 2, 2, 3, 5, 3, 2],
            "b": [2, 3, 4, 3, 4, 4, 6, 1, 1],
        }
    )
    assert triangle_count(rd.from_pandas(edges)) == 4


def test_value_histogram_edges():
    from de_ray.dataops.stats import value_histogram

    df = pd.DataFrame({"v": [-5.0, 0.0, 0.99, 1.0, 9.99, 10.0, 25.0, None]})
    out = (
        value_histogram(rd.from_pandas(df), "v", lo=0.0, hi=10.0, bins=10)
        .to_pandas()
        .set_index("bin")["n"]
    )
    assert out[0] == 3  # -5 clamps in, 0.0 and 0.99 fall in bin 0
    assert out[1] == 1
    assert out[9] == 3  # 9.99 + 10.0 and 25.0 clamp to the last bin
    assert out.sum() == 7  # the NULL is dropped


def test_event_transitions_hand_case():
    from de_ray.dataops.windows import event_transitions

    rows = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
                    "2024-01-01 00:30", "2024-01-01 00:45",
                    "2024-01-01 05:00",
                ]
            ),
            "event_type": ["view", "click", "view", "view", "click", "view"],
            "event_id": [1, 2, 3, 4, 5, 6],
        }
    )
    ds = rd.from_pandas(rows)
    out = event_transitions(ds, k=10).to_pandas()
    got = {(r["a"], r["b"]): r["n"] for _, r in out.iterrows()}
    # u1: view->click, click->view; u2: view->click; u3 has no pair
    assert got == {("view", "click"): 2, ("click", "view"): 1}
    # partitioning invariance
    out2 = event_transitions(ds.repartition(4), k=10).to_pandas()
    assert {(r["a"], r["b"]): r["n"] for _, r in out2.iterrows()} == got
