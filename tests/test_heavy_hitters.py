"""Misra-Gries + exact-recount heavy hitters (dataops/text.py): exact
top-k whenever the guarantee holds, loud failure when it cannot."""

import pytest
import ray.data as rd

from de_ray.dataops.text import heavy_hitters, term_frequencies


def _corpus():
    # zipf-ish: "alpha" dominates, then "beta", then a long tail
    rows = []
    for i in range(40):
        rows.append({"text": "alpha beta alpha tail%d alpha" % i})
    for i in range(10):
        rows.append({"text": "beta gamma tail%d" % (100 + i)})
    return rd.from_items(rows)


def test_matches_exact_top_k(ray_session):
    ds = _corpus()
    got = heavy_hitters(ds, k=3, capacity=32).take_all()
    want = term_frequencies(ds, top_k=3).take_all()
    assert [(r["w"], r["n"]) for r in got] == [(r["w"], r["n"]) for r in want]
    assert got[0]["w"] == "alpha" and got[0]["n"] == 120


def test_compression_engages_and_stays_exact(ray_session):
    # capacity (16) smaller than the 53-term vocabulary: the block compresses,
    # yet the heavy head survives the MG bound and the recount is exact
    ds = _corpus()
    got = heavy_hitters(ds, k=2, capacity=16).take_all()
    assert [r["w"] for r in got] == ["alpha", "beta"]


def test_guarantee_violation_raises(ray_session):
    # k deep into the uniform tail: k-th count cannot clear N/capacity
    ds = _corpus()
    with pytest.raises(ValueError, match="raise capacity"):
        heavy_hitters(ds, k=20, capacity=16)


def test_under_k_candidates_raise_when_pruned(ray_session):
    """3 heavy terms + a long unique tail pruned by per-block compression:
    returning the 3 survivors as a 'top-10' would be silently incomplete —
    must raise instead (code-review r3 finding #1)."""
    rows = [{"text": " ".join(["h1"] * 100 + ["h2"] * 90 + ["h3"] * 80)}]
    for i in range(50):
        rows.append({"text": f"tail{i}"})
    ds = rd.from_items(rows)
    with pytest.raises(ValueError, match="candidates for k"):
        heavy_hitters(ds, k=10, capacity=8)


def test_under_k_ok_when_nothing_pruned(ray_session):
    """Fewer distinct terms than k with NO pruning anywhere: the short
    head IS the complete exact ranking and must be returned."""
    ds = rd.from_items([{"text": "a a b"}])
    got = heavy_hitters(ds, k=10, capacity=64).take_all()
    assert [(r["w"], r["n"]) for r in got] == [("a", 2), ("b", 1)]


def test_distributed_final_path(ray_session):
    ds = _corpus()
    got = heavy_hitters(ds, k=2, capacity=64, driver_limit=0).take_all()
    assert [r["w"] for r in got] == ["alpha", "beta"]
