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


def test_distributed_final_path(ray_session):
    ds = _corpus()
    got = heavy_hitters(ds, k=2, capacity=64, driver_limit=0).take_all()
    assert [r["w"] for r in got] == ["alpha", "beta"]
