"""SPARQL semantic edge cases from the round-3 whole-file engine review:
LeftJoin over zero-var bases, unbound GROUP BY keys, VALUES UNDEF
wildcards, fn:substring clamping, ZeroLengthPath over absent terms."""

import ray.data as rd

from de_ray.query.engine import DatasetSource, evaluate
from de_ray.query.parser import parse_query

EX = "http://example.org/"


def _ds(rows):
    return rd.from_items(
        [{"subj": s, "pred": p, "obj": o} for s, p, o in rows]
    )


def test_optional_after_unmatched_bound_pattern_is_empty(ray_session):
    """LeftJoin(∅, X) = ∅: a fully-bound first pattern that matches nothing
    must yield ZERO rows even with a match-everything OPTIONAL."""
    ds = _ds([(f"{EX}a", f"{EX}b", f"{EX}c")])
    q = parse_query(
        f"SELECT * WHERE {{ <{EX}missing> <{EX}b> <{EX}c> "
        f"OPTIONAL {{ ?s ?p ?o }} }}"
    )
    assert evaluate(q, DatasetSource(ds)).ds.count() == 0


def test_optional_after_matched_bound_pattern_keeps_optional(ray_session):
    ds = _ds([(f"{EX}a", f"{EX}b", f"{EX}c")])
    q = parse_query(
        f"SELECT * WHERE {{ <{EX}a> <{EX}b> <{EX}c> OPTIONAL {{ ?s ?p ?o }} }}"
    )
    assert evaluate(q, DatasetSource(ds)).ds.count() == 1


def test_group_by_unbound_key_forms_a_group(ray_session):
    """Solutions with an unbound GROUP BY key are a valid group, not
    silently dropped (pandas dropna default)."""
    ds = _ds(
        [
            (f"{EX}d1", f"{EX}p", '"v1"'),
            (f"{EX}d2", f"{EX}p", '"v2"'),
            (f"{EX}d1", f"{EX}q", '"tag"'),
        ]
    )
    q = parse_query(
        f"SELECT ?x (COUNT(*) AS ?c) WHERE {{ ?s <{EX}p> ?o "
        f"OPTIONAL {{ ?s <{EX}q> ?x }} }} GROUP BY ?x"
    )
    rows = evaluate(q, DatasetSource(ds)).ds.take_all()
    got = {r["x"]: r["c"] for r in rows}
    assert '"tag"' in got
    assert None in got  # the unbound-?x group survives
    assert got[None].startswith('"1"')


def test_values_undef_is_wildcard(ray_session):
    """UNDEF is compatible with ANY binding (SPARQL 1.1 §10.2), not a
    literal None join key."""
    ds = _ds(
        [(f"{EX}d1", f"{EX}p", '"a"'), (f"{EX}d2", f"{EX}p", '"b"')]
    )
    q = parse_query(
        f"SELECT ?s ?o WHERE {{ ?s <{EX}p> ?o VALUES (?o) {{ (UNDEF) }} }}"
    )
    assert evaluate(q, DatasetSource(ds)).ds.count() == 2
    q2 = parse_query(
        f'SELECT ?s ?o WHERE {{ ?s <{EX}p> ?o VALUES (?o) {{ ("a") (UNDEF) }} }}'
    )
    # "a" matches d1; UNDEF matches both → 3 solutions (multiset)
    assert evaluate(q2, DatasetSource(ds)).ds.count() == 3


def test_substr_clamps_nonpositive_start(ray_session):
    ds = _ds([(f"{EX}d", f"{EX}p", '"hello"')])
    q = parse_query(
        f"SELECT ?r WHERE {{ ?s <{EX}p> ?o BIND(SUBSTR(?o, 0, 2) AS ?r) }}"
    )
    rows = evaluate(q, DatasetSource(ds)).ds.take_all()
    assert rows[0]["r"] == '"h"'  # fn:substring excludes position 0, keeps 1


def test_zero_length_path_matches_absent_bound_term(ray_session):
    """ASK { <x> p* <x> } is TRUE even when <x> is absent from the graph
    (ZeroLengthPath, SPARQL 1.1 §18.4)."""
    ds = _ds([(f"{EX}a", f"{EX}p", f"{EX}b")])
    q = parse_query(f"ASK {{ <{EX}nowhere> <{EX}p>* <{EX}nowhere> }}")
    assert evaluate(q, DatasetSource(ds)).value is True
