"""Blank-node syntax in query patterns (SPARQL 1.1 grammar [98]-[105]):
``[ p o ; ... ]`` property lists, ``[]`` anonymous nodes, labeled ``_:x``
nodes (existential vars, §4.1.4), and ``( ... )`` RDF collections.

The reference gets these from spargebra's full grammar
(``/root/reference/src/sparql.rs:511-521``)."""

import ray.data as rd

from de_ray.model import RDF
from de_ray.query.engine import DatasetSource, evaluate
from de_ray.query.parser import TriplePattern, Var, parse_query

EX = "http://example.org/"


def _triples(q):
    return q.where.patterns


def test_parse_bnode_property_list_object():
    q = parse_query(
        f"SELECT ?s WHERE {{ ?s <{EX}knows> [ <{EX}name> ?n ; <{EX}age> ?a ] }}"
    )
    pats = _triples(q)
    assert len(pats) == 3
    head = [p for p in pats if p.s == Var("s")]
    assert len(head) == 1
    b = head[0].o
    assert isinstance(b, Var) and b.name.startswith("!b")
    assert TriplePattern(b, f"{EX}name", Var("n")) in pats
    assert TriplePattern(b, f"{EX}age", Var("a")) in pats


def test_parse_bnode_subject_standalone():
    q = parse_query(f"SELECT ?n WHERE {{ [ <{EX}name> ?n ] . ?x <{EX}p> ?y }}")
    pats = _triples(q)
    assert len(pats) == 2
    assert isinstance(pats[0].s, Var) and pats[0].s.name.startswith("!b")


def test_parse_labeled_bnodes_shared():
    q = parse_query(
        f"SELECT ?n WHERE {{ _:a <{EX}name> ?n . _:a <{EX}age> ?g . _:b <{EX}name> ?m }}"
    )
    pats = _triples(q)
    assert pats[0].s == pats[1].s  # same label, same hidden var
    assert pats[0].s != pats[2].s
    assert pats[0].s.name.startswith("!b_")


def test_parse_anonymous_bnodes_distinct():
    q = parse_query(f"SELECT ?x WHERE {{ [] <{EX}p> ?x . [] <{EX}q> ?x }}")
    pats = _triples(q)
    assert pats[0].s != pats[1].s


def test_parse_collection():
    q = parse_query(f"SELECT ?x WHERE {{ ?x <{EX}list> ( 1 2 ) }}")
    pats = _triples(q)
    # head triple + 2×(first, rest)
    assert len(pats) == 5
    head = next(p for p in pats if p.p == f"{EX}list").o
    assert isinstance(head, Var) and head.name.startswith("!banon")
    firsts = [p for p in pats if p.p == RDF + "first"]
    rests = [p for p in pats if p.p == RDF + "rest"]
    assert len(firsts) == 2 and len(rests) == 2
    assert rests[-1].o == RDF + "nil"


def test_parse_empty_collection_is_nil():
    q = parse_query(f"SELECT ?x WHERE {{ ?x <{EX}list> () }}")
    pats = _triples(q)
    assert len(pats) == 1
    assert pats[0].o == RDF + "nil"


def _ds():
    rows = [
        {"subj": f"{EX}alice", "pred": f"{EX}knows", "obj": f"{EX}bob"},
        {"subj": f"{EX}bob", "pred": f"{EX}name", "obj": '"Bob"'},
        {"subj": f"{EX}bob", "pred": f"{EX}age", "obj": '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'},
        {"subj": f"{EX}carol", "pred": f"{EX}name", "obj": '"Carol"'},
    ]
    return rd.from_items(rows)


def test_eval_bnode_property_list(ray_session):
    q = parse_query(
        f"SELECT ?s WHERE {{ ?s <{EX}knows> [ <{EX}name> ?n ] }}"
    )
    res = evaluate(q, DatasetSource(_ds()))
    assert [r["s"] for r in res.ds.take_all()] == [f"{EX}alice"]


def test_eval_star_excludes_blank_vars(ray_session):
    q = parse_query(f"SELECT * WHERE {{ _:x <{EX}name> ?n }}")
    res = evaluate(q, DatasetSource(_ds()))
    rows = res.ds.take_all()
    assert len(rows) == 2
    assert set(rows[0].keys()) == {"n"}


def test_construct_template_bnode_fresh_per_solution(ray_session):
    q = parse_query(
        f"CONSTRUCT {{ ?s <{EX}attr> [ <{EX}nm> ?n ] }} "
        f"WHERE {{ ?s <{EX}name> ?n }}"
    )
    res = evaluate(q, DatasetSource(_ds()))
    rows = res.ds.take_all()
    # 2 solutions × 2 template triples
    assert len(rows) == 4
    heads = {r["obj"] for r in rows if r["pred"] == f"{EX}attr"}
    assert len(heads) == 2  # fresh bnode per solution
    assert all(h.startswith("_:") for h in heads)
    nm = {r["subj"] for r in rows if r["pred"] == f"{EX}nm"}
    assert nm == heads  # template wiring preserved


def test_construct_template_label_is_template_scoped(ray_session):
    """A template blank-node label shared with a WHERE label must mint a
    FRESH bnode (SPARQL 1.1 §16.2.1), never leak the WHERE binding."""
    q = parse_query(
        f"CONSTRUCT {{ _:n <{EX}p> ?x }} WHERE {{ _:n <{EX}name> ?x }}"
    )
    res = evaluate(q, DatasetSource(_ds()))
    rows = res.ds.take_all()
    assert rows, "construct produced no triples"
    assert all(r["subj"].startswith("_:") for r in rows)


def test_select_star_all_blank_vars(ray_session):
    """SELECT * over a pattern of only blank-node vars returns zero-column
    solutions instead of crashing (existence-style query)."""
    q = parse_query(f"SELECT * WHERE {{ _:x <{EX}name> _:y }}")
    res = evaluate(q, DatasetSource(_ds()))
    assert res.variables == []
    assert res.ds.count() == 2


def test_user_var_with_bnodeish_name_projected(ray_session):
    """?__bx is a LEGAL user variable and must survive SELECT * (hidden
    vars are minted with a '!' prefix no user var can collide with)."""
    q = parse_query(f"SELECT * WHERE {{ ?__bx <{EX}name> ?n }}")
    res = evaluate(q, DatasetSource(_ds()))
    rows = res.ds.take_all()
    assert set(rows[0].keys()) == {"__bx", "n"}


def test_bnode_label_does_not_swallow_statement_dot():
    """'_:b.' is label 'b' + the statement terminator (PN_LOCAL cannot end
    with '.'): both occurrences must unify to ONE hidden var."""
    q = parse_query(
        f"SELECT ?o WHERE {{ ?s <{EX}knows> _:b. _:b <{EX}name> ?o }}"
    )
    pats = _triples(q)
    assert len(pats) == 2
    assert pats[0].o == pats[1].s


def test_standalone_labeled_bnode_raises():
    """'_:a .' with no property list is a truncated triple — grammar error,
    not a silent no-op."""
    import pytest

    with pytest.raises(ValueError):
        parse_query(f"SELECT ?n WHERE {{ _:a . ?x <{EX}name> ?n }}")


def test_construct_applies_limit_to_solutions(ray_session):
    """CONSTRUCT ... LIMIT slices the SOLUTION sequence before template
    instantiation (§16.2)."""
    q = parse_query(
        f"CONSTRUCT {{ ?s <{EX}x> ?n }} WHERE {{ ?s <{EX}name> ?n }} "
        f"ORDER BY ?s LIMIT 1"
    )
    res = evaluate(q, DatasetSource(_ds()))
    rows = res.ds.take_all()
    assert len(rows) == 1
    assert rows[0]["subj"] == f"{EX}bob"  # first by ORDER BY ?s


def test_zero_column_subselect_multiplies(ray_session):
    """A non-DISTINCT all-bnode subselect is the empty binding with
    multiplicity n — joining multiplies cardinality (COUNT sees 2x2=4)."""
    q = parse_query(
        f"SELECT (COUNT(*) AS ?c) WHERE {{ ?s <{EX}name> ?n . "
        f"{{ SELECT * WHERE {{ _:a <{EX}name> _:b }} }} }}"
    )
    res = evaluate(q, DatasetSource(_ds()))
    c = res.ds.take_all()[0]["c"]
    assert c.split('"')[1] == "4"
