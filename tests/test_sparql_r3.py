"""Round-3 SPARQL surface: spareval function-library completion (datetime
accessors, hashes, STRLANG/STRDT, ENCODE_FOR_URI, UUID/BNODE, GROUP_CONCAT
SEPARATOR — reference src/sparql.rs:511-521), negated property sets,
distributed transitive closure, vectorized BIND parity, OFFSET streaming."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import de_ray.query.engine as eng
from de_ray.query.engine import DatasetSource, evaluate, _vec_value, _eval_expr
from de_ray.query.parser import parse_query
from de_ray.rdfio.ntriples import parse_nt_line

EX = "PREFIX ex: <http://example.org/> "
XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"


def _ds(nt_lines):
    rows = []
    for ln in nt_lines:
        s, p, o = parse_nt_line(ln)
        rows.append({"subj": s, "pred": p, "obj": o})
    return rd.from_pandas(pd.DataFrame(rows))


@pytest.fixture(scope="module")
def people():
    return DatasetSource(_ds([
        '<http://example.org/alice> <http://example.org/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://example.org/alice> <http://example.org/name> "Alice" .',
        '<http://example.org/bob> <http://example.org/age> "20"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://example.org/carol> <http://example.org/age> "40"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://example.org/carol> <http://example.org/name> "Carol" .',
        '<http://example.org/alice> <http://example.org/knows> <http://example.org/bob> .',
        '<http://example.org/bob> <http://example.org/knows> <http://example.org/carol> .',
    ]))


@pytest.fixture(scope="module")
def events_src():
    return DatasetSource(_ds([
        f'<http://example.org/e1> <http://example.org/ts> "2024-03-05T12:34:56-05:00"^^<{XSD_DT}> .',
        f'<http://example.org/e2> <http://example.org/ts> "2023-11-20T08:05:09.5Z"^^<{XSD_DT}> .',
        '<http://example.org/e3> <http://example.org/ts> "2022-01-02"^^<http://www.w3.org/2001/XMLSchema#date> .',
    ]))


def _rows(res):
    return res.ds.take_all()


def _one(src, query):
    rows = _rows(evaluate(parse_query(query), src))
    assert len(rows) == 1
    return rows[0]


# --- datetime accessors -----------------------------------------------------


def test_year_month_day(events_src):
    r = _one(events_src, EX + "SELECT ?y ?m ?d WHERE { ex:e1 ex:ts ?t "
             "BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?m) BIND(DAY(?t) AS ?d) }")
    assert r["y"] == '"2024"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert r["m"] == '"3"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert r["d"] == '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'


def test_hours_minutes_seconds(events_src):
    r = _one(events_src, EX + "SELECT ?h ?mi ?s WHERE { ex:e2 ex:ts ?t "
             "BIND(HOURS(?t) AS ?h) BIND(MINUTES(?t) AS ?mi) BIND(SECONDS(?t) AS ?s) }")
    assert r["h"] == '"8"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert r["mi"] == '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert r["s"] == '"9.5"^^<http://www.w3.org/2001/XMLSchema#decimal>'


def test_tz_and_timezone(events_src):
    r = _one(events_src, EX + "SELECT ?tz ?dur WHERE { ex:e1 ex:ts ?t "
             "BIND(TZ(?t) AS ?tz) BIND(TIMEZONE(?t) AS ?dur) }")
    assert r["tz"] == '"-05:00"'
    assert r["dur"] == '"-PT5H"^^<http://www.w3.org/2001/XMLSchema#dayTimeDuration>'
    r2 = _one(events_src, EX + "SELECT ?dur WHERE { ex:e2 ex:ts ?t "
              "BIND(TIMEZONE(?t) AS ?dur) }")
    assert r2["dur"] == '"PT0S"^^<http://www.w3.org/2001/XMLSchema#dayTimeDuration>'


def test_date_only_accessors(events_src):
    r = _one(events_src, EX + "SELECT ?y ?h ?tz WHERE { ex:e3 ex:ts ?t "
             "BIND(YEAR(?t) AS ?y) BIND(HOURS(?t) AS ?h) BIND(TZ(?t) AS ?tz) }")
    assert r["y"] == '"2022"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert r["h"] is None  # no time component → error → unbound
    assert r["tz"] == '""'


def test_hours_filter(events_src):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?e WHERE { ?e ex:ts ?t FILTER(YEAR(?t) >= 2023) } ORDER BY ?e"
    ), events_src))
    assert [r["e"] for r in rows] == ["http://example.org/e1", "http://example.org/e2"]


# --- hash functions ---------------------------------------------------------


def test_hash_functions(people):
    r = _one(people, EX + 'SELECT ?m ?s WHERE { '
             'BIND(MD5("abc") AS ?m) BIND(SHA256("abc") AS ?s) }')
    assert r["m"] == '"900150983cd24fb0d6963f7d28e17f72"'
    assert r["s"] == '"ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"'


def test_sha1_sha384_sha512_lengths(people):
    r = _one(people, EX + 'SELECT ?a ?b ?c WHERE { '
             'BIND(SHA1("x") AS ?a) BIND(SHA384("x") AS ?b) BIND(SHA512("x") AS ?c) }')
    assert len(r["a"]) == 40 + 2 and len(r["b"]) == 96 + 2 and len(r["c"]) == 128 + 2


# --- constructors -----------------------------------------------------------


def test_strlang_strdt(people):
    r = _one(people, EX + 'SELECT ?l ?d WHERE { '
             'BIND(STRLANG("chat", "fr") AS ?l) '
             'BIND(STRDT("123", <http://www.w3.org/2001/XMLSchema#integer>) AS ?d) }')
    assert r["l"] == '"chat"@fr'
    assert r["d"] == '"123"^^<http://www.w3.org/2001/XMLSchema#integer>'


def test_strlang_rejects_typed(people):
    r = _one(people, EX + 'SELECT ?l WHERE { '
             'BIND(STRLANG(STRLANG("x","en"), "fr") AS ?l) }')
    assert r["l"] is None


def test_encode_for_uri(people):
    r = _one(people, EX + 'SELECT ?e WHERE { BIND(ENCODE_FOR_URI("Los Angeles/CA~x") AS ?e) }')
    assert r["e"] == '"Los%20Angeles%2FCA~x"'


def test_uuid_struuid_bnode(people):
    r = _one(people, EX + "SELECT ?u ?s ?b ?b2 ?b3 WHERE { "
             'BIND(UUID() AS ?u) BIND(STRUUID() AS ?s) BIND(BNODE() AS ?b) '
             'BIND(BNODE("k") AS ?b2) BIND(BNODE("k") AS ?b3) }')
    assert r["u"].startswith("urn:uuid:")
    assert r["s"].startswith('"') and len(r["s"]) == 38
    assert r["b"].startswith("_:")
    assert r["b2"] == r["b3"]  # deterministic per label


# --- GROUP_CONCAT SEPARATOR -------------------------------------------------


def test_group_concat_separator(people):
    rows = _rows(evaluate(parse_query(
        EX + 'SELECT ?p (GROUP_CONCAT(?o ; SEPARATOR=", ") AS ?os) WHERE '
        "{ ?p ex:age ?a . ?p ?pred ?o FILTER(ISLITERAL(?o)) } GROUP BY ?p ORDER BY ?p"
    ), people))
    by_p = {r["p"]: r["os"] for r in rows}
    assert by_p["http://example.org/alice"] in ('"30, Alice"', '"Alice, 30"')
    assert by_p["http://example.org/bob"] == '"20"'


def test_group_concat_default_space(people):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?p (GROUP_CONCAT(?a) AS ?os) WHERE { ?p ex:age ?a } GROUP BY ?p"
    ), people))
    assert all('"' in r["os"] for r in rows)


# --- negated property sets --------------------------------------------------


def test_nps_forward(people):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?s ?o WHERE { ?s !(ex:name|ex:age) ?o } ORDER BY ?s"
    ), people))
    assert [(r["s"], r["o"]) for r in rows] == [
        ("http://example.org/alice", "http://example.org/bob"),
        ("http://example.org/bob", "http://example.org/carol"),
    ]


def test_nps_single(people):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?s WHERE { ?s !ex:knows ?o }"
    ), people))
    assert len(rows) == 5  # the 3 age + 2 name triples


def test_nps_inverse_only(people):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?s ?o WHERE { ?s !(^ex:knows) ?o } ORDER BY ?s ?o"
    ), people))
    # inverse arcs of every non-knows triple: (obj, subj)
    assert len(rows) == 5
    assert ("30", rows[0]["s"].strip('"')) is not None  # literals become subjects
    subs = {r["s"] for r in rows}
    assert '"Alice"' in subs or "Alice" in {s.strip('"') for s in subs}


def test_nps_mixed(people):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?s ?o WHERE { ?s !(ex:name|ex:age|^ex:name|^ex:age) ?o } ORDER BY ?s"
    ), people))
    # forward knows arcs + inverse knows arcs
    assert len(rows) == 4


def test_nps_in_sequence_path(people):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?o WHERE { ex:alice ex:knows/!(ex:age|ex:name) ?o }"
    ), people))
    assert [r["o"] for r in rows] == ["http://example.org/carol"]


# --- distributed transitive closure ----------------------------------------


def test_closure_distributed_matches_driver(people, monkeypatch):
    q = EX + "SELECT ?x WHERE { ex:alice ex:knows+ ?x } ORDER BY ?x"
    expected = [r["x"] for r in _rows(evaluate(parse_query(q), people))]
    assert expected == ["http://example.org/bob", "http://example.org/carol"]
    monkeypatch.setattr(eng, "PATH_PAIR_LIMIT", 1)  # force the distributed path
    got = [r["x"] for r in _rows(evaluate(parse_query(q), people))]
    assert got == expected


def test_closure_distributed_star(people, monkeypatch):
    q = EX + "SELECT ?x WHERE { ex:bob ex:knows* ?x } ORDER BY ?x"
    expected = [r["x"] for r in _rows(evaluate(parse_query(q), people))]
    monkeypatch.setattr(eng, "PATH_PAIR_LIMIT", 1)
    got = [r["x"] for r in _rows(evaluate(parse_query(q), people))]
    assert got == expected
    assert "http://example.org/bob" in got and "http://example.org/carol" in got


# --- vectorized BIND / ORDER BY expressions --------------------------------


def _row_eval(df, expr):
    out = []
    for r in df.to_dict("records"):
        row = {k: (None if (v is not None and pd.isna(v)) else v) for k, v in r.items()}
        try:
            v = _eval_expr(expr, row)
        except Exception:
            v = None
        out.append(eng._format_value(v))
    return out


@pytest.mark.parametrize("bind_src", [
    "?a * 2 + 1",
    "?a - ?b",
    "?a / ?b",
    "?a / ?z",          # division by zero → unbound
    "STRLEN(?n)",
    "?a > 25",
    "(?a > 25) && (?b < 100)",
])
def test_vec_value_matches_row_path(bind_src):
    # operands stay well-typed (numeric / unbound): on a type-ERROR operand
    # (e.g. "x" > 25) the vec lane follows SPARQL error→false semantics like
    # the existing vectorized FILTER mask, while the row path string-coerces
    q = parse_query(EX + f"SELECT ?x WHERE {{ BIND(({bind_src}) AS ?x) }}")
    expr = [p for k, p in q.where.elements if k == "bind"][0][0]
    df = pd.DataFrame({
        "a": ['"30"^^<http://www.w3.org/2001/XMLSchema#integer>', '"2.5"^^<http://www.w3.org/2001/XMLSchema#decimal>', None, '"7"^^<http://www.w3.org/2001/XMLSchema#integer>'],
        "b": ['"4"^^<http://www.w3.org/2001/XMLSchema#integer>', '"10"', '"1"', None],
        "z": ['"0"^^<http://www.w3.org/2001/XMLSchema#integer>'] * 4,
        "n": ['"hello"', '"a b"', None, '""'],
    })
    vec = _vec_value(df, expr)
    assert vec is not None, f"vectorized lane not taken for {bind_src!r}"
    assert list(vec) == _row_eval(df, expr)


def test_vec_value_arith_nonnumeric_matches_row_path():
    """Arithmetic over a non-numeric operand → unbound on both lanes."""
    q = parse_query(EX + "SELECT ?x WHERE { BIND((?a * 2) AS ?x) }")
    expr = [p for k, p in q.where.elements if k == "bind"][0][0]
    df = pd.DataFrame({"a": ['"x"', '"3"', None]})
    vec = _vec_value(df, expr)
    assert vec is not None
    assert list(vec) == _row_eval(df, expr)


def test_vec_value_bails_on_boolean_operand():
    q = parse_query(EX + "SELECT ?x WHERE { BIND((?t + 1) AS ?x) }")
    expr = [p for k, p in q.where.elements if k == "bind"][0][0]
    df = pd.DataFrame({"t": ['"true"^^<http://www.w3.org/2001/XMLSchema#boolean>']})
    assert _vec_value(df, expr) is None  # row path handles bool-as-number


def test_bind_arith_end_to_end(people):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?p ?x WHERE { ?p ex:age ?a BIND(?a * 2 AS ?x) } ORDER BY ?x"
    ), people))
    assert [r["x"] for r in rows] == [
        '"40"^^<http://www.w3.org/2001/XMLSchema#integer>',
        '"60"^^<http://www.w3.org/2001/XMLSchema#integer>',
        '"80"^^<http://www.w3.org/2001/XMLSchema#integer>',
    ]


def test_order_by_expression_vectorized(people):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?p WHERE { ?p ex:age ?a } ORDER BY DESC(?a * 1)"
    ), people))
    assert [r["p"] for r in rows] == [
        "http://example.org/carol", "http://example.org/alice", "http://example.org/bob",
    ]


# --- OFFSET without LIMIT ---------------------------------------------------


def test_offset_without_limit(people):
    rows = _rows(evaluate(parse_query(
        EX + "SELECT ?a WHERE { ?p ex:age ?a } ORDER BY ?a OFFSET 1"
    ), people))
    assert [r["a"] for r in rows] == [
        '"30"^^<http://www.w3.org/2001/XMLSchema#integer>',
        '"40"^^<http://www.w3.org/2001/XMLSchema#integer>',
    ]


# --- encode fingerprint miss detection (ADVICE r2 medium) -------------------


def test_encode_with_fp_raises_on_missing_term():
    import pyarrow as pa

    from de_ray.hdt.triples import _encode_with_fp, fingerprint_strings

    terms = pa.array(["<a>", "<b>", "<p>"], pa.large_string())
    fps = fingerprint_strings(terms)
    order = np.argsort(fps)
    space = (fps[order], np.array([1, 2, 3], dtype=np.int64)[order])
    fp_spaces = {"subj": space, "pred": space, "obj": space}
    good = pa.table({
        "subj": pa.array(["<a>"], pa.large_string()),
        "pred": pa.array(["<p>"], pa.large_string()),
        "obj": pa.array(["<b>"], pa.large_string()),
    })
    out = _encode_with_fp(fp_spaces, good)
    assert out.num_rows == 1
    bad = pa.table({
        "subj": pa.array(["<MISSING>"], pa.large_string()),
        "pred": pa.array(["<p>"], pa.large_string()),
        "obj": pa.array(["<b>"], pa.large_string()),
    })
    with pytest.raises(ValueError, match="missing from the"):
        _encode_with_fp(fp_spaces, bad)


# --- SERVICE federation (SPARQL 1.1 Federated Query) -------------------------


def test_service_federation_join(tmp_path, people):
    """SERVICE body ships to a live SPARQL-protocol endpoint; the returned
    bindings join locally with the outer pattern."""
    import threading

    from de_ray.serve import make_server

    server = make_server(str(tmp_path), bind="127.0.0.1:0")
    server.de_ray_state.replace(
        "file:///remote.nt",
        [
            ("http://example.org/alice", "http://example.org/city", '"Paris"'),
            ("http://example.org/carol", "http://example.org/city", '"Oslo"'),
        ],
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        host, port = server.server_address
        q = (
            EX + "SELECT ?who ?city WHERE { ?who ex:name ?n . "
            f"SERVICE <http://{host}:{port}/query> {{ ?who ex:city ?city }} }}"
        )
        rows = _rows(evaluate(parse_query(q), people))
        got = {(r["who"], r["city"]) for r in rows}
        assert got == {
            ("http://example.org/alice", '"Paris"'),
            ("http://example.org/carol", '"Oslo"'),
        }
    finally:
        server.shutdown()


def test_service_silent_failure_is_unit(people):
    """SERVICE SILENT against an unreachable endpoint yields one empty
    solution — the outer pattern passes through unchanged."""
    q = (
        EX + "SELECT ?who WHERE { ?who ex:name ?n . "
        "SERVICE SILENT <http://127.0.0.1:9/query> { ?who ex:city ?c } }"
    )
    rows = _rows(evaluate(parse_query(q), people))
    assert {r["who"] for r in rows} == {
        "http://example.org/alice",
        "http://example.org/carol",
    }


def test_service_hard_failure_raises(people):
    q = (
        EX + "SELECT ?who WHERE { "
        "SERVICE <http://127.0.0.1:9/query> { ?who ex:city ?c } }"
    )
    with pytest.raises(Exception):
        _rows(evaluate(parse_query(q), people))


def test_service_raw_body_roundtrip():
    """The captured raw body re-tokenizes to the same token stream,
    including adjacent literal suffixes."""
    from de_ray.query.parser import _T, _tokens_to_text

    q = (
        'SELECT ?s WHERE { SERVICE <http://h/q> { ?s <http://p> '
        '"5"^^<http://www.w3.org/2001/XMLSchema#integer> ; <http://q> "x"@en } }'
    )
    parsed = parse_query(q)
    kind, payload = parsed.where.elements[0]
    assert kind == "service"
    raw = payload[2]
    assert raw.startswith("{") and raw.endswith("}")
    assert '"5"^^<http://www.w3.org/2001/XMLSchema#integer>' in raw
    assert '"x"@en' in raw
