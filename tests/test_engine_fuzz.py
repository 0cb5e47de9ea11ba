"""Randomized metamorphic equivalence for the SPARQL engine.

The reference's core conformance property is raw-RDF query ≡ HDT query
(tests/test-commands.rs:300-368 assert identical output across backends).
This suite randomizes it: seeded random graphs + random queries must give
identical solution multisets over DatasetSource (the generic string-triple
path) and StoreSource (dictionary-encoded store with the integer-ID
GROUP BY / DISTINCT / scan fastpaths) — two genuinely different execution
paths cross-checking each other, including the fastpath dispatch
boundaries hand-written tests tend to miss.
"""

import random

import pytest

from de_ray.query.engine import DatasetSource, StoreSource, evaluate
from de_ray.query.parser import parse_query
from de_ray.rdfio import read_rdf

EX = "http://example.org/"


def _random_nt(rng: random.Random, n: int = 70) -> str:
    """Seeded random graph: a few subjects/predicates, object mix of IRIs,
    plain literals, language-tagged literals and typed ints. The statement
    SET is duplicate-free by construction: the raw Dataset path keeps
    repeated NT lines while the store dedups them, so duplicated input
    would make non-DISTINCT multiplicity (COUNT(*)) legitimately diverge
    between the two backends — the reference sidesteps this the same way
    (raw queries implicitly build an HDT first, src/query.rs:264-297)."""
    lines = set()
    while len(lines) < n:
        s = f"<{EX}s{rng.randint(0, 7)}>"
        p = f"<{EX}p{rng.randint(0, 3)}>"
        kind = rng.randint(0, 4)
        if kind == 0:
            o = f"<{EX}s{rng.randint(0, 7)}>"  # IRI (join chains possible)
        elif kind == 1:
            o = f'"v{rng.randint(0, 5)}"'
        elif kind == 2:
            o = f'"w{rng.randint(0, 2)}"@en'
        elif kind == 3:
            o = (
                f'"{rng.randint(0, 9)}"'
                "^^<http://www.w3.org/2001/XMLSchema#integer>"
            )
        else:
            o = f"<{EX}o{rng.randint(0, 4)}>"
        lines.add(f"{s} {p} {o} .")
    # raw path sees duplicates; store dedups — SELECT results must agree
    # only up to multiplicity for non-DISTINCT, so double one line and use
    # DISTINCT-insensitive comparison below
    return "\n".join(sorted(lines)) + "\n"


def _queries(rng: random.Random):
    """Query templates spanning the engine's plan shapes: single-pattern
    scans (bound/unbound mixes), BGP joins, OPTIONAL, UNION, FILTER,
    DISTINCT and GROUP BY aggregates (the id fastpaths), ORDER+LIMIT."""
    s = f"<{EX}s{rng.randint(0, 7)}>"
    p = f"<{EX}p{rng.randint(0, 3)}>"
    p2 = f"<{EX}p{rng.randint(0, 3)}>"
    lit = f'"v{rng.randint(0, 5)}"'
    return [
        "SELECT DISTINCT ?s ?p ?o WHERE { ?s ?p ?o } ORDER BY ?s ?p ?o",
        f"SELECT DISTINCT ?o WHERE {{ {s} {p} ?o }} ORDER BY ?o",
        f"SELECT DISTINCT ?s WHERE {{ ?s {p} {lit} }} ORDER BY ?s",
        f"SELECT DISTINCT ?s ?o WHERE {{ ?s {p} ?x . ?x {p2} ?o }} ORDER BY ?s ?o",
        f"SELECT DISTINCT ?s ?o WHERE {{ ?s {p} ?o "
        f"OPTIONAL {{ ?o {p2} ?y }} }} ORDER BY ?s ?o",
        f"SELECT DISTINCT ?s WHERE {{ {{ ?s {p} ?o }} UNION {{ ?s {p2} ?o }} }} "
        "ORDER BY ?s",
        f"SELECT DISTINCT ?s ?o WHERE {{ ?s {p} ?o FILTER(?o != {lit}) }} "
        "ORDER BY ?s ?o",
        # id-fastpath shapes (StoreSource dispatches these to int columns)
        "SELECT DISTINCT ?p WHERE { ?s ?p ?o } ORDER BY ?p",
        "SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p ORDER BY ?p",
        f"SELECT (COUNT(DISTINCT ?s) AS ?n) WHERE {{ ?s {p} ?o }}",
        "SELECT DISTINCT ?s WHERE { ?s ?p ?o } ORDER BY DESC(?s) LIMIT 3",
        f"ASK {{ {s} {p} ?o }}",
        # typed-literal predicates through both paths
        f"SELECT DISTINCT ?s ?o WHERE {{ ?s {p} ?o "
        "FILTER(isNumeric(?o)) } ORDER BY ?s ?o",
        'SELECT DISTINCT ?s WHERE { ?s ?p ?o '
        f'FILTER(STRSTARTS(STR(?s), "{EX}s")) }} ORDER BY ?s',
        f"CONSTRUCT {{ ?s <{EX}made> ?o }} WHERE {{ ?s {p} ?o }}",
        # harder algebra: paths, MINUS, VALUES, HAVING, nested OPTIONAL
        f"SELECT DISTINCT ?s ?o WHERE {{ ?s {p}+ ?o }} ORDER BY ?s ?o",
        f"SELECT DISTINCT ?s ?o WHERE {{ ?s ({p}|{p2}) ?o }} ORDER BY ?s ?o",
        f"SELECT DISTINCT ?s ?o WHERE {{ ?s {p}/{p2} ?o }} ORDER BY ?s ?o",
        f"SELECT DISTINCT ?s WHERE {{ ?s {p} ?o MINUS {{ ?s {p2} ?o2 }} }} "
        "ORDER BY ?s",
        f"SELECT DISTINCT ?s ?o WHERE {{ VALUES ?s {{ <{EX}s0> <{EX}s3> "
        f"<{EX}s5> }} ?s {p} ?o }} ORDER BY ?s ?o",
        f"SELECT ?s (COUNT(*) AS ?n) WHERE {{ ?s {p} ?o }} GROUP BY ?s "
        "HAVING (COUNT(*) >= 2) ORDER BY ?s",
        f"SELECT DISTINCT ?s ?y WHERE {{ ?s {p} ?o OPTIONAL {{ ?o {p2} ?x "
        f"OPTIONAL {{ ?x {p} ?y }} }} }} ORDER BY ?s ?y",
        f"SELECT DISTINCT ?s WHERE {{ ?s {p} ?o "
        f"FILTER NOT EXISTS {{ ?s {p2} ?z }} }} ORDER BY ?s",
        f"SELECT DISTINCT ?o WHERE {{ ?s ^{p} ?o }} ORDER BY ?o",
    ]


def _rows(res):
    if hasattr(res, "value"):  # BooleanResult
        return res.value
    df = res.ds.to_pandas()
    cols = (
        list(res.variables)
        if hasattr(res, "variables")
        else ["subj", "pred", "obj"]  # GraphResult (CONSTRUCT): triple set
    )
    for v in cols:
        if v not in df.columns:
            df[v] = None
    vals = df[cols].astype(object).where(df[cols].notna(), None)
    key = lambda r: tuple((v is None, v if v is not None else "") for v in r)
    rows = sorted(map(tuple, vals.itertuples(index=False, name=None)), key=key)
    if not hasattr(res, "variables"):
        rows = sorted(set(rows), key=key)  # graphs are SETs of triples
    return rows


@pytest.mark.parametrize("seed", [7, 23, 91, 137, 271])
def test_random_graph_raw_store_equivalence(seed, tmp_path):
    from de_ray.hdt.store import Store, write_store

    rng = random.Random(seed)
    nt = tmp_path / f"g{seed}.nt"
    nt.write_text(_random_nt(rng))
    raw_src = DatasetSource(read_rdf([str(nt)]))
    out = str(tmp_path / f"store{seed}")
    write_store(read_rdf([str(nt)]), out)
    store_src = StoreSource(Store(out))
    for q in _queries(rng):
        want = _rows(evaluate(parse_query(q), raw_src))
        got = _rows(evaluate(parse_query(q), store_src))
        assert got == want, f"seed {seed}: {q}\nraw={want}\nstore={got}"


def test_order_by_on_empty_result_no_crash(tmp_path):
    """Regression (found by the seed-7 metamorphic run): a zero-match BGP
    with ORDER BY crashed in the tiered-sort cleanup — ds.schema() is None
    for the empty sorted result and drop_columns introspected it."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "subj": pa.array([f"{EX}a"], pa.large_string()),
            "pred": pa.array([f"{EX}p"], pa.large_string()),
            "obj": pa.array(['"x"'], pa.large_string()),
            "graph": pa.array(["g"], pa.large_string()),
        }
    )
    src = DatasetSource(rd.from_arrow(t))
    q = parse_query(
        f"SELECT ?s ?o WHERE {{ ?s <{EX}p> ?m . ?m <{EX}q> ?o }} ORDER BY ?s ?o"
    )
    res = evaluate(q, src)
    assert _rows(res) == []
