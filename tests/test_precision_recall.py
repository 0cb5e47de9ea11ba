"""North-rule criterion: triple P/R ≥ 0.95 vs the reference-semantics
triple set (the DuckDB oracle plays the reference: same extraction contract,
independently computed)."""

import duckdb

from de_ray.pipelines.driver_queries import SQL_KG_LINKED_TRIPLES, q_kg_linked_triples

SF = "/root/testdata/sf0.01"


def test_triple_precision_recall():
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in q_kg_linked_triples(SF).take_all()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = set(map(tuple, con.sql(SQL_KG_LINKED_TRIPLES).fetchall()))
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # exact on the synthetic corpus


def test_hero_height_style_query(tmp_path):
    """ORDER BY DESC + LIMIT over typed decimal literals (hero-height.rq shape)."""
    from de_ray.hdt.store import Store, write_store
    from de_ray.query.engine import StoreSource, evaluate
    from de_ray.query.parser import parse_query
    from de_ray.query.serialize import serialize_result
    from de_ray.rdfio import read_rdf

    ttl = tmp_path / "heroes.ttl"
    ttl.write_text(
        """@prefix dbo: <http://dbpedia.org/ontology/> .
        @prefix h: <http://example.org/hero/> .
        h:Zed dbo:height 185.0 .
        h:Ana dbo:height 170.0 .
        h:Yor dbo:height 304.8 .
        h:Bob dbo:height 66.0 .
        h:Cid dbo:height 183.0 .
        h:Dot dbo:height 150.0 .
        """
    )
    out = str(tmp_path / "st")
    write_store(read_rdf([str(ttl)]), out)
    q = parse_query(
        "PREFIX dbo: <http://dbpedia.org/ontology/> "
        "SELECT ?hero ?height WHERE { ?hero dbo:height ?height } "
        "ORDER BY DESC(?hero) LIMIT 5"
    )
    res = evaluate(q, StoreSource(Store(out)))
    csv = serialize_result(res, "csv").replace("\r", "").strip().split("\n")
    # heroes in reverse-IRI order, heights as lexical decimals (golden format
    # matches reference tests/goldens/superhero-query.csv shape)
    assert csv[0] == "hero,height"
    assert csv[1] == "http://example.org/hero/Zed,185.0"
    assert len(csv) == 6
    assert csv[5] == "http://example.org/hero/Bob,66.0"

    # numeric ORDER BY over the literal VALUES (not lexicographic)
    q2 = parse_query(
        "PREFIX dbo: <http://dbpedia.org/ontology/> "
        "SELECT ?hero WHERE { ?hero dbo:height ?height } ORDER BY DESC(?height) LIMIT 2"
    )
    res2 = evaluate(q2, StoreSource(Store(out)))
    top = [r["hero"] for r in res2.ds.take_all()]
    assert top == ["http://example.org/hero/Yor", "http://example.org/hero/Zed"]
