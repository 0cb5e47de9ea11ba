"""Exercise the at-scale code paths that small inputs normally bypass:
shuffle-join term encoding, Dataset.join BGP joins, distributed groupby
finals, distributed dictionary ranking."""

import pyarrow as pa
import pytest
import ray.data as rd

from de_ray.rdfio import read_rdf

RES = "/root/reference/tests/resources"


def test_join_encode_matches_broadcast(tmp_path):
    """use_join=True (dictionary too big to broadcast) must produce the same
    ID triples as the broadcast encoder."""
    from de_ray.hdt.dictionary import build_dictionary
    from de_ray.hdt.triples import encode_triples

    ds = read_rdf([f"{RES}/apple.ttl", f"{RES}/banana.nt"]).materialize()
    d = build_dictionary(ds)
    bc = encode_triples(ds, d, use_join=False)
    jn = encode_triples(ds, d, use_join=True)
    key = lambda r: (r["s_id"], r["p_id"], r["o_id"], r["graph"])
    assert sorted(map(key, bc.take_all())) == sorted(map(key, jn.take_all()))


def test_distributed_dictionary_matches_driver_final():
    """driver_final_limit=0 forces the distributed groupby+sort+rank path;
    IDs must be identical to the driver-final path."""
    from de_ray.hdt.dictionary import build_dictionary

    ds = read_rdf([f"{RES}/apple.ttl", f"{RES}/banana.nt", f"{RES}/pineapple.ttl"]).materialize()
    a = build_dictionary(ds)
    b = build_dictionary(ds, driver_final_limit=0)
    rows_a = sorted((r["term"], r["section"], r["id"]) for r in a.sections.take_all())
    rows_b = sorted((r["term"], r["section"], r["id"]) for r in b.sections.take_all())
    assert rows_a == rows_b
    assert a.counts == b.counts


def test_bgp_hash_join_path(monkeypatch):
    """Force the Dataset.join path (small side above the broadcast limit)."""
    import de_ray.query.engine as eng
    from de_ray.query.engine import DatasetSource, evaluate
    from de_ray.query.parser import parse_query

    monkeypatch.setattr(eng, "BROADCAST_ROWS", 0)
    ds = read_rdf([f"{RES}/banana.nt"])
    q = parse_query(
        "PREFIX ex: <http://example.org/> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
        'SELECT ?f WHERE { ?f rdf:type ex:Fruit ; ex:hasColor "yellow" }'
    )
    res = evaluate(q, DatasetSource(ds))
    assert [r["f"] for r in res.ds.take_all()] == ["http://example.org/Banana"]


def test_distributed_canonicalize_path():
    """driver_final_limit=0 forces the bucket-groupby dedup path."""
    from de_ray.stages.canonicalize import canonicalize_stage

    t = pa.table(
        {
            "subj": pa.array(["s1", "s1", "s2"] * 10, pa.large_string()),
            "pred": pa.array(["p"] * 30, pa.large_string()),
            "obj": pa.array(["o"] * 30, pa.large_string()),
            "graph": pa.array(["g"] * 30, pa.large_string()),
        }
    )
    out = canonicalize_stage(rd.from_arrow(t), driver_final_limit=0, num_buckets=4)
    rows = {(r["subj"], r["pred"], r["obj"]) for r in out.take_all()}
    assert len(rows) == 2
    assert out.count() == 2


def test_service_description():
    from de_ray.model import RDF
    from de_ray.query.service import SD, service_description

    t = service_description()
    assert ("urn:de-ray:service", RDF + "type", SD + "Service") in t
    assert any(p == SD + "resultFormat" for _, p, _o in t)
