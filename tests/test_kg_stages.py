"""Triple extraction → entity linking → canonicalization stages."""

import pyarrow as pa
import ray.data as rd

from de_ray.stages.canonicalize import canonicalize_stage
from de_ray.stages.link import ALIAS_GROUPS, EntityLinker, build_alias_dict, link_entities_stage
from de_ray.stages.triples import (
    DE,
    DOC_TYPE,
    ENT,
    P_LANG,
    P_MENTIONS,
    P_TOKEN_COUNT,
    RDF_TYPE,
    TripleExtractor,
    extract_triples_stage,
)


def _docs_table():
    return pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["the fast sort merge sort", "line row data a"], pa.string()),
            "lang": pa.array(["en", "de"], pa.string()),
        }
    )


def test_triple_extractor_rules():
    out = TripleExtractor(subject_col="doc_id", graph="g")(_docs_table())
    rows = set(zip(*[out.column(c).to_pylist() for c in ("subj", "pred", "obj")]))
    d1 = "http://example.org/doc/1"
    # stopword 'the' excluded; mentions distinct + sorted
    assert (d1, RDF_TYPE, DOC_TYPE) in rows
    assert (d1, P_LANG, '"en"') in rows
    assert (d1, P_TOKEN_COUNT, '"5"^^<http://www.w3.org/2001/XMLSchema#integer>') in rows
    assert (d1, P_MENTIONS, ENT + "fast") in rows
    assert (d1, P_MENTIONS, ENT + "sort") in rows
    assert (d1, P_MENTIONS, ENT + "the") not in rows
    mentions1 = [r for r in rows if r[0] == d1 and r[1] == P_MENTIONS]
    assert len(mentions1) == 3  # fast, merge, sort


def test_entity_linker_maps_aliases():
    linker = EntityLinker(alias=build_alias_dict())
    t = TripleExtractor(subject_col="doc_id", graph="g")(_docs_table())
    out = linker(t)
    objs = set(out.column("obj").to_pylist())
    assert ENT + "sort" not in objs  # sort -> order
    assert ENT + "order" in objs
    assert ENT + "row" in objs  # line -> row merges with row
    assert ENT + "line" not in objs


def test_link_and_canonicalize_end_to_end():
    docs = rd.from_arrow(_docs_table())
    triples = extract_triples_stage(docs, subject_col="doc_id", graph="g")
    linked = link_entities_stage(triples, concurrency=2)
    distinct = canonicalize_stage(linked, num_buckets=4)
    rows = [(r["subj"], r["pred"], r["obj"]) for r in distinct.take_all()]
    assert len(rows) == len(set(rows))  # globally distinct
    d2 = "http://example.org/doc/2"
    # doc2 mentions line+row which both canonicalize to ent:row -> ONE triple
    row_mentions = [r for r in rows if r == (d2, P_MENTIONS, ENT + "row")]
    assert len(row_mentions) == 1
    assert ALIAS_GROUPS["line"] == "row"
