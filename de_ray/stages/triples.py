"""Batched triple extraction (M7): ``text → (subj, pred, obj)`` rows.

Deterministic rule-based extractor (so triple P/R vs the reference semantics
is reproducible, SURVEY §7.1 step 3). The extraction contract — also
expressible in ANSI SQL for the DuckDB oracle — is:

- tokens(text)           = non-empty parts of ``text.split(' ')``
- mentions(doc)          = DISTINCT tokens excluding stopwords {``the``, ``a``}
- per document, emit:
    (doc, rdf:type,        de:Document)
    (doc, de:lang,         "<lang>")                   plain literal
    (doc, de:source,       "<source>")                 plain literal (documents)
    (doc, de:tokenCount,   "<n>"^^xsd:integer)
    (doc, de:mentions,     ent:<token>)                one per mention

Subjects: webtext rows use the page ``url`` as the document IRI; documents
rows use ``http://example.org/doc/<doc_id>``. One input row explodes to N
output rows (flat-map semantics inside ``map_batches``, returning a longer
Arrow table — reference's per-record transform surface rebuilt batched).
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from de_ray.model import RDF, XSD_INTEGER

DE = "http://example.org/vocab#"
ENT = "http://example.org/entity/"
DOC = "http://example.org/doc/"

RDF_TYPE = RDF + "type"
DOC_TYPE = DE + "Document"
P_LANG = DE + "lang"
P_SOURCE = DE + "source"
P_TOKEN_COUNT = DE + "tokenCount"
P_MENTIONS = DE + "mentions"

STOPWORDS = frozenset({"the", "a"})

TRIPLE_COLS = ("subj", "pred", "obj", "graph")


def doc_iri_from_id(doc_id: int) -> str:
    return f"{DOC}{doc_id}"


def tokens_of(text: str) -> List[str]:
    return [t for t in text.split(" ") if t]


class TripleExtractor:
    """Callable for ``map_batches``: documents/webtext batch → triple rows.

    ``subject_col``: 'url' (webtext) or 'doc_id' (documents table).
    ``graph``: constant graph name stamped on every emitted triple.
    """

    def __init__(
        self,
        subject_col: str = "url",
        graph: str = "file:///webtext",
        source_col: Optional[str] = None,
    ):
        self.subject_col = subject_col
        self.graph = graph
        self.source_col = source_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj_raw = batch.column(self.subject_col).to_pylist()
        texts = batch.column("text").to_pylist()
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.schema.names
            else [None] * len(texts)
        )
        sources = (
            batch.column(self.source_col).to_pylist()
            if self.source_col and self.source_col in batch.schema.names
            else [None] * len(texts)
        )
        s_out: List[str] = []
        p_out: List[str] = []
        o_out: List[str] = []
        for sv, text, lang, src in zip(subj_raw, texts, langs, sources):
            doc = doc_iri_from_id(sv) if self.subject_col == "doc_id" else str(sv)
            toks = tokens_of(text)
            mentions = sorted({t for t in toks if t not in STOPWORDS})
            s_out.append(doc), p_out.append(RDF_TYPE), o_out.append(DOC_TYPE)
            if lang is not None:
                s_out.append(doc), p_out.append(P_LANG), o_out.append(f'"{lang}"')
            if src is not None:
                s_out.append(doc), p_out.append(P_SOURCE), o_out.append(f'"{src}"')
            s_out.append(doc), p_out.append(P_TOKEN_COUNT)
            o_out.append(f'"{len(toks)}"^^<{XSD_INTEGER}>')
            for m in mentions:
                s_out.append(doc), p_out.append(P_MENTIONS), o_out.append(ENT + m)
        n = len(s_out)
        return pa.table(
            {
                "subj": pa.array(s_out, pa.large_string()),
                "pred": pa.array(p_out, pa.large_string()),
                "obj": pa.array(o_out, pa.large_string()),
                "graph": pa.array([self.graph] * n, pa.large_string()),
            }
        )


def extract_triples_stage(
    ds,
    subject_col: str = "url",
    graph: str = "file:///webtext",
    source_col: Optional[str] = None,
    batch_size: int = 1024,
):
    # stateless tasks — TripleExtractor state is trivial, so no actor pool
    # (and hence no concurrency knob; Ray sizes task parallelism itself)
    return ds.map_batches(
        TripleExtractor(subject_col=subject_col, graph=graph, source_col=source_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
