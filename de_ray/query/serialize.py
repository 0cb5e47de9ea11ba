"""SPARQL result serializers (K3/K4) — byte-compatible with the reference.

Golden formats verified against reference ``tests/test-commands.rs:186-238``:

- CSV: bare header, IRI bare, literal lexical form, CRLF rows
- TSV: ``?var`` header, N-Triples-encoded terms
- JSON: ``{"head":{"vars":[...]},"results":{"bindings":[...]}}`` compact
- XML: ``<?xml version="1.0"?><sparql xmlns=...>`` with <uri>/<literal>

Graph results (CONSTRUCT/DESCRIBE) serialize as canonical N-Triples (K2).
"""

from __future__ import annotations

import json
from typing import Iterator, List, Optional

from de_ray.model import BlankNode, Iri, Literal, canonical_to_nt, canonical_to_term
from de_ray.query.engine import BooleanResult, GraphResult, SolutionsResult
from de_ray.rdfio.ntriples import format_nt_line

SOLUTION_FORMATS = ("csv", "tsv", "json", "xml")
# canonical N-Triples is a syntactic subset of Turtle, TriG, N-Quads and N3,
# so one emitter serves all five (reference K4 surface, src/query.rs:155-175);
# RDF/XML gets its own writer.
GRAPH_FORMATS = ("ntriple", "nt", "ntriples", "turtle", "ttl", "trig", "nquads", "n3")


def _csv_field(term: Optional[str]) -> str:
    if term is None:
        return ""
    t = canonical_to_term(term)
    if isinstance(t, Iri):
        v = t.value
    elif isinstance(t, BlankNode):
        v = "_:" + t.label
    else:
        v = t.lexical
    if any(c in v for c in ',"\n\r'):
        return '"' + v.replace('"', '""') + '"'
    return v


def iter_solutions_csv(res: SolutionsResult) -> Iterator[str]:
    yield ",".join(res.variables) + "\r\n"
    for batch in res.ds.iter_batches(batch_size=64 * 1024, batch_format="pandas"):
        lines = []
        for r in batch.itertuples(index=False):
            row = dict(zip(batch.columns, r))
            lines.append(
                ",".join(_csv_field(_norm(row.get(v))) for v in res.variables)
            )
        if lines:
            yield "\r\n".join(lines) + "\r\n"


def solutions_to_csv(res: SolutionsResult) -> str:
    return "".join(iter_solutions_csv(res))


def _norm(v):
    import pandas as pd

    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    return v


def iter_solutions_tsv(res: SolutionsResult) -> Iterator[str]:
    yield "\t".join("?" + v for v in res.variables) + "\n"
    for batch in res.ds.iter_batches(batch_size=64 * 1024, batch_format="pandas"):
        lines = []
        for r in batch.itertuples(index=False):
            row = dict(zip(batch.columns, r))
            lines.append(
                "\t".join(
                    canonical_to_nt(row[v]) if _norm(row.get(v)) is not None else ""
                    for v in res.variables
                )
            )
        if lines:
            yield "\n".join(lines) + "\n"


def solutions_to_tsv(res: SolutionsResult) -> str:
    return "".join(iter_solutions_tsv(res))


def _json_term(term: str) -> dict:
    t = canonical_to_term(term)
    if isinstance(t, Iri):
        return {"type": "uri", "value": t.value}
    if isinstance(t, BlankNode):
        return {"type": "bnode", "value": t.label}
    out = {"type": "literal", "value": t.lexical}
    if t.lang:
        out["xml:lang"] = t.lang
    elif t.datatype:
        out["datatype"] = t.datatype
    return out


def iter_solutions_json(res: SolutionsResult) -> Iterator[str]:
    # chunked emission of the exact bytes json.dumps(doc) would produce:
    # the head object, then comma-joined binding objects, then the closer
    # ensure_ascii=False to match the binding objects below: a Unicode
    # variable name must serialize as raw UTF-8 in "head" too (ADVICE r4)
    head = json.dumps(
        {"vars": res.variables}, separators=(",", ":"), ensure_ascii=False
    )
    yield '{"head":' + head + ',"results":{"bindings":['
    first = True
    for batch in res.ds.iter_batches(batch_size=64 * 1024, batch_format="pandas"):
        parts = []
        for r in batch.itertuples(index=False):
            row = dict(zip(batch.columns, r))
            b = {}
            for v in res.variables:
                val = _norm(row.get(v))
                if val is not None:
                    b[v] = _json_term(val)
            parts.append(json.dumps(b, separators=(",", ":"), ensure_ascii=False))
        if parts:
            chunk = ",".join(parts)
            yield chunk if first else "," + chunk
            first = False
    yield "]}}"


def solutions_to_json(res: SolutionsResult) -> str:
    return "".join(iter_solutions_json(res))


def _xml_escape(s: str, attr: bool = False) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if attr:
        s = s.replace('"', "&quot;")
    return s


def _xml_term(term: str) -> str:
    t = canonical_to_term(term)
    if isinstance(t, Iri):
        return f"<uri>{_xml_escape(t.value)}</uri>"
    if isinstance(t, BlankNode):
        return f"<bnode>{_xml_escape(t.label)}</bnode>"
    if t.lang:
        return f'<literal xml:lang="{_xml_escape(t.lang, attr=True)}">{_xml_escape(t.lexical)}</literal>'
    if t.datatype:
        return f'<literal datatype="{_xml_escape(t.datatype, attr=True)}">{_xml_escape(t.lexical)}</literal>'
    return f"<literal>{_xml_escape(t.lexical)}</literal>"


def iter_solutions_xml(res: SolutionsResult) -> Iterator[str]:
    head = "".join(f'<variable name="{v}"/>' for v in res.variables)
    yield (
        '<?xml version="1.0"?>'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        f"<head>{head}</head><results>"
    )
    for batch in res.ds.iter_batches(batch_size=64 * 1024, batch_format="pandas"):
        rows = []
        for r in batch.itertuples(index=False):
            row = dict(zip(batch.columns, r))
            bindings = "".join(
                f'<binding name="{v}">{_xml_term(row[v])}</binding>'
                for v in res.variables
                if _norm(row.get(v)) is not None
            )
            rows.append(f"<result>{bindings}</result>")
        if rows:
            yield "".join(rows)
    yield "</results></sparql>"


def solutions_to_xml(res: SolutionsResult) -> str:
    return "".join(iter_solutions_xml(res))


def boolean_to(fmt: str, res: BooleanResult) -> str:
    v = "true" if res.value else "false"
    if fmt == "csv" or fmt == "tsv":
        return v + "\n"
    if fmt == "json":
        return json.dumps({"head": {}, "boolean": res.value}, separators=(",", ":"))
    if fmt == "xml":
        return (
            '<?xml version="1.0"?>'
            '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
            f"<head></head><boolean>{v}</boolean></sparql>"
        )
    raise ValueError(f"ASK queries only support csv/tsv/json/xml, not {fmt}")


def iter_graph_nt(res: GraphResult) -> Iterator[str]:
    for batch in res.ds.iter_batches(batch_size=64 * 1024, batch_format="pandas"):
        lines = []
        for r in batch.itertuples(index=False):
            d = dict(zip(batch.columns, r))
            lines.append(format_nt_line(d["subj"], d["pred"], d["obj"]))
        if lines:
            yield "\n".join(lines) + "\n"


def graph_to_nt(res: GraphResult) -> str:
    return "".join(iter_graph_nt(res))


def _turtle_renderer(ns):
    """Shared Turtle term renderer over a (mutated) namespace registry:
    prefix extraction over IRI namespaces (split at last # or /)."""
    from de_ray.model import RDF, canonical_to_nt

    def split_iri(iri: str):
        for sep in ("#", "/"):
            i = iri.rfind(sep)
            if i > len("http://") and i + 1 < len(iri):
                local = iri[i + 1 :]
                if local and all(c.isalnum() or c in "_-" for c in local):
                    return iri[: i + 1], local
        return None

    def term(t: str, predicate: bool = False) -> str:
        if predicate and t == RDF + "type":
            return "a"
        if not t.startswith('"') and not t.startswith("_:"):
            parts = split_iri(t)
            if parts:
                base, local = parts
                if base not in ns:
                    ns[base] = f"ns{len(ns)}"
                return f"{ns[base]}:{local}"
        return canonical_to_nt(t)

    return term


def _turtle_statements(triples, term) -> List[str]:
    """Subjects grouped with ``;`` / ``,`` shorthand, ``a`` for rdf:type."""
    from collections import OrderedDict

    by_subject: "OrderedDict[str, OrderedDict[str, list]]" = OrderedDict()
    for s, p, o in triples:
        by_subject.setdefault(s, OrderedDict()).setdefault(p, []).append(o)
    body_lines: List[str] = []
    for s, preds in by_subject.items():
        pred_strs = [
            f"{term(p, predicate=True)} " + ", ".join(term(o) for o in objs)
            for p, objs in preds.items()
        ]
        body_lines.append(f"{term(s)} " + " ;\n    ".join(pred_strs) + " .")
    return body_lines


def iter_graph_turtle(res: GraphResult) -> Iterator[str]:
    """Streamed compact Turtle (VERDICT r4 item 6): one chunk per batch,
    subjects grouped WITHIN the batch, ``@prefix`` directives interleaved
    the first time a namespace appears (valid Turtle: directives may occur
    between statements). Memory is O(batch), never O(graph); a subject
    spanning batches simply starts a new statement block — the same triple
    set, just less ``;``-compression at chunk boundaries. A ≤ one-batch
    graph is byte-identical to the old monolithic writer."""
    from collections import OrderedDict

    ns: "OrderedDict[str, str]" = OrderedDict()
    term = _turtle_renderer(ns)
    for batch in res.ds.iter_batches(batch_size=64 * 1024, batch_format="pandas"):
        triples = [
            (d["subj"], d["pred"], d["obj"])
            for d in (
                dict(zip(batch.columns, r)) for r in batch.itertuples(index=False)
            )
        ]
        if not triples:
            continue
        n_before = len(ns)
        body_lines = _turtle_statements(triples, term)
        header = "".join(
            f"@prefix {pfx}: <{base}> .\n"
            for base, pfx in list(ns.items())[n_before:]
        )
        body = "\n".join(body_lines)
        yield header + ("\n" if header and body else "") + body + "\n"


def graph_to_turtle(res: GraphResult, trig_graph: str = None) -> str:
    """Compact Turtle writer (K4). ``trig_graph`` wraps the block in
    ``GRAPH <g> { ... }`` (TriG; monolithic — the graph-store single-graph
    export path). Round-trips through de_ray.rdfio.turtle.parse_turtle."""
    from collections import OrderedDict

    if trig_graph is None:
        return "".join(iter_graph_turtle(res))
    triples = []
    for batch in res.ds.iter_batches(batch_size=64 * 1024, batch_format="pandas"):
        for r in batch.itertuples(index=False):
            d = dict(zip(batch.columns, r))
            triples.append((d["subj"], d["pred"], d["obj"]))
    ns: "OrderedDict[str, str]" = OrderedDict()
    term = _turtle_renderer(ns)
    body_lines = _turtle_statements(triples, term)
    header = "".join(f"@prefix {pfx}: <{base}> .\n" for base, pfx in ns.items())
    body = "\n".join(body_lines)
    body = f"GRAPH <{trig_graph}> {{\n{body}\n}}"
    out = header + ("\n" if header and body else "") + body
    return out + ("\n" if out else "")


def iter_graph_rdfxml(res: GraphResult) -> Iterator[str]:
    """Streamed RDF/XML graph writer (VERDICT r4 item 6): one
    rdf:Description per subject, grouped WITHIN each batch. The root
    element declares the namespaces the FIRST batch uses; namespaces first
    seen in a later batch are declared locally on each rdf:Description
    that needs them (XML allows xmlns on any element). Memory is O(batch);
    a ≤ one-batch graph is byte-identical to the old monolithic writer."""
    import re as _re
    from collections import OrderedDict

    ns: "OrderedDict[str, str]" = OrderedDict()

    def split_iri(iri: str):
        m = _re.search(r"[#/](?=[^#/]+$)", iri)
        cut = m.end() if m else 0
        base, local = iri[:cut], iri[cut:]
        if not local or not _re.fullmatch(r"[A-Za-z_][\w.-]*", local):
            raise ValueError(f"cannot make QName from {iri}")
        if base not in ns:
            ns[base] = f"ns{len(ns)}"
        return ns[base], local

    def render_batch(triples, root_declared):
        """Description elements; prefixes not on the root are declared on
        the element (root_declared is None while building the first batch,
        meaning everything lands on the root)."""
        by_subj: "OrderedDict[str, list]" = OrderedDict()
        for s, p, o in triples:
            by_subj.setdefault(s, []).append((p, o))
        body = []
        for s, pos in by_subj.items():
            props = []
            used = []
            for p, o in pos:
                pfx, local = split_iri(p)
                if pfx not in used:
                    used.append(pfx)
                t = canonical_to_term(o)
                if isinstance(t, Iri):
                    props.append(f'<{pfx}:{local} rdf:resource="{_xml_escape(t.value, attr=True)}"/>')
                elif isinstance(t, BlankNode):
                    props.append(f'<{pfx}:{local} rdf:nodeID="{_xml_escape(t.label, attr=True)}"/>')
                elif t.lang:
                    props.append(f'<{pfx}:{local} xml:lang="{t.lang}">{_xml_escape(t.lexical)}</{pfx}:{local}>')
                elif t.datatype:
                    props.append(
                        f'<{pfx}:{local} rdf:datatype="{_xml_escape(t.datatype, attr=True)}">'
                        f"{_xml_escape(t.lexical)}</{pfx}:{local}>"
                    )
                else:
                    props.append(f"<{pfx}:{local}>{_xml_escape(t.lexical)}</{pfx}:{local}>")
            subj_attr = (
                f'rdf:nodeID="{_xml_escape(s[2:], attr=True)}"'
                if s.startswith("_:")
                else f'rdf:about="{_xml_escape(s, attr=True)}"'
            )
            if root_declared is not None:
                inv = {p: b for b, p in ns.items()}
                extra = "".join(
                    f' xmlns:{p}="{_xml_escape(inv[p], attr=True)}"'
                    for p in used
                    if p not in root_declared
                )
                subj_attr += extra
            body.append(
                f"<rdf:Description {subj_attr}>{''.join(props)}</rdf:Description>"
            )
        return body

    root_declared = None
    for batch in res.ds.iter_batches(batch_size=64 * 1024, batch_format="pandas"):
        triples = [
            (d["subj"], d["pred"], d["obj"])
            for d in (
                dict(zip(batch.columns, r)) for r in batch.itertuples(index=False)
            )
        ]
        if not triples:
            continue
        body = render_batch(triples, root_declared)
        if root_declared is None:
            ns_decls = " ".join(
                f'xmlns:{p}="{_xml_escape(b, attr=True)}"' for b, p in ns.items()
            )
            root_declared = set(ns.values())
            yield (
                '<?xml version="1.0"?>'
                '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
                + ns_decls
                + ">"
                + "".join(body)
            )
        else:
            yield "".join(body)
    if root_declared is None:
        yield (
            '<?xml version="1.0"?>'
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" >'
        )
    yield "</rdf:RDF>"


def graph_to_rdfxml(res: GraphResult) -> str:
    return "".join(iter_graph_rdfxml(res))


def serialize_result_chunks(result, fmt: str = "csv") -> Iterator[str]:
    """Streamed serialization: yields the response in per-batch chunks so a
    large SELECT/CONSTRUCT is written to the wire without ever holding the
    full string (the reference streams via its ReadForWrite pull bridge,
    src/serve.rs:1426-1502). Subject-grouped writers (turtle/rdfxml)
    stream per batch too: subjects group within each batch, with
    interleaved ``@prefix`` / element-local ``xmlns`` declarations for
    namespaces first seen after the opening chunk. ``"".join(chunks)`` is
    byte-identical to :func:`serialize_result`."""
    fmt = fmt.lower()
    if isinstance(result, BooleanResult):
        yield boolean_to(fmt, result)
        return
    if isinstance(result, SolutionsResult):
        if fmt == "csv":
            yield from iter_solutions_csv(result)
        elif fmt == "tsv":
            yield from iter_solutions_tsv(result)
        elif fmt == "json":
            yield from iter_solutions_json(result)
        elif fmt == "xml":
            yield from iter_solutions_xml(result)
        else:
            raise ValueError(f"SELECT supports csv/tsv/json/xml, not {fmt}")
        return
    if isinstance(result, GraphResult):
        if fmt in ("turtle", "ttl", "n3", "trig"):
            # real compact Turtle (valid N3; a bare TriG default-graph block)
            yield from iter_graph_turtle(result)
        elif fmt in GRAPH_FORMATS:
            yield from iter_graph_nt(result)
        elif fmt == "rdfxml":
            yield from iter_graph_rdfxml(result)
        else:
            raise ValueError(
                f"graph results support {GRAPH_FORMATS + ('rdfxml',)}, not {fmt}"
            )
        return
    raise ValueError(f"unknown result {result!r}")


def serialize_result(result, fmt: str = "csv") -> str:
    return "".join(serialize_result_chunks(result, fmt))
