"""HTTP serve surface: SPARQL 1.1 Protocol + Graph Store Protocol subset.

Parity target: the reference's ``serve`` subcommand (``src/serve.rs:162-524``
routes; update validation matrix ``src/serve.rs:798-962``; handler tests
``tests/test-server.rs``):

- ``GET/POST /query``  — SPARQL Protocol (query param / form / raw body),
  content-negotiated results; a bare GET returns the service description.
- ``POST /update``     — append-only graph-store discipline: CREATE and
  INSERT DATA **into new graphs** succeed (204); DELETE DATA and
  DELETE/INSERT are FORBIDDEN (403, ``src/serve.rs:880-891``); LOAD
  validates but is NOT_IMPLEMENTED (``src/serve.rs:1056``); CLEAR/DROP of
  named graphs succeed.
- ``/store``           — Graph Store Protocol: GET (serialize graph /
  dataset), PUT (create 201 / replace 204), POST (merge into new graph),
  DELETE (204 / 404), HEAD (200 / 404) — ``src/serve.rs:283-518``.

The handler is a pure function (``handle_request``) exactly like the
reference's, so tests exercise the full matrix in-process; ``serve()``
wraps it in a stdlib ThreadingHTTPServer. Request-time state is an
in-memory graph registry (graph → Arrow triples table) seeded from a
directory of stores/.hdt files — mirroring the reference's registry-of-HDTs,
which also re-syncs and reloads per request (``src/serve.rs:158-161``).
Bulk loads stay columnar end-to-end (the reference likewise keeps loaded
HDTs in their compressed in-memory form, ``src/sparql.rs:101-117``).
"""

from __future__ import annotations

import itertools
import logging
import os
import urllib.parse
from typing import Dict, List, Optional, Tuple

from de_ray.query.parser import _T, Parser
from de_ray.rdfio.ntriples import format_nt_line, parse_nt_text

Triple = Tuple[str, str, str]


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------


_TRIPLE_SCHEMA = None  # built lazily (pyarrow import deferred)


def _triple_schema():
    global _TRIPLE_SCHEMA
    if _TRIPLE_SCHEMA is None:
        import pyarrow as pa

        _TRIPLE_SCHEMA = pa.schema(
            [
                ("subj", pa.large_string()),
                ("pred", pa.large_string()),
                ("obj", pa.large_string()),
            ]
        )
    return _TRIPLE_SCHEMA


def _tuples_to_table(triples):
    import pyarrow as pa

    rows = list(triples)
    return pa.table(
        {
            "subj": pa.array([t[0] for t in rows], pa.large_string()),
            "pred": pa.array([t[1] for t in rows], pa.large_string()),
            "obj": pa.array([t[2] for t in rows], pa.large_string()),
        }
    )


class GraphTable:
    """One graph's triples: Arrow chunks (bulk loads stay columnar, no
    Python tuple materialization) + a small tuple tail for incremental
    INSERT DATA appends, folded into a chunk on first read."""

    def __init__(self, table=None):
        self._chunks = [] if table is None or table.num_rows == 0 else [table]
        self._tail: List[Triple] = []

    def append_rows(self, triples) -> None:
        self._tail.extend(triples)

    def table(self):
        """Consolidated Arrow table (folds the tail)."""
        import pyarrow as pa

        if self._tail:
            self._chunks.append(_tuples_to_table(self._tail))
            self._tail = []
        if not self._chunks:
            return _triple_schema().empty_table()
        if len(self._chunks) > 1:
            self._chunks = [pa.concat_tables(self._chunks).combine_chunks()]
        return self._chunks[0]

    @property
    def num_rows(self) -> int:
        return sum(c.num_rows for c in self._chunks) + len(self._tail)

    def __contains__(self, triple) -> bool:
        return tuple(triple) in set(self.iter_triples())

    def iter_triples(self):
        """Tuple view — used only at serialization boundaries."""
        t = self.table()
        yield from zip(
            t.column("subj").to_pylist(),
            t.column("pred").to_pylist(),
            t.column("obj").to_pylist(),
        )


class ServeState:
    """In-memory graph registry (reference AggregateHdt, src/sparql.rs:14-17).

    Graphs are held as Arrow tables (columnar, zero Python-tuple overhead
    for bulk-loaded stores), mutated through the narrow append-only API the
    update matrix allows."""

    def __init__(
        self,
        *,
        load_roots: Optional[List[str]] = None,
        allow_network_load: bool = False,
    ):
        self.graphs: Dict[str, GraphTable] = {}
        # LOAD policy (ADVICE r4): ``load_roots`` restricts file:// LOAD to
        # realpath-prefix matches (None = unrestricted, for in-process
        # library use where the caller already has file access — the HTTP
        # server constructs state via from_dir, which defaults to the
        # served directory); ``allow_network_load`` opts in to http(s)
        # LOAD (default off: no outbound HTTP, the IRI keeps the 501).
        self.load_roots = (
            None if load_roots is None else [os.path.realpath(r) for r in load_roots]
        )
        self.allow_network_load = allow_network_load

    @classmethod
    def from_dir(
        cls,
        path: str,
        *,
        load_roots: Optional[List[str]] = None,
        allow_network_load: bool = False,
    ) -> "ServeState":
        """Load every completed store directory and ``.hdt`` file under
        ``path`` (reference dir scan, src/serve.rs:61-72). Store scans stay
        Arrow end-to-end: batches stream from the decode tasks and are
        split per graph with vectorized filters.

        file:// LOAD defaults to the served directory only (realpath
        prefix check) — POST /update must not be a read primitive over the
        whole filesystem; pass explicit ``load_roots`` to widen."""
        import pyarrow as pa
        import pyarrow.compute as pc

        st = cls(
            load_roots=[path] if load_roots is None else load_roots,
            allow_network_load=allow_network_load,
        )
        if not os.path.isdir(path):
            return st
        for name in sorted(os.listdir(path)):
            p = os.path.join(path, name)
            if os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS")):
                from de_ray.hdt.store import Store

                store = Store(p)
                batches = list(
                    store.pattern_scan().iter_batches(
                        batch_size=256 * 1024, batch_format="pyarrow"
                    )
                )
                if not batches:
                    continue
                tbl = pa.concat_tables(batches, promote_options="permissive")
                for g in pc.unique(tbl.column("graph")).to_pylist():
                    sub = tbl.filter(pc.equal(tbl.column("graph"), g)).select(
                        ["subj", "pred", "obj"]
                    )
                    sub = sub.cast(_triple_schema())
                    if g in st.graphs:
                        st.graphs[g].append_rows(
                            zip(*(sub.column(c).to_pylist() for c in sub.column_names))
                        )
                    else:
                        st.graphs[g] = GraphTable(sub.combine_chunks())
            elif name.endswith(".hdt"):
                from de_ray.hdt.hdtfile import read_hdt_file

                _hdr, triples = read_hdt_file(p)
                st.graphs[f"file:///{name}"] = GraphTable(_tuples_to_table(triples))
        return st

    def contains(self, graph: str) -> bool:
        return graph in self.graphs

    def names(self) -> List[str]:
        return sorted(self.graphs)

    def create(self, graph: str) -> None:
        self.graphs.setdefault(graph, GraphTable())

    def insert(self, graph: str, triples) -> None:
        self.graphs.setdefault(graph, GraphTable()).append_rows(triples)

    def replace(self, graph: str, triples) -> None:
        self.graphs[graph] = GraphTable(_tuples_to_table(triples))

    def drop(self, graph: str) -> None:
        self.graphs.pop(graph, None)

    def drop_all(self) -> None:
        self.graphs.clear()

    def source(self, named: Optional[List[str]] = None):
        return _MemSource(self, named)


class _MemSource:
    """TripleSource over the registry (union default graph, src/serve.rs:58).
    Scans are vectorized Arrow filters over the per-graph tables."""

    def __init__(self, state: ServeState, named: Optional[List[str]] = None):
        self.state = state
        self.named = named

    def _union_table(self):
        import pyarrow as pa

        names = self.named if self.named is not None else list(self.state.graphs)
        tables = [
            self.state.graphs[g].table() for g in names if g in self.state.graphs
        ]
        if not tables:
            return _triple_schema().empty_table()
        return tables[0] if len(tables) == 1 else pa.concat_tables(tables)

    def scan(self, s, p, o):
        import pyarrow.compute as pc
        import ray.data as rd

        tbl = self._union_table()
        for col, want in (("subj", s), ("pred", p), ("obj", o)):
            if want is not None and tbl.num_rows:
                tbl = tbl.filter(pc.equal(tbl.column(col), want))
        return rd.from_arrow(tbl)

    def graph_names(self) -> List[str]:
        names = self.named if self.named is not None else list(self.state.graphs)
        return sorted(names)

    def restrict(self, graphs):
        return _MemSource(self.state, list(graphs))


# ---------------------------------------------------------------------------
# SPARQL UPDATE parsing (subset matching the reference's validation matrix)
# ---------------------------------------------------------------------------


class UpdateError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


def _parse_quads(parser: Parser, tk: _T) -> List[Tuple[Optional[str], Triple]]:
    """Parse an INSERT DATA quad block: triples and GRAPH <g> { triples }."""
    tk.expect("{")
    out: List[Tuple[Optional[str], Triple]] = []
    while True:
        k, v = tk.peek()
        if v == "}":
            tk.next()
            return out
        if k == "word" and v.upper() == "GRAPH":
            tk.next()
            g = parser._term(tk)
            tk.expect("{")
            while tk.peek()[1] != "}":
                s = parser._term(tk)
                p = parser._term(tk, predicate=True)
                o = parser._term(tk)
                out.append((g, (s, p, o)))
                if tk.peek()[1] == ".":
                    tk.next()
            tk.next()
            continue
        s = parser._term(tk)
        p = parser._term(tk, predicate=True)
        o = parser._term(tk)
        out.append((None, (s, p, o)))
        if tk.peek()[1] == ".":
            tk.next()


def _parse_update_ops(text: str):
    """Parse an update request into an ops list — state-free, so network
    LOAD prefetch can reuse it OUTSIDE the dispatch lock."""
    parser = Parser()
    tk = _T(text)
    ops = []
    while tk.peek()[0] is not None:
        w = tk.try_word("PREFIX", "BASE")
        if w == "PREFIX":
            k, pname = tk.next()
            pfx = pname[: pname.index(":")]
            _k2, iri = tk.next()
            parser.prefixes[pfx] = iri[1:-1]
            continue
        if w == "BASE":
            tk.next()
            continue
        word = tk.try_word(
            "CREATE", "INSERT", "DELETE", "LOAD", "CLEAR", "DROP", "WITH"
        )
        if word is None:
            if tk.peek()[1] == ";":
                tk.next()
                continue
            raise UpdateError(400, f"cannot parse update at {tk.peek()[1]!r}")
        if word == "CREATE":
            silent = bool(tk.try_word("SILENT"))
            if not tk.try_word("GRAPH"):
                raise UpdateError(400, "expected GRAPH after CREATE")
            g = parser._term(tk)
            ops.append(("create", g, silent))
        elif word == "INSERT":
            if not tk.try_word("DATA"):
                raise UpdateError(
                    403,
                    "DELETE/INSERT operations are not allowed. Only INSERT DATA "
                    "to new graphs is permitted.",
                )
            quads = _parse_quads(parser, tk)
            ops.append(("insert_data", quads, False))
        elif word == "DELETE":
            raise UpdateError(
                403,
                "DELETE DATA is not allowed. Only INSERT DATA to new graphs is "
                "permitted.",
            )
        elif word == "WITH":
            raise UpdateError(
                403,
                "DELETE/INSERT operations are not allowed. Only INSERT DATA to "
                "new graphs is permitted.",
            )
        elif word == "LOAD":
            silent = bool(tk.try_word("SILENT"))
            src = parser._term(tk)
            dest = None
            if tk.try_word("INTO"):
                if not tk.try_word("GRAPH"):
                    raise UpdateError(400, "expected GRAPH after INTO")
                dest = parser._term(tk)
            ops.append(("load", (src, dest), silent))
        elif word in ("CLEAR", "DROP"):
            silent = bool(tk.try_word("SILENT"))
            tgt = tk.try_word("GRAPH", "NAMED", "ALL", "DEFAULT")
            if tgt == "GRAPH":
                g = parser._term(tk)
                ops.append(("drop", g, silent))
            elif tgt in ("NAMED", "ALL"):
                ops.append(("drop_all", None, silent))
            elif tgt == "DEFAULT":
                raise UpdateError(403, "the default graph cannot be cleared")
            else:
                raise UpdateError(400, f"expected GRAPH/NAMED/ALL after {word}")
    return ops


def prefetch_network_loads(state: ServeState, text: str) -> Dict[str, object]:
    """Fetch http(s) LOAD documents BEFORE the dispatch lock is taken (a
    slow remote must not stall every other request — review r5): returns
    {src_iri: triples-list | Exception} for apply_update to consume under
    the lock. Parse errors are swallowed here — apply_update re-raises
    them properly. No-op unless the server opted into network LOAD."""
    cache: Dict[str, object] = {}
    if not state.allow_network_load:
        return cache
    try:
        ops = _parse_update_ops(text)
    except Exception:
        return cache
    for kind, payload, _silent in ops:
        if kind != "load":
            continue
        src, _dest = payload
        if src.startswith("http://") or src.startswith("https://"):
            if src not in cache:
                try:
                    cache[src] = _load_network_triples(src)
                except Exception as e:
                    cache[src] = e
    return cache


def apply_update(
    state: ServeState, text: str, net_cache: Optional[Dict[str, object]] = None
) -> None:
    """Validate-then-execute, two passes like the reference
    (``src/serve.rs:783-1121``). Raises UpdateError with the matching
    HTTP status. ``net_cache`` carries pre-fetched network LOAD payloads
    (from :func:`prefetch_network_loads`, fetched outside the lock)."""
    ops = _parse_update_ops(text)

    # validation pass (reference src/serve.rs:798-962)
    for i, (kind, payload, silent) in enumerate(ops):
        if kind == "create":
            if state.contains(payload) and not silent:
                raise UpdateError(403, f"Graph {payload} already exists.")
        elif kind == "insert_data":
            used = set()
            for g, _t in payload:
                if g is None:
                    raise UpdateError(
                        403,
                        "INSERT DATA to default graph is not allowed. Only named "
                        "graphs are supported.",
                    )
                used.add(g)
            for g in used:
                if state.contains(g):
                    raise UpdateError(
                        403,
                        f"Graph {g} already exists. INSERT DATA is only allowed "
                        "to new graphs.",
                    )
        elif kind == "load":
            src, dest = payload
            if dest is None:
                raise UpdateError(
                    403,
                    "LOAD to default graph is not allowed. Only named graphs can "
                    "be created.",
                )
            if state.contains(dest) and not silent:
                raise UpdateError(403, f"Graph {dest} already exists.")
            # beyond-reference: the reference validates LOAD then 501s at
            # execution (src/serve.rs:1045-1059); we execute file:// loads
            # through the library's own RDF parsers, restricted to
            # state.load_roots (realpath prefix — /update must not be a
            # filesystem read primitive, ADVICE r4), and http(s) loads only
            # when the server opted in via allow_network_load (default
            # off: the IRI keeps the reference's 501).
            # The document is parsed HERE, once: errors must raise before
            # any op executes (no half-applied multi-op requests), and the
            # execution pass then only appends the cached triples. A
            # resolved payload of None means "validated no-op" (SILENT
            # failure or SILENT load into a pre-existing graph).
            triples = None
            is_file = src.startswith("file://")
            is_net = src.startswith("http://") or src.startswith("https://")
            if not is_file and not (is_net and state.allow_network_load):
                if not silent:
                    raise UpdateError(
                        501,
                        "LOAD from network IRIs is not implemented. Use a "
                        "file:// IRI, INSERT DATA, or the /store endpoint "
                        "with PUT to add new graphs.",
                    )
            elif not (silent and state.contains(dest)):
                try:
                    if is_file:
                        triples = _load_file_triples(src, roots=state.load_roots)
                    elif net_cache is not None and src in net_cache:
                        cached = net_cache[src]
                        if isinstance(cached, Exception):
                            raise cached
                        triples = cached
                    else:
                        triples = _load_network_triples(src)
                except UpdateError:
                    if not silent:
                        raise
                    triples = None
                except Exception as e:
                    if not silent:
                        raise UpdateError(400, f"cannot load {src}: {e}")
                    triples = None
            ops[i] = ("load", (dest, triples), silent)
        elif kind == "drop":
            if not state.contains(payload) and not silent:
                raise UpdateError(404, f"The graph {payload} does not exist")

    # execution pass
    for kind, payload, silent in ops:
        if kind == "create":
            state.create(payload)
        elif kind == "insert_data":
            for g, t in payload:
                state.insert(g, [t])
        elif kind == "load":
            dest, triples = payload
            if triples is None:
                continue  # validated SILENT no-op
            # insert (create-or-append): LOAD merges into the target, so
            # CREATE GRAPH <g>; LOAD ... INTO <g> in one request works and
            # two LOADs into the same new graph accumulate
            state.insert(dest, triples)
        elif kind == "drop":
            state.drop(payload)
        elif kind == "drop_all":
            state.drop_all()


def _load_file_triples(src_iri: str, roots: Optional[List[str]] = None):
    """Parse a ``file://`` RDF document into (s, p, o) triples via the
    library's own extension router (``rdfio.sources._parse_file_row`` —
    the same table the CLI's file-type router M2 uses, so Turtle/N3/TriG,
    N-Triples/N-Quads AND RDF/XML (.rdf/.owl/.xml) all work and new
    formats need no second routing table here). CLI-scale driver-side
    parse, same as the /store body loaders.

    ``roots`` (when given) is an allow-list of directories: the source's
    realpath must sit inside one of them. Checked BEFORE existence so a
    denied path leaks nothing about the filesystem."""
    import urllib.request

    from de_ray.rdfio.sources import _parse_file_row

    path = urllib.request.url2pathname(urllib.parse.urlsplit(src_iri).path)
    if roots is not None:
        real = os.path.realpath(path)
        if not any(
            real == r or real.startswith(r.rstrip(os.sep) + os.sep) for r in roots
        ):
            raise UpdateError(
                403, f"LOAD source {src_iri} is outside the allowed load roots"
            )
    if not os.path.exists(path):
        raise UpdateError(400, f"LOAD source {src_iri} does not exist")
    with open(path, "rb") as f:
        data = f.read()
    try:
        rows = _parse_file_row({"path": path, "bytes": data})
    except ValueError as e:  # unhandled extension / parse failure
        raise UpdateError(400, f"cannot load {src_iri}: {e}")
    return [(r["subj"], r["pred"], r["obj"]) for r in rows]


_NET_LOAD_CAP = 128 * 1024 * 1024  # reference body cap, src/serve.rs:42
_CT_TO_EXT = {
    "text/turtle": ".ttl",
    "application/n-triples": ".nt",
    "application/n-quads": ".nq",
    "application/trig": ".trig",
    "text/n3": ".n3",
    "application/rdf+xml": ".rdf",
}


def _load_network_triples(src_iri: str, deadline_sec: float = 60.0):
    """Fetch + parse an ``http(s)://`` RDF document (opt-in via
    ``allow_network_load`` — beyond the reference, which 501s all LOAD
    execution at src/serve.rs:1045-1059). Format comes from the URL path
    extension, falling back to the response Content-Type; the body is
    capped at the reference's 128 MB request limit.

    Hardening (review r5): redirects are refused — a redirect could
    bounce the server into internal-only hosts (SSRF) — and the read
    enforces a TOTAL wall deadline, not just urllib's per-socket-op
    timeout, so a byte-trickling remote cannot pin the request thread."""
    import time
    import urllib.error
    import urllib.request

    from de_ray.rdfio.sources import _parse_file_row

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            raise urllib.error.HTTPError(
                req.full_url, code, "redirects are not followed for LOAD", headers, fp
            )

    opener = urllib.request.build_opener(_NoRedirect)
    try:
        start = time.monotonic()
        with opener.open(src_iri, timeout=15) as resp:
            parts = []
            total = 0
            while total <= _NET_LOAD_CAP:
                if time.monotonic() - start > deadline_sec:
                    raise UpdateError(
                        400, f"LOAD source {src_iri} exceeded the fetch deadline"
                    )
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                parts.append(chunk)
                total += len(chunk)
            data = b"".join(parts)
            ctype = (resp.headers.get("Content-Type") or "").split(";")[0].strip()
    except UpdateError:
        raise
    except Exception as e:
        raise UpdateError(400, f"cannot fetch {src_iri}: {e}")
    if len(data) > _NET_LOAD_CAP:
        raise UpdateError(400, f"LOAD source {src_iri} exceeds the 128 MB cap")
    path = urllib.parse.urlsplit(src_iri).path
    ext = os.path.splitext(path)[1].lower()
    if ext not in (".nt", ".nq", ".ttl", ".n3", ".trig", ".rdf", ".xml", ".owl"):
        ext = _CT_TO_EXT.get(ctype.lower(), ext)
    try:
        rows = _parse_file_row({"path": f"remote{ext or '.ttl'}", "bytes": data})
    except ValueError as e:
        raise UpdateError(400, f"cannot load {src_iri}: {e}")
    return [(r["subj"], r["pred"], r["obj"]) for r in rows]


# ---------------------------------------------------------------------------
# Content negotiation
# ---------------------------------------------------------------------------

_SOLUTION_TYPES = {
    "application/sparql-results+json": "json",
    "application/json": "json",
    "text/csv": "csv",
    "text/tab-separated-values": "tsv",
    "application/sparql-results+xml": "xml",
}
_GRAPH_TYPES = {
    "application/n-triples": "ntriple",
    "text/turtle": "turtle",
    "application/rdf+xml": "rdfxml",
    "application/n-quads": "nquads",
    "text/n3": "n3",
    "application/trig": "trig",
}


def _negotiate(accept: str, table: Dict[str, str], default: str) -> str:
    for part in (accept or "").split(","):
        mt = part.split(";")[0].strip().lower()
        if mt in table:
            return table[mt]
        if mt in ("*/*", ""):
            return default
    return default


# ---------------------------------------------------------------------------
# Query UI (reference bundles YASGUI at "/", src/serve.rs:163-194; no
# third-party assets exist in this environment, so a self-contained minimal
# editor stands in: textarea → POST /query → table of JSON bindings)
# ---------------------------------------------------------------------------

_UI_HTML = b"""<!doctype html>
<html><head><meta charset="utf-8"><title>de_ray SPARQL endpoint</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;max-width:60rem}
 textarea{width:100%;height:10rem;font-family:monospace;font-size:0.9rem}
 table{border-collapse:collapse;margin-top:1rem}
 td,th{border:1px solid #999;padding:0.25rem 0.5rem;font-family:monospace}
 #err{color:#b00;white-space:pre-wrap}
</style></head><body>
<h1>de_ray SPARQL endpoint</h1>
<textarea id="q">SELECT ?s ?p ?o WHERE { ?s ?p ?o } LIMIT 25</textarea><br>
<button onclick="run()">Run</button> <span id="err"></span>
<div id="out"></div>
<script>
async function run(){
  const err=document.getElementById('err'), out=document.getElementById('out');
  err.textContent=''; out.innerHTML='';
  const r=await fetch('/query',{method:'POST',
    headers:{'Content-Type':'application/sparql-query',
             'Accept':'application/sparql-results+json'},
    body:document.getElementById('q').value});
  if(!r.ok){err.textContent=await r.text();return}
  const d=await r.json();
  if('boolean' in d){out.textContent='ASK: '+d.boolean;return}
  const vars=d.head.vars, rows=d.results.bindings;
  let h='<table><tr>'+vars.map(v=>'<th>?'+v+'</th>').join('')+'</tr>';
  for(const b of rows){
    h+='<tr>'+vars.map(v=>'<td>'+(v in b?b[v].value.replace(/&/g,'&amp;')
      .replace(/</g,'&lt;'):'')+'</td>').join('')+'</tr>';
  }
  out.innerHTML=h+'</table>';
}
</script></body></html>
"""


# ---------------------------------------------------------------------------
# Handler (pure function — mirrors reference handle_request)
# ---------------------------------------------------------------------------


def handle_request_stream(
    method: str,
    path: str,
    state: ServeState,
    headers: Optional[Dict[str, str]] = None,
    body: bytes = b"",
):
    """→ (status, content_type, body) where body is ``bytes`` OR an
    iterator of ``str`` chunks (successful /query responses — written to
    the wire chunk-by-chunk, never holding the full serialization).
    Never raises for protocol errors; chunk iteration may raise if query
    EXECUTION fails mid-stream, mirroring the reference's streaming
    writer (src/serve.rs:1426-1502)."""
    headers = {k.lower(): v for k, v in (headers or {}).items()}
    parsed = urllib.parse.urlsplit(path)
    route = parsed.path
    params = urllib.parse.parse_qs(parsed.query)

    # ThreadingHTTPServer shares ONE mutable ServeState across request
    # threads; GraphTable.table()'s tail fold racing an INSERT can drop
    # acknowledged triples. One reentrant lock serializes dispatch — the
    # endpoint is read-mostly at CLI scale and the reference likewise
    # serializes state access behind interior mutability. Query-result
    # chunks iterate AFTER release: they only read the immutable Arrow
    # snapshot captured by state.source() during dispatch.
    # Network LOAD documents are fetched BEFORE the lock (review r5: a
    # slow remote held the lock and stalled every concurrent request).
    net_cache = None
    if route == "/update" and method == "POST" and state.allow_network_load:
        text = _update_text(headers, body)
        if text is not None:
            net_cache = prefetch_network_loads(state, text)
    with _STATE_LOCK:
        return _dispatch(method, route, params, headers, body, state, net_cache)


def handle_request(
    method: str,
    path: str,
    state: ServeState,
    headers: Optional[Dict[str, str]] = None,
    body: bytes = b"",
) -> Tuple[int, str, bytes]:
    """→ (status, content_type, body). Never raises for protocol errors."""
    status, ctype, out = handle_request_stream(method, path, state, headers, body)
    if not isinstance(out, (bytes, bytearray)):
        try:
            out = "".join(out).encode()
        except Exception as e:  # mid-stream execution error → 400 as before
            return 400, "text/plain", str(e).encode()
    return status, ctype, out


_STATE_LOCK = __import__("threading").RLock()


def _update_text(headers, body) -> Optional[str]:
    """Decode a POST /update body per its content type (None → 415)."""
    ct = headers.get("content-type", "")
    base = ct.split(";")[0]
    if base == "application/x-www-form-urlencoded":
        form = urllib.parse.parse_qs(body.decode("utf-8"))
        return form.get("update", [""])[0]
    if base in ("application/sparql-update", "text/plain", ""):
        return body.decode("utf-8")
    return None


def _dispatch(
    method, route, params, headers, body, state, net_cache=None
) -> Tuple[int, str, bytes]:
    try:
        if route == "/" and method in ("GET", "HEAD"):
            return 200, "text/html", _UI_HTML
        if route == "/query" and method in ("GET", "POST"):
            return _handle_query(method, params, headers, body, state)
        if route == "/update":
            if method != "POST":
                return 405, "text/plain", b"use POST for /update"
            text = _update_text(headers, body)
            if text is None:
                ct = headers.get("content-type", "")
                return 415, "text/plain", f"unsupported media type {ct}".encode()
            try:
                apply_update(state, text, net_cache)
            except UpdateError as e:
                return e.status, "text/plain", str(e).encode()
            return 204, "text/plain", b""
        if route.startswith("/store"):
            return _handle_store(method, params, headers, body, state)
        return 404, "text/plain", f"{method} {route} is not supported".encode()
    except Exception as e:  # parse errors etc → 400 like the reference
        return 400, "text/plain", str(e).encode()


def _handle_query(method, params, headers, body, state) -> Tuple[int, str, bytes]:
    from de_ray.query.engine import GraphResult, SolutionsResult, evaluate
    from de_ray.query.parser import parse_query
    from de_ray.query.serialize import serialize_result_chunks

    query_text = None
    if method == "GET":
        query_text = params.get("query", [None])[0]
    else:
        ct = headers.get("content-type", "").split(";")[0]
        if ct == "application/sparql-query":
            query_text = body.decode("utf-8")
        elif ct == "application/x-www-form-urlencoded":
            form = urllib.parse.parse_qs(body.decode("utf-8"))
            query_text = form.get("query", [None])[0]
        elif ct:
            return 415, "text/plain", f"unsupported media type {ct}".encode()
    if query_text is None:
        if method == "POST":
            # the service description is reserved for bare GET (SPARQL
            # Protocol): a POST body with no query is a client error
            return 400, "text/plain", b"missing query parameter"
        # bare GET /query -> service description (reference src/serve.rs:196-204)
        from de_ray.query.service import service_description

        nt = "\n".join(format_nt_line(*t) for t in service_description()) + "\n"
        return 200, "application/n-triples", nt.encode()

    named = params.get("named-graph-uri")
    source = state.source(named=named)
    accept = headers.get("accept", "")
    try:
        q = parse_query(query_text)
        res = evaluate(q, source)
    except ValueError as e:
        return 400, "text/plain", str(e).encode()
    if isinstance(res, GraphResult):
        fmt = _negotiate(accept, _GRAPH_TYPES, "ntriple")
        mt = next(k for k, v in _GRAPH_TYPES.items() if v == fmt)
    else:
        fmt = _negotiate(accept, _SOLUTION_TYPES, "json")
        mt = next(k for k, v in _SOLUTION_TYPES.items() if v == fmt)
    return 200, mt, serialize_result_chunks(res, fmt)


def _graph_param(params) -> Optional[str]:
    g = params.get("graph", [None])[0]
    if g is None and params.get("default"):
        return None
    return g


def _handle_store(method, params, headers, body, state) -> Tuple[int, str, bytes]:
    target = _graph_param(params)
    if method == "GET":
        if target is not None:
            if not state.contains(target):
                return 404, "text/plain", f"The graph {target} does not exist".encode()
            triples = state.graphs[target].iter_triples()
        else:
            triples = (
                t for g in state.names() for t in state.graphs[g].iter_triples()
            )
        nt = "\n".join(format_nt_line(*t) for t in triples)
        return 200, "application/n-triples", (nt + "\n" if nt else "").encode()
    if method == "HEAD":
        if target is not None and not state.contains(target):
            return 404, "text/plain", b""
        return 200, "text/plain", b""
    ct = headers.get("content-type", "").split(";")[0]
    if method in ("PUT", "POST"):
        if not ct:
            return 400, "text/plain", b"No Content-Type given"
        if ct not in ("application/n-triples", "text/plain", "text/turtle"):
            return 415, "text/plain", f"unsupported media type {ct}".encode()
        if ct == "text/turtle":
            from de_ray.rdfio.turtle import parse_turtle

            triples = parse_turtle(body.decode("utf-8"))
        else:
            triples = parse_nt_text(body.decode("utf-8"))
        if target is None:
            return 400, "text/plain", b"graph target required"
        existed = state.contains(target)
        if method == "PUT":
            state.replace(target, triples)  # replace (src/serve.rs:390-437)
        else:
            state.insert(target, triples)
        return (204 if existed else 201), "text/plain", b""
    if method == "DELETE":
        if target is None:
            state.drop_all()
            return 204, "text/plain", b""
        if not state.contains(target):
            return 404, "text/plain", f"The graph {target} does not exist".encode()
        state.drop(target)
        return 204, "text/plain", b""
    return 405, "text/plain", b"method not allowed"


# ---------------------------------------------------------------------------
# stdlib HTTP wrapper
# ---------------------------------------------------------------------------


def serve(load_dir: str, bind: str = "127.0.0.1:7878", **load_policy):
    """Run the HTTP endpoint (blocking). Returns the server object when
    constructed with ``start=False`` via :func:`make_server`."""
    server = make_server(load_dir, bind, **load_policy)
    server.serve_forever()


def make_server(
    load_dir: str,
    bind: str = "127.0.0.1:0",
    *,
    load_roots: Optional[List[str]] = None,
    allow_network_load: bool = False,
):
    """``load_roots`` / ``allow_network_load`` set the LOAD policy
    (ADVICE r4): by default POST /update may LOAD file:// sources only
    from inside ``load_dir``, and network IRIs 501."""
    import http.server

    state = ServeState.from_dir(
        load_dir, load_roots=load_roots, allow_network_load=allow_network_load
    )
    host, _, port = bind.partition(":")

    class Handler(http.server.BaseHTTPRequestHandler):
        # chunked transfer-encoding is an HTTP/1.1 feature; the default
        # HTTP/1.0 response line makes spec-following clients ignore the
        # Transfer-Encoding header and read raw chunk framing as the body
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _run(self, method):
            ln = int(self.headers.get("Content-Length", "0") or 0)
            body = self.rfile.read(ln) if ln else b""
            status, ctype, out = handle_request_stream(
                method, self.path, state, dict(self.headers), body
            )
            if isinstance(out, (bytes, bytearray)):
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                if method != "HEAD":
                    self.wfile.write(out)
                return
            # query-result chunks: stream to the wire — the full response
            # string is never built, for ANY client version.
            # Pull the first chunk BEFORE the status line: a lazy query
            # error that fires immediately (the common case — plan-time
            # and first-batch failures) still becomes a clean 400 instead
            # of a truncated 200 (ADVICE r4).
            chunks = iter(out)
            try:
                first = next(chunks, "")
            except Exception as e:
                self._send_clean_error(400, e)
                return
            # An HTTP/1.0 client ignores Transfer-Encoding and would read
            # raw chunk framing as the body (ADVICE r4); buffering instead
            # would hand any client an O(result) memory knob (review r5).
            # HTTP/1.0's native framing is close-delimited: stream the raw
            # chunks and close the connection when done.
            chunked = self.request_version == "HTTP/1.1"
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            if chunked:
                self.send_header("Transfer-Encoding", "chunked")
            else:
                self.send_header("Connection", "close")
                self.close_connection = True
            self.end_headers()
            if method != "HEAD":
                try:
                    for chunk in itertools.chain([first], chunks):
                        data = chunk.encode()
                        if not data:
                            continue
                        if chunked:
                            self.wfile.write(
                                f"{len(data):X}\r\n".encode() + data + b"\r\n"
                            )
                        else:
                            self.wfile.write(data)
                    if chunked:
                        self.wfile.write(b"0\r\n\r\n")
                except Exception:
                    # mid-stream failure: no terminal chunk can be sent —
                    # close the connection so the client sees truncation,
                    # and log instead of letting the request thread die
                    # silently (ADVICE r4)
                    logging.getLogger(__name__).exception(
                        "mid-stream failure serializing %s %s",
                        method,
                        self.path,
                    )
                    self.close_connection = True

        def _send_clean_error(self, code, exc):
            """send_error with a status-line-safe reason: collapse
            whitespace AND force ASCII — BaseHTTPRequestHandler encodes
            the status line latin-1 strict, so a non-ASCII parse-error
            fragment (IRIs, literals) would otherwise kill the response
            entirely (review r5)."""
            msg = " ".join(str(exc).split())[:200]
            msg = msg.encode("ascii", "replace").decode("ascii") or "query failed"
            self.send_error(code, msg)

        def do_GET(self):
            self._run("GET")

        def do_POST(self):
            self._run("POST")

        def do_PUT(self):
            self._run("PUT")

        def do_DELETE(self):
            self._run("DELETE")

        def do_HEAD(self):
            self._run("HEAD")

    server = http.server.ThreadingHTTPServer((host, int(port or 0)), Handler)
    server.de_ray_state = state
    return server
