"""HTTP serve surface vs the reference's handler test matrix
(tests/test-server.rs:55-455; routes src/serve.rs:162-524; update
validation src/serve.rs:798-962)."""

import json

import pytest

from de_ray.serve import ServeState, handle_request

EX = "http://example.org/"


@pytest.fixture()
def state():
    st = ServeState()
    st.replace("file:///banana.hdt", [
        (f"{EX}Banana", f"{EX}hasColor", '"yellow"'),
        (f"{EX}Banana", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", f"{EX}Fruit"),
    ])
    return st


def _post_query(state, q, accept="application/sparql-results+json"):
    return handle_request(
        "POST", "/query", state,
        {"Content-Type": "application/sparql-query", "Accept": accept},
        q.encode(),
    )


def test_sparql_query_post(state):
    status, ct, body = _post_query(state, "SELECT ?s WHERE { ?s ?p ?o }")
    assert status == 200 and ct == "application/sparql-results+json"
    d = json.loads(body)
    assert {b["s"]["value"] for b in d["results"]["bindings"]} == {f"{EX}Banana"}


def test_sparql_query_ask(state):
    status, _, body = _post_query(
        state, f'ASK {{ <{EX}Banana> <{EX}hasColor> "yellow" }}'
    )
    assert status == 200 and json.loads(body)["boolean"] is True


def test_service_description(state):
    status, ct, body = handle_request("GET", "/query", state)
    assert status == 200 and ct == "application/n-triples"
    assert b"sparql-service-description" in body


def test_update_create_graph(state):
    status, _, _ = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        b"CREATE GRAPH <http://example.org/newgraph>",
    )
    assert status == 204
    assert state.contains("http://example.org/newgraph")


def test_update_insert_data_new_graph(state):
    update = (
        "PREFIX ex: <http://example.org/> INSERT DATA { "
        "GRAPH <http://example.org/newgraph> { ex:Apple ex:hasColor \"red\" } }"
    )
    status, _, _ = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"}, update.encode(),
    )
    assert status == 204
    assert (f"{EX}Apple", f"{EX}hasColor", '"red"') in state.graphs[f"{EX}newgraph"]
    # the inserted graph answers queries
    status, _, body = _post_query(state, f"SELECT ?c WHERE {{ <{EX}Apple> <{EX}hasColor> ?c }}")
    assert json.loads(body)["results"]["bindings"][0]["c"]["value"] == "red"


def test_update_insert_existing_graph_forbidden(state):
    update = (
        "INSERT DATA { GRAPH <file:///banana.hdt> { "
        f"<{EX}X> <{EX}p> \"v\" }} }}"
    )
    status, _, body = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"}, update.encode(),
    )
    assert status == 403 and b"already exists" in body


def test_update_delete_data_forbidden(state):
    update = (
        "PREFIX ex: <http://example.org/> DELETE DATA { "
        "GRAPH <file:///banana.hdt> { ex:Banana ex:hasColor \"yellow\" } }"
    )
    status, _, body = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"}, update.encode(),
    )
    assert status == 403
    assert b"DELETE DATA" in body or b"not allowed" in body


def test_update_delete_insert_forbidden(state):
    status, _, _ = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        b"DELETE { ?s ?p ?o } INSERT { ?s ?p ?o } WHERE { ?s ?p ?o }",
    )
    assert status == 403


def test_update_drop_graph(state):
    status, _, _ = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        b"DROP GRAPH <file:///banana.hdt>",
    )
    assert status == 204 and not state.contains("file:///banana.hdt")


def test_store_get_all(state):
    status, ct, body = handle_request("GET", "/store", state)
    assert status == 200 and ct == "application/n-triples"
    assert b"Banana" in body


def test_store_get_specific_graph(state):
    g = "file%3A%2F%2F%2Fbanana.hdt"
    status, _, body = handle_request("GET", f"/store?graph={g}", state)
    assert status == 200 and body.count(b"\n") == 2


def test_store_put_new_graph(state):
    nt = f'<{EX}Pear> <{EX}hasColor> "green" .\n'
    status, _, _ = handle_request(
        "PUT", f"/store?graph={EX}pears", state,
        {"Content-Type": "application/n-triples"}, nt.encode(),
    )
    assert status == 201
    status2, _, _ = handle_request(
        "PUT", f"/store?graph={EX}pears", state,
        {"Content-Type": "application/n-triples"}, nt.encode(),
    )
    assert status2 == 204  # replace


def test_store_delete_graph(state):
    status, _, _ = handle_request("DELETE", "/store?graph=file%3A%2F%2F%2Fbanana.hdt", state)
    assert status == 204
    status2, _, _ = handle_request("DELETE", "/store?graph=file%3A%2F%2F%2Fbanana.hdt", state)
    assert status2 == 404


def test_store_head(state):
    assert handle_request("HEAD", "/store?graph=file%3A%2F%2F%2Fbanana.hdt", state)[0] == 200
    assert handle_request("HEAD", "/store?graph=http%3A%2F%2Fnope", state)[0] == 404


def test_invalid_sparql_query(state):
    status, _, _ = _post_query(state, "SELECT WHERE INVALID {")
    assert status == 400


def test_unsupported_media_type(state):
    status, _, _ = handle_request(
        "POST", "/query", state, {"Content-Type": "application/pdf"}, b"x"
    )
    assert status == 415


def test_query_content_negotiation_csv(state):
    status, ct, body = _post_query(
        state, "SELECT ?s WHERE { ?s ?p ?o }", accept="text/csv"
    )
    assert status == 200 and ct == "text/csv" and body.startswith(b"s\r\n") or b"s\n" in body[:4]


def test_live_socket_roundtrip(tmp_path):
    """One end-to-end request over a real localhost socket."""
    import http.client
    import threading

    from de_ray.serve import make_server

    server = make_server(str(tmp_path), bind="127.0.0.1:0")
    server.de_ray_state.replace("file:///g.nt", [(f"{EX}s", f"{EX}p", '"v"')])
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        host, port = server.server_address
        conn = http.client.HTTPConnection(host, port, timeout=10)
        conn.request(
            "POST", "/query", body="SELECT ?o WHERE { ?s ?p ?o }",
            headers={"Content-Type": "application/sparql-query"},
        )
        resp = conn.getresponse()
        data = json.loads(resp.read())
        assert resp.status == 200
        assert data["results"]["bindings"][0]["o"]["value"] == "v"
    finally:
        server.shutdown()


def test_streamed_chunks_match_monolithic():
    """serialize_result_chunks must be byte-identical to serialize_result
    across all solution formats and produce >1 chunk for multi-batch
    results (the large-SELECT streaming path, VERDICT r3 item 5)."""
    import pyarrow as pa
    import ray.data as rd

    from de_ray.query.engine import DatasetSource, evaluate
    from de_ray.query.parser import parse_query
    from de_ray.query.serialize import serialize_result, serialize_result_chunks

    n = 5000
    t = pa.table(
        {
            "subj": pa.array([f"urn:s{i}" for i in range(n)], pa.large_string()),
            "pred": pa.array(["urn:p"] * n, pa.large_string()),
            "obj": pa.array([f'"v{i}"' for i in range(n)], pa.large_string()),
            "graph": pa.array(["g"] * n, pa.large_string()),
        }
    )
    src = DatasetSource(rd.from_arrow(t).repartition(4))
    sel = "SELECT ?s ?o WHERE { ?s <urn:p> ?o } ORDER BY ?s"  # deterministic
    res = evaluate(parse_query(sel), src)
    for fmt in ("csv", "tsv", "json", "xml"):
        res2 = evaluate(parse_query(sel), src)
        chunks = list(serialize_result_chunks(res2, fmt))
        assert len(chunks) > 1, fmt
        assert "".join(chunks) == serialize_result(res, fmt), fmt
    g = evaluate(
        parse_query("CONSTRUCT { ?s <urn:p> ?o } WHERE { ?s <urn:p> ?o }"), src
    )
    g2 = evaluate(
        parse_query("CONSTRUCT { ?s <urn:p> ?o } WHERE { ?s <urn:p> ?o }"), src
    )
    chunks = list(serialize_result_chunks(g2, "ntriple"))
    # CONSTRUCT emits in streaming (unordered) block order: compare as sets
    assert sorted("".join(chunks).splitlines()) == sorted(
        serialize_result(g, "ntriple").splitlines()
    )


def test_http_server_streams_chunked(tmp_path):
    """A /query over the real HTTP server must arrive with chunked
    transfer-encoding and decode to the same body the pure handler gives."""
    import http.client
    import threading

    from de_ray.serve import make_server

    server = make_server(str(tmp_path))
    server.de_ray_state.replace(
        "file:///banana.hdt",
        [(f"{EX}Banana", f"{EX}hasColor", '"yellow"')],
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request(
            "POST",
            "/query",
            body=b"SELECT ?s ?o WHERE { ?s <http://example.org/hasColor> ?o }",
            headers={
                "Content-Type": "application/sparql-query",
                "Accept": "text/csv",
            },
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Transfer-Encoding") == "chunked"
        assert resp.getheader("Content-Length") is None
        body = resp.read().decode()
        assert "http://example.org/Banana" in body and "yellow" in body
        conn.close()
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_update_load_file(tmp_path, state):
    """LOAD <file://...> INTO GRAPH executes (beyond the reference, which
    validates then 501s — src/serve.rs:1045-1059). The loaded graph must
    answer queries."""
    f = tmp_path / "fruit.ttl"
    f.write_text("@prefix ex: <http://example.org/> . ex:Kiwi ex:hasColor \"green\" .")
    status, _, body = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        f"LOAD <file://{f}> INTO GRAPH <file:///kiwi.hdt>".encode(),
    )
    assert status == 204, body
    status, _, body = _post_query(
        state, "SELECT ?o WHERE { <http://example.org/Kiwi> <http://example.org/hasColor> ?o }"
    )
    assert status == 200
    assert "green" in body.decode()


def test_update_load_existing_graph_forbidden(tmp_path, state):
    f = tmp_path / "x.nt"
    f.write_text('<http://e/a> <http://e/b> "c" .\n')
    status, _, body = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        f"LOAD <file://{f}> INTO GRAPH <file:///banana.hdt>".encode(),
    )
    assert status == 403
    assert b"already exists" in body


def test_update_load_network_still_501(state):
    status, _, body = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        b"LOAD <http://remote.example/data.ttl> INTO GRAPH <file:///r.hdt>",
    )
    assert status == 501


def test_update_load_default_graph_forbidden(tmp_path, state):
    f = tmp_path / "x.nt"
    f.write_text('<http://e/a> <http://e/b> "c" .\n')
    status, _, _ = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        f"LOAD <file://{f}>".encode(),
    )
    assert status == 403


def test_update_load_missing_file_400_and_silent_noop(state):
    status, _, body = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        b"LOAD <file:///nonexistent/x.nt> INTO GRAPH <file:///y.hdt>",
    )
    assert status == 400
    status, _, _ = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        b"LOAD SILENT <file:///nonexistent/x.nt> INTO GRAPH <file:///y.hdt>",
    )
    assert status == 204  # SILENT failure is a no-op
    # and the graph was NOT created
    status, _, body = handle_request("GET", "/store?graph=file%3A%2F%2F%2Fy.hdt", state)
    assert status == 404


def test_update_create_then_load_same_request(tmp_path, state):
    """CREATE GRAPH <g>; LOAD ... INTO <g> in ONE request must load the
    data (regression: the execution pass skipped any LOAD whose target
    existed by execution time, even when this same request created it)."""
    f = tmp_path / "kiwi.ttl"
    f.write_text("@prefix ex: <http://example.org/> . ex:Kiwi ex:hasColor \"green\" .")
    status, _, body = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        (f"CREATE GRAPH <file:///kiwi.hdt> ; "
         f"LOAD <file://{f}> INTO GRAPH <file:///kiwi.hdt>").encode(),
    )
    assert status == 204, body
    status, _, body = _post_query(
        state, "SELECT ?o WHERE { <http://example.org/Kiwi> <http://example.org/hasColor> ?o }"
    )
    assert "green" in body.decode()


def test_update_two_loads_same_new_graph_accumulate(tmp_path, state):
    a = tmp_path / "a.nt"; a.write_text('<http://e/a> <http://e/p> "1" .\n')
    b = tmp_path / "b.nt"; b.write_text('<http://e/b> <http://e/p> "2" .\n')
    status, _, body = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        (f"LOAD <file://{a}> INTO GRAPH <file:///ab.hdt> ; "
         f"LOAD <file://{b}> INTO GRAPH <file:///ab.hdt>").encode(),
    )
    assert status == 204, body
    status, _, body = _post_query(
        state, "SELECT ?s WHERE { ?s <http://e/p> ?o }", accept="text/csv"
    )
    text = body.decode()
    assert "http://e/a" in text and "http://e/b" in text


def test_update_load_silent_network_does_not_touch_local_fs(state):
    """LOAD SILENT <http://...> must be a no-op, NOT a local-path read of
    the URL's path component."""
    status, _, _ = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        b"LOAD SILENT <http://remote.example/etc/hostname> INTO GRAPH <file:///h.hdt>",
    )
    assert status == 204
    status, _, _ = handle_request("GET", "/store?graph=file%3A%2F%2F%2Fh.hdt", state)
    assert status == 404  # nothing was created


def test_update_load_rdfxml(tmp_path, state):
    """LOAD routes RDF/XML through the library's shared extension router."""
    f = tmp_path / "fruit.rdf"
    f.write_text(
        '<?xml version="1.0"?>'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://example.org/">'
        '<rdf:Description rdf:about="http://example.org/Plum">'
        '<ex:hasColor>purple</ex:hasColor></rdf:Description></rdf:RDF>'
    )
    status, _, body = handle_request(
        "POST", "/update", state,
        {"Content-Type": "application/sparql-update"},
        f"LOAD <file://{f}> INTO GRAPH <file:///plum.hdt>".encode(),
    )
    assert status == 204, body
    status, _, body = _post_query(
        state, "SELECT ?o WHERE { <http://example.org/Plum> <http://example.org/hasColor> ?o }"
    )
    assert "purple" in body.decode()


# --- LOAD policy (ADVICE r4: /update must not be a filesystem/network read
# primitive; file:// restricted to load_roots, http(s) behind an opt-in) ----


def test_load_outside_roots_403(tmp_path):
    """A server built from a directory only LOADs file:// sources inside
    it: a path outside the root is refused BEFORE any existence check."""
    from de_ray.serve import ServeState

    served = tmp_path / "served"
    served.mkdir()
    outside = tmp_path / "secret.ttl"
    outside.write_text(
        '@prefix ex: <http://example.org/> . ex:S ex:leak "secret" .'
    )
    st = ServeState.from_dir(str(served))
    status, _, body = handle_request(
        "POST", "/update", st,
        {"Content-Type": "application/sparql-update"},
        f"LOAD <file://{outside}> INTO GRAPH <file:///x.hdt>".encode(),
    )
    assert status == 403
    assert not st.contains("file:///x.hdt")
    # nonexistent outside path gives the SAME status (no fs probing)
    status2, _, _ = handle_request(
        "POST", "/update", st,
        {"Content-Type": "application/sparql-update"},
        f"LOAD <file://{tmp_path}/nope.ttl> INTO GRAPH <file:///y.hdt>".encode(),
    )
    assert status2 == 403


def test_load_inside_roots_allowed(tmp_path):
    from de_ray.serve import ServeState

    f = tmp_path / "fruit.ttl"
    f.write_text('@prefix ex: <http://example.org/> . ex:Fig ex:hasColor "brown" .')
    st = ServeState.from_dir(str(tmp_path))
    status, _, body = handle_request(
        "POST", "/update", st,
        {"Content-Type": "application/sparql-update"},
        f"LOAD <file://{f}> INTO GRAPH <file:///fig.hdt>".encode(),
    )
    assert status == 204, body
    assert st.contains("file:///fig.hdt")


def test_load_symlink_escape_403(tmp_path):
    """realpath check: a symlink inside the root pointing outside it is
    still refused."""
    import os

    from de_ray.serve import ServeState

    served = tmp_path / "served"
    served.mkdir()
    outside = tmp_path / "outside.ttl"
    outside.write_text('@prefix ex: <http://example.org/> . ex:S ex:p "v" .')
    link = served / "link.ttl"
    os.symlink(outside, link)
    st = ServeState.from_dir(str(served))
    status, _, _ = handle_request(
        "POST", "/update", st,
        {"Content-Type": "application/sparql-update"},
        f"LOAD <file://{link}> INTO GRAPH <file:///l.hdt>".encode(),
    )
    assert status == 403


def test_network_load_opt_in(tmp_path):
    """With allow_network_load=True, LOAD <http://...> fetches and parses
    the document (format from the URL extension); default stays 501
    (test_update_load_network_still_501)."""
    import functools
    import http.server
    import threading

    from de_ray.serve import ServeState

    doc_dir = tmp_path / "docs"
    doc_dir.mkdir()
    (doc_dir / "remote.ttl").write_text(
        '@prefix ex: <http://example.org/> . ex:Lime ex:hasColor "lime" .'
    )
    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        functools.partial(
            http.server.SimpleHTTPRequestHandler, directory=str(doc_dir)
        ),
    )
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address
        st = ServeState(allow_network_load=True)
        status, _, body = handle_request(
            "POST", "/update", st,
            {"Content-Type": "application/sparql-update"},
            f"LOAD <http://{host}:{port}/remote.ttl> INTO GRAPH <file:///lime.hdt>".encode(),
        )
        assert status == 204, body
        status, _, body = _post_query(
            st,
            "SELECT ?o WHERE { <http://example.org/Lime> <http://example.org/hasColor> ?o }",
        )
        assert "lime" in body.decode()
        # a missing remote document is a 400, not a silent success
        status, _, _ = handle_request(
            "POST", "/update", st,
            {"Content-Type": "application/sparql-update"},
            f"LOAD <http://{host}:{port}/gone.ttl> INTO GRAPH <file:///g.hdt>".encode(),
        )
        assert status == 400
    finally:
        httpd.shutdown()


def test_json_head_unicode_var_raw_utf8():
    """A non-ASCII variable name must serialize as raw UTF-8 in "head",
    matching the ensure_ascii=False binding values (ADVICE r4)."""
    import pyarrow as pa
    import ray.data as rd

    from de_ray.query.engine import DatasetSource, evaluate
    from de_ray.query.parser import parse_query
    from de_ray.query.serialize import serialize_result

    t = pa.table(
        {
            "subj": pa.array(["urn:s"], pa.large_string()),
            "pred": pa.array(["urn:p"], pa.large_string()),
            "obj": pa.array(['"näme"'], pa.large_string()),
            "graph": pa.array(["g"], pa.large_string()),
        }
    )
    src = DatasetSource(rd.from_arrow(t))
    res = evaluate(parse_query("SELECT ?wärt WHERE { ?s <urn:p> ?wärt }"), src)
    out = serialize_result(res, "json")
    assert '"vars":["wärt"]' in out and "\\u" not in out.split('"results"')[0]
    assert "näme" in out


def test_http10_client_gets_content_length_not_chunked(tmp_path):
    """An HTTP/1.0 client ignores Transfer-Encoding; the server must not
    send chunk framing (ADVICE r4). Buffering to Content-Length would
    hand any client an O(result) memory knob (review r5), so the response
    streams close-delimited: raw body bytes, Connection: close."""
    import socket
    import threading

    from de_ray.serve import make_server

    server = make_server(str(tmp_path), bind="127.0.0.1:0")
    server.de_ray_state.replace("file:///g.nt", [(f"{EX}s", f"{EX}p", '"v"')])
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        host, port = server.server_address
        q = b"SELECT ?o WHERE { ?s ?p ?o }"
        req = (
            b"POST /query HTTP/1.0\r\n"
            b"Host: x\r\nContent-Type: application/sparql-query\r\n"
            b"Content-Length: " + str(len(q)).encode() + b"\r\n\r\n" + q
        )
        with socket.create_connection((host, port), timeout=10) as s:
            s.sendall(req)
            raw = b""
            while True:
                part = s.recv(65536)
                if not part:
                    break
                raw += part
        headers, _, body = raw.partition(b"\r\n\r\n")
        h = headers.lower()
        assert b"transfer-encoding" not in h
        assert b"connection: close" in h
        # close-delimited: raw JSON from the first byte, no chunk framing
        assert body.startswith(b'{"head"') and b'"v"' in body
        assert body.rstrip().endswith(b"}")
    finally:
        server.shutdown()


def test_streamed_turtle_rdfxml_multichunk_roundtrip():
    """Turtle/RDF-XML now stream per batch (VERDICT r4 item 6): a
    multi-batch CONSTRUCT yields >1 chunk, mid-document @prefix /
    element-local xmlns declarations parse back to the same triple set,
    and a one-batch graph keeps the old monolithic bytes."""
    import pyarrow as pa
    import ray.data as rd

    from de_ray.query.engine import DatasetSource, evaluate
    from de_ray.query.parser import parse_query
    from de_ray.query.serialize import (
        GraphResult,
        serialize_result,
        serialize_result_chunks,
    )
    from de_ray.rdfio.rdfxml import parse_rdfxml
    from de_ray.rdfio.turtle import parse_turtle

    n = 3000
    # two namespaces, the second appearing only in later rows so that the
    # streamed form must declare it after the opening chunk
    t = pa.table(
        {
            "subj": pa.array([f"http://ex.org/s{i}" for i in range(n)], pa.large_string()),
            "pred": pa.array(
                [
                    ("http://ex.org/p" if i < n // 2 else f"http://late.org/q{i % 3}")
                    for i in range(n)
                ],
                pa.large_string(),
            ),
            "obj": pa.array([f'"v{i}"' for i in range(n)], pa.large_string()),
            "graph": pa.array(["g"] * n, pa.large_string()),
        }
    )
    src = DatasetSource(rd.from_arrow(t).repartition(6))
    q = "CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }"
    want = {
        (r["subj"], r["pred"], r["obj"])
        for r in t.select(["subj", "pred", "obj"]).to_pylist()
    }
    for fmt, parse in (("turtle", parse_turtle), ("rdfxml", parse_rdfxml)):
        res = evaluate(parse_query(q), src)
        # force small batches so the generator must emit several chunks
        res.ds = res.ds.repartition(6)
        import de_ray.query.serialize as ser

        chunks = []
        orig = res.ds.iter_batches

        def small_batches(batch_size=None, batch_format="pandas", _o=orig):
            return _o(batch_size=512, batch_format=batch_format)

        res.ds.iter_batches = small_batches
        chunks = list(serialize_result_chunks(res, fmt))
        assert len(chunks) > 2, fmt
        got = {tuple(tr)[:3] for tr in parse("".join(chunks))}
        assert got == want, fmt
    # one-batch graph: unchanged monolithic layout (golden shape)
    small = GraphResult(
        rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array(["http://ex.org/a"], pa.large_string()),
                    "pred": pa.array(["http://ex.org/p"], pa.large_string()),
                    "obj": pa.array(['"x"'], pa.large_string()),
                }
            )
        )
    )
    ttl = serialize_result(small, "turtle")
    assert ttl.startswith("@prefix ns0: <http://ex.org/> .\n\n")
    assert ttl.rstrip().endswith('ns0:a ns0:p "x" .')


def test_nonascii_query_error_clean_400(tmp_path):
    """A lazy serialization error whose message contains non-ASCII (e.g. a
    non-QName-able IRI with CJK chars) must reach the client as a clean
    400, not a dropped connection — BaseHTTPRequestHandler encodes the
    status line latin-1 strict (review r5)."""
    import http.client
    import threading

    from de_ray.serve import make_server

    server = make_server(str(tmp_path), bind="127.0.0.1:0")
    server.de_ray_state.replace(
        "file:///g.nt", [("http://ex.org/s", "http://ex.org/名前", '"v"')]
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        host, port = server.server_address
        conn = http.client.HTTPConnection(host, port, timeout=10)
        conn.request(
            "POST", "/query",
            body="CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }",
            headers={
                "Content-Type": "application/sparql-query",
                "Accept": "application/rdf+xml",
            },
        )
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 400
        assert b"cannot make QName" in body
    finally:
        server.shutdown()


def test_network_load_refuses_redirects(tmp_path):
    """Opt-in network LOAD must not follow redirects — a redirect could
    bounce the server into internal-only hosts (SSRF, review r5)."""
    import http.server
    import threading

    from de_ray.serve import ServeState

    class Redirector(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(302)
            self.send_header("Location", "http://127.0.0.1:1/internal.ttl")
            self.end_headers()

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Redirector)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address
        st = ServeState(allow_network_load=True)
        status, _, body = handle_request(
            "POST", "/update", st,
            {"Content-Type": "application/sparql-update"},
            f"LOAD <http://{host}:{port}/doc.ttl> INTO GRAPH <file:///r.hdt>".encode(),
        )
        assert status == 400
        assert b"redirect" in body.lower()
        assert not st.contains("file:///r.hdt")
    finally:
        httpd.shutdown()
