"""CLI parity with the reference's subcommands (``src/main.rs:19-62``):

- ``create -o OUTDIR -d FILES...``  : RDF files → HDT-style store directory
- ``query  -d DATA... -s QUERY... -o FMT`` : SPARQL over stores and/or raw RDF
- ``view   TARGET``                  : header/metadata display

A data path that is a completed store directory (has ``_SUCCESS``) loads as
a Store; raw RDF files are queried directly through a DatasetSource —
semantically identical to the reference's implicit convert-then-query
(``src/query.rs:264-297``; our conformance tests assert raw ≡ store).

This module OWNS its Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False


def do_create(output: str, data: list[str]) -> None:
    _ensure_ray()
    from de_ray.hdt.store import Store, write_store
    from de_ray.rdfio import read_rdf

    if output.endswith(".hdt"):
        # single-file binary export, like the reference's create
        # (src/create.rs:43-50): build the store in a scratch dir, pack
        import tempfile

        from de_ray.hdt.hdtfile import write_hdt_file

        import shutil

        tmp = tempfile.mkdtemp(prefix="de_ray_hdt_")
        try:
            write_store(read_rdf(data), os.path.join(tmp, "store"))
            info = write_hdt_file(Store(os.path.join(tmp, "store")), output)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)  # scratch store can be GBs
        print(f"created {output}: {info['n_triples']} triples", file=sys.stderr)
        return
    header = write_store(read_rdf(data), output)
    print(f"created {output}: {header['void:triples']} triples", file=sys.stderr)


def do_query(data: list[str], queries: list[str], fmt: str, out=None) -> None:
    for qf in queries:  # fail fast before any work (reference src/query.rs:63-73)
        if not os.path.exists(qf):
            raise FileNotFoundError(qf)
    _ensure_ray()
    from de_ray.query.engine import DatasetSource, MultiSource, StoreSource, evaluate
    from de_ray.query.parser import parse_query
    from de_ray.query.serialize import serialize_result_chunks
    from de_ray.rdfio import read_rdf

    out = out or sys.stdout
    sources = []
    raw_files = []
    for d in data:
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "_SUCCESS")):
            from de_ray.hdt.store import Store

            sources.append(StoreSource(Store(d)))
        elif os.path.isfile(d) and d.endswith(".hdt"):
            # binary .hdt interchange: full decode → in-memory triple source
            import pandas as pd
            import ray.data as rd

            from de_ray.hdt.hdtfile import read_hdt_file

            _hdr, triples = read_hdt_file(d)
            df = pd.DataFrame(triples, columns=["subj", "pred", "obj"])
            sources.append(DatasetSource(rd.from_pandas(df)))
        else:
            raw_files.append(d)
    if raw_files:
        sources.append(DatasetSource(read_rdf(raw_files)))
    if not sources:
        raise ValueError("no data files")
    source = sources[0] if len(sources) == 1 else MultiSource(sources)
    from de_ray.query.engine import GraphResult

    for qf in queries:
        with open(qf, encoding="utf-8") as f:
            q = parse_query(f.read())
        res = evaluate(q, source)
        eff_fmt = fmt
        if isinstance(res, GraphResult) and fmt in ("csv", "tsv", "json", "xml"):
            # CONSTRUCT/DESCRIBE emit graphs: the solution-format default
            # would error — fall back to N-Triples like the reference
            eff_fmt = "ntriple"
        for chunk in serialize_result_chunks(res, eff_fmt):
            out.write(chunk)  # stream: never hold the full result string


def do_view(target: str, out=None) -> None:
    from de_ray.hdt.store import view

    out = out or sys.stdout
    json.dump(view(target), out, indent=1, sort_keys=True)
    out.write("\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="de_ray", description="Ray-Data-native de engine")
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("create", help="build an HDT-style store from RDF files")
    c.add_argument("-o", "--output", required=True)
    c.add_argument("-d", "--data", nargs="+", required=True)
    q = sub.add_parser("query", help="run SPARQL queries")
    q.add_argument("-d", "--data", nargs="+", required=True)
    q.add_argument("-s", "--source", nargs="+", required=True, help="query files")
    q.add_argument(
        "-o",
        "--output",
        default="csv",
        choices=["csv", "tsv", "json", "xml", "ntriple", "turtle", "trig", "nquads", "n3", "rdfxml"],
    )
    v = sub.add_parser("view", help="show store header/metadata")
    v.add_argument("target")
    m = sub.add_parser(
        "merge",
        help="catenate finished stores (HDTCat-style; extension — the "
        "reference re-parses everything instead)",
    )
    m.add_argument("-o", "--output", required=True)
    m.add_argument("-d", "--data", nargs="+", required=True, help="input store dirs")
    s = sub.add_parser("serve", help="SPARQL protocol + graph store HTTP endpoint")
    s.add_argument("-l", "--load", required=True, help="directory of stores/.hdt files")
    s.add_argument("--bind", default="127.0.0.1:7878")
    args = ap.parse_args(argv)
    try:
        if args.cmd == "create":
            do_create(args.output, args.data)
        elif args.cmd == "query":
            do_query(args.data, args.source, args.output)
        elif args.cmd == "view":
            do_view(args.target)
        elif args.cmd == "merge":
            _ensure_ray()
            from de_ray.hdt.merge import merge_stores

            hdr = merge_stores(args.data, args.output)
            print(f"merged {len(args.data)} stores: {hdr['void:triples']} triples")
        elif args.cmd == "serve":
            _ensure_ray()
            from de_ray.serve import serve as _serve

            print(f"serving {args.load} on {args.bind}", file=sys.stderr)
            _serve(args.load, args.bind)
    except (FileNotFoundError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 14  # UNAVAILABLE, matching the reference's exit style (src/main.rs:88-93)
    return 0


if __name__ == "__main__":
    sys.exit(main())
