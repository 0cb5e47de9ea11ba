"""RDF sources/sinks as Ray Data pipelines.

Mirrors the reference's ingestion surface (S1/S2/M2/M8/K2):

- file-type routing by extension (reference ``src/create.rs:71-89``,
  ``src/query.rs:211-254``): ``.nt``/``.nq`` take the line-parallel fast
  path; ``.ttl``/``.n3``/``.trig`` parse per-file; unknown extensions error.
- graph name derived from file name: ``file:///<name>``
  (reference ``src/sparql.rs:39-48``).
- quad→triple projection drops graph terms (reference ``src/rdf2nt.rs:89-96``).

The output Dataset schema is ``(subj, pred, obj, graph)`` — all
large_string canonical forms.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import pyarrow as pa
import ray.data as rd

from de_ray.rdfio.ntriples import format_nt_line, parse_nt_line
from de_ray.rdfio.turtle import parse_turtle

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.large_string()),
        ("pred", pa.large_string()),
        ("obj", pa.large_string()),
        ("graph", pa.large_string()),
    ]
)

_LINE_FORMATS = {".nt", ".ntriples", ".nq", ".nquads"}
_TTL_FORMATS = {".ttl", ".turtle", ".n3", ".trig"}
_XML_FORMATS = {".rdf", ".owl", ".xml"}  # .owl → RDF/XML, reference src/rdf2nt.rs:51-65


def graph_name_for_file(path: str) -> str:
    """filename → graph IRI, matching reference ``src/sparql.rs:39-48``."""
    return f"file:///{os.path.basename(path)}"


def _triples_table(rows: List[tuple], graph: str) -> pa.Table:
    return pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.large_string()),
            "pred": pa.array([r[1] for r in rows], pa.large_string()),
            "obj": pa.array([r[2] for r in rows], pa.large_string()),
            "graph": pa.array([graph] * len(rows), pa.large_string()),
        }
    )


class _ParseNtLines:
    """Vectorized-ish NT line parse inside map_batches (line-delimited → the
    only truly parallel-parsable RDF format, cf. reference src/rdf2nt.rs:66).

    ``graph=None`` derives each row's graph from the batch's ``path``
    column (read_text(include_paths=True)) — ONE read operator for any
    number of .nt files instead of a per-file union chain (a chained
    UnionOperator tree over thousands of inputs starves under per-operator
    memory budgets; see state/checkpoint.py::sharded_stage)."""

    def __init__(self, graph: "str | None"):
        self.graph = graph

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        if self.graph is not None:
            rows = []
            for line in lines:
                t = parse_nt_line(line)
                if t is not None:
                    rows.append(t)
            return _triples_table(rows, self.graph)
        paths = batch.column("path").to_pylist()
        gcache: dict = {}
        rows4 = []
        for line, p in zip(lines, paths):
            t = parse_nt_line(line)
            if t is not None:
                g = gcache.get(p)
                if g is None:
                    g = gcache.setdefault(p, graph_name_for_file(p))
                rows4.append((t[0], t[1], t[2], g))
        return pa.table(
            {
                "subj": pa.array([r[0] for r in rows4], pa.large_string()),
                "pred": pa.array([r[1] for r in rows4], pa.large_string()),
                "obj": pa.array([r[2] for r in rows4], pa.large_string()),
                "graph": pa.array([r[3] for r in rows4], pa.large_string()),
            }
        )


def _parse_file_row(row: dict) -> List[dict]:
    """Whole-file parse for non-line formats (runs as a flat_map task)."""
    path = row["path"]
    text = row["bytes"].decode("utf-8")
    ext = os.path.splitext(path)[1].lower()
    if ext in _TTL_FORMATS:
        triples = parse_turtle(text)
    elif ext in _XML_FORMATS:
        from de_ray.rdfio.rdfxml import parse_rdfxml

        triples = parse_rdfxml(text)
    elif ext in _LINE_FORMATS:
        from de_ray.rdfio.ntriples import parse_nt_text

        triples = parse_nt_text(text)
    else:
        raise ValueError(f"unhandled RDF format: {path}")
    g = graph_name_for_file(path)
    return [{"subj": s, "pred": p, "obj": o, "graph": g} for (s, p, o) in triples]


def _normalize_schema(graph: Optional[str]):
    """Cast a triples batch to TRIPLE_SCHEMA (all large_string), optionally
    overriding the graph column — keeps union branches schema-identical."""

    def fn(t: pa.Table) -> pa.Table:
        # metadata-level casts, not a Python-object round trip per batch
        cols = {
            name: t.column(name).cast(pa.large_string())
            for name in ("subj", "pred", "obj")
        }
        if graph is not None:
            cols["graph"] = pa.array([graph] * len(t), pa.large_string())
        else:
            cols["graph"] = t.column("graph").cast(pa.large_string())
        return pa.table(cols, schema=TRIPLE_SCHEMA)

    return fn


def classify_paths(paths: Sequence[str]) -> tuple[List[str], List[str]]:
    """Route inputs: line-parallel NT/NQ vs per-file formats. Unknown → error
    (fail-fast, reference src/create.rs:26-38)."""
    line_paths, file_paths = [], []
    for p in paths:
        ext = os.path.splitext(p)[1].lower()
        if not os.path.exists(p):
            raise FileNotFoundError(p)
        if ext in _LINE_FORMATS:
            line_paths.append(p)
        elif ext in _TTL_FORMATS or ext in _XML_FORMATS:
            file_paths.append(p)
        else:
            raise ValueError(f"unsupported RDF extension {ext!r}: {p}")
    return line_paths, file_paths


def read_rdf(paths: Sequence[str], graph: Optional[str] = None) -> rd.Dataset:
    """Read one or more RDF files into a triples Dataset (subj,pred,obj,graph).

    ``.nt``/``.nq`` files parse line-parallel via ``read_text`` + ``map_batches``;
    Turtle-family files parse per file via ``read_binary_files`` + ``flat_map``
    (a whole file is one parse unit, as in the reference's converter).
    """
    if isinstance(paths, str):
        paths = [paths]
    line_paths, file_paths = classify_paths(paths)
    parts: List[rd.Dataset] = []
    if line_paths:
        # ONE read operator for all NT/NQ files; per-row graph derives from
        # the path column unless the caller overrides it
        parts.append(
            rd.read_text(line_paths, include_paths=True).map_batches(
                _ParseNtLines(graph), batch_format="pyarrow", batch_size=64 * 1024
            )
        )
    if file_paths:
        ds = (
            rd.read_binary_files(file_paths, include_paths=True)
            .flat_map(_parse_file_row)
            .map_batches(_normalize_schema(graph), batch_format="pyarrow")
        )
        parts.append(ds)
    if not parts:
        raise ValueError("no input files")
    out = parts[0]
    for d in parts[1:]:
        out = out.union(d)  # multi-file union (D1, reference src/create.rs:101-114)
    return out


def write_nt(ds: rd.Dataset, out_path: str) -> int:
    """Serialize a triples Dataset to one canonical N-Triples file (K2).

    Streams batches to the driver — appropriate for CLI-parity output and
    golden tests; large graphs should use ``write_parquet`` on the HDT-style
    layout instead (see de_ray.hdt.store).
    """
    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for batch in ds.iter_batches(batch_size=64 * 1024, batch_format="pyarrow"):
            subj = batch.column("subj").to_pylist()
            pred = batch.column("pred").to_pylist()
            obj = batch.column("obj").to_pylist()
            for s, p, o in zip(subj, pred, obj):
                f.write(format_nt_line(s, p, o))
                f.write("\n")
            n += len(subj)
    return n
