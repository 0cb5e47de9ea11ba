"""Reader for the reference's binary ``.hdt`` ControlInfo + Header sections.

Layout verified against ``tests/resources/apple.hdt`` (reference reads it
with ``ControlInfo::read`` + ``Header::read``, src/view.rs:38-51):

    ControlInfo := b"$HDT" type:u8 format:cstr properties:cstr crc16:u16
    Global CI (type 1, format <http://purl.org/HDT/hdt#HDTv1>)
    Header CI (type 2, format "ntriples", properties "length=N;")
    → N bytes of N-Triples metadata (VoID + HDT stats)

This gives `view` parity on files produced by the reference tool itself —
the stats keys are mapped to the same names our store header uses.
"""

from __future__ import annotations

from typing import Dict, Tuple

from de_ray.rdfio.ntriples import parse_nt_text

COOKIE = b"$HDT"

TYPE_GLOBAL = 1
TYPE_HEADER = 2


def _read_cstr(buf: bytes, pos: int) -> Tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8", errors="replace"), end + 1


def read_control_info(buf: bytes, pos: int) -> Tuple[int, str, Dict[str, str], int]:
    if buf[pos : pos + 4] != COOKIE:
        raise ValueError(f"not an HDT ControlInfo at offset {pos}")
    ctype = buf[pos + 4]
    fmt, pos2 = _read_cstr(buf, pos + 5)
    props_raw, pos3 = _read_cstr(buf, pos2)
    props = {}
    for part in props_raw.split(";"):
        if "=" in part:
            k, v = part.split("=", 1)
            props[k] = v
    return ctype, fmt, props, pos3 + 2  # skip crc16


_STAT_KEYS = {
    "http://rdfs.org/ns/void#triples": "void:triples",
    "http://rdfs.org/ns/void#properties": "void:properties",
    "http://rdfs.org/ns/void#distinctSubjects": "void:distinctSubjects",
    "http://rdfs.org/ns/void#distinctObjects": "void:distinctObjects",
    "http://purl.org/HDT/hdt#dictionarynumSharedSubjectObject": "numSharedSubjectObject",
    "http://purl.org/HDT/hdt#dictionarysizeStrings": "dictionarysizeStrings",
    "http://purl.org/HDT/hdt#dictionaryblockSize": "dictionaryblockSize",
    "http://purl.org/HDT/hdt#originalSize": "originalSize",
    "http://purl.org/HDT/hdt#hdtSize": "hdtSize",
}


def read_hdt_header(path: str) -> dict:
    """Binary ``.hdt`` file → header dict with the same stat names our
    store's header.json uses (plus the raw header triple count)."""
    with open(path, "rb") as f:
        buf = f.read()
    ctype, fmt, _props, pos = read_control_info(buf, 0)
    if ctype != TYPE_GLOBAL:
        raise ValueError(f"expected global ControlInfo, got type {ctype}")
    out: dict = {"format": fmt.strip("<>")}
    ctype, hfmt, hprops, pos = read_control_info(buf, pos)
    if ctype != TYPE_HEADER:
        raise ValueError(f"expected header ControlInfo, got type {ctype}")
    length = int(hprops.get("length", "0"))
    header_nt = buf[pos : pos + length].decode("utf-8", errors="replace")
    triples = parse_nt_text(header_nt)
    for s, p, o in triples:
        key = _STAT_KEYS.get(p)
        if key is not None and o.startswith('"'):
            lex = o[1 : o.index('"', 1)]
            try:
                out[key] = int(lex)
            except ValueError:
                out[key] = lex
        if p == "http://purl.org/HDT/hdt#triplesOrder":
            out["triplesOrder"] = o.strip('"')
    out["header_triples"] = len(triples)
    return out


def is_hdt_file(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(4) == COOKIE
    except (OSError, IsADirectoryError):
        return False
