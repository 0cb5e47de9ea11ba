"""Reader AND writer for the binary ``.hdt`` single-file format.

Layout reverse-verified byte-by-byte against ``tests/resources/apple.hdt``
(the reference reads/writes it through the hdt crate; ``src/create.rs:43-50``
write, ``src/view.rs:38-51`` read):

    ControlInfo   := b"$HDT" type:u8 format:cstr properties:cstr crc16
                     (CRC16-ANSI, poly 0xA001 reflected, init 0, LE)
    Global CI (type 1, format <http://purl.org/HDT/hdt#HDTv1>)
    Header CI (type 2, format "ntriples", props "length=N;") + N bytes NT
    Dictionary CI (type 3, format ...#dictionaryFour,
                   props "mapping=1;sizeStrings=S;")
      4 × PFC section := type:u8=2 vbyte(nstrings) vbyte(packedbytes)
                         vbyte(blocksize) crc8
                         LogSeq(block byte offsets, incl. end)
                         packed-bytes crc32c
        PFC block: first string raw+NUL; rest vbyte(shared_prefix)+suffix+NUL
    Triples CI (type 4, format ...#triplesBitmap, props "order=1;")
      Bitmap(Y) Bitmap(Z) LogSeq(Y ids) LogSeq(Z ids)
        Bitmap := type:u8=1 vbyte(nbits) crc8 bytes(LSB-first) crc32c
        LogSeq := type:u8=1 numbits:u8 vbyte(nentries) crc8
                  packed bits (LSB-first) crc32c

    vbyte: 7-bit little-endian groups, MSB set on the LAST byte.
    crc8: poly 0x07, init 0, unreflected. crc32: CRC32-C (Castagnoli).

All three CRC variants were identified by matching apple.hdt's stored
values; the dictionary/bitmap layouts round-trip that fixture exactly.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from de_ray.rdfio.ntriples import parse_nt_text

COOKIE = b"$HDT"

TYPE_GLOBAL = 1
TYPE_HEADER = 2
TYPE_DICTIONARY = 3
TYPE_TRIPLES = 4

FMT_GLOBAL = "<http://purl.org/HDT/hdt#HDTv1>"
FMT_DICT = "<http://purl.org/HDT/hdt#dictionaryFour>"
FMT_TRIPLES = "<http://purl.org/HDT/hdt#triplesBitmap>"


# --- checksums (variants matched against apple.hdt) -------------------------


# table-driven CRCs (identical outputs to the per-bit definitions, ~10x
# faster: the export path checksums every packed byte on ONE driver core,
# so the per-bit inner loop was the wall for non-toy stores)
def _mk_crc8_table():
    t = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else (crc << 1)) & 0xFF
        t.append(crc)
    return bytes(t)


def _mk_crc_refl_table(poly: int, width_mask: int):
    t = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        t.append(crc & width_mask)
    return tuple(t)


_CRC8_T = _mk_crc8_table()
_CRC16_T = _mk_crc_refl_table(0xA001, 0xFFFF)
_CRC32C_T = _mk_crc_refl_table(0x82F63B78, 0xFFFFFFFF)


def crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_T
    for b in data:
        crc = t[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    t = _CRC16_T
    for b in data:
        crc = (crc >> 8) ^ t[(crc ^ b) & 0xFF]
    return crc & 0xFFFF


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    t = _CRC32C_T
    for b in data:
        crc = (crc >> 8) ^ t[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# single source of truth for the HDT vbyte encoding (MSB set on the LAST
# byte): the store's front-coded sections and the .hdt interchange file
# must stay bit-compatible, so both use dictionary.py's implementation
from de_ray.hdt.dictionary import _vbyte  # noqa: E402


def _read_vbyte(buf: bytes, i: int) -> Tuple[int, int]:
    n = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        shift += 7
        if b & 0x80:
            return n, i


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


# ---------------------------------------------------------------------------
# Bit-packed primitives (LogSequence2 / Bitmap375 equivalents)
# ---------------------------------------------------------------------------


def _pack_bits(values: List[int], numbits: int) -> bytes:
    """LSB-first bit packing (layout matched against apple.hdt)."""
    total = len(values) * numbits
    out = bytearray((total + 7) // 8)
    pos = 0
    for v in values:
        for k in range(numbits):
            if (v >> k) & 1:
                out[pos >> 3] |= 1 << (pos & 7)
            pos += 1
    return bytes(out)


def _unpack_bits(data: bytes, numbits: int, n: int) -> List[int]:
    out = []
    pos = 0
    for _ in range(n):
        v = 0
        for k in range(numbits):
            if data[pos >> 3] & (1 << (pos & 7)):
                v |= 1 << k
            pos += 1
        out.append(v)
    return out


def write_log_seq(values: List[int]) -> bytes:
    numbits = max(1, max(values).bit_length()) if values else 1
    pre = bytes([1, numbits]) + _vbyte(len(values))
    bits = _pack_bits(values, numbits)
    return pre + bytes([crc8(pre)]) + bits + crc32c(bits).to_bytes(4, "little")


def read_log_seq(buf: bytes, i: int) -> Tuple[List[int], int]:
    if buf[i] != 1:
        raise ValueError(f"expected LogSequence (type 1) at {i}, got {buf[i]}")
    numbits = buf[i + 1]
    n, j = _read_vbyte(buf, i + 2)
    j += 1  # crc8
    nbytes = (n * numbits + 7) // 8
    vals = _unpack_bits(buf[j : j + nbytes], numbits, n)
    return vals, j + nbytes + 4  # + crc32


def write_bitmap(bits: List[bool]) -> bytes:
    pre = bytes([1]) + _vbyte(len(bits))
    data = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            data[i >> 3] |= 1 << (i & 7)
    data = bytes(data)
    return pre + bytes([crc8(pre)]) + data + crc32c(data).to_bytes(4, "little")


def read_bitmap(buf: bytes, i: int) -> Tuple[List[bool], int]:
    if buf[i] != 1:
        raise ValueError(f"expected Bitmap (type 1) at {i}")
    n, j = _read_vbyte(buf, i + 1)
    j += 1  # crc8
    nbytes = (n + 7) // 8
    bits = [bool(buf[j + (k >> 3)] & (1 << (k & 7))) for k in range(n)]
    return bits, j + nbytes + 4


# ---------------------------------------------------------------------------
# Plain-front-coded dictionary section (libhdt block layout)
# ---------------------------------------------------------------------------


def write_pfc_section(terms: List[str], block_size: int = 16) -> bytes:
    """Sorted terms → one PFC dictionary section (libhdt layout: first
    string of each block raw + NUL, rest vbyte(shared prefix) + suffix +
    NUL; block byte-offsets as a LogSequence including the end offset)."""
    packed = bytearray()
    offsets = [0]
    prev = b""
    for i, t in enumerate(terms):
        tb = t.encode("utf-8")
        if i % block_size == 0:
            if i:
                offsets.append(len(packed))
            packed += tb + b"\x00"
        else:
            k = 0
            m = min(len(prev), len(tb))
            while k < m and prev[k] == tb[k]:
                k += 1
            packed += _vbyte(k) + tb[k:] + b"\x00"
        prev = tb
    offsets.append(len(packed))
    pre = bytes([2]) + _vbyte(len(terms)) + _vbyte(len(packed)) + _vbyte(block_size)
    return (
        pre
        + bytes([crc8(pre)])
        + write_log_seq(offsets)
        + bytes(packed)
        + crc32c(bytes(packed)).to_bytes(4, "little")
    )


def read_pfc_section(buf: bytes, i: int) -> Tuple[List[str], int]:
    if buf[i] != 2:
        raise ValueError(f"expected PFC section (type 2) at {i}")
    n, j = _read_vbyte(buf, i + 1)
    size, j = _read_vbyte(buf, j)
    block_size, j = _read_vbyte(buf, j)
    j += 1  # crc8
    _offsets, j = read_log_seq(buf, j)
    data = buf[j : j + size]
    terms: List[str] = []
    pos = 0
    prev = b""
    while len(terms) < n:
        if len(terms) % block_size == 0:
            end = data.index(b"\x00", pos)
            cur = data[pos:end]
            pos = end + 1
        else:
            k, pos = _read_vbyte(data, pos)
            end = data.index(b"\x00", pos)
            cur = prev[:k] + data[pos:end]
            pos = end + 1
        terms.append(cur.decode("utf-8"))
        prev = cur
    return terms, j + size + 4


# ---------------------------------------------------------------------------
# ControlInfo writer + whole-file writer/reader
# ---------------------------------------------------------------------------


def write_control_info(ctype: int, fmt: str, props: str) -> bytes:
    body = COOKIE + bytes([ctype]) + fmt.encode() + b"\x00" + props.encode() + b"\x00"
    return body + crc16(body).to_bytes(2, "little")


def _header_nt(base: str, stats: dict) -> str:
    """Replicate the reference's header triple set (apple.hdt layout)."""
    lines = [
        f"<{base}> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://purl.org/HDT/hdt#Dataset> .",
        f"<{base}> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://rdfs.org/ns/void#Dataset> .",
        f'<{base}> <http://rdfs.org/ns/void#triples> "{stats["void:triples"]}" .',
        f'<{base}> <http://rdfs.org/ns/void#properties> "{stats["void:properties"]}" .',
        f'<{base}> <http://rdfs.org/ns/void#distinctSubjects> "{stats["void:distinctSubjects"]}" .',
        f'<{base}> <http://rdfs.org/ns/void#distinctObjects> "{stats["void:distinctObjects"]}" .',
        f"<{base}> <http://purl.org/HDT/hdt#statisticalInformation> _:statistics .",
        f"<{base}> <http://purl.org/HDT/hdt#publicationInformation> _:publicationInformation .",
        f"<{base}> <http://purl.org/HDT/hdt#formatInformation> _:format .",
        "_:format <http://purl.org/HDT/hdt#dictionary> _:dictionary .",
        "_:format <http://purl.org/HDT/hdt#triples> _:triples .",
        "_:dictionary <http://purl.org/dc/terms/format> <http://purl.org/HDT/hdt#dictionaryFour> .",
        f'_:dictionary <http://purl.org/HDT/hdt#dictionarynumSharedSubjectObject> "{stats["numSharedSubjectObject"]}" .',
        '_:dictionary <http://purl.org/HDT/hdt#dictionarymapping> "1" .',
        f'_:dictionary <http://purl.org/HDT/hdt#dictionarysizeStrings> "{stats["dictionarysizeStrings"]}" .',
        f'_:dictionary <http://purl.org/HDT/hdt#dictionaryblockSize> "{stats.get("dictionaryblockSize", 16)}" .',
        "_:triples <http://purl.org/dc/terms/format> <http://purl.org/HDT/hdt#triplesBitmap> .",
        f'_:triples <http://purl.org/HDT/hdt#triplesnumTriples> "{stats["void:triples"]}" .',
        '_:triples <http://purl.org/HDT/hdt#triplesOrder> "SPO" .',
        f'_:statistics <http://purl.org/HDT/hdt#originalSize> "{stats.get("originalSize", 0)}" .',
        f'_:statistics <http://purl.org/HDT/hdt#hdtSize> "{stats.get("hdtSize", 0)}" .',
        '_:publicationInformation <http://purl.org/dc/terms/issued> "1970-01-01T00:00:00Z" .',
    ]
    return "\n".join(lines) + "\n"


def write_hdt_file(store, out_path: str, base_uri: str = "file:///graph") -> dict:
    """Store directory handle → single binary ``.hdt`` file (K1 single-file
    parity with reference ``src/create.rs:43-50``; quads are projected to
    triples — the format has no named graphs, M1).

    Single-file export is a driver-side artifact by design (the reference's
    own writer is single-process); the distributed layout is the store dir.
    """
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from de_ray.hdt.dictionary import (
        SECTION_NAMES,
        SECTION_OBJECT,
        SECTION_PREDICATE,
        SECTION_SHARED,
        SECTION_SUBJECT,
    )

    dict_t = pq.read_table(
        os.path.join(store.path, "dictionary"), columns=["term", "section", "sec_rank"]
    )
    sections: Dict[int, List[str]] = {}
    for sec in (SECTION_SHARED, SECTION_SUBJECT, SECTION_PREDICATE, SECTION_OBJECT):
        sub = dict_t.filter(pc.equal(dict_t.column("section"), sec))
        order = pc.sort_indices(sub.column("sec_rank"))
        sections[sec] = pc.take(sub.column("term"), order).to_pylist()

    trip_t = pq.read_table(
        os.path.join(store.path, "triples"), columns=["s_id", "p_id", "o_id"]
    )
    import numpy as np

    s = trip_t.column("s_id").to_numpy()
    p = trip_t.column("p_id").to_numpy()
    o = trip_t.column("o_id").to_numpy()
    order = np.lexsort((o, p, s))
    s, p, o = s[order], p[order], o[order]
    # graph union can repeat triples; single-file HDT stores the set
    if len(s):
        keep = np.ones(len(s), dtype=bool)
        keep[1:] = (s[1:] != s[:-1]) | (p[1:] != p[:-1]) | (o[1:] != o[:-1])
        s, p, o = s[keep], p[keep], o[keep]
    n = len(s)
    # Y: predicate per distinct (s,p); bitmap_y True at last p of s
    # Z: every object; bitmap_z True at last o of (s,p)
    if n:
        new_s = np.empty(n, dtype=bool)
        new_s[0] = True
        new_s[1:] = s[1:] != s[:-1]
        new_sp = np.empty(n, dtype=bool)
        new_sp[0] = True
        new_sp[1:] = new_s[1:] | (p[1:] != p[:-1])
        y = p[new_sp]
        s_of_sp = s[new_sp]
        y_last = np.empty(len(y), dtype=bool)
        y_last[:-1] = s_of_sp[1:] != s_of_sp[:-1]
        y_last[-1] = True
        z_last = np.empty(n, dtype=bool)
        z_last[:-1] = new_sp[1:]
        z_last[-1] = True
    else:
        y = np.array([], dtype=np.int64)
        y_last = np.array([], dtype=bool)
        z_last = np.array([], dtype=bool)

    h = dict(store.header)
    h["void:triples"] = n
    stats = h
    strings_size = stats.get("dictionarysizeStrings", 0)
    header_nt = _header_nt(base_uri, stats)

    out = bytearray()
    out += write_control_info(TYPE_GLOBAL, FMT_GLOBAL, "")
    out += write_control_info(TYPE_HEADER, "ntriples", f"length={len(header_nt.encode())};")
    out += header_nt.encode()
    out += write_control_info(
        TYPE_DICTIONARY, FMT_DICT, f"mapping=1;sizeStrings={strings_size};"
    )
    for sec in (SECTION_SHARED, SECTION_SUBJECT, SECTION_PREDICATE, SECTION_OBJECT):
        out += write_pfc_section(sections[sec])
    out += write_control_info(TYPE_TRIPLES, FMT_TRIPLES, "order=1;")
    out += write_bitmap(y_last.tolist())
    out += write_bitmap(z_last.tolist())
    out += write_log_seq([int(v) for v in y.tolist()])
    out += write_log_seq([int(v) for v in o.tolist()])
    with open(out_path, "wb") as f:
        f.write(bytes(out))
    return {"n_triples": n, "bytes": len(out)}


def read_hdt_file(path: str):
    """Full binary ``.hdt`` parse → (header dict, triples as canonical
    strings). Round-trips files written by :func:`write_hdt_file` AND the
    reference tool's own fixtures (apple.hdt)."""
    with open(path, "rb") as f:
        buf = f.read()
    ctype, fmt, _props, pos = read_control_info(buf, 0)
    if ctype != TYPE_GLOBAL:
        raise ValueError("expected global ControlInfo")
    ctype, hfmt, hprops, pos = read_control_info(buf, pos)
    if ctype != TYPE_HEADER:
        raise ValueError("expected header ControlInfo")
    pos += int(hprops.get("length", "0"))
    ctype, dfmt, dprops, pos = read_control_info(buf, pos)
    if ctype != TYPE_DICTIONARY:
        raise ValueError("expected dictionary ControlInfo")
    shared, pos = read_pfc_section(buf, pos)
    subjects, pos = read_pfc_section(buf, pos)
    predicates, pos = read_pfc_section(buf, pos)
    objects, pos = read_pfc_section(buf, pos)
    ctype, tfmt, tprops, pos = read_control_info(buf, pos)
    if ctype != TYPE_TRIPLES:
        raise ValueError("expected triples ControlInfo")
    y_last, pos = read_bitmap(buf, pos)
    z_last, pos = read_bitmap(buf, pos)
    y, pos = read_log_seq(buf, pos)
    z, pos = read_log_seq(buf, pos)

    subj_terms = shared + subjects  # subject id space: shared first
    obj_terms = shared + objects

    triples: List[Tuple[str, str, str]] = []
    # reconstruct (s,p) per Y entry via bitmap_y; objects per (s,p) via bitmap_z
    sp_pairs: List[Tuple[int, int]] = []
    s_idx = 0
    for i, p_id in enumerate(y):
        sp_pairs.append((s_idx, p_id))
        if y_last[i]:
            s_idx += 1
    pair_idx = 0
    for k, o_id in enumerate(z):
        s_i, p_id = sp_pairs[pair_idx]
        triples.append(
            (subj_terms[s_i], predicates[p_id - 1], obj_terms[o_id - 1])
        )
        if z_last[k]:
            pair_idx += 1
    header = read_hdt_header(path)
    return header, triples
