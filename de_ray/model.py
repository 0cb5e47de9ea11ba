"""RDF term model: canonical BGP strings, N-Triples lexical forms.

The reference engine's internal term representation is a plain interned
string (``type InternalTerm = Arc<str>``, reference ``src/sparql.rs:415-417``)
with the following canonical conventions (``src/sparql.rs:372-413``):

- IRI / NamedNode ........ stored bare, WITHOUT ``<>`` brackets
- Blank node ............. ``_:`` prefix, e.g. ``_:b0``
- Literal ................ N-Triples lexical form WITH quotes, optional
                           ``@lang`` tag or ``^^<datatype>`` suffix,
                           e.g. ``"true"^^<http://www.w3.org/2001/XMLSchema#boolean>``

Terms are parsed back into typed values by sniffing the first character:
``"`` → literal, ``_`` → blank node, anything else → IRI
(``hdt_bgp_str_to_term``, reference ``src/sparql.rs:372-404``).

We keep exactly the same convention so that triple sets can be compared
against the reference by string equality. All functions here are pure and
deterministic (no locale / time dependence) — they run inside
``map_batches`` workers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"

XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"

_NUMERIC_DATATYPES = {
    XSD_INTEGER,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD + "float",
    XSD + "long",
    XSD + "int",
    XSD + "short",
    XSD + "byte",
    XSD + "nonNegativeInteger",
    XSD + "positiveInteger",
    XSD + "unsignedInt",
    XSD + "unsignedLong",
}


@dataclass(frozen=True)
class Iri:
    value: str  # bare IRI, no brackets


@dataclass(frozen=True)
class BlankNode:
    label: str  # without the "_:" prefix


@dataclass(frozen=True)
class Literal:
    lexical: str
    lang: Optional[str] = None
    datatype: Optional[str] = None  # bare IRI; None == xsd:string


Term = Union[Iri, BlankNode, Literal]

# ---------------------------------------------------------------------------
# N-Triples string escaping (per the N-Triples spec ECHAR production)
# ---------------------------------------------------------------------------

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}

_UNESCAPES = {
    "\\": "\\",
    '"': '"',
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "b": "\b",
    "f": "\f",
    "'": "'",
}


def escape_literal(s: str) -> str:
    """Escape a literal's lexical value for N-Triples emission."""
    if not any(c in s for c in _ESCAPES):
        return s
    return "".join(_ESCAPES.get(c, c) for c in s)


def unescape_literal(s: str) -> str:
    r"""Undo N-Triples escaping (\\ \" \n \r \t \b \f \uXXXX \UXXXXXXXX)."""
    if "\\" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError(f"dangling escape in literal: {s!r}")
        e = s[i + 1]
        if e == "u":
            out.append(chr(int(s[i + 2 : i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(s[i + 2 : i + 10], 16)))
            i += 10
        elif e in _UNESCAPES:
            out.append(_UNESCAPES[e])
            i += 2
        else:
            raise ValueError(f"bad escape \\{e} in literal: {s!r}")
    return "".join(out)


# ---------------------------------------------------------------------------
# Canonical (internal) string form  <->  typed Term
# ---------------------------------------------------------------------------


def term_to_canonical(t: Term) -> str:
    """Typed term → canonical internal string (reference ``term_to_hdt_bgp_str``,
    src/sparql.rs:407-413: NamedNode → bare string; others → N-Triples form)."""
    if isinstance(t, Iri):
        return t.value
    if isinstance(t, BlankNode):
        return "_:" + t.label
    # Literal
    s = '"' + escape_literal(t.lexical) + '"'
    if t.lang:
        return s + "@" + t.lang
    if t.datatype and t.datatype != XSD_STRING:
        return s + "^^<" + t.datatype + ">"
    return s


def canonical_to_term(s: str) -> Term:
    """Canonical internal string → typed term by first-char sniff
    (reference ``hdt_bgp_str_to_term``, src/sparql.rs:372-404)."""
    if not s:
        raise ValueError("empty term string")
    c = s[0]
    if c == '"':
        return _parse_literal_tail(s)
    if c == "_":
        if not s.startswith("_:"):
            raise ValueError(f"bad blank node: {s!r}")
        return BlankNode(s[2:])
    return Iri(s)


def _parse_literal_tail(s: str) -> Literal:
    # find the closing quote, honouring backslash escapes
    i = 1
    n = len(s)
    while i < n:
        if s[i] == "\\":
            i += 2
            continue
        if s[i] == '"':
            break
        i += 1
    if i >= n:
        raise ValueError(f"unterminated literal: {s!r}")
    lex = unescape_literal(s[1:i])
    rest = s[i + 1 :]
    if not rest:
        return Literal(lex)
    if rest.startswith("@"):
        return Literal(lex, lang=rest[1:])
    if rest.startswith("^^<") and rest.endswith(">"):
        return Literal(lex, datatype=rest[3:-1])
    raise ValueError(f"bad literal suffix {rest!r} in {s!r}")


def term_to_nt(t: Term) -> str:
    """Typed term → N-Triples token (IRIs get ``<>`` brackets)."""
    if isinstance(t, Iri):
        return "<" + t.value + ">"
    return term_to_canonical(t)


def canonical_to_nt(s: str) -> str:
    """Canonical internal string → N-Triples token (cheap, no full parse)."""
    if s.startswith('"') or s.startswith("_:"):
        return s
    return "<" + s + ">"


def nt_token_to_canonical(tok: str) -> str:
    """N-Triples token → canonical internal string."""
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    return tok


# ---------------------------------------------------------------------------
# Typed-value helpers (used by FILTER evaluation and ORDER BY)
# ---------------------------------------------------------------------------


def literal_python_value(t: Literal):
    """Best-effort typed Python value for comparisons (numeric / bool / str)."""
    if t.datatype in _NUMERIC_DATATYPES:
        try:
            if t.datatype == XSD_INTEGER or (t.datatype or "").endswith(
                ("long", "int", "short", "byte", "Integer", "edInt", "edLong")
            ):
                return int(t.lexical)
            return float(t.lexical)
        except ValueError:
            return t.lexical
    if t.datatype == XSD_BOOLEAN:
        return t.lexical == "true"
    return t.lexical


def effective_string(s: str) -> str:
    """SPARQL STR(): literal → lexical form, IRI → IRI string."""
    t = canonical_to_term(s)
    if isinstance(t, Literal):
        return t.lexical
    if isinstance(t, Iri):
        return t.value
    return "_:" + t.label


def typed_sort_key(s: str) -> Tuple[int, object]:
    """Deterministic total order over canonical strings for ORDER BY:
    blank nodes < IRIs < numeric literals (by value) < other literals (by lexical).
    Matches SPARQL's ordering tiers closely enough for the reference's tests
    (which only ORDER BY IRIs and plain literals)."""
    t = canonical_to_term(s)
    if isinstance(t, BlankNode):
        return (0, t.label)
    if isinstance(t, Iri):
        return (1, t.value)
    v = literal_python_value(t)
    if isinstance(v, bool):
        return (3, str(v).lower())
    if isinstance(v, (int, float)):
        return (2, float(v))
    return (3, str(v))
