"""Minimal Turtle/N3 parser → canonical triples.

Covers the Turtle subset the reference's fixtures and tests exercise
(reference ``tests/resources/apple.ttl``, ``banana.ttl``, ``pineapple.ttl``,
``superhero.ttl``; conversion path ``src/rdf2nt.rs:33-106``):

- ``@prefix`` / ``@base`` directives (and SPARQL-style ``PREFIX``/``BASE``)
- prefixed names, bare IRIs, the ``a`` keyword
- predicate lists (``;``), object lists (``,``)
- literals: quoted (with ``@lang`` / ``^^datatype``), long quotes (``\"\"\"``),
  booleans ``true``/``false`` → xsd:boolean, integers → xsd:integer,
  decimals → xsd:decimal, doubles → xsd:double
- blank node labels ``_:x`` and anonymous ``[]`` / property lists ``[ p o ]``

Typed literals are canonicalized exactly as oxrdf serializes them to NT
(e.g. ``true`` → ``"true"^^<http://www.w3.org/2001/XMLSchema#boolean>``,
see reference fixture banana.nt:7), so TTL→NT round-trips match the
reference byte-for-byte on its own fixtures.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from de_ray.model import (
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    RDF,
    escape_literal,
    unescape_literal,
)

Triple = Tuple[str, str, str]

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<iri><[^>]*>)
  | (?P<long_string>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
  | (?P<string>"(?:[^"\\\n]|\\.)*")
  | (?P<langtag>@[a-zA-Z][a-zA-Z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<number>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\d+\.\d+|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
  | (?P<punct>[;,.\[\](){}])
  | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.\-%]*)
  | (?P<bnode>_:[\w.-]+)
  | (?P<keyword>@?[A-Za-z][\w-]*)
  | (?P<ws>\s+)
    """,
    re.VERBOSE,
)


class _Tokens:
    def __init__(self, text: str):
        self.toks: List[Tuple[str, str]] = []
        i = 0
        while i < len(text):
            m = _TOKEN_RE.match(text, i)
            if not m:
                raise ValueError(f"turtle tokenize error at {text[i:i+40]!r}")
            i = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            if kind == "local":  # a pname:local match
                # PN_LOCAL / BLANK_NODE_LABEL cannot END with '.': an
                # unspaced statement terminator ('ex:o.' / '_:b.') belongs
                # to the stream, and '_:' pnames are blank node labels
                # (the pname alternative shadows the bnode group)
                tok = m.group(0)
                trimmed = tok.rstrip(".")
                i -= len(tok) - len(trimmed)
                if trimmed.startswith("_:"):
                    self.toks.append(("bnode", trimmed))
                else:
                    self.toks.append(("pname", trimmed))
            elif kind == "langtag" and m.group(0).lower() in ("@prefix", "@base"):
                self.toks.append(("keyword", m.group(0)))
            else:
                self.toks.append((kind, m.group(0)))
        self.pos = 0

    def peek(self, ahead: int = 0) -> Optional[Tuple[str, str]]:
        j = self.pos + ahead
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of turtle input")
        self.pos += 1
        return t

    def expect_punct(self, ch: str) -> None:
        kind, val = self.next()
        if kind != "punct" or val != ch:
            raise ValueError(f"expected {ch!r}, got {val!r}")


class TurtleParser:
    def __init__(self) -> None:
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self._bnode_n = 0
        self.triples: List[Triple] = []

    def _fresh_bnode(self) -> str:
        self._bnode_n += 1
        return f"_:genid{self._bnode_n}"

    def parse(self, text: str) -> List[Triple]:
        tk = _Tokens(text)
        while tk.peek() is not None:
            kind, val = tk.peek()
            # TriG graph blocks: [GRAPH] <name>? { ... } — the graph label is
            # dropped, matching the reference's quad→triple projection
            # (src/rdf2nt.rs:89-96 "HDT does not support named graphs").
            if kind == "keyword" and val.upper() == "GRAPH":
                tk.next()
                continue
            if kind in ("iri", "pname", "bnode") and tk.peek(1) == ("punct", "{"):
                tk.next()  # graph name, dropped
                continue
            if (kind, val) == ("punct", "{"):
                tk.next()
                while tk.peek() is not None and tk.peek() != ("punct", "}"):
                    self._parse_statement(tk)
                if tk.peek() is not None:
                    tk.next()  # consume '}'
                continue
            if kind == "keyword" and val.lower() in ("@prefix", "prefix"):
                tk.next()
                k2, pname = tk.next()
                if k2 != "pname":
                    raise ValueError(f"bad @prefix: {pname!r}")
                pfx = pname[: pname.index(":")]
                k3, iri = tk.next()
                if k3 != "iri":
                    raise ValueError(f"bad @prefix IRI: {iri!r}")
                self.prefixes[pfx] = self._resolve_iri(iri[1:-1])
                if val == "@prefix":
                    tk.expect_punct(".")
            elif kind == "keyword" and val.lower() in ("@base", "base"):
                tk.next()
                k3, iri = tk.next()
                self.base = self._resolve_iri(iri[1:-1])
                if val == "@base":
                    tk.expect_punct(".")
            else:
                self._parse_statement(tk)
        return self.triples

    def _resolve_iri(self, iri: str) -> str:
        if self.base and "://" not in iri and not iri.startswith(("urn:", "mailto:")):
            return self.base + iri
        return iri

    def _parse_statement(self, tk: _Tokens) -> None:
        subj = self._parse_subject(tk)
        self._parse_predicate_object_list(tk, subj)
        tk.expect_punct(".")

    def _parse_subject(self, tk: _Tokens) -> str:
        kind, val = tk.next()
        if kind == "iri":
            return self._resolve_iri(val[1:-1])
        if kind == "pname":
            return self._expand_pname(val)
        if kind == "bnode":
            return val
        if kind == "punct" and val == "[":
            b = self._fresh_bnode()
            nxt = tk.peek()
            if nxt and nxt == ("punct", "]"):
                tk.next()
            else:
                self._parse_predicate_object_list(tk, b)
                tk.expect_punct("]")
            return b
        raise ValueError(f"bad subject token {val!r}")

    def _expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise ValueError(f"undefined prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def _parse_predicate_object_list(self, tk: _Tokens, subj: str) -> None:
        while True:
            pred = self._parse_predicate(tk)
            while True:
                obj = self._parse_object(tk)
                self.triples.append((subj, pred, obj))
                nxt = tk.peek()
                if nxt == ("punct", ","):
                    tk.next()
                    continue
                break
            nxt = tk.peek()
            if nxt == ("punct", ";"):
                tk.next()
                # allow trailing ';' before '.' or ']'
                nxt2 = tk.peek()
                if nxt2 and nxt2[0] == "punct" and nxt2[1] in (".", "]"):
                    return
                continue
            return

    def _parse_predicate(self, tk: _Tokens) -> str:
        kind, val = tk.next()
        if kind == "keyword" and val == "a":
            return RDF + "type"
        if kind == "iri":
            return self._resolve_iri(val[1:-1])
        if kind == "pname":
            return self._expand_pname(val)
        raise ValueError(f"bad predicate token {val!r}")

    def _parse_object(self, tk: _Tokens) -> str:
        kind, val = tk.next()
        if kind == "iri":
            return self._resolve_iri(val[1:-1])
        if kind == "pname":
            return self._expand_pname(val)
        if kind == "bnode":
            return val
        if kind in ("string", "long_string"):
            if kind == "long_string":
                lex = unescape_literal(val[3:-3])
            else:
                lex = unescape_literal(val[1:-1])
            nxt = tk.peek()
            if nxt and nxt[0] == "langtag":
                tk.next()
                return f'"{escape_literal(lex)}"{nxt[1]}'
            if nxt and nxt[0] == "dtype":
                tk.next()
                k2, dval = tk.next()
                dt = self._resolve_iri(dval[1:-1]) if k2 == "iri" else self._expand_pname(dval)
                if dt == XSD_STRING:
                    return f'"{escape_literal(lex)}"'
                return f'"{escape_literal(lex)}"^^<{dt}>'
            return f'"{escape_literal(lex)}"'
        if kind == "keyword" and val in ("true", "false"):
            return f'"{val}"^^<{XSD_BOOLEAN}>'
        if kind == "number":
            if re.fullmatch(r"[+-]?\d+", val):
                return f'"{val}"^^<{XSD_INTEGER}>'
            if "e" in val.lower():
                return f'"{val}"^^<{XSD_DOUBLE}>'
            return f'"{val}"^^<{XSD_DECIMAL}>'
        if kind == "punct" and val == "[":
            b = self._fresh_bnode()
            nxt = tk.peek()
            if nxt and nxt == ("punct", "]"):
                tk.next()
            else:
                self._parse_predicate_object_list(tk, b)
                tk.expect_punct("]")
            return b
        raise ValueError(f"bad object token {val!r}")


def parse_turtle(text: str) -> List[Triple]:
    """Parse Turtle text → list of canonical (subj, pred, obj) triples."""
    return TurtleParser().parse(text)
