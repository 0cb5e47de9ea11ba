"""SPARQL parser for the subset the reference's CLI tests exercise.

The reference delegates full SPARQL 1.1 to spargebra/spareval
(``src/sparql.rs:511-521``); our engine rebuilds the query forms its tests
and fixtures use (SURVEY §2.12): SELECT [DISTINCT] / ASK / CONSTRUCT /
DESCRIBE, BGPs with ``;`` ``,`` shorthand, FILTER expressions, OPTIONAL,
UNION, ORDER BY [ASC|DESC], LIMIT/OFFSET, PREFIX/BASE.

Pattern terms are canonical internal strings (de_ray.model) or ``Var``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

from de_ray.model import (
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    RDF,
    escape_literal,
    unescape_literal,
)


@dataclass(frozen=True)
class Var:
    name: str


PatTerm = Union[Var, str]  # Var or canonical string


@dataclass(frozen=True)
class TriplePattern:
    s: PatTerm
    p: PatTerm
    o: PatTerm


# --- filter expression AST --------------------------------------------------


@dataclass(frozen=True)
class Cmp:
    op: str  # = != < > <= >=
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Logical:
    op: str  # && || !
    args: Tuple["Expr", ...]


@dataclass(frozen=True)
class Call:
    fn: str  # regex contains str lang datatype bound strstarts strends lcase ucase strlen
    args: Tuple["Expr", ...]


@dataclass(frozen=True)
class Const:
    value: str  # canonical string (literal or IRI)


Expr = Union[Var, Cmp, Logical, Call, Const]


@dataclass
class GroupPattern:
    """A group graph pattern: BGP + filters + optionals + unions + minus."""

    patterns: List[TriplePattern] = field(default_factory=list)
    filters: List[Expr] = field(default_factory=list)
    optionals: List["GroupPattern"] = field(default_factory=list)
    unions: List[Tuple["GroupPattern", "GroupPattern"]] = field(default_factory=list)
    minus: List["GroupPattern"] = field(default_factory=list)
    not_exists: List["GroupPattern"] = field(default_factory=list)
    exists: List["GroupPattern"] = field(default_factory=list)
    binds: List[Tuple["Expr", Var]] = field(default_factory=list)
    values: List[Tuple[List[Var], List[List[Optional[str]]]]] = field(default_factory=list)


@dataclass(frozen=True)
class Aggregate:
    """A projected aggregate: (FN(?var) AS ?alias); var None == COUNT(*)."""

    fn: str  # COUNT SUM AVG MIN MAX GROUP_CONCAT SAMPLE
    var: Optional[Var]
    alias: Var
    distinct: bool = False


@dataclass
class Query:
    form: str  # SELECT ASK CONSTRUCT DESCRIBE
    variables: List[Var] = field(default_factory=list)  # empty == *
    aggregates: List[Aggregate] = field(default_factory=list)
    group_by: List[Var] = field(default_factory=list)
    having: List[Expr] = field(default_factory=list)
    distinct: bool = False
    where: GroupPattern = field(default_factory=GroupPattern)
    order_by: List[Tuple[Var, bool]] = field(default_factory=list)  # (var, descending)
    limit: Optional[int] = None
    offset: Optional[int] = None
    template: List[TriplePattern] = field(default_factory=list)  # CONSTRUCT
    describe_terms: List[PatTerm] = field(default_factory=list)  # DESCRIBE


_TOK = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<iri><[^>\s]*>)
  | (?P<var>[?$][A-Za-z_][\w]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<langtag>@[a-zA-Z][a-zA-Z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<op><=|>=|!=|&&|\|\||[=<>!(){};,.*])
  | (?P<pname>[A-Za-z_][\w-]*)?:(?P<local>[\w.\-%]*)
  | (?P<word>[A-Za-z_][\w-]*)
  | (?P<ws>\s+)
    """,
    re.VERBOSE,
)


class _T:
    def __init__(self, text: str):
        self.toks: List[Tuple[str, str]] = []
        i = 0
        while i < len(text):
            m = _TOK.match(text, i)
            if not m:
                raise ValueError(f"sparql tokenize error at {text[i:i+40]!r}")
            i = m.end()
            k = m.lastgroup
            if k in ("ws", "comment"):
                continue
            if k == "local":
                self.toks.append(("pname", m.group(0)))
            else:
                self.toks.append((k, m.group(0)))
        self.pos = 0

    def peek(self, ahead: int = 0):
        j = self.pos + ahead
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        if t[0] is None:
            raise ValueError("unexpected end of query")
        self.pos += 1
        return t

    def try_word(self, *words: str) -> Optional[str]:
        k, v = self.peek()
        if k == "word" and v.upper() in words:
            self.pos += 1
            return v.upper()
        return None

    def expect(self, val: str):
        k, v = self.next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")


class Parser:
    def __init__(self) -> None:
        self.prefixes: dict[str, str] = {}

    def parse(self, text: str) -> Query:
        tk = _T(text)
        while True:
            w = tk.try_word("PREFIX", "BASE")
            if w == "PREFIX":
                k, pname = tk.next()
                pfx = pname[: pname.index(":")]
                k2, iri = tk.next()
                self.prefixes[pfx] = iri[1:-1]
            elif w == "BASE":
                tk.next()
            else:
                break
        form = tk.try_word("SELECT", "ASK", "CONSTRUCT", "DESCRIBE")
        if form is None:
            raise ValueError("expected SELECT/ASK/CONSTRUCT/DESCRIBE")
        q = Query(form=form)
        if form == "SELECT":
            if tk.try_word("DISTINCT"):
                q.distinct = True
            tk.try_word("REDUCED")
            while True:
                k, v = tk.peek()
                if k == "var":
                    tk.next()
                    q.variables.append(Var(v[1:]))
                elif v == "*":
                    tk.next()
                    break
                elif v == "(":
                    tk.next()
                    q.aggregates.append(self._aggregate(tk))
                else:
                    break
            tk.try_word("WHERE")
            q.where = self._group(tk)
        elif form == "ASK":
            tk.try_word("WHERE")
            q.where = self._group(tk)
        elif form == "CONSTRUCT":
            tk.expect("{")
            q.template = self._bgp_only(tk)
            tk.expect("}")
            tk.try_word("WHERE")
            q.where = self._group(tk)
        elif form == "DESCRIBE":
            while True:
                k, v = tk.peek()
                if k == "var":
                    tk.next()
                    q.describe_terms.append(Var(v[1:]))
                elif k in ("iri", "pname"):
                    q.describe_terms.append(self._term(tk))
                else:
                    break
            if tk.try_word("WHERE"):
                q.where = self._group(tk)
        self._modifiers(tk, q)
        return q

    # ---- group graph pattern ----
    def _group(self, tk: _T) -> GroupPattern:
        tk.expect("{")
        g = GroupPattern()
        while True:
            k, v = tk.peek()
            if v == "}":
                tk.next()
                return g
            if k == "word" and v.upper() == "FILTER":
                tk.next()
                k2, v2 = tk.peek()
                if k2 == "word" and v2.upper() == "EXISTS":
                    tk.next()
                    g.exists.append(self._group(tk))
                    continue
                if k2 == "word" and v2.upper() == "NOT":
                    tk.next()
                    if not tk.try_word("EXISTS"):
                        raise ValueError("expected EXISTS after NOT")
                    g.not_exists.append(self._group(tk))
                    continue
                g.filters.append(self._expr_primary(tk))
                continue
            if k == "word" and v.upper() == "OPTIONAL":
                tk.next()
                g.optionals.append(self._group(tk))
                continue
            if k == "word" and v.upper() == "MINUS":
                tk.next()
                g.minus.append(self._group(tk))
                continue
            if k == "word" and v.upper() == "BIND":
                tk.next()
                tk.expect("(")
                expr = self._expr_or(tk)
                if not tk.try_word("AS"):
                    raise ValueError("expected AS in BIND")
                kv, vv = tk.next()
                if kv != "var":
                    raise ValueError("expected ?var after AS in BIND")
                tk.expect(")")
                g.binds.append((expr, Var(vv[1:])))
                continue
            if k == "word" and v.upper() == "VALUES":
                tk.next()
                g.values.append(self._values(tk))
                continue
            if v == "{":
                left = self._group(tk)
                if tk.try_word("UNION"):
                    right = self._group(tk)
                    while tk.try_word("UNION"):  # a UNION b UNION c
                        right2 = self._group(tk)
                        right.unions.append((GroupPattern(), right2))
                    g.unions.append((left, right))
                else:
                    g.patterns.extend(left.patterns)
                    g.filters.extend(left.filters)
                    g.optionals.extend(left.optionals)
                    g.unions.extend(left.unions)
                continue
            self._triples_same_subject(tk, g.patterns)
            k, v = tk.peek()
            if v == ".":
                tk.next()

    def _bgp_only(self, tk: _T) -> List[TriplePattern]:
        pats: List[TriplePattern] = []
        while True:
            k, v = tk.peek()
            if v == "}" or k is None:
                return pats
            self._triples_same_subject(tk, pats)
            k, v = tk.peek()
            if v == ".":
                tk.next()

    def _triples_same_subject(self, tk: _T, out: List[TriplePattern]) -> None:
        s = self._term(tk)
        while True:
            p = self._term(tk, predicate=True)
            while True:
                o = self._term(tk)
                out.append(TriplePattern(s, p, o))
                k, v = tk.peek()
                if v == ",":
                    tk.next()
                    continue
                break
            k, v = tk.peek()
            if v == ";":
                tk.next()
                k2, v2 = tk.peek()
                if v2 in (".", "}", ";"):
                    return
                continue
            return

    def _term(self, tk: _T, predicate: bool = False) -> PatTerm:
        k, v = tk.next()
        if k == "var":
            return Var(v[1:])
        if k == "iri":
            return v[1:-1]
        if k == "pname":
            pfx, _, local = v.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"undefined prefix {pfx!r}")
            return self.prefixes[pfx] + local
        if k == "word" and v == "a" and predicate:
            return RDF + "type"
        if k == "word" and v in ("true", "false"):
            return f'"{v}"^^<{XSD_BOOLEAN}>'
        if k == "string":
            lex = unescape_literal(v[1:-1])
            k2, v2 = tk.peek()
            if k2 == "langtag":
                tk.next()
                return f'"{escape_literal(lex)}"{v2}'
            if k2 == "dtype":
                tk.next()
                dt = self._term(tk)
                return f'"{escape_literal(lex)}"^^<{dt}>'
            return f'"{escape_literal(lex)}"'
        if k == "number":
            return _number_literal(v)
        raise ValueError(f"bad term token {v!r}")

    def _values(self, tk: _T):
        """VALUES ?v { t1 t2 } or VALUES (?a ?b) { (t1 t2) (t3 t4) }."""
        k, v = tk.peek()
        vars_: List[Var] = []
        if k == "var":
            tk.next()
            vars_.append(Var(v[1:]))
        elif v == "(":
            tk.next()
            while tk.peek()[0] == "var":
                vars_.append(Var(tk.next()[1][1:]))
            tk.expect(")")
        else:
            raise ValueError("expected ?var or (?vars) after VALUES")
        tk.expect("{")
        rows: List[List[Optional[str]]] = []
        while tk.peek() != ("op", "}") and tk.peek()[1] != "}":
            if len(vars_) == 1:
                rows.append([self._values_term(tk)])
            else:
                tk.expect("(")
                row = []
                while tk.peek()[1] != ")":
                    row.append(self._values_term(tk))
                tk.expect(")")
                rows.append(row)
        tk.next()  # consume '}'
        return (vars_, rows)

    def _values_term(self, tk: _T) -> Optional[str]:
        k, v = tk.peek()
        if k == "word" and v.upper() == "UNDEF":
            tk.next()
            return None
        return self._term(tk)

    def _aggregate(self, tk: _T) -> Aggregate:
        """Parse AGG([DISTINCT] ?v | *) AS ?alias, closing paren consumed."""
        k, v = tk.next()
        if k != "word":
            raise ValueError(f"expected aggregate function, got {v!r}")
        fn = v.upper()
        if fn not in ("COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE"):
            raise ValueError(f"unsupported aggregate {fn}")
        tk.expect("(")
        distinct = bool(tk.try_word("DISTINCT"))
        k2, v2 = tk.next()
        if v2 == "*":
            var = None
        elif k2 == "var":
            var = Var(v2[1:])
        else:
            raise ValueError(f"bad aggregate argument {v2!r}")
        tk.expect(")")
        if not tk.try_word("AS"):
            raise ValueError("expected AS in aggregate projection")
        k3, v3 = tk.next()
        if k3 != "var":
            raise ValueError("expected ?alias after AS")
        tk.expect(")")
        return Aggregate(fn=fn, var=var, alias=Var(v3[1:]), distinct=distinct)

    # ---- expressions ----
    def _expr_primary(self, tk: _T) -> Expr:
        return self._expr_or(tk)

    def _expr_or(self, tk: _T) -> Expr:
        left = self._expr_and(tk)
        args = [left]
        while tk.peek()[1] == "||":
            tk.next()
            args.append(self._expr_and(tk))
        return args[0] if len(args) == 1 else Logical("||", tuple(args))

    def _expr_and(self, tk: _T) -> Expr:
        left = self._expr_cmp(tk)
        args = [left]
        while tk.peek()[1] == "&&":
            tk.next()
            args.append(self._expr_cmp(tk))
        return args[0] if len(args) == 1 else Logical("&&", tuple(args))

    def _expr_cmp(self, tk: _T) -> Expr:
        left = self._expr_unary(tk)
        k, v = tk.peek()
        if v in ("=", "!=", "<", ">", "<=", ">="):
            tk.next()
            right = self._expr_unary(tk)
            return Cmp(v, left, right)
        return left

    def _expr_unary(self, tk: _T) -> Expr:
        k, v = tk.peek()
        if v == "!":
            tk.next()
            return Logical("!", (self._expr_unary(tk),))
        if v == "(":
            tk.next()
            e = self._expr_or(tk)
            tk.expect(")")
            return e
        if k == "var":
            tk.next()
            return Var(v[1:])
        if k == "word" and v.upper() in (
            "REGEX", "CONTAINS", "STR", "LANG", "DATATYPE", "BOUND",
            "STRSTARTS", "STRENDS", "LCASE", "UCASE", "STRLEN",
        ):
            fn = v.upper()
            tk.next()
            tk.expect("(")
            args = []
            while True:
                args.append(self._expr_or(tk))
                if tk.peek()[1] == ",":
                    tk.next()
                    continue
                break
            tk.expect(")")
            return Call(fn, tuple(args))
        # constant term
        return Const(self._term(tk))


def _number_literal(v: str) -> str:
    if re.fullmatch(r"[+-]?\d+", v):
        return f'"{v}"^^<{XSD_INTEGER}>'
    if "e" in v.lower():
        return f'"{v}"^^<{XSD_DOUBLE}>'
    return f'"{v}"^^<{XSD_DECIMAL}>'


def _parse_order(tk: _T, q: Query) -> None:
    while True:
        k, v = tk.peek()
        desc = False
        if k == "word" and v.upper() in ("ASC", "DESC"):
            tk.next()
            desc = v.upper() == "DESC"
            tk.expect("(")
            kv, vv = tk.next()
            if kv != "var":
                raise ValueError("ORDER BY supports variables only")
            tk.expect(")")
            q.order_by.append((Var(vv[1:]), desc))
        elif k == "var":
            tk.next()
            q.order_by.append((Var(v[1:]), False))
        else:
            return


def _attach_modifiers(self_parser: Parser, tk: _T, q: Query) -> None:
    while True:
        w = tk.try_word("ORDER", "LIMIT", "OFFSET", "GROUP", "HAVING")
        if w == "ORDER":
            if not tk.try_word("BY"):
                raise ValueError("ORDER must be followed by BY")
            _parse_order(tk, q)
        elif w == "GROUP":
            if not tk.try_word("BY"):
                raise ValueError("GROUP must be followed by BY")
            while tk.peek()[0] == "var":
                q.group_by.append(Var(tk.next()[1][1:]))
        elif w == "HAVING":
            q.having.append(self_parser._expr_primary(tk))
        elif w == "LIMIT":
            q.limit = int(tk.next()[1])
        elif w == "OFFSET":
            q.offset = int(tk.next()[1])
        else:
            return


Parser._modifiers = lambda self, tk, q: _attach_modifiers(self, tk, q)


def parse_query(text: str) -> Query:
    return Parser().parse(text)
