"""Parser robustness properties: the server feeds arbitrary client bytes
into parse_query (POST /query), parse_turtle / parse_nt_text (/store PUT
bodies, LOAD documents). On ANY input each parser must either return a
result or raise ValueError — never IndexError / AttributeError /
RecursionError — and must be deterministic. Derandomized hypothesis keeps
CI reproducible."""

import pytest
from hypothesis import given, settings, strategies as st

from de_ray.query.parser import parse_query
from de_ray.rdfio.ntriples import parse_nt_text
from de_ray.rdfio.turtle import parse_turtle

PARSERS = [parse_turtle, parse_query, parse_nt_text]

_syntax = st.sampled_from(
    ["@prefix", "PREFIX", "BASE", "ex:", "<http://x/y>", '"lit"', "'''l'''",
     '"""q"""', ".", ";", ",", "[", "]", "(", ")", "{", "}", "SELECT",
     "CONSTRUCT", "ASK", "DESCRIBE", "WHERE", "?v", "a", "_:b", "^^", "@en",
     "FILTER", "OPTIONAL", "UNION", "GRAPH", "VALUES", "*", "|", "/", "^",
     "!", "?", "+", "1.5", "-3", "true", "#c\n", "\\u00ZZ", "<<", ">>"]
)
_soup = st.one_of(
    st.lists(_syntax, max_size=15).map(" ".join),
    st.text(alphabet="<>\"'{}[]().;,?@#^|/\\!*+-=_:~ \t\nabcxyz0123456789%&$", max_size=80),
)

_VALID = [
    '@prefix ex: <http://e/> . ex:a ex:p "v"@en, 4.5, true ; ex:q [ ex:r (1 2 3) ] .',
    "PREFIX ex: <http://e/> SELECT ?s (COUNT(?o) AS ?n) WHERE "
    "{ ?s ex:p+ ?o . FILTER(?o > 3) } GROUP BY ?s ORDER BY DESC(?n) LIMIT 5",
    '<http://e/a> <http://e/p> "x\\n"^^<http://www.w3.org/2001/XMLSchema#string> .',
]


@settings(max_examples=400, deadline=None, derandomize=True)
@given(s=_soup)
def test_parsers_only_value_error(s):
    for fn in PARSERS:
        try:
            fn(s)
        except ValueError:
            pass  # the one sanctioned failure mode


@pytest.mark.parametrize("doc", _VALID)
def test_parsers_stable_on_all_prefixes(doc):
    """Every truncation of a valid document fails cleanly (or parses) and
    identically across two calls."""
    for i in range(len(doc) + 1):
        s = doc[:i]
        for fn in PARSERS:
            outs = []
            for _ in range(2):
                try:
                    outs.append(repr(fn(s)))
                except ValueError as e:
                    outs.append(f"ValueError: {e}")
            assert outs[0] == outs[1], (fn.__name__, s)
