"""Term model round-trips (reference src/sparql.rs:372-413 conventions)."""

from de_ray.model import (
    XSD_BOOLEAN,
    BlankNode,
    Iri,
    Literal,
    canonical_to_nt,
    canonical_to_term,
    escape_literal,
    nt_token_to_canonical,
    term_to_canonical,
    term_to_nt,
    typed_sort_key,
    unescape_literal,
)


def test_iri_roundtrip():
    t = Iri("http://example.org/Banana")
    s = term_to_canonical(t)
    assert s == "http://example.org/Banana"  # bare, no brackets
    assert canonical_to_term(s) == t
    assert term_to_nt(t) == "<http://example.org/Banana>"


def test_blank_roundtrip():
    t = BlankNode("b0")
    s = term_to_canonical(t)
    assert s == "_:b0"
    assert canonical_to_term(s) == t


def test_plain_literal_roundtrip():
    t = Literal("yellow")
    s = term_to_canonical(t)
    assert s == '"yellow"'
    assert canonical_to_term(s) == t


def test_typed_literal_roundtrip():
    t = Literal("true", datatype=XSD_BOOLEAN)
    s = term_to_canonical(t)
    assert s == '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'
    assert canonical_to_term(s) == t


def test_lang_literal_roundtrip():
    t = Literal("Banane", lang="de")
    s = term_to_canonical(t)
    assert s == '"Banane"@de'
    assert canonical_to_term(s) == t


def test_escapes():
    raw = 'line1\nline2\t"quoted"\\slash'
    esc = escape_literal(raw)
    assert "\n" not in esc
    assert unescape_literal(esc) == raw
    t = Literal(raw)
    assert canonical_to_term(term_to_canonical(t)) == t


def test_unicode_escape():
    assert unescape_literal(r"café") == "café"
    assert unescape_literal(r"\U0001F600") == "😀"


def test_nt_token_conversion():
    assert nt_token_to_canonical("<http://x/y>") == "http://x/y"
    assert nt_token_to_canonical('"lit"') == '"lit"'
    assert canonical_to_nt("http://x/y") == "<http://x/y>"
    assert canonical_to_nt('"lit"@en') == '"lit"@en'
    assert canonical_to_nt("_:b1") == "_:b1"


def test_sort_key_tiers():
    # blank < iri < numeric literal < string literal
    ks = [typed_sort_key(s) for s in ["_:b", "http://a", '"3"^^<http://www.w3.org/2001/XMLSchema#integer>', '"abc"']]
    assert ks == sorted(ks)
    assert typed_sort_key('"10"^^<http://www.w3.org/2001/XMLSchema#integer>') > typed_sort_key(
        '"9"^^<http://www.w3.org/2001/XMLSchema#integer>'
    )
