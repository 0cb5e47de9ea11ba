"""Property/fuzz suite for the HTML extractor (VERDICT r4 item 8).

The malformed-golden suite (test_extract_malformed.py) pins hand-written
cases; this file throws machine-generated tag soup — random nesting,
truncation at every byte boundary, comment/CDATA/script interleavings,
invalid UTF-8 — at the extractor and asserts the properties the north
rule actually needs: extraction NEVER raises, and it is a deterministic
pure function (fresh instances and different batch groupings produce
identical bytes). Hypothesis runs derandomized so CI is reproducible.
"""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from de_ray.stages.extract import HtmlTextExtractor

# fragment soup: the building blocks real crawls get wrong
_TAGS = ["article", "p", "div", "script", "style", "span", "a"]
_fragment = st.one_of(
    st.sampled_from([f"<{t}>" for t in _TAGS]),
    st.sampled_from([f"</{t}>" for t in _TAGS]),
    st.sampled_from([f"<{t} class='x y' data-k=\"v\">" for t in _TAGS]),
    st.sampled_from(["<!--", "-->", "<![CDATA[", "]]>", "<", ">", "&amp;", "&#xZZ;", "&#65;"]),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=12
    ),
)
_soup = st.lists(_fragment, min_size=0, max_size=40).map("".join)


def _payload(soup: str, cut: int, junk: bytes) -> bytes:
    raw = soup.encode("utf-8", errors="surrogatepass") + junk
    return raw[: max(0, len(raw) - cut)]  # truncate anywhere, incl. mid-rune


@settings(max_examples=300, deadline=None, derandomize=True)
@given(soup=_soup, cut=st.integers(0, 64), junk=st.binary(max_size=8))
def test_fuzz_no_crash_and_deterministic(soup, cut, junk):
    payload = _payload(soup, cut, junk)
    a = HtmlTextExtractor().extract_one(payload)
    b = HtmlTextExtractor().extract_one(payload)
    assert isinstance(a, str)
    assert a == b  # fresh-instance determinism (per-url byte identity)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(
    soups=st.lists(_soup, min_size=2, max_size=6),
    cut=st.integers(0, 32),
)
def test_fuzz_batch_split_invariant(soups, cut):
    """__call__ must equal per-row extract_one regardless of how rows are
    grouped into batches (worker-assignment independence)."""
    payloads = [_payload(s, cut, b"") for s in soups]
    x = HtmlTextExtractor()
    whole = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(payloads))]),
            "html": pa.array(payloads, pa.binary()),
        }
    )
    got = x(whole).column("text").to_pylist()
    per_row = [HtmlTextExtractor().extract_one(p) for p in payloads]
    split = [
        t
        for i in range(len(payloads))
        for t in x(whole.slice(i, 1)).column("text").to_pylist()
    ]
    assert got == per_row == split


def test_fuzz_golden_corpus_truncations():
    """Every prefix of every malformed golden payload extracts without
    raising and deterministically (inputs nobody hand-wrote)."""
    from tests.test_extract_malformed import GOLDENS

    x = HtmlTextExtractor()
    for payload, _ in GOLDENS:
        for i in range(len(payload) + 1):
            p = payload[:i]
            assert x.extract_one(p) == HtmlTextExtractor().extract_one(p)
