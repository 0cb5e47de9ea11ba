"""Malformed-HTML golden suite for the extractor (VERDICT r3 item 6).

Real Common-Crawl HTML has unclosed tags, nested articles, CDATA, comments
wrapping markup, truncated payloads and non-UTF-8 bytes. The extractor must
stay a deterministic pure function on ALL of it (the north-rule per-url
byte-identity invariant only bites if extraction is reproducible), and the
well-formed oracle corpus must keep extracting byte-identically
(tests/test_webtext_extract.py guards that half).
"""

import pytest

from de_ray.stages.extract import HtmlTextExtractor

GOLDENS = [
    # (payload, expected text)
    (b"<article><p>hello", "hello"),  # truncated mid-paragraph
    (b"<p>a</p><script>var x=1;", "a"),  # unclosed <script> dropped to EOF
    (b"<p>a</p><style>.x{", "a"),  # unclosed <style> likewise
    (
        b"<!-- <p>ghost</p> --><article><p>real</p></article>",
        "real",
    ),  # commented-out markup never matches
    (b"<!-- never closed <p>ghost</p>", ""),  # truncated comment
    (b"<article><![CDATA[x > y]]></article>", "x > y"),  # CDATA brackets
    (b"<article><![CDATA[trunc", "trunc"),  # truncated CDATA
    (
        b"<article>a<article>b</article>c</article>",
        "ab",
    ),  # nested article: first close wins, deterministic
    (
        b"<p>x &#xZZ; &amp; y</p>",
        "x &#xZZ; & y",
    ),  # malformed entity left as-is, valid one unescaped
    (b"<div class='a\nb'><p>multi</p></div><", "multi"),  # trailing lone <
    (b"<div><p>no close</div>", "no close"),  # unclosed <p>: tag-strip path
    (b"", ""),  # empty payload
    (b"plain text, no markup at all", "plain text, no markup at all"),
]


@pytest.mark.parametrize("payload,expected", GOLDENS)
def test_malformed_golden(payload, expected):
    x = HtmlTextExtractor()
    assert x.extract_one(payload) == expected


def test_non_utf8_bytes_deterministic():
    """Invalid UTF-8 decodes with U+FFFD replacement — same bytes in, same
    string out, across extractor instances."""
    payload = b"<article><p>caf\xe9 \xff\xfe\x80</p></article>"
    a = HtmlTextExtractor().extract_one(payload)
    b = HtmlTextExtractor().extract_one(payload)
    assert a == b
    assert a.startswith("caf") and "�" in a


def test_huge_truncated_payload_no_blowup():
    """A payload cut mid-tag after many paragraphs keeps the closed ones."""
    body = b"".join(b"<p>para %d</p>" % i for i in range(1000))
    payload = b"<article>" + body + b"<p>tail is cut <a href="
    x = HtmlTextExtractor()
    out = x.extract_one(payload)
    assert out.startswith("para 0\n\npara 1")
    assert out.count("\n\n") == 999
    assert "tail is cut" not in out  # unterminated paragraph excluded


def test_comment_opener_inside_closed_script():
    """'<!--' inside a properly closed <script> must not eat the rest of
    the document (closed scripts are removed before comment stripping)."""
    payload = b"<p>keep</p><script>if(a<!--b){}</script><p>also keep</p>"
    out = HtmlTextExtractor().extract_one(payload)
    assert out == "keep\n\nalso keep"
