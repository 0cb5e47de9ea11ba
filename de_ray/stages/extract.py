"""HTML→text extraction stage (M6 — the north-rule per-row invariant).

``html:binary → text:string`` must be **byte-identical per url** to the
reference ``text`` column. The extractor is a fully deterministic pure
function (no locale/time dependence): drop ``<script>``/``<style>`` and
page chrome, take the ``<article>`` payload, strip tags per ``<p>``
paragraph, unescape HTML entities, join paragraphs with a blank line.

Runs as a stateless-looking callable CLASS so the regexes compile once per
actor (``__init__``), not once per batch; batches are zero-copy Arrow.
The wide ``html`` column is dropped immediately after extraction to keep
object-store pressure down (SURVEY §7.4).
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa


class HtmlTextExtractor:
    """map_batches(HtmlTextExtractor, batch_format='pyarrow', concurrency=N)."""

    def __init__(self) -> None:
        self.article_re = re.compile(rb"<article[^>]*>(.*?)</article>", re.S)
        self.script_re = re.compile(rb"<(script|style)[^>]*>.*?</\1>", re.S)
        self.para_re = re.compile(rb"<p[^>]*>(.*?)</p>", re.S)
        self.tag_re = re.compile(rb"<[^>]+>")
        # malformed-input hardening (real Common-Crawl HTML): comments may
        # wrap <p> markup, CDATA brackets confuse the tag stripper, an
        # unclosed <script>/<style> would otherwise leak code into text,
        # and a payload truncated mid-tag leaves a dangling "<..." run
        self.comment_re = re.compile(rb"<!--.*?(?:-->|\Z)", re.S)
        self.cdata_re = re.compile(rb"<!\[CDATA\[(.*?)(?:\]\]>|\Z)", re.S)
        self.open_script_re = re.compile(rb"<(?:script|style)[^>]*>.*\Z", re.S)
        self.trunc_tag_re = re.compile(rb"<[^>]*\Z")

    def extract_one(self, html: bytes) -> str:
        # closed script/style blocks go FIRST: real pages embed '<!--'
        # inside scripts (legal JS, old-style comment hiding), and an
        # unterminated comment-opener there must not eat the rest of the
        # document once the script block itself is gone
        body = self.script_re.sub(b"", html)
        body = self.comment_re.sub(b"", body)
        body = self.cdata_re.sub(rb"\1", body)
        body = self.open_script_re.sub(b"", body)  # unclosed → drop to EOF
        m = self.article_re.search(body)
        scope = m.group(1) if m else body
        paras = self.para_re.findall(scope)
        if not paras:
            paras = [self.trunc_tag_re.sub(b"", self.tag_re.sub(b"", scope))]
        return "\n\n".join(
            _html.unescape(p.decode("utf-8", errors="replace")) for p in paras
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [self.extract_one(h) for h in batch.column("html").to_pylist()]
        keep = [n for n in batch.schema.names if n not in ("html", "text")]
        out = batch.select(keep)
        return out.append_column("text", pa.array(texts, pa.string()))


_PROCESS_EXTRACTOR = None


def _extract_batch_task(batch: pa.Table) -> pa.Table:
    """Stateless-task variant: the extractor (compiled regexes) is built once
    per worker process. Task stages FUSE with adjacent map stages (actor
    pools don't), skipping a plasma round-trip of the whole corpus."""
    global _PROCESS_EXTRACTOR
    if _PROCESS_EXTRACTOR is None:
        _PROCESS_EXTRACTOR = HtmlTextExtractor()
    return _PROCESS_EXTRACTOR(batch)


def extract_text_stage(ds, batch_size: int = 1024, concurrency=(1, 8),
                       compute: str = "tasks"):
    """Dataset(url, warc_ts, html, lang, ...) → Dataset(..., text) without html.

    ``compute="tasks"`` (default): stateless tasks with a per-process
    extractor — fuses with neighbouring map stages. ``compute="actors"``:
    explicit autoscaling actor pool (for heavyweight extractors whose init
    cost matters, e.g. model-backed ones).
    Moderate batch_size: html rows are wide binary payloads (SURVEY §7.4).
    """
    if compute == "actors":
        return ds.map_batches(
            HtmlTextExtractor,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    return ds.map_batches(
        _extract_batch_task,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
