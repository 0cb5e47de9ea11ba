"""Deterministic synthetic Common-Crawl-style webtext (the flagship source).

BASELINE.json ``input_hint`` fixes the input shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data is allowed, so we synthesize this table deterministically
from the driver's ``documents.parquet`` (seed-stable: every value is a pure
function of the document row). The HTML is rendered so that the engine's
extractor (de_ray.stages.extract) recovers the ``text`` column
**byte-identically per url** — the north-rule invariant.

Page structure (deterministic per doc_id, with boilerplate variety):
``<nav>``/``<header>`` chrome, a ``<script>`` blob, the payload inside
``<article>`` as ``<p>`` paragraphs (text split on ``\\n\\n``), and a
``<footer>`` — only the ``<article>`` content round-trips.
"""

from __future__ import annotations

import html as _html
import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WEBTEXT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_WARC_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_NAV_VARIANTS = [
    '<nav class="top"><a href="/">Home</a><a href="/about">About</a></nav>',
    '<nav><ul><li><a href="/">Index</a></li><li><a href="/news">News</a></li></ul></nav>',
    "<nav><a href=\"/\">Main</a> | <a href=\"/archive\">Archive</a></nav>",
]

_FOOTER_VARIANTS = [
    "<footer><p>&copy; 2024 Example Corp. All rights reserved.</p></footer>",
    "<footer><p>Contact: <a href=\"mailto:info@example.com\">info@example.com</a></p></footer>",
]

_SCRIPT = "<script>var _a=1;function t(){return _a+1;}</script>"
_STYLE = "<style>body{margin:0;font-family:serif}</style>"


def page_url(doc_id: int, source: str) -> str:
    return f"https://{source}.example.com/page/{doc_id}"


def page_ts_us(doc_id: int) -> int:
    # deterministic pseudo-crawl-time: epoch + doc-dependent offset
    return _WARC_EPOCH_US + (doc_id * 37 + (doc_id * doc_id) % 1009) * 1_000_000


def render_html(doc_id: int, text: str, lang: str) -> bytes:
    """Pure deterministic page renderer (same output on every worker)."""
    paras = text.split("\n\n")
    body = "".join(f"<p>{_html.escape(p, quote=False)}</p>" for p in paras)
    nav = _NAV_VARIANTS[doc_id % len(_NAV_VARIANTS)]
    footer = _FOOTER_VARIANTS[doc_id % len(_FOOTER_VARIANTS)]
    title = _html.escape(f"Document {doc_id}", quote=False)
    page = (
        f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8">'
        f"<title>{title}</title>{_STYLE}{_SCRIPT}</head>"
        f"<body>{nav}<header><h1>{title}</h1></header>"
        f"<article>{body}</article>"
        f"{footer}</body></html>"
    )
    return page.encode("utf-8")


def synth_webtext(
    documents_parquet: str, out_path: str, rows_per_group: int = 2048, repeat: int = 1,
    shard_rows: int = 100_000,
) -> int:
    """Materialize the webtext table from a documents.parquet, deterministically.

    Driver-side, single pass (the testdata tables are small); the output is a
    normal Parquet file read by ``ray.data.read_parquet`` downstream. Returns
    the row count.

    ``repeat`` > 1 deterministically replicates the corpus with shifted
    doc_ids (and therefore distinct urls) — the bench uses this so the
    headline pipeline at sf0.1 measures real work, while the correctness
    queries keep the 1:1 table.
    """
    tbl = pq.read_table(documents_parquet, columns=["doc_id", "text", "lang", "source"])
    base_ids = tbl.column("doc_id").to_pylist()
    base_n = (max(base_ids) + 1) if base_ids else 0
    doc_id, text, lang, source = [], [], [], []
    for k in range(repeat):
        doc_id.extend(i + base_n * k for i in base_ids)
        text.extend(tbl.column("text").to_pylist())
        lang.extend(tbl.column("lang").to_pylist())
        source.extend(tbl.column("source").to_pylist())
    url = [page_url(d, s) for d, s in zip(doc_id, source)]
    ts = pa.array(np.array([page_ts_us(d) for d in doc_id], dtype="int64")).cast(
        pa.timestamp("us")
    )
    html_col = [render_html(d, t, l) for d, t, l in zip(doc_id, text, lang)]
    out = pa.table(
        {
            "url": pa.array(url, pa.string()),
            "warc_ts": ts,
            "html": pa.array(html_col, pa.binary()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(lang, pa.string()),
        },
        schema=WEBTEXT_SCHEMA,
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if repeat > 1:
        # shard like a real crawl (one file per ~100k pages): reads
        # parallelize per file and failed runs can skip finished shards
        os.makedirs(out_path, exist_ok=True)
        n = out.num_rows
        for si, start in enumerate(range(0, n, shard_rows)):
            pq.write_table(
                out.slice(start, shard_rows),
                os.path.join(out_path, f"part-{si:05d}.parquet"),
                row_group_size=rows_per_group,
            )
    else:
        pq.write_table(out, out_path, row_group_size=rows_per_group)
    return out.num_rows


def webtext_dir_for(
    sf_dir: str, cache_root: str = "/tmp/de_ray_webtext", repeat: int = 1,
    shard_rows: int = 100_000,
) -> str:
    """Path of the (lazily materialized) webtext parquet for a testdata sf dir.

    Cached per (scale factor, repeat) under /tmp with a _SUCCESS marker;
    synthesis is deterministic so the cache is always valid for the same
    input.
    """
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    if repeat > 1:
        tag = f"{tag}_x{repeat}"
    out_dir = os.path.join(cache_root, tag)
    out_path = os.path.join(out_dir, "webtext.parquet")
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        synth_webtext(
            os.path.join(sf_dir, "documents.parquet"), out_path, repeat=repeat,
            shard_rows=shard_rows,
        )
        with open(marker, "w") as f:
            f.write("ok")
    return out_path


def webtext_dataset(sf_dir: str, columns: Optional[list] = None):
    """Webtext table for a testdata sf dir as a Ray Dataset (column-pruned)."""
    import ray.data as rd

    return rd.read_parquet(webtext_dir_for(sf_dir), columns=columns)
