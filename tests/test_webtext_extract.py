"""Webtext synthesis + HTML→text extraction: the north-rule byte-identity invariant."""

import pyarrow.parquet as pq
import ray.data as rd

from de_ray.sources.webtext import webtext_dir_for
from de_ray.stages.extract import HtmlTextExtractor, extract_text_stage

SF = "/root/testdata/sf0.001"


def test_webtext_schema_and_determinism(tmp_path):
    p1 = webtext_dir_for(SF)
    t = pq.read_table(p1)
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert str(t.schema.field("html").type) == "binary"
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert t.num_rows == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    # re-synthesis into a fresh cache dir is byte-identical (deterministic)
    from de_ray.sources.webtext import synth_webtext

    out2 = tmp_path / "webtext.parquet"
    synth_webtext(f"{SF}/documents.parquet", str(out2))
    t2 = pq.read_table(str(out2))
    assert t.equals(t2)


def test_extractor_pure_roundtrip():
    ex = HtmlTextExtractor()
    from de_ray.sources.webtext import render_html

    for doc_id, text, lang in [
        (0, "hello world", "en"),
        (7, "first para\n\nsecond para", "de"),
        (3, "a & b < c > d", "fr"),
        (12, "", "es"),
    ]:
        html = render_html(doc_id, text, lang)
        assert ex.extract_one(html) == text


def test_extract_stage_byte_identity():
    path = webtext_dir_for(SF)
    ds = rd.read_parquet(path)
    out = extract_text_stage(ds, concurrency=2).select_columns(["url", "text"])
    got = {r["url"]: r["text"] for r in out.take_all()}
    ref = pq.read_table(path, columns=["url", "text"])
    want = dict(zip(ref.column("url").to_pylist(), ref.column("text").to_pylist()))
    assert got == want  # byte-identical per url
    assert "html" not in out.schema().names
