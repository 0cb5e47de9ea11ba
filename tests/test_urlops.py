"""URL host extraction + domain blocklist (dataops/urlops.py)."""

import duckdb
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"

TRICKY = [
    ("https://Example.COM/path", "example.com"),
    ("http://user:pw@host.org:8080/x?q=1#f", "host.org"),
    ("https://a.b.c.example.net?q=1", "a.b.c.example.net"),
    ("ftp://files.example.io/pub", "files.example.io"),
    ("https://example.com", "example.com"),
    ("not a url at all", None),
    ("/relative/path/only", None),
]


def test_add_host_column_tricky_urls():
    from de_ray.dataops.urlops import add_host_column

    ds = rd.from_arrow(
        pa.table({"url": [u for u, _ in TRICKY], "i": list(range(len(TRICKY)))})
    )
    out = add_host_column(ds).to_pandas().sort_values("i")
    got = [None if h != h or h is None else h for h in out["host"]]
    assert got == [h for _, h in TRICKY]


def test_host_regex_matches_duckdb_regexp_extract():
    """The very same RE2 must give the same host in ANSI SQL."""
    from de_ray.dataops.urlops import HOST_REGEX, add_host_column

    urls = [u for u, h in TRICKY if h is not None]
    ds = rd.from_arrow(pa.table({"url": urls}))
    got = sorted(add_host_column(ds).to_pandas()["host"])
    con = duckdb.connect()
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT lower(regexp_extract(url, '{HOST_REGEX}', 1)) "
            "FROM (SELECT unnest(?) AS url)",
            [urls],
        ).fetchall()
    )
    assert got == want


def test_hosts_over_synth_webtext():
    """Over the real synthesized webtext table every host follows the
    corpus rule {source}.example.com."""
    from de_ray.dataops.urlops import add_host_column
    from de_ray.sources.webtext import webtext_dir_for

    ds = rd.read_parquet(webtext_dir_for(SF), columns=["url"])
    hosts = add_host_column(ds).to_pandas()["host"]
    assert len(hosts) > 0
    assert hosts.str.fullmatch(r"src\d+\.example\.com").all()


def test_blocklist_filter_case_insensitive_and_null_safe():
    from de_ray.dataops.urlops import blocklist_filter

    ds = rd.from_arrow(
        pa.table(
            {
                "url": [
                    "https://Bad.Site/x",
                    "https://good.site/y",
                    "no scheme here",
                ]
            }
        )
    )
    out = blocklist_filter(ds, {"BAD.SITE"}).to_pandas()
    # blocked host dropped, good host kept, unparseable (null host) kept
    assert sorted(out["url"]) == ["https://good.site/y", "no scheme here"]
    assert out["host"].isna().sum() == 1
