"""URL / domain operators for web-corpus curation.

Large-scale web curation (C4/Gopher/RefinedWeb-style) filters and caps
documents by their URL host: blocklists of spam/adult/boilerplate
domains, and per-domain document caps to stop a single crawl-heavy site
dominating the corpus. These are pure per-row column transforms — no
shuffle — so they belong in the same ``map_batches`` chain as the other
text filters.

``add_host_column`` extracts the authority host from a URL column with
one vectorized RE2 pass (``pyarrow.compute.extract_regex``): the text
between ``scheme://`` and the first ``/ ? #``, with any ``user@`` info
and ``:port`` stripped, lowercased. RFC-lite by design (no IDN/punycode
normalization — out of scope without a public-suffix table); the regex
is ANSI-SQL auditable verbatim via ``regexp_extract``.

``blocklist_filter`` drops rows whose host is in a blocklist — a small
side broadcast once per task closure, membership tested with a
vectorized ``is_in`` kernel. Per-domain caps compose from this module +
:func:`de_ray.dataops.sample.quota_sample` with ``strata_col="host"``.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# authority host: after scheme://, skip optional userinfo@, stop at :port
# or any of / ? #.  pyarrow's extract_regex requires a NAMED group; the
# same RE2 runs in DuckDB's regexp_extract as positional group 1.
HOST_REGEX = r"://(?:[^/?#@]*@)?(?P<host>[^/?#:]+)"


def add_host_column(
    ds: rd.Dataset, url_col: str = "url", out_col: str = "host"
) -> rd.Dataset:
    """Append ``out_col`` = lowercased authority host of ``url_col``
    (null where the URL has no ``scheme://`` part)."""

    def ext(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column(url_col), pattern=HOST_REGEX)
        host = pc.ascii_lower(pc.struct_field(m, "host"))
        return t.append_column(out_col, host)

    return ds.map_batches(ext, batch_format="pyarrow")


def blocklist_filter(
    ds: rd.Dataset,
    blocked_hosts: Iterable[str],
    url_col: str = "url",
    host_col: str = "host",
) -> rd.Dataset:
    """Drop rows whose URL host is in ``blocked_hosts`` (case-insensitive).

    Adds/uses ``host_col``; the blocklist rides the task closure (small
    side, serialized once per task — use an object-store broadcast only
    if the list outgrows that).
    """
    blocked = pa.array(sorted({h.lower() for h in blocked_hosts}), pa.string())

    def flt(t: pa.Table) -> pa.Table:
        if host_col in t.column_names:
            host = t.column(host_col)
        else:
            m = pc.extract_regex(t.column(url_col), pattern=HOST_REGEX)
            host = pc.ascii_lower(pc.struct_field(m, "host"))
            t = t.append_column(host_col, host)
        hit = pc.is_in(host, value_set=blocked)
        # null host (unparseable URL) is NOT blocked — curation drops those
        # elsewhere; a blocklist only removes positive matches.
        return t.filter(pc.invert(pc.fill_null(hit, False)))

    return ds.map_batches(flt, batch_format="pyarrow")


# full URL split: scheme, optional userinfo@, host, rest-of-URL up to any
# fragment. Groups are positional 1..4 for DuckDB regexp_extract parity.
CANON_REGEX = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
    r"(?P<auth>[^/?#@]*@)?(?P<host>[^/?#]+)(?P<rest>[^#]*)"
)


def canonicalize_url(
    ds: rd.Dataset, url_col: str = "url", out_col: str = "canon_url"
) -> rd.Dataset:
    """Append a canonical form of ``url_col``: lowercased scheme and host,
    userinfo and fragment stripped, a bare ``/`` path dropped — the
    normalization web-crawl dedup keys on (two crawls of ``HTTP://X.Com/``
    and ``http://x.com`` are the same page). Deliberately RE2-only so an
    ANSI-SQL oracle reproduces it verbatim (no IDN/punycode or query-param
    reordering — those need tables/parsers SQL can't audit). One
    vectorized ``extract_regex`` pass per batch, zero shuffle; null where
    the URL has no ``scheme://``."""

    def canon(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column(url_col), pattern=CANON_REGEX)
        scheme = pc.ascii_lower(pc.struct_field(m, "scheme"))
        host = pc.ascii_lower(pc.struct_field(m, "host"))
        rest = pc.struct_field(m, "rest")
        rest = pc.if_else(pc.equal(rest, "/"), "", rest)
        out = pc.binary_join_element_wise(scheme, "://", host, rest, "")
        return t.append_column(out_col, out)

    return ds.map_batches(canon, batch_format="pyarrow")


def url_dedup(
    ds: rd.Dataset,
    url_col: str = "url",
    id_col: str = "doc_id",
    out_col: str = "canon_url",
) -> rd.Dataset:
    """Exact dedup by canonical URL (keep the min-id row per canonical
    form): :func:`canonicalize_url` then the combiner-bounded exact-dedup
    shuffle from :mod:`de_ray.dataops.dedup`."""
    from de_ray.dataops.dedup import exact_dedup

    return exact_dedup(canonicalize_url(ds, url_col, out_col), key_col=out_col, id_col=id_col)
