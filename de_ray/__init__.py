"""de_ray — a Ray-Data-native knowledge-graph construction and query engine.

Rebuilds the capabilities of the DeciSym/de reference (RDF ingestion →
HDT-style dictionary+triples build → SPARQL triple-pattern queries) as
streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches,
extended with a webtext front end (HTML→text extraction, triple
extraction, entity linking) and large-scale training-data operators
(dedup, similarity search, text analysis).

Library code never calls ``ray.init()`` / ``ray.shutdown()`` — the
driver, ``bench.py`` and the test fixture own the Ray session.
"""

__version__ = "0.1.0"


def _stub_fsspec_http() -> None:
    """Pre-resolve ``fsspec.implementations.http`` once, at import time.

    In this environment fsspec is present but aiohttp is not, so that
    import always fails — and a FAILED module import is never cached, so
    Ray's ``_is_http_filesystem`` re-parses http.py on every
    read/write_parquet call AND two threads importing it concurrently (our
    overlapped output writes) can observe a partially-initialized module,
    raising a bare ImportError that Ray's ``except ModuleNotFoundError``
    does not catch. Registering a stub module with a sentinel
    ``HTTPFileSystem`` makes the import succeed trivially; the isinstance
    check it feeds then correctly returns False (we never use HTTP
    filesystems)."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        try:
            import fsspec.implementations
        except ModuleNotFoundError:
            return

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel only — aiohttp absent in this env
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
        fsspec.implementations.http = mod
    except ImportError:
        pass  # partially importable for some other reason — leave it alone


_stub_fsspec_http()
