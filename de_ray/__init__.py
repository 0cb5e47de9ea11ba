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


def _tune_malloc() -> None:
    """Keep large numpy/Arrow buffers on the heap instead of per-allocation
    mmap (glibc ``mallopt``), in EVERY process that imports this package —
    the driver and, because Ray workers import ``de_ray`` when they
    deserialize our tasks, every worker too.

    Why: glibc's default M_MMAP_THRESHOLD (128 KB, dynamically up to 32 MB)
    sends every multi-megabyte batch buffer to mmap and munmaps it on free,
    so each per-batch allocation re-faults fresh zeroed pages. With N
    concurrent workers the faults serialize on the kernel's mm locks +
    page zeroing: measured on this host, 16 concurrent processes each
    allocating 6 × 50 MB arrays take 5.8 s with the default and 0.25 s
    with a 1 GiB threshold (23×) — the contention grows with worker count,
    so it taxes exactly the wide, well-partitioned stages and masquerades
    as a memory-bandwidth scaling floor. Raising the trim threshold too
    lets freed heap blocks be REUSED across batches instead of returned.
    Cost: each worker's RSS stays at its per-task high-water mark (hundreds
    of MB here) rather than dipping between tasks — the right trade on
    dedicated data-plane nodes. Opt out with DE_RAY_NO_MALLOC_TUNE=1."""
    import os

    if os.environ.get("DE_RAY_NO_MALLOC_TUNE"):
        return
    # also export for child processes (e.g. a raylet forked later picks it
    # up at startup, before any Python code runs in its workers)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass  # non-glibc platform — env vars above still help where read


_tune_malloc()


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
