"""ID-triples: term→ID encoding, SPO sort, adjacency (BitmapTriples) packing.

Rebuilds the reference's BitmapTriples semantics (ID-triples sorted SPO with
two adjacency layers — predicate stream Y and object stream Z, each with a
bitmap marking list ends; ``triplesOrder "SPO"`` header key, verified against
``tests/resources/apple.hdt``) as Ray Data stages.

Encoding strategies:
- **broadcast** (default below a threshold): the three ID maps are put in
  the object store ONCE via ``ray.put`` and read zero-copy by every encoder
  actor — no shuffle.
- **shuffle join** (scale path): three ``Dataset.join`` hash joins against
  the dictionary when the term dictionary itself is too big to broadcast
  (10^12-doc regime, SURVEY §7.3 "term→ID join").
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from de_ray.hdt.dictionary import (
    SECTION_OBJECT,
    SECTION_PREDICATE,
    SECTION_SHARED,
    SECTION_SUBJECT,
    DictionaryBuild,
)

# above this many dictionary entries, encode via shuffle join instead of
# broadcast. The broadcast state is two uint64 numpy arrays per ID space
# (~16 B/term) served zero-copy from plasma — every worker on a node SHARES
# one mapped copy, so 64M terms ≈ 1 GiB per node, comfortably inside the
# 128 GiB/32-vCPU node class this targets. Keep the join path for the true
# beyond-RAM dictionary regime.
BROADCAST_LIMIT = 64_000_000

# at or below this many dictionary entries, encode with stateless tasks
# (per-worker index build is cheap); above it, an actor pool
TASK_ENCODE_TERMS = 1_000_000


def id_dtype_for(n_terms: int) -> pa.DataType:
    """Narrowest integer type that holds every ID (1..n_terms): int32 unless
    the dictionary exceeds 2^31-1 terms. At 46.9M triples this halves the
    bytes the SPO sort shuffles; on the 10^12-doc cluster it halves them per
    node."""
    return pa.int32() if n_terms < 2**31 - 1 else pa.int64()


class PackSpec(NamedTuple):
    """Bit layout packing (s_id, p_id, o_id, g_id) into ONE int64 sort key
    ``spog`` whose numeric order IS the (s,p,o,g) lexicographic order the
    HDT layout needs (the reference's BitmapTriples is likewise a bit-packed
    SPO encoding, hdt crate via src/create.rs:40). Halves the bytes the
    repartition + sort move (8 B/row vs 2×int32+int32+int32) and turns the
    4-column lexicographic compare into a single int compare; dedup becomes
    adjacent-equality on one array."""

    s_shift: int
    p_shift: int
    o_shift: int
    p_mask: int
    o_mask: int
    g_mask: int


def pack_spec_for(dict_build: DictionaryBuild, graphs) -> Optional[PackSpec]:
    """PackSpec when every ID space fits 63 bits together, else None (the
    >2^63 combined regime falls back to 4-column keys). Also None above
    BROADCAST_LIMIT terms — the join encoder emits 4 columns."""
    n_terms = sum(dict_build.counts.values())
    if n_terms > BROADCAST_LIMIT:
        return None
    sb = dict_build.max_subject_id().bit_length()
    pb = dict_build.num_predicates().bit_length()
    ob = dict_build.max_object_id().bit_length()
    gb = max(0, (len(graphs) - 1).bit_length()) if graphs else 0
    if sb + pb + ob + gb > 63:
        return None
    return PackSpec(
        s_shift=pb + ob + gb,
        p_shift=ob + gb,
        o_shift=gb,
        p_mask=(1 << pb) - 1,
        o_mask=(1 << ob) - 1,
        g_mask=(1 << gb) - 1,
    )


def _pack_table(tbl: pa.Table, pack: PackSpec) -> pa.Table:
    """(s_id, p_id, o_id, g_id) columns → one ``spog`` int64 column (all
    Arrow C++ kernels, fused into the encode task)."""
    import pyarrow.compute as pc

    def c64(name):
        return pc.cast(tbl.column(name), pa.int64())

    key = pc.bit_wise_or(
        pc.shift_left(c64("s_id"), pack.s_shift),
        pc.shift_left(c64("p_id"), pack.p_shift),
    )
    key = pc.bit_wise_or(key, pc.shift_left(c64("o_id"), pack.o_shift))
    key = pc.bit_wise_or(key, c64("g_id"))
    return pa.table({"spog": key})


def fingerprint_strings(arr: pa.Array):
    """Deterministic uint64 per string — identical across processes and
    nodes within one environment (fixed seeds; the encode path verifies
    every lookup against the stored fingerprint and fails loudly on any
    drift, so a version skew can mis-route nothing silently).

    Polars' multithreaded xxhash-family kernel when available: hashing the
    term dictionary was a ~4 s SERIAL driver floor at every CPU level with
    pandas' per-object siphash (measured 2M terms: polars 0.05 s vs pandas
    4.0 s including the to_pandas object materialization)."""
    try:
        import polars as pl

        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            s = pl.from_arrow(arr)
        else:  # pandas Series
            s = pl.from_pandas(arr)
        return s.hash(seed=0).to_numpy()
    except ImportError:
        pass
    import pandas as pd

    s = arr.to_pandas() if not isinstance(arr, pd.Series) else arr
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def fp_spaces_from_table(tbl: pa.Table):
    """Per-space (sorted uint64 term fingerprints, aligned ids) numpy arrays.

    Returns None if any space has a fingerprint collision (two distinct
    terms, same 64-bit hash — probability ~n²/2⁶⁵; the caller then falls
    back to the exact string-index encoder).

    The terms are hashed ONCE for the whole table and the per-space arrays
    are sorted here, on the driver — workers read them zero-copy from the
    object store with NO per-process rebuild and look batches up with
    ``np.searchsorted``. (The previous shape — each worker re-hashing the
    2M-term dictionary and building a pandas hash index — cost ~5 s per
    worker process: an anti-scaling term, total setup grew with worker
    count while the encode work itself shrank per worker.)"""
    import numpy as np
    import pyarrow.compute as pc

    fps_all = fingerprint_strings(tbl.column("term").combine_chunks())
    sec = tbl.column("section")
    ids_all = tbl.column("id").to_numpy(zero_copy_only=False)
    out = {}
    for space, sections in (
        ("subj", (SECTION_SHARED, SECTION_SUBJECT)),
        ("obj", (SECTION_SHARED, SECTION_OBJECT)),
        ("pred", (SECTION_PREDICATE,)),
    ):
        mask = pc.is_in(sec, value_set=pa.array(list(sections), pa.int32())).to_numpy(
            zero_copy_only=False
        )
        fps = fps_all[mask]
        # default quicksort: with no duplicate fingerprints the permutation
        # is unique regardless of sort stability, and the duplicate case
        # returns None (collision fallback) — tie order never matters
        order = np.argsort(fps)
        sfps = fps[order]
        if len(sfps) > 1 and (sfps[1:] == sfps[:-1]).any():
            return None
        out[space] = (sfps, ids_all[mask][order])
    return out


def collect_sections_table(dict_build: DictionaryBuild) -> pa.Table:
    """Concatenate the sections Dataset into one Arrow table (term, section,
    id) — the broadcast form. Arrow stays zero-copy in the object store;
    workers derive their lookup dicts from it once per process."""
    if getattr(dict_build, "local_tbl", None) is not None:
        return dict_build.local_tbl.select(["term", "section", "id"])
    batches = list(
        dict_build.sections.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    return pa.concat_tables(
        [b.select(["term", "section", "id"]) for b in batches]
    )


def space_arrays_from_table(tbl: pa.Table):
    """Arrow sections table → per-space (terms, ids) Arrow arrays for
    vectorized ``pc.index_in`` encoding. Built once per worker process (via
    the broadcast cache); no Python dicts anywhere."""
    import pyarrow.compute as pc

    sec = tbl.column("section")
    out = {}
    for space, sections in (
        ("subj", (SECTION_SHARED, SECTION_SUBJECT)),
        ("obj", (SECTION_SHARED, SECTION_OBJECT)),
        ("pred", (SECTION_PREDICATE,)),
    ):
        mask = pc.is_in(sec, value_set=pa.array(list(sections), pa.int32()))
        sub = tbl.filter(mask)
        out[space] = (
            sub.column("term").combine_chunks(),
            sub.column("id").combine_chunks(),
        )
    return out


def space_indexes_from_table(tbl: pa.Table):
    """Per-space (pandas Index over terms, numpy ids): the Index's hash
    table builds ONCE per worker process and is reused every batch —
    ``pc.index_in`` would rebuild its value-set hash per call (measured 10×
    slower on a 2M-term dictionary)."""
    import numpy as np
    import pandas as pd

    out = {}
    for space, (terms, ids) in space_arrays_from_table(tbl).items():
        idx = pd.Index(terms.to_pandas())
        idx.get_indexer(idx[:1])  # force hash-table build now, once
        out[space] = (idx, ids.to_numpy(zero_copy_only=False))
    return out


class BroadcastEncoder:
    """ACTOR-POOL encoder: the per-space pandas Indexes (hash tables over
    the full term dictionary) build once per actor in ``__init__``; each
    batch then dictionary-encodes its columns (C++), looks up only the
    small per-batch unique set, and expands with ``pc.take``.

    This must NOT run as stateless tasks: Ray scatters tasks across every
    idle worker process in the session, and each first-touch pays the full
    index build (measured: a 2M-term dictionary costs ~1.7 s per process —
    ~170 cold inits turned a 3 s encode into a 300 s-CPU stage)."""

    def __init__(self, maps_ref, graphs=None, id_dtype=pa.int64(), pack=None):
        from de_ray.state.broadcast import get_broadcast

        self.spaces = get_broadcast(maps_ref, transform=space_indexes_from_table)
        self.graphs = graphs
        self.id_dtype = id_dtype
        self.pack = pack

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _encode_with(self.spaces, batch, self.graphs, self.id_dtype)
        return _pack_table(out, self.pack) if self.pack is not None else out


def _graph_col(batch: pa.Table, graphs) -> pa.Array:
    """Graph column of the encoded batch: ``g_id`` int32 when a graph list is
    given (the store path — strings never enter the sort shuffle), else the
    passthrough string column."""
    import numpy as np
    import pyarrow.compute as pc

    n = len(batch)
    if graphs is None:
        return (
            batch.column("graph").combine_chunks()
            if "graph" in batch.schema.names
            else pa.array([""] * n, pa.large_string())
        ), "graph"
    if "graph" not in batch.schema.names:
        return pa.array(np.zeros(n, dtype=np.int32)), "g_id"
    arr = batch.column("graph")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = pc.dictionary_encode(arr)
    batch_graphs = enc.dictionary.to_pylist()
    unknown = [g for g in batch_graphs if g not in graphs]
    if unknown:
        raise ValueError(
            f"graph name(s) {unknown[:5]!r} present in the data but missing from "
            f"the graphs= list passed to write_store ({graphs!r}); the graphs "
            "argument must enumerate every distinct graph in the input."
        )
    lut = pa.array([graphs.index(g) for g in batch_graphs], pa.int32())
    return pc.take(lut, enc.indices), "g_id"


def _encode_with(spaces, batch: pa.Table, graphs=None, id_dtype=pa.int64()) -> pa.Table:
    """Vectorized batch encode: dictionary-encode each column (C++), look up
    only the small per-batch unique set against the prebuilt pandas Index,
    expand with ``pc.take``."""
    import pyarrow.compute as pc

    def encode_col(col, space: str) -> pa.Array:
        idx, ids = spaces[space]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        enc = pc.dictionary_encode(arr)
        uniq = enc.dictionary.to_pandas()
        pos = idx.get_indexer(uniq)
        if (pos < 0).any():
            # -1 would wrap to ids[-1]: a term absent from the dictionary
            # must fail loudly, exactly like the fingerprint path does
            bad = uniq[pos < 0].iloc[0]
            raise ValueError(
                f"encode: term {bad!r} missing from the dictionary index for "
                f"space {space!r} — encode input diverged from the dictionary "
                "input (non-deterministic source with materialize_input=False?)"
            )
        lut = pa.array(ids[pos], id_dtype)
        return pc.take(lut, enc.indices)

    gcol, gname = _graph_col(batch, graphs)
    return pa.table(
        {
            "s_id": encode_col(batch.column("subj"), "subj"),
            "p_id": encode_col(batch.column("pred"), "pred"),
            "o_id": encode_col(batch.column("obj"), "obj"),
            gname: gcol,
        }
    )


def _encode_with_fp(fp_spaces, batch: pa.Table, graphs=None, id_dtype=pa.int64()) -> pa.Table:
    """Fingerprint variant of :func:`_encode_with`: per-batch unique terms are
    hashed to uint64 and binary-searched against the broadcast sorted
    fingerprint arrays — zero per-process state, so the encoder runs as
    stateless tasks fused with its upstream."""
    import numpy as np
    import pyarrow.compute as pc

    def encode_col(col, space: str) -> pa.Array:
        sfps, ids = fp_spaces[space]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        enc = pc.dictionary_encode(arr)
        fps = fingerprint_strings(enc.dictionary)
        pos = np.searchsorted(sfps, fps)
        pos = np.clip(pos, 0, max(0, len(ids) - 1))
        # A fingerprint absent from the dictionary would otherwise be silently
        # encoded to an arbitrary neighbouring ID — verify every hit.
        miss = sfps[pos] != fps if len(sfps) else np.ones(len(fps), bool)
        if miss.any():
            bad = enc.dictionary.take(
                pa.array(np.flatnonzero(miss)[:5], pa.int64())
            ).to_pylist()
            raise ValueError(
                f"{int(miss.sum())} term(s) in space '{space}' are missing from the "
                f"dictionary fingerprint index (first: {bad!r}). The encode input "
                "diverged from the dictionary input — rebuild with "
                "materialize_input=True or a deterministic source."
            )
        lut = pa.array(ids[pos], id_dtype)
        return pc.take(lut, enc.indices)

    gcol, gname = _graph_col(batch, graphs)
    return pa.table(
        {
            "s_id": encode_col(batch.column("subj"), "subj"),
            "p_id": encode_col(batch.column("pred"), "pred"),
            "o_id": encode_col(batch.column("obj"), "obj"),
            gname: gcol,
        }
    )


def _join_encode(triples_ds: rd.Dataset, dict_build: DictionaryBuild,
                 num_partitions: Optional[int] = None) -> rd.Dataset:
    """Shuffle-join encoding for dictionaries too large to broadcast."""
    if num_partitions is None:
        # join aggregator actors reserve CPU slots — stay under the budget
        num_partitions = max(2, min(64, int(ray.cluster_resources().get("CPU", 4)) - 1))
    def _space_map(sections):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(
                t.column("section"), value_set=pa.array(list(sections), pa.int32())
            )
            sub = t.filter(mask)
            # join keys must type-match the triples' large_string columns
            return pa.table(
                {
                    "term": sub.column("term").cast(pa.large_string()),
                    "id": sub.column("id").cast(pa.int64()),
                }
            )

        return dict_build.sections.map_batches(fn, batch_format="pyarrow")

    subj_map = _space_map((SECTION_SHARED, SECTION_SUBJECT))
    obj_map = _space_map((SECTION_SHARED, SECTION_OBJECT))
    pred_map = _space_map((SECTION_PREDICATE,))
    # one join at a time: each materialize() is a barrier so only ONE
    # hash-join aggregator pool exists at any moment. Running the three
    # joins as a single streamed chain deadlocks Ray 2.49's streaming
    # executor at scale (observed at 188M rows: every JoinOperator holds
    # its aggregator CPUs with zero tasks while the driver spins at 100%).
    # The intermediates are int-id + remaining-string columns; they spill
    # to plasma rather than pinning the heap.
    ds = triples_ds.join(
        subj_map, join_type="inner", num_partitions=num_partitions,
        on=("subj",), right_on=("term",),
    ).rename_columns({"id": "s_id"}).materialize()
    ds = ds.join(
        pred_map, join_type="inner", num_partitions=num_partitions,
        on=("pred",), right_on=("term",),
    ).rename_columns({"id": "p_id"}).materialize()
    ds = ds.join(
        obj_map, join_type="inner", num_partitions=num_partitions,
        on=("obj",), right_on=("term",),
    ).rename_columns({"id": "o_id"})
    _tsch = triples_ds.schema()
    cols = ["s_id", "p_id", "o_id"] + (
        ["graph"] if _tsch is not None and "graph" in _tsch.names else []
    )
    return ds.select_columns(cols)


def encode_triples(
    triples_ds: rd.Dataset,
    dict_build: DictionaryBuild,
    use_join: Optional[bool] = None,
    concurrency: int = 4,
    graphs: Optional[list] = None,
    pack: Optional[PackSpec] = None,
) -> rd.Dataset:
    """String triples → ID triples.

    Output columns: ``(s_id, p_id, o_id, graph)`` by default; with a
    ``graphs`` list, ``(s_id, p_id, o_id, g_id)`` where ids use the
    narrowest integer dtype that fits the dictionary (``id_dtype_for``) and
    ``g_id`` indexes into ``graphs`` — the store path, where no string ever
    enters the sort shuffle.

    Strategy ladder:
    1. **fingerprint tasks** (default): uint64 term fingerprints → int hash
       index, ~30 ms per-process state, stateless fused tasks. Falls back if
       any ID space has a 64-bit collision (checked exactly, up front).
    2. **string-index actor pool**: exact string lookup; the per-actor index
       build is expensive (~1.7 s at 2M terms) so it must not scatter across
       the task worker pool. Requires a materialized input (livelock
       otherwise — see BroadcastEncoder).
    3. **shuffle join** above BROADCAST_LIMIT terms (the 10^12-doc path).
    """
    n_terms = sum(dict_build.counts.values())
    if use_join is None:
        use_join = n_terms > BROADCAST_LIMIT
    id_dtype = id_dtype_for(n_terms) if graphs is not None else pa.int64()
    if use_join and pack is not None:
        raise ValueError("pack requires the broadcast encoder (join emits 4 columns)")
    if use_join:
        ds = _join_encode(triples_ds, dict_build)
        if graphs is not None:
            def to_gid(batch: pa.Table) -> pa.Table:
                gcol, gname = _graph_col(batch, graphs)
                return pa.table(
                    {
                        "s_id": batch.column("s_id").cast(id_dtype),
                        "p_id": batch.column("p_id").cast(id_dtype),
                        "o_id": batch.column("o_id").cast(id_dtype),
                        gname: gcol,
                    }
                )

            ds = ds.map_batches(to_gid, batch_format="pyarrow")
        return ds
    batch_kw = dict(
        batch_format="pyarrow",
        batch_size=128 * 1024,
        zero_copy_batch=True,
    )
    sections_tbl = collect_sections_table(dict_build)
    fp_lk = fp_spaces_from_table(sections_tbl)
    if fp_lk is not None:
        # fingerprint tasks: the sorted-fp arrays are computed ONCE (driver,
        # one hash pass + three int argsorts) and broadcast; workers read
        # them zero-copy from the object store — no per-process rebuild, so
        # cold worker processes cost nothing and the stage fuses with its
        # upstream regardless of how many workers the session has
        lk_ref = ray.put(fp_lk)

        def encode_batch(batch: pa.Table) -> pa.Table:
            from de_ray.state.broadcast import get_broadcast

            fp_spaces = get_broadcast(lk_ref)
            out = _encode_with_fp(fp_spaces, batch, graphs, id_dtype)
            return _pack_table(out, pack) if pack is not None else out

        return triples_ds.map_batches(encode_batch, **batch_kw)
    maps_ref = ray.put(sections_tbl)
    if n_terms <= TASK_ENCODE_TERMS:
        # small dictionary: per-worker string index build is cheap enough
        # for stateless tasks
        def encode_batch(batch: pa.Table) -> pa.Table:
            from de_ray.state.broadcast import get_broadcast

            spaces = get_broadcast(maps_ref, transform=space_indexes_from_table)
            out = _encode_with(spaces, batch, graphs, id_dtype)
            return _pack_table(out, pack) if pack is not None else out

        return triples_ds.map_batches(encode_batch, **batch_kw)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # large dictionary with fp collision: ACTOR POOL — stateless tasks
    # scatter the expensive per-process string index build across every idle
    # worker (measured 1.7 s per process on a 2M-term dictionary; ~170 cold
    # inits = 300 s CPU). Fixed-size pool for instant ramp: SAFE ONLY
    # because the caller feeds a MATERIALIZED input (Input → actors → sort)
    # — a task stage upstream in the same graph starves behind the idle
    # actors and livelocks (observed with the canonicalize union upstream).
    pool = (max(2, cpus - 2), max(2, cpus - 2))
    return triples_ds.materialize().map_batches(
        BroadcastEncoder,
        fn_constructor_args=(maps_ref, graphs, id_dtype, pack),
        concurrency=pool,
        **batch_kw,
    )


def sort_spo(id_triples: rd.Dataset, keys=None) -> rd.Dataset:
    """Global SPO sort (O2) — the HDT triples order. ``keys`` may append
    tie-break columns (e.g. ``g_id``) without changing the S/P/O order."""
    return id_triples.sort(keys or ["s_id", "p_id", "o_id"])


def local_distinct(tbl: pa.Table, cols) -> pa.Table:
    """Per-block exact dedup combiner (all C++: pc.unique on a packed single
    key, group_by otherwise). Cuts sort-shuffle volume; the global pass
    after the sort removes the cross-block survivors."""
    import pyarrow.compute as pc

    if tbl.num_rows <= 1:
        return tbl
    cols = list(cols)
    if len(cols) == 1:
        c = cols[0]
        return pa.table({c: pc.unique(tbl.column(c))})
    return tbl.select(cols).group_by(cols).aggregate([])


def _id_triple_schema(id_dtype_name: str) -> pa.Schema:
    t = pa.int32() if id_dtype_name == "int32" else pa.int64()
    return pa.schema(
        [("s_id", t), ("p_id", t), ("o_id", t), ("g_id", pa.int32())]
    )


def pack_adjacency_block(tbl: pa.Table) -> pa.Table:
    """One sorted ID-triples block → one BitmapTriples segment row.

    Y = predicate stream with bitmap_y marking the last predicate of each
    subject; Z = object stream with bitmap_z marking the last object of each
    (subject, predicate) pair. Segments are per-partition: a subject run that
    spans two partitions yields two segments, recorded with their s_id range
    so readers can merge (partitioning assumption documented per SURVEY §2
    custom-operator rule).
    """
    s = tbl.column("s_id").to_numpy(zero_copy_only=False)
    p = tbl.column("p_id").to_numpy(zero_copy_only=False)
    o = tbl.column("o_id").to_numpy(zero_copy_only=False)
    n = len(s)
    if n == 0:
        return pa.table(
            {
                "s_min": pa.array([], pa.int64()),
                "s_max": pa.array([], pa.int64()),
                "n_triples": pa.array([], pa.int64()),
                "subjects": pa.array([], pa.large_list(pa.int64())),
                "y": pa.array([], pa.large_list(pa.int64())),
                "bitmap_y": pa.array([], pa.large_list(pa.bool_())),
                "z": pa.array([], pa.large_list(pa.int64())),
                "bitmap_z": pa.array([], pa.large_list(pa.bool_())),
            }
        )
    new_s = np.empty(n, dtype=bool)
    new_s[0] = True
    new_s[1:] = s[1:] != s[:-1]
    new_sp = np.empty(n, dtype=bool)
    new_sp[0] = True
    new_sp[1:] = new_s[1:] | (p[1:] != p[:-1])
    # Y: one predicate entry per distinct (s,p); bitmap_y True at last p of s
    y = p[new_sp]
    y_is_last = np.empty(len(y), dtype=bool)
    s_of_sp = s[new_sp]
    y_is_last[:-1] = s_of_sp[1:] != s_of_sp[:-1]
    y_is_last[-1] = True
    # Z: every object; bitmap_z True at last o of (s,p)
    z_is_last = np.empty(n, dtype=bool)
    z_is_last[:-1] = new_sp[1:]
    z_is_last[-1] = True
    subjects = np.unique(s)
    return pa.table(
        {
            "s_min": pa.array([int(s[0])], pa.int64()),
            "s_max": pa.array([int(s[-1])], pa.int64()),
            "n_triples": pa.array([n], pa.int64()),
            "subjects": pa.array([subjects.tolist()], pa.large_list(pa.int64())),
            "y": pa.array([y.tolist()], pa.large_list(pa.int64())),
            "bitmap_y": pa.array([y_is_last.tolist()], pa.large_list(pa.bool_())),
            "z": pa.array([o.tolist()], pa.large_list(pa.int64())),
            "bitmap_z": pa.array([z_is_last.tolist()], pa.large_list(pa.bool_())),
        }
    )


# ---------------------------------------------------------------------------
# fused finalize + write + adjacency (single pass per sorted block)
# ---------------------------------------------------------------------------


def _adjacency_table_from_arrays(s, p, o) -> pa.Table:
    """BitmapTriples segment row from sorted id arrays.

    Same layout as ``pack_adjacency_block`` but list columns are built
    zero-copy with ``LargeListArray.from_arrays`` — ``.tolist()`` on a
    multi-million-row block costs seconds of pure Python boxing."""
    n = len(s)
    if n == 0:
        return pa.table(
            {
                "s_min": pa.array([], pa.int64()),
                "s_max": pa.array([], pa.int64()),
                "n_triples": pa.array([], pa.int64()),
                "subjects": pa.array([], pa.large_list(pa.int64())),
                "y": pa.array([], pa.large_list(pa.int64())),
                "bitmap_y": pa.array([], pa.large_list(pa.bool_())),
                "z": pa.array([], pa.large_list(pa.int64())),
                "bitmap_z": pa.array([], pa.large_list(pa.bool_())),
            }
        )
    new_s = np.empty(n, dtype=bool)
    new_s[0] = True
    new_s[1:] = s[1:] != s[:-1]
    new_sp = np.empty(n, dtype=bool)
    new_sp[0] = True
    new_sp[1:] = new_s[1:] | (p[1:] != p[:-1])
    y = p[new_sp]
    s_of_sp = s[new_sp]
    y_is_last = np.empty(len(y), dtype=bool)
    y_is_last[:-1] = s_of_sp[1:] != s_of_sp[:-1]
    y_is_last[-1] = True
    z_is_last = np.empty(n, dtype=bool)
    z_is_last[:-1] = new_sp[1:]
    z_is_last[-1] = True
    subjects = s[new_s]  # s is sorted: run starts == distinct subjects

    def _ll(values: np.ndarray, typ) -> pa.LargeListArray:
        va = pa.array(values, typ)
        offs = pa.array(np.array([0, len(va)], dtype=np.int64), pa.int64())
        return pa.LargeListArray.from_arrays(offs, va)

    return pa.table(
        {
            "s_min": pa.array([int(s[0])], pa.int64()),
            "s_max": pa.array([int(s[-1])], pa.int64()),
            "n_triples": pa.array([n], pa.int64()),
            "subjects": _ll(subjects.astype(np.int64), pa.int64()),
            "y": _ll(y.astype(np.int64), pa.int64()),
            "bitmap_y": _ll(y_is_last, pa.bool_()),
            "z": _ll(o.astype(np.int64), pa.int64()),
            "bitmap_z": _ll(z_is_last, pa.bool_()),
        }
    )


@ray.remote
def _peek_block_keys(tbl: pa.Table, cols, pack):
    """ORIGINAL (first, last) sort key + row count of one block — O(1)
    scalar reads, no column materialization. Feeds the driver's
    boundary-dedup chain and the finalize slice planner."""
    n = tbl.num_rows
    if n == 0:
        return None, None, 0
    if pack is not None:
        c = tbl.column("spog")
        return (c[0].as_py(),), (c[n - 1].as_py(),), n
    first = tuple(tbl.column(c)[0].as_py() for c in cols)
    last = tuple(tbl.column(c)[n - 1].as_py() for c in cols)
    return first, last, n


@ray.remote
def _finalize_write_block_task(
    tbl: pa.Table,
    cols,
    pack,
    id_dtype_name,
    luts,
    n_graphs,
    drop_first,
    triples_path,
    adjacency_path,
    start=0,
    stop=None,
):
    """FUSED pass over rows ``[start, stop)`` of one pinned sorted block:
    adjacent dedup → unpack → per-graph stats → parquet write of this
    slice's triples part → BitmapTriples adjacency segment.

    Slicing keeps finalize parallelism tracking the CPU count instead of
    the sort's output block count/skew (the 2→8 scaling campaign measured
    finalize at 1.4–2.9× for 4× CPUs depending on block balance — the
    straggler wave, not the work, set the wall). Every slice task maps the
    SAME plasma block zero-copy and ``Table.slice``s its range, so no extra
    object-store copy exists. A slice starting mid-block decides its own
    first-row drop by comparing against row ``start-1`` of the same block;
    only slice 0 uses the driver's cross-block ``drop_first`` flag (from
    peeked ORIGINAL keys), so stats need no correction either way.

    ONE read of the slice; the unpacked table lives only in this worker's
    heap and goes straight to storage — it is never pinned in the object
    store and never re-streamed for a separate write/adjacency pass. The
    three-pass shape was the measured non-scaling memory-bandwidth floor
    at BOTH 4 and 16 CPUs (~12 s flat, BASELINE.md round-3)."""
    import os as _os
    import time as _time

    import pyarrow.parquet as pq

    _dbg = _os.environ.get("DE_RAY_FINALIZE_DEBUG")
    _t0 = _time.time()
    zeros = np.zeros(n_graphs, dtype=np.int64)
    if stop is None:
        stop = tbl.num_rows
    n = stop - start
    if n <= 0:
        return zeros, zeros, 0
    sl = tbl.slice(start, n)
    if pack is not None:
        k = sl.column("spog").to_numpy(zero_copy_only=False)
        keep = np.empty(n, dtype=bool)
        if start > 0:
            keep[0] = k[0] != tbl.column("spog")[start - 1].as_py()
        else:
            keep[0] = not drop_first
        keep[1:] = k[1:] != k[:-1]
        if not keep.all():
            k = k[keep]
        dt = np.int32 if id_dtype_name == "int32" else np.int64
        s = (k >> pack.s_shift).astype(dt)
        p = ((k >> pack.p_shift) & pack.p_mask).astype(dt)
        o = ((k >> pack.o_shift) & pack.o_mask).astype(dt)
        g = (k & pack.g_mask).astype(np.int32)
        out = pa.table(
            {
                "s_id": pa.array(s),
                "p_id": pa.array(p),
                "o_id": pa.array(o),
                "g_id": pa.array(g),
            }
        )
    else:
        keep = np.zeros(n, dtype=bool)
        if start > 0:
            prev = tuple(tbl.column(c)[start - 1].as_py() for c in cols)
            first = tuple(sl.column(c)[0].as_py() for c in cols)
            keep[0] = first != prev
        else:
            keep[0] = not drop_first
        for c in cols:
            a = sl.column(c).to_numpy(zero_copy_only=False)
            keep[1:] |= a[1:] != a[:-1]
        if not keep.all():
            sl = sl.filter(pa.array(keep))
        out = sl
        s = out.column("s_id").to_numpy(zero_copy_only=False)
        p = out.column("p_id").to_numpy(zero_copy_only=False)
        o = out.column("o_id").to_numpy(zero_copy_only=False)
        g = out.column("g_id").to_numpy(zero_copy_only=False)
    if out.num_rows == 0:  # n==1 block whose only row was a boundary dup
        return zeros, zeros, 0
    _t1 = _time.time()
    ls, lp, lo = luts
    nbytes = ls[s - 1].astype(np.int64) + lp[p - 1] + lo[o - 1] + 8
    n_g = np.bincount(g, minlength=n_graphs).astype(np.int64)
    b_g = np.zeros(n_graphs, dtype=np.int64)
    np.add.at(b_g, g, nbytes)
    _t2 = _time.time()
    pq.write_table(out, triples_path + ".tmp")
    _os.replace(triples_path + ".tmp", triples_path)
    _t3 = _time.time()
    if adjacency_path is not None:
        adj = _adjacency_table_from_arrays(s, p, o)
        pq.write_table(adj, adjacency_path + ".tmp")
        _os.replace(adjacency_path + ".tmp", adjacency_path)
    if _dbg:
        print(
            f"[finalize-fused] n={n} dedup+unpack={_t1 - _t0:.2f} "
            f"stats={_t2 - _t1:.2f} write={_t3 - _t2:.2f} "
            f"adj={_time.time() - _t3:.2f} total={_time.time() - _t0:.2f}",
            flush=True,
        )
    return n_g, b_g, out.num_rows


def finalize_write_sorted_blocks(
    sorted_ds: rd.Dataset,
    cols,
    pack,
    id_dtype,
    luts,
    n_graphs: int,
    out_dir: str,
    with_adjacency: bool = True,
):
    """Fused dedup + unpack + stats + WRITE of an ALREADY-SORTED ID-triples
    Dataset: one task per pinned sorted block writes ``triples/part-i`` and
    ``adjacency/part-i`` directly from the worker.

    Replaces the finalize → write_parquet → adjacency three-pass shape
    whose second and third passes re-streamed the full unpacked corpus
    through the node's memory bus (measured ~12 s wall at BOTH 4 and 16
    CPUs — a pure bandwidth floor). Boundary dedup chains each block's
    ORIGINAL (first, last) key from a cheap peek wave, so a duplicate run
    spanning whole blocks still keeps exactly one row.

    Returns ``(n_per_graph, bytes_per_graph, n_rows_total)``."""
    import os as _os
    import shutil as _shutil

    import pyarrow.parquet as pq

    cols = list(cols)
    id_dtype_name = "int32" if id_dtype == pa.int32() else "int64"
    triples_dir = _os.path.join(out_dir, "triples")
    adj_dir = _os.path.join(out_dir, "adjacency") if with_adjacency else None
    for d in (triples_dir, adj_dir):
        if d:
            _shutil.rmtree(d, ignore_errors=True)
            _os.makedirs(d, exist_ok=True)
    n_g_total = np.zeros(n_graphs, dtype=np.int64)
    b_g_total = np.zeros(n_graphs, dtype=np.int64)

    def _write_empty():
        pq.write_table(
            _id_triple_schema(id_dtype_name).empty_table(),
            _os.path.join(triples_dir, "part-00000.parquet"),
        )
        if adj_dir:
            pq.write_table(
                _adjacency_table_from_arrays(
                    np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
                ),
                _os.path.join(adj_dir, "part-00000.parquet"),
            )

    refs = sorted_ds.to_arrow_refs()
    if not refs:
        _write_empty()
        return n_g_total, b_g_total, 0
    # per-block tasks run on the node already holding the block (soft
    # affinity): without it, a peek/slice task spilled to another node
    # pulls the whole pinned block cross-node first — a full corpus copy
    # on a 4-node cluster, for a pass that is zero-copy when local
    from de_ray.state.locality import block_locations, node_affinity_opts

    locs = block_locations(refs)
    keys = ray.get(
        [
            _peek_block_keys.options(**node_affinity_opts(r, locs)).remote(
                r, cols, pack
            )
            for r in refs
        ]
    )
    drops = []
    prev_last = None
    for first, last, _n in keys:
        drops.append(first is not None and first == prev_last)
        if last is not None:
            prev_last = last
    luts_ref = ray.put(luts)
    # Slice each pinned sorted block into ~uniform row ranges so finalize
    # parallelism tracks the CPU count, not the sort's output block
    # count/skew (blocks-per-CPU imbalance was the measured straggler term
    # in the 2→8 campaign). Slice tasks map the SAME plasma block zero-copy
    # — no extra object-store pin; the floor keeps tiny stores at one task.
    total_rows_in = sum(n for _, _, n in keys)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    slice_rows = int(
        _os.environ.get("DE_RAY_FINALIZE_SLICE_ROWS", 0)
    ) or max(1_000_000, min(4_000_000, total_rows_in // max(1, 3 * cpus) + 1))
    tasks = []
    part = 0
    for i, r in enumerate(refs):
        n_i = keys[i][2]
        if n_i == 0:
            continue
        k_slices = -(-n_i // slice_rows)
        bounds = [n_i * j // k_slices for j in range(k_slices + 1)]
        aff = node_affinity_opts(refs[i], locs)
        for j in range(k_slices):
            tasks.append(
                _finalize_write_block_task.options(**aff).remote(
                    r,
                    cols,
                    pack,
                    id_dtype_name,
                    luts_ref,
                    n_graphs,
                    drops[i] if j == 0 else False,
                    _os.path.join(triples_dir, f"part-{part:05d}.parquet"),
                    _os.path.join(adj_dir, f"part-{part:05d}.parquet")
                    if adj_dir
                    else None,
                    bounds[j],
                    bounds[j + 1],
                )
            )
            part += 1
    results = ray.get(tasks)
    total_rows = 0
    for n_g, b_g, nr in results:
        n_g_total += n_g
        b_g_total += b_g
        total_rows += int(nr)
    if total_rows == 0:
        _write_empty()
    return n_g_total, b_g_total, total_rows
