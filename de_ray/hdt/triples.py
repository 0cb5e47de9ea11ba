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

from typing import Dict, Optional

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

# above this many dictionary entries, encode via shuffle join instead of broadcast
BROADCAST_LIMIT = 5_000_000

# at or below this many dictionary entries, encode with stateless tasks
# (per-worker index build is cheap); above it, an actor pool
TASK_ENCODE_TERMS = 1_000_000

ID_TRIPLE_SCHEMA = pa.schema(
    [
        ("s_id", pa.int64()),
        ("p_id", pa.int64()),
        ("o_id", pa.int64()),
        ("graph", pa.large_string()),
    ]
)


def collect_sections_table(dict_build: DictionaryBuild) -> pa.Table:
    """Concatenate the sections Dataset into one Arrow table (term, section,
    id) — the broadcast form. Arrow stays zero-copy in the object store;
    workers derive their lookup dicts from it once per process."""
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


def id_maps_from_table(tbl: pa.Table) -> Dict[str, Dict[str, int]]:
    """Arrow sections table → the three {term → id} dicts (driver-side uses)."""
    arrays = space_arrays_from_table(tbl)
    return {
        space: dict(zip(terms.to_pylist(), ids.to_pylist()))
        for space, (terms, ids) in arrays.items()
    }


def collect_id_maps(dict_build: DictionaryBuild) -> Dict[str, Dict[str, int]]:
    return id_maps_from_table(collect_sections_table(dict_build))


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

    def __init__(self, maps_ref):
        from de_ray.state.broadcast import get_broadcast

        self.spaces = get_broadcast(maps_ref, transform=space_indexes_from_table)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _encode_with(self.spaces, batch)


def _encode_with(spaces, batch: pa.Table) -> pa.Table:
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
        lut = pa.array(ids[pos], pa.int64())
        return pc.take(lut, enc.indices)

    n = len(batch)
    graph = (
        batch.column("graph")
        if "graph" in batch.schema.names
        else pa.array([""] * n, pa.large_string())
    )
    return pa.table(
        {
            "s_id": encode_col(batch.column("subj"), "subj"),
            "p_id": encode_col(batch.column("pred"), "pred"),
            "o_id": encode_col(batch.column("obj"), "obj"),
            "graph": graph,
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
    ds = triples_ds.join(
        subj_map, join_type="inner", num_partitions=num_partitions,
        on=("subj",), right_on=("term",),
    ).rename_columns({"id": "s_id"})
    ds = ds.join(
        pred_map, join_type="inner", num_partitions=num_partitions,
        on=("pred",), right_on=("term",),
    ).rename_columns({"id": "p_id"})
    ds = ds.join(
        obj_map, join_type="inner", num_partitions=num_partitions,
        on=("obj",), right_on=("term",),
    ).rename_columns({"id": "o_id"})
    cols = ["s_id", "p_id", "o_id"] + (["graph"] if "graph" in triples_ds.schema().names else [])
    return ds.select_columns(cols)


def encode_triples(
    triples_ds: rd.Dataset,
    dict_build: DictionaryBuild,
    use_join: Optional[bool] = None,
    concurrency: int = 4,
) -> rd.Dataset:
    """String triples → ID triples (s_id, p_id, o_id, graph)."""
    if use_join is None:
        n_terms = sum(dict_build.counts.values())
        use_join = n_terms > BROADCAST_LIMIT
    if use_join:
        return _join_encode(triples_ds, dict_build)
    n_terms = sum(dict_build.counts.values())
    maps_ref = ray.put(collect_sections_table(dict_build))
    if n_terms <= TASK_ENCODE_TERMS:
        # small dictionary: per-worker index build is cheap — stateless
        # tasks reuse the warm worker pool with zero actor-spawn ramp

        def encode_batch(batch: pa.Table) -> pa.Table:
            from de_ray.state.broadcast import get_broadcast

            spaces = get_broadcast(maps_ref, transform=space_indexes_from_table)
            return _encode_with(spaces, batch)

        return triples_ds.map_batches(
            encode_batch,
            batch_format="pyarrow",
            batch_size=128 * 1024,
            zero_copy_batch=True,
        )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # large dictionary: ACTOR POOL — stateless tasks scatter the expensive
    # per-process index build across every idle worker (measured 1.7 s per
    # process on a 2M-term dictionary; ~170 cold inits = 300 s CPU).
    # Fixed-size pool for instant ramp: SAFE ONLY because the caller feeds
    # a MATERIALIZED input (Input → actors → sort) — a task stage upstream
    # in the same graph starves behind the idle actors and livelocks
    # (observed with the canonicalize union as upstream).
    pool = (max(2, cpus - 2), max(2, cpus - 2))
    return triples_ds.map_batches(
        BroadcastEncoder,
        fn_constructor_args=(maps_ref,),
        batch_format="pyarrow",
        batch_size=128 * 1024,
        zero_copy_batch=True,
        concurrency=pool,
    )


def sort_spo(id_triples: rd.Dataset) -> rd.Dataset:
    """Global SPO sort (O2) — the HDT triples order."""
    return id_triples.sort(["s_id", "p_id", "o_id"])


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
