"""Distributed HDT-style store catenation (merge without re-extraction).

Incremental KG construction: a 10^12-document corpus arrives in crawls;
rebuilding the whole store per crawl is a full re-encode of everything seen
so far. Merging two FINISHED stores instead only touches dictionary-sized
string data plus one integer re-sort of the triples — the approach published
as HDTCat (Diefenbach & Giménez-García, "HDTCat: let's make HDT generation
scale", ISWC 2020), re-expressed over Ray Data:

1. **Merged dictionary from the input dictionaries** — each store's
   ``dictionary/`` parquet is mapped to (term, role-flag) rows (the same
   partial shape the normal build's roles pass emits) and the standard
   size-adaptive dictionary final (driver polars below the limit,
   distributed bucket-merge above — ``de_ray/hdt/dictionary.py``) produces
   the merged four-section ranking. Only dictionary-scale strings move;
   the triples' strings never re-enter the pipeline.
2. **Integer ID remap per input store** — old→new id maps per space
   (subject/predicate/object) come from joining each input dictionary with
   the merged sections ON TERM (dictionary-scale work). Below
   ``LUT_LIMIT`` total terms the three maps ship once via ``ray.put`` and
   each batch remaps with one vectorized ``np.take``; above it the remap
   runs as three size-adaptive distributed equi-joins (the 10^12-doc
   path — no driver-side state).
3. **Union → SPO sort → fused finalize** — the remapped integer triples
   from all inputs union into one Dataset and reuse the exact back half of
   ``write_store``: packed single-int64 sort key when the bit widths fit,
   local-distinct combiner, distributed sort, and the fused
   dedup+stats+write finalize pass. Cross-store duplicate (s,p,o,g) rows
   are adjacent after the sort and collapse to one, so merging a store
   with itself is idempotent.

The reference's single-file writer is ``src/create.rs:43-50``; it has no
merge (a second ``create`` re-parses everything), so this operator is an
extension the scale regime requires.
"""

from __future__ import annotations

import json
import os
import time as _time
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from de_ray.hdt.dictionary import (
    DRIVER_FINAL_LIMIT,
    SECTION_OBJECT,
    SECTION_PREDICATE,
    SECTION_SHARED,
    SECTION_SUBJECT,
    DictionaryBuild,
    _distributed_final,
    _driver_final_dictionary,
)
from de_ray.hdt.header import build_header
from de_ray.hdt.store import Store, _dir_size, _length_luts, _write_front_coded
from de_ray.hdt.triples import (
    _pack_table,
    finalize_write_sorted_blocks,
    id_dtype_for,
    local_distinct,
    pack_spec_for,
    sort_spo,
)

# total merged terms up to which the old→new maps broadcast as numpy LUTs
# (3 arrays × int64 × terms ≈ 24 B/term → 50M terms ≈ 1.2 GB in plasma,
# shared node-wide); above it the remap joins run distributed
LUT_LIMIT = 50_000_000


def dictionary_from_roles(
    roles: rd.Dataset, driver_final_limit: int = DRIVER_FINAL_LIMIT
) -> DictionaryBuild:
    """Size-adaptive dictionary final over an explicit role-partials
    Dataset (term, is_subj, is_pred, is_obj) — the entry the store merge
    uses (the normal build derives roles from raw triples instead)."""
    t0 = _time.time()
    roles = roles.materialize()
    n = roles.count()
    timings = {"roles_pass": 0.0, "role_rows": n}
    if n <= driver_final_limit:
        t1 = _time.time()
        out = _driver_final_dictionary(roles)
        timings["driver_final"] = round(_time.time() - t1, 2)
        out.timings = timings
        return out
    return _distributed_final(roles, timings, t0)


def _sections_to_roles(tbl: pa.Table) -> pa.Table:
    """(term, section) dictionary rows → (term, is_subj, is_pred, is_obj)
    role partials: shared ⇒ subject+object."""
    sec = tbl.column("section").to_numpy(zero_copy_only=False)
    term = tbl.column("term").cast(pa.large_string())
    is_subj = ((sec == SECTION_SHARED) | (sec == SECTION_SUBJECT)).astype(np.int32)
    is_obj = ((sec == SECTION_SHARED) | (sec == SECTION_OBJECT)).astype(np.int32)
    is_pred = (sec == SECTION_PREDICATE).astype(np.int32)
    return pa.table(
        {
            "term": term,
            "is_subj": pa.array(is_subj),
            "is_pred": pa.array(is_pred),
            "is_obj": pa.array(is_obj),
        }
    )


def _space_frames(dict_tbl: pa.Table):
    """Dictionary (term, section, id) → three pandas frames
    (term → id) for the subject / predicate / object spaces."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "term": dict_tbl.column("term").to_pandas(),
            "section": dict_tbl.column("section").to_numpy(zero_copy_only=False),
            "id": dict_tbl.column("id").to_numpy(zero_copy_only=False),
        }
    )
    shared = df["section"] == SECTION_SHARED
    return {
        "s": df[shared | (df["section"] == SECTION_SUBJECT)][["term", "id"]],
        "p": df[df["section"] == SECTION_PREDICATE][["term", "id"]],
        "o": df[shared | (df["section"] == SECTION_OBJECT)][["term", "id"]],
    }


def _remap_luts(old_dict: pa.Table, merged_frames) -> dict:
    """Per-space numpy LUTs: position old_id → new_id (0 unused)."""
    old_frames = _space_frames(old_dict)
    luts = {}
    for sp in ("s", "p", "o"):
        old = old_frames[sp]
        joined = old.merge(
            merged_frames[sp], on="term", how="left", suffixes=("_old", "_new")
        )
        if joined["id_new"].isna().any():
            missing = joined[joined["id_new"].isna()]["term"].iloc[0]
            raise RuntimeError(
                f"store merge: term {missing!r} missing from merged dictionary "
                f"space {sp!r} — input dictionary inconsistent"
            )
        size = int(joined["id_old"].max()) + 1 if len(joined) else 1
        lut = np.zeros(size, dtype=np.int64)
        lut[joined["id_old"].to_numpy(dtype=np.int64)] = joined["id_new"].to_numpy(
            dtype=np.int64
        )
        luts[sp] = lut
    return luts


def _read_id_triples(store_path: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(store_path, "triples"))


def _remap_ids_distributed(
    tri: rd.Dataset,
    old_sections: rd.Dataset,
    new_sections: rd.Dataset,
    broadcast_limit: int = 2_000_000,
) -> rd.Dataset:
    """Remap a triples Dataset's s/p/o ids from ``old_sections``'s ID space
    into ``new_sections``'s via three size-adaptive distributed equi-joins
    on the term key — the no-driver-state path shared by ``merge_stores``
    and ``diff_stores`` above their LUT limits. INNER joins: a triple whose
    term is absent from the target dictionary drops out (only possible in
    the diff direction; merge dictionaries are supersets by construction).

    The triples' id columns are widened to int64 up front: stores narrow
    them to int32 (``id_dtype_for``) but the dictionary 'id' column is
    int64, and Ray's native hash join (the above-``broadcast_limit``
    regime this path exists for) rejects mismatched key dtypes."""
    from de_ray.dataops.joins import equi_join

    def widen(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: t.column(c).cast(pa.int64()) if c != "g_id" else t.column(c)
                for c in ("s_id", "p_id", "o_id", "g_id")
            }
        )

    tri = tri.map_batches(widen, batch_format="pyarrow")
    for col, secs in (
        ("s_id", (SECTION_SHARED, SECTION_SUBJECT)),
        ("p_id", (SECTION_PREDICATE,)),
        ("o_id", (SECTION_SHARED, SECTION_OBJECT)),
    ):

        def space_map(t_: pa.Table, _secs=secs) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(
                t_.column("section"),
                value_set=pa.array(list(_secs), t_.column("section").type),
            )
            f = t_.filter(mask)
            return pa.table({"term": f.column("term"), "id": f.column("id")})

        old_map = old_sections.map_batches(space_map, batch_format="pyarrow")
        new_map = new_sections.map_batches(space_map, batch_format="pyarrow").map_batches(
            lambda t_: t_.rename_columns(["term", "new_id"]),
            batch_format="pyarrow",
        )
        id_map = equi_join(
            old_map, new_map, on_left="term", on_right="term",
            broadcast_limit=broadcast_limit,
        ).map_batches(
            lambda t_, _c=col: pa.table(
                {_c: t_.column("id"), f"new_{_c}": t_.column("new_id")}
            ),
            batch_format="pyarrow",
        )
        tri = equi_join(
            tri, id_map, on_left=col, on_right=col, broadcast_limit=broadcast_limit
        ).map_batches(
            lambda t_, _c=col: pa.table(
                {
                    c: t_.column(f"new_{c}" if c == _c else c)
                    for c in ("s_id", "p_id", "o_id", "g_id")
                }
            ),
            batch_format="pyarrow",
        )
    return tri


def _pack_from_header(h: dict):
    """PackSpec for a FINISHED store's ID widths (from its header) — the
    diff packs both sides' keys into one int64 so the anti-join key is a
    single integer column. None when the combined widths exceed 63 bits."""
    from de_ray.hdt.triples import PackSpec

    sb = int(h.get("void:distinctSubjects", 0)).bit_length()
    pb = int(h.get("void:properties", 0)).bit_length()
    ob = int(h.get("void:distinctObjects", 0)).bit_length()
    gb = max(0, (len(h.get("graph_list", [])) - 1).bit_length())
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


def diff_stores(a_dir: str, b_dir: str, lut_limit: int = LUT_LIMIT) -> rd.Dataset:
    """Triples of store A absent from store B, decoded — the snapshot
    delta between two crawls' finished stores, computed WITHOUT decoding
    either store's full triple set to strings.

    B's integer triples are remapped into A's ID space through a per-space
    (term → a_id) join over the two dictionaries (dictionary-scale work;
    B terms absent from A's dictionary cannot match any A row and drop
    out). Both sides then pack (s,p,o,g) into one int64 and a
    size-adaptive distributed anti-join (broadcast key set below the
    limit, hash-bucketed above — ``dataops/joins.py::anti_join``) keeps
    the A rows with no B counterpart; only the surviving delta decodes.
    """
    import pyarrow.compute as pc

    from de_ray.dataops.joins import anti_join

    A, B = Store(a_dir), Store(b_dir)
    pack = _pack_from_header(A.header)
    a_graphs = {g: i for i, g in enumerate(A.header["graph_list"])}
    g_lut = np.array(
        [a_graphs.get(g, -1) for g in B.header["graph_list"]], dtype=np.int64
    )

    def pack_cols(tbl: pa.Table) -> pa.Table:
        if pack is not None:
            return _pack_table(tbl, pack)
        # >63-bit fallback: composite string key (rare, wide-ID regime)
        key = pc.binary_join_element_wise(
            *(pc.cast(tbl.column(c), pa.large_string()) for c in ("s_id", "p_id", "o_id", "g_id")),
            ":",
        )
        return tbl.append_column("spog", key)

    n_terms_total = A._total_terms() + B._total_terms()
    if n_terms_total <= lut_limit:
        # per-space LUT: b_id → a_id, 0 = term not in A (row can't match)
        a_frames = _space_frames(
            pq.read_table(
                os.path.join(a_dir, "dictionary"), columns=["term", "section", "id"]
            )
        )
        b_frames = _space_frames(
            pq.read_table(
                os.path.join(b_dir, "dictionary"), columns=["term", "section", "id"]
            )
        )
        luts = {}
        for sp in ("s", "p", "o"):
            j = b_frames[sp].merge(
                a_frames[sp], on="term", how="left", suffixes=("_b", "_a")
            )
            size = int(j["id_b"].max()) + 1 if len(j) else 1
            lut = np.zeros(size, dtype=np.int64)
            hit = j["id_a"].notna()
            lut[j["id_b"][hit].to_numpy(dtype=np.int64)] = j["id_a"][hit].to_numpy(
                dtype=np.int64
            )
            luts[sp] = lut
        ref = ray.put((luts["s"], luts["p"], luts["o"], g_lut))

        def remap_b(tbl: pa.Table) -> pa.Table:
            ls, lp, lo, lg = ray.get(ref)
            s = ls[tbl.column("s_id").to_numpy(zero_copy_only=False)]
            p = lp[tbl.column("p_id").to_numpy(zero_copy_only=False)]
            o = lo[tbl.column("o_id").to_numpy(zero_copy_only=False)]
            g = lg[tbl.column("g_id").to_numpy(zero_copy_only=False)]
            keep = (s > 0) & (p > 0) & (o > 0) & (g >= 0)
            out = pa.table(
                {
                    "s_id": pa.array(s[keep]),
                    "p_id": pa.array(p[keep]),
                    "o_id": pa.array(o[keep]),
                    "g_id": pa.array(g[keep]),
                }
            )
            return pack_cols(out)

        b_keys = _read_id_triples(b_dir).map_batches(remap_b, batch_format="pyarrow")
    else:
        # dictionaries too large for driver frames / a broadcast LUT:
        # shared distributed remap helper (inner joins drop B rows whose
        # term is absent from A — those can never match an A triple)
        b_ids = _remap_ids_distributed(
            _read_id_triples(b_dir),
            rd.read_parquet(
                os.path.join(b_dir, "dictionary"), columns=["term", "section", "id"]
            ),
            rd.read_parquet(
                os.path.join(a_dir, "dictionary"), columns=["term", "section", "id"]
            ),
        )

        def remap_g_pack(tbl: pa.Table) -> pa.Table:
            g = g_lut[tbl.column("g_id").to_numpy(zero_copy_only=False)]
            keep = g >= 0
            out = pa.table(
                {
                    "s_id": tbl.column("s_id").filter(pa.array(keep)),
                    "p_id": tbl.column("p_id").filter(pa.array(keep)),
                    "o_id": tbl.column("o_id").filter(pa.array(keep)),
                    "g_id": pa.array(g[keep]),
                }
            )
            return pack_cols(out)

        b_keys = b_ids.map_batches(remap_g_pack, batch_format="pyarrow")

    a_keys = _read_id_triples(a_dir).map_batches(
        lambda t: pack_cols(
            pa.table({c: t.column(c) for c in ("s_id", "p_id", "o_id", "g_id")})
        ),
        batch_format="pyarrow",
    )
    if pack is not None:
        # packed path: spog is the only column; carry it through the anti
        # join then unpack back to ids for the decode
        survivors = anti_join(a_keys, b_keys, on_left="spog", on_right="spog")

        def unpack(t: pa.Table) -> pa.Table:
            k = t.column("spog").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "s_id": pa.array(k >> pack.s_shift),
                    "p_id": pa.array((k >> pack.p_shift) & pack.p_mask),
                    "o_id": pa.array((k >> pack.o_shift) & pack.o_mask),
                    "g_id": pa.array((k & pack.g_mask).astype(np.int32)),
                }
            )

        ids = survivors.map_batches(unpack, batch_format="pyarrow")
    else:
        ids = anti_join(a_keys, b_keys, on_left="spog", on_right="spog").drop_columns(
            ["spog"]
        )
    return A.decode(ids)


def merge_stores(
    in_dirs: List[str],
    out_dir: str,
    with_adjacency: bool = True,
    with_front_coded: bool = True,
    lut_limit: int = LUT_LIMIT,
) -> dict:
    """Merge ≥2 finished store directories into a new store at ``out_dir``.

    Returns the merged header. Idempotent under duplicate inputs (the
    fused finalize's adjacent-equality dedup collapses identical
    (s,p,o,g) rows)."""
    if len(in_dirs) < 2:
        raise ValueError("merge_stores needs at least two input stores")
    stores = [Store(d) for d in in_dirs]
    timings = {}
    t_all = _time.time()

    # ---- 1. merged dictionary from the input dictionaries ----
    t = _time.time()
    role_parts = [
        rd.read_parquet(
            os.path.join(d, "dictionary"), columns=["term", "section"]
        ).map_batches(_sections_to_roles, batch_format="pyarrow")
        for d in in_dirs
    ]
    roles = role_parts[0]
    for part in role_parts[1:]:
        roles = roles.union(part)
    dict_build = dictionary_from_roles(roles)
    timings["dictionary"] = round(_time.time() - t, 2)

    # merged graph list + per-store g_id remap (graphs are few)
    graphs = sorted({g for st in stores for g in st.header["graph_list"]})
    g_index = {g: i for i, g in enumerate(graphs)}

    # ---- 2. per-store integer remap ----
    t = _time.time()
    n_terms = sum(dict_build.counts.values())
    pack = pack_spec_for(dict_build, graphs)
    remapped: List[rd.Dataset] = []
    if n_terms <= lut_limit:
        # merged per-space (term → id) frames once, on the driver
        if dict_build.local_tbl is not None:
            merged_tbl = dict_build.local_tbl
        else:
            merged_tbl = pa.concat_tables(
                [
                    t_ if isinstance(t_, pa.Table) else pa.Table.from_batches([t_])
                    for t_ in ray.get(dict_build.sections.to_arrow_refs())
                ]
            )
        merged_frames = _space_frames(merged_tbl.select(["term", "section", "id"]))
        for st in stores:
            luts = _remap_luts(
                pq.read_table(
                    os.path.join(st.path, "dictionary"),
                    columns=["term", "section", "id"],
                ),
                merged_frames,
            )
            g_lut = np.array(
                [g_index[g] for g in st.header["graph_list"]], dtype=np.int64
            )
            ref = ray.put((luts["s"], luts["p"], luts["o"], g_lut))

            def remap(tbl: pa.Table, _ref=ref, _pack=pack) -> pa.Table:
                ls, lp, lo, lg = ray.get(_ref)
                out = pa.table(
                    {
                        "s_id": pa.array(
                            ls[tbl.column("s_id").to_numpy(zero_copy_only=False)]
                        ),
                        "p_id": pa.array(
                            lp[tbl.column("p_id").to_numpy(zero_copy_only=False)]
                        ),
                        "o_id": pa.array(
                            lo[tbl.column("o_id").to_numpy(zero_copy_only=False)]
                        ),
                        "g_id": pa.array(
                            lg[tbl.column("g_id").to_numpy(zero_copy_only=False)]
                        ),
                    }
                )
                return _pack_table(out, _pack) if _pack is not None else out

            remapped.append(
                _read_id_triples(st.path).map_batches(
                    remap, batch_format="pyarrow", zero_copy_batch=True
                )
            )
    else:
        # 10^12-doc path: shared distributed remap helper (broadcast below
        # the joiner's own limit, hash join above); no driver-side
        # dictionary state
        merged_sections = dict_build.sections
        for st in stores:
            tri = _remap_ids_distributed(
                _read_id_triples(st.path),
                rd.read_parquet(
                    os.path.join(st.path, "dictionary"),
                    columns=["term", "section", "id"],
                ),
                merged_sections,
            )
            g_lut = np.array(
                [g_index[g] for g in st.header["graph_list"]], dtype=np.int64
            )

            def remap_g(tbl: pa.Table, _lg=g_lut, _pack=pack) -> pa.Table:
                out = pa.table(
                    {
                        "s_id": tbl.column("s_id"),
                        "p_id": tbl.column("p_id"),
                        "o_id": tbl.column("o_id"),
                        "g_id": pa.array(
                            _lg[tbl.column("g_id").to_numpy(zero_copy_only=False)]
                        ),
                    }
                )
                return _pack_table(out, _pack) if _pack is not None else out

            remapped.append(tri.map_batches(remap_g, batch_format="pyarrow"))

    id_ds = remapped[0]
    for d in remapped[1:]:
        id_ds = id_ds.union(d)
    key_cols = ["spog"] if pack is not None else ["s_id", "p_id", "o_id", "g_id"]
    id_ds = id_ds.map_batches(
        lambda t_, _c=tuple(key_cols): local_distinct(t_, _c),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    timings["remap"] = round(_time.time() - t, 2)

    # ---- 3. sort + fused finalize (write_store back half) ----
    os.makedirs(out_dir, exist_ok=True)
    t = _time.time()
    # wipe stale copies: write_parquet appends unique-named files, so a
    # re-run into the same out_dir would double the dictionary rows
    import shutil

    for sub in ("dictionary", "front_coded"):
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
    dict_build.sections.write_parquet(os.path.join(out_dir, "dictionary"))
    if with_front_coded:
        _write_front_coded(dict_build, os.path.join(out_dir, "front_coded"))
    luts = _length_luts(dict_build)
    timings["dictionary_write"] = round(_time.time() - t, 2)

    t = _time.time()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    sorted_ds = sort_spo(id_ds.repartition(cpus), keys=key_cols).materialize()
    n_g, b_g, _n_rows = finalize_write_sorted_blocks(
        sorted_ds,
        key_cols,
        pack,
        id_dtype_for(n_terms),
        luts,
        len(graphs),
        out_dir,
        with_adjacency=with_adjacency,
    )
    timings["sort_finalize"] = round(_time.time() - t, 2)
    per_graph = {g: int(n) for g, n in zip(graphs, n_g) if n}
    header = build_header(dict_build, sum(per_graph.values()), per_graph, int(b_g.sum()))
    header["graph_list"] = graphs
    header["hdtSize"] = _dir_size(out_dir)
    timings["total"] = round(_time.time() - t_all, 2)
    header["timings"] = timings
    with open(os.path.join(out_dir, "header.json"), "w") as f:
        json.dump(header, f, indent=1, sort_keys=True)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return header
