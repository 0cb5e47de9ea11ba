"""Flagship pipeline: Common-Crawl-style webtext → HDT-style knowledge graph.

    read_parquet(webtext)                       # S7, column-pruned, sharded
      → extract_text_stage                      # M6, html dropped in-stage
      → extract_triples_stage                   # M7 batched exploder
      → link_entities_stage                     # A3, ray.put-broadcast alias dict
      (one fused task chain, checkpointed per shard group as "linked")
      → write_store                             # O1/O2/K1/G1: dictionary,
        fingerprint-encode, exact dedup on int ID-triples (D5, no string
        shuffle), SPO sort, adjacency, header

The per-record map stages run as STATELESS TASKS with per-process state
(compiled regexes / broadcast alias dict via de_ray.state.broadcast) so
Ray fuses read→extract→triples→link into one operator; the explicit
actor-pool variants remain available via ``compute="actors"`` for
heavyweight extractors/linkers whose init cost matters.

Every stage is checkpointed (parquet + _SUCCESS + lineage row); sharded
input checkpoints per shard GROUP, so a killed run resumes mid-stage at
the first unfinished group (north-rule resumability). The store build is
checkpointed by its own ``_SUCCESS``.

The per-stage metrics in the returned summary feed ``bench.py``.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import ray.data as rd

from de_ray.hdt.store import Store, write_store
from de_ray.stages.canonicalize import canonicalize_stage
from de_ray.stages.extract import extract_text_stage
from de_ray.stages.link import link_entities_stage
from de_ray.stages.triples import extract_triples_stage
from de_ray.state.checkpoint import CheckpointedRun

# fused-chain read granularity: docs per read block (≈0.4 s of
# extract+triples+link compute per task — big enough to amortize task
# dispatch, small enough to load-balance any cluster width)
DOCS_PER_READ_BLOCK = 12_500


def run_kg_pipeline(
    webtext_path: str,
    out_root: str,
    graph: str = "file:///webtext",
    extract_concurrency=None,
    link_concurrency=None,
    resume: bool = True,
    build_store: bool = True,
    extract_group_size: int = 32,
) -> dict:
    """Run the full pipeline; returns a summary with per-stage metrics."""
    t_start = time.time()
    if extract_concurrency is None or link_concurrency is None:
        # size the actor pools to the session: min high enough that short
        # stages reach full width immediately, a few CPUs left for reads
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        default_pool = (max(1, cpus - 4), max(2, cpus))
        extract_concurrency = extract_concurrency or default_pool
        link_concurrency = link_concurrency or default_pool
    if not resume and os.path.exists(out_root):
        import shutil

        shutil.rmtree(out_root)
    run = CheckpointedRun(out_root)

    cols = ["url", "warc_ts", "html", "lang"]
    # dictionary role partials are side-written DURING the fused chain
    # (roles_tap_stage): write_store then skips its own roles pass — one
    # full-corpus re-read less, and the roles compute lands in the chain's
    # scheduling gaps instead of serializing after it (BASELINE.md round-3
    # scaling: the wide child's idle cores absorb it, the packed narrow
    # child pays it either way). Partials are keyed per GROUP by input
    # fingerprint so a resumed run can verify coverage: a group whose
    # checkpoint predates the tap (older writer) has no subdir, and the
    # store build then falls back to its full roles pass.
    from de_ray.state.checkpoint import input_fingerprint, shard_groups

    roles_root = os.path.join(out_root, "roles_tap") if build_store else None

    def _fused(files) -> rd.Dataset:
        # ONE fused task chain: read → extract → triples → link (→ roles
        # tap). No intermediate parquet of extracted text — the text column
        # is consumed by the triple extractor in the same pass it is
        # produced (one full-corpus write+read less per run).
        # Read blocks sized to the DATA, not the file layout: one fused
        # task per ~DOCS_PER_READ_BLOCK docs (≈0.4 s of chain compute).
        # Without this the chain runs at file-count granularity — 5 files
        # meant 2× the chain wall on 32 CPUs — and the block layout is
        # identical at every cluster width (clean N-vs-4N comparisons;
        # floored at the CPU count so tiny corpora still use the session,
        # capped at 256×CPUs so a 10^12-doc group can't explode the plan).
        import pyarrow.parquet as _pq
        import ray as _ray

        flist = list(files) if isinstance(files, (list, tuple)) else [files]
        n_docs_group = sum(_pq.read_metadata(f).num_rows for f in flist)
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        nb = max(
            len(flist),
            cpus,
            min(-(-n_docs_group // DOCS_PER_READ_BLOCK), 256 * cpus),
        )
        read_kw = {"override_num_blocks": nb}
        out = link_entities_stage(
            extract_triples_stage(
                extract_text_stage(
                    rd.read_parquet(files, columns=cols, **read_kw),
                    concurrency=extract_concurrency,
                ),
                subject_col="url",
                graph=graph,
            ),
            concurrency=link_concurrency,
        )
        if roles_root is not None:
            from de_ray.hdt.dictionary import roles_tap_stage

            out = roles_tap_stage(
                out, os.path.join(roles_root, input_fingerprint(files))
            )
        return out

    if os.path.isdir(webtext_path):
        # sharded crawl input → shard-group checkpoints: the WHOLE map chain
        # is per-group resumable (a killed run restarts at the first
        # unfinished group, north rule)
        shards = [
            os.path.join(webtext_path, f)
            for f in os.listdir(webtext_path)
            if f.endswith(".parquet")
        ]
        groups = shard_groups(shards, extract_group_size)
        linked = run.sharded_stage(
            "linked", shards, _fused, group_size=extract_group_size
        )
    else:
        groups = [webtext_path]
        linked = run.stage("linked", lambda: _fused(webtext_path), inputs=webtext_path)

    # roles-tap coverage check: the store may skip its roles pass only if
    # EVERY current group has tap partials (exactly these subdirs — stale
    # fingerprints from changed inputs are thereby excluded)
    roles_dirs = None
    if roles_root is not None:
        roles_dirs = [
            os.path.join(roles_root, input_fingerprint(g)) for g in groups
        ]
        if not all(
            os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))
            for d in roles_dirs
        ):
            roles_dirs = None  # a group ran without the tap — full pass

    store_dir = os.path.join(out_root, "graph")
    header = None
    if build_store:
        if not (resume and os.path.exists(os.path.join(store_dir, "_SUCCESS"))):
            t0 = time.time()
            # Re-read the checkpoint with the store's sort width as the
            # block count: the encode tasks then emit exactly one block per
            # sort partition and write_store skips its pre-sort repartition
            # (one AllToAll barrier less). Width = one block per CPU,
            # floored so no block exceeds ~128 MB of int sort rows.
            import pyarrow.parquet as _pq
            import ray as _ray

            lk_files = linked.input_files()
            lk_rows = sum(_pq.read_metadata(f).num_rows for f in lk_files)
            cpus = int(_ray.cluster_resources().get("CPU", 8))
            n_parts = max(cpus, lk_rows * 17 // (128 << 20) + 1)
            linked_store = rd.read_parquet(lk_files, override_num_blocks=n_parts)
            # linked is a checkpoint parquet read — skip the input pin, the
            # store consumers re-read it in parallel instead (exact dedup
            # happens inside write_store, after the SPO sort)
            header = write_store(
                linked_store,
                store_dir,
                materialize_input=False,
                graphs=[graph],  # the pipeline writes exactly one named graph
                roles_dir=roles_dirs,
                input_coalesced=True,
            )
            run.record(
                "graph", shard="*", rows=header["void:triples"], wall_sec=time.time() - t0
            )
        else:
            header = Store(store_dir).header

    wall = time.time() - t_start
    n_triples = header["void:triples"] if header else canonicalize_stage(linked).count()
    import pyarrow.parquet as pq

    if os.path.isdir(webtext_path):  # sharded corpus
        n_docs = sum(
            pq.read_metadata(os.path.join(webtext_path, f)).num_rows
            for f in os.listdir(webtext_path)
            if f.endswith(".parquet")
        )
    else:
        n_docs = pq.read_metadata(webtext_path).num_rows  # metadata only
    return {
        "out_root": out_root,
        "store_dir": store_dir if build_store else None,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n_triples / wall, 1) if wall > 0 else None,
        "docs_per_sec": round(n_docs / wall, 1) if wall > 0 else None,
        "lineage": run.lineage(),
        "header": header,
    }
