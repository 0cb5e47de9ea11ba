"""FourSectionDictionary build: sort-based global dedup + dense ID ranks.

Rebuilds the HDT dictionary semantics (reference builds it inside
``hdt::Hdt::read_nt``, called at ``src/create.rs:40``; structure verified
against ``tests/resources/apple.hdt`` — four sorted deduplicated string
sections with block-size-16 front coding) as a Ray Data shuffle pipeline:

1. role discovery: per-batch distinct ``(term, is_subj, is_pred, is_obj)``
   partials (combiner), then ``groupby(term).aggregate(Max)`` — ONE shuffle
   over distinct terms, not over triples.
2. section split (semi/anti-join semantics expressed on the flags):
   shared = subject∩object; subject-only; object-only; predicates are an
   independent ID space (a term can be both a predicate and a subject).
3. global lexicographic order: ``sort(section, term)`` — the sort-based
   dedup the north star names.
4. dense rank assignment: per-block counts → cumulative offsets on the
   driver (one small barrier per build), then per-block rank attachment via
   raw Ray tasks over the materialized Arrow refs. This is one of the few
   places the Dataset API genuinely can't express the semantics (global
   rank), so we drop to ``@ray.remote`` per SURVEY §7.4.

ID spaces (HDT spec; ``numSharedSubjectObject`` header key):
- subject space: shared 1..Nsh, then subject-only Nsh+1..Nsh+Ns
- object  space: shared 1..Nsh, then object-only  Nsh+1..Nsh+No
- predicate space: 1..Np
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

SECTION_SHARED = 0
SECTION_SUBJECT = 1
SECTION_OBJECT = 2
SECTION_PREDICATE = 3

SECTION_NAMES = {
    SECTION_SHARED: "shared",
    SECTION_SUBJECT: "subjects",
    SECTION_OBJECT: "objects",
    SECTION_PREDICATE: "predicates",
}


def _role_partials(batch: pa.Table) -> pa.Table:
    """Per-batch distinct (term, role flags) — shrinks the shuffle input.
    Pure Arrow: pc.unique per column + constant flag columns. No per-batch
    cross-role merge — a term seen in several roles emits one row per role
    and the global final's groupby-max folds them (the merge bought <20%
    fewer partial rows for a pandas round-trip per batch)."""
    import numpy as np

    tables = []
    flags = ("is_subj", "is_pred", "is_obj")
    for col, flag in (("subj", "is_subj"), ("pred", "is_pred"), ("obj", "is_obj")):
        u = pc.unique(batch.column(col))
        n = len(u)
        cols = {"term": u.cast(pa.large_string())}
        for other in flags:
            cols[other] = pa.array(
                np.full(n, 1 if other == flag else 0, dtype=np.int32)
            )
        tables.append(pa.table(cols))
    return pa.concat_tables(tables)


def roles_tap_stage(ds: rd.Dataset, roles_dir: str) -> rd.Dataset:
    """Pass-through map stage that side-writes per-block role partials.

    Fused into a producing chain (e.g. the flagship's read→extract→triples→
    link), it computes each block's distinct ``(term, role)`` partials WHILE
    the block is already in memory and appends them to ``roles_dir`` as one
    small parquet file per block (write-to-temp + atomic rename, so a task
    killed mid-write never leaves a readable partial file). ``write_store``
    then builds the dictionary from ``roles_dir`` and skips its own roles
    pass entirely — deleting one full-corpus re-read AND moving the roles
    compute into the producing stage's scheduling gaps (the narrow-vs-wide
    scaling bubbles, BASELINE.md round-3).

    Correctness under retries: a re-executed block writes a second file with
    a fresh name; duplicate partials are folded by the dictionary final's
    groupby-max, so coverage only requires that every block that reached the
    stage output also renamed its file — guaranteed because the rename
    happens before the task returns the block. ``roles_dir`` must be on
    storage every node can reach (same contract as the stage checkpoints).
    """
    os.makedirs(roles_dir, exist_ok=True)

    def tap(batch: pa.Table) -> pa.Table:
        import uuid

        import pyarrow.parquet as pq

        parts = _role_partials(batch)
        name = uuid.uuid4().hex
        tmp = os.path.join(roles_dir, f".tmp-{name}")
        pq.write_table(parts, tmp)
        os.replace(tmp, os.path.join(roles_dir, f"part-{name}.parquet"))
        return batch

    return ds.map_batches(
        tap, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def _roles_tap_files(roles_dir) -> List[str]:
    """Tap parquet files under one dir or an explicit list of dirs (the
    per-group form — lets the caller exclude stale subdirs whose input
    fingerprint no longer matches a current group)."""
    dirs = roles_dir if isinstance(roles_dir, (list, tuple)) else [roles_dir]
    out: List[str] = []
    for d in dirs:
        if not d or not os.path.isdir(d):
            continue
        out.extend(
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
    return out


@ray.remote
def _block_section_counts(tbl: pa.Table):
    # groupby/map_groups can emit SCHEMA-LESS empty blocks (see the NOTE in
    # dataops/dedup._connected_components); treat them as zero contribution
    if tbl.num_rows == 0 or "section" not in tbl.schema.names:
        return {}, 0
    vc = pc.value_counts(tbl.column("section"))
    strlen = pc.sum(pc.utf8_length(tbl.column("term"))).as_py() or 0
    return {v["values"]: v["counts"] for v in vc.to_pylist()}, int(strlen)


_SECTIONS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("section", pa.int32()),
        ("sec_rank", pa.int64()),
        ("id", pa.int64()),
    ]
)


@ray.remote
def _attach_ids(tbl: pa.Table, start_offsets: Dict[int, int], shared_count: int) -> pa.Table:
    """Attach per-section rank and final ID-space id to one sorted block.
    Schema-less empty blocks pass through as a typed empty table."""
    import numpy as np

    if tbl.num_rows == 0 or "section" not in tbl.schema.names:
        return _SECTIONS_SCHEMA.empty_table()
    sections = tbl.column("section").to_numpy(zero_copy_only=False)
    ranks = np.empty(len(sections), dtype="int64")
    offs = dict(start_offsets)
    # blocks are sorted by (section, term): runs per section are contiguous
    i = 0
    n = len(sections)
    while i < n:
        sec = sections[i]
        j = i
        while j < n and sections[j] == sec:
            j += 1
        base = offs.get(int(sec), 0)
        ranks[i:j] = np.arange(base, base + (j - i))
        offs[int(sec)] = base + (j - i)
        i = j
    # final id: rank is 0-based within section; HDT ids are 1-based
    ids = ranks + 1
    subj_or_obj = (sections == SECTION_SUBJECT) | (sections == SECTION_OBJECT)
    ids[subj_or_obj] += shared_count
    return tbl.append_column("sec_rank", pa.array(ranks, pa.int64())).append_column(
        "id", pa.array(ids, pa.int64())
    )


class DictionaryBuild:
    """Result handle: the sections Dataset + per-section counts."""

    def __init__(self, sections_ds: rd.Dataset, counts: Dict[int, int],
                 strings_size: int = None, timings: Dict[str, float] = None,
                 local_tbl: pa.Table = None):
        self.sections = sections_ds  # (term, section, sec_rank, id) sorted by (section, term)
        self.counts = counts
        # total term codepoints, computed during the build — saves the header
        # a separate full pass over the sections (VERDICT r1 #3)
        self.strings_size = strings_size
        self.timings = timings or {}  # phase walls, surfaced in store header
        # when the driver final built the sections table locally, keep the
        # Arrow handle: consumers (encode fp prep) read it directly instead
        # of a plasma put→pull round trip of the whole dictionary
        self.local_tbl = local_tbl

    @property
    def shared_count(self) -> int:
        return self.counts.get(SECTION_SHARED, 0)

    def max_subject_id(self) -> int:
        return self.shared_count + self.counts.get(SECTION_SUBJECT, 0)

    def max_object_id(self) -> int:
        return self.shared_count + self.counts.get(SECTION_OBJECT, 0)

    def num_predicates(self) -> int:
        return self.counts.get(SECTION_PREDICATE, 0)


# partial (term, roles) rows up to which the merge+sort+rank final runs in
# one polars pass on the driver (multi-threaded C sort: ~1 s at 5M rows,
# where the distributed groupby+sort pays several seconds of shuffle floors);
# beyond it the distributed path runs (the 10^12-doc regime). Measured at
# 8.2M role rows: driver final ≈ 1.3-4 s vs distributed final 13.6 s on one
# node — the crossover is far above this; 32M rows ≈ 4 GiB on the driver,
# still comfortable on the 128 GiB node class this targets.
DRIVER_FINAL_LIMIT = 32_000_000


def build_dictionary(
    triples_ds: rd.Dataset,
    driver_final_limit: int = DRIVER_FINAL_LIMIT,
    roles_dir: Optional[str] = None,
) -> DictionaryBuild:
    """Triples Dataset (subj,pred,obj[,graph]) → sorted, ranked dictionary.

    The role-discovery partials (combiner) always run distributed; the merge
    + sort + rank final is size-adaptive: up to ``driver_final_limit``
    distinct (term, role) partial rows it completes in one pandas task
    (exact, just cheaper than two shuffles), beyond that the distributed
    groupby → sort → per-block-offset rank path runs (the 10^12-doc path).

    ``roles_dir``: partials pre-written by :func:`roles_tap_stage` during
    the producing stage. When present, the roles pass (and its full-corpus
    re-read) is skipped — the final merges the tap files directly. Falls
    back to the normal pass when the directory is missing or empty.
    """
    import time as _time

    t0 = _time.time()
    tap_files = _roles_tap_files(roles_dir)
    if tap_files:
        import pyarrow.parquet as pq

        n_roles = sum(pq.read_metadata(f).num_rows for f in tap_files)
        timings = {
            "roles_pass": 0.0,
            "roles_tap_files": len(tap_files),
            "role_rows": n_roles,
        }
        if n_roles <= driver_final_limit:
            t1 = _time.time()
            # parallel multi-file read on the driver (pyarrow releases the
            # GIL per file); the partials are small — distinct terms only
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=8) as tp:
                tbls = list(tp.map(pq.read_table, tap_files))
            out = _final_from_table(pa.concat_tables(tbls))
            timings["driver_final"] = round(_time.time() - t1, 2)
            out.timings = timings
            return out
        roles = rd.read_parquet(tap_files)
        return _distributed_final(roles, timings, t0)
    roles = triples_ds.map_batches(
        _role_partials, batch_format="pyarrow", batch_size=128 * 1024
    ).materialize()
    n_roles = roles.count()
    timings = {"roles_pass": round(_time.time() - t0, 2), "role_rows": n_roles}
    if n_roles <= driver_final_limit:
        t1 = _time.time()
        out = _driver_final_dictionary(roles)
        timings["driver_final"] = round(_time.time() - t1, 2)
        out.timings = timings
        return out
    return _distributed_final(roles, timings, t0)


def _distributed_final(
    roles: rd.Dataset, timings: Dict[str, float], t0: float
) -> DictionaryBuild:
    """Distributed merge + sort + rank over role partials (the 10^12-doc
    path); see :func:`build_dictionary` step 2-4."""
    import time as _time
    # distributed merge: bucket on a stable term hash, merge each bucket with
    # ONE vectorized pandas groupby (not per-term map_groups), then the
    # global (section, term) sort gives front-coding order and rank input
    import pandas as pd

    num_buckets = 64

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        if "term" not in df.columns:  # schema-less empty block (Ray quirk)
            return pd.DataFrame(
                columns=["term", "is_subj", "is_pred", "is_obj", "_b"]
            )
        h = pd.util.hash_pandas_object(df["term"], index=False)
        return df.assign(_b=(h % num_buckets).astype("int64"))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        m = g.groupby("term", as_index=False)[["is_subj", "is_pred", "is_obj"]].max()
        fs = m["is_subj"].to_numpy(dtype=bool)
        fp = m["is_pred"].to_numpy(dtype=bool)
        fo = m["is_obj"].to_numpy(dtype=bool)
        so_sec = np.where(fs & fo, SECTION_SHARED, np.where(fs, SECTION_SUBJECT, SECTION_OBJECT))
        so = pd.DataFrame({"term": m["term"][fs | fo], "section": so_sec[fs | fo]})
        preds = pd.DataFrame({"term": m["term"][fp], "section": SECTION_PREDICATE})
        out = pd.concat([so, preds], ignore_index=True)
        out["section"] = out["section"].astype("int32")
        return out

    sections = (
        roles.map_batches(bucketize, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge_bucket, batch_format="pandas")
    )
    sections = sections.sort(["section", "term"]).materialize()
    refs = sections.to_arrow_refs()
    per_block = ray.get([_block_section_counts.remote(r) for r in refs])
    totals: Dict[int, int] = {}
    strings_size = 0
    offsets: List[Dict[int, int]] = []
    for c, strlen in per_block:
        offsets.append(dict(totals))
        for sec, n in c.items():
            totals[sec] = totals.get(sec, 0) + n
        strings_size += strlen
    shared = totals.get(SECTION_SHARED, 0)
    new_refs = [
        _attach_ids.remote(r, off, shared) for r, off in zip(refs, offsets)
    ]
    ranked = rd.from_arrow_refs(new_refs)
    timings["distributed_final"] = round(_time.time() - t0, 2) - timings["roles_pass"]
    return DictionaryBuild(ranked, totals, strings_size, timings)


def _driver_final_dictionary(roles: rd.Dataset) -> DictionaryBuild:
    """Mid-size-dictionary final: merge roles, split sections, sort, rank —
    one multi-threaded polars pass on the driver (pandas fallback).
    Identical output to the distributed path."""
    # fetch the materialized role blocks directly: plasma objects are
    # shared-memory on a node, so ray.get of Arrow refs is near-zero-copy
    # and parallel — measurably cheaper than the iter_batches stream (which
    # re-batches and deserializes through the iterator machinery)
    parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in ray.get(roles.to_arrow_refs())
    ]
    # Ray emits SCHEMA-LESS empty blocks from some operators (same quirk as
    # _block_section_counts guards) — they poison concat_tables; drop them
    parts = [t for t in parts if t.num_rows and t.schema.names]
    empty = pa.table(
        {
            "term": pa.array([], pa.large_string()),
            "is_subj": pa.array([], pa.int32()),
            "is_pred": pa.array([], pa.int32()),
            "is_obj": pa.array([], pa.int32()),
        }
    )
    tbl = pa.concat_tables(parts) if parts else empty
    return _final_from_table(tbl)


def _final_from_table(tbl: pa.Table) -> DictionaryBuild:
    """Driver final over an in-memory role-partials table (polars, pandas
    fallback) — shared by the materialized-roles and roles-tap paths."""
    import numpy as np

    try:
        return _polars_final(tbl)
    except ImportError:
        pass
    import pandas as pd

    df = tbl.to_pandas()
    m = df.groupby("term", as_index=False)[["is_subj", "is_pred", "is_obj"]].max()
    fs = m["is_subj"].to_numpy(dtype=bool)
    fp = m["is_pred"].to_numpy(dtype=bool)
    fo = m["is_obj"].to_numpy(dtype=bool)
    so_section = np.where(fs & fo, SECTION_SHARED, np.where(fs, SECTION_SUBJECT, SECTION_OBJECT))
    so = pd.DataFrame({"term": m["term"][fs | fo], "section": so_section[fs | fo]})
    preds = pd.DataFrame({"term": m["term"][fp], "section": SECTION_PREDICATE})
    sec = (
        pd.concat([so, preds], ignore_index=True)
        .sort_values(["section", "term"], kind="mergesort")
        .reset_index(drop=True)
    )
    sec["sec_rank"] = sec.groupby("section").cumcount()
    counts = sec["section"].value_counts().to_dict()
    shared = counts.get(SECTION_SHARED, 0)
    ids = sec["sec_rank"].to_numpy() + 1
    so = sec["section"].isin([SECTION_SUBJECT, SECTION_OBJECT]).to_numpy()
    ids = ids + np.where(so, shared, 0)
    sec["id"] = ids.astype("int64")
    sec["section"] = sec["section"].astype("int32")
    strings_size = int(sec["term"].str.len().sum())
    return DictionaryBuild(
        rd.from_pandas(sec), {int(k): int(v) for k, v in counts.items()}, strings_size
    )


def _polars_final(tbl: pa.Table) -> DictionaryBuild:
    """Polars variant of the driver final: C-speed multi-threaded groupby +
    sort over the role partials. Sort key is the raw utf8 bytes (polars'
    default ordering), matching pandas'/Python's str ordering on codepoints."""
    import polars as pl

    df = pl.from_arrow(tbl)
    m = df.group_by("term").agg(
        pl.col("is_subj").max(), pl.col("is_pred").max(), pl.col("is_obj").max()
    )
    so = (
        m.filter(pl.col("is_subj") + pl.col("is_obj") > 0)
        .with_columns(
            pl.when(pl.col("is_subj") * pl.col("is_obj") > 0)
            .then(SECTION_SHARED)
            .when(pl.col("is_subj") > 0)
            .then(SECTION_SUBJECT)
            .otherwise(SECTION_OBJECT)
            .cast(pl.Int32)
            .alias("section")
        )
        .select("term", "section")
    )
    preds = (
        m.filter(pl.col("is_pred") > 0)
        .with_columns(pl.lit(SECTION_PREDICATE, dtype=pl.Int32).alias("section"))
        .select("term", "section")
    )
    sec = pl.concat([so, preds]).sort(["section", "term"])
    # rank/id assignment in numpy over the sorted section column — a flat
    # arange minus per-run starts; the polars window (int_range().over())
    # cost ~0.5 s of the serial driver final at 2M terms
    import numpy as np

    secs = sec.get_column("section").to_numpy()
    n = len(secs)
    if n == 0:
        empty = pa.table(
            {
                "term": pa.array([], pa.large_string()),
                "section": pa.array([], pa.int32()),
                "sec_rank": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
            }
        )
        return DictionaryBuild(rd.from_arrow(empty), {}, 0, local_tbl=empty)
    boundaries = np.flatnonzero(np.diff(secs)) + 1
    starts = np.concatenate(([0], boundaries))
    run_lens = np.diff(np.concatenate((starts, [n])))
    sec_rank = np.arange(n, dtype=np.int64) - np.repeat(starts, run_lens)
    counts = {int(secs[s]): int(l) for s, l in zip(starts, run_lens)}
    shared = counts.get(SECTION_SHARED, 0)
    ids = sec_rank + 1
    ids[np.isin(secs, (SECTION_SUBJECT, SECTION_OBJECT))] += shared
    strings_size = int(sec.select(pl.col("term").str.len_chars().sum()).item() or 0)
    out = sec.to_arrow()
    out = pa.table(
        {
            "term": out.column("term").cast(pa.large_string()),
            "section": out.column("section"),
            "sec_rank": pa.array(sec_rank, pa.int64()),
            "id": pa.array(ids, pa.int64()),
        }
    )
    return DictionaryBuild(rd.from_arrow(out), counts, strings_size, local_tbl=out)


# ---------------------------------------------------------------------------
# Plain front coding (HDT dictionary section export; blockSize 16 matches the
# reference header key ``hdt#dictionaryblockSize "16"``)
# ---------------------------------------------------------------------------


def _vbyte(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b)
        else:
            out.append(b | 0x80)
            return bytes(out)


def pack_front_coded(terms: List[str], block_size: int = 16) -> bytes:
    """Sorted terms → plain-front-coded byte section (vbyte shared-prefix lens)."""
    out = bytearray()
    prev = b""
    for i, t in enumerate(terms):
        tb = t.encode("utf-8")
        if i % block_size == 0:
            out += _vbyte(len(tb)) + tb
        else:
            k = 0
            m = min(len(prev), len(tb))
            while k < m and prev[k] == tb[k]:
                k += 1
            suffix = tb[k:]
            out += _vbyte(k) + _vbyte(len(suffix)) + suffix
        prev = tb
    return bytes(out)


def unpack_front_coded(data: bytes, block_size: int = 16) -> List[str]:
    """Inverse of :func:`pack_front_coded` (used by tests and `view`)."""
    terms: List[str] = []
    i = 0
    prev = b""

    def read_vbyte(i: int):
        n = 0
        shift = 0
        while True:
            b = data[i]
            i += 1
            n |= (b & 0x7F) << shift
            shift += 7
            if b & 0x80:
                return n, i

    while i < len(data):
        if len(terms) % block_size == 0:
            ln, i = read_vbyte(i)
            cur = data[i : i + ln]
            i += ln
        else:
            k, i = read_vbyte(i)
            ln, i = read_vbyte(i)
            cur = prev[:k] + data[i : i + ln]
            i += ln
        terms.append(cur.decode("utf-8"))
        prev = cur
    return terms
