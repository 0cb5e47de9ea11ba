"""Header statistics (G1) — the VoID/HDT stats the reference writes into
every HDT header (verified in apple.hdt: void:triples, void:properties,
void:distinctSubjects, void:distinctObjects, numSharedSubjectObject,
dictionarysizeStrings, blockSize 16, triplesOrder SPO; rendered by
``src/view.rs:52-55``). Computed with Dataset aggregates, never by
materializing the data on the driver."""

from __future__ import annotations

from typing import Dict

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from de_ray.hdt.dictionary import (
    SECTION_OBJECT,
    SECTION_PREDICATE,
    SECTION_SHARED,
    SECTION_SUBJECT,
    DictionaryBuild,
)

BLOCK_SIZE = 16
TRIPLES_ORDER = "SPO"


def _strlen_partial(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = pc.sum(pc.utf8_length(batch.column("term"))).as_py() or 0
    return pa.table({"nbytes": pa.array([n], pa.int64())})


def _ntlen_partial(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    total = 0
    for col in ("subj", "pred", "obj"):
        total += pc.sum(pc.utf8_length(batch.column(col))).as_py() or 0
    # per NT line: 2 brackets-ish + separators + " .\n" — approximation of
    # original serialized size (the reference's originalSize)
    total += 8 * len(batch)
    return pa.table({"nbytes": pa.array([total], pa.int64())})


def _sum_nbytes(ds: rd.Dataset) -> int:
    out = ds.aggregate(Sum("nbytes", alias_name="total"))
    return int(out["total"] or 0)


def build_header(
    dict_build: DictionaryBuild,
    n_triples: int,
    per_graph: Dict[str, int],
    original_size: int = 0,
) -> dict:
    c = dict_build.counts
    shared = c.get(SECTION_SHARED, 0)
    strings_size = dict_build.strings_size
    if strings_size is None:  # fallback: one pass over the sections
        strings_size = _sum_nbytes(
            dict_build.sections.map_batches(_strlen_partial, batch_format="pyarrow")
        )
    return {
        "format": "http://purl.org/HDT/hdt#HDTv1",
        "dictionary": "http://purl.org/HDT/hdt#dictionaryFour",
        "triples": "http://purl.org/HDT/hdt#triplesBitmap",
        "void:triples": n_triples,
        "void:properties": c.get(SECTION_PREDICATE, 0),
        "void:distinctSubjects": shared + c.get(SECTION_SUBJECT, 0),
        "void:distinctObjects": shared + c.get(SECTION_OBJECT, 0),
        "numSharedSubjectObject": shared,
        "dictionarysizeStrings": strings_size,
        "dictionaryblockSize": BLOCK_SIZE,
        "triplesOrder": TRIPLES_ORDER,
        "originalSize": original_size,
        "graphs": per_graph,
    }


def original_size_of(triples_ds: rd.Dataset) -> int:
    return _sum_nbytes(
        triples_ds.map_batches(_ntlen_partial, batch_format="pyarrow")
    )
