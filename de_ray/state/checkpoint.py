"""Checkpoint markers + per-stage/per-shard lineage records.

The reference has no checkpointing (temp files deleted on failure,
``src/query.rs:77-80``) but its graph-store discipline — immutable
partitions, add/remove whole graphs only (``src/serve.rs:798-962``) — maps
directly onto resumable Parquet stages (SURVEY §2.10): each stage writes to
its own directory, gets a ``_SUCCESS`` marker + a lineage record, and a
restarted run skips any stage/shard whose marker exists.

Lineage lives in ``<root>/lineage.jsonl`` — one JSON object per completed
unit: stage, shard, rows, wall seconds, input fingerprint. The fingerprint
(input path + mtime + size) invalidates a checkpoint when its input
changed.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, List, Optional


def input_fingerprint(paths) -> str:
    if isinstance(paths, str):
        paths = [paths]
    parts = []
    for p in sorted(paths):
        try:
            st = os.stat(p)
            parts.append(f"{p}:{st.st_size}:{int(st.st_mtime)}")
        except OSError:
            parts.append(f"{p}:missing")
    import hashlib

    return hashlib.md5("|".join(parts).encode()).hexdigest()


def shard_groups(files: List[str], group_size: int) -> List[List[str]]:
    """The canonical shard→group slicing used by :meth:`sharded_stage` —
    exported so callers (e.g. the kg pipeline's roles-tap coverage check)
    can address per-group artifacts consistently."""
    files = sorted(files)
    return [files[i : i + group_size] for i in range(0, len(files), group_size)]


class CheckpointedRun:
    """One pipeline run rooted at ``root``; stages call :meth:`stage`."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.lineage_path = os.path.join(root, "lineage.jsonl")

    def _marker(self, name: str) -> str:
        return os.path.join(self.root, name, "_SUCCESS")

    def is_done(self, name: str, fingerprint: Optional[str] = None) -> bool:
        m = self._marker(name)
        if not os.path.exists(m):
            return False
        if fingerprint is not None:
            with open(m) as f:
                return f.read().strip() == fingerprint
        return True

    def record(self, stage: str, shard: str, rows: int, wall_sec: float, fingerprint: str = "") -> None:
        with open(self.lineage_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "stage": stage,
                        "shard": shard,
                        "rows": rows,
                        "wall_sec": round(wall_sec, 3),
                        "fingerprint": fingerprint,
                        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    },
                    sort_keys=True,
                )
                + "\n"
            )

    def stage(
        self,
        name: str,
        build: Callable[[], "ray.data.Dataset"],  # noqa: F821
        inputs=None,
        write: bool = True,
    ):
        """Run (or skip) a checkpointed stage; returns the stage's Dataset.

        If the marker exists with a matching input fingerprint, the stage is
        skipped and its parquet output is re-read (resume path). Otherwise
        the Dataset from ``build()`` is written to ``<root>/<name>/``, the
        lineage row appended, and the marker committed LAST (write →
        record → marker, so a crash mid-write never fakes completion).
        """
        import ray.data as rd

        out_dir = os.path.join(self.root, name)
        fp = input_fingerprint(inputs) if inputs else ""
        if self.is_done(name, fp or None):
            if not write:
                # no parquet exists for a write=False stage: re-run the
                # (lazy/cheap by contract) build instead of read_parquet
                # on an empty directory
                return build()
            return rd.read_parquet(out_dir)
        t0 = time.time()
        ds = build()
        if write:
            # clear partial output from a crashed attempt
            if os.path.exists(out_dir):
                import shutil

                shutil.rmtree(out_dir)
            ds.write_parquet(out_dir)
            out = rd.read_parquet(out_dir)
            rows = out.count()
        else:
            out = ds
            rows = -1
        os.makedirs(out_dir, exist_ok=True)  # write=False: marker dir
        self.record(name, shard="*", rows=rows, wall_sec=time.time() - t0, fingerprint=fp)
        with open(self._marker(name), "w") as f:
            f.write(fp)
        return out

    def sharded_stage(
        self,
        name: str,
        files: List[str],
        build,
        group_size: int = 16,
    ):
        """Mid-stage-resumable map stage over a sharded input.

        Input files are processed in groups; each group is its own
        checkpoint unit (``<name>/group=K/`` + marker + lineage row), so a
        killed run resumes at the first unfinished GROUP, not the stage
        start. ``build(files)`` returns the group's output Dataset.
        Returns ONE lazy read over every group's checkpoint parquet —
        NOT a union of per-group datasets: a chained UnionOperator tree
        over many ReadParquet inputs starves under Ray's per-operator
        memory budgets at scale (observed at 8 M docs: unions queue
        thousands of blocks, emit none, and the downstream encode idles),
        while a single multi-directory ReadParquet streams uniformly.
        """
        import ray.data as rd

        groups = shard_groups(files, group_size)
        for gi, group in enumerate(groups):
            sub = os.path.join(name, f"group={gi:04d}")
            # runs the group (or skips it on resume); output lands in
            # <root>/<name>/group=K/ as parquet either way
            self.stage(sub, lambda g=group: build(g), inputs=group)
        out_files = []
        for gi in range(len(groups)):
            d = os.path.join(self.root, name, f"group={gi:04d}")
            out_files.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
        return rd.read_parquet(out_files)

    def lineage(self) -> List[dict]:
        if not os.path.exists(self.lineage_path):
            return []
        with open(self.lineage_path) as f:
            return [json.loads(line) for line in f if line.strip()]
