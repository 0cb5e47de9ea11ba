"""Flagship pipeline end-to-end + checkpoint/resume semantics."""

import os

import ray.data as rd

from de_ray.pipelines.kg import run_kg_pipeline
from de_ray.sources.webtext import webtext_dir_for

SF = "/root/testdata/sf0.001"


def test_kg_pipeline_end_to_end(tmp_path):
    wt = webtext_dir_for(SF)
    out = str(tmp_path / "kg")
    summary = run_kg_pipeline(wt, out, resume=False)
    assert summary["n_docs"] == 500
    assert summary["n_triples"] > 500
    assert os.path.exists(os.path.join(out, "graph", "_SUCCESS"))
    assert summary["header"]["void:triples"] == summary["n_triples"]
    stages = {r["stage"] for r in summary["lineage"]}
    assert "graph" in stages
    assert any(s.startswith("linked") for s in stages)  # fused extract→link

    # SPARQL over the built graph
    from de_ray.hdt.store import Store
    from de_ray.query.engine import StoreSource, evaluate
    from de_ray.query.parser import parse_query

    st = Store(os.path.join(out, "graph"))
    q = parse_query(
        "PREFIX de: <http://example.org/vocab#> "
        "SELECT ?d WHERE { ?d de:mentions <http://example.org/entity/quick> } LIMIT 5"
    )
    res = evaluate(q, StoreSource(st))
    assert res.ds.count() == 5  # 'fast' -> 'quick' via linking


def test_kg_pipeline_resume_skips_done_stages(tmp_path):
    wt = webtext_dir_for(SF)
    out = str(tmp_path / "kg")
    s1 = run_kg_pipeline(wt, out, resume=False)
    s2 = run_kg_pipeline(wt, out, resume=True)  # everything checkpointed
    assert s2["n_triples"] == s1["n_triples"]
    # no new lineage rows for the heavy stages on resume
    def heavy(rows):
        return [r for r in rows if r["stage"].startswith("linked") or r["stage"] == "graph"]

    heavy1 = heavy(s1["lineage"])
    heavy2 = heavy(s2["lineage"])
    assert len(heavy2) == len(heavy1)
    assert s2["wall_sec"] < s1["wall_sec"]


def _fused_group(files, graph="file:///webtext"):
    """The pipeline's fused read → extract → triples → link chain, rebuilt
    here to simulate a partially-completed run."""
    from de_ray.stages.extract import extract_text_stage
    from de_ray.stages.link import link_entities_stage
    from de_ray.stages.triples import extract_triples_stage

    return link_entities_stage(
        extract_triples_stage(
            extract_text_stage(
                rd.read_parquet(files, columns=["url", "warc_ts", "html", "lang"]),
                concurrency=(1, 2),
            ),
            subject_col="url",
            graph=graph,
        ),
        concurrency=(1, 2),
    )


def test_kg_pipeline_restart_after_partial(tmp_path):
    """Kill-after-stage-1 simulation: only later stages rerun; output identical."""
    wt = webtext_dir_for(SF)
    out_a = str(tmp_path / "a")
    full = run_kg_pipeline(wt, out_a, resume=False)

    out_b = str(tmp_path / "b")
    from de_ray.state.checkpoint import CheckpointedRun

    # single-file input → the pipeline uses the unsharded "linked" stage
    assert os.path.isfile(wt)
    run = CheckpointedRun(out_b)
    run.stage(
        "linked", lambda: _fused_group(wt), inputs=wt
    )  # == stage 1 finished, then "crash"
    resumed = run_kg_pipeline(wt, out_b, resume=True)
    assert resumed["n_triples"] == full["n_triples"]
    # the finished stage was NOT re-run: exactly one lineage row for it
    assert sum(1 for r in resumed["lineage"] if r["stage"] == "linked") == 1


def test_sharded_midstage_resume(tmp_path):
    """Sharded input: kill-after-first-group resumes at group granularity."""
    from de_ray.sources.webtext import webtext_dir_for
    from de_ray.state.checkpoint import CheckpointedRun

    wt_dir = webtext_dir_for(SF, cache_root=str(tmp_path / "cache"), repeat=2, shard_rows=300)
    assert os.path.isdir(wt_dir)
    import glob

    shards = sorted(glob.glob(os.path.join(wt_dir, "*.parquet")))
    assert len(shards) == 4

    out = str(tmp_path / "kg")
    # simulate a run killed after the first shard group: run only group 0
    run = CheckpointedRun(out)
    run.stage(
        os.path.join("linked", "group=0000"),
        lambda: _fused_group(shards[:1]),
        inputs=shards[:1],
    )
    pre_rows = sum(1 for r in run.lineage() if r["stage"].startswith("linked/"))
    assert pre_rows == 1

    summary = run_kg_pipeline(wt_dir, out, resume=True, extract_group_size=1)
    # group 0 was NOT rerun (still exactly one lineage row for it)
    g0 = [r for r in summary["lineage"] if r["stage"].endswith("group=0000")]
    groups = [r for r in summary["lineage"] if "linked" in r["stage"]]
    assert len(groups) == 4  # groups 1-3 ran on resume, group 0 skipped
    assert len(g0) == 1
    assert summary["n_docs"] == 1000
    assert summary["n_triples"] > 1000
