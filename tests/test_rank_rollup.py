"""Unit tests for dataops/rank.py (global_rank / ntile), grouped_zscore
and rollup_grouped_agg — each checked against a DuckDB window/rollup
oracle over the same rows, plus partitioning/edge invariants."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])


def test_global_rank_matches_row_number():
    from de_ray.dataops.rank import global_rank

    got = (
        global_rank(_docs(), ["n_chars", "doc_id"], out_col="rank")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) AS rank "
        f"FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    assert got["rank"].tolist() == want["rank"].tolist()


def test_global_rank_descending():
    from de_ray.dataops.rank import global_rank

    got = (
        global_rank(_docs(), ["n_chars", "doc_id"], descending=True, out_col="rank")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id DESC) "
        f"AS rank FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    assert got["rank"].tolist() == want["rank"].tolist()


def test_ntile_matches_sql_for_uneven_buckets():
    from de_ray.dataops.rank import ntile

    # 500 rows / 7 tiles: 500 % 7 = 3 buckets get an extra row
    got = (
        ntile(_docs(), ["n_chars", "doc_id"], 7, out_col="bucket")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"SELECT doc_id, ntile(7) OVER (ORDER BY n_chars, doc_id) AS bucket "
        f"FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    assert got["bucket"].tolist() == want["bucket"].tolist()


def test_ntile_more_tiles_than_rows():
    from de_ray.dataops.rank import ntile

    df = pd.DataFrame({"x": [30, 10, 20]})
    got = ntile(rd.from_pandas(df), "x", 8, out_col="b").to_pandas()
    got = got.sort_values("x").reset_index(drop=True)
    # each row its own bucket 1..3 in x-order
    assert got["b"].tolist() == [1, 2, 3]


def test_ntile_partitioning_invariant():
    from de_ray.dataops.rank import ntile

    df = pd.DataFrame({"x": np.random.RandomState(7).permutation(1000)})
    a = ntile(rd.from_pandas(df), "x", 13, out_col="b").to_pandas()
    b = ntile(rd.from_pandas(df).repartition(17), "x", 13, out_col="b").to_pandas()
    a = a.sort_values("x").reset_index(drop=True)
    b = b.sort_values("x").reset_index(drop=True)
    assert a["b"].tolist() == b["b"].tolist()


def test_grouped_zscore_matches_formula_oracle():
    from de_ray.dataops.stats import grouped_zscore

    ds = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    got = (
        grouped_zscore(ds, "lang", "n_chars", out_col="z")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "WITH d AS (SELECT * FROM '" + SF + "/documents.parquet'), "
        "g AS (SELECT lang, count(*)::DOUBLE AS n, sum(n_chars)::DOUBLE AS s, "
        "sum(n_chars::DOUBLE * n_chars::DOUBLE) AS ss FROM d GROUP BY lang), "
        "m AS (SELECT lang, s/n AS mu, sqrt(greatest(ss/n - (s/n)*(s/n), 0)) AS sd FROM g) "
        "SELECT d.doc_id, round((d.n_chars - m.mu) / m.sd, 6) AS z "
        "FROM d JOIN m ON d.lang = m.lang ORDER BY d.doc_id"
    ).df()
    assert np.allclose(got["z"].to_numpy(), want["z"].to_numpy(), atol=1e-9)


def test_grouped_zscore_zero_variance_group():
    from de_ray.dataops.stats import grouped_zscore

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 3, "v": [5, 5, 5, 5, 1, 2, 3]})
    got = grouped_zscore(rd.from_pandas(df), "g", "v", out_col="z").to_pandas()
    assert (got.loc[got["g"] == "a", "z"] == 0.0).all()
    assert abs(got.loc[got["g"] == "b", "z"].sum()) < 1e-9


def test_rollup_matches_sql():
    from de_ray.functions.agg import rollup_grouped_agg

    ds = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    got = (
        rollup_grouped_agg(ds, ["lang", "source"], "n_chars")
        .to_pandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT coalesce(lang,'ALL') AS lang, coalesce(source,'ALL') AS source, "
        "count(*) AS n_rows, sum(n_chars) AS sum_value FROM '"
        + SF
        + "/documents.parquet' GROUP BY ROLLUP(lang, source) ORDER BY lang, source"
    ).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["source"].tolist() == want["source"].tolist()
    assert got["n_rows"].astype("int64").tolist() == want["n_rows"].astype("int64").tolist()
    assert got["sum_value"].astype("int64").tolist() == want["sum_value"].astype("int64").tolist()


def test_rollup_null_keys_match_duckdb_rollup():
    """SQL GROUP BY ROLLUP keeps NULL groups as their own group, distinct
    from the rolled-up total rows; pandas groupby would silently drop
    them (VERDICT r4 item 4). GROUPING() disambiguates on the SQL side."""
    from de_ray.functions.agg import rollup_grouped_agg

    df = pd.DataFrame(
        {
            "lang": ["en", "en", None, None, "fr", None],
            "source": ["a", None, "a", None, "b", "b"],
            "n": [1, 2, 4, 8, 16, 32],
        }
    )
    got = (
        rollup_grouped_agg(rd.from_pandas(df), ["lang", "source"], "n")
        .to_pandas()
    )
    got["n_rows"] = got["n_rows"].astype("int64")
    got["sum_value"] = got["sum_value"].astype("int64")
    got = got.sort_values(
        ["lang", "source"], na_position="first"
    ).reset_index(drop=True)
    want = duckdb.sql(
        "SELECT CASE WHEN GROUPING(lang)=1 THEN 'ALL' ELSE lang END AS lang, "
        "CASE WHEN GROUPING(source)=1 THEN 'ALL' ELSE source END AS source, "
        "count(*)::BIGINT AS n_rows, sum(n)::BIGINT AS sum_value "
        "FROM df GROUP BY ROLLUP(lang, source) "
        "ORDER BY lang NULLS FIRST, source NULLS FIRST"
    ).df()
    assert got["lang"].where(got["lang"].notna(), None).tolist() == \
        want["lang"].where(want["lang"].notna(), None).tolist()
    assert got["source"].where(got["source"].notna(), None).tolist() == \
        want["source"].where(want["source"].notna(), None).tolist()
    assert got["n_rows"].tolist() == want["n_rows"].astype("int64").tolist()
    assert got["sum_value"].tolist() == want["sum_value"].astype("int64").tolist()


def test_rollup_forced_distributed_final():
    from de_ray.functions.agg import rollup_grouped_agg

    ds = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    a = rollup_grouped_agg(ds, ["lang", "source"], "n_chars").to_pandas()
    b = rollup_grouped_agg(ds, ["lang", "source"], "n_chars", limit=0).to_pandas()
    key = ["lang", "source"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
    assert a["n_rows"].astype("int64").equals(b["n_rows"].astype("int64"))


def test_grouped_corr_zero_variance_is_nan():
    from de_ray.dataops.stats import grouped_corr

    df = pd.DataFrame(
        {"g": ["a"] * 3 + ["b"] * 3, "x": [1, 1, 1, 1, 2, 3], "y": [1, 2, 3, 2, 4, 6]}
    )
    out = grouped_corr(rd.from_pandas(df), "g", "x", "y").to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    assert np.isnan(out.loc[0, "r"])  # constant x in group a
    assert out.loc[1, "r"] == 1.0     # perfectly linear in group b


def test_grouped_mean_embedding_partitioning_invariant():
    from de_ray.dataops.similarity import grouped_mean_embedding

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "label": rng.randint(0, 4, 300),
            "embedding": list(rng.rand(300, 8).astype("float32")),
        }
    )
    a = grouped_mean_embedding(rd.from_pandas(df), "label", "embedding").to_pandas()
    b = grouped_mean_embedding(
        rd.from_pandas(df).repartition(11), "label", "embedding"
    ).to_pandas()
    key = ["label", "dim"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert np.allclose(a["centroid"], b["centroid"], atol=1e-9)
