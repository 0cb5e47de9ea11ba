"""Deterministic sampling (dataops/sample.py) + distributed quantiles
(dataops/stats.py) against DuckDB on sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _con():
    c = duckdb.connect()
    c.execute("PRAGMA threads=2")
    c.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


def test_hash_sample_matches_sql_predicate():
    from de_ray.dataops.sample import hash_sample, sql_predicate

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    got = sorted(hash_sample(ds, "doc_id", 0.2).to_pandas()["doc_id"])
    want = sorted(
        r[0]
        for r in _con()
        .execute(f"SELECT doc_id FROM documents WHERE {sql_predicate('doc_id', 0.2)}")
        .fetchall()
    )
    assert got == want
    assert 0 < len(got) < 1000  # neither empty nor everything


def test_hash_sample_is_stable_and_salted():
    from de_ray.dataops.sample import hash_sample

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    a = sorted(hash_sample(ds, "doc_id", 0.3).to_pandas()["doc_id"])
    b = sorted(hash_sample(ds, "doc_id", 0.3).to_pandas()["doc_id"])
    c = sorted(hash_sample(ds, "doc_id", 0.3, salt=99).to_pandas()["doc_id"])
    assert a == b
    assert a != c


def test_hash_sample_nested_rates():
    """A 10% sample is a strict subset of a 30% sample (same salt) —
    the property that makes rate ramps reproducible."""
    from de_ray.dataops.sample import hash_sample

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    small = set(hash_sample(ds, "doc_id", 0.1).to_pandas()["doc_id"])
    big = set(hash_sample(ds, "doc_id", 0.3).to_pandas()["doc_id"])
    assert small < big


def test_stratified_sample_rates():
    from de_ray.dataops.sample import stratified_sample

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    out = stratified_sample(
        ds, "doc_id", "lang", {"en": 0.0, "de": 1.0}, default_rate=0.5
    ).to_pandas()
    assert (out["lang"] != "en").all()
    n_de = (
        rd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
        .to_pandas()["lang"]
        .eq("de")
        .sum()
    )
    assert (out["lang"] == "de").sum() == n_de  # rate 1.0 keeps every row


def test_temperature_rates_shape():
    from de_ray.dataops.sample import temperature_rates

    rates = temperature_rates({"big": 10_000, "small": 4, "tiny": 1}, coeff=2.0)
    assert rates["big"] == 2.0 / 100.0  # exact: sqrt(10000) == 100
    assert rates["small"] == rates["tiny"] == 1.0  # capped
    assert rates["big"] < 1.0
    # monotone: larger stratum, lower keep rate
    ordered = [rates[k] for k in ("big", "small")]
    assert ordered == sorted(ordered)


def test_temperature_sample_rebalances_and_is_partition_invariant():
    from de_ray.dataops.sample import temperature_rates, temperature_sample

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    out = temperature_sample(ds, "doc_id", "lang", coeff=6.0, salt=13).to_pandas()
    out2 = temperature_sample(
        ds.repartition(7), "doc_id", "lang", coeff=6.0, salt=13
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # expected kept per stratum ≈ coeff·sqrt(n): the dominant stratum no
    # longer dominates proportionally — its keep RATE is the smallest
    counts = ds.to_pandas()["lang"].value_counts()
    rates = temperature_rates(counts.to_dict(), coeff=6.0)
    assert rates[counts.idxmax()] == min(rates.values())


QUOTAS = {"en": 5, "de": 1000, "fr": 3}


def _quota_oracle(con, default=2, salt=13):
    from de_ray.dataops.sample import sql_quota_rank

    rank = sql_quota_rank("doc_id", "lang", salt=salt)
    rows = con.execute(
        f"SELECT doc_id, lang FROM (SELECT doc_id, lang, {rank} AS rn "
        f"FROM documents) WHERE rn <= CASE lang WHEN 'en' THEN 5 "
        f"WHEN 'de' THEN 1000 WHEN 'fr' THEN 3 ELSE {default} END"
    ).fetchall()
    return sorted(rows)


def test_quota_sample_matches_sql_row_number():
    from de_ray.dataops.sample import quota_sample

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    out = quota_sample(ds, "doc_id", "lang", QUOTAS, default_quota=2, salt=13)
    got = sorted(map(tuple, out.to_pandas()[["doc_id", "lang"]].itertuples(index=False)))
    assert got == _quota_oracle(_con())
    # exact quota semantics: never more than quota, whole stratum when smaller
    langs = pd.Series([l for _, l in got]).value_counts()
    n_de = (
        rd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
        .to_pandas()["lang"]
        .eq("de")
        .sum()
    )
    assert langs["en"] == 5 and langs["fr"] == 3 and langs["de"] == n_de


def test_quota_sample_partitioning_invariant():
    from de_ray.dataops.sample import quota_sample

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    base = quota_sample(ds, "doc_id", "lang", QUOTAS, default_quota=2, salt=13)
    rep = quota_sample(
        ds.repartition(7), "doc_id", "lang", QUOTAS, default_quota=2, salt=13
    )
    key = lambda df: sorted(map(tuple, df[["doc_id", "lang"]].itertuples(index=False)))
    assert key(base.to_pandas()) == key(rep.to_pandas())


def test_quota_sample_forced_distributed_final():
    from de_ray.dataops.sample import quota_sample

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    out = quota_sample(
        ds, "doc_id", "lang", QUOTAS, default_quota=2, salt=13, driver_limit=10
    )
    got = sorted(map(tuple, out.to_pandas()[["doc_id", "lang"]].itertuples(index=False)))
    assert got == _quota_oracle(_con())


def test_quota_sample_default_zero_drops_unlisted():
    from de_ray.dataops.sample import quota_sample

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    out = quota_sample(ds, "doc_id", "lang", {"en": 4}, default_quota=0).to_pandas()
    assert set(out["lang"]) == {"en"} and len(out) == 4


def test_quantile_disc_matches_duckdb_int():
    from de_ray.dataops.stats import quantile_disc

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["n_chars"])
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    got = quantile_disc(ds, "n_chars", qs)
    want = (
        _con()
        .execute(
            "SELECT "
            + ", ".join(f"quantile_disc(n_chars, {q})" for q in qs)
            + " FROM documents"
        )
        .fetchone()
    )
    assert [int(g) for g in got] == list(want)


def test_quantile_disc_forced_refinement_rounds():
    """Tiny collect_limit + few bins forces multiple histogram rounds —
    must stay exact (same DuckDB convention) on float data."""
    from de_ray.dataops.stats import quantile_disc

    rng = np.random.default_rng(3)
    vals = rng.normal(size=5000) * 1e6
    ds = rd.from_pandas(pd.DataFrame({"x": vals}))
    got = quantile_disc(ds, "x", [0.25, 0.75], bins=8, collect_limit=20)
    s = np.sort(vals)
    want = [s[int(np.ceil(q * len(s))) - 1] for q in (0.25, 0.75)]
    assert got == pytest.approx(want, abs=0)


def test_quantile_disc_heavy_duplicates():
    """>collect_limit copies of one value (degenerate bracket guard)."""
    from de_ray.dataops.stats import quantile_disc

    vals = np.concatenate([np.full(1000, 7.0), np.arange(10.0, 20.0)])
    ds = rd.from_pandas(pd.DataFrame({"x": vals}))
    got = quantile_disc(ds, "x", [0.5, 1.0], bins=4, collect_limit=10)
    assert got == [7.0, 19.0]


def test_quantile_disc_nulls_ignored():
    from de_ray.dataops.stats import quantile_disc

    ds = rd.from_pandas(pd.DataFrame({"x": [None, 1.0, None, 3.0, 2.0]}))
    assert quantile_disc(ds, "x", [0.5]) == [2.0]


def test_grouped_quantile_disc_matches_duckdb():
    from de_ray.dataops.stats import grouped_quantile_disc

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    got = (
        grouped_quantile_disc(ds, "lang", "n_chars", [0.5, 0.99])
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    want = (
        _con()
        .execute(
            "SELECT lang, quantile_disc(n_chars, 0.5) AS q50, "
            "quantile_disc(n_chars, 0.99) AS q99 FROM documents "
            "GROUP BY lang ORDER BY lang"
        )
        .df()
    )
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["q50"].astype("int64").tolist() == want["q50"].tolist()
    assert got["q99"].astype("int64").tolist() == want["q99"].tolist()


def test_grouped_quantile_disc_forced_buckets():
    from de_ray.dataops.stats import grouped_quantile_disc

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    a = grouped_quantile_disc(ds, "lang", "n_chars", [0.5]).to_pandas()
    b = grouped_quantile_disc(
        ds, "lang", "n_chars", [0.5], limit=0, num_buckets=3
    ).to_pandas()
    a = a.sort_values("lang").reset_index(drop=True)
    b = b.sort_values("lang").reset_index(drop=True)
    assert a.equals(b)


def test_approx_distinct_accuracy():
    from de_ray.dataops.stats import approx_distinct

    import pyarrow.parquet as _pq

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    est = approx_distinct(ds, "doc_id")
    exact = len(
        np.unique(
            _pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
            .column("doc_id")
            .to_numpy()
        )
    )
    assert abs(est - exact) / exact < 0.05

    big = rd.from_pandas(pd.DataFrame({"x": np.arange(200_000) % 50_000}))
    est2 = approx_distinct(big, "x")
    assert abs(est2 - 50_000) / 50_000 < 0.05
