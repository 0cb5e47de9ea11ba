"""Temporal joins (dataops/joins.py): as-of, keyed range, keyless interval.

Every test checks the distributed Dataset path against a plain
pandas/DuckDB computation of the same semantics on sf0.001 events.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"

PUR = (
    "p AS (SELECT user_id AS p_user, ts AS p_ts, max(event_id) AS p_event_id "
    "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)"
)


@pytest.fixture(scope="module")
def events():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def con(events):
    c = duckdb.connect()
    c.execute("PRAGMA threads=2")
    c.register("events", events)
    return c


def _purchases_df(events: pd.DataFrame) -> pd.DataFrame:
    p = (
        events[events.event_type == "purchase"]
        .groupby(["user_id", "ts"], as_index=False)["event_id"]
        .max()
    )
    return p.rename(columns={"user_id": "p_user", "ts": "p_ts", "event_id": "p_event_id"})


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, ignore_index=True)


def test_asof_join_matches_duckdb(events, con):
    from de_ray.dataops.joins import asof_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    pur = rd.from_pandas(_purchases_df(events))
    got = (
        asof_join(
            ev, pur, on_left="ts", on_right="p_ts", by_left="user_id", by_right="p_user"
        )
        .select_columns(["event_id", "p_event_id"])
        .to_pandas()
        .astype("int64")
    )
    want = con.execute(
        f"WITH {PUR} SELECT e.event_id, p.p_event_id FROM events e "
        "ASOF JOIN p ON e.user_id = p.p_user AND e.ts >= p.p_ts"
    ).df().astype("int64")
    assert len(got) > 0
    assert _sorted(got).equals(_sorted(want))


def test_asof_join_left_keeps_unmatched(events):
    from de_ray.dataops.joins import asof_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    pur = rd.from_pandas(_purchases_df(events))
    got = asof_join(
        ev,
        pur,
        on_left="ts",
        on_right="p_ts",
        by_left="user_id",
        by_right="p_user",
        how="left",
    ).to_pandas()
    assert len(got) == len(events)


def test_asof_join_distributed_path_matches_driver_path(events):
    """Force the bucketed shuffle path (limit=0) — must agree with the
    single-driver-call path bit for bit."""
    from de_ray.dataops.joins import asof_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    pur = _purchases_df(events)
    a = (
        asof_join(
            ev,
            rd.from_pandas(pur),
            on_left="ts",
            on_right="p_ts",
            by_left="user_id",
            by_right="p_user",
        )
        .select_columns(["event_id", "p_event_id"])
        .to_pandas()
        .astype("int64")
    )
    b = (
        asof_join(
            ev,
            rd.from_pandas(pur),
            on_left="ts",
            on_right="p_ts",
            by_left="user_id",
            by_right="p_user",
            limit=0,
            num_buckets=5,
        )
        .select_columns(["event_id", "p_event_id"])
        .to_pandas()
        .astype("int64")
    )
    assert _sorted(a).equals(_sorted(b))


def test_asof_tolerance_bounds_match_distance(events):
    from de_ray.dataops.joins import asof_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    pur = rd.from_pandas(_purchases_df(events))
    got = (
        asof_join(
            ev,
            pur,
            on_left="ts",
            on_right="p_ts",
            by_left="user_id",
            by_right="p_user",
            tolerance=pd.Timedelta(hours=1),
        )
        .to_pandas()
    )
    assert ((got["ts"] - got["p_ts"]) <= pd.Timedelta(hours=1)).all()


def test_range_join_matches_duckdb(events, con):
    from de_ray.dataops.joins import range_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    pur = _purchases_df(events)
    pur["p_hi"] = pur["p_ts"] + pd.Timedelta(hours=1)
    got = (
        range_join(
            ev,
            rd.from_pandas(pur),
            by_left="user_id",
            by_right="p_user",
            on="ts",
            lo="p_ts",
            hi="p_hi",
            closed="right",
        )
        .select_columns(["event_id", "p_event_id"])
        .to_pandas()
        .astype("int64")
    )
    want = con.execute(
        f"WITH {PUR} SELECT e.event_id, p.p_event_id FROM p JOIN events e "
        "ON e.user_id = p.p_user AND e.ts > p.p_ts AND e.ts <= p.p_ts + INTERVAL 1 HOUR"
    ).df().astype("int64")
    assert len(got) > 0
    assert _sorted(got).equals(_sorted(want))


def test_interval_join_matches_duckdb(events, con):
    from de_ray.dataops.joins import interval_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts"])
    w = events[events.event_id % 97 == 0]
    win = pd.DataFrame(
        {"w_id": w.event_id, "lo": w.ts, "hi": w.ts + pd.Timedelta(minutes=30)}
    )
    got = (
        interval_join(
            ev,
            rd.from_pandas(win),
            on="ts",
            lo="lo",
            hi="hi",
            bin_width=pd.Timedelta(minutes=30),
        )
        .select_columns(["event_id", "w_id"])
        .to_pandas()
        .astype("int64")
    )
    want = con.execute(
        "WITH w AS (SELECT event_id AS w_id, ts AS lo, ts + INTERVAL 30 MINUTE AS hi "
        "FROM events WHERE event_id % 97 = 0) "
        "SELECT e.event_id, w.w_id FROM events e JOIN w ON e.ts >= w.lo AND e.ts <= w.hi"
    ).df().astype("int64")
    assert len(got) > 0
    assert _sorted(got).equals(_sorted(want))


def test_interval_join_distributed_bins(events, con):
    """Force the bucketed path with a bin width much smaller than the
    interval span (replication factor > 1) — pairs must still appear
    exactly once."""
    from de_ray.dataops.joins import interval_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts"])
    w = events[events.event_id % 97 == 0]
    win = pd.DataFrame(
        {"w_id": w.event_id, "lo": w.ts, "hi": w.ts + pd.Timedelta(minutes=30)}
    )
    got = (
        interval_join(
            ev,
            rd.from_pandas(win),
            on="ts",
            lo="lo",
            hi="hi",
            bin_width=pd.Timedelta(minutes=7),
            limit=0,
            num_buckets=7,
        )
        .select_columns(["event_id", "w_id"])
        .to_pandas()
        .astype("int64")
    )
    want = con.execute(
        "WITH w AS (SELECT event_id AS w_id, ts AS lo, ts + INTERVAL 30 MINUTE AS hi "
        "FROM events WHERE event_id % 97 = 0) "
        "SELECT e.event_id, w.w_id FROM events e JOIN w ON e.ts >= w.lo AND e.ts <= w.hi"
    ).df().astype("int64")
    assert _sorted(got).equals(_sorted(want))


def test_shared_column_names_rejected():
    from de_ray.dataops.joins import range_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    with pytest.raises(ValueError, match="disjoint"):
        range_join(
            ev, ev, by_left="user_id", by_right="user_id", on="ts", lo="ts", hi="ts"
        )


def test_semi_and_anti_join_partition_events(con):
    from de_ray.dataops.joins import anti_join, semi_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    hv = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    hv = hv.filter(lambda r: r["o_totalprice"] > 450000).select_columns(["o_custkey"])
    semi = semi_join(ev, hv, on_left="user_id", on_right="o_custkey").to_pandas()
    anti = anti_join(ev, hv, on_left="user_id", on_right="o_custkey").to_pandas()
    n_events = len(pq.read_table(f"{SF}/events.parquet"))
    assert len(semi) + len(anti) == n_events
    assert len(semi) > 0 and len(anti) > 0
    assert set(semi.event_id).isdisjoint(set(anti.event_id))
    import duckdb

    c = duckdb.connect()
    c.execute("PRAGMA threads=2")
    want = c.execute(
        f"SELECT count(*) FROM '{SF}/events.parquet' e WHERE EXISTS ("
        f"SELECT 1 FROM '{SF}/orders.parquet' o WHERE o.o_custkey = e.user_id "
        "AND o.o_totalprice > 450000)"
    ).fetchone()[0]
    assert len(semi) == want


def test_semi_join_bucketed_path_matches_broadcast():
    from de_ray.dataops.joins import semi_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    hv = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    hv = hv.filter(lambda r: r["o_totalprice"] > 450000).select_columns(["o_custkey"])
    a = sorted(
        semi_join(ev, hv, on_left="user_id", on_right="o_custkey").to_pandas()["event_id"]
    )
    b = sorted(
        semi_join(
            ev, hv, on_left="user_id", on_right="o_custkey", broadcast_limit=0
        ).to_pandas()["event_id"]
    )
    assert a == b


def test_equi_join_broadcast_matches_native_shuffle_join():
    from de_ray.dataops.joins import equi_join

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    cust = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])
    a = (
        equi_join(ev, cust, on_left="user_id", on_right="c_custkey")
        .select_columns(["event_id", "c_name"])
        .to_pandas()
    )
    b = (
        equi_join(
            ev, cust, on_left="user_id", on_right="c_custkey", broadcast_limit=0,
            num_partitions=4,
        )
        .select_columns(["event_id", "c_name"])
        .to_pandas()
    )
    a = a.sort_values(["event_id", "c_name"], ignore_index=True)
    b = b.sort_values(["event_id", "c_name"], ignore_index=True)
    assert len(a) > 0
    assert a.equals(b)


def test_tfidf_distributed_vocab_path_matches_broadcast():
    from de_ray.dataops.text import tfidf_top_terms

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = tfidf_top_terms(docs, top_n=2).to_pandas()
    b = tfidf_top_terms(docs, top_n=2, broadcast_limit=0).to_pandas()
    key = ["doc_id", "w", "tfidf"]
    a = a[key].sort_values(key, ignore_index=True)
    b = b[key].sort_values(key, ignore_index=True)
    assert len(a) > 0
    assert a.equals(b)


def test_equi_join_left_both_paths():
    from de_ray.dataops.joins import equi_join

    left = rd.from_arrow(
        pa.table({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
    )
    right = rd.from_arrow(pa.table({"rk": [2, 4], "w": ["x", "y"]}))
    want = {(1, None), (2, "x"), (3, None), (4, "y")}
    b = equi_join(left, right, on_left="k", on_right="rk", how="left").to_pandas()
    got_b = {(r.k, None if pd.isna(r.w) else r.w) for r in b.itertuples()}
    s = equi_join(
        left, right, on_left="k", on_right="rk", how="left",
        broadcast_limit=0, num_partitions=2,
    ).to_pandas()
    got_s = {(r.k, None if pd.isna(r.w) else r.w) for r in s.itertuples()}
    assert got_b == want
    assert got_s == want


def test_equi_join_native_empty_left_keeps_joined_schema(ray_session):
    """An all-empty left on the forced-native path returns the JOINED
    schema (left+right cols), matching the other paths (dataops review)."""
    import pyarrow as pa
    import ray.data as rd

    from de_ray.dataops.joins import equi_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    right = rd.from_items([{"k": 1, "w": 2}])
    out = equi_join(left, right, on_left="k", on_right="k", broadcast_limit=-1)
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "v", "w"}


def test_equi_join_native_empty_right_left_outer(ray_session):
    """how='left' with an empty right on the forced-native path keeps the
    left rows with null right columns."""
    import pyarrow as pa
    import ray.data as rd

    from de_ray.dataops.joins import equi_join

    left = rd.from_items([{"k": 1, "v": 10}, {"k": 2, "v": 20}])
    right = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "w": pa.array([], pa.int64())})
    )
    rows = equi_join(
        left, right, on_left="k", on_right="k", how="left", broadcast_limit=-1
    ).take_all()
    assert len(rows) == 2
    assert all(r["w"] is None for r in rows)
