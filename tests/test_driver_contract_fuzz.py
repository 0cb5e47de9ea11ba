"""Randomized driver contract: the SAME registry query functions and the
SAME oracle SQL that the driver compares at sf0.01 are re-run over
machine-generated adversarial `documents` corpora — NULL group keys,
empty/unicode/duplicated text, zero-length docs, single-row tables. The
fixed sf corpora are clean (no NULLs, friendly distributions); this file
exists to catch the class of bug the round-4 rollup NULL-key finding
belonged to, where pandas and SQL semantics diverge only on data shapes
the pinned corpora never exhibit."""

import random

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from de_ray.pipelines.driver_queries import REGISTRY

# documents-only queries whose semantics are well-defined under NULL
# lang/source and degenerate text (NULL text is excluded below — SQL
# string functions over NULL rows are vendor-defined, not operator bugs)
QUERIES = [
    "rollup_counts",
    "value_histogram",
    "winsorize_chars",
    "dedup_keep_best",
    "normalize_text",
    "top_terms",
    "lang_vocab_size",
    "token_quantiles",
    "lang_token_quantiles",
    "zscore_by_lang",
    "ccnet_buckets",
    "corpus_report",
    "heavy_hitter_terms",
    "tfidf_top_terms",
    "bpe_token_counts",
    "dedup_exact",
    "token_counts",
    "dup_ngram_spans",
]

WORDS = ["alpha", "beta", "gamma", "δέλτα", "foo", "bar", "", "x", "Ω"]


def _random_events(rng: random.Random, n: int) -> pd.DataFrame:
    """Adversarial `events`: NULL/negative/edge `value`s, DUPLICATE exact
    timestamps within a user (the tie case every window/asof operator must
    define), session-gap boundary spacings, real funnel step names so the
    funnel/purchase-deriving queries exercise their full paths."""
    specials = [None, -5.0, 0.0, 1.0, 19.0, 19.999, 20.0, 1e9, -0.0001]
    types = ["view", "click", "purchase", "error", "signup"]
    rows = []
    ts = pd.Timestamp("2024-01-01")
    for i in range(n):
        v = (
            rng.choice(specials)
            if rng.random() < 0.4
            else round(rng.uniform(-2, 25), 3)
        )
        user = i % 4
        if i and rng.random() < 0.3:
            # exact duplicate timestamp FOR THE SAME USER — the tie shape
            # window/asof tie-breaking must define (i%4 alone would put
            # consecutive rows on different users, review r5)
            ts = rows[-1]["ts"]
            user = rows[-1]["user_id"]
        else:
            # includes the 30-minute session-gap boundary exactly
            ts = ts + pd.Timedelta(minutes=rng.choice([0, 1, 5, 30, 31, 600]))
        rows.append(
            {
                "event_id": i,
                "ts": ts,
                "user_id": user,
                "event_type": rng.choice(types),
                "value": v,
                "props": "",
            }
        )
    # NULL user_id / event_type are deliberately NOT generated: NULL
    # equality in joins (SQL: never equal) vs pandas merge-by semantics,
    # and lead()-boundary NULLs vs value NULLs in the transition oracle,
    # are genuinely different CONTRACTS, not operator bugs — the
    # operators' own NULL handling is unit-tested instead.
    return pd.DataFrame(rows)


def _random_docs(rng: random.Random, n: int) -> pd.DataFrame:
    langs = ["en", "de", None, "fr", ""]
    sources = ["web", None, "news"]
    rows = []
    for i in range(n):
        text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 12)))
        if rng.random() < 0.2 and rows:  # exact duplicate text
            text = rows[rng.randrange(len(rows))]["text"]
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": rng.choice(langs),
                "source": rng.choice(sources),
                "n_chars": len(text),
            }
        )
    return pd.DataFrame(rows)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(df[c].notna(), None).astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        df = res.to_pandas()
        if df.shape[1] == 0:
            # Ray's Dataset.to_pandas() drops the schema of an empty
            # dataset even though ds.schema() still carries it — restore
            # the column names so the schema compare is meaningful
            sch = res.schema()
            if sch is not None and sch.names:
                df = pd.DataFrame({n: pd.Series(dtype="object") for n in sch.names})
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("seed,n", [(3, 120), (17, 40), (29, 1)])
@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_corpus_matches_oracle(name, seed, n, tmp_path):
    rng = random.Random(seed)
    docs = _random_docs(rng, n)
    events = _random_events(rng, max(n, 1))
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(sf / "documents.parquet"))
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   str(sf / "events.parquet"))
    fn, sql = REGISTRY[name]
    got = _normalize(_to_df(fn(str(sf))))
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = _normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), f"{name}: schema"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-6
    )


# events-based operators: the adversarial axis is duplicate timestamps
# (tie semantics), session-gap boundary spacings, and NULL values.
# semi/anti_join need the TPC-H orders table and are covered by their
# sf0.01 contract rows instead.
EVENT_QUERIES = [
    "events_by_type",
    "events_daily_user",
    "session_windows",
    "sliding_windows",
    "tumbling_value",
    "funnel_steps",
    "retention_cohorts",
    "event_transitions",
    "asof_join",
    "range_join",
    "interval_join",
]


@pytest.mark.parametrize("seed,n", [(5, 200), (41, 30), (53, 1)])
@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_adversarial_events_match_oracle(name, seed, n, tmp_path):
    rng = random.Random(seed)
    events = _random_events(rng, n)
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   str(sf / "events.parquet"))
    fn, sql = REGISTRY[name]
    got = _normalize(_to_df(fn(str(sf))))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = _normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), f"{name}: schema"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-6
    )


def _random_embeddings(rng: random.Random, n: int, dim: int = 8) -> pd.DataFrame:
    """Adversarial embeddings for the ELEMENTWISE ops: zero vectors,
    huge/tiny magnitudes, exact duplicates. (Cosine-family queries are
    excluded: a zero vector's cosine is undefined and the planted property
    oracles assume the synthetic corpus's no-duplicates geometry.)"""
    rows = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.15:
            v = [0.0] * dim  # zero vector
        elif kind < 0.3 and rows:
            v = rows[rng.randrange(len(rows))]["embedding"]  # duplicate
        elif kind < 0.4:
            v = [rng.uniform(-1, 1) * 1e6 for _ in range(dim)]
        elif kind < 0.5:
            v = [rng.uniform(-1, 1) * 1e-6 for _ in range(dim)]
        else:
            v = [round(rng.uniform(-1, 1), 6) for _ in range(dim)]
        rows.append(
            {"vec_id": i, "embedding": list(map(float, v)), "label": i % 3}
        )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("seed,n", [(11, 60), (47, 1)])
@pytest.mark.parametrize("name", ["quantize_embeddings", "label_centroids"])
def test_adversarial_embeddings_match_oracle(name, seed, n, tmp_path):
    rng = random.Random(seed)
    emb = _random_embeddings(rng, n)
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    t = pa.table(
        {
            "vec_id": pa.array(emb["vec_id"], pa.int64()),
            "embedding": pa.array(emb["embedding"], pa.list_(pa.float32())),
            "label": pa.array(emb["label"], pa.int32()),
        }
    )
    pq.write_table(t, str(sf / "embeddings.parquet"))
    fn, sql = REGISTRY[name]
    got = _normalize(_to_df(fn(str(sf))))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    want = _normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), f"{name}: schema"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-6
    )


def test_empty_corpus_no_crash(tmp_path):
    """A fully-empty corpus (the limit of an empty shard) must not crash
    ANY fuzzed query: Ray loses an empty dataset's schema through every
    map/materialize, so legitimately-empty inputs exercised every
    operator's empty-shape handling (review r5; 15 crashes before the
    empty-shard hardening, zero after)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
             "lang": pa.array([], pa.string()), "source": pa.array([], pa.string()),
             "n_chars": pa.array([], pa.int64())}
        ),
        str(sf / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {"event_id": pa.array([], pa.int64()),
             "ts": pa.array([], pa.timestamp("us")),
             "user_id": pa.array([], pa.int64()),
             "event_type": pa.array([], pa.string()),
             "value": pa.array([], pa.float64()),
             "props": pa.array([], pa.string())}
        ),
        str(sf / "events.parquet"),
    )
    for name in QUERIES + EVENT_QUERIES:
        fn, _sql = REGISTRY[name]
        df = _to_df(fn(str(sf)))  # must not raise
        # empty, a single zero/NaN report row, or the funnel's all-zero
        # per-step table
        assert len(df) <= 3, name
