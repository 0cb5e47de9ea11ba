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
    """Adversarial `events` values: NULLs, negatives, far-out-of-range,
    exact bin edges, NaN-adjacent floats."""
    specials = [None, -5.0, 0.0, 1.0, 19.0, 19.999, 20.0, 1e9, -0.0001]
    rows = []
    for i in range(n):
        v = (
            rng.choice(specials)
            if rng.random() < 0.4
            else round(rng.uniform(-2, 25), 3)
        )
        rows.append(
            {
                "event_id": i,
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                "user_id": i % 7,
                "event_type": rng.choice(["a", "b"]),
                "value": v,
                "props": "",
            }
        )
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
