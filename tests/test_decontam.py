import numpy as np
import pyarrow as pa
import ray.data as rd

from de_ray.dataops.decontam import _batch_ngrams, decontaminate

SF = "/root/testdata/sf0.001"


def test_batch_ngrams_strict_windows():
    vals, offs = _batch_ngrams(["a b c d", "a b", "", "a b c"], n=3)
    # doc0: 2 grams, doc1 (too short): 0, doc2 (empty): 0, doc3: 1
    assert list(np.diff(offs)) == [2, 0, 0, 1]
    v2, _ = _batch_ngrams(["x a b c"], n=3)
    # "a b c" = doc0's first gram = the second call's second gram: same hash
    assert vals[0] == v2[1]
    assert len(set(vals.tolist())) == 2  # {abc, bcd}; doc3's abc dedups


def test_decontaminate_flag_and_drop_agree():
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps",  # contains the test 5-gram
                    "совершенно unrelated text here now",
                    "quick brown fox jumps over",  # shares no FULL 5-gram
                    "zz the quick brown fox jumps yy",  # contains it mid-doc
                ],
            }
        )
    )
    test = rd.from_arrow(
        pa.table({"doc_id": [0], "text": ["the quick brown fox jumps high"]})
    )
    flagged = (
        decontaminate(train, test, n=5, mode="flag")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert flagged["contaminated"].tolist() == [True, False, False, True]
    kept = decontaminate(train, test, n=5, mode="drop").to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [2, 3]


def test_decontaminate_short_and_empty_docs_never_flagged():
    train = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["quick brown", ""]})
    )
    test = rd.from_arrow(pa.table({"doc_id": [0], "text": ["quick brown fox"]}))
    out = decontaminate(train, test, n=3, mode="flag").to_pandas()
    assert not out["contaminated"].any()


def test_decontaminate_matches_registry_oracle_shape():
    from de_ray.pipelines.driver_queries import REGISTRY

    fn, sql = REGISTRY["decontaminate"]
    assert sql is not None
    df = fn(SF).to_pandas()
    assert list(df.columns) == ["doc_id"]


def test_repetition_signals_hand_computed():
    from de_ray.dataops.text import repetition_signals_batch

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b a b a",  # bigrams: ab ba ab ba -> 4 total, 2 uniq, top 2
                "x y z",      # xy yz -> 2 total, 2 uniq, top 1
                "solo",       # no bigram
            ],
        }
    )
    out = repetition_signals_batch(t, n=2).to_pandas()
    assert out["dup_frac"].tolist() == [0.5, 0.0, 0.0]
    assert out["top_frac"].tolist() == [0.5, 0.5, 0.0]


def test_pack_token_chunks_invariants():
    import duckdb

    from de_ray.dataops.pack import pack_token_chunks

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = pack_token_chunks(docs, max_tokens=256).to_pandas()
    total_tokens = duckdb.sql(
        f"SELECT sum(len(list_filter(string_split_regex(text,'\\s+'), x -> x<>''))) "
        f"FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    # token conservation: every token lands in exactly one chunk
    assert out["n_tokens"].sum() == total_tokens
    assert (out["n_tokens"] <= 256).all()
    assert out["chunk_id"].is_unique
    assert (out["n_docs"] >= 1).all()
    assert (out["first_doc"] <= out["last_doc"]).all()
    # all chunks except per-block tails are exactly full
    assert (out["n_tokens"] == 256).sum() >= len(out) - out["first_doc"].nunique()


def test_pack_token_chunks_single_block_exact():
    from de_ray.dataops.pack import pack_token_chunks

    t = pa.table(
        {"doc_id": [10, 11, 12], "text": ["a b c", "d e", "f g h i"]}
    )  # lengths 3, 2, 4 -> total 9, max 4 -> chunks: 4,4,1
    out = (
        pack_token_chunks(rd.from_arrow(t), max_tokens=4)
        .to_pandas()
        .sort_values("chunk_id", ignore_index=True)
    )
    assert out["n_tokens"].tolist() == [4, 4, 1]
    # chunk0 = tokens 0-3 (docs 10,11), chunk1 = 4-7 (docs 11,12), chunk2 = doc 12
    assert out["first_doc"].tolist() == [10, 11, 12]
    assert out["last_doc"].tolist() == [11, 12, 12]
    assert out["n_docs"].tolist() == [2, 2, 1]


def test_chunk_token_windows_invariants():
    from de_ray.dataops.pack import chunk_token_windows

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                " ".join(f"t{i}" for i in range(10)),  # 10 tokens
                "a  b   c",  # empty tokens dropped -> 3 tokens
                "",  # no tokens -> no chunks
                "solo",
            ],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs))
    out = chunk_token_windows(ds, window=4, stride=3).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_id")
    # starts 0,3,6,9 -> sizes 4,4,4,1
    assert d1["n_tokens"].tolist() == [4, 4, 4, 1]
    assert d1["chunk_text"].tolist()[0] == "t0 t1 t2 t3"
    assert d1["chunk_text"].tolist()[-1] == "t9"
    # overlap property: consecutive chunks share window - stride tokens
    assert d1["chunk_text"].tolist()[1].split()[0] == "t3"
    d2 = out[out["doc_id"] == 2]
    assert d2["chunk_text"].tolist() == ["a b c"]
    assert (out["doc_id"] == 3).sum() == 0
    assert out[out["doc_id"] == 4]["chunk_text"].tolist() == ["solo"]
    # stride == window -> exact reconstruction of the clean join
    full = chunk_token_windows(ds, window=3, stride=3).to_pandas()
    rec = " ".join(full[full["doc_id"] == 1].sort_values("chunk_id")["chunk_text"])
    assert rec == " ".join(f"t{i}" for i in range(10))
