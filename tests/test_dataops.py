"""Training-data operators: dedup, text analysis, similarity, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet")


def test_exact_dedup_matches_duckdb():
    from de_ray.dataops.dedup import exact_dedup

    got = exact_dedup(_docs()).select_columns(["doc_id", "text"]).to_pandas()
    import duckdb

    want = duckdb.sql(
        f"SELECT min(doc_id) AS doc_id, text FROM '{SF}/documents.parquet' GROUP BY text"
    ).df()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    assert g.equals(w[["doc_id", "text"]])


def test_token_count_and_quality():
    from de_ray.dataops.text import quality_score_batch, token_count_batch

    t = pa.table({"text": pa.array(["the fast sort", "a", ""], pa.string())})
    out = token_count_batch(t)
    assert out.column("n_tokens").to_pylist() == [3, 1, 1]  # split('') -> ['']
    q = quality_score_batch(t)
    assert q.column("stopword_ratio").to_pylist()[0] == pytest.approx(1 / 3)


def test_pii_scrub_batch():
    from de_ray.dataops.text import pii_scrub_batch

    rows = [
        "write to bob.smith+x@corp.example.org today",
        "server at 192.168.1.254 port 80",
        "call 555-867-5309 or 555.123.4567",
        "mixed 1.2.3.4 a@b.io 999-999-9999",
        "no pii here 1234 5.6 word",
        # phone-shaped local part: email wins the replacement, but counts
        # are over the original text so both categories tally
        "edge 123-456-7890@x.com overlap",
    ]
    out = pii_scrub_batch(pa.table({"text": pa.array(rows, pa.string())}))
    assert out.column("text").to_pylist() == [
        "write to [EMAIL] today",
        "server at [IP] port 80",
        "call [PHONE] or [PHONE]",
        "mixed [IP] [EMAIL] [PHONE]",
        "no pii here 1234 5.6 word",
        "edge [EMAIL] overlap",
    ]
    assert out.column("n_redactions").to_pylist() == [1, 1, 2, 3, 0, 2]


def test_quantize_embeddings_batch_edges():
    from de_ray.dataops.similarity import quantize_embeddings_batch

    t = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[1.0, -0.5, 0.25], [], [0.0, -0.0]], pa.list_(pa.float32())
            ),
        }
    )
    out = quantize_embeddings_batch(t).to_pandas()
    # vec 1: scale 127/1 → q = floor(x*127+0.5) = [127, -63, 32]
    v1 = out[out["vec_id"] == 1].sort_values("i")
    assert v1["q"].tolist() == [127, -63, 32]
    # empty list contributes no rows; zero vector quantizes to zeros
    assert (out["vec_id"] == 2).sum() == 0
    assert out[out["vec_id"] == 3]["q"].tolist() == [0, 0]
    # the preceding-segment reduceat trap: empty list between non-empties
    t2 = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[2.0, 4.0], [], [-8.0, 8.0]], pa.list_(pa.float32())
            ),
        }
    )
    out2 = quantize_embeddings_batch(t2).to_pandas()
    assert out2[out2["vec_id"] == 1]["q"].tolist() == [64, 127]
    assert out2[out2["vec_id"] == 3]["q"].tolist() == [-127, 127]


def test_fingerprint_matches_duckdb_md5():
    import duckdb

    from de_ray.dataops.text import fingerprint_batch

    t = pa.table({"text": pa.array(["hello world", "abc"], pa.string())})
    got = fingerprint_batch(t).column("fingerprint").to_pylist()
    want = [r[0] for r in duckdb.sql("SELECT md5(x) FROM (VALUES ('hello world'),('abc')) t(x)").fetchall()]
    assert got == want


def test_lang_id_plumbing():
    from de_ray.dataops.text import LangId

    li = LangId()
    assert li.predict("the merge in there and here") in li.PROFILES


def test_minhash_finds_near_dups():
    from de_ray.dataops.dedup import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "sleepy")
    other = "completely different words entirely unrelated content here now then"
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([base, near, other], pa.string()),
            }
        )
    )
    out = minhash_dedup(ds, threshold=0.5).to_pandas().set_index("doc_id")["cluster_id"]
    assert out[1] == out[2]  # near-dups share a cluster
    assert out[3] != out[1]


def test_simhash_similarity():
    from de_ray.dataops.dedup import SimHash, hamming_distance

    a = SimHash.simhash64("the quick brown fox jumps over the lazy dog " * 4)
    b = SimHash.simhash64("the quick brown fox jumps over the sleepy dog " * 4)
    c = SimHash.simhash64("totally unrelated text about databases and queries")
    assert hamming_distance(a, b) < hamming_distance(a, c)


def test_jaccard_kernel():
    from de_ray.dataops.dedup import jaccard

    assert jaccard("a b c d", "a b c d") == 1.0
    assert jaccard("a b c d", "x y z w") == 0.0


def test_brute_force_topk_matches_numpy():
    from de_ray.dataops.similarity import brute_force_topk

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    tbl = emb.take(1)
    q = np.array([tbl[0]["embedding"]], dtype=np.float64)
    got = brute_force_topk(emb, q, k=5).to_pandas()
    assert len(got) == 5
    assert got.iloc[0]["vec_id"] == tbl[0]["vec_id"]  # self is nearest
    assert got.iloc[0]["score"] == pytest.approx(1.0)
    # verify against a full numpy computation
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.asarray(full.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.asarray(full.column("vec_id").to_pylist())
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    scores = (mn @ qn.T).ravel()
    want_ids = set(ids[np.argsort(-scores)[:5]].tolist())
    assert set(got["vec_id"]) == want_ids


def test_lsh_topk_recall():
    from de_ray.dataops.similarity import brute_force_topk, lsh_topk

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    tbl = emb.take(1)
    q = np.array([tbl[0]["embedding"]], dtype=np.float64)
    exact = set(brute_force_topk(emb, q, k=5).to_pandas()["vec_id"])
    approx = lsh_topk(emb, q, k=5, n_planes=4).to_pandas()
    assert tbl[0]["vec_id"] in set(approx["vec_id"])  # finds self at least


def test_multimodal_decode_plumbing():
    from de_ray.dataops.multimodal import (
        DeterministicFakeDecoder,
        LibraryDecoder,
        decode_features_stage,
        frame_sample_stage,
        synth_media_table,
    )

    t = synth_media_table(16)
    ds = rd.from_arrow(t)
    out = decode_features_stage(ds, concurrency=(1, 2)).take_all()
    assert len(out) == 16
    assert len(out[0]["features"]) == 16
    assert "payload" not in out[0]  # wide binary dropped
    # determinism: same payload -> same features
    d = DeterministicFakeDecoder()
    f1 = d.features_of(b"xyz")
    f2 = d.features_of(b"xyz")
    assert np.array_equal(f1, f2)
    with pytest.raises(NotImplementedError):
        LibraryDecoder()(t)
    assert frame_sample_stage(ds, every_nth=2).count() == 8


def test_batch_shingles_match_single():
    from de_ray.dataops.dedup import _batch_shingles, shingle_set
    import numpy as np

    texts = ["a b c d e", "x y", "", "one two three four", "solo"]
    vals, offsets = _batch_shingles(texts, k=3)
    for i, t in enumerate(texts):
        got = np.unique(vals[offsets[i] : offsets[i + 1]])
        assert np.array_equal(got, shingle_set(t, 3)), t


def test_distributed_connected_components():
    """driver_limit=0 forces the min-label-propagation path; clusters must
    match the union-find result."""
    import pandas as pd
    import ray.data as rd
    from de_ray.dataops.dedup import _connected_components

    edges = pd.DataFrame(
        {"doc_a": [1, 2, 10, 11, 20], "doc_b": [2, 3, 11, 12, 21]}
    )
    ds = rd.from_pandas(edges)
    dist_ds = _connected_components(ds, driver_limit=0)
    assert not isinstance(dist_ds, dict)  # distributed path returns a Dataset
    out = dist_ds.to_pandas()
    dist = dict(zip(out["node"], out["label"]))
    drv = _connected_components(rd.from_pandas(edges), driver_limit=10**6)
    assert isinstance(drv, dict)
    assert dist == drv
    assert dist[3] == 1 and dist[12] == 10 and dist[21] == 20


def test_minhash_dedup_forced_distributed_paths():
    """driver_limit=0 forces the distributed verify join, Dataset-label
    components, and label join-back; output must match the driver path."""
    from de_ray.dataops.dedup import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "sleepy")
    other = "completely different words entirely unrelated content here now then"
    third = "yet another cluster of words shared by two documents exactly " * 2
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array([base, near, other, third, third], pa.string()),
            }
        )
    )
    want = (
        minhash_dedup(ds, threshold=0.5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # one retry: Ray 2.49's HashShuffleAggregator rarely throws a spurious
    # ArrowInvalid on tiny forced-shuffle inputs (Ray-internal race, not
    # repo logic — reruns always pass; see round-3 session notes)
    for attempt in (0, 1):
        try:
            got = (
                minhash_dedup(ds, threshold=0.5, driver_limit=0)
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            )
            break
        except Exception:
            if attempt:
                raise
    assert got.equals(want)
    assert got.set_index("doc_id")["cluster_id"][1] == got.set_index("doc_id")["cluster_id"][2]


def test_minhash_clusters_match_exact_jaccard_oracle():
    """Property oracle for the rows-only driver query (VERDICT r2 #8):
    cluster assignments over the sf0.001 corpus must equal an INDEPENDENT
    exhaustive computation — pure-Python word-3-shingle sets (no hashing),
    exact all-pairs Jaccard >= 0.8, union-find min-member labels."""
    import itertools

    import pyarrow.parquet as pq
    from de_ray.dataops.dedup import minhash_dedup

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))

    def sh(text, k=3):
        toks = text.split()
        if not toks:
            return frozenset()
        if len(toks) < k:
            return frozenset([tuple(toks)])
        return frozenset(tuple(toks[i : i + k]) for i in range(len(toks) - k + 1))

    S = {d: sh(x) for d, x in docs.items()}
    ids = sorted(S)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in itertools.combinations(ids, 2):
        sa, sb = S[a], S[b]
        if not sa and not sb:
            j = 1.0
        else:
            inter = len(sa & sb)
            uni = len(sa) + len(sb) - inter
            j = inter / uni if uni else 0.0
        if j >= 0.8:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in ids}

    out = minhash_dedup(
        rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"]),
        threshold=0.8,
    ).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == want
    assert sum(1 for d in ids if want[d] != d) > 0  # corpus has real near-dups


def test_lang_id_real_sentences():
    """Ranked-bigram LangId classifies real sentences in six languages."""
    from de_ray.dataops.text import LangId

    l = LangId()
    tests = {
        "en": "the quick brown fox jumps over the lazy dog and the cat sits on the mat",
        "de": "der schnelle braune fuchs springt über den faulen hund und die katze sitzt auf der matte",
        "fr": "le renard brun rapide saute par dessus le chien paresseux et le chat est assis sur le tapis",
        "es": "el rapido zorro marron salta sobre el perro perezoso y el gato esta sentado en la alfombra",
        "it": "la volpe marrone veloce salta sopra il cane pigro e il gatto si siede sul tappeto con un amico",
        "pt": "a rapida raposa marrom pula sobre o cachorro preguicoso e o gato esta sentado no tapete com outro amigo na casa",
    }
    for lang, text in tests.items():
        assert l.predict(text) == lang, (lang, l.predict(text))


def test_ngram_jaccard_pairs_exact():
    """ngram_jaccard_pairs must equal an independent pure-Python exhaustive
    all-pairs Jaccard over word-3-shingle SETS, including short-doc (<k
    tokens = one shingle) and empty-doc (no shingles, never a pair) edges."""
    import itertools

    from de_ray.dataops.dedup import ngram_jaccard_pairs

    docs = {
        1: "a b c d e f g h",
        2: "a b c d e f g x",      # near-dup of 1
        3: "totally different words appear here now",
        4: "a b c d e f g h",      # exact dup of 1
        5: "a b",                  # short doc: one 2-token shingle
        6: "a b",                  # short dup of 5
        7: "",                     # empty: no shingles
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": pa.array([docs[d] for d in sorted(docs)], pa.string()),
            }
        )
    )

    def sh(text, k=3):
        toks = text.split()
        if not toks:
            return frozenset()
        if len(toks) < k:
            return frozenset([tuple(toks)])
        return frozenset(tuple(toks[i : i + k]) for i in range(len(toks) - k + 1))

    S = {d: sh(t) for d, t in docs.items()}
    want = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(S[a] & S[b])
        uni = len(S[a]) + len(S[b]) - inter
        j = inter / uni if uni else 0.0
        if j >= 0.5:
            want[(a, b)] = j

    out = ngram_jaccard_pairs(ds, threshold=0.5, k=3).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)): float(r.jac) for r in out.itertuples()}
    assert got == pytest.approx(want)
    assert (1, 4) in got and got[(1, 4)] == 1.0  # exact dup
    assert (5, 6) in got and got[(5, 6)] == 1.0  # short-doc dup
    assert all(7 not in p for p in got)  # empty doc pairs with nothing


def test_ngram_jaccard_max_df_drops_hot_shingles():
    """max_df caps posting lists loudly: with every doc sharing one hot
    shingle, max_df=2 removes the hot postings and the pair disappears."""
    from de_ray.dataops.dedup import ngram_jaccard_pairs

    hot = "x y z"
    texts = [f"{hot} unique{i} filler{i} more{i}" for i in range(5)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(5)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    full = ngram_jaccard_pairs(ds, threshold=0.1, k=3).to_pandas()
    capped = ngram_jaccard_pairs(ds, threshold=0.1, k=3, max_df=2).to_pandas()
    assert len(full) == 10  # all pairs share the hot shingle
    assert len(capped) == 0  # hot shingle dropped, nothing else shared


def test_ivf_topk_exhaustive_equals_brute_force():
    """nprobe == nlist probes every inverted list — must reproduce
    brute-force top-k exactly (same ids, same scores)."""
    from de_ray.dataops.similarity import brute_force_topk, ivf_topk

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    emb = pq.read_table(f"{sf}/embeddings.parquet")
    q = np.asarray(emb.column("embedding").to_pylist()[:3], dtype=np.float64)
    ds = rd.read_parquet(f"{sf}/embeddings.parquet")
    want = (
        brute_force_topk(ds, q, k=5)
        .to_pandas()
        .sort_values(["query_idx", "vec_id"])
        .reset_index(drop=True)
    )
    got = (
        ivf_topk(ds, q, k=5, nlist=8, nprobe=8)
        .to_pandas()
        .sort_values(["query_idx", "vec_id"])
        .reset_index(drop=True)
    )
    assert got[["query_idx", "vec_id"]].equals(want[["query_idx", "vec_id"]])
    assert np.allclose(got["score"], want["score"])


def test_ivf_store_roundtrip_and_pruning(tmp_path):
    """ivf_partition writes a hive-partitioned store; ivf_topk_from_store
    with full probing equals brute force, and with nprobe=1 it only READS
    the probed partition directories."""
    import os

    import pyarrow.parquet as pq
    from de_ray.dataops.similarity import (
        brute_force_topk,
        ivf_partition,
        ivf_topk_from_store,
    )

    sf = "/root/testdata/sf0.001"
    emb = pq.read_table(f"{sf}/embeddings.parquet")
    q = np.asarray(emb.column("embedding").to_pylist()[:2], dtype=np.float64)
    ds = rd.read_parquet(f"{sf}/embeddings.parquet")
    store = str(tmp_path / "ivf_store")
    centroids = ivf_partition(ds, store, nlist=8)
    assert centroids.shape[0] == 8
    part_dirs = [d for d in os.listdir(store) if d.startswith("ivf_list=")]
    assert len(part_dirs) >= 2  # corpus actually spread over lists

    want = (
        brute_force_topk(ds, q, k=5)
        .to_pandas()
        .sort_values(["query_idx", "vec_id"])
        .reset_index(drop=True)
    )
    got = (
        ivf_topk_from_store(store, q, k=5, nprobe=8)
        .to_pandas()
        .sort_values(["query_idx", "vec_id"])
        .reset_index(drop=True)
    )
    assert got[["query_idx", "vec_id"]].equals(want[["query_idx", "vec_id"]])

    # narrow probe: correct shape, and recall against brute force is sane
    nar = ivf_topk_from_store(store, q, k=5, nprobe=2).to_pandas()
    assert set(nar["query_idx"]) == {0, 1}
    recall = len(
        set(map(tuple, nar[["query_idx", "vec_id"]].values))
        & set(map(tuple, want[["query_idx", "vec_id"]].values))
    ) / len(want)
    assert recall >= 0.2  # each query's own vector is in its probe-1 list


def test_pixel_resize_bilinear():
    """Resize stage: known 2x2 -> 4x4 bilinear values (half-pixel centers),
    constant-image invariance, and fixed output shape across a batch of
    variable-shape inputs."""
    from de_ray.dataops.multimodal import (
        _bilinear_resize,
        resize_stage,
        synth_pixel_table,
    )

    img = np.array([[0.0, 1.0], [2.0, 3.0]])
    out = _bilinear_resize(img, 4, 4)
    # corners clamp to source corners; interior interpolates at half-pixel
    # centers: hand-computed expectation for the 2x2 -> 4x4 case
    want = np.array(
        [
            [0.0, 0.25, 0.75, 1.0],
            [0.5, 0.75, 1.25, 1.5],
            [1.5, 1.75, 2.25, 2.5],
            [2.0, 2.25, 2.75, 3.0],
        ]
    )
    assert np.allclose(out, want)
    const = _bilinear_resize(np.full((5, 7), 2.5), 3, 11)
    assert np.allclose(const, 2.5)

    ds = rd.from_arrow(synth_pixel_table(12))
    res = resize_stage(ds, target_h=8, target_w=6).to_pandas()
    assert len(res) == 12
    assert (res["height"] == 8).all() and (res["width"] == 6).all()
    assert res["pixels"].map(len).eq(48).all()


def test_dup_span_stats_vs_bruteforce():
    """dup_span_stats == brute-force window-string counting on a corpus
    with planted exact-duplicate spans."""
    from collections import Counter

    from de_ray.dataops.dedup import dup_span_stats

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = 1 window
    texts = [
        f"unique one two three four five six seven eight {i} " + span
        for i in range(3)
    ] + [
        "all different tokens here nine ten eleven twelve thirteen",
        "short doc",  # < 8 tokens -> no row
        span + " " + span,  # self-repeat + cross-doc dup
    ]
    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    got = (
        dup_span_stats(docs, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # brute force over window strings
    n = 8
    windows = {}
    for i, t in enumerate(texts):
        toks = t.split()
        windows[i] = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
    docs_per_gram = Counter()
    for i, ws in windows.items():
        for g in set(ws):
            docs_per_gram[g] += 1
    want = {}
    for i, ws in windows.items():
        if not ws:
            continue
        dup = sum(1 for g in ws if docs_per_gram[g] >= 2)
        want[i] = (len(ws), dup)

    assert list(got["doc_id"]) == sorted(want)
    for _, row in got.iterrows():
        nw, nd = want[row["doc_id"]]
        assert row["n_windows"] == nw
        assert row["n_dup_windows"] == nd
        assert row["dup_frac"] == pytest.approx(nd / nw)


def test_lm_quality_buckets_invariants():
    from de_ray.dataops.text import lm_quality_buckets

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    out = lm_quality_buckets(ds).to_pandas()
    assert len(out) == ds.count()
    assert set(out["bucket"]) <= {"tail", "middle", "head"}
    # per-language tercile-ish split: tail share is ceil(0.35·n)/n by the
    # discrete-quantile convention (ties can only grow a bucket)
    for lang, g in out.groupby("lang"):
        n = len(g)
        assert (g["bucket"] == "tail").sum() >= int(np.ceil(0.35 * n)) - 1
        assert (g["bucket"] == "head").sum() >= 1


def test_bm25_topk_invariants():
    from de_ray.dataops.text import bm25_topk

    import pandas as pd

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "hash join hash join hash",
                "hash join",
                "scan filter sort merge window table row",
                "hash",
            ],
        }
    )
    ds = rd.from_pandas(df)
    out = bm25_topk(ds, ["hash", "join"], k=3)
    # doc 3 has no query terms: excluded; doc 1 saturates tf highest
    assert list(out["doc_id"])[0] == 1
    assert 3 not in set(out["doc_id"])
    assert len(out) == 3
    # partition invariance
    out7 = bm25_topk(rd.from_pandas(df).repartition(3), ["hash", "join"], k=3)
    assert list(out["doc_id"]) == list(out7["doc_id"])
    assert list(out["bm25"]) == list(out7["bm25"])


def test_semdedup_removes_planted_near_dups():
    from de_ray.dataops.similarity import semdedup

    import pandas as pd

    rng = np.random.RandomState(5)
    base = rng.randn(40, 16)
    # rows 40..44 (appended) are tiny perturbations of rows 0..4 (near-dups, not exact)
    near = base[:5] + 1e-4 * rng.randn(5, 16)
    m = np.vstack([base, near])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(45), pa.int64()),
            "embedding": pa.array(
                [list(r) for r in m.astype("float32")], pa.list_(pa.float32())
            ),
        }
    )
    out = semdedup(rd.from_arrow(tbl), nlist=4, threshold=0.99).to_pandas()
    kept = set(out["vec_id"])
    assert kept == set(range(40))  # the 5 perturbed clones are removed
    # forced bucketed (distributed) final: identical survivors
    out2 = semdedup(
        rd.from_arrow(tbl).repartition(5), nlist=4, threshold=0.99, group_limit=0
    ).to_pandas()
    assert set(out2["vec_id"]) == kept


def test_remove_dup_spans_hand_case():
    from de_ray.dataops.dedup import remove_dup_spans

    import pandas as pd

    shared = "one two three four"  # the 4-gram duplicated across docs 1 and 2
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"alpha beta {shared} gamma",
                f"start {shared} end tail",
                "unrelated words only here now",
            ],
        }
    )
    out = (
        remove_dup_spans(rd.from_pandas(rows), n=4)
        .to_pandas()
        .set_index("doc_id")
    )
    # docs 1/2: exactly the shared window's 4 tokens are removed
    assert out.loc[1, "clean_text"] == "alpha beta gamma"
    assert out.loc[1, "n_removed"] == 4
    assert out.loc[2, "clean_text"] == "start end tail"
    assert out.loc[2, "n_removed"] == 4
    # doc 3 untouched
    assert out.loc[3, "clean_text"] == rows.loc[2, "text"]
    assert out.loc[3, "n_removed"] == 0
    # broadcast_limit guard fails loudly
    with pytest.raises(ValueError, match="broadcast_limit"):
        remove_dup_spans(rd.from_pandas(rows), n=4, broadcast_limit=0)


def test_minhash_k_forwarded_to_lsh(ray_session):
    """k=1 must reach the LSH shingle stage (dataops review: it was
    silently ignored): word-permuted docs have 1-shingle Jaccard 1.0 and
    must cluster at k=1."""
    import ray.data as rd

    from de_ray.dataops.dedup import minhash_dedup

    words = [f"w{i}" for i in range(30)]
    rows = [
        {"doc_id": 1, "text": " ".join(words)},
        {"doc_id": 2, "text": " ".join(reversed(words))},  # same multiset
        {"doc_id": 3, "text": " ".join(f"x{i}" for i in range(30))},
    ]
    out = minhash_dedup(rd.from_items(rows), threshold=0.9, k=1).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[1] == cl[2]
    assert cl[3] != cl[1]
