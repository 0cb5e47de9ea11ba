"""Property-based tests (hypothesis) for the vectorized text kernels:
each is checked against a brute-force pure-Python reference on random
inputs. Batch-level functions are tested without Ray so hundreds of
examples run in seconds."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from de_ray.dataops.decontam import _batch_ngrams
from de_ray.dataops.text import repetition_signals_batch

WORDS = st.sampled_from(["a", "b", "c", "dd", "eee"])
DOC = st.lists(WORDS, min_size=0, max_size=12).map(" ".join)
DOCS = st.lists(DOC, min_size=1, max_size=8)


def _ref_ngrams(text: str, n: int):
    toks = text.split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@given(DOCS, st.integers(min_value=1, max_value=4))
@settings(max_examples=200, deadline=None)
def test_batch_ngrams_counts_and_equality_match_reference(texts, n):
    vals, offs = _batch_ngrams(texts, n)
    assert len(offs) == len(texts) + 1
    for i, t in enumerate(texts):
        ref = _ref_ngrams(t, n)
        span = vals[offs[i] : offs[i + 1]]
        assert len(span) == len(ref)
        # equal strings hash equal; distinct-per-doc counts must agree
        # (64-bit collisions on ≤12-token docs are effectively impossible)
        assert len(set(span.tolist())) == len(set(ref))
        # gram equality structure matches: positions with equal strings
        # must have equal hashes and vice versa
        for x in range(len(ref)):
            for y in range(x + 1, len(ref)):
                assert (ref[x] == ref[y]) == (span[x] == span[y])


@given(DOCS)
@settings(max_examples=200, deadline=None)
def test_repetition_signals_match_reference(texts):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = repetition_signals_batch(t, n=2).to_pandas()
    for i, text in enumerate(texts):
        grams = _ref_ngrams(text, 2)
        if not grams:
            want_dup, want_top = 0.0, 0.0
        else:
            total = len(grams)
            uniq = len(set(grams))
            top = max(grams.count(g) for g in set(grams))
            want_dup = np.floor((1.0 - uniq / total) * 1e6) / 1e6
            want_top = np.floor((top / total) * 1e6) / 1e6
        assert out["dup_frac"][i] == want_dup
        assert out["top_frac"][i] == want_top


@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=100, deadline=None)
def test_pack_chunk_boundaries_match_reference(lens, max_tokens):
    """The cumsum+searchsorted doc↔chunk map agrees with a naive walk."""
    import ray.data as rd

    from de_ray.dataops.pack import pack_token_chunks

    ids = list(range(100, 100 + len(lens)))
    texts = [" ".join(["w"] * L) for L in lens]
    t = pa.table({"doc_id": ids, "text": texts})
    df = pack_token_chunks(rd.from_arrow(t), max_tokens=max_tokens).to_pandas()
    # naive reference: concatenate nonempty docs, walk token by token
    flat = [i for i, L in zip(ids, lens) if L > 0 for _ in range(L)]
    if len(df) == 0:
        assert flat == []
        return
    out = df.sort_values(
        "chunk_id", key=lambda s: s.str.split(":").str[1].astype(int)
    ).reset_index(drop=True)
    want = []
    for s in range(0, len(flat), max_tokens):
        seg = flat[s : s + max_tokens]
        want.append((seg[0], seg[-1], len(set(seg)), len(seg)))
    got = list(
        zip(out["first_doc"], out["last_doc"], out["n_docs"], out["n_tokens"])
    )
    assert got == want


@given(DOCS, DOCS, st.integers(min_value=1, max_value=3))
@settings(max_examples=60, deadline=None)
def test_decontaminate_flags_match_reference(train_texts, test_texts, n):
    import ray.data as rd

    from de_ray.dataops.decontam import decontaminate

    train = pa.table(
        {"doc_id": list(range(len(train_texts))), "text": train_texts}
    )
    test = pa.table(
        {"doc_id": list(range(1000, 1000 + len(test_texts))), "text": test_texts}
    )
    out = (
        decontaminate(rd.from_arrow(train), rd.from_arrow(test), n=n, mode="flag")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    test_grams = {g for t in test_texts for g in _ref_ngrams(t, n)}
    for i, t in enumerate(train_texts):
        want = bool(test_grams & set(_ref_ngrams(t, n)))
        assert bool(out["contaminated"][i]) == want, (i, t)


@given(DOCS, st.integers(min_value=1, max_value=4))
@settings(max_examples=200, deadline=None)
def test_batch_shingles_match_reference(texts, k):
    """_batch_shingles (MinHash/Jaccard substrate): strict windows for docs
    with >= k tokens, ONE whole-doc shingle for shorter non-empty docs."""
    from de_ray.dataops.dedup import _batch_shingles

    vals, offs = _batch_shingles(texts, k)
    assert len(offs) == len(texts) + 1
    # build the reference gram STRINGS with the same fallback semantics
    refs = []
    for t in texts:
        toks = t.split()
        if len(toks) >= k:
            refs.append([" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)])
        elif toks:
            refs.append([" ".join(toks)])
        else:
            refs.append([])
    flat_ref = [g for r in refs for g in r]
    flat_got = vals.tolist()
    assert len(flat_got) == len(flat_ref)
    assert [offs[i + 1] - offs[i] for i in range(len(texts))] == [len(r) for r in refs]
    # hash must be a pure function of the gram string: equality structure matches
    by_hash = {}
    for h, g in zip(flat_got, flat_ref):
        assert by_hash.setdefault(h, g) == g
    by_str = {}
    for h, g in zip(flat_got, flat_ref):
        assert by_str.setdefault(g, h) == h
