"""Text analysis stages over a documents table: token counting, quality
scoring, language ID, fingerprinting. All vectorized per batch; the
regex/profile state compiles once per actor (callable classes) or once per
process (module level).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a")

# PII scrub patterns, applied in order. RE2 syntax only (pyarrow and
# DuckDB both run RE2, so the oracle mirrors these byte-for-byte).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
)


def pii_scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails / IPv4s / phone numbers from ``text_col`` in place and
    append ``n_redactions`` (match count over the ORIGINAL text, so category
    counts are order-independent). Fully vectorized: one RE2 pass per
    pattern via pyarrow.compute — no Python loop over rows."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    total = np.zeros(len(col), dtype=np.int64)
    scrubbed = col
    for _name, pat, repl in PII_PATTERNS:
        total += pc.count_substring_regex(col, pattern=pat).to_numpy(
            zero_copy_only=False
        )
        scrubbed = pc.replace_substring_regex(scrubbed, pattern=pat, replacement=repl)
    out = batch.set_column(
        batch.schema.get_field_index(text_col), text_col, scrubbed
    )
    return out.append_column("n_redactions", pa.array(total, pa.int64()))


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count, fully vectorized (split + list_value_length)."""
    toks = pc.split_pattern(batch.column(text_col), pattern=" ")
    # counts ALL split-on-space fields INCLUDING empties ('' -> 1,
    # 'a  b' -> 3): exactly DuckDB len(string_split(text, ' ')), the
    # driver oracle. term_frequencies et al. filter empties; this one
    # deliberately mirrors the SQL field count.
    n = pc.list_value_length(toks).cast(pa.int64())
    return batch.append_column("n_tokens", n)


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: length, token count, mean token length, stopword
    ratio. Deterministic and SQL-mirrorable (oracle uses the same formulas)."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    toks = pc.split_pattern(text, pattern=" ")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    # stopword ratio via pandas (list ops)
    s = text.to_pandas().str.split(" ")
    stop = s.map(lambda ws: sum(1 for w in ws if w in STOPWORDS))
    ratio = (stop / s.map(len).clip(lower=1)).astype("float64")
    mean_len = s.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
    out = batch.append_column("n_chars_calc", n_chars)
    out = out.append_column("n_tokens", n_tokens)
    out = out.append_column("stopword_ratio", pa.array(ratio, pa.float64()))
    out = out.append_column("mean_token_len", pa.array(mean_len, pa.float64()))
    return out


def quality_filter(
    ds,
    text_col: str = "text",
    min_tokens: int = 25,
    max_tokens: int = 100_000,
    max_stopword_ratio: float = 0.10,
    mean_len_range: tuple = (3.0, 7.0),
):
    """Gopher-style document quality filter: keep docs whose token count,
    stopword ratio and mean token length sit inside the configured bands.
    One vectorized map_batches pass computes signals AND applies the mask —
    dropped rows never leave the batch (no separate filter stage, no extra
    pass over text). All predicates are exact in float64 on both sides
    (integer character/token sums), so a SQL oracle matches bit-for-bit."""
    lo, hi = mean_len_range

    def batch_fn(batch: pa.Table) -> pa.Table:
        scored = quality_score_batch(batch, text_col=text_col)
        n = scored.column("n_tokens")
        mask = pc.and_(
            pc.and_(pc.greater_equal(n, min_tokens), pc.less_equal(n, max_tokens)),
            pc.and_(
                pc.less_equal(scored.column("stopword_ratio"), max_stopword_ratio),
                pc.and_(
                    pc.greater_equal(scored.column("mean_token_len"), lo),
                    pc.less_equal(scored.column("mean_token_len"), hi),
                ),
            ),
        )
        return scored.filter(mask)

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint = md5 hex of the text (content-addressable id,
    byte-stable across workers; DuckDB's md5() matches)."""
    fp = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch.column(text_col).to_pylist()]
    return batch.append_column("fingerprint", pa.array(fp, pa.string()))


def repetition_signals_batch(
    batch: pa.Table, text_col: str = "text", n: int = 2
) -> pa.Table:
    """Gopher-style repetition quality signals per document: fraction of
    duplicate word n-grams (1 - distinct/total) and the most-frequent
    n-gram's share of all n-grams. Fully vectorized: one hashed-n-gram pass
    (shared with decontamination) + a lexsort run-length scan per batch —
    no per-doc Python. Docs with fewer than ``n`` tokens report 0.0."""
    from de_ray.dataops.decontam import _batch_ngrams

    vals, offs = _batch_ngrams(batch.column(text_col).to_pylist(), n)
    counts = np.diff(offs)
    ndocs = len(counts)
    uniq = np.zeros(ndocs, dtype=np.int64)
    top = np.zeros(ndocs, dtype=np.int64)
    if len(vals):
        doc_rep = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
        order = np.lexsort((vals, doc_rep))
        sv, sd = vals[order], doc_rep[order]
        newrun = np.concatenate(
            [[True], (sd[1:] != sd[:-1]) | (sv[1:] != sv[:-1])]
        )
        run_starts = np.flatnonzero(newrun)
        run_len = np.diff(np.append(run_starts, len(sv)))
        run_doc = sd[run_starts]
        uniq = np.bincount(run_doc, minlength=ndocs)
        # per-doc max run length: reduceat over the first run index of each
        # doc that HAS runs (clipping absent docs' indices instead would
        # truncate the preceding doc's segment), scattered back
        present, first_idx = np.unique(run_doc, return_index=True)
        top[present] = np.maximum.reduceat(run_len, first_idx)
    has = counts > 0
    denom = np.maximum(counts, 1)
    # floor-quantize instead of round: both engines compute bit-identical
    # IEEE doubles from the same integers, and floor has no half-tie case
    # (numpy rounds half-to-even, DuckDB half-away — round() can diverge)
    dup_frac = np.where(has, np.floor((1.0 - uniq / denom) * 1e6) / 1e6, 0.0)
    top_frac = np.where(has, np.floor((top / denom) * 1e6) / 1e6, 0.0)
    out = batch.append_column("dup_frac", pa.array(dup_frac, pa.float64()))
    return out.append_column("top_frac", pa.array(top_frac, pa.float64()))


def term_frequencies(ds, text_col: str = "text", top_k: int | None = None):
    """Corpus term frequencies (vocabulary building): explode tokens and
    count, combiner-style — each batch emits its own (term, count)
    partials via one vectorized split+flatten+value_counts, so only the
    per-batch vocabulary crosses the shuffle, never the token stream.
    ``top_k`` adds a deterministic head (count desc, term asc)."""
    from de_ray.functions.agg import adaptive_grouped_sum

    def explode_count(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t.column(text_col), pattern=" "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table(
            {"w": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    part = ds.map_batches(explode_count, batch_format="pyarrow", batch_size=64 * 1024)
    out = adaptive_grouped_sum(part, "w", "n")
    if top_k is not None:
        out = out.sort(key=["n", "w"], descending=[True, False]).limit(top_k)
    return out


def heavy_hitters(
    ds,
    text_col: str = "text",
    k: int = 25,
    capacity: int = 4096,
    driver_limit: int = 2_000_000,
):
    """Exact top-k terms with BOUNDED per-block state (the 10^12-doc path
    ``term_frequencies`` lacks: its combiner ships every block's full
    vocabulary, so the merged key space is the whole corpus vocabulary).

    Pass 1 keeps at most ``capacity`` counters per block — a Misra-Gries
    summary (exact block counts decremented by the (capacity+1)-th
    largest; summaries of this shape merge soundly by plain summation,
    Agarwal et al., "Mergeable Summaries", PODS 2012) — so every term with
    true count > N/capacity is guaranteed to survive as a candidate.
    Pass 2 recounts ONLY the candidates exactly (one broadcast ``is_in``
    filter per batch, grouped-sum combiner). The returned top-k is exact
    whenever the k-th exact count clears the N/capacity bound; checked at
    runtime and a loud ValueError (raise ``capacity``) otherwise —
    never a silently-approximate answer."""
    import ray

    from de_ray.functions.agg import adaptive_grouped_sum

    def mg_partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t.column(text_col), pattern=" "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        words = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(counts.sum())
        pruned = 0
        if len(counts) > capacity:
            thr = np.partition(counts, -capacity - 1)[-capacity - 1]
            adj = counts - thr
            keep = adj > 0
            pruned = int((~keep).sum())
            words, counts = words.filter(pa.array(keep)), adj[keep]
        # sentinel rows (terms "" and "\x01" — tokens are filtered non-empty
        # and never contain control chars from split-on-space... "" cannot
        # appear; "\x01" could in pathological corpora but only inflates the
        # pruned indicator, which is compared to zero) carry the block's
        # token total and pruned-term count so the final can evaluate BOTH
        # the N/capacity guarantee and completeness without another pass
        return pa.table(
            {
                "w": pa.concat_arrays(
                    [
                        words.cast(pa.large_string()),
                        pa.array(["", "\x01"], pa.large_string()),
                    ]
                ),
                "n": pa.array(np.concatenate([counts, [total, pruned]]), pa.int64()),
            }
        )

    part = ds.map_batches(
        mg_partial, batch_format="pyarrow", batch_size=64 * 1024
    ).materialize()
    merged = adaptive_grouped_sum(part, "w", "n", limit=driver_limit).materialize()

    _empty = pa.table(
        {"w": pa.array([], pa.large_string()), "n": pa.array([], pa.int64())}
    )

    def _sel(t: pa.Table, sentinel: "str | None") -> pa.Table:
        if t.num_rows == 0 or "w" not in t.schema.names:  # schema-less empties
            return _empty
        if sentinel is not None:
            return t.filter(pc.equal(t.column("w"), sentinel))
        keep = pc.and_(
            pc.not_equal(t.column("w"), ""), pc.not_equal(t.column("w"), "\x01")
        )
        return t.filter(keep)

    n_total = sum(
        r["n"]
        for r in merged.map_batches(
            lambda t: _sel(t, ""), batch_format="pyarrow"
        ).take_all()
    )
    n_pruned = sum(
        r["n"]
        for r in merged.map_batches(
            lambda t: _sel(t, "\x01"), batch_format="pyarrow"
        ).take_all()
    )
    cand_tbl = pa.concat_tables(
        [
            tb if isinstance(tb, pa.Table) else pa.Table.from_batches([tb])
            for tb in ray.get(
                merged.map_batches(lambda t: _sel(t, None), batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            # a fully-empty merge leaves zero-COLUMN blocks behind (Ray
            # schema amnesia on empties) — drop them before concat
            if "w" in (tb.schema.names if isinstance(tb, pa.Table) else tb.schema.names)
        ]
        or [_empty]
    )
    cand = pa.array(
        cand_tbl.column("w").to_pylist(), pa.large_string()
    )  # one plain Array for pc.is_in's value_set
    cand_ref = ray.put(cand)

    def recount(t: pa.Table, _ref=cand_ref) -> pa.Table:
        cands = ray.get(_ref)
        flat = pc.list_flatten(pc.split_pattern(t.column(text_col), pattern=" "))
        flat = flat.filter(pc.is_in(flat, value_set=cands))
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "w": vc.field("values").cast(pa.large_string()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    exact = adaptive_grouped_sum(
        ds.map_batches(recount, batch_format="pyarrow", batch_size=64 * 1024),
        "w",
        "n",
        limit=driver_limit,
    )
    head = exact.sort(key=["n", "w"], descending=[True, False]).limit(k).take_all()
    bound = n_total / capacity
    if head and n_pruned > 0 and head[-1]["n"] <= bound:
        raise ValueError(
            f"heavy_hitters: k-th count {head[-1]['n']} does not clear the "
            f"Misra-Gries guarantee N/capacity = {bound:.1f} — result would "
            f"not be provably exact; raise capacity (= {capacity})"
        )
    if len(head) < k and n_pruned > 0:
        # fewer than k candidates survived AND blocks pruned terms: the
        # missing ranks may hide behind the bound — refuse to return a
        # silently-truncated top-k (when nothing was pruned the short head
        # IS the complete exact ranking: the corpus has < k distinct terms)
        raise ValueError(
            f"heavy_hitters: only {len(head)} candidates for k={k} after "
            f"Misra-Gries pruning — ranks beyond {len(head)} are below the "
            f"N/capacity guarantee; raise capacity (= {capacity})"
        )
    import ray.data as _rd

    return _rd.from_items(head) if head else exact.limit(0)


def doc_frequencies(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(term, df) — number of DOCS containing each term. Combiner shape:
    each batch counts its per-doc-unique terms vectorized, partials merge
    size-adaptively."""
    from de_ray.functions.agg import adaptive_grouped_sum

    def explode_unique(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col), pattern=" ")
        offs = np.concatenate([[0], np.cumsum(pc.list_value_length(toks).to_numpy())])
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(np.arange(len(t)), np.diff(offs))
        keep = flat != ""
        # unique (doc, term) pairs without a Python loop
        dfp = pd.DataFrame({"i": ids[keep], "w": flat[keep]}).drop_duplicates()
        vc = dfp.groupby("w", sort=False).size()
        return pa.table(
            {"w": pa.array(vc.index, pa.large_string()), "df": pa.array(vc.to_numpy(), pa.int64())}
        )

    part = ds.map_batches(explode_unique, batch_format="pyarrow", batch_size=64 * 1024)
    return adaptive_grouped_sum(part, "w", "df")


def _tf_frame_fn(id_col: str, text_col: str):
    """Per-batch (doc, term, tf) frame — one split/flatten/groupby pass.
    Shared by tfidf_top_terms and unigram_logprob_score (their broadcast
    and distributed branches both consume this shape)."""

    def _tf_frame(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t.column(text_col), pattern=" ")
        offs = np.diff(
            np.concatenate([[0], np.cumsum(pc.list_value_length(toks).to_numpy())])
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(t.column(id_col).to_numpy(zero_copy_only=False), offs)
        keep = flat != ""
        return (
            pd.DataFrame({id_col: doc_ids[keep], "w": flat[keep]})
            .groupby([id_col, "w"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )

    return _tf_frame


def tfidf_top_terms(
    ds,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 5_000_000,
):
    """Top-``top_n`` TF-IDF terms per document (tf · ln(N/df), ties by
    term). Two passes: (A) global (term, df) vocabulary — combiner +
    size-adaptive merge — broadcast ONCE via the object store; (B) each
    batch scores and ranks its own documents with a local hash join
    against the broadcast vocabulary — zero shuffle. Raises above
    ``broadcast_limit`` vocabulary terms (the fallback would be a
    distributed tf⋈df join on the term; not needed at current scales and
    kept loud rather than silent)."""
    import ray

    from de_ray.state.broadcast import get_broadcast

    n_docs = ds.count()
    vocab = doc_frequencies(ds, id_col=id_col, text_col=text_col).materialize()

    _tf_frame = _tf_frame_fn(id_col, text_col)

    def _rank(s: pd.DataFrame) -> pd.DataFrame:
        s = s.assign(tfidf=(s["tf"] * np.log(n_docs / s["df"])).round(6))
        s = s.sort_values([id_col, "tfidf", "w"], ascending=[True, False, True])
        out = s.groupby(id_col, sort=False).head(top_n)
        return out[[id_col, "w", "tfidf"]].reset_index(drop=True)

    if vocab.count() <= broadcast_limit:
        vocab_ref = ray.put(pa.Table.from_pandas(vocab.to_pandas()))

        def _to_df(tbl: pa.Table) -> pd.DataFrame:
            return tbl.to_pandas()

        def score(t: pa.Table) -> pd.DataFrame:
            vdf = get_broadcast(vocab_ref, _to_df)
            return _rank(_tf_frame(t).merge(vdf, on="w"))

        return ds.map_batches(score, batch_format="pyarrow", batch_size=16 * 1024)

    # huge vocabulary: distributed tf⋈df hash join on the term, then a
    # second shuffle re-collects each doc's rows for the top-k
    from de_ray.dataops.joins import equi_join
    from de_ray.functions.agg import adaptive_grouped_apply

    tf_ds = ds.map_batches(_tf_frame, batch_format="pyarrow", batch_size=16 * 1024)
    joined = equi_join(
        tf_ds, vocab, on_left="w", on_right="w", broadcast_limit=broadcast_limit
    )
    return adaptive_grouped_apply(joined, id_col, _rank)


def unigram_logprob_score(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 5_000_000,
):
    """CCNet-style LM quality score: per-doc mean token log-probability
    under a unigram model fitted on the corpus itself (two passes, like
    ``tfidf_top_terms``): (A) global (term, count) frequencies — combiner
    + size-adaptive merge — broadcast ONCE via the object store; (B) each
    batch scores its own documents with a local hash join against the
    broadcast table — zero shuffle. score = Σ tf·ln(n_w/T) / Σ tf,
    rounded to 6 dp (ln on bit-identical IEEE doubles both sides, same
    convention as TF-IDF). Above ``broadcast_limit`` vocabulary terms the
    scorer switches to a distributed tf⋈freq join on the term."""
    import ray

    from de_ray.state.broadcast import get_broadcast

    vocab = term_frequencies(ds, text_col=text_col).materialize()
    tot = vocab.sum("n")  # None on a fully-empty corpus
    if tot is None:
        from de_ray.functions.agg import from_pandas_keep_schema

        return from_pandas_keep_schema(
            pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 "lm_score": pd.Series(dtype="float64")}
            )
        )
    total = int(tot)

    _tf_frame = _tf_frame_fn(id_col, text_col)

    def _score(s: pd.DataFrame) -> pd.DataFrame:
        s = s.assign(lp=s["tf"] * np.log(s["n"] / total))
        g = s.groupby(id_col, sort=False, as_index=False).agg(
            lp=("lp", "sum"), tf=("tf", "sum")
        )
        g["lm_score"] = (g["lp"] / g["tf"]).round(6)
        return g[[id_col, "lm_score"]]

    if vocab.count() <= broadcast_limit:
        vocab_ref = ray.put(pa.Table.from_pandas(vocab.to_pandas()))

        def _to_df(tbl: pa.Table) -> pd.DataFrame:
            return tbl.to_pandas()

        def score(t: pa.Table) -> pd.DataFrame:
            vdf = get_broadcast(vocab_ref, _to_df)
            return _score(_tf_frame(t).merge(vdf, on="w"))

        return ds.map_batches(score, batch_format="pyarrow", batch_size=16 * 1024)

    from de_ray.dataops.joins import equi_join
    from de_ray.functions.agg import adaptive_grouped_apply

    tf_ds = ds.map_batches(_tf_frame, batch_format="pyarrow", batch_size=16 * 1024)
    joined = equi_join(
        tf_ds, vocab, on_left="w", on_right="w", broadcast_limit=broadcast_limit
    )
    return adaptive_grouped_apply(joined, id_col, _score)


def rolling_fingerprint_batch(batch: pa.Table, text_col: str = "text", window: int = 8) -> pa.Table:
    """Rolling (Rabin-Karp-style) 64-bit hash over byte windows, min-sampled:
    a shift-resistant fingerprint (winnowing lite). Deterministic."""
    B = np.uint64(1000003)
    out = []
    for t in batch.column(text_col).to_pylist():
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < window:
            out.append(int(b.sum()) if len(b) else 0)
            continue
        # polynomial rolling hash of each window, vectorized via cumulative trick
        pw = B ** np.arange(window, dtype=np.uint64)
        h = np.convolve(b, pw[::-1], mode="valid").astype(np.uint64)
        # mask to int63 (repo convention for hash columns, see dedup.py):
        # raw uint64 minima above 2^63 overflow the int64 arrow column
        out.append(int(h.min() & 0x7FFFFFFFFFFFFFFF))
    return batch.append_column("rolling_fp", pa.array(out, pa.int64()))


class LangId:
    """Ranked character-bigram language identifier (actor-pool stage):
    Cavnar–Trenkle out-of-place rank distance against per-language ranked
    bigram profiles (the classic "N-Gram-Based Text Categorization" method;
    profiles are well-known frequency orderings for each language).

    Profile rank dicts build once per actor in ``__init__``; per document
    the top-K document bigrams (with ``_`` as the word boundary) are ranked
    and scored with Σ|rank_doc − rank_profile| (missing → max penalty)."""

    # most-frequent-first character bigrams per language ("_" = word
    # boundary — in running text boundary bigrams dominate the ranking, so
    # profiles lead with each language's characteristic word endings and
    # function-word starts)
    PROFILES = {
        "en": "_t th he e_ t_ s_ d_ an in er n_ re on at en nd _a o_ ti es "
              "or te of ed is it al ar st to nt ng se ha as ou",
        "de": "n_ en er e_ r_ ch _d de ei nd ie in te _s ge es t_ un st ne "
              "re he an be se ng di sc ic is le da ns _e _a",
        "fr": "e_ _l es le _d de s_ t_ en re nt on er te el an se la et ai "
              "_e _a _p it me ou ie ur ne qu co ar _s _c",
        "es": "o_ a_ s_ _e de en el la es os as _d _l er ar n_ ue ra al an "
              "on nt ad st or se do re ta co _c _s _p e_",
        "it": "o_ a_ i_ e_ di la _d _s er re to ll el ta co ne on en al no "
              "an ar ti in at le _c ch ri te ca or si _p",
        "pt": "o_ a_ s_ _d de os _a _c ar es ra as do da m_ en er qu nt em "
              "co ad ao re se or ma e_ st ta is _p _e",
    }
    TOP_K = 36

    def __init__(self):
        self.profiles = {
            lang: {bg: i for i, bg in enumerate(p.split())}
            for lang, p in self.PROFILES.items()
        }

    def predict(self, text: str) -> str:
        from collections import Counter

        t = "_" + "_".join(text.lower().split()) + "_"
        counts = Counter(t[i : i + 2] for i in range(len(t) - 1))
        doc_rank = {
            bg: i for i, (bg, _c) in enumerate(
                sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: self.TOP_K]
            )
        }
        best, best_d = "en", float("inf")
        for lang, prof in sorted(self.profiles.items()):
            miss = len(prof)
            d = sum(
                abs(r - prof[bg]) if bg in prof else miss
                for bg, r in doc_rank.items()
            )
            if d < best_d:
                best, best_d = lang, d
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def analyze_documents(ds, with_lang_id: bool = False, concurrency=(1, 4)):
    """documents Dataset → + n_tokens, quality metrics, fingerprint columns."""
    ds = ds.map_batches(quality_score_batch, batch_format="pyarrow", batch_size=8192)
    ds = ds.map_batches(fingerprint_batch, batch_format="pyarrow", batch_size=8192)
    if with_lang_id:
        ds = ds.map_batches(
            LangId, batch_format="pyarrow", batch_size=8192, concurrency=concurrency
        )
    return ds


def bm25_topk(
    ds,
    query_terms,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 retrieval over the corpus for a constant term list:
    top-k documents by ``Σ_t idf_t · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``
    with the Lucene idf ``ln((N−df+0.5)/(df+0.5)+1)``.

    Two passes, both zero-shuffle: (A) corpus statistics — each batch
    emits ONE row (doc count, token count, per-query-term doc frequency),
    merged on the driver (n_blocks rows, never data rows); (B) each batch
    scores its own docs vectorized (one token explode, one bincount per
    query term) and keeps its local top-k, so the driver merge sees at
    most k·n_blocks rows. Scores round to 6 dp BEFORE the cut; ties break
    on the id — the deterministic, SQL-replicable convention.
    """
    import numpy as np
    import pandas as pd

    terms = list(query_terms)
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("query_terms must be a non-empty list of distinct terms")

    def _explode(t: pa.Table):
        toks = pc.split_pattern(t.column(text_col), pattern=" ")
        lens = pc.list_value_length(toks).to_numpy()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t)), lens)
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        dl = np.bincount(doc_idx, minlength=len(t)).astype(np.int64)
        tf = np.empty((len(t), len(terms)), dtype=np.int64)
        for i, w in enumerate(terms):
            tf[:, i] = np.bincount(doc_idx[flat == w], minlength=len(t))
        return dl, tf

    def stats_partial(t: pa.Table) -> pd.DataFrame:
        dl, tf = _explode(t)
        row = {"n_docs": len(t), "n_tokens": int(dl.sum())}
        for i in range(len(terms)):
            row[f"df{i}"] = int((tf[:, i] > 0).sum())
        return pd.DataFrame([row])

    st = (
        ds.select_columns([text_col])
        .map_batches(stats_partial, batch_format="pyarrow", batch_size=64 * 1024)
        .to_pandas()
        .sum()
    )
    n_docs, avgdl = int(st["n_docs"]), st["n_tokens"] / st["n_docs"]
    df = np.array([int(st[f"df{i}"]) for i in range(len(terms))], dtype=np.float64)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(t: pa.Table) -> pd.DataFrame:
        dl, tf = _explode(t)
        denom = tf + k1 * (1.0 - b + b * (dl / avgdl))[:, None]
        s = np.round((idf * (tf * (k1 + 1.0)) / denom).sum(axis=1), 6)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        hit = tf.sum(axis=1) > 0
        out = pd.DataFrame({id_col: ids[hit], "bm25": s[hit]})
        return out.sort_values(
            ["bm25", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    parts = ds.map_batches(score, batch_format="pyarrow", batch_size=64 * 1024)
    final = parts.to_pandas().sort_values(
        ["bm25", id_col], ascending=[False, True], kind="mergesort"
    )
    return final.head(k).reset_index(drop=True)


def lm_quality_buckets(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    qs=(0.35, 0.7),
    labels=("tail", "middle", "head"),
):
    """CCNet-style head/middle/tail corpus split: score every document with
    the corpus-fitted unigram LM (:func:`unigram_logprob_score`), compute
    per-stratum EXACT discrete score quantiles (``grouped_quantile_disc`` —
    bucket-vectorized, no global sort), then label each doc by which side
    of its own language's thresholds it falls (score ≤ q_lo → tail,
    ≤ q_hi → middle, else head).

    Scale shape: the only wide ops are the scorer's vocabulary reduce and
    the per-stratum quantile resolve (|strata| rows); the final labeling
    pass is a zero-shuffle per-batch kernel against the tiny threshold
    table (|strata| × 2 floats, shipped in the task closure).
    """
    import numpy as np
    import pandas as pd

    from de_ray.dataops.joins import equi_join
    from de_ray.dataops.stats import grouped_quantile_disc

    if len(qs) != 2 or not (0 < qs[0] < qs[1] <= 1):
        raise ValueError(f"qs must be two increasing quantiles in (0,1], got {qs}")

    scores = unigram_logprob_score(ds, id_col=id_col, text_col=text_col)
    scored = equi_join(
        scores,
        ds.select_columns([id_col, strata_col]),
        on_left=id_col,
        on_right=id_col,
    )
    from de_ray.functions.agg import to_pandas_keep_schema

    qlo, qhi = (f"q{round(q * 100)}" for q in qs)
    thr = to_pandas_keep_schema(
        grouped_quantile_disc(scored, strata_col, "lm_score", list(qs))
    )
    if thr.shape[1] == 0:  # empty corpus: no thresholds, no buckets
        thr = pd.DataFrame(
            {strata_col: pd.Series(dtype=object)}
            | {f"q{round(q * 100)}": pd.Series(dtype="float64") for q in qs}
        )
    # NULL strata get their own thresholds (SQL PARTITION BY semantics);
    # a NaN-keyed dict is unreachable through Series.map, so key them with
    # the shared sentinel (adversarial-contract-fuzz finding, round 5)
    from de_ray.functions.agg import null_safe_key

    tkey = null_safe_key(thr[strata_col])
    lo = dict(zip(tkey, thr[qlo]))
    hi = dict(zip(tkey, thr[qhi]))

    def label(df: pd.DataFrame) -> pd.DataFrame:
        s = df["lm_score"].to_numpy()
        g = null_safe_key(df[strata_col])
        lo_v = g.map(lo).to_numpy(dtype=float)
        hi_v = g.map(hi).to_numpy(dtype=float)
        b = np.where(s <= lo_v, labels[0], np.where(s <= hi_v, labels[1], labels[2]))
        return df.assign(bucket=b)[[id_col, strata_col, "lm_score", "bucket"]]

    return scored.map_batches(label, batch_format="pandas")


def normalize_text_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "norm_text"
) -> pa.Table:
    """Canonical text normalization before hashing/dedup: lowercase →
    Unicode NFC → collapse all whitespace runs to one space → strip.
    Pure per-row column kernel (vectorized pandas string ops), zero
    shuffle; order matches the SQL oracle
    ``trim(regexp_replace(nfc_normalize(lower(text)), '\\s+', ' ', 'g'))``
    exactly."""
    import pandas as pd

    s = pd.Series(batch.column(text_col).to_pandas())
    # RE2's \s is ASCII-only ([\t\n\f\r\v ]); Python-re's is Unicode.
    # Use the explicit ASCII class (and strip the same set) so the oracle
    # claim holds for corpora containing \u00a0-style Unicode whitespace.
    ws = " \t\n\r\f\v"
    norm = (
        s.str.lower()
        .str.normalize("NFC")
        .str.replace(r"[ \t\n\r\f\v]+", " ", regex=True)
        .str.strip(ws)
    )
    return batch.append_column(out_col, pa.array(norm, pa.string()))


def corpus_report(ds, text_col: str = "text", strata_col: str = "lang"):
    """One-row corpus health report: doc/token counts, mean char length,
    stratum count and the Shannon entropy (nats) of the stratum
    distribution — the summary a curation run logs per snapshot. One
    combiner pass (a row per (block, stratum)); the driver final touches
    |strata| rows."""
    import pandas as pd

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t.column(text_col), pattern=" ")
        lens = pc.list_value_length(toks).to_numpy()
        nonempty = pc.not_equal(pc.list_flatten(toks), "").to_numpy(
            zero_copy_only=False
        )
        doc_idx = np.repeat(np.arange(len(t)), lens)
        per_doc_toks = np.bincount(doc_idx[nonempty], minlength=len(t))
        df = pd.DataFrame(
            {
                strata_col: t.column(strata_col).to_pandas(),
                "chars": pc.utf8_length(t.column(text_col)).to_numpy(
                    zero_copy_only=False
                ),
                "toks": per_doc_toks,
            }
        )
        # dropna=False: NULL strata are real docs — dropping them silently
        # under-counted n_docs/n_tokens AND lost a stratum from the
        # entropy (adversarial-contract-fuzz finding, round 5)
        return df.groupby(strata_col, as_index=False, dropna=False).agg(
            n=(strata_col, "size"), chars=("chars", "sum"), toks=("toks", "sum")
        )

    from de_ray.functions.agg import to_pandas_keep_schema

    parts = ds.select_columns([strata_col, text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=64 * 1024
    )
    raw = to_pandas_keep_schema(parts.materialize())
    if raw.shape[1] == 0 or raw.empty:
        # empty corpus: a well-typed zero report, not a groupby KeyError
        # or a 0/0 (review r5)
        return pd.DataFrame(
            [
                {
                    "n_docs": 0,
                    "n_tokens": 0,
                    "avg_chars": float("nan"),
                    "n_strata": 0,
                    "strata_entropy": float("nan"),
                }
            ]
        )
    dfp = raw.groupby(strata_col, as_index=False, dropna=False).sum()
    N, C, T = int(dfp["n"].sum()), int(dfp["chars"].sum()), int(dfp["toks"].sum())
    p = dfp["n"].to_numpy() / N
    entropy = round(-float(np.sum(p * np.log(p))), 6)
    return pd.DataFrame(
        [
            {
                "n_docs": N,
                "n_tokens": T,
                "avg_chars": round(C / N, 6),
                "n_strata": len(dfp),
                "strata_entropy": entropy,
            }
        ]
    )


def top_pmi_bigrams(
    ds,
    text_col: str = "text",
    k: int = 25,
    min_count: int = 5,
):
    """Collocation mining: top-k adjacent-token bigrams by pointwise
    mutual information ``ln((c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)))``
    among bigrams with count ≥ ``min_count``. Two combiner-first counting
    passes (bigrams, unigrams) — only distinct (pair, count) partials
    shuffle; the PMI formula runs on the ≥min_count survivors (a small
    set by construction) with the same float64 op order the SQL oracle
    uses; ties break on the pair. Output: (a, b, n, pmi)."""
    import pandas as pd

    from de_ray.functions.agg import adaptive_grouped_sum

    def bi_partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t.column(text_col), pattern=" ")
        lens = pc.list_value_length(toks).to_numpy()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t)), lens)
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        if len(flat) < 2:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=str),
                    "b": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        same = doc_idx[1:] == doc_idx[:-1]
        return (
            pd.DataFrame({"a": flat[:-1][same], "b": flat[1:][same]})
            .groupby(["a", "b"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    bi = adaptive_grouped_sum(
        ds.map_batches(bi_partial, batch_format="pyarrow", batch_size=32 * 1024),
        ["a", "b"],
        "n",
    ).materialize()
    uni = term_frequencies(ds, text_col=text_col).materialize()
    n_uni = int(uni.sum("n"))
    n_bi = int(bi.sum("n"))

    # scale shape: the ≥min_count candidates and the vocabulary both stay
    # Datasets — two size-adaptive joins attach the unigram counts, the
    # PMI formula runs per batch, and only k rows per block reach the
    # driver (partial top-k), never the candidate set itself
    from de_ray.dataops.joins import equi_join

    cand = bi.filter(expr=f"n >= {min_count}")
    ca = uni.map_batches(
        lambda df: df.rename(columns={"w": "a", "n": "ca"}), batch_format="pandas"
    )
    cb = uni.map_batches(
        lambda df: df.rename(columns={"w": "b", "n": "cb"}), batch_format="pandas"
    )
    joined = equi_join(
        equi_join(cand, ca, on_left="a", on_right="a"), cb, on_left="b", on_right="b"
    )

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            pmi=np.round(
                np.log(
                    (df["n"] / n_bi) / ((df["ca"] / n_uni) * (df["cb"] / n_uni))
                ),
                6,
            )
        )
        return df.sort_values(
            ["pmi", "a", "b"], ascending=[False, True, True], kind="mergesort"
        )[["a", "b", "n", "pmi"]].head(k)

    parts = joined.map_batches(score_topk, batch_format="pandas").to_pandas()
    out = parts.sort_values(
        ["pmi", "a", "b"], ascending=[False, True, True], kind="mergesort"
    )
    return out.head(k).reset_index(drop=True)


# BPE-ish pretokenizer (GPT-2-style split classes, RE2-safe: no lookahead —
# pyarrow and DuckDB both run RE2, so the oracle counts the SAME matches):
# optional-space word | optional-space number | optional-space punct run |
# whitespace run.
BPE_SPLIT_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "n_bpe_tokens"
) -> pa.Table:
    """Sub-word-ish token count: matches of the BPE pretokenizer split
    regex (the cost model LLM pipelines budget with, vs whitespace words).
    One vectorized RE2 pass per batch."""
    n = pc.count_substring_regex(batch.column(text_col), pattern=BPE_SPLIT_RE)
    return batch.append_column(out_col, n.cast(pa.int64()))
