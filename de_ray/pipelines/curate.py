"""End-to-end training-data curation: the composition a 100 TB corpus run
actually executes, built entirely from the repo's streaming operators.

    raw docs ──quality_filter──▶ kept ──decontaminate(drop)──▶ clean
        ──exact_dedup──▶ unique ──unigram_logprob_score──▶ (doc_id, lm_score)

Every stage keeps Ray Data's streaming shape: the quality filter fuses
signals + mask into one batch pass, decontamination probes a broadcast
n-gram table (no shuffle), exact dedup is combiner + size-adaptive final
(one row per (batch, key) crosses the exchange), and the LM score is the
two-pass broadcast join. The only all-to-all is the dedup groupby.
"""

from __future__ import annotations

import ray.data as rd

from de_ray.dataops.decontam import decontaminate
from de_ray.dataops.dedup import exact_dedup
from de_ray.dataops.text import quality_filter, unigram_logprob_score


def curate_corpus(
    docs: rd.Dataset,
    test_docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 25,
    max_tokens: int = 100_000,
    max_stopword_ratio: float = 0.10,
    mean_len_range: tuple = (3.0, 7.0),
    ngram_n: int = 5,
) -> rd.Dataset:
    """Curate ``docs`` against a held-out ``test_docs`` set; returns
    ``(id_col, lm_score)`` for every surviving document. The LM model is
    fitted on the SURVIVORS (post-filter/dedup corpus), matching how a
    quality model would be trained on the cleaned pool."""
    kept = quality_filter(
        docs,
        text_col=text_col,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        max_stopword_ratio=max_stopword_ratio,
        mean_len_range=mean_len_range,
    ).select_columns([id_col, text_col])
    clean = decontaminate(
        kept, test_docs, id_col=id_col, text_col=text_col, n=ngram_n, mode="drop"
    )
    unique = exact_dedup(clean, key_col=text_col, id_col=id_col).select_columns(
        [id_col, text_col]
    )
    return unigram_logprob_score(unique, id_col=id_col, text_col=text_col)
