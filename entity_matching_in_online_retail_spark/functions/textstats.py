"""Text analysis for training-data pipelines: language-ID heuristic, quality
scoring, token counting, document fingerprinting. All Catalyst built-ins
(whole-stage codegen) — no Python on any of these paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny function-word lists for the n-gram/stopword language heuristic.
# Deliberately small + frozen: this is a heuristic operator, not a model.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "por", "con"],
}


def lang_scores(tokens_col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over a token array."""
    return {
        lang: F.size(F.array_intersect(tokens_col, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(tokens_col: Column, default: str = "und") -> Column:
    """argmax language by stopword overlap; 'und' when nothing matches."""
    scores = lang_scores(tokens_col)
    best = F.greatest(*scores.values())
    expr = F.lit(default)
    # reverse order so earlier languages win ties deterministically
    for lang in reversed(list(scores)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit(default))


def token_count_ws(text_col: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text_col)
    return F.when(
        F.length(t) > 0, F.size(F.split(t, r"\s+"))
    ).otherwise(F.lit(0))


def token_count_bpe_ish(text_col: Column) -> Column:
    """BPE-ish token count: runs of letters, runs of digits, and individual
    other non-space characters each count as one token — a cheap proxy for
    subword tokenizers."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text_col), F.lit(r"([\p{L}]+|[0-9]+|[^\p{L}0-9\s])"), 1
        )
    )


def punct_ratio(text_col: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text_col, r"[\p{L}\p{N}\s]", ""))
    return F.when(
        F.length(text_col) > 0, n_punct.cast("double") / F.length(text_col)
    ).otherwise(F.lit(0.0))


def alpha_ratio(text_col: Column) -> Column:
    n_alpha = F.length(F.regexp_replace(text_col, r"[^\p{L}]", ""))
    return F.when(
        F.length(text_col) > 0, n_alpha.cast("double") / F.length(text_col)
    ).otherwise(F.lit(0.0))


def stopword_ratio(tokens_col: Column, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    hits = F.size(F.array_intersect(tokens_col, F.array(*[F.lit(w) for w in words])))
    return F.when(
        F.size(tokens_col) > 0, hits.cast("double") / F.size(tokens_col)
    ).otherwise(F.lit(0.0))


def mean_word_len(tokens_col: Column) -> Column:
    total = F.aggregate(
        tokens_col, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return F.when(
        F.size(tokens_col) > 0, total.cast("double") / F.size(tokens_col)
    ).otherwise(F.lit(0.0))


def quality_score(text_col: Column, tokens_col: Column) -> Column:
    """Composite [0,1] quality: favors alphabetic text with sane word lengths,
    penalizes punctuation soup and very short documents. Frozen formula."""
    length_term = F.least(F.length(text_col).cast("double") / 200.0, F.lit(1.0))
    wl = mean_word_len(tokens_col)
    wordlen_term = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    score = (
        0.35 * alpha_ratio(text_col)
        + 0.25 * (1.0 - F.least(punct_ratio(text_col) * 4.0, F.lit(1.0)))
        + 0.2 * length_term
        + 0.2 * wordlen_term
    )
    return F.round(score, 6)


def doc_fingerprint(tokens_col: Column, w: int = 8) -> Column:
    """Min-w sketch fingerprint: the w smallest xxhash64 token hashes,
    sorted — a compact, order-insensitive document signature (containment
    sketches / fast near-dup prefilter)."""
    hashes = F.sort_array(F.transform(tokens_col, lambda t: F.xxhash64(t)))
    return F.slice(hashes, 1, w)
