"""Deterministic synthetic web-pages corpus + labeled pairs (FIXTURES.md).

Shape is fixed by BASELINE.json's input_hint: an (Iceberg) table of
Common-Crawl-style web pages with columns
(url string, warc_ts timestamp, html binary, text string, lang string).

Ground truth: E entities; each member row is a perturbed copy of its entity's
canonical product-offer text (token drops/swaps, 1-2 char typos, case/punct
noise, brand abbreviation, price jitter). Entities are single-language so the
lang='en' gate never splits a ground-truth cluster. Everything is seeded
(seed=42) and pure-function deterministic — no external data, no wall clock.

text layout: "{brand} {model} {title words} {spec words} price {price}"
html layout: "<html><head><title>{title}</title></head><body><p>{text}</p></body></html>"
(simple enough that the frozen extractor is byte-exact; see functions/text.py)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

SEED = 42
EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z (fixed, no wall clock)

_CONSONANT = list("bcdfghklmnprstvz")
_VOWEL = list("aeiou")


def _word(rng: np.random.Generator, syllables: int) -> str:
    return "".join(
        rng.choice(_CONSONANT) + rng.choice(_VOWEL) for _ in range(syllables)
    )


def _vocab(rng: np.random.Generator, n: int, syllables: int) -> list[str]:
    out: set[str] = set()
    while len(out) < n:
        out.add(_word(rng, syllables))
    return sorted(out)


@dataclass
class Corpus:
    web_pages: pd.DataFrame  # url, warc_ts, html, text, lang
    labeled_pairs: pd.DataFrame  # url_l, url_r, label
    truth: pd.DataFrame  # url, entity_id  (en-only ground truth)


def _perturb_tokens(rng: np.random.Generator, tokens: list[str]) -> list[str]:
    toks = list(tokens)
    # token drops (p=.1), keep at least 4 tokens
    keep = rng.random(len(toks)) >= 0.1
    toks = [t for t, k in zip(toks, keep) if k] or toks[:4]
    if len(toks) < 4:
        toks = list(tokens[:4])
    # adjacent swap
    if len(toks) > 3 and rng.random() < 0.5:
        i = int(rng.integers(0, len(toks) - 1))
        toks[i], toks[i + 1] = toks[i + 1], toks[i]
    # 1-2 char typos in one non-first token
    if rng.random() < 0.6 and len(toks) > 2:
        i = int(rng.integers(1, len(toks)))
        w = list(toks[i])
        for _ in range(int(rng.integers(1, 3))):
            j = int(rng.integers(0, len(w)))
            w[j] = str(rng.choice(_CONSONANT + _VOWEL))
        toks[i] = "".join(w)
    # case noise
    if rng.random() < 0.3:
        i = int(rng.integers(0, len(toks)))
        toks[i] = toks[i].upper()
    return toks


def generate_corpus(
    n_entities: int = 50,
    hot_entities: int = 1,
    hot_size: int = 30,
    seed: int = SEED,
    n_domains: int = 50,
    dup_url_frac: float = 0.05,
) -> Corpus:
    """Generate the deterministic corpus at a given entity count.

    Scales per FIXTURES.md: tiny E=50 (~300 rows), small E=2000 (~12k rows),
    bench E=50000 (~300k rows, hot_size=200).
    """
    rng = np.random.default_rng(seed)
    brands = _vocab(rng, 200, 3)
    nouns = _vocab(rng, 2000, 2)
    categories = _vocab(rng, 12, 2)
    domains = [f"{_word(rng, 3)}.com" for _ in range(n_domains)]
    # Zipf(s=1.2) domain weights — skew exercises salting.
    dw = 1.0 / np.arange(1, n_domains + 1) ** 1.2
    dw /= dw.sum()
    langs = np.array(["en", "de", "fr", "es", "zh"])
    lang_w = np.array([0.70, 0.10, 0.08, 0.07, 0.05])

    rows: list[tuple] = []
    truth: list[tuple[str, int]] = []
    entity_urls: list[list[str]] = []
    entity_lang: list[str] = []
    entity_brand: list[str] = []
    entity_cat: list[str] = []

    # cluster sizes ~ Zipf-truncated in [1, 40] + a few hot entities
    sizes = np.minimum(rng.zipf(1.6, n_entities), 40)
    sizes[:hot_entities] = hot_size

    for e in range(n_entities):
        brand = brands[int(rng.integers(0, len(brands)))]
        cat = categories[int(rng.integers(0, len(categories)))]
        model = f"{_word(rng, 2)}{int(rng.integers(100, 9999))}"
        title_words = [nouns[int(i)] for i in rng.integers(0, len(nouns), 6)]
        spec_words = [nouns[int(i)] for i in rng.integers(0, len(nouns), 10)]
        price = float(np.round(rng.uniform(5, 2500), 2))
        lang = str(rng.choice(langs, p=lang_w))
        canonical = [brand, model, *title_words, *spec_words]
        urls: list[str] = []
        for m in range(int(sizes[e])):
            toks = _perturb_tokens(rng, canonical)
            # brand abbreviation noise
            if rng.random() < 0.1:
                toks[0] = toks[0][:3]
            p = price * float(1 + rng.uniform(-0.03, 0.03))
            text = " ".join(toks) + f" price {p:.2f}"
            title = " ".join(toks[:4])
            dom = domains[int(rng.choice(n_domains, p=dw))]
            slug = "-".join(toks[2:4]) if len(toks) > 3 else toks[0]
            url = f"https://{dom}/{cat}/{slug}-{e}-{m}"
            html = (
                f"<html><head><title>{title}</title></head>"
                f"<body><p>{text}</p></body></html>"
            ).encode("utf-8")
            ts = EPOCH_2024 + int(rng.integers(0, 180 * 86400))
            rows.append((url, ts, html, text, lang))
            urls.append(url)
            if lang == "en":
                truth.append((url, e))
        entity_urls.append(urls)
        entity_lang.append(lang)
        entity_brand.append(brand)
        entity_cat.append(cat)

    # ~5% re-crawled urls: same url, later warc_ts, identical html/text
    n_dup = int(len(rows) * dup_url_frac)
    for i in rng.choice(len(rows), size=n_dup, replace=False):
        url, ts, html, text, lang = rows[int(i)]
        rows.append((url, ts + int(rng.integers(1, 30 * 86400)), html, text, lang))

    pages = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    pages["warc_ts"] = pd.to_datetime(pages["warc_ts"], unit="s")

    # labeled pairs over en entities: ~25% positives, hard negatives
    # (same brand, different entity), ~10% easy random negatives.
    en_idx = [i for i in range(n_entities) if entity_lang[i] == "en"]
    pos: list[tuple[str, str, int]] = []
    for e in en_idx:
        urls = entity_urls[e]
        if len(urls) < 2:
            continue
        n_pairs = min(len(urls), 12)
        for _ in range(n_pairs):
            a, b = rng.choice(len(urls), size=2, replace=False)
            ul, ur = sorted((urls[int(a)], urls[int(b)]))
            pos.append((ul, ur, 1))
    pos = sorted(set(pos))

    brand_groups: dict[str, list[int]] = {}
    for e in en_idx:
        brand_groups.setdefault(entity_brand[e], []).append(e)
    hard: list[tuple[str, str, int]] = []
    want_hard = int(len(pos) * 2.6)
    grp = [g for g in brand_groups.values() if len(g) > 1]
    attempts = 0
    while len(hard) < want_hard and grp and attempts < want_hard * 20:
        attempts += 1
        g = grp[int(rng.integers(0, len(grp)))]
        e1, e2 = rng.choice(g, size=2, replace=False)
        if e1 == e2:
            continue
        u1 = entity_urls[int(e1)][int(rng.integers(0, len(entity_urls[int(e1)])))]
        u2 = entity_urls[int(e2)][int(rng.integers(0, len(entity_urls[int(e2)])))]
        ul, ur = sorted((u1, u2))
        hard.append((ul, ur, 0))
    easy: list[tuple[str, str, int]] = []
    want_easy = max(1, int(len(pos) * 0.4))
    while len(easy) < want_easy and len(en_idx) > 1:
        e1, e2 = rng.choice(en_idx, size=2, replace=False)
        u1 = entity_urls[int(e1)][int(rng.integers(0, len(entity_urls[int(e1)])))]
        u2 = entity_urls[int(e2)][int(rng.integers(0, len(entity_urls[int(e2)])))]
        ul, ur = sorted((u1, u2))
        easy.append((ul, ur, 0))
    pairs = pd.DataFrame(
        sorted(set(pos) | set(hard) | set(easy)), columns=["url_l", "url_r", "label"]
    )
    truth_df = pd.DataFrame(truth, columns=["url", "entity_id"])
    return Corpus(web_pages=pages, labeled_pairs=pairs, truth=truth_df)


WEB_PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
LABELED_PAIRS_DDL = "url_l string, url_r string, label int"


def corpus_to_spark(spark, corpus: Corpus):
    """Materialize the corpus as Spark DataFrames with explicit schemas."""
    pages = spark.createDataFrame(corpus.web_pages, schema=WEB_PAGES_DDL)
    pairs = spark.createDataFrame(corpus.labeled_pairs, schema=LABELED_PAIRS_DDL)
    truth = spark.createDataFrame(corpus.truth, schema="url string, entity_id bigint")
    return pages, pairs, truth


def write_corpus(spark, corpus: Corpus, base_dir: str) -> None:
    pages, pairs, truth = corpus_to_spark(spark, corpus)
    pages.repartition(8).write.mode("overwrite").parquet(f"{base_dir}/web_pages")
    pairs.coalesce(1).write.mode("overwrite").parquet(f"{base_dir}/labeled_pairs")
    truth.coalesce(1).write.mode("overwrite").parquet(f"{base_dir}/truth")
