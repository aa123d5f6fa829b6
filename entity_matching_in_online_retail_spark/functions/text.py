"""Text normalization, tokenization, domain keys, and HTML text extraction.

These define the "normalized keys" of the blocking stage (BASELINE.json north
rule), so they are frozen: any change invalidates golden fixtures and stage
manifests (config hash). Everything here is either a Catalyst built-in column
expression (JVM-side, codegen) or an Arrow-batched pandas UDF — no per-row
Python UDFs anywhere.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Normalization (F5): lower + NFKC + strip non-alnum + collapse whitespace.
# The regex/lower/trim part stays JVM-side; NFKC needs Python (no Spark
# built-in), applied once per record in an Arrow-batched pandas UDF.
# --------------------------------------------------------------------------


def _nfkc_str(x: str | None) -> str | None:
    """NFKC with an ASCII fast path: every ASCII string is already in NFKC
    form (all ASCII code points are NFKC-invariant), and str.isascii() is a
    C-speed check — the common web-text case skips the per-char normalize."""
    if x is None:
        return None
    return x if x.isascii() else unicodedata.normalize("NFKC", x)


@F.pandas_udf(T.StringType())
def nfkc(s: pd.Series) -> pd.Series:
    """Unicode NFKC normalization, Arrow-batched (record-level, not per-pair)."""
    return s.map(_nfkc_str)


def normalize_text(col: Column, with_nfkc: bool = True) -> Column:
    """lower + (NFKC) + [^letter/number/space]->space + collapse ws + trim."""
    c = nfkc(col) if with_nfkc else col
    return normalize_text_post_nfkc(c)


def normalize_text_post_nfkc(col: Column) -> Column:
    """The JVM tail of normalize_text for inputs already NFKC-normalized
    (round 6: lets the ingest stage run extraction + NFKC in ONE Arrow
    round trip via `extract_nfkc` and keep the rest codegen'd)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\p{L}\p{N} ]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokens(norm_col: Column) -> Column:
    """Distinct non-empty tokens of an already-normalized string."""
    return F.array_distinct(
        F.filter(F.split(norm_col, " "), lambda t: F.length(t) > 0)
    )


def tokens_seq(norm_col: Column) -> Column:
    """ORDERED, duplicate-preserving tokens of an already-normalized string.

    `tokens()` deduplicates (set semantics for Jaccard/blocking); repetition
    signals (dup-n-gram fraction, top-n-gram fraction) need the sequence.
    """
    return F.filter(F.split(norm_col, " "), lambda t: F.length(t) > 0)


# --------------------------------------------------------------------------
# Domain key (F6): registrable-domain approximation from the url.
# No public-suffix list is available offline; we strip a leading "www." and
# keep the last two labels (last three when the 2nd-level label is a known
# country-code SLD like "co.uk"). Documented approximation.
# --------------------------------------------------------------------------

_CC_SLD = (
    "co",
    "com",
    "org",
    "net",
    "ac",
    "gov",
    "edu",
)


def domain_key(url_col: Column) -> Column:
    host = F.lower(F.parse_url(url_col, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    second_level = F.element_at(parts, -2)
    take3 = (n >= F.lit(3)) & second_level.isin(*_CC_SLD)
    return F.when(
        take3, F.concat_ws(".", F.slice(parts, n - 2, 3))
    ).otherwise(
        F.when(n >= F.lit(2), F.concat_ws(".", F.slice(parts, n - 1, 2))).otherwise(host)
    )


# --------------------------------------------------------------------------
# Offer-attribute parsing: the corpus text layout is
#   "{brand} {model} {title words...} price {p}"
# brand = first token, model = second token, price = token after 'price'.
# All built-ins.
# --------------------------------------------------------------------------


def parse_brand(norm_col: Column) -> Column:
    return F.element_at(F.split(norm_col, " "), 1)


def parse_price(text_col: Column) -> Column:
    return F.regexp_extract(text_col, r"price (\d+(?:\.\d+)?)", 1).try_cast("double")


# --------------------------------------------------------------------------
# HTML -> text extraction (X3). THE FROZEN EXTRACTOR: byte-identical output
# per url is a north-rule invariant (BASELINE.json input_hint), asserted
# across re-runs, parallelism levels, and resume-after-kill by
# tests/test_extraction_golden.py. Pure function of the html bytes; stateless
# per row, so Arrow batch boundaries cannot affect the output.
#
# Semantics (v1, frozen): concatenate the text content of <p> elements in
# document order, joined by "\n"; strip any nested tags; decode HTML entities
# for &amp; &lt; &gt; &quot; &#39;; input decoded as UTF-8 (errors=replace).
# --------------------------------------------------------------------------

_P_RE = re.compile(rb"<p[^>]*>(.*?)</p>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(rb"<[^>]+>")
_ENTITIES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),
]


def extract_text_bytes(html: bytes | None) -> str | None:
    """Frozen reference extractor (pure function; do not change)."""
    if html is None:
        return None
    parts = _P_RE.findall(html)
    cleaned = []
    for p in parts:
        p = _TAG_RE.sub(b"", p)
        for ent, ch in _ENTITIES:
            p = p.replace(ent, ch)
        cleaned.append(p)
    return b"\n".join(cleaned).decode("utf-8", errors="replace")


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Arrow-batched wrapper over the frozen extractor."""
    return html.map(extract_text_bytes)


_EXTRACT_NFKC_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("nfkc_text", T.StringType()),
    ]
)


@F.pandas_udf(_EXTRACT_NFKC_SCHEMA)
def _extract_nfkc_udf(html: pd.Series) -> pd.DataFrame:
    """Frozen extractor + NFKC in ONE Arrow round trip.

    text is byte-identical to extract_text (same frozen function);
    nfkc_text == nfkc(text). Fusing the two record-level Python steps into
    one struct-returning UDF removes a whole ArrowEvalPython stage from the
    ingest plan (guide §4.1: you control how many times data crosses the
    boundary)."""
    texts = html.map(extract_text_bytes)
    return pd.DataFrame({"text": texts, "nfkc_text": texts.map(_nfkc_str)})


# Marked non-deterministic so the optimizer cannot push the downstream
# text-length filter below the projection and duplicate the UDF — the
# unfused ingest plan evaluated extract_text TWICE per row for exactly this
# reason (guide §4.4; plans/r06/er_ingest_normalize_before.txt shows the
# doubled ArrowEvalPython).
extract_nfkc = _extract_nfkc_udf.asNondeterministic()
