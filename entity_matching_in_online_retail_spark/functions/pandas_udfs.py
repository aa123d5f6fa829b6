"""Arrow-vectorized Python UDF surfaces for the two SURVEY §2 rows the core
pipeline did not need (X2 iterator-of-Series scalar UDF, X5 GROUPED_AGG
UDAF), implemented over real operators so both are exercised end-to-end and
oracle-checked rather than left as documented skips.

- X2 `iter_lang_id_udf`: SCALAR_ITER shape — the per-iterator prologue runs
  ONCE per Python worker per task and is amortized across every Arrow batch
  that task feeds through the generator. That is the shape you want when the
  prologue is heavy (loading a tokenizer/model, building a large automaton);
  here the prologue (frozen stopword sets) is a cheap deterministic stand-in,
  exactly like the multimodal codec stub — the plumbing is real, the payload
  is small. Semantics are bit-identical to the JVM `textstats.lang_id`
  (tested), so the hot path keeps the codegen version and this documents the
  escape hatch.
- X5 `gini_udaf`: grouped-aggregate UDAF (whole group arrives as one
  pandas Series, no partial aggregation) for a statistic with no Catalyst
  built-in: the Gini coefficient of a numeric column per group. Used by the
  `gini_by_lang` driver query (per-language inequality of document token
  counts — a corpus-skew diagnostic for training-data pipelines) and
  differentially checked against a DuckDB window-function oracle.

Scale note (100 TB): GROUPED_AGG ships each whole group through Arrow to one
Python worker — fine for low-cardinality groups (languages, sources), wrong
for high-cardinality keys where a built-in partial agg exists. The docstring
contract is: reach for X5 only when the statistic genuinely has no
algebraic/partial form, and keep group sizes bounded (cap with a window
top-k first if needed).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from .textstats import LANG_STOPWORDS


def iter_lang_id_udf():
    """SCALAR_ITER pandas UDF: text -> argmax stopword language ('und' when
    no stopword hits). Tie-break and tokenization match the JVM
    `textstats.lang_id` over `text.tokens(lower(text))`: split on single
    spaces, distinct, earlier language in LANG_STOPWORDS order wins ties.
    """

    langs = list(LANG_STOPWORDS)

    @pandas_udf(StringType())
    def lang_id_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # Per-iterator prologue — runs once per task, amortized over all
        # batches (the X2 pattern; stand-in for a heavy model load).
        tables = [(lang, frozenset(LANG_STOPWORDS[lang])) for lang in langs]

        def one(text) -> str:
            if text is None:
                return "und"
            toks = set(str(text).lower().split(" "))
            best_lang, best = "und", 0
            for lang, words in tables:
                score = len(toks & words)
                if score > best:  # strict: earlier language wins ties
                    best_lang, best = lang, score
            return best_lang

        for s in batches:
            yield s.map(one)

    return lang_id_iter


def gini_udaf():
    """GROUPED_AGG pandas UDAF: Gini coefficient of a double column.

    G = 2·Σ(i·x_(i)) / (n·Σx) − (n+1)/n over the ascending-sorted values
    x_(1..n); 0.0 for empty or all-zero groups. Deterministic regardless of
    partitioning (the whole group arrives as one Series; sorting fixes the
    order, and for integer-valued inputs below 2^53 every intermediate is
    exact, so the DuckDB oracle matches bit-for-bit before rounding).
    """

    @pandas_udf(DoubleType())
    def gini(x: pd.Series) -> float:
        v = np.sort(x.dropna().to_numpy(dtype="float64"))
        n = int(v.size)
        tot = float(v.sum())
        if n == 0 or tot == 0.0:
            return 0.0
        idx = np.arange(1.0, n + 1.0)
        return float(2.0 * float(np.dot(idx, v)) / (n * tot) - (n + 1.0) / n)

    return gini
