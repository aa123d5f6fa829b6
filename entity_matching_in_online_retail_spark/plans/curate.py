"""Composed corpus-curation funnel — the RefinedWeb/Gopher-style chain a
training-data pipeline runs end-to-end, built from this repo's quality
primitives, with per-document drop attribution instead of destructive
per-stage filtering.

Every document is labeled with the FIRST stage that rejects it
(`drop_stage`), or NULL if it reaches the final corpus:

    missing -> lang -> quality -> repetition -> contaminated -> exact_dup
        [-> near_dup] -> sampled_out

Why labels, not chained filters: the per-stage retention report (the thing
a curation run is audited by) falls out of ONE groupBy over the label frame
— no per-stage count() actions, no re-scans; and the survivor set is the
same frame filtered, so metrics and output share a single lineage.

Dataflow shape (100 TB notes):
- Row-local signals (lang score, quality, dup-n-gram fraction, top-n-gram
  fraction via the sorted-hashed-gram run fold) are one codegen projection
  riding the scan — no shuffle, no Python, no join-back.
- Contamination explodes corpus grams against a BROADCAST benchmark gram
  set (eval sets are small by construction); the corpus never shuffles on
  the gram key — one doc_id-keyed agg for the hit flags.
- Exact dedup never splits the frame: the keeper of an md5(text) group is
  min(doc_id) among docs still unlabeled at that point, computed with ONE
  window — a doc dropped by an earlier stage can never claim the keeper
  slot, and the group's survivors resolve deterministically.
- Near-dup (optional, `near_dup_threshold`) runs MinHash-LSH + connected
  components over the survivors only (operators/dedup.near_dup_groups);
  it is the one non-SQL-expressible stage, so the oracle-backed funnel
  variant runs with it disabled.
- Sampling is the deterministic LCG keep (functions/textstats.lcg_bucket)
  — replay-stable under task retries, cross-engine reproducible; rand()
  is neither.

Total cost: one scan + the top-gram agg + the contamination agg + one
md5-keyed window exchange + (optional near-dup job). All keys (doc_id,
gram, md5) are near-uniform — no skew handling needed.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions import textstats as TS
from ..operators import quality as Q

# Fingerprint fold modulus: prime < 10^6, so a 10^12-doc stage sums to
# <= 10^18 < 2^63 — no ANSI overflow at the module's design scale (a
# 2^31-scale fold would overflow the accumulating long sum above ~4.3e9
# docs per stage).
_CK_MOD = 999983

# Funnel order IS the attribution order; funnel_metrics reports in it.
STAGES = (
    "missing",
    "lang",
    "quality",
    "repetition",
    "contaminated",
    "exact_dup",
    "near_dup",
    "sampled_out",
)


@dataclass(frozen=True)
class CurateConfig:
    """Thresholds frozen per run; the config participates in any lineage
    hash upstream callers keep (changing a threshold is a new corpus)."""

    allowed_langs: Sequence[str] = ("en",)
    min_quality: float = 0.85
    rep_n: int = 2
    max_dup_frac: float = 0.08
    max_top_frac: float = 0.09
    decon_n: int = 3
    min_shared: int = 1  # grams shared with the benchmark to count as hit
    near_dup_threshold: Optional[float] = None  # None = stage disabled
    sample_permille: int = 700
    id_col: str = "doc_id"
    text_col: str = "text"


def _labeled(
    docs: DataFrame, benchmark: Optional[DataFrame], cfg: CurateConfig
) -> DataFrame:
    """docs + `drop_stage` (nullable string), all original columns kept.

    Internal columns are underscore-prefixed and dropped before return.
    """
    id_c, txt = cfg.id_col, cfg.text_col
    reserved = [
        c
        for c in docs.columns
        if c.startswith("_") or c == "drop_stage"
    ]
    if reserved:
        raise ValueError(
            "curate reserves underscore-prefixed column names and "
            f"'drop_stage'; rename input columns {reserved}"
        )
    text = F.col(txt)
    # Three token views, each mirroring the oracle-proven single-signal
    # queries exactly: lang uses raw lowercase whitespace tokens, quality
    # uses distinct normalized tokens, repetition uses the ordered
    # duplicate-preserving sequence. They are projected as REAL columns
    # first so each tokenization tree evaluates once per document — inlined,
    # the multi-reference signal expressions re-evaluate normalize+split
    # per element_at/size reference (measured 2-3x on the whole funnel).
    # CollapseProject leaves multi-use non-cheap aliases alone, so the
    # boundary survives optimization.
    base = docs.select(
        "*",
        TX.tokens(F.lower(text)).alias("_lt"),
        TX.tokens_seq(TX.normalize_text(text, with_nfkc=False)).alias("_st"),
    )
    # tokens() IS array_distinct(tokens_seq()) — derive the quality view
    # from the materialized sequence instead of running the regex
    # normalize+split tree a second time.
    base = base.withColumn("_qt", F.array_distinct(F.col("_st")))
    base = base.withColumns(
        {
            "_lang": TS.lang_id(F.col("_lt")),
            "_q": TS.quality_score(text, F.col("_qt")),  # rounded 6dp inside
            "_dup": F.round(TS.dup_ngram_fraction(F.col("_st"), cfg.rep_n), 6),
            # Pure expression (sorted-hashed-gram run fold) — rides the same
            # projection; the explode+agg+join-back alternative costs two
            # corpus-wide exchanges (operators/quality.top_ngram_fraction_agg
            # remains for >10^8-token single documents).
            "_top": F.round(
                TS.top_ngram_fraction_expr(F.col("_st"), cfg.rep_n), 6
            ),
        }
    )

    if benchmark is not None:
        if cfg.min_shared <= 1:
            # Existence is enough: the semi-join form costs one corpus-wide
            # exchange instead of decontaminate's two (no per-doc count).
            hits = Q.contaminated_ids(
                docs, benchmark, n=cfg.decon_n, id_col=id_c, text_col=txt
            ).select(F.col(id_c), F.lit(True).alias("_cont"))
        else:
            hits = (
                Q.decontaminate(
                    docs, benchmark, n=cfg.decon_n, id_col=id_c, text_col=txt
                )
                .where(F.col("n_shared") >= cfg.min_shared)
                .select(F.col(id_c), F.lit(True).alias("_cont"))
            )
        # Round-6 note: a regime-aware broadcast hint on `hits` (removing
        # the SortMergeJoin + doc-stream exchange this join plans to, same
        # pathology as the tf-idf vector join) was implemented and
        # measured-REJECTED at sf0.1: interleaved fresh-JVM A/B was a wash
        # leaning negative (cold 10.3/13.1s vs 11.4/12.9s; warm 2.4-2.9 vs
        # 2.8-3.3) — the 10k-doc exchange is cheaper than the broadcast
        # build of the aggregated hit set. The SMJ stays.
        base = base.join(hits, id_c, "left")
    else:
        base = base.withColumn("_cont", F.lit(None).cast("boolean"))

    ds0 = (
        # Explicit guard: NULL text propagates NULL through every signal
        # comparison, which would fall through ALL when-branches and label
        # the doc a survivor — the one outcome a curation funnel must never
        # produce for a missing document.
        F.when(text.isNull() | (F.length(text) == 0), F.lit("missing"))
        .when(~F.col("_lang").isin(*cfg.allowed_langs), F.lit("lang"))
        .when(F.col("_q") < cfg.min_quality, F.lit("quality"))
        .when(
            (F.col("_dup") > cfg.max_dup_frac) | (F.col("_top") > cfg.max_top_frac),
            F.lit("repetition"),
        )
        .when(F.col("_cont"), F.lit("contaminated"))
    )
    lab = base.withColumn("_ds0", ds0)
    # The token arrays exist only to feed the signal projection above —
    # drop them BEFORE the md5 window so its corpus-wide exchange carries
    # the document plus small scalars, not 3x the text in token form
    # (measured: the window shuffle was the widest funnel exchange).
    lab = lab.drop("_lt", "_qt", "_st")

    # Exact dedup: keeper = min surviving id per md5(text) group. One
    # window, no frame split; dropped docs are excluded from the min so
    # they never absorb a group's keeper slot.
    keeper = F.min(F.when(F.col("_ds0").isNull(), F.col(id_c))).over(
        Window.partitionBy(F.md5(text))
    )
    lab = lab.withColumn(
        "_ds1",
        F.coalesce(F.col("_ds0"), F.when(F.col(id_c) != keeper, F.lit("exact_dup"))),
    )

    if cfg.near_dup_threshold is not None:
        from ..operators.dedup import near_dup_groups

        surv = lab.where(F.col("_ds1").isNull()).select(id_c, txt)
        nd = near_dup_groups(
            surv, id_col=id_c, text_col=txt, threshold=cfg.near_dup_threshold
        )
        lab = lab.join(
            nd.where(~F.col("keep")).select(F.col(id_c), F.lit("near_dup").alias("_nd")),
            id_c,
            "left",
        ).withColumn("_ds1", F.coalesce("_ds1", "_nd"))

    drop = F.coalesce(
        F.col("_ds1"),
        F.when(
            ~TS.deterministic_keep(F.col(id_c), cfg.sample_permille),
            F.lit("sampled_out"),
        ),
    )
    keep_cols = [c for c in lab.columns if not c.startswith("_")]
    return lab.select(*keep_cols, drop.alias("drop_stage"))


def funnel_labels(
    docs: DataFrame,
    benchmark: Optional[DataFrame] = None,
    cfg: CurateConfig = CurateConfig(),
) -> DataFrame:
    """(id_col, drop_stage nullable string): first rejecting stage per doc."""
    return _labeled(docs, benchmark, cfg).select(cfg.id_col, "drop_stage")


def funnel_metrics(labels: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(stage, n_docs, id_ck): the retention report, one aggregation.

    id_ck is a value-level fingerprint of the assignment (two runs that
    merely swap which docs a stage dropped won't collide). Ids are folded
    through pmod(id, _CK_MOD) before summing: raw 64-bit ids (e.g.
    xxhash64-derived record ids) overflow a long sum under ANSI mode, and
    the sub-10^6 modulus keeps even a 10^12-doc stage's accumulating sum
    under 2^63 while remaining cross-engine reproducible.
    """
    return labels.groupBy(
        F.coalesce(F.col("drop_stage"), F.lit("kept")).alias("stage")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.pmod(F.col(id_col), F.lit(_CK_MOD))).alias("id_ck"),
    )


def _output_cols(lab: DataFrame, cfg: CurateConfig) -> list:
    """Survivor output columns: everything but the label, text redacted."""
    return [
        TS.pii_redact(F.col(c)).alias(c) if c == cfg.text_col else F.col(c)
        for c in lab.columns
        if c != "drop_stage"
    ]


def curate(
    docs: DataFrame,
    benchmark: Optional[DataFrame] = None,
    cfg: CurateConfig = CurateConfig(),
) -> DataFrame:
    """The surviving corpus, PII-redacted, original columns preserved.

    Shares one lineage with funnel_labels — running both costs one funnel,
    not two.
    """
    lab = _labeled(docs, benchmark, cfg)
    return lab.where(F.col("drop_stage").isNull()).select(*_output_cols(lab, cfg))


def with_near_dup(cfg: CurateConfig, threshold: float = 0.8) -> CurateConfig:
    return replace(cfg, near_dup_threshold=threshold)


def curate_observed(
    docs: DataFrame,
    benchmark: Optional[DataFrame] = None,
    cfg: CurateConfig = CurateConfig(),
):
    """(survivors, report): the PII-redacted surviving corpus plus a
    zero-extra-pass retention report.

    The per-stage counts/checksums ride the survivor action as observe()
    metrics (the stage set is fixed, so the groupBy report folds into 2x8
    conditional aggregates on one Observation) — writing the survivors IS
    the only job; calling report() afterwards converts the observation into
    the same (stage, n_docs, id_ck) rows funnel_metrics produces, minus
    all-zero stages. This is the shape jobs/run_curate.py uses: at corpus
    scale a second funnel execution (or a persist of the label frame) just
    to count retentions is the kind of cost observe() exists to remove.
    """
    from pyspark.sql import Observation

    lab = _labeled(docs, benchmark, cfg)
    stage_col = F.coalesce(F.col("drop_stage"), F.lit("kept"))
    ck = F.pmod(F.col(cfg.id_col), F.lit(_CK_MOD))
    obs = Observation()
    aggs = []
    for s in (*STAGES, "kept"):
        cond = stage_col == s
        aggs.append(F.count(F.when(cond, 1)).alias(f"n_{s}"))
        aggs.append(F.sum(F.when(cond, ck)).alias(f"ck_{s}"))
    observed = lab.observe(obs, *aggs)
    survivors = observed.where(F.col("drop_stage").isNull()).select(
        *_output_cols(lab, cfg)
    )

    def report() -> dict[str, tuple[int, int]]:
        got = obs.get  # blocks until the survivor action has run
        return {
            s: (int(got[f"n_{s}"]), int(got[f"ck_{s}"] or 0))
            for s in (*STAGES, "kept")
            if got[f"n_{s}"]
        }

    return survivors, report
