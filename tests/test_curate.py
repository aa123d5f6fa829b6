"""Unit tests for the composed curation funnel (plans/curate.py): first-
reject attribution order, md5-group keeper semantics, near-dup stage scoping
to survivors, metrics partition, and curate() redaction/column contract.

The funnel's numeric parity with DuckDB is covered by the oracle sweep
(tests/test_entry_oracle.py::test_query_matches_oracle[curation_funnel]);
these tests pin the SEMANTICS on hand-built frames where each stage's
verdict is known by construction.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.plans import curate as CUR

# 40 distinct words, English stopwords present, alphabetic, >200 chars:
# passes lang/quality/repetition under the default thresholds.
GOOD_EN = (
    "the quick brown fox jumps over a lazy dog and then runs across "
    "wide golden fields to find cool water near an old stone bridge "
    "while birds sing softly in tall green trees above quiet paths "
    "that wander toward distant purple mountains under bright skies"
)
GOOD_EN_B = GOOD_EN.replace("purple", "crimson")  # near-dup of GOOD_EN
GOOD_DE = (
    "der schnelle braune fuchs springt und das wasser ist nicht weit "
    "von der alten bruecke mit einem stein und die voegel singen zu "
    "leise in den hohen gruenen baeumen ueber stillen wegen die zu "
    "fernen bergen unter hellem himmel wandern ein guter langer text"
)
PUNCT_SOUP = "??? !!! ;;; ### $$$ %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~"

# Stage isolation: loosen everything except what a test targets.
OPEN = CUR.CurateConfig(
    allowed_langs=("en", "de", "und"),
    min_quality=0.0,
    max_dup_frac=1.0,
    max_top_frac=1.0,
    sample_permille=1000,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _labels(df):
    return {r["doc_id"]: r["drop_stage"] for r in df.collect()}


def test_attribution_order_lang_before_quality(spark):
    # PUNCT_SOUP fails both lang (und) and quality; with 'und' disallowed it
    # must be attributed to the FIRST stage (lang), with 'und' allowed it
    # falls through to quality.
    docs = _docs(spark, [(1, GOOD_EN), (2, PUNCT_SOUP)])
    strict = CUR.CurateConfig(sample_permille=1000)
    lab = _labels(CUR.funnel_labels(docs, None, strict))
    assert lab == {1: None, 2: "lang"}
    lenient_lang = CUR.CurateConfig(
        allowed_langs=("en", "und"), sample_permille=1000
    )
    lab = _labels(CUR.funnel_labels(docs, None, lenient_lang))
    assert lab == {1: None, 2: "quality"}


def test_exact_dup_keeper_is_min_surviving_id(spark):
    docs = _docs(spark, [(5, GOOD_EN), (3, GOOD_EN), (9, GOOD_EN), (7, GOOD_DE)])
    lab = _labels(CUR.funnel_labels(docs, None, OPEN))
    assert lab[3] is None  # min id of the md5 group keeps
    assert lab[5] == "exact_dup" and lab[9] == "exact_dup"
    assert lab[7] is None  # different text, untouched


def test_exact_dup_group_dropped_earlier_is_not_relabeled(spark):
    # If the whole md5 group fails an earlier stage, nobody is 'exact_dup':
    # the earlier attribution wins for every member.
    docs = _docs(spark, [(1, GOOD_DE), (2, GOOD_DE)])
    cfg = CUR.CurateConfig(allowed_langs=("en",), sample_permille=1000)
    lab = _labels(CUR.funnel_labels(docs, None, cfg))
    assert lab == {1: "lang", 2: "lang"}


def test_near_dup_scoped_to_survivors(spark):
    # GOOD_EN / GOOD_EN_B are near-dups (one word differs); the German doc
    # fails lang first and must NOT participate in (or absorb) the group.
    docs = _docs(spark, [(1, GOOD_EN), (2, GOOD_EN_B), (3, GOOD_DE)])
    cfg = CUR.CurateConfig(sample_permille=1000, near_dup_threshold=0.8)
    lab = _labels(CUR.funnel_labels(docs, None, cfg))
    assert lab[1] is None  # min id of the near-dup group keeps
    assert lab[2] == "near_dup"
    assert lab[3] == "lang"


def test_contamination_before_dedup(spark):
    # A doc sharing 3-grams with the benchmark is 'contaminated' even when
    # it is also an exact dup of a clean doc with a larger id — attribution
    # order, and the contaminated copy can't claim the keeper slot.
    docs = _docs(spark, [(4, GOOD_EN), (2, GOOD_EN)])
    bench = _docs(spark, [(100, GOOD_EN)])
    lab = _labels(CUR.funnel_labels(docs, bench, OPEN))
    # Both copies share grams with the benchmark: both contaminated.
    assert lab == {2: "contaminated", 4: "contaminated"}


def test_sampling_is_last_and_deterministic(spark):
    docs = _docs(spark, [(1, GOOD_EN), (2, GOOD_EN_B)])
    none_kept = CUR.CurateConfig(
        allowed_langs=("en",), sample_permille=0
    )
    lab = _labels(CUR.funnel_labels(docs, None, none_kept))
    assert set(lab.values()) == {"sampled_out"}
    # Deterministic: same frame, same labels on re-run.
    assert lab == _labels(CUR.funnel_labels(docs, None, none_kept))


def test_missing_text_never_survives(spark):
    # NULL text propagates NULL through every signal comparison; without
    # the explicit guard it would fall through all when-branches to 'kept'.
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=GOOD_EN), Row(doc_id=2, text=None), Row(doc_id=3, text="")]
    )
    lab = _labels(CUR.funnel_labels(docs, None, OPEN))
    assert lab == {1: None, 2: "missing", 3: "missing"}
    out_ids = {r["doc_id"] for r in CUR.curate(docs, None, OPEN).collect()}
    assert out_ids == {1}


def test_funnel_metrics_partitions_corpus(spark):
    rows = [(i, GOOD_EN if i % 2 else GOOD_DE) for i in range(20)]
    docs = _docs(spark, rows)
    cfg = CUR.CurateConfig(sample_permille=700)
    labels = CUR.funnel_labels(docs, None, cfg)
    met = {r["stage"]: (r["n_docs"], r["id_ck"]) for r in CUR.funnel_metrics(labels).collect()}
    assert sum(n for n, _ in met.values()) == 20
    # ids < the fold modulus, so the fold is the identity here
    assert sum(s for _, s in met.values()) == sum(range(20))
    assert "lang" in met and met["lang"][0] == 10  # the German half


def test_curate_redacts_and_preserves_columns(spark):
    pii = GOOD_EN + " contact me at alice@example.com or +1 555 123 4567"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=pii, source="web")]
    )
    out = CUR.curate(docs, None, CUR.CurateConfig(sample_permille=1000))
    assert out.columns == ["doc_id", "text", "source"]
    row = out.collect()[0]
    assert "<EMAIL>" in row["text"] and "<PHONE>" in row["text"]
    assert "alice@example.com" not in row["text"]
    assert row["source"] == "web"


def test_curate_observed_single_pass_report_matches_metrics(spark):
    # The observe()-backed report (rides the survivor action, zero extra
    # passes) must equal the groupBy report, and the survivors must equal
    # curate()'s output.
    rows = [(i, GOOD_EN if i % 3 else PUNCT_SOUP) for i in range(1, 13)]
    docs = _docs(spark, rows)
    cfg = CUR.CurateConfig(sample_permille=800)
    survivors, report = CUR.curate_observed(docs, None, cfg)
    got_rows = survivors.collect()  # the one action; fires the observation
    rep = report()
    labels = CUR.funnel_labels(docs, None, cfg)
    met = {
        r["stage"]: (r["n_docs"], r["id_ck"])
        for r in CUR.funnel_metrics(labels).collect()
    }
    assert rep == met
    assert {r["doc_id"] for r in got_rows} == {
        r["doc_id"] for r in CUR.curate(docs, None, cfg).collect()
    }


def test_curate_keeps_exactly_the_unlabeled_docs(spark):
    rows = [(i, GOOD_EN if i % 3 else PUNCT_SOUP) for i in range(1, 13)]
    docs = _docs(spark, rows)
    cfg = CUR.CurateConfig(sample_permille=800)
    labels = CUR.funnel_labels(docs, None, cfg)
    kept_ids = {r["doc_id"] for r in labels.where(F.col("drop_stage").isNull()).collect()}
    out_ids = {r["doc_id"] for r in CUR.curate(docs, None, cfg).collect()}
    assert out_ids == kept_ids and kept_ids  # non-empty and identical
