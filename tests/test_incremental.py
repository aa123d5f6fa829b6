"""Incremental ER (operators/incremental.py): assigning a new batch against
an existing clustering must equal a full batch re-run (same frozen IDF), and
a new record bridging two existing clusters must merge them."""

import datetime

import pytest
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark import fixtures as fx
from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG
from entity_matching_in_online_retail_spark.functions import similarity as S
from entity_matching_in_online_retail_spark.operators import blocking as B
from entity_matching_in_online_retail_spark.operators import cluster as C
from entity_matching_in_online_retail_spark.operators import features as FE
from entity_matching_in_online_retail_spark.operators import incremental as INC
from entity_matching_in_online_retail_spark.operators import model as M
from entity_matching_in_online_retail_spark.operators.normalize import (
    normalize_web_pages,
)
from entity_matching_in_online_retail_spark.plans.pipeline import DEFAULT_MATCHER


def _resolve(offers, idf, cfg, matcher, tau):
    """The batch dataflow: block -> cap -> pairs -> features -> score -> CC."""
    keys = B.all_block_keys(offers, cfg.blocking)
    capped = B.cap_blocks(keys, cfg.blocking)
    pairs = B.candidate_pairs(capped, cfg.blocking)
    attrs = FE.offers_with_vectors(offers, idf)
    feats = FE.pair_features(
        pairs.select("id_l", "id_r"), attrs, gate_jaccard=cfg.scoring.gate_jaccard
    )
    edges = M.match_edges(M.score_pairs(feats, matcher), tau)
    comps = C.connected_components(edges)
    return C.assign_clusters(offers.select("record_id"), comps), attrs


def _labels(df):
    return {r.record_id: r.cluster_id for r in df.collect()}


def test_incremental_equals_batch(spark):
    cfg = DEFAULT_CONFIG
    tau = cfg.scoring.threshold
    corpus = fx.generate_corpus(n_entities=60, seed=7)
    pages, _, _ = fx.corpus_to_spark(spark, corpus)
    offers = normalize_web_pages(pages).cache()

    new_flag = F.pmod(F.xxhash64("url"), F.lit(5)) == 0  # ~20% increment
    offers_new = offers.where(new_flag).cache()
    offers_old = offers.where(~new_flag).cache()
    assert offers_new.count() >= 5

    idf = S.fit_idf(offers_old).cache()  # frozen at the old full run
    old_clusters, old_attrs = _resolve(offers_old, idf, cfg, DEFAULT_MATCHER, tau)
    old_clusters = old_clusters.cache()

    inc = INC.incremental_assign(
        offers_old, old_attrs, old_clusters, offers_new,
        idf, DEFAULT_MATCHER, tau, cfg,
    )
    batch_clusters, _ = _resolve(offers, idf, cfg, DEFAULT_MATCHER, tau)

    got, want = _labels(inc.assignments), _labels(batch_clusters)
    assert got == want  # identical labels, not just identical partitions

    # old_keys fast path (persisted block_keys artifact): the restrict-then-
    # cap plan must yield the exact same candidate pair set and labels as
    # the recompute-over-union path.
    old_keys = B.all_block_keys(offers_old, cfg.blocking).cache()
    pairs_slow = INC.incremental_pairs(offers_old, offers_new, cfg)
    pairs_fast = INC.incremental_pairs(
        offers_old, offers_new, cfg, old_keys=old_keys
    )
    slow = {(r.id_l, r.id_r) for r in pairs_slow.collect()}
    fast = {(r.id_l, r.id_r) for r in pairs_fast.collect()}
    assert fast == slow

    inc_fast = INC.incremental_assign(
        offers_old, old_attrs, old_clusters, offers_new,
        idf, DEFAULT_MATCHER, tau, cfg, old_keys=old_keys,
    )
    assert _labels(inc_fast.assignments) == want


def _pages(spark, rows):
    ts = datetime.datetime(2026, 1, 1)
    data = [(url, ts, None, text, "en") for url, text in rows]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_bridge_record_merges_clusters(spark):
    cfg = DEFAULT_CONFIG
    dup = "acme widget pro 3000 deluxe edition blue large"
    other = "zenith unrelated gizmo entirely different words here now"
    old = _pages(
        spark, [("http://a.com/1", dup), ("http://b.com/2", dup), ("http://c.com/3", other)]
    )
    new = _pages(spark, [("http://d.com/4", dup)])
    offers_old = normalize_web_pages(old, use_html=False).cache()
    offers_new = normalize_web_pages(new, use_html=False).cache()
    ids = {r.url: r.record_id for r in offers_old.select("url", "record_id").collect()}
    id1, id2, id3 = ids["http://a.com/1"], ids["http://b.com/2"], ids["http://c.com/3"]
    new_id = offers_new.select("record_id").first().record_id

    # Simulate an over-strict prior run: the two dup records sit in two
    # separate clusters; the unrelated record is its own singleton.
    old_clusters = spark.createDataFrame(
        [(id1, id1), (id2, id2), (id3, id3)], "record_id bigint, cluster_id bigint"
    )
    idf = S.fit_idf(offers_old)
    old_attrs = FE.offers_with_vectors(offers_old, idf)

    inc = INC.incremental_assign(
        offers_old, old_attrs, old_clusters, offers_new,
        idf, DEFAULT_MATCHER, cfg.scoring.threshold, cfg,
    )
    got = _labels(inc.assignments)
    root = min(id1, id2, new_id)
    assert got[id1] == got[id2] == got[new_id] == root  # bridge merged both
    assert got[id3] == id3  # untouched cluster passes through unchanged
    merged = {(r.old_cluster_id, r.merged_into) for r in inc.merges.collect()}
    assert {(c, root) for c in (id1, id2) if c != root} <= merged
    assert id3 not in {c for c, _ in merged}
