"""Chained appends (jobs/run_append.py::append_batch): two successive
batches must land on exactly the labels a single batch run over everything
produces (frozen base IDF), later batches must match against earlier
increments, and a crash between the increment write and the clusters write
must self-heal on the next append."""

import os
import shutil
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"),
)

from run_append import append_batch  # noqa: E402

from entity_matching_in_online_retail_spark import fixtures as fx
from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG
from entity_matching_in_online_retail_spark.functions import similarity as S
from entity_matching_in_online_retail_spark.operators import blocking as B
from entity_matching_in_online_retail_spark.operators import cluster as C
from entity_matching_in_online_retail_spark.operators import features as FE
from entity_matching_in_online_retail_spark.operators import model as M
from entity_matching_in_online_retail_spark.operators.normalize import (
    normalize_web_pages,
)
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline


def _labels(df):
    return {r.record_id: r.cluster_id for r in df.collect()}


def _batch_resolve(offers, idf, cfg, matcher, tau):
    keys = B.all_block_keys(offers, cfg.blocking)
    pairs = B.candidate_pairs(B.cap_blocks(keys, cfg.blocking), cfg.blocking)
    attrs = FE.offers_with_vectors(offers, idf)
    feats = FE.pair_features(
        pairs.select("id_l", "id_r"), attrs, gate_jaccard=cfg.scoring.gate_jaccard
    )
    edges = M.match_edges(M.score_pairs(feats, matcher), tau)
    return C.assign_clusters(
        offers.select("record_id"), C.connected_components(edges)
    )


@pytest.fixture(scope="module")
def chain_env(spark, tmp_path_factory):
    cfg = DEFAULT_CONFIG
    wd = str(tmp_path_factory.mktemp("append_chain"))
    corpus = fx.generate_corpus(n_entities=50, seed=11)
    pages, labeled, _ = fx.corpus_to_spark(spark, corpus)
    part = F.pmod(F.xxhash64("url"), F.lit(5))
    base_pages = pages.where(part <= 2)
    batch_a = pages.where(part == 3)
    batch_b = pages.where(part == 4)
    res = ERPipeline(spark, wd, cfg).run(base_pages, labeled_urls=labeled)
    return cfg, wd, pages, base_pages, batch_a, batch_b, res, labeled


def test_chained_appends_equal_batch_run(spark, chain_env):
    cfg, wd, pages, base_pages, batch_a, batch_b, res, _ = chain_env
    out_a = append_batch(spark, wd, batch_a, cfg)
    assert out_a["new_records"] > 0 and out_a["recovered_records"] == 0
    out_b = append_batch(spark, wd, batch_b, cfg)
    assert out_b["new_records"] > 0 and out_b["recovered_records"] == 0
    # batch B saw batch A's records: known set grew between the two calls
    assert out_b["base_records"] == out_a["base_records"] + out_a["new_records"]

    got = _labels(spark.read.parquet(os.path.join(wd, "clusters")))

    base_offers = normalize_web_pages(base_pages, lang=cfg.lang_filter)
    offers_all = normalize_web_pages(pages, lang=cfg.lang_filter)
    idf = S.fit_idf(base_offers)  # the frozen vocabulary append_batch uses
    want = _labels(
        _batch_resolve(offers_all, idf, cfg, res.model, res.threshold)
    )
    assert got == want

    # applying an already-applied batch is a no-op
    out_again = append_batch(spark, wd, batch_b, cfg)
    assert out_again["new_records"] == 0
    assert _labels(spark.read.parquet(os.path.join(wd, "clusters"))) == want


def test_crash_between_increment_and_clusters_self_heals(
    spark, chain_env, tmp_path_factory
):
    cfg, wd0, pages, base_pages, batch_a, batch_b, res, labeled = chain_env
    # fresh labeled base run in a fresh workdir
    wd = str(tmp_path_factory.mktemp("append_crash"))
    ERPipeline(spark, wd, cfg).run(base_pages, labeled_urls=labeled)

    base_clusters = spark.read.parquet(os.path.join(wd, "clusters")).collect()
    append_batch(spark, wd, batch_a, cfg)

    # simulate the crash window: increment written, clusters write lost
    shutil.rmtree(os.path.join(wd, "clusters"))
    spark.createDataFrame(
        base_clusters, "record_id bigint, cluster_id bigint"
    ).write.parquet(os.path.join(wd, "clusters"))

    out = append_batch(spark, wd, batch_b, cfg)
    assert out["recovered_records"] > 0  # batch A re-entered and re-resolved

    healed = _labels(spark.read.parquet(os.path.join(wd, "clusters")))
    # reference: the same two appends without a crash
    wd2 = str(tmp_path_factory.mktemp("append_nocrash"))
    ERPipeline(spark, wd2, cfg).run(base_pages, labeled_urls=labeled)
    append_batch(spark, wd2, batch_a, cfg)
    append_batch(spark, wd2, batch_b, cfg)
    want = _labels(spark.read.parquet(os.path.join(wd2, "clusters")))
    assert healed == want
