"""Streaming incremental ER (streaming/append_stream.py): a crawl landing
directory drained with availableNow must leave exactly the labels a
one-shot batch run over everything produces (frozen base IDF), regardless
of how the file source slices files into micro-batches."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"),
)

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
from entity_matching_in_online_retail_spark.plans.append import _list_batches, _inc_dir
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline
from entity_matching_in_online_retail_spark.streaming.append_stream import (
    stream_append,
)


def _labels(df):
    return {r.record_id: r.cluster_id for r in df.collect()}


def test_stream_append_equals_batch_run(spark, tmp_path):
    cfg = DEFAULT_CONFIG
    wd = str(tmp_path / "wd")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    corpus = fx.generate_corpus(n_entities=30, seed=41)
    pages, labeled, _ = fx.corpus_to_spark(spark, corpus)
    part = F.pmod(F.xxhash64("url"), F.lit(5))
    base_pages = pages.where(part <= 2)
    res = ERPipeline(spark, wd, cfg).run(base_pages, labeled_urls=labeled)

    # two crawl drops, several files each (maxFilesPerTrigger=8 in the
    # reader slices them into micro-batches however it lists them)
    pages.where(part == 3).repartition(6).write.mode("append").parquet(landing)
    pages.where(part == 4).repartition(6).write.mode("append").parquet(landing)

    q = stream_append(spark, wd, landing, ckpt, cfg)
    q.awaitTermination(300)

    got = _labels(spark.read.parquet(os.path.join(wd, "clusters")))
    offers_all = normalize_web_pages(pages, lang=cfg.lang_filter)
    base_offers = normalize_web_pages(base_pages, lang=cfg.lang_filter)
    idf = S.fit_idf(base_offers)
    keys = B.all_block_keys(offers_all, cfg.blocking)
    pairs = B.candidate_pairs(B.cap_blocks(keys, cfg.blocking), cfg.blocking)
    attrs = FE.offers_with_vectors(offers_all, idf)
    feats = FE.pair_features(
        pairs.select("id_l", "id_r"), attrs, gate_jaccard=cfg.scoring.gate_jaccard
    )
    edges = M.match_edges(M.score_pairs(feats, res.model), res.threshold)
    want = _labels(
        C.assign_clusters(
            offers_all.select("record_id"), C.connected_components(edges)
        )
    )
    assert got == want

    # every micro-batch landed as a committed increment batch
    assert len(_list_batches(_inc_dir(wd, "offers"))) >= 1

    # draining again is a no-op: offsets are checkpointed, and even a replay
    # would anti-join away — labels unchanged
    q2 = stream_append(spark, wd, landing, ckpt, cfg)
    q2.awaitTermination(300)
    assert _labels(spark.read.parquet(os.path.join(wd, "clusters"))) == want


def test_foreachbatch_redelivery_idempotent(spark, tmp_path):
    """Explicit at-least-once pin (VERDICT r4 #7): foreachBatch may redeliver
    a micro-batch after a crash between the append and the offset commit.
    Applying the SAME batch twice through append_batch (the exact call
    stream_append's foreachBatch makes) must leave labels, cluster count,
    and the committed-batch list unchanged — idempotence asserted directly,
    not inherited transitively from the append crash tests."""
    from entity_matching_in_online_retail_spark.plans.append import append_batch

    cfg = DEFAULT_CONFIG
    wd = str(tmp_path / "wd")
    corpus = fx.generate_corpus(n_entities=25, seed=43)
    pages, labeled, _ = fx.corpus_to_spark(spark, corpus)
    part = F.pmod(F.xxhash64("url"), F.lit(4))
    base_pages = pages.where(part <= 2)
    batch_pages = pages.where(part == 3).localCheckpoint(eager=True)
    ERPipeline(spark, wd, cfg).run(base_pages, labeled_urls=labeled)

    first = append_batch(spark, wd, batch_pages, cfg)
    assert first["new_records"] > 0
    labels1 = _labels(spark.read.parquet(os.path.join(wd, "clusters")))
    batches1 = _list_batches(_inc_dir(wd, "offers"))

    redelivered = append_batch(spark, wd, batch_pages, cfg)  # same df again
    assert redelivered["new_records"] == 0
    assert redelivered["recovered_records"] == 0
    assert redelivered["merges"] == 0
    assert redelivered["clusters_after"] == redelivered["clusters_before"]
    assert _labels(spark.read.parquet(os.path.join(wd, "clusters"))) == labels1
    assert _list_batches(_inc_dir(wd, "offers")) == batches1  # no new batch dir
