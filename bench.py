"""Benchmark runner. Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {<stage-or-query>: sec, ...}, "sf": <sf>, ...extras}

Headline: the full ER pipeline (normalize -> block -> pairs -> score ->
cluster -> eval) on the deterministic bench web-pages corpus sized to the
scale factor (the north-rule input shape), plus a few oracle-corpus queries
on $SPARK_GRAFT_SF_DIR tables. Extras report candidate-pairs scored/sec
(the north-rule throughput metric) and pairwise F1.

Corpus generation is seeded and cached under .bench_cache/ (gitignored).
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), BENCH_WORKDIR (default a fresh /tmp dir).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from entity_matching_in_online_retail_spark import fixtures as fx  # noqa: E402
from entity_matching_in_online_retail_spark.operators import cluster as C  # noqa: E402
from entity_matching_in_online_retail_spark.operators import model as M  # noqa: E402
from entity_matching_in_online_retail_spark.plans import evaluate as EV  # noqa: E402
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

# sf -> (entities, hot_entities, hot_size)
SCALE = {"0.001": (200, 1, 30), "0.01": (2000, 2, 60), "0.1": (20000, 5, 200)}


def _sf_from_dir(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base.replace("sf", "") if base.startswith("sf") else "0.1"


def bench_corpus_dir(spark, sf: str) -> str:
    e, hot_n, hot_size = SCALE.get(sf, SCALE["0.1"])
    cache = os.path.join(REPO, ".bench_cache", f"corpus_e{e}")
    marker = os.path.join(cache, "_DONE")
    if not os.path.exists(marker):
        corpus = fx.generate_corpus(n_entities=e, hot_entities=hot_n, hot_size=hot_size)
        fx.write_corpus(spark, corpus, cache)
        with open(marker, "w") as f:
            f.write("ok")
    return cache


def run_er_bench(spark, corpus_dir: str, workdir: str) -> dict:
    pages = spark.read.parquet(os.path.join(corpus_dir, "web_pages"))
    labeled = spark.read.parquet(os.path.join(corpus_dir, "labeled_pairs"))
    pipe = ERPipeline(spark, workdir)
    times: dict[str, float] = {}

    t = time.time()
    offers = pipe.stage_offers(pages, use_html=True)
    times["er_ingest_normalize"] = time.time() - t

    t = time.time()
    attrs = pipe.stage_attrs(offers)
    times["er_tfidf_vectors"] = time.time() - t

    t = time.time()
    pairs = pipe.stage_pairs(offers)
    n_pairs = pairs.count()
    times["er_block_pairs"] = time.time() - t

    labeled_ids = EV.labeled_pairs_to_ids(labeled, offers).localCheckpoint(eager=True)
    t = time.time()
    matcher, tau = pipe.train_or_load(labeled_ids, attrs, "bench")
    times["er_train"] = time.time() - t

    t = time.time()
    scores = pipe.stage_scores(pairs, attrs, matcher)
    n_scored = scores.count()
    times["er_score_pairs"] = time.time() - t

    t = time.time()
    edges = M.match_edges(scores, tau)
    comps = C.connected_components(edges)
    clusters = C.assign_clusters(offers.select("record_id"), comps)
    clusters.write.mode("overwrite").parquet(os.path.join(workdir, "clusters"))
    times["er_cluster_cc"] = time.time() - t

    t = time.time()
    preds = EV.cluster_predictions(labeled_ids, spark.read.parquet(os.path.join(workdir, "clusters")))
    m = EV.confusion(preds)
    times["er_eval"] = time.time() - t

    return {
        "times": times,
        "n_records": offers.count(),
        "n_pairs": n_pairs,
        "n_scored": n_scored,
        # north-rule throughput: candidate pairs processed by the scoring
        # stage (cheap cascade + Python features + classifier) per second
        "pairs_scored_per_sec": round(n_pairs / max(times["er_score_pairs"], 1e-9), 1),
        "f1": round(m.f1, 4),
        "precision": round(m.precision, 4),
        "recall": round(m.recall, 4),
    }


def run_corpus_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E

    out: dict[str, float] = {}
    for name in ["groupby_count", "fetch_join", "self_join_block", "window_topk", "ann_bruteforce", "token_df", "curation_funnel"]:
        q = E.queries()[name]
        t = time.time()
        df = q(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[f"q_{name}"] = round(time.time() - t, 3)
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_from_dir(sf_dir)
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", cores=cores, shuffle_partitions=2 * cores)

    corpus_dir = bench_corpus_dir(spark, sf)
    workdir = os.environ.get("BENCH_WORKDIR") or tempfile.mkdtemp(prefix="er_bench_")
    fresh = os.environ.get("BENCH_KEEP_WORKDIR") != "1"
    if fresh:
        shutil.rmtree(workdir, ignore_errors=True)
        os.makedirs(workdir, exist_ok=True)

    er = run_er_bench(spark, corpus_dir, workdir)
    qtimes = run_corpus_queries(spark, sf_dir)

    queries = {**{k: round(v, 3) for k, v in er["times"].items()}, **qtimes}
    total = round(sum(er["times"].values()), 3)
    result = {
        "metric": "er_pipeline_total_plus_query_times",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf),
        "cores": cores,
        "n_records": er["n_records"],
        "n_candidate_pairs": er["n_pairs"],
        "pairs_scored_per_sec": er["pairs_scored_per_sec"],
        "f1": er["f1"],
        "precision": er["precision"],
        "recall": er["recall"],
    }
    print(json.dumps(result))
    if fresh:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
