"""Cold-vs-warm ER stage walls in one JVM (optimization round 6 probe).

Runs the exact bench.py ER sequence twice in one session (second pass with a
fresh workdir so every stage recomputes). The delta isolates one-time costs
(codegen, Python worker spawn, committer init) from steady-state stage cost.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from entity_matching_in_online_retail_spark.operators import cluster as C  # noqa: E402
from entity_matching_in_online_retail_spark.operators import model as M  # noqa: E402
from entity_matching_in_online_retail_spark.plans import evaluate as EV  # noqa: E402
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("probe_warm", cores=cores, shuffle_partitions=2 * cores)
corpus = os.path.join(REPO, ".bench_cache", "corpus_e20000")
pages = spark.read.parquet(os.path.join(corpus, "web_pages"))
labeled = spark.read.parquet(os.path.join(corpus, "labeled_pairs"))


def one_pass(tag):
    workdir = tempfile.mkdtemp(prefix=f"er_warm_{tag}_")
    pipe = ERPipeline(spark, workdir)
    times = {}
    t = time.time(); offers = pipe.stage_offers(pages, use_html=True); times["ingest"] = round(time.time() - t, 2)
    t = time.time(); attrs = pipe.stage_attrs(offers); times["tfidf"] = round(time.time() - t, 2)
    t = time.time(); pairs = pipe.stage_pairs(offers); n_pairs = pairs.count(); times["block"] = round(time.time() - t, 2)
    labeled_ids = EV.labeled_pairs_to_ids(labeled, offers).localCheckpoint(eager=True)
    t = time.time(); matcher, tau = pipe.train_or_load(labeled_ids, attrs, "bench"); times["train"] = round(time.time() - t, 2)
    t = time.time(); scores = pipe.stage_scores(pairs, attrs, matcher); scores.count(); times["score"] = round(time.time() - t, 2)
    t = time.time()
    edges = M.match_edges(scores, tau)
    comps = C.connected_components(edges)
    clusters = C.assign_clusters(offers.select("record_id"), comps)
    clusters.write.mode("overwrite").parquet(os.path.join(workdir, "clusters"))
    times["cc"] = round(time.time() - t, 2)
    print(tag, times, "total", round(sum(times.values()), 2), flush=True)
    shutil.rmtree(workdir, ignore_errors=True)


one_pass("cold")
one_pass("warm")
one_pass("warm2")
spark.stop()
