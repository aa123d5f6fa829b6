"""Sub-stage profiler for the bench pipeline (optimization round 6).

Decomposes each bench.py-timed stage into its component costs (compute via
noop sink, artifact writes, checkpoint write, metrics pass) so optimization
targets the right term. Does NOT replace bench.py (frozen); prints one JSON
line with the sub-step walls.

Usage: SPARK_GRAFT_CPUS=32 python bench_profile.py [--stage all]
"""

from __future__ import annotations

import argparse
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
from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG  # noqa: E402
from entity_matching_in_online_retail_spark.functions import similarity as S  # noqa: E402
from entity_matching_in_online_retail_spark.operators import blocking as B  # noqa: E402
from entity_matching_in_online_retail_spark.operators import cluster as C  # noqa: E402
from entity_matching_in_online_retail_spark.operators import features as FE  # noqa: E402
from entity_matching_in_online_retail_spark.operators import model as M  # noqa: E402
from entity_matching_in_online_retail_spark.operators.normalize import normalize_web_pages  # noqa: E402
from entity_matching_in_online_retail_spark.plans import evaluate as EV  # noqa: E402
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402

T: dict[str, float] = {}


def timed(name):
    class _Ctx:
        def __enter__(self):
            self.t = time.time()
            return self

        def __exit__(self, *a):
            T[name] = round(time.time() - self.t, 3)
            print(f"  {name}: {T[name]}s", file=sys.stderr)

    return _Ctx()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=os.path.join(REPO, ".bench_cache", "corpus_e20000"))
    args = ap.parse_args()

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_profile", cores=cores, shuffle_partitions=2 * cores)
    sc = spark.sparkContext

    pages = spark.read.parquet(os.path.join(args.corpus, "web_pages"))
    labeled = spark.read.parquet(os.path.join(args.corpus, "labeled_pairs"))
    workdir = tempfile.mkdtemp(prefix="er_prof_")
    pipe = ERPipeline(spark, workdir)
    cfg = DEFAULT_CONFIG

    # ---------------- ingest ----------------
    sc.setJobDescription("prof: normalize compute only (noop)")
    with timed("ingest_compute_noop"):
        off_build = normalize_web_pages(pages, lang=cfg.lang_filter, use_html=True)
        noop(off_build)
    sc.setJobDescription("prof: stage_offers full (write+metrics)")
    with timed("ingest_stage_full"):
        offers = pipe.stage_offers(pages, use_html=True)

    # ---------------- tfidf ----------------
    sc.setJobDescription("prof: fit_idf (noop)")
    with timed("tfidf_fit_noop"):
        noop(S.fit_idf(offers))
    sc.setJobDescription("prof: offers_with_vectors from materialized idf (noop)")
    with timed("tfidf_vectors_noop"):
        idf_w = S.fit_idf(offers)
        pipe.catalog.write(idf_w, "idf_prof", mode="overwrite")
        idf_m = pipe.catalog.read("idf_prof")
        noop(FE.offers_with_vectors(offers, idf_m))
    sc.setJobDescription("prof: stage_attrs full")
    with timed("tfidf_stage_full"):
        attrs = pipe.stage_attrs(offers)

    # ---------------- block ----------------
    sc.setJobDescription("prof: all_block_keys (noop)")
    with timed("block_keys_noop"):
        noop(B.all_block_keys(offers, cfg.blocking))
    sc.setJobDescription("prof: cap_blocks from keys (noop)")
    with timed("block_cap_noop"):
        keys_df = B.all_block_keys(offers, cfg.blocking)
        noop(B.cap_blocks(keys_df, cfg.blocking))
    sc.setJobDescription("prof: capped localCheckpoint")
    with timed("block_capped_ckpt"):
        keys_df = B.all_block_keys(offers, cfg.blocking)
        capped = B.cap_blocks(keys_df, cfg.blocking).localCheckpoint(eager=True)
    sc.setJobDescription("prof: candidate_pairs from capped localCheckpoint (noop)")
    with timed("block_pairs_from_capped_noop"):
        noop(B.candidate_pairs(capped, cfg.blocking))
    sc.setJobDescription("prof: stage_pairs full (+count)")
    with timed("block_stage_full"):
        pairs = pipe.stage_pairs(offers)
        n_pairs = pairs.count()

    # ---------------- train ----------------
    labeled_ids = EV.labeled_pairs_to_ids(labeled, offers).localCheckpoint(eager=True)
    sc.setJobDescription("prof: train feature build (noop)")
    with timed("train_feats_noop"):
        feats = FE.pair_features(labeled_ids.select("id_l", "id_r"), attrs).join(
            labeled_ids, ["id_l", "id_r"]
        )
        noop(feats)
    sc.setJobDescription("prof: train_or_load full")
    with timed("train_full"):
        matcher, tau = pipe.train_or_load(labeled_ids, attrs, "prof")

    # ---------------- score ----------------
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sc.setJobDescription("prof: score compute only (noop)")
    with timed("score_compute_noop"):
        feats = FE.pair_features(
            pairs.select("id_l", "id_r").repartition(n_part),
            attrs,
            gate_jaccard=cfg.scoring.gate_jaccard,
        )
        noop(M.score_pairs(feats, matcher))
    sc.setJobDescription("prof: stage_scores full (+count)")
    with timed("score_stage_full"):
        scores = pipe.stage_scores(pairs, attrs, matcher)
        n_scored = scores.count()

    # ---------------- cc ----------------
    sc.setJobDescription("prof: cc full")
    with timed("cc_full"):
        edges = M.match_edges(scores, tau)
        comps = C.connected_components(edges)
        clusters = C.assign_clusters(offers.select("record_id"), comps)
        clusters.write.mode("overwrite").parquet(os.path.join(workdir, "clusters"))

    print(json.dumps({"sub": T, "n_pairs": n_pairs, "n_scored": n_scored}))
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
