"""Append CLI — incremental entity resolution as a spark-submit job.

    spark-submit --py-files em.zip jobs/run_append.py \
        --workdir <existing run's stage dir> --new <web_pages parquet> \
        [--labeled <labeled_pairs parquet>] [--cores N] [--no-html]

Resolves a new batch of web pages against the clustering an earlier
`run_pipeline.py` run left in `--workdir` (offers/attrs/clusters stage
checkpoints + model.json), touching only work proportional to the increment
(see operators/incremental.py). Writes the updated assignment to
`<workdir>/clusters` and the merge audit to `<workdir>/merges`, and prints
one JSON line. The increment's offers/attrs are NOT folded into the base
stage checkpoints — per the incremental contract, appends are merge-only
between full rebuilds, and the next config/lineage change triggers the full
rebuild that re-bases everything.

Sandbox demo (no external data): `--demo tiny` generates the fixtures
corpus, runs the BASE pipeline on the ~80% of records with
pmod(xxhash64(url), 5) != 0, then appends the remaining ~20% and evaluates
pairwise F1 of the updated clustering against the full labeled set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark import fixtures as fx
from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG
from entity_matching_in_online_retail_spark.functions import similarity as S
from entity_matching_in_online_retail_spark.operators import incremental as INC
from entity_matching_in_online_retail_spark.operators import model as M
from entity_matching_in_online_retail_spark.operators.normalize import (
    normalize_web_pages,
)
from entity_matching_in_online_retail_spark.plans import evaluate as EV
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline
from entity_matching_in_online_retail_spark.session import get_spark

DEMO_SIZES = {"tiny": 50, "small": 2000}


def main() -> int:
    ap = argparse.ArgumentParser(description="incremental ER append")
    ap.add_argument("--workdir", required=True, help="stage dir of a prior run")
    ap.add_argument("--new", help="web_pages parquet of the new batch")
    ap.add_argument("--labeled", help="labeled_pairs parquet for evaluation")
    ap.add_argument("--demo", choices=sorted(DEMO_SIZES), help="self-contained demo")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--no-html", action="store_true", help="trust the text column")
    args = ap.parse_args()

    spark = get_spark("er_append", cores=args.cores)
    cfg = DEFAULT_CONFIG
    os.makedirs(args.workdir, exist_ok=True)
    t0 = time.time()

    if args.demo:
        corpus_dir = os.path.join(args.workdir, "corpus")
        if not os.path.isdir(os.path.join(corpus_dir, "web_pages")):
            print(f"generating demo corpus ({args.demo}) ...", flush=True)
            corpus = fx.generate_corpus(n_entities=DEMO_SIZES[args.demo])
            fx.write_corpus(spark, corpus, corpus_dir)
        pages = spark.read.parquet(os.path.join(corpus_dir, "web_pages"))
        args.labeled = os.path.join(corpus_dir, "labeled_pairs")
        is_new = F.pmod(F.xxhash64("url"), F.lit(5)) == 0
        base_pages, new_pages = pages.where(~is_new), pages.where(is_new)
        print("running base pipeline on the ~80% split ...", flush=True)
        ERPipeline(spark, args.workdir, cfg).run(
            base_pages, labeled_urls=spark.read.parquet(args.labeled)
        )
    else:
        if not args.new:
            ap.error("--new or --demo required")
        new_pages = spark.read.parquet(args.new)

    old_offers = spark.read.parquet(os.path.join(args.workdir, "offers"))
    old_attrs = spark.read.parquet(os.path.join(args.workdir, "attrs"))
    old_clusters = spark.read.parquet(os.path.join(args.workdir, "clusters"))
    with open(os.path.join(args.workdir, "model.json")) as f:
        saved = json.load(f)
    matcher = M.LinearMatcher(
        tuple(saved["feature_cols"]), tuple(saved["coefficients"]),
        float(saved["intercept"]),
    )
    tau = float(saved["threshold"])

    new_offers = normalize_web_pages(
        new_pages, lang=cfg.lang_filter, use_html=not args.no_html
    ).join(old_offers.select("record_id"), "record_id", "left_anti")
    new_offers = new_offers.localCheckpoint(eager=True)

    # fit_idf is deterministic, so refitting on the base offers reproduces
    # the original run's IDF exactly — the frozen vocabulary the incremental
    # contract requires, with no extra persisted state.
    idf = S.fit_idf(old_offers)
    res = INC.incremental_assign(
        old_offers, old_attrs, old_clusters, new_offers,
        idf, matcher, tau, cfg,
    )
    assignments = res.assignments.localCheckpoint(eager=True)
    merges = res.merges.localCheckpoint(eager=True)

    # Counts against the OLD clusters dir must happen before it is replaced.
    out = {
        "base_records": old_offers.count(),
        "new_records": new_offers.count(),
        "clusters_before": old_clusters.select("cluster_id").distinct().count(),
        "clusters_after": assignments.select("cluster_id").distinct().count(),
        "merges": merges.count(),
    }

    assignments.write.mode("overwrite").parquet(os.path.join(args.workdir, "clusters"))
    merges.write.mode("overwrite").parquet(os.path.join(args.workdir, "merges"))
    out["elapsed_sec"] = round(time.time() - t0, 2)
    if args.labeled:
        offers_all = old_offers.select(*new_offers.columns).unionByName(new_offers)
        labeled_ids = EV.labeled_pairs_to_ids(
            spark.read.parquet(args.labeled), offers_all
        )
        m = EV.confusion(EV.cluster_predictions(labeled_ids, assignments))
        out.update(
            precision=round(m.precision, 4), recall=round(m.recall, 4),
            f1=round(m.f1, 4),
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
