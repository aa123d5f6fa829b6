"""Append CLI — incremental entity resolution as a spark-submit job.

    spark-submit --py-files em.zip jobs/run_append.py \
        --workdir <existing run's stage dir> --new <web_pages parquet> \
        [--labeled <labeled_pairs parquet>] [--cores N] [--no-html]

Resolves a new batch of web pages against the clustering an earlier
`run_pipeline.py` run left in `--workdir` (offers/attrs/clusters stage
checkpoints + model.json), touching only work proportional to the increment
(see operators/incremental.py). Appends CHAIN: each batch's offers are
persisted under `<workdir>/increments/offers/batch-NNNN/`, so a later batch
blocks and matches against every earlier batch, not just the base run.
Increment attribute vectors are recomputed at load from the frozen base IDF
(deterministic, one artifact per batch = one crash window).

Crash safety without new manifest machinery: the increment parquet is
written BEFORE the updated `clusters/`. A crash between the two leaves
records that exist in increments but not in clusters; the next append (or a
re-run with an empty batch) treats exactly those records as part of the new
batch — their ids pass through cluster contraction unchanged (left-join
coalesce), their candidate pairs are regenerated, and the clustering
converges to the same result (tested). Re-running an already-applied batch
is a no-op: its records anti-join away and no new increment dir is written.

Sandbox demo (no external data): `--demo tiny` generates the fixtures
corpus, runs the BASE pipeline on the ~80% of records with
pmod(xxhash64(url), 5) != 0, then appends the remaining ~20% and evaluates
pairwise F1 of the updated clustering against the full labeled set. Demo
re-runs wipe `increments/` first (the base pipeline rebuild resets
`clusters/`, so stale increments would otherwise look crash-orphaned).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark import fixtures as fx
from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG, PipelineConfig
from entity_matching_in_online_retail_spark.functions import similarity as S
from entity_matching_in_online_retail_spark.operators import features as FE
from entity_matching_in_online_retail_spark.operators import incremental as INC
from entity_matching_in_online_retail_spark.operators import model as M
from entity_matching_in_online_retail_spark.operators.normalize import (
    normalize_web_pages,
)
from entity_matching_in_online_retail_spark.plans import evaluate as EV
from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline
from entity_matching_in_online_retail_spark.session import get_spark

DEMO_SIZES = {"tiny": 50, "small": 2000}

OFFER_COLS = [
    "record_id", "url", "domain", "warc_ts", "lang", "text",
    "norm_text", "tokens", "title_norm", "brand", "price",
]


def _inc_dir(workdir: str) -> str:
    return os.path.join(workdir, "increments", "offers")


def _load_known_offers(spark: SparkSession, workdir: str) -> tuple[DataFrame, DataFrame]:
    """(base offers, base ∪ increment offers) on the shared offer schema."""
    base = spark.read.parquet(os.path.join(workdir, "offers")).select(*OFFER_COLS)
    inc_root = _inc_dir(workdir)
    batches = sorted(os.listdir(inc_root)) if os.path.isdir(inc_root) else []
    all_offers = base
    for b in batches:
        all_offers = all_offers.unionByName(
            spark.read.parquet(os.path.join(inc_root, b)).select(*OFFER_COLS)
        )
    return base, all_offers


def append_batch(
    spark: SparkSession,
    workdir: str,
    new_pages: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    use_html: bool = True,
) -> dict:
    """Resolve one batch against the workdir's clustering; persist the
    increment + updated clusters/merges; return summary counts."""
    base_offers, known_offers = _load_known_offers(spark, workdir)
    old_clusters = spark.read.parquet(os.path.join(workdir, "clusters"))
    with open(os.path.join(workdir, "model.json")) as f:
        saved = json.load(f)
    matcher = M.LinearMatcher(
        tuple(saved["feature_cols"]), tuple(saved["coefficients"]),
        float(saved["intercept"]),
    )
    tau = float(saved["threshold"])

    # Frozen vocabulary: the IDF of the base full run, refit
    # deterministically (same input → identical table, no persisted state).
    idf = S.fit_idf(base_offers)

    incoming = (
        normalize_web_pages(new_pages, lang=cfg.lang_filter, use_html=use_html)
        .select(*OFFER_COLS)
        .join(known_offers.select("record_id"), "record_id", "left_anti")
    )
    # Crash recovery: increment records that never made it into clusters/
    # re-enter as part of this batch (their pairs are regenerated; their ids
    # pass through contraction unchanged).
    orphans = known_offers.join(
        old_clusters.select("record_id"), "record_id", "left_anti"
    )
    new_offers = incoming.unionByName(orphans).localCheckpoint(eager=True)

    resolved_offers = known_offers.join(
        old_clusters.select("record_id"), "record_id", "left_semi"
    )
    # Base attrs come from the checkpoint; increment attrs are recomputed
    # from the frozen IDF (deterministic, avoids a second crash artifact).
    base_attrs = spark.read.parquet(os.path.join(workdir, "attrs"))
    inc_resolved = resolved_offers.join(
        base_offers.select("record_id"), "record_id", "left_anti"
    )
    inc_vecs = FE.offers_with_vectors(inc_resolved, idf)
    attrs = base_attrs.select(*inc_vecs.columns).unionByName(inc_vecs)
    # restrict to resolved records (base attrs may include crash orphans)
    attrs = attrs.join(old_clusters.select("record_id"), "record_id", "left_semi")

    res = INC.incremental_assign(
        resolved_offers, attrs, old_clusters, new_offers,
        idf, matcher, tau, cfg,
    )
    assignments = res.assignments.localCheckpoint(eager=True)
    merges = res.merges.localCheckpoint(eager=True)

    out = {
        "base_records": resolved_offers.count(),
        "new_records": incoming.count(),
        "recovered_records": orphans.count(),
        "clusters_before": old_clusters.select("cluster_id").distinct().count(),
        "clusters_after": assignments.select("cluster_id").distinct().count(),
        "merges": merges.count(),
    }

    # Write order is the crash contract: increment first, clusters second.
    if out["new_records"] > 0:
        inc_root = _inc_dir(workdir)
        os.makedirs(inc_root, exist_ok=True)
        batch_name = f"batch-{len(os.listdir(inc_root)):04d}"
        incoming.write.mode("errorifexists").parquet(
            os.path.join(inc_root, batch_name)
        )
    assignments.write.mode("overwrite").parquet(os.path.join(workdir, "clusters"))
    merges.write.mode("overwrite").parquet(os.path.join(workdir, "merges"))
    return out


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
        # The base rebuild resets clusters/; drop increments with it so the
        # demo is a deterministic base-plus-one-batch scenario every run.
        shutil.rmtree(os.path.join(args.workdir, "increments"), ignore_errors=True)
        print("running base pipeline on the ~80% split ...", flush=True)
        ERPipeline(spark, args.workdir, cfg).run(
            base_pages, labeled_urls=spark.read.parquet(args.labeled)
        )
    else:
        if not args.new:
            ap.error("--new or --demo required")
        new_pages = spark.read.parquet(args.new)

    out = append_batch(
        spark, args.workdir, new_pages, cfg, use_html=not args.no_html
    )
    out["elapsed_sec"] = round(time.time() - t0, 2)

    if args.labeled:
        _, known = _load_known_offers(spark, args.workdir)
        labeled_ids = EV.labeled_pairs_to_ids(
            spark.read.parquet(args.labeled), known
        )
        clusters = spark.read.parquet(os.path.join(args.workdir, "clusters"))
        m = EV.confusion(EV.cluster_predictions(labeled_ids, clusters))
        out.update(
            precision=round(m.precision, 4), recall=round(m.recall, 4),
            f1=round(m.f1, 4),
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
