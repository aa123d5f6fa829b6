"""Per-parallelism-level stage timer (invoked by bench_scaling.py).

Reads pre-built stage inputs (offers/attrs/pairs parquet + model.json) from a
shared workdir, then times each pipeline stage's dataflow at this JVM's
parallelism level, cold and warm (the warm run measures steady-state
throughput — what a long-lived cluster job amortizes to; the cold run folds
in broadcast builds, AQE re-planning rounds and Python worker spawn).
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from entity_matching_in_online_retail_spark.config import DEFAULT_CONFIG  # noqa: E402
from entity_matching_in_online_retail_spark.operators import blocking as B  # noqa: E402
from entity_matching_in_online_retail_spark.operators import cluster as C  # noqa: E402
from entity_matching_in_online_retail_spark.operators import features as FE  # noqa: E402
from entity_matching_in_online_retail_spark.operators import model as M  # noqa: E402
from entity_matching_in_online_retail_spark.session import get_spark  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(
        f"scale_{args.cores}", cores=args.cores, shuffle_partitions=2 * args.cores
    )
    wd = args.workdir
    offers = spark.read.parquet(os.path.join(wd, "offers"))
    attrs = spark.read.parquet(os.path.join(wd, "attrs"))
    pairs = spark.read.parquet(os.path.join(wd, "pairs"))
    with open(os.path.join(wd, "model.json")) as f:
        saved = json.load(f)
    matcher = M.LinearMatcher(
        tuple(saved["feature_cols"]), tuple(saved["coefficients"]), saved["intercept"]
    )
    tau = float(saved["threshold"])
    cfg = DEFAULT_CONFIG
    n_pairs = pairs.count()

    def run_block():
        keys = B.all_block_keys(offers, cfg.blocking)
        capped = B.cap_blocks(keys, cfg.blocking).localCheckpoint(eager=True)
        _noop(B.candidate_pairs(capped, cfg.blocking))

    def run_score():
        feats = FE.pair_features(
            pairs.select("id_l", "id_r").repartition(2 * args.cores),
            attrs,
            gate_jaccard=cfg.scoring.gate_jaccard,
        )
        _noop(M.score_pairs(feats, matcher))

    scores_path = os.path.join(wd, "scores")

    def run_cc():
        scored = spark.read.parquet(scores_path)
        comps = C.connected_components(M.match_edges(scored, tau))
        comps.write.format("noop").mode("overwrite").save()

    out: dict = {"cores": args.cores, "n_pairs": n_pairs, "stages": {}}
    for name, fn in [("block", run_block), ("score", run_score), ("cc", run_cc)]:
        reps = []
        for _ in range(args.reps):
            t = time.time()
            fn()
            reps.append(round(time.time() - t, 2))
        out["stages"][name] = {"cold": reps[0], "warm": min(reps[1:] or reps)}
    out["pairs_per_sec_warm"] = round(n_pairs / out["stages"]["score"]["warm"], 1)
    out["pairs_per_sec_cold"] = round(n_pairs / out["stages"]["score"]["cold"], 1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
