"""Curation CLI — the corpus-curation funnel as a spark-submit job.

    spark-submit --py-files em.zip jobs/run_curate.py \
        --input <documents parquet> --output <kept-corpus parquet dir> \
        [--benchmark <eval-set parquet>] [--near-dup-threshold 0.8] \
        [--langs en,de] [--min-quality 0.85] [--max-dup-frac 0.08] \
        [--max-top-frac 0.09] [--sample-permille 700] [--cores N]

Runs plans/curate.py's labeled funnel (lang -> quality -> repetition ->
decontamination -> exact-dedup [-> MinHash near-dedup] -> deterministic
sampling) over a documents-shaped table (doc_id, text, ...), writes the
surviving PII-redacted corpus to --output, and prints the per-stage
retention report as ONE JSON line.

Sandbox equivalent (same code path, local master):

    python jobs/run_curate.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated

The report and the output corpus share one funnel lineage (metrics come
from a groupBy over the same label frame that filters the output), so the
job costs one funnel, not two.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_matching_in_online_retail_spark.plans import curate as CUR
from entity_matching_in_online_retail_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser(description="corpus-curation funnel")
    ap.add_argument("--input", required=True, help="documents table (parquet)")
    ap.add_argument("--output", required=True, help="kept-corpus output dir")
    ap.add_argument("--benchmark", help="eval-set table for decontamination")
    ap.add_argument("--langs", default="en", help="comma-separated allowed langs")
    ap.add_argument("--min-quality", type=float, default=0.85)
    ap.add_argument("--max-dup-frac", type=float, default=0.08)
    ap.add_argument("--max-top-frac", type=float, default=0.09)
    ap.add_argument("--near-dup-threshold", type=float, default=None)
    ap.add_argument("--sample-permille", type=int, default=700)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("curate", cores=args.cores)
    cfg = CUR.CurateConfig(
        allowed_langs=tuple(args.langs.split(",")),
        min_quality=args.min_quality,
        max_dup_frac=args.max_dup_frac,
        max_top_frac=args.max_top_frac,
        near_dup_threshold=args.near_dup_threshold,
        sample_permille=args.sample_permille,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None

    t0 = time.time()
    survivors, report = CUR.curate_observed(docs, bench, cfg)
    survivors.write.mode("overwrite").parquet(args.output)
    stages = {s: n for s, (n, _ck) in report().items()}
    print(
        json.dumps(
            {
                "stages": stages,
                "kept": stages.get("kept", 0),
                "total": sum(stages.values()),
                "elapsed_sec": round(time.time() - t0, 2),
                "output": args.output,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
