"""Two-parallelism-level scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the criterion is evidenced by
running the SAME job at local[8] and local[32] on the SAME input (one
subprocess per level — separate JVMs, shuffle partitions pinned to 2x cores
per level), reporting candidate-pairs-scored/sec at both plus

    efficiency = throughput(32) / (4 * throughput(8))

over the parallel pipeline stages. Writes BENCH/BASELINE.md and prints one
JSON line. Usage: python bench_scaling.py [--sf-dir D] [--runs K]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

# Stages whose work parallelizes across executors (excludes the fixed-cost
# LR fit, which is a one-time driver-side model fit at any cluster size).
PARALLEL_STAGES = [
    "er_ingest_normalize",
    "er_tfidf_vectors",
    "er_block_pairs",
    "er_score_pairs",
    "er_cluster_cc",
]


def run_level(cores: int, sf_dir: str, runs: int) -> list[dict]:
    out = []
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cores),
    )
    for i in range(runs):
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        out.append(json.loads(line))
    return out


def summarize(results: list[dict]) -> dict:
    def med(key_fn):
        return statistics.median(key_fn(r) for r in results)

    return {
        "total_sec": med(lambda r: r["value"]),
        "parallel_sec": med(lambda r: sum(r["queries"][s] for s in PARALLEL_STAGES)),
        "score_sec": med(lambda r: r["queries"]["er_score_pairs"]),
        "pairs_per_sec": med(lambda r: r["pairs_scored_per_sec"]),
        "n_pairs": results[0]["n_candidate_pairs"],
        "n_records": results[0]["n_records"],
        "f1": results[0]["f1"],
        "stages": {
            s: statistics.median(r["queries"][s] for r in results)
            for s in PARALLEL_STAGES
        },
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    # warm the corpus cache (generated once, reused by both levels)
    lo = summarize(run_level(args.low, args.sf_dir, args.runs))
    hi = summarize(run_level(args.high, args.sf_dir, args.runs))

    factor = args.high / args.low
    eff_pairs = (hi["pairs_per_sec"] / lo["pairs_per_sec"]) / factor
    eff_parallel = (lo["parallel_sec"] / hi["parallel_sec"]) / factor
    eff_score = (lo["score_sec"] / hi["score_sec"]) / factor

    report = {
        "metric": "scaling_efficiency",
        "low_cores": args.low,
        "high_cores": args.high,
        "runs_per_level": args.runs,
        "low": lo,
        "high": hi,
        "efficiency_pairs_per_sec": round(eff_pairs, 3),
        "efficiency_parallel_stages": round(eff_parallel, 3),
        "efficiency_score_stage": round(eff_score, 3),
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = [
        "# BENCH/BASELINE — measured scaling evidence",
        "",
        "North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.",
        "Sandbox protocol (no real cluster): same job, same input, separate JVMs at",
        f"`local[{args.low}]` vs `local[{args.high}]`, shuffle partitions pinned to 2x cores,",
        f"median of {args.runs} run(s) per level. Input: bench web-pages corpus",
        f"({lo['n_records']} records, {lo['n_pairs']} candidate pairs), sf dir `{args.sf_dir}`.",
        "",
        "| quantity | local[%d] | local[%d] | efficiency |" % (args.low, args.high),
        "| --- | --- | --- | --- |",
        "| candidate pairs scored/sec | {:,.0f} | {:,.0f} | **{:.3f}** |".format(
            lo["pairs_per_sec"], hi["pairs_per_sec"], eff_pairs
        ),
        "| parallel stages wall (s) | {:.1f} | {:.1f} | **{:.3f}** |".format(
            lo["parallel_sec"], hi["parallel_sec"], eff_parallel
        ),
        "| scoring stage wall (s) | {:.1f} | {:.1f} | **{:.3f}** |".format(
            lo["score_sec"], hi["score_sec"], eff_score
        ),
        "",
        "Per-stage wall seconds (median):",
        "",
        "| stage | local[%d] | local[%d] | speedup |" % (args.low, args.high),
        "| --- | --- | --- | --- |",
    ]
    for s in PARALLEL_STAGES:
        md.append(
            "| {} | {:.1f} | {:.1f} | {:.2f}x |".format(
                s, lo["stages"][s], hi["stages"][s], lo["stages"][s] / max(hi["stages"][s], 1e-9)
            )
        )
    md += [
        "",
        f"Pairwise match F1 on labeled pairs at both levels: {lo['f1']} / {hi['f1']}.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(report, indent=2),
        "```",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(md))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
