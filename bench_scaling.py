"""Two-parallelism-level scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the criterion is evidenced by
running the SAME stage dataflows at local[8] and local[32] (separate JVMs,
shuffle partitions pinned to 2x cores) over the SAME pre-built inputs, and

    efficiency = throughput(4N) / (4 * throughput(N))

Protocol details that make the measurement honest on one box:
  - a large corpus (E=50k entities, ~370k records, ~10^8 candidate pairs) so
    compute dominates fixed costs;
  - per stage we report cold (first run: broadcast builds, AQE re-planning,
    Python worker spawn) AND warm (second run) times; efficiency is computed
    on warm times — the steady-state throughput a long-lived cluster job
    amortizes to — with cold numbers reported alongside;
  - inputs are built once (resumable manifest pipeline) and shared.

Writes BENCH/BASELINE.md and prints one JSON line.
Usage: python bench_scaling.py [--entities 50000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def prepare_inputs(entities: int, workdir: str) -> dict:
    """Build offers/attrs/pairs/scores + model once at full parallelism
    (manifest-gated: instant if already built)."""
    from entity_matching_in_online_retail_spark import fixtures as fx
    from entity_matching_in_online_retail_spark.plans.pipeline import ERPipeline
    from entity_matching_in_online_retail_spark.session import get_spark

    spark = get_spark("scaling_prep", cores=32, shuffle_partitions=64)
    corpus_dir = os.path.join(REPO, ".bench_cache", f"corpus_e{entities}")
    if not os.path.exists(os.path.join(corpus_dir, "_DONE")):
        corpus = fx.generate_corpus(n_entities=entities, hot_entities=5, hot_size=200)
        fx.write_corpus(spark, corpus, corpus_dir)
        with open(os.path.join(corpus_dir, "_DONE"), "w") as f:
            f.write("ok")
    pages = spark.read.parquet(os.path.join(corpus_dir, "web_pages"))
    labeled = spark.read.parquet(os.path.join(corpus_dir, "labeled_pairs"))
    pipe = ERPipeline(spark, workdir)
    res = pipe.run(pages, labeled_urls=labeled)
    info = {
        "n_records": res.clusters.count(),
        "f1": round(res.metrics.f1, 4) if res.metrics else None,
    }
    spark.stop()
    return info


def run_level(cores: int, workdir: str, reps: int) -> dict:
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench_stage_runner.py"),
            "--cores", str(cores),
            "--workdir", workdir,
            "--reps", str(reps),
        ],
        capture_output=True,
        text=True,
        timeout=5400,
    )
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"runner failed at {cores} cores:\n{p.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=50000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    workdir = os.path.join(REPO, ".bench_cache", f"scaling_wd_e{args.entities}")
    os.makedirs(workdir, exist_ok=True)
    info = prepare_inputs(args.entities, workdir)

    lo = run_level(args.low, workdir, args.reps)
    hi = run_level(args.high, workdir, args.reps)

    factor = args.high / args.low

    def eff(stage: str, kind: str) -> float:
        return round(
            (lo["stages"][stage][kind] / hi["stages"][stage][kind]) / factor, 3
        )

    report = {
        "metric": "scaling_efficiency",
        "low_cores": args.low,
        "high_cores": args.high,
        "corpus": {"entities": args.entities, **info, "n_pairs": lo["n_pairs"]},
        "low": lo,
        "high": hi,
        "efficiency_warm": {s: eff(s, "warm") for s in lo["stages"]},
        "efficiency_cold": {s: eff(s, "cold") for s in lo["stages"]},
        "pairs_per_sec": {
            "low_warm": lo["pairs_per_sec_warm"],
            "high_warm": hi["pairs_per_sec_warm"],
            "efficiency": round(
                hi["pairs_per_sec_warm"] / (factor * lo["pairs_per_sec_warm"]), 3
            ),
        },
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = [
        "# BENCH/BASELINE — measured scaling evidence",
        "",
        "North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.",
        "Sandbox protocol (no real cluster; see header of bench_scaling.py): same",
        f"stage dataflows over the same pre-built inputs at `local[{args.low}]` vs",
        f"`local[{args.high}]`, separate JVMs, shuffle partitions = 2x cores.",
        f"Corpus: {args.entities} entities, {info['n_records']} records,",
        f"{lo['n_pairs']:,} candidate pairs; end-to-end pairwise F1 = {info['f1']}.",
        "",
        "Warm = steady-state (2nd run in the JVM); cold = first run (broadcast",
        "builds + AQE re-planning + Python worker spawn included).",
        "",
        f"| stage | local[{args.low}] warm (s) | local[{args.high}] warm (s) | warm efficiency | cold efficiency |",
        "| --- | --- | --- | --- | --- |",
    ]
    for s in lo["stages"]:
        md.append(
            "| {} | {:.1f} | {:.1f} | **{:.3f}** | {:.3f} |".format(
                s,
                lo["stages"][s]["warm"],
                hi["stages"][s]["warm"],
                report["efficiency_warm"][s],
                report["efficiency_cold"][s],
            )
        )
    md += [
        "",
        "Candidate pairs scored/sec (scoring stage, warm): "
        "{:,.0f} at local[{}] → {:,.0f} at local[{}] — efficiency **{:.3f}**.".format(
            lo["pairs_per_sec_warm"], args.low,
            hi["pairs_per_sec_warm"], args.high,
            report["pairs_per_sec"]["efficiency"],
        ),
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
