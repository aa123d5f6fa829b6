"""Per-partition stage manifests: lineage + metrics + idempotent resume.

Layout per stage: `{workdir}/{stage}/` holds the data (parquet, partitioned
by part_id) and `{workdir}/_manifests/{stage}/p{part}.json` one commit marker
per partition, written strictly AFTER the partition's data lands. A killed
run therefore leaves at most torn data for uncommitted partitions, which the
resume overwrite replaces (dynamic partition overwrite).

Each marker records lineage (config hash + upstream manifest fingerprint) and
per-partition metrics (row count, content checksum, min/max timestamps) —
the north rule's "per-partition lineage + metrics".
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any


def _manifest_dir(workdir: str, stage: str) -> str:
    return os.path.join(workdir, "_manifests", stage)


def partition_marker_path(workdir: str, stage: str, part: int) -> str:
    return os.path.join(_manifest_dir(workdir, stage), f"p{part}.json")


def commit_partition(
    workdir: str,
    stage: str,
    part: int,
    config_hash: str,
    lineage: str,
    metrics: dict[str, Any],
) -> None:
    d = _manifest_dir(workdir, stage)
    os.makedirs(d, exist_ok=True)
    payload = {
        "stage": stage,
        "part": part,
        "config_hash": config_hash,
        "lineage": lineage,
        "metrics": metrics,
    }
    tmp = partition_marker_path(workdir, stage, part) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, partition_marker_path(workdir, stage, part))  # atomic commit


def done_partitions(workdir: str, stage: str, config_hash: str, lineage: str) -> set[int]:
    """Partitions already committed under the SAME config + upstream lineage."""
    d = _manifest_dir(workdir, stage)
    if not os.path.isdir(d):
        return set()
    done: set[int] = set()
    for fn in os.listdir(d):
        if not (fn.startswith("p") and fn.endswith(".json")):
            continue
        try:
            with open(os.path.join(d, fn)) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if m.get("config_hash") == config_hash and m.get("lineage") == lineage:
            done.add(int(m["part"]))
    return done


def stage_fingerprint(workdir: str, stage: str) -> str:
    """Order-independent fingerprint of a stage's committed markers; feeds the
    next stage's `lineage` so config changes propagate invalidation."""
    d = _manifest_dir(workdir, stage)
    if not os.path.isdir(d):
        return "absent"
    h = hashlib.sha256()
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn), "rb") as f:
                h.update(hashlib.sha256(f.read()).digest())
    return h.hexdigest()[:16]


def clear_stage(workdir: str, stage: str) -> None:
    d = _manifest_dir(workdir, stage)
    if os.path.isdir(d):
        for fn in os.listdir(d):
            os.remove(os.path.join(d, fn))


def read_all_metrics(workdir: str) -> list[dict[str, Any]]:
    root = os.path.join(workdir, "_manifests")
    out = []
    if not os.path.isdir(root):
        return out
    for stage in sorted(os.listdir(root)):
        d = os.path.join(root, stage)
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    out.append(json.load(f))
    return out
