"""Frozen pipeline configuration.

BASELINE.json's north rule requires F1 >= 0.99 "under the same blocking keys";
these constants ARE the blocking keys' definition (FIXTURES.md section 5) and
are hashed into stage manifests so a resume with different config recomputes.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class BlockingConfig:
    # MinHash/LSH: k = bands * rows signature length; band id is the block key.
    # b=32 x r=2 puts the S-curve threshold near J~0.17 with catch>=0.996 at
    # J=0.4 — sized to the corpus noise tier (same-entity pairs bottom out
    # around token-Jaccard 0.4); candidate explosion is bounded by block_cap.
    minhash_k: int = 64
    lsh_bands: int = 32
    lsh_rows: int = 2
    # Hash seeds: xxhash64(token, seed) for seed in range(minhash_k).
    # Secondary cheap blocker: first N tokens (sorted) of the normalized title.
    prefix_tokens: int = 2
    # Per-block candidate-pair cap (W1): blocks larger than this are capped by
    # keeping the first `block_cap` members by record_id (deterministic).
    block_cap: int = 200
    # Skew salting: blocks with > salt_threshold members get `salt_buckets`
    # sub-blocks via pmod(xxhash64(record_id), salt_buckets) on one side.
    salt_threshold: int = 50
    salt_buckets: int = 8


@dataclass(frozen=True)
class ScoringConfig:
    # Feature columns computed per candidate pair, in assembly order.
    feature_cols: tuple[str, ...] = (
        "jaccard",
        "lev_sim",
        "jw_sim",
        "tfidf_cos",
        "price_sim",
        "brand_eq",
    )
    # Match threshold on the calibrated classifier probability.
    threshold: float = 0.5
    # Cheap-feature cascade gate: candidate pairs with token Jaccard below
    # this are dropped before the Python-side features (certain non-matches).
    gate_jaccard: float = 0.15
    # TF-IDF hashing dimensionality for the cosine feature.
    tfidf_min_df: int = 1


@dataclass(frozen=True)
class PipelineConfig:
    # Bump on stage-output schema/semantics changes: part of the config hash,
    # so existing checkpoints are invalidated on upgrade.
    version: str = "3"
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    lang_filter: str = "en"
    # Number of url-hash partitions for per-partition checkpoint/lineage.
    n_checkpoint_partitions: int = 8

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=list)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
