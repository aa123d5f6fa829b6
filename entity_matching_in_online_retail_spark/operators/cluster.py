"""Transitive closure: large-star/small-star connected components.

Pure DataFrame implementation of the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014): converges in O(log^2 n) rounds (O(log n) in practice), each round
two groupBy/join dataflows. High-degree nodes are handled by design —
large-star rewires big neighborhoods directly to the component minimum, so a
giant (skewed) component never funnels through one reducer chain.

Per-iteration `localCheckpoint()` truncates the lineage, otherwise the plan
doubles every round. Convergence is detected with a cheap aggregate
fingerprint (count + two independently-seeded hash sums + min/max
endpoints) — no exceptAll diff, no collect of edges; early-stop requires
every component to collide simultaneously.

C3 (test oracle): driver-side union-find in plain Python, used only in tests
as a differential oracle on small graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    m = min(N(u) ∪ {u}). Emit (v, m) for v in N(u), v > u."""
    sym = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; for each u connect all smaller neighbors
    (and u itself) to m = min(N(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        oriented.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        rewired.unionByName(self_edge)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _fingerprint_aggs() -> list:
    """Order-independent edge-set fingerprint aggregates (one pass).

    Early-stop requires FOUR independent components to collide at once:
    two sums over distinct hash-family members (xxhash64 seeded by a mixed-in
    literal, different moduli) plus exact min/max endpoints. Each hash
    collision is ~2^-60 per round; requiring their simultaneous collision
    (plus matching extrema) makes a wrong early-stop effectively impossible
    rather than merely improbable, at zero extra shuffle cost.
    """
    return [
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1_000_000_007))), F.lit(0)
        ).alias("h1"),
        F.coalesce(
            F.sum(
                F.pmod(
                    F.xxhash64("v", "u", F.lit(0x9E3779B9)), F.lit(998_244_353)
                )
            ),
            F.lit(0),
        ).alias("h2"),
        F.coalesce(F.min("u"), F.lit(0)).alias("lo"),
        F.coalesce(F.max("v"), F.lit(0)).alias("hi"),
    ]


def _fingerprint(edges: DataFrame) -> tuple[int, int, int, int, int]:
    """Standalone one-aggregate-pass fingerprint (kept for tests/tools; the
    CC loop folds the same aggregates into the checkpoint via observe)."""
    row = edges.agg(*_fingerprint_aggs()).first()
    return (int(row["n"]), int(row["h1"]), int(row["h2"]),
            int(row["lo"]), int(row["hi"]))


def connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """edges(id_l, id_r) -> (record_id, cluster_id = component min).

    Nodes appearing in no surviving edge are absent; callers keep singletons
    with `assign_clusters`.
    """
    e = (
        edges.select(F.col("id_l").alias("u"), F.col("id_r").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = None
    for i in range(max_iterations):
        # one lineage truncation per LS+SS round (the LS intermediate is
        # consumed exactly once — checkpointing it would only add a barrier).
        # Round 5: the convergence fingerprint rides the SAME action via
        # observe() — metrics are collected as a side effect of the eager
        # checkpoint, so each iteration costs ONE job instead of two
        # (halves the per-iteration driver-barrier latency that dominated
        # the cc 2->8 scaling cell; verified to fire on localCheckpoint).
        # Spark 4.1 quirk: the first observe() initializes the session's
        # lazy ObservationManager (not serializable); MLlib TRAINING
        # SUMMARIES capture the SparkSession, so a summary-carrying model's
        # .transform() afterwards throws "Task not serializable" — use
        # model.copy() (drops the summary) if mixing the two. This engine's
        # scoring never serializes models (plan-literal folds), so only
        # external mllib .transform callers are affected.
        obs = Observation(f"cc_fp_{i}")
        e = (
            _small_star(_large_star(e))
            .observe(obs, *_fingerprint_aggs())
            .localCheckpoint(eager=True)
        )
        m = obs.get
        fp = (int(m["n"]), int(m["h1"]), int(m["h2"]), int(m["lo"]), int(m["hi"]))
        if fp == prev:
            break
        prev = fp
    # Converged state is a star forest oriented large->small: u -> root.
    members = e.select(F.col("u").alias("record_id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("record_id"), F.col("v").alias("cluster_id")).distinct()
    return members.unionByName(roots).dropDuplicates(["record_id"])


def assign_clusters(all_ids: DataFrame, components: DataFrame, id_col: str = "record_id") -> DataFrame:
    """J4: left join components; unmatched records become singleton clusters
    (cluster_id = record_id)."""
    out = all_ids.select(F.col(id_col).alias("record_id")).join(
        components, "record_id", "left"
    )
    return out.select(
        "record_id", F.coalesce("cluster_id", "record_id").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# C3: test-only oracle (plain Python union-find on collected edges).
# ---------------------------------------------------------------------------


def union_find_oracle(edge_list: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in list(parent)}
