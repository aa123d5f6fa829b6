"""Connected components: differential oracle vs Python union-find on seeded
random graphs; invariance under edge order/direction; singleton handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.operators import cluster as C


def _spark_components(spark, edges, local_finish_rows=4_000_000):
    df = spark.createDataFrame(edges or [(0, 0)], "id_l long, id_r long")
    if not edges:
        df = df.limit(0)
    got = C.connected_components(df, local_finish_rows=local_finish_rows)
    return {r["record_id"]: r["cluster_id"] for r in got.collect()}


# local_finish_rows=0 pins the pure distributed large-star/small-star
# alternation; the default exercises the single-task Shiloach-Vishkin
# finisher (which at test scale triggers before any LS/SS round). Both
# must agree exactly with the union-find oracle.
@pytest.mark.parametrize("finish_rows", [0, 4_000_000])
@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 20), (2, 100, 80), (3, 200, 300), (4, 50, 5)])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges, finish_rows):
    rng = np.random.default_rng(seed)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
        if a != b
    ]
    got = _spark_components(spark, edges, local_finish_rows=finish_rows)
    want = C.union_find_oracle(edges)
    # oracle roots are component minima because union always keeps the min
    assert got == want


def test_cc_local_finish_midloop_handoff(spark):
    """Force the realistic hybrid schedule: the initial frontier exceeds the
    threshold (so at least one distributed LS/SS round runs), the collapsed
    frontier dips below it while a high-diameter remnant is NOT yet
    converged, and the finisher must complete that remnant correctly."""
    clique = [(i, j) for i in range(40) for j in range(i + 1, 40)]  # 780 edges
    chain = [(1000 + i, 1001 + i) for i in range(40)]  # diameter-40 tail
    edges = clique + chain
    hybrid = _spark_components(spark, edges, local_finish_rows=100)
    pure = _spark_components(spark, edges, local_finish_rows=0)
    want = C.union_find_oracle(edges)
    assert hybrid == want
    assert pure == want


@pytest.mark.parametrize("finish_rows", [0, 4_000_000])
def test_cc_chain_and_star(spark, finish_rows):
    chain = [(i, i + 1) for i in range(20)]  # worst-case diameter
    got = _spark_components(spark, chain, local_finish_rows=finish_rows)
    assert set(got.values()) == {0}
    star = [(0, i) for i in range(1, 15)]
    got = _spark_components(spark, star, local_finish_rows=finish_rows)
    assert set(got.values()) == {0}


def test_cc_edge_order_invariance(spark):
    edges = [(5, 3), (1, 9), (9, 5), (2, 7)]
    a = _spark_components(spark, edges)
    b = _spark_components(spark, list(reversed([(y, x) for x, y in edges])))
    assert a == b


def test_assign_clusters_keeps_singletons(spark):
    all_ids = spark.createDataFrame([(i,) for i in range(6)], "record_id long")
    comps = C.connected_components(
        spark.createDataFrame([(0, 1), (2, 3)], "id_l long, id_r long")
    )
    got = {
        r["record_id"]: r["cluster_id"]
        for r in C.assign_clusters(all_ids, comps).collect()
    }
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 5}


def test_cc_large_random_graph(spark):
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 2000, size=(1500, 2)) if a != b]
    got = _spark_components(spark, edges)
    want = C.union_find_oracle(edges)
    assert got == want
