"""Connected components: differential oracle vs Python union-find on seeded
random graphs; invariance under edge order/direction; singleton handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.operators import cluster as C


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "id_l long, id_r long")
    if not edges:
        df = df.limit(0)
    got = C.connected_components(df)
    return {r["record_id"]: r["cluster_id"] for r in got.collect()}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 20), (2, 100, 80), (3, 200, 300), (4, 50, 5)])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
        if a != b
    ]
    got = _spark_components(spark, edges)
    want = C.union_find_oracle(edges)
    # oracle roots are component minima because union always keeps the min
    assert got == want


def test_cc_chain_and_star(spark):
    chain = [(i, i + 1) for i in range(20)]  # worst-case diameter
    got = _spark_components(spark, chain)
    assert set(got.values()) == {0}
    star = [(0, i) for i in range(1, 15)]
    got = _spark_components(spark, star)
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
