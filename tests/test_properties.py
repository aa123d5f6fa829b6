"""Property/randomized tests (hypothesis) on the pure similarity functions,
plus the approx-count-distinct accuracy contract."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_matching_in_online_retail_spark.functions.similarity import (
    jaro,
    jaro_winkler,
    jaro_winkler_batch,
)
from entity_matching_in_online_retail_spark.functions.text import extract_text_bytes
from entity_matching_in_online_retail_spark.operators.cluster import union_find_oracle

# min_codepoint=0: scraped web text can contain U+0000; the batch kernel's
# padding sentinel must not collide with it (codepoints are packed shifted
# by +1 so 0 stays reserved for padding).
TEXT = st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF), max_size=24)


@settings(max_examples=300, deadline=None)
@given(TEXT, TEXT)
def test_jw_symmetric_and_bounded(a, b):
    x, y = jaro_winkler(a, b), jaro_winkler(b, a)
    assert abs(x - y) < 1e-12
    assert 0.0 <= x <= 1.0
    assert jaro(a, b) <= x + 1e-12  # prefix boost never decreases


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_jw_identity(a):
    assert jaro_winkler(a, a) == 1.0


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=40))
def test_jw_batch_equals_scalar(pairs):
    """The vectorized numpy kernel must be bit-compatible with the scalar
    reference (which the DuckDB oracle differentially checks)."""
    sa = [a for a, _ in pairs]
    sb = [b for _, b in pairs]
    got = jaro_winkler_batch(sa, sb)
    want = np.array([jaro_winkler(a, b) for a, b in pairs])
    assert np.allclose(got, want, atol=1e-12), (
        list(zip(sa, sb, got, want))[:3]
    )


def test_jw_batch_nul_bytes():
    """Regression: U+0000 inside a string must score like any other char,
    not silently read as padding (identical strings => exactly 1.0)."""
    got = jaro_winkler_batch(["\x00abc", "a\x00c", "\x00\x00"], ["\x00abc", "abc", ""])
    want = np.array(
        [jaro_winkler("\x00abc", "\x00abc"), jaro_winkler("a\x00c", "abc"), 0.0]
    )
    assert got[0] == 1.0
    assert np.allclose(got, want, atol=1e-12)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)), max_size=60))
def test_union_find_properties(edges):
    comp = union_find_oracle(edges)
    for a, b in edges:
        assert comp[a] == comp[b]  # endpoints co-clustered
    for node, root in comp.items():
        assert comp[root] == root  # roots are fixed points
        assert root <= node  # root is the component minimum


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_extractor_total_and_deterministic(payload):
    """The frozen extractor never raises and is a pure function."""
    a = extract_text_bytes(payload)
    b = extract_text_bytes(payload)
    assert a == b
    assert a is None or isinstance(a, str)


def test_approx_count_distinct_accuracy(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey").alias("n")).first()["n"]
    approx = li.select(
        F.approx_count_distinct("l_orderkey", 0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.06  # 3 * rsd
