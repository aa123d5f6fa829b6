"""Multimodal plumbing: schemas, mapInPandas batching, deterministic fakes."""

import pytest
from pyspark.sql import functions as F

from entity_matching_in_online_retail_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(MM.make_media_rows(60), MM.MEDIA_SCHEMA).cache()


def test_media_fixture_deterministic(spark):
    a = MM.make_media_rows(10)
    b = MM.make_media_rows(10)
    assert a == b


def test_decode_image_meta(spark, media):
    out = MM.decode_image_meta(media)
    rows = {r["media_id"]: r for r in out.collect()}
    n_images = media.where(F.col("kind") == "image").count()
    assert len(rows) == n_images
    for r in rows.values():
        assert r["n_bytes"] == r["width"] * r["height"]


def test_decode_real_codec_is_stubbed(spark, media):
    with pytest.raises(NotImplementedError, match="not available"):
        MM.decode_image_meta(media, real_codec=True).collect()


def test_extract_features_unit_norm_and_stable(spark, media):
    import numpy as np

    out1 = {r["media_id"]: r["features"] for r in MM.extract_features(media).collect()}
    out2 = {r["media_id"]: r["features"] for r in MM.extract_features(media.repartition(7)).collect()}
    assert out1 == out2  # partitioning-invariant
    assert len(out1) == media.where(F.col("payload").isNotNull()).count()
    # normalized over the full 64-byte digest expansion; the 16-dim slice
    # still has a stable, nonzero norm
    for v in out1.values():
        assert 0 < np.linalg.norm(v) <= 1.0 + 1e-6


def test_resize_image(spark, media):
    out = MM.resize_image(media, 4, 4)
    metas = MM.decode_image_meta(out)
    for r in metas.collect():
        assert (r["width"], r["height"], r["n_bytes"]) == (4, 4, 16)
    assert out.count() == media.where(F.col("kind") == "image").count()


def test_sample_frames(spark, media):
    out = MM.sample_frames(media, every=2)
    per = out.groupBy("media_id").count().collect()
    assert per, "expected video rows"
    # frame indices are the even ones
    bad = out.where(F.col("frame_idx") % 2 != 0).count()
    assert bad == 0
