"""Multimodal binary-column plumbing (decode stubbed per instructions —
libraries absent in this container; Spark-side schema/partitioning/UDF
batch shape are real)."""

import pytest

from logstash_filter_aggregate_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    return multimodal.synth_media(docs)


def _type_shape(dt):
    return dt.simpleString()  # ignores nullability


def test_media_schema(media):
    assert _type_shape(media.schema) == _type_shape(multimodal.MEDIA_SCHEMA)
    r = media.orderBy("media_id").first()
    assert isinstance(r.payload, (bytes, bytearray)) and len(r.payload) == 32
    assert r.meta.kind in ("image", "audio", "video")


def test_extract_features_deterministic_fake(media):
    f1 = {r.media_id: r for r in multimodal.extract_features(media, dim=8).collect()}
    f2 = {r.media_id: r for r in multimodal.extract_features(media.repartition(7), dim=8).collect()}
    assert set(f1) == set(f2) and all(f1[k].feature == f2[k].feature for k in f1)
    any_row = next(iter(f1.values()))
    assert len(any_row.feature) == 8 and any_row.n_bytes == 32
    assert all(0.0 <= v <= 1.0 for v in any_row.feature)


def test_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="not available"):
        multimodal.extract_features(media, fake=False)


def test_frame_sample_counts(media):
    frames = multimodal.frame_sample(media, every_ms=1000)
    vids = media.where("meta.kind = 'video'").select("media_id", "meta.duration_ms").collect()
    got = frames.groupBy("media_id").count().collect()
    expect = {v.media_id: (max(v.duration_ms - 1, 0)) // 1000 + 1 for v in vids}
    assert {g.media_id: g["count"] for g in got} == expect


def test_resize_preserves_aspect(media):
    rows = multimodal.resize_meta(media, max_side=128).collect()
    assert all(max(r.target_width, r.target_height) <= 128 for r in rows)
