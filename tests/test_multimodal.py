"""Multimodal column plumbing: schema stability, determinism across
partitionings, and the decode/resize/frame-sample operator contracts."""

import pytest
from pyspark.sql import functions as F

from dq import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, 200, num_partitions=4).cache()


def test_media_meta_columns(media):
    row = media.filter(F.col("media_id") == 7).collect()[0]
    assert row["meta"]["media_type"] == "image"
    assert row["meta"]["n_bytes"] == len(row["payload"])
    assert len(row["meta"]["sha1"]) == 40


def test_decode_images_deterministic_across_partitions(spark):
    a = mm.decode_images(mm.synthetic_media(spark, 100, num_partitions=2))
    b = mm.decode_images(mm.synthetic_media(spark, 100, num_partitions=16))
    ra = {r["media_id"]: r["img"] for r in a.collect()}
    rb = {r["media_id"]: r["img"] for r in b.collect()}
    assert ra == rb
    assert all(64 <= v["width"] <= 2047 for v in ra.values())
    assert all(v["channels"] == 3 for v in ra.values())


def test_decode_images_null_payload(spark):
    df = spark.createDataFrame([(1, None)], "media_id long, payload binary")
    out = mm.decode_images(df).collect()
    assert out[0]["img"] is None


def test_real_decoder_is_gated(spark):
    if mm._HAS_PIL:
        pytest.skip("PIL present; gate not applicable")
    with pytest.raises(NotImplementedError):
        mm.real_image_decoder(b"notanimage")


def test_resize_stub_schema_and_determinism(media):
    out = mm.resize_stub(media, 224, 224)
    rows = out.limit(5).collect()
    assert {r["resized_w"] for r in rows} == {224}
    assert all(len(r["resized"]) == 20 for r in rows)
    again = {r["media_id"]: r["resized"]
             for r in mm.resize_stub(media, 224, 224).collect()}
    first = {r["media_id"]: r["resized"] for r in out.collect()}
    assert first == again


def test_sample_frames_grain(media):
    frames = mm.sample_frames(media.limit(10), every_ms=500)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_index", "frame_ts_ms",
                                "frame_sha1"}
    for _, grp in pdf.groupby("media_id"):
        ts = grp.sort_values("frame_index")["frame_ts_ms"].tolist()
        assert ts == sorted(ts)
        assert ts[0] == 0
        assert all(b - a == 500 for a, b in zip(ts, ts[1:]))
