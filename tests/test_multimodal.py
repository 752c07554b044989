"""Multimodal plumbing tests: schemas, determinism, batch shapes,
explode semantics, and composition with the ANN operators. Decoders
are the documented deterministic fakes (real libs absent here)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vectordb_light_spark.operators.multimodal import (
    decode_images,
    image_features,
    media_from_documents,
    resize_images,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def _media(spark, n=20):
    return media_from_documents(spark, SF, limit=n)


def test_media_table_schema(spark):
    m = _media(spark)
    assert dict(m.dtypes)["content"] == "binary"
    meta_type = dict(m.dtypes)["media_meta"]
    assert "duration_ms" in meta_type and "sample_rate" in meta_type
    assert m.count() == 20


def test_decode_images_deterministic(spark):
    m = _media(spark, 10)
    d1 = decode_images(m).select("media_id", "width", "height", "px_mean").collect()
    d2 = decode_images(m).select("media_id", "width", "height", "px_mean").collect()
    assert sorted(map(tuple, d1)) == sorted(map(tuple, d2))
    for r in d1:
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert 0.0 <= r["px_mean"] <= 255.0
    # pass-through columns survive
    cols = decode_images(m).columns
    assert {"media_id", "kind", "content", "media_meta"} <= set(cols)


def test_image_features_unit_norm_and_compose_with_ann(spark):
    m = _media(spark, 30)
    feats = image_features(m, dim=32).drop("content")
    rows = feats.select("media_id", "features").collect()
    for r in rows:
        assert len(r["features"]) == 32
        assert abs(float(np.linalg.norm(r["features"])) - 1.0) < 1e-5
    # media features drive the same ANN operators as text embeddings
    from vectordb_light_spark.operators.similarity import add_srp_signature, ann_topk_srp

    indexed = add_srp_signature(feats, vec_col="features", n_planes=16, dim=32)
    q = [float(x) for x in rows[0]["features"]]
    out = ann_topk_srp(
        indexed, q, k=5, probe_hamming=16, n_planes=16,
        id_col="media_id", vec_col="features",
    ).collect()
    assert out[0]["media_id"] == rows[0]["media_id"]  # self is nearest
    assert out[0]["similarity_score"] > 0.999


def test_resize_byte_contract(spark):
    m = _media(spark, 5)
    out = resize_images(m, 8, 8).select("content", "resized_width").collect()
    for r in out:
        assert len(bytes(r["content"])) == 8 * 8 * 3
        assert r["resized_width"] == 8


def test_sample_frames_counts(spark):
    m = _media(spark, 8).withColumn("kind", F.lit("video"))
    frames = sample_frames(m, every_ms=500)
    per = (
        frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"), F.first("media_meta.duration_ms").alias("d"))
        .collect()
    )
    for r in per:
        assert r["n"] == max(r["d"] // 500, 1)
    one = frames.where(F.col("frame_index") >= 0).select("frame_bytes").first()
    assert isinstance(bytes(one["frame_bytes"]), bytes)
    # frame rows are deterministic across runs
    a = frames.select("media_id", "frame_index", "frame_ts_ms").collect()
    b = sample_frames(m, every_ms=500).select(
        "media_id", "frame_index", "frame_ts_ms"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_audio_windows_boundaries_and_pcm_stub(spark):
    """Window starts stride by hop below duration; ends clamp to the
    clip; the stubbed PCM slice is non-empty, deterministic, and
    proportional to the window's span of the byte stream."""
    from vectordb_light_spark.operators.multimodal import (
        audio_windows,
        media_from_documents,
    )

    media = media_from_documents(spark, SF, kind="audio", limit=20)
    out = audio_windows(media, window_ms=5000, hop_ms=2500).cache()
    rows = out.collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        dur = rs[0]["media_meta"]["duration_ms"]
        rs.sort(key=lambda r: r["window_index"])
        assert [r["window_index"] for r in rs] == list(range(len(rs)))
        for r in rs:
            assert r["win_start_ms"] == r["window_index"] * 2500
            assert r["win_start_ms"] < dur
            assert r["win_end_ms"] == min(r["win_start_ms"] + 5000, dur)
            assert len(bytes(r["window_bytes"])) >= 1
        # full coverage: last window reaches the clip end
        assert rs[-1]["win_end_ms"] == dur

    again = {
        (r["media_id"], r["window_index"]): bytes(r["window_bytes"])
        for r in audio_windows(media, window_ms=5000, hop_ms=2500).collect()
    }
    first = {(r["media_id"], r["window_index"]): bytes(r["window_bytes"]) for r in rows}
    assert first == again


def test_audio_windows_zero_duration_emits_no_window(spark):
    """A zero-duration clip yields ZERO windows — range(0, 0, hop)
    semantics, matching the mm_audio_windows oracle; duration 1 still
    yields exactly one."""
    from vectordb_light_spark.operators.multimodal import (
        audio_windows,
        media_from_documents,
    )

    media = media_from_documents(spark, SF, limit=2)
    zero = media.withColumn(
        "media_meta", F.col("media_meta").withField("duration_ms", F.lit(0))
    )
    assert audio_windows(zero, window_ms=5000, hop_ms=2500).count() == 0
    one = media.limit(1).withColumn(
        "media_meta", F.col("media_meta").withField("duration_ms", F.lit(1))
    )
    rows = audio_windows(one, window_ms=5000, hop_ms=2500).collect()
    assert [r["window_index"] for r in rows] == [0]
    assert rows[0]["win_end_ms"] == 1
