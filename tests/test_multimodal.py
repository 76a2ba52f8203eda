"""Multimodal binary-column operators: codec roundtrip, decode stub,
frame sampling, resize, channel stats — numpy golden equality plus the
Spark plumbing at small scale."""

import numpy as np
import pytest

from mit_spark.operators.multimodal import (
    channel_stats,
    decode_external,
    decode_media,
    encode_media,
    frame_sample,
    media_table,
    resize_media,
    synth_media_bytes,
)


def test_codec_roundtrip_image():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 21, 3), dtype=np.uint8)
    kind, out = decode_media(encode_media(img, "image"))
    assert kind == "image"
    np.testing.assert_array_equal(out, img[None])


def test_codec_roundtrip_video():
    rng = np.random.default_rng(8)
    vid = rng.integers(0, 256, size=(5, 16, 12, 3), dtype=np.uint8)
    kind, out = decode_media(encode_media(vid, "video"))
    assert kind == "video"
    np.testing.assert_array_equal(out, vid)


def test_decode_external_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_external("webm", b"\x00\x01")


def test_synth_media_deterministic():
    b1, m1 = synth_media_bytes("m-test-0001")
    b2, m2 = synth_media_bytes("m-test-0001")
    assert b1 == b2 and m1 == m2
    _, frames = decode_media(b1)
    assert frames.shape[0] == m1["n_frames"]
    assert frames.shape[1] == m1["height"] and frames.shape[2] == m1["width"]


def _media_df(spark, n_docs=6):
    from mit_spark.sources.docs_source import load_docs

    docs = load_docs(spark, "/root/testdata/sf0.001", limit=n_docs)
    return media_table(spark, docs)


def test_media_table_schema_and_meta(spark):
    rows = _media_df(spark).collect()
    assert rows, "expected media spans"
    for r in rows:
        kind, frames = decode_media(bytes(r.content))
        assert r.meta.mime == f"x-mit/{kind}"
        assert frames.shape == (r.meta.n_frames, r.meta.height, r.meta.width, r.meta.channels)


def test_frame_sample_counts(spark):
    media = _media_df(spark, n_docs=10).cache()
    metas = {r.media_ref: r.meta.n_frames for r in media.select("media_ref", "meta").collect()}
    sampled = frame_sample(media, every_k=2).collect()
    expected = sum((n + 1) // 2 for n in metas.values())
    assert len(sampled) == expected
    for r in sampled:
        kind, frames = decode_media(bytes(r.content))
        assert kind == "image" and frames.shape[0] == 1
    media.unpersist()


def test_resize_media_dims(spark):
    media = _media_df(spark)
    out = resize_media(media, 40, 24).collect()
    for r in out:
        _, frames = decode_media(bytes(r.content))
        assert frames.shape[1:3] == (24, 40)
        assert (r.meta.width, r.meta.height) == (40, 24)


def test_channel_stats_matches_numpy(spark):
    media = _media_df(spark).cache()
    stats = {(r.media_ref, r.channel): r for r in channel_stats(media).collect()}
    for r in media.collect():
        _, frames = decode_media(bytes(r.content))
        flat = frames.reshape(-1, frames.shape[3]).astype(np.float64)
        for ch in range(frames.shape[3]):
            s = stats[(r.media_ref, ch)]
            assert s.mean == pytest.approx(round(float(flat.mean(axis=0)[ch]), 4))
            assert s.std == pytest.approx(round(float(flat.std(axis=0)[ch]), 4))
    media.unpersist()
