"""Pure-stdlib PNG/WAV codecs (operators/codecs.py): bit-exact
round-trips across every channel count and PNG filter type, error
paths, and the Spark decode pipeline built on them."""

from __future__ import annotations

import numpy as np
import pytest

from hls_stac_parquet_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_channel(channels, filter_type):
    rng = np.random.default_rng(7 * channels + filter_type)
    px = rng.integers(0, 256, size=(11, 13, channels), dtype=np.uint8)
    out = decode_png(encode_png(px, filter_type=filter_type))
    assert out.shape == px.shape
    assert np.array_equal(out, px)


def test_png_gradient_compresses_and_roundtrips():
    g = np.tile(np.arange(128, dtype=np.uint8), (64, 1))
    paeth = encode_png(g, filter_type=4)
    none = encode_png(g, filter_type=0)
    assert len(paeth) < len(none)  # filters actually filter
    assert np.array_equal(decode_png(paeth)[:, :, 0], g)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    ok = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    ok[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(ok))


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-30000, 30000, size=500).astype(np.int16)
    sr, out = decode_wav(encode_wav(16000, mono))
    assert sr == 16000 and np.array_equal(out[:, 0], mono)
    stereo = rng.integers(-30000, 30000, size=(250, 2)).astype(np.int16)
    sr2, out2 = decode_wav(encode_wav(44100, stereo))
    assert sr2 == 44100 and np.array_equal(out2, stereo)


def test_wav_rejects_non_pcm():
    data = bytearray(encode_wav(8000, np.zeros(10, dtype=np.int16)))
    data[20] = 3  # format code -> IEEE float
    with pytest.raises(ValueError, match="format code"):
        decode_wav(bytes(data))


def test_decode_image_stats_real_png_pipeline(spark):
    """The Spark pipeline: raw buffers -> PNG encode (all filters via
    id rotation) -> codec-seam decode -> stats equal a numpy replay
    on the ORIGINAL pixels (the round-trip is lossless)."""
    from hls_stac_parquet_spark.operators.multimodal import (
        decode_image_stats,
        encode_images_png,
    )

    rng = np.random.default_rng(11)
    rows = [
        (int(i), rng.integers(0, 256, size=16 * 16, dtype=np.uint8).tobytes())
        for i in range(10)
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: r
        for r in decode_image_stats(
            encode_images_png(media, src_width=16, src_height=16)
        ).collect()
    }
    for mid, payload in rows:
        px = np.frombuffer(payload, dtype=np.uint8).reshape(16, 16, 1)
        r = got[mid]
        assert (r["height"], r["width"], r["channels"]) == (16, 16, 1)
        assert abs(r["mean_px"] - px.mean()) < 1e-3
        assert r["n_bytes"] > 0


def test_wav_pipeline_equals_raw_pcm_pipeline(spark):
    """The WAV round-trip is lossless (both paths drop an odd trailing
    byte), so q_wav_decode_pipeline must produce EXACTLY
    q_pcm_audio_pipeline's stats on the same corpus."""
    from hls_stac_parquet_spark.queries import REGISTRY
    from tests.conftest import SF0001

    wav = sorted(
        map(tuple, REGISTRY["q_wav_decode_pipeline"].fn(spark, SF0001).collect())
    )
    raw = sorted(
        map(tuple, REGISTRY["q_pcm_audio_pipeline"].fn(spark, SF0001).collect())
    )
    assert wav == raw


def test_decode_audio_wav_malformed_blob_survives(spark):
    from hls_stac_parquet_spark.operators.multimodal import decode_audio_wav

    media = spark.createDataFrame(
        [(1, b"not audio"), (2, None)], "media_id long, content binary"
    )
    rows = {r["media_id"]: r for r in decode_audio_wav(media).collect()}
    assert rows[1]["sample_rate"] == -1 and rows[1]["content"] == bytearray()
    assert rows[2]["sample_rate"] == -1


def test_decode_image_stats_malformed_blob_survives(spark):
    from hls_stac_parquet_spark.operators.multimodal import decode_image_stats

    media = spark.createDataFrame(
        [(1, b"not an image"), (2, None)], "media_id long, content binary"
    )
    rows = {r["media_id"]: r for r in decode_image_stats(media).collect()}
    assert rows[1]["height"] == -1 and rows[2]["height"] == -1
