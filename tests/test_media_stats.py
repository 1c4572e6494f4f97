"""Integer-exact media statistics (the oracle-facing decode path).

``image_channel_stats`` / ``audio_sample_stats`` prove the real BMP/WAV
decoders against closed-form arithmetic: blobs from ``synth_media_blobs``
have pixel/sample values that are a pure function of the row key, so the
stats are predictable without decoding. The same formulas back the DuckDB
mirrors of the ``media_bmp_stats`` / ``media_wav_stats`` oracle queries.
"""

from __future__ import annotations

import numpy as np

from co_deduplicate_spark.operators.multimodal import (
    _bmp_decode,
    _wav_decode,
    audio_sample_stats,
    encode_bmp,
    encode_wav,
    image_channel_stats,
    synth_media_blobs,
)

W, H = 7, 9


def _formula_px(mid: int) -> np.ndarray:
    a = mid % 1009
    r = np.arange(H)[:, None, None]
    c = np.arange(W)[None, :, None]
    ch = np.arange(3)[None, None, :]
    return ((a * 131 + r * 17 + c * 29 + ch * 97) % 256).astype(np.uint8)


def _formula_samples(mid: int) -> np.ndarray:
    a = mid % 1009
    n = 64 + mid % 37
    i = np.arange(n)
    return ((a * 13 + i * 7919) % 4001 - 2000).astype(np.int16)


def test_encode_decode_bmp_roundtrip_formula():
    px = _formula_px(12345)
    out = _bmp_decode(encode_bmp(px))
    assert out is not None and np.array_equal(out, px)


def test_encode_decode_wav_roundtrip_formula():
    s = _formula_samples(77)
    wav = _wav_decode(encode_wav(s, rate=8000))
    assert wav is not None and wav[1] == 8000
    assert np.array_equal(np.round(wav[0] * 32768.0).astype(np.int16), s)


def test_image_channel_stats_matches_formula(spark):
    ids = spark.range(0, 40).selectExpr("id AS media_id")
    got = {
        r["media_id"]: r
        for r in image_channel_stats(synth_media_blobs(ids, kind="bmp")).collect()
    }
    assert len(got) == 40
    for mid in (0, 7, 31, 39):
        px = _formula_px(mid).astype(np.int64)
        row = got[mid]
        assert (row["width"], row["height"]) == (W, H)
        assert row["sum_r"] == px[..., 0].sum()
        assert row["sum_g"] == px[..., 1].sum()
        assert row["sum_b"] == px[..., 2].sum()


def test_audio_sample_stats_matches_formula(spark):
    ids = spark.range(0, 40).selectExpr("id AS media_id")
    got = {
        r["media_id"]: r
        for r in audio_sample_stats(synth_media_blobs(ids, kind="wav")).collect()
    }
    assert len(got) == 40
    for mid in (0, 5, 36, 38):
        s = _formula_samples(mid).astype(np.int64)
        row = got[mid]
        assert row["n_samples"] == len(s)
        assert row["rate"] == 8000
        assert row["sum_abs"] == np.abs(s).sum()
        sign = np.sign(s)
        assert row["n_sign_change"] == int(np.sum(sign[1:] * sign[:-1] < 0))


def test_non_media_blobs_dropped(spark):
    junk = spark.createDataFrame(
        [(1, bytearray(b"not a bitmap")), (2, bytearray(b"RIFFxxxxWAVE"))],
        "media_id long, blob binary",
    )
    assert image_channel_stats(junk).count() == 0
    assert audio_sample_stats(junk).count() == 0


def test_video_container_walk_and_sampling(spark):
    """Concatenated-BMP container: header-size-driven walking decodes all
    frames; stride sampling keeps idx 0, n, 2n...; truncated tails stop
    cleanly; garbage yields nothing."""
    from co_deduplicate_spark.operators.multimodal import (
        _video_frames,
        encode_video,
        frame_sample_stats,
    )

    frames = [_formula_px(5), _formula_px(6), _formula_px(7), _formula_px(8)]
    blob = encode_video(frames)
    decoded = list(_video_frames(blob))
    assert len(decoded) == 4
    assert all(np.array_equal(d, f) for d, f in zip(decoded, frames))
    assert list(_video_frames(blob[:-10]))  # truncated tail: first frames survive
    assert len(list(_video_frames(blob[:-10]))) == 3
    assert list(_video_frames(b"not video")) == []

    media = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"junk"))], "media_id long, blob binary"
    )
    rows = frame_sample_stats(media, every_n=2).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in rows} == {(1, 0), (1, 2)}
    for r in rows:
        px = frames[r["frame_idx"]].astype(np.int64)
        assert r["n_frames"] == 4
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(
            px[..., ch].sum() for ch in range(3)
        )
