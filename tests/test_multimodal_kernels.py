"""REAL multimodal kernels (functions/multimodal.py, r4): the decode /
resize / feature math itself — pure-numpy PPM/BMP codecs, bilinear
resample, perceptual average-hash, channel statistics, WAV PCM parsing,
RMS/zero-crossing audio features — verified against analytically-known
synthetic media, plus the Spark-side dispatch (real kernel for decodable
payloads, sha256 stub otherwise, same schema either way)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from kafka_connect_logminer2_spark.functions import multimodal as M


def _gradient(w=20, h=10, seed=7):
    x = np.linspace(0, 255, w).astype(np.uint8)
    y = np.linspace(0, 255, h).astype(np.uint8)
    arr = np.empty((h, w, 3), dtype=np.uint8)
    arr[..., 0] = x[None, :]
    arr[..., 1] = y[:, None]
    arr[..., 2] = seed
    return arr


def test_ppm_roundtrip_exact():
    arr = _gradient()
    out = M.decode_image(M.encode_ppm(arr))
    assert out is not None and out.shape == (10, 20, 3)
    assert np.array_equal(out, arr)
    # and the canned fixture payload decodes to the same construction
    assert np.array_equal(M.decode_image(M.ppm_payload(20, 10, seed=7)), arr)


def test_ppm_header_comments_parsed():
    arr = _gradient(4, 3)
    raw = M.encode_ppm(arr)
    # inject a comment line between magic and dims — legal PPM
    commented = b"P6\n# synthetic\n" + raw[3:]
    assert np.array_equal(M.decode_image(commented), arr)


@pytest.mark.parametrize("w", [4, 5, 6, 7])  # odd widths exercise row padding
def test_bmp_roundtrip_exact(w):
    arr = _gradient(w=w, h=3)
    out = M.decode_image(M.bmp_payload(arr))
    assert out is not None
    assert np.array_equal(out, arr)


def test_undecodable_returns_none():
    assert M.decode_image(b"not an image at all") is None
    assert M.decode_image(b"P6 garbage") is None
    assert M.decode_audio(b"not audio") is None


def test_resize_bilinear_dims_and_solid_color():
    solid = np.full((40, 90, 3), 137, dtype=np.uint8)
    small = M.resize_bilinear(solid, 30)
    # aspect preserved: 90 → 30, 40 → round(40/3)=13
    assert small.shape == (13, 30, 3)
    assert np.all(small == 137)  # interpolating a constant is the constant
    # identity when already within bounds (and a true copy, not a view)
    same = M.resize_bilinear(solid, 128)
    assert same.shape == solid.shape and np.array_equal(same, solid)


def test_resize_bilinear_preserves_gradient_monotonicity():
    arr = _gradient(w=64, h=16)
    small = M.resize_bilinear(arr, 16)
    r = small[0, :, 0].astype(int)
    assert all(a <= b for a, b in zip(r, r[1:]))  # still increasing in x
    assert r[0] < 32 and r[-1] > 223  # endpoints near the original range


def test_ahash64_known_pattern_and_resize_invariance():
    # left half black, right half white → each 8x8 row reads 00001111
    arr = np.zeros((32, 32, 3), dtype=np.uint8)
    arr[:, 16:, :] = 255
    assert M.ahash64(arr) == "0f0f0f0f0f0f0f0f"
    # perceptual stability: hash unchanged under 2x downsample (what the
    # sha256 stub fundamentally cannot provide)
    assert M.ahash64(M.resize_bilinear(arr, 16)) == "0f0f0f0f0f0f0f0f"


def test_ahash64_tiny_images_distinct_and_warning_free():
    """Regression (r4 review): images with width or height < 8 used to
    produce empty block slices → NaN means → the SAME all-zero hash for
    every tiny image (and a flood of numpy warnings). The pixel-sampled
    fallback must hash distinct tiny contents distinctly, silently."""
    import warnings

    left_dark = np.zeros((4, 6, 3), dtype=np.uint8)
    left_dark[:, 3:, :] = 255
    top_dark = np.zeros((4, 6, 3), dtype=np.uint8)
    top_dark[2:, :, :] = 255
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        h1, h2 = M.ahash64(left_dark), M.ahash64(top_dark)
        h3 = M.ahash64(np.full((1, 1, 3), 7, dtype=np.uint8))  # degenerate 1x1
    assert h1 != h2
    assert h1 == "0f0f0f0f0f0f0f0f"  # left-dark pattern, same as the 32px case
    assert h2 == "00000000ffffffff"  # top-dark: first 4 grid rows 0, last 4 set
    assert h3 == "0000000000000000"  # constant image: no bit above the mean


def test_image_stats_features_known_values():
    solid = np.full((8, 8, 3), 128, dtype=np.uint8)
    f = M.image_stats_features(solid)
    assert f[:3] == pytest.approx([128 / 255] * 3, abs=1e-6)
    assert f[3:6] == pytest.approx([0.0] * 3, abs=1e-6)
    assert f[6] == pytest.approx(128 / 255, abs=1e-3) and f[7] == 0.0


def test_wav_decode_and_features_sine():
    payload = M.wav_payload(rate=16000, seconds=0.5, freq=440.0, amp=0.5)
    rate, samples = M.decode_audio(payload)
    assert rate == 16000 and len(samples) == 8000
    f = M.audio_features(samples, rate)
    assert f[0] == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)  # RMS
    # zero crossings per sample: 2 per period, 440 periods/s at 16 kHz
    assert f[1] == pytest.approx(2 * 440 / 16000, rel=0.05)
    assert f[3] == pytest.approx(0.5, rel=1e-3)  # peak
    # 4 quarter-band energies of a steady tone are all ≈ global RMS
    for q in f[4:8]:
        assert q == pytest.approx(f[0], rel=1e-2)


def test_wav_decode_stereo_averages_to_mono():
    import struct

    rate, n = 8000, 100
    left = (np.ones(n) * 10000).astype("<i2")
    right = (np.ones(n) * -10000).astype("<i2")
    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    data = inter.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate_out, samples = M.decode_audio(payload)
    assert rate_out == rate and len(samples) == n
    assert np.allclose(samples, 0.0, atol=1e-9)  # L/R cancel in the mean


def test_spark_dispatch_real_and_stub_rows(spark):
    """One DataFrame mixing decodable media with opaque payloads: real rows
    must carry TRUE decoded dimensions/rates, stub rows the sha256-derived
    fakes — same schema, one mapInPandas plan."""
    rows = [
        (0, "image", "image/ppm", bytearray(M.ppm_payload(20, 10)), "{}"),
        (1, "image", "image/bmp", bytearray(M.bmp_payload(_gradient(5, 3))), "{}"),
        (2, "image", "image/png", bytearray(b"opaque-not-an-image"), "{}"),
        (3, "audio", "audio/wav", bytearray(M.wav_payload(16000, 0.25, 220.0)), "{}"),
        (4, "audio", "audio/mp3", bytearray(b"opaque-not-audio"), "{}"),
    ]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)

    img = {r["media_id"]: r for r in M.extract_image_features(media).collect()}
    assert (img[0]["width"], img[0]["height"]) == (20, 10)  # real decode
    assert (img[1]["width"], img[1]["height"]) == (5, 3)
    assert len(img[0]["phash"]) == 16 and set(img[0]["phash"]) <= set("0123456789abcdef")
    stub_w, stub_h = M._decode_image_stub(b"opaque-not-an-image")
    assert (img[2]["width"], img[2]["height"]) == (stub_w, stub_h)  # stub fallback

    aud = {r["media_id"]: r for r in M.extract_audio_features(media).collect()}
    assert aud[3]["sample_rate"] == 16000
    assert aud[3]["duration_s"] == pytest.approx(0.25, abs=1e-3)
    assert aud[3]["features"][0] == pytest.approx(0.5 / math.sqrt(2), rel=1e-2)
    srate, sdur = M._decode_audio_stub(b"opaque-not-audio")
    assert aud[4]["sample_rate"] == srate and aud[4]["duration_s"] == pytest.approx(sdur)


def test_spark_resize_real_payload_roundtrips(spark):
    """resize_images on a real image: output payload is itself a decodable
    PPM at the reduced dimensions — decode(resize(x)) really is the
    bilinear result, not a fake blob."""
    rows = [(0, "image", "image/ppm", bytearray(M.ppm_payload(64, 32)), "{}")]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = M.resize_images(media, max_side=16).collect()[0]
    assert (out["width"], out["height"]) == (16, 8)
    arr = M.decode_image(bytes(out["payload"]))
    assert arr is not None and arr.shape == (8, 16, 3)
    expected = M.resize_bilinear(M.decode_image(M.ppm_payload(64, 32)), 16)
    assert np.array_equal(arr, expected)


class TestSpectrogram:
    """Numpy ground-truth gates for the STFT/mel kernels (q136's
    correctness story — an FFT has no SQL oracle)."""

    def test_frame_count_formula(self):
        x = np.zeros(1000)
        assert M.stft_power(x, n_fft=256, hop=128).shape == (
            1 + (1000 - 256) // 128,
            129,
        )

    def test_short_clip_zero_pads_to_one_frame(self):
        assert M.stft_power(np.ones(10), n_fft=64, hop=32).shape == (1, 33)

    def test_sine_peaks_at_expected_bin(self):
        rate, n_fft = 8000, 256
        for freq in (400.0, 1000.0, 3000.0):
            t = np.arange(4000) / rate
            x = np.sin(2 * np.pi * freq * t)
            p = M.stft_power(x, n_fft=n_fft, hop=128).mean(axis=0)
            assert abs(int(np.argmax(p)) - round(freq * n_fft / rate)) <= 1, freq

    def test_parseval_energy_scale(self):
        # windowed-frame FFT power must track time-domain energy: for a
        # full-scale sine, total spectral power ≈ N/2 · mean(win²·x²)-ish;
        # we check proportionality between two amplitudes (4× power for 2×)
        rate = 8000
        t = np.arange(4000) / rate
        p1 = M.stft_power(np.sin(2 * np.pi * 500 * t), 256, 128).sum()
        p2 = M.stft_power(2 * np.sin(2 * np.pi * 500 * t), 256, 128).sum()
        assert p2 == pytest.approx(4 * p1, rel=1e-9)

    def test_filterbank_rows_normalized_and_cover(self):
        fb = M.mel_filterbank(8, 256, 8000)
        assert fb.shape == (8, 129)
        assert np.allclose(fb.sum(axis=1), 1.0)
        assert (fb >= 0).all()
        # centers strictly increase in frequency
        centers = fb.argmax(axis=1)
        assert all(a < b for a, b in zip(centers, centers[1:]))

    def test_sine_dominates_band_containing_freq(self):
        rate, n_fft, n_mels = 8000, 256, 8
        fb = M.mel_filterbank(n_mels, n_fft, rate)
        for freq in (400.0, 900.0, 1900.0, 3400.0):
            t = np.arange(2000) / rate
            mel = M.mel_band_energies(np.sin(2 * np.pi * freq * t), rate)
            got = int(np.argmax(mel))
            freq_bin = round(freq * n_fft / rate)
            expect = int(np.argmax(fb[:, freq_bin]))
            assert got == expect, (freq, got, expect)

    def test_spark_extract_drops_undecodable_and_matches_local(self, spark):
        wav = M.wav_payload(rate=8000, seconds=0.25, freq=1900.0)
        rows = [
            (0, "audio", "audio/wav", bytearray(wav), "{}"),
            (1, "audio", "audio/wav", bytearray(b"not audio at all"), "{}"),
            (2, "image", "image/ppm", bytearray(M.ppm_payload(4, 4)), "{}"),
        ]
        media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
        out = M.extract_spectrogram_features(media).collect()
        assert [r["media_id"] for r in out] == [0]  # stub + image dropped
        r = out[0]
        rate, samples = M.decode_audio(wav)
        assert r["sample_rate"] == 8000
        local = M.mel_band_energies(samples, rate)
        assert np.allclose(r["mel_energies"], local, atol=1e-4)  # float32 storage
        assert r["dominant_band"] == int(np.argmax(local))
        assert r["n_frames"] == M.stft_power(samples).shape[0]

    def test_audio_fixture_sweep_recovers_frequencies(self, spark):
        # end-to-end: the q136 fixture's 8 frequencies must land in 8
        # distinct dominant bands in increasing order
        feats = M.extract_spectrogram_features(M.audio_fixture(spark, n=16))
        rows = {r["media_id"]: r["dominant_band"] for r in feats.collect()}
        bands = [rows[i] for i in range(8)]
        assert all(a <= b for a, b in zip(bands, bands[1:]))
        assert len(set(bands)) >= 6  # distinct except possible edge merges
        assert bands == [rows[i + 8] for i in range(8)]  # deterministic


class TestAVI:
    def test_roundtrip_bit_exact(self):
        from kafka_connect_logminer2_spark.functions.multimodal import (
            avi_payload,
            parse_avi,
            ppm_payload,
        )

        frames = [ppm_payload(16, 12, seed=j) for j in range(5)]
        parsed = parse_avi(avi_payload(frames, fps=10, w=16, h=12))
        assert parsed["fps"] == 10 and parsed["n_frames"] == 5
        assert [bytes(f) for f in parsed["frames"]] == frames

    def test_rejects_non_avi(self):
        from kafka_connect_logminer2_spark.functions.multimodal import parse_avi

        assert parse_avi(b"garbage") is None
        assert parse_avi(b"RIFF\x04\x00\x00\x00WAVE") is None  # a WAV, not AVI
        assert parse_avi(b"") is None

    def test_odd_sized_frames_padded(self):
        # RIFF pads odd chunk sizes; the payload must come back WITHOUT pad
        from kafka_connect_logminer2_spark.functions.multimodal import (
            avi_payload,
            parse_avi,
        )

        frames = [b"abc", b"defgh", b"i"]
        parsed = parse_avi(avi_payload(frames, fps=4))
        assert [bytes(f) for f in parsed["frames"]] == frames

    def test_spark_frame_extraction(self, spark):
        from kafka_connect_logminer2_spark.functions.multimodal import (
            ahash64,
            decode_image,
            extract_video_frames,
            ppm_payload,
            video_fixture,
        )

        clips = video_fixture(spark, n=4, frames_per_clip=6, fps=5)
        out = extract_video_frames(clips, every_n_frames=2).collect()
        # stride: frames 0,2,4 of each of 4 clips
        assert sorted(set(r["frame_idx"] for r in out)) == [0, 2, 4]
        assert len(out) == 12
        # timestamps follow the container's fps
        assert all(r["frame_ts_s"] == r["frame_idx"] / 5 for r in out)
        # hash equals a direct decode of the same synthetic frame
        r0 = next(r for r in out if r["media_id"] == 1 and r["frame_idx"] == 2)
        direct = ahash64(decode_image(ppm_payload(20, 12, seed=102)))
        assert r0["frame_ahash"] == direct and r0["width"] == 20

    def test_corrupt_payload_skipped(self, spark):
        from pyspark.sql import Row

        from kafka_connect_logminer2_spark.functions.multimodal import (
            MEDIA_SCHEMA,
            extract_video_frames,
            video_fixture,
        )

        good = video_fixture(spark, n=2, frames_per_clip=4, fps=5)
        bad = spark.createDataFrame(
            [{"media_id": 99, "kind": "video", "mime": "video/avi",
              "payload": b"not an avi at all", "meta_json": "{}"}],
            schema=MEDIA_SCHEMA,
        )
        out = extract_video_frames(good.unionByName(bad)).collect()
        assert all(r["media_id"] != 99 for r in out) and len(out) == 4
