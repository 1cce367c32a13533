"""Multimodal column operators (SURVEY §2C): image/audio/video as opaque
``binary`` columns with typed metadata.

REAL KERNELS (r4): decode/resize/feature-extract are no longer all stubs —
the module carries working pure-numpy codecs for the formats it can parse
without external libraries (PPM/P6 and uncompressed 24-bit BMP images;
RIFF/PCM-16 WAV audio), plus Pillow for PNG/JPEG when importable. Each
operator sniffs payload magic bytes: decodable payloads run the REAL
kernel (bilinear resize, average-hash, channel statistics, RMS /
zero-crossing audio features); anything else falls back to the
deterministic sha256 stub — which keeps the q34 oracle (text payloads,
stub path by construction) bit-identical while real media exercises real
math (tests/test_multimodal_kernels.py).

Scale notes: media rows are huge and skewed — the iterator-of-batches
``mapInPandas`` shape lets Arrow stream records without materializing a whole
partition; ``repartition`` by size-bucket before decode keeps task runtimes
even; metadata-only transforms never touch the payload column (column
pruning drops the bytes at the scan).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_json", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("phash", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


# ---------------------------------------------------------------------------
# REAL kernels — pure numpy codecs + feature math (no external libs needed)
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> "np.ndarray | None":
    """Real image decode → H×W×3 uint8 array, or None when the payload is
    not a format this container can parse. Pure-numpy parsers for PPM (P6,
    binary 8-bit) and uncompressed 24/32-bit BMP; PNG/JPEG delegate to
    Pillow when importable (not in this container — gated, never assumed)."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:3] == b"\xff\xd8\xff":
        try:
            import io

            from PIL import Image  # optional: absent in this container
        except ImportError:
            return None
        try:
            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        except Exception:
            return None
    return None


def _decode_ppm(payload: bytes) -> "np.ndarray | None":
    """PPM P6: ASCII header (magic, width, height, maxval; #-comments) then
    raw big-endian RGB bytes."""
    try:
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255 or w <= 0 or h <= 0:
            return None
        raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return raw.reshape(h, w, 3).copy()
    except (ValueError, IndexError):
        return None


def _decode_bmp(payload: bytes) -> "np.ndarray | None":
    """Uncompressed bottom-up 24/32-bit BMP (BITMAPINFOHEADER): rows are
    4-byte aligned, stored bottom-to-top, channels BGR(A)."""
    try:
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if planes != 1 or bpp not in (24, 32) or compression != 0 or w <= 0:
            return None
        flip, h = h > 0, abs(h)
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
        rgb = raw[..., 2::-1]  # BGR(A) → RGB
        return (rgb[::-1] if flip else rgb).copy()
    except (ValueError, IndexError, struct.error):
        return None


def encode_ppm(arr: "np.ndarray") -> bytes:
    """H×W×3 uint8 → PPM P6 bytes (the re-encode side of the real resize)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_bilinear(arr: "np.ndarray", max_side: int) -> "np.ndarray":
    """Vectorized numpy bilinear resample to fit ``max_side`` (aspect
    preserved; identity when already small enough). Pixel-center sampling
    (half-pixel offsets), edges clamped — the standard convention."""
    h, w = arr.shape[:2]
    scale = min(1.0, max_side / max(w, h))
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    if (nh, nw) == (h, w):
        return arr.copy()
    ys = (np.arange(nh) + 0.5) * (h / nh) - 0.5
    xs = (np.arange(nw) + 0.5) * (w / nw) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = arr.astype(np.float64)
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    return np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)


def ahash64(arr: "np.ndarray") -> str:
    """Real perceptual average-hash: luminance → 8×8 block means →
    threshold at the mean → 64-bit hex string (row-major, MSB first).
    Stable under re-encode and small noise — what the sha256 stub (any
    one-bit change flips everything) fundamentally cannot be."""
    lum = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = lum.shape
    if h < 8 or w < 8:
        # too small for 8 contiguous bands (linspace repeats edges → empty
        # slices → NaN means → every tiny image hashed identically):
        # sample the 8×8 grid by nearest pixel instead
        ys = np.linspace(0, h - 1, 8).round().astype(int)
        xs = np.linspace(0, w - 1, 8).round().astype(int)
        g = lum[np.ix_(ys, xs)]
    else:
        # 8×8 block means (aspect intentionally ignored — ahash
        # convention): split rows/cols into 8 contiguous bands, average
        yb = np.linspace(0, h, 9).round().astype(int)
        xb = np.linspace(0, w, 9).round().astype(int)
        g = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                g[i, j] = lum[yb[i] : yb[i + 1], xb[j] : xb[j + 1]].mean()
    bits = (g > g.mean()).ravel()
    return "%016x" % int("".join("1" if b else "0" for b in bits), 2)


def image_stats_features(arr: "np.ndarray", dim: int = 8) -> list[float]:
    """Real 8-dim image descriptor: per-channel mean and std (RGB, scaled
    to [0,1]) + luminance mean and std — the classic cheap color-statistics
    embedding; deterministic, resolution-independent."""
    a = arr.astype(np.float64) / 255.0
    lum = a @ np.array([0.299, 0.587, 0.114])
    feats = [
        a[..., 0].mean(), a[..., 1].mean(), a[..., 2].mean(),
        a[..., 0].std(), a[..., 1].std(), a[..., 2].std(),
        lum.mean(), lum.std(),
    ]
    return [round(float(v), 6) for v in feats[:dim]]


def decode_audio(payload: bytes) -> "tuple[int, np.ndarray] | None":
    """Real audio decode: RIFF/WAVE PCM-16 parser → (sample_rate, mono
    float64 samples in [-1, 1]). Multi-channel input is averaged to mono.
    None for anything that is not an uncompressed PCM-16 WAV."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos, rate, nch, bps, frames = 12, None, None, None, None
        while pos + 8 <= len(payload):
            cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            if cid == b"fmt ":
                fmt, nch, rate = struct.unpack_from("<HHI", payload, body)
                bps = struct.unpack_from("<H", payload, body + 14)[0]
                if fmt != 1 or bps != 16 or nch < 1:
                    return None
            elif cid == b"data":
                if rate is None:
                    return None
                n = size // (2 * nch)
                raw = np.frombuffer(payload, dtype="<i2", count=n * nch, offset=body)
                mono = raw.reshape(n, nch).astype(np.float64).mean(axis=1) / 32768.0
                return int(rate), mono
            pos = body + size + (size & 1)  # chunks are 2-byte aligned
        return None
    except (ValueError, IndexError, struct.error):
        return None


def audio_features(samples: "np.ndarray", rate: int, dim: int = 8) -> list[float]:
    """Real 8-dim audio descriptor over PCM samples: RMS, zero-crossing
    rate (per second / nyquist-normalized), mean |x|, peak, 4-band energy
    split (quarters of the clip) — all vectorized numpy."""
    if not len(samples):
        return [0.0] * dim
    rms = float(np.sqrt(np.mean(samples**2)))
    zc = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    quarters = np.array_split(samples, 4)
    feats = [
        rms,
        zc,  # crossings per sample ∈ [0, 1]
        float(np.mean(np.abs(samples))),
        float(np.max(np.abs(samples))),
        *[float(np.sqrt(np.mean(q**2))) if len(q) else 0.0 for q in quarters],
    ]
    return [round(v, 6) for v in feats[:dim]]


# ---------------------------------------------------------------------------
# Deterministic STUB kernels — the fallback for undecodable payloads and the
# path the q34 oracle reproduces in pure SQL
# ---------------------------------------------------------------------------


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake decode. Real implementation:
    ``PIL.Image.open(io.BytesIO(payload)).size`` (Pillow not in container).
    The fake derives a stable (width, height) from the payload hash so tests
    are reproducible."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _feature_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB — deterministic fake embedding (sha256-derived). Real
    implementation: a vision encoder over the decoded tensor."""
    h = hashlib.sha256(payload).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_image_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas decode + feature extraction for image rows.

    Kernel dispatch per payload: decodable formats (PPM/BMP; PNG/JPEG via
    optional Pillow) run the REAL kernels — decoded dimensions, perceptual
    average-hash, channel-statistics embedding; everything else falls back
    to the deterministic sha256 stub (the q34 oracle's path). The UDF
    signature, Arrow batch shape, and output schema are identical either
    way.
    """

    def one(p: bytes) -> tuple[int, int, str, list[float]]:
        img = decode_image(p)
        if img is not None:
            return (
                img.shape[1],
                img.shape[0],
                ahash64(img),
                image_stats_features(img),
            )
        w, h = _decode_image_stub(p)
        return w, h, hashlib.sha256(p).hexdigest()[:16], _feature_stub(p)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # column-wise assembly: only the decode/encode KERNELS are per-row
        # (inherent — they consume one blob each); everything else is Series
        # ops. iterrows cost ~10x on wide batches (BASELINE.md).
        for pdf in batches:
            payload = pdf["payload"].map(lambda p: b"" if p is None else bytes(p))
            decoded = payload.map(one)  # per-row kernel call
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": decoded.map(lambda d: d[0]).astype("int32"),
                    "height": decoded.map(lambda d: d[1]).astype("int32"),
                    "n_bytes": payload.map(len).astype("int64"),
                    "phash": decoded.map(lambda d: d[2]),
                    "features": decoded.map(lambda d: d[3]),
                }
            )

    images = media.filter(F.col("kind") == "image")
    return images.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", FloatType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _resize_stub(payload: bytes, max_side: int) -> tuple[int, int, bytes]:
    """STUB — deterministic fake resize. Real implementation:
    ``PIL.Image.open(...).thumbnail((max_side, max_side))`` + re-encode.
    The fake scales the stub-decoded dims to fit ``max_side`` (aspect
    preserved) and derives a stable fake payload from the original hash, so
    the contract — output dims ≤ max_side, payload replaced — is testable."""
    w, h = _decode_image_stub(payload)
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    fake = hashlib.sha256(payload + b"|resized").digest() * (1 + nw * nh // 32)
    return nw, nh, fake[: nw * nh // 16 + 16]


def resize_images(media: DataFrame, max_side: int = 128) -> DataFrame:
    """mapInPandas image resize: payload in, (smaller) payload out. Unlike
    the metadata-only ops this both reads AND writes the binary column, so
    batches stream through Arrow without materializing a partition.

    Decodable payloads run the REAL kernel — numpy bilinear resample,
    re-encoded as PPM (the format this container can write losslessly);
    undecodable ones keep the deterministic stub contract."""

    def one(p: bytes) -> tuple[int, int, bytes]:
        img = decode_image(p)
        if img is not None:
            small = resize_bilinear(img, max_side)
            return small.shape[1], small.shape[0], encode_ppm(small)
        return _resize_stub(p, max_side)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"].map(lambda p: b"" if p is None else bytes(p))
            resized = payload.map(one)  # per-row kernel call
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": resized.map(lambda r: r[0]).astype("int32"),
                    "height": resized.map(lambda r: r[1]).astype("int32"),
                    "payload": resized.map(lambda r: r[2]),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


def _decode_audio_stub(payload: bytes) -> tuple[int, float]:
    """STUB — deterministic fake audio decode. Real implementation:
    ``soundfile.read(io.BytesIO(payload))`` → (sample_rate, n_samples/rate).
    Fake derives a stable (rate, duration) from the payload hash."""
    h = hashlib.sha256(payload).digest()
    rate = (8000, 16000, 22050, 44100)[h[2] % 4]
    return rate, round(0.5 + h[3] / 16.0, 3)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode + feature extraction for audio rows — same
    dispatch contract as extract_image_features: RIFF/PCM-16 WAV payloads
    run the REAL kernel (header-parsed sample rate, exact duration, RMS /
    zero-crossing / band-energy features over the PCM samples); anything
    else keeps the deterministic stub."""

    def one(p: bytes) -> tuple[int, float, list[float]]:
        wav = decode_audio(p)
        if wav is not None:
            rate, samples = wav
            return rate, round(len(samples) / rate, 3), audio_features(samples, rate)
        rate, dur = _decode_audio_stub(p)
        return rate, dur, _feature_stub(p)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"].map(lambda p: b"" if p is None else bytes(p))
            decoded = payload.map(one)  # per-row kernel call
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "sample_rate": decoded.map(lambda d: d[0]).astype("int32"),
                    "duration_s": decoded.map(lambda d: d[1]).astype("float32"),
                    "n_bytes": payload.map(len).astype("int64"),
                    "features": decoded.map(lambda d: d[2]),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


SPECTROGRAM_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("dominant_band", IntegerType()),
        StructField("mel_energies", ArrayType(FloatType())),
    ]
)


def stft_power(
    samples: "np.ndarray", n_fft: int = 256, hop: int = 128
) -> "np.ndarray":
    """Power spectrogram via short-time FFT — pure numpy (np.fft.rfft),
    Hann window, stride-tricks framing (no copy): (n_frames, n_fft//2+1)
    array of |X|². Clips shorter than one frame get a single zero-padded
    frame so every clip yields at least one row."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    frames = np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, n_fft),
        strides=(x.strides[0] * hop, x.strides[0]),
        writeable=False,
    )
    win = np.hanning(n_fft)
    spec = np.fft.rfft(frames * win, axis=1)
    return (spec.real**2 + spec.imag**2).astype(np.float64)


def mel_filterbank(n_mels: int, n_fft: int, rate: int) -> "np.ndarray":
    """Triangular mel filterbank (HTK convention: mel = 2595·log10(1+f/700))
    mapping n_fft//2+1 linear bins → n_mels bands; rows sum-normalized so
    band energies are comparable across n_fft choices."""
    n_bins = n_fft // 2 + 1
    mel_max = 2595.0 * np.log10(1.0 + (rate / 2.0) / 700.0)
    mel_pts = np.linspace(0.0, mel_max, n_mels + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    bin_pts = np.floor((n_fft + 1) * hz_pts / rate).astype(int).clip(0, n_bins - 1)
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, ctr, hi = bin_pts[m], bin_pts[m + 1], bin_pts[m + 2]
        for b in range(lo, ctr):
            if ctr > lo:
                fb[m, b] = (b - lo) / (ctr - lo)
        for b in range(ctr, hi):
            if hi > ctr:
                fb[m, b] = (hi - b) / (hi - ctr)
        if hi == lo:  # degenerate narrow band at low rates
            fb[m, lo] = 1.0
    norm = fb.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return fb / norm


def mel_band_energies(
    samples: "np.ndarray",
    rate: int,
    n_mels: int = 8,
    n_fft: int = 256,
    hop: int = 128,
) -> list[float]:
    """Per-clip log-mel descriptor: STFT power → mel filterbank → mean
    over frames → log10(1+e). The n_mels-dim analog of audio_features
    with actual frequency content (a 440 Hz tone and a 4 kHz tone get
    identical RMS but different mel vectors)."""
    p = stft_power(samples, n_fft, hop)
    fb = mel_filterbank(n_mels, n_fft, rate)
    e = (p @ fb.T).mean(axis=0)
    return [round(float(v), 6) for v in np.log10(1.0 + e)]


def extract_spectrogram_features(
    media: DataFrame, n_mels: int = 8, n_fft: int = 256, hop: int = 128
) -> DataFrame:
    """mapInPandas STFT/log-mel extraction for audio rows — the signal-
    level upgrade of extract_audio_features (which reports time-domain
    stats only). Real kernel for RIFF/PCM-16 WAV payloads; non-decodable
    payloads are DROPPED here (a frequency descriptor of a sha stub is
    noise, not a feature — the stub path lives in extract_audio_features
    where the oracle needs it). Iterator-of-batches shape: one numpy FFT
    pass per clip, Arrow both ways, nothing driver-sized."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "sample_rate", "n_frames", "dominant_band",
                    "mel_energies")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                wav = decode_audio(b"" if p is None else bytes(p))
                if wav is None:
                    continue
                rate, samples = wav
                spec = stft_power(samples, n_fft, hop)
                mel = mel_band_energies(samples, rate, n_mels, n_fft, hop)
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["n_frames"].append(spec.shape[0])
                out["dominant_band"].append(int(np.argmax(mel)))
                out["mel_energies"].append(mel)
            if not out["media_id"]:
                continue  # all rows undecodable: an empty object-dtype
                # frame breaks Arrow's list<float> conversion — yield nothing
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "dominant_band": pd.Series(out["dominant_band"], dtype="int32"),
                    "mel_energies": out["mel_energies"],
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=SPECTROGRAM_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into (media_id,
    frame_ts) rows from metadata only — the payload column is pruned out of
    the scan entirely (check .explain: ReadSchema excludes ``payload``).
    The per-frame decode would be a second mapInPandas over a payload join."""
    dur = F.get_json_object(F.col("meta_json"), "$.duration_s").cast("double")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.floor(dur / every_n_seconds).cast("int"), F.lit(0)),
                )
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_s", F.col("frame_idx") * every_n_seconds)
    )


def ppm_payload(w: int, h: int, seed: int = 0) -> bytes:
    """Deterministic synthetic PPM image: a horizontal gradient in R, a
    vertical gradient in G, seed-constant B — real decodable pixels with
    known statistics for the kernel tests."""
    x = np.linspace(0, 255, w).astype(np.uint8)
    y = np.linspace(0, 255, h).astype(np.uint8)
    arr = np.empty((h, w, 3), dtype=np.uint8)
    arr[..., 0] = x[None, :]
    arr[..., 1] = y[:, None]
    arr[..., 2] = seed % 256
    return encode_ppm(arr)


def bmp_payload(arr: "np.ndarray") -> bytes:
    """H×W×3 uint8 → minimal uncompressed bottom-up 24-bit BMP bytes."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def wav_payload(
    rate: int = 16000, seconds: float = 0.5, freq: float = 440.0, amp: float = 0.5
) -> bytes:
    """Deterministic synthetic WAV: mono PCM-16 sine wave — known RMS
    (amp/√2) and zero-crossing rate (2·freq/rate) for the kernel tests."""
    n = int(rate * seconds)
    t = np.arange(n) / rate
    samples = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def audio_fixture(spark, n: int = 48) -> DataFrame:
    """Deterministic synthetic AUDIO media table: real PCM-16 WAV sine
    payloads sweeping 8 frequencies (400..3900 Hz at 8 kHz), so
    spectrogram features have known ground truth (clip i's dominant
    energy sits at freq 400+500·(i%8))."""
    rows = []
    for i in range(n):
        freq = 400.0 + 500.0 * (i % 8)
        rows.append(
            {
                "media_id": i,
                "kind": "audio",
                "mime": "audio/wav",
                "payload": wav_payload(rate=8000, seconds=0.25, freq=freq),
                "meta_json": '{"freq_hz": %d}' % int(freq),
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def media_fixture(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (no external files)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = (f"media-{i}".encode() * 7)[: 50 + i]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": payload,
                "meta_json": '{"duration_s": %d}' % (i * 5 % 60),
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# video: AVI container (RIFF) — real parse/build kernels
# ---------------------------------------------------------------------------
# The container level is where a Spark pipeline actually operates on video:
# split a clip into frame payloads, sample every Nth, hand each frame to the
# image kernels. AVI is RIFF (same chunk grammar as the WAV parser above);
# the frames here are stored uncompressed ('00db') carrying PPM images, so
# the WHOLE video path — container walk, frame extraction, frame decode,
# perceptual hash — runs on real bytes with no codec dependency. A real
# H.264 'mp4' would swap decode_image for a codec call behind the same
# mapInPandas shape.


def avi_payload(
    frames: list[bytes],
    fps: int = 10,
    w: int = 0,
    h: int = 0,
    audio: "np.ndarray | None" = None,
    audio_rate: int = 8000,
) -> bytes:
    """Minimal spec-valid uncompressed-stream AVI: RIFF('AVI ') with an
    hdrl (avih + one 'vids' strl) and a movi list of '00db' frame chunks.
    Deterministic bytes for fixtures; also the writer half of the
    roundtrip test pinning :func:`parse_avi`.

    ``audio`` (float samples in [-1, 1]) adds a second 'auds' stream —
    PCM-16 mono WAVEFORMATEX strf + one '01wb' movi chunk, the same
    sample encoding as :func:`wav_from_samples` so fingerprints of the
    embedded track match fingerprints of the standalone WAV bit-exactly
    (what makes the cross-modal audio↔video oracle pinnable)."""
    import struct

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    usec = 1_000_000 // fps
    n_streams = 2 if audio is not None else 1
    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, len(frames), 0, n_streams, 0, w, h, 0, 0, 0, 0
    )
    strh = b"vids" + b"\x00" * 4 + struct.pack(
        "<10I", 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0
    ) + struct.pack("<4H", 0, 0, w, h)
    strf = struct.pack("<3I2H6I", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0)
    strls = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    movi_chunks = b"".join(chunk(b"00db", f) for f in frames)
    if audio is not None:
        pcm = (np.clip(audio, -1.0, 1.0) * 32767).astype("<i2").tobytes()
        astrh = b"auds" + b"\x00" * 4 + struct.pack(
            "<10I", 0, 0, 0, 1, audio_rate, 0, len(pcm) // 2, 0, 0xFFFFFFFF, 0
        ) + struct.pack("<4H", 0, 0, 0, 0)
        astrf = struct.pack("<HHIIHH", 1, 1, audio_rate, audio_rate * 2, 2, 16)
        strls += lst(b"strl", chunk(b"strh", astrh) + chunk(b"strf", astrf))
        movi_chunks += chunk(b"01wb", pcm)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strls)
    movi = lst(b"movi", movi_chunks)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> "dict | None":
    """Walk the RIFF chunk tree of an AVI payload → {"fps", "n_frames",
    "frames": [bytes, ...], "audio_rate": int|None, "audio": bytes|None}.
    Tolerant of unknown chunks (skipped by the size header, the RIFF
    contract); None on anything that is not an AVI-flavored RIFF. Reads
    '00db' (uncompressed) and '00dc' (compressed) stream-0 chunks in movi
    order; '01wb' chunks concatenate to the PCM-16 audio track, with the
    rate from the 'auds' stream's WAVEFORMATEX strf (associated to the
    most recent strh, the strl contract)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    fps, total, audio_rate = None, None, None
    last_strh = None
    frames: list[bytes] = []
    audio_chunks: list[bytes] = []

    def walk(buf: bytes, off: int, end: int) -> None:
        nonlocal fps, total, audio_rate, last_strh
        while off + 8 <= end:
            fourcc = buf[off : off + 4]
            (size,) = struct.unpack("<I", buf[off + 4 : off + 8])
            data_start = off + 8
            data_end = min(data_start + size, end)
            if fourcc == b"LIST":
                walk(buf, data_start + 4, data_end)
            elif fourcc == b"avih" and size >= 56:
                vals = struct.unpack("<14I", buf[data_start : data_start + 56])
                fps = round(1_000_000 / vals[0]) if vals[0] else None
                total = vals[4]
            elif fourcc == b"strh" and size >= 4:
                last_strh = bytes(buf[data_start : data_start + 4])
            elif fourcc == b"strf" and last_strh == b"auds" and size >= 16:
                fmt, nch, rate = struct.unpack(
                    "<HHI", buf[data_start : data_start + 8]
                )
                if fmt == 1 and nch == 1:
                    audio_rate = rate
            elif fourcc in (b"00db", b"00dc"):
                frames.append(bytes(buf[data_start:data_end]))
            elif fourcc == b"01wb":
                audio_chunks.append(bytes(buf[data_start:data_end]))
            off = data_start + size + (size % 2)

    try:
        walk(payload, 12, len(payload))
    except struct.error:
        return None
    if fps is None:
        return None
    audio = b"".join(audio_chunks) if audio_chunks else None
    return {
        "fps": fps,
        "n_frames": total if total is not None else len(frames),
        "frames": frames,
        "audio_rate": audio_rate,
        "audio": audio,
    }


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_s", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frame_ahash", StringType()),
    ]
)


def extract_video_frames(media: DataFrame, every_n_frames: int = 2) -> DataFrame:
    """The real video path: parse the AVI container, keep every Nth frame,
    decode each kept frame with the image kernels, emit per-frame
    dimensions + perceptual average-hash. Unparseable payloads and
    undecodable frames are skipped (quarantine-upstream contract, same as
    the spectrogram op). Iterator-of-batches mapInPandas: one container
    parse per row, frames never materialize as a Spark-side explosion
    before sampling — at 100 TB of video the (container → sampled frames)
    fan-out happens inside the Arrow batch, payload column pruned for
    every non-video row by the filter."""

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "frame_ts_s",
                                   "width", "height", "frame_ahash")}
            for mid, payload in zip(b["media_id"], b["payload"]):
                parsed = parse_avi(bytes(payload)) if payload is not None else None
                if not parsed or not parsed["fps"]:
                    continue
                for idx in range(0, len(parsed["frames"]), every_n_frames):
                    arr = decode_image(parsed["frames"][idx])
                    if arr is None:
                        continue
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_ts_s"].append(idx / parsed["fps"])
                    out["height"].append(arr.shape[0])
                    out["width"].append(arr.shape[1])
                    out["frame_ahash"].append(ahash64(arr))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_ts_s": pd.Series(out["frame_ts_s"], dtype="float64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "frame_ahash": pd.Series(out["frame_ahash"], dtype="object"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=VIDEO_FRAME_SCHEMA
    )


def video_fixture(spark, n: int = 16, frames_per_clip: int = 6, fps: int = 5) -> DataFrame:
    """Deterministic synthetic AVI clips whose frames are PPM gradients
    (ppm_payload) — real container bytes, real decodable frames."""
    rows = []
    for i in range(n):
        frames = [
            ppm_payload(16 + (i % 4) * 4, 12, seed=i * 100 + j)
            for j in range(frames_per_clip)
        ]
        rows.append(
            {
                "media_id": i,
                "kind": "video",
                "mime": "video/avi",
                "payload": avi_payload(frames, fps=fps, w=16 + (i % 4) * 4, h=12),
                "meta_json": '{"fps": %d}' % fps,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def reencode_avi(
    payload: bytes, noise: int = 2, seed: int = 0, fps: int | None = None
) -> bytes:
    """Deterministic 're-encode' of an AVI clip: decode every frame, add
    bounded uniform pixel noise (the generation loss a real transcode
    introduces), optionally restamp the frame rate, rebuild the
    container. The planted-duplicate half of the video near-dup fixture:
    byte-level equality is destroyed (a new container, new pixel bytes),
    perceptual content is not — exactly what :func:`video_neardup_pairs`
    must still catch."""
    parsed = parse_avi(payload)
    if parsed is None:
        raise ValueError("not an AVI payload")
    rng = np.random.default_rng(seed)
    out_frames = []
    w = h = 0
    for f in parsed["frames"]:
        arr = decode_image(f)
        if arr is None:
            continue
        jitter = rng.integers(-noise, noise + 1, size=arr.shape)
        noisy = np.clip(arr.astype(np.int16) + jitter, 0, 255).astype(np.uint8)
        h, w = noisy.shape[:2]
        out_frames.append(encode_ppm(noisy))
    return avi_payload(out_frames, fps=fps or parsed["fps"] or 10, w=w, h=h)


VIDEO_SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("scene_idx", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_s", DoubleType()),
        StructField("frame_ahash", StringType()),
    ]
)


def extract_scene_frames(media: DataFrame, min_change_bits: int = 12) -> DataFrame:
    """Scene-cut-aware frame sampling: keep a clip's first frame and
    every frame whose perceptual hash moves ≥ ``min_change_bits`` (of 64)
    from the LAST KEPT frame — one representative per visual scene,
    however the clip is paced. Content-adaptive where
    :func:`extract_video_frames`'s every-Nth stride is not: a re-encoded
    or re-timed copy (different fps, dropped frames) keeps the same scene
    SEQUENCE, so downstream alignment joins on ``scene_idx`` rather than
    raw frame numbers. Same iterator mapInPandas shape as the stride
    sampler — the container→frames fan-out stays inside the Arrow batch."""

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            out = {k: [] for k in ("media_id", "scene_idx", "frame_idx",
                                   "frame_ts_s", "frame_ahash")}
            for mid, payload in zip(b["media_id"], b["payload"]):
                parsed = parse_avi(bytes(payload)) if payload is not None else None
                if not parsed or not parsed["fps"]:
                    continue
                last_bits, scene = None, 0
                for idx, fr in enumerate(parsed["frames"]):
                    arr = decode_image(fr)
                    if arr is None:
                        continue
                    hx = ahash64(arr)
                    bits = int(hx, 16)
                    if last_bits is not None:
                        if bin(bits ^ last_bits).count("1") < min_change_bits:
                            continue  # same scene as the kept representative
                    out["media_id"].append(mid)
                    out["scene_idx"].append(scene)
                    out["frame_idx"].append(idx)
                    out["frame_ts_s"].append(idx / parsed["fps"])
                    out["frame_ahash"].append(hx)
                    last_bits, scene = bits, scene + 1
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "scene_idx": pd.Series(out["scene_idx"], dtype="int32"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_ts_s": pd.Series(out["frame_ts_s"], dtype="float64"),
                    "frame_ahash": pd.Series(out["frame_ahash"], dtype="object"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=VIDEO_SCENE_SCHEMA
    )


def scene_signatures(media: DataFrame, min_change_bits: int = 12) -> DataFrame:
    """Compact per-scene signature frame ``(media_id, scene_idx, _hi,
    _lo)``: the 64-bit perceptual ahash of each scene representative as
    two 32-bit halves (longs), the shape every downstream stage — band
    keys, popcount hamming — consumes JVM-side. ~9 bytes of signature per
    scene; 100 TB of video reduce to per-mille-scale signature relations
    after this one decode pass."""
    return extract_scene_frames(media, min_change_bits=min_change_bits).select(
        "media_id",
        "scene_idx",
        F.conv(F.substring("frame_ahash", 1, 8), 16, 10).cast("long").alias("_hi"),
        F.conv(F.substring("frame_ahash", 9, 8), 16, 10).cast("long").alias("_lo"),
    )


def scene_band_rows(sigs: DataFrame) -> DataFrame:
    """Each scene signature → 4×16-bit band rows ``(media_id, scene_idx,
    band, val)`` — the LSH candidate keys (two hamming-close hashes agree
    exactly on ≥1 band whenever their ≤tau differing bits don't cover all
    four bands of every scene)."""
    return sigs.select(
        "media_id",
        "scene_idx",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), F.shiftright("_hi", 16).alias("val")),
                F.struct(
                    F.lit(1).alias("band"),
                    F.col("_hi").bitwiseAND(F.lit(65535)).alias("val"),
                ),
                F.struct(F.lit(2).alias("band"), F.shiftright("_lo", 16).alias("val")),
                F.struct(
                    F.lit(3).alias("band"),
                    F.col("_lo").bitwiseAND(F.lit(65535)).alias("val"),
                ),
            )
        ).alias("bv"),
    ).select("media_id", "scene_idx", "bv.band", "bv.val")


def scene_pair_verify(
    cand: DataFrame,
    sa: DataFrame,
    sb: DataFrame,
    tau: int = 10,
    min_scene_sim: float = 0.6,
) -> DataFrame:
    """Verify candidate clip pairs ``(id1, id2)`` against their scene
    signatures: scenes align by ordinal, a scene matches iff the popcount
    hamming of the two hashes ≤ ``tau`` (bit_count over bitwiseXOR on the
    32-bit halves — no Python), the pair passes iff matched scenes cover
    ``min_scene_sim`` of the LONGER clip. ``sa``/``sb`` are
    scene_signatures frames for the id1 and id2 sides (the same frame for
    within-set dedup, batch-vs-history for the ingest store)."""
    av = sa.select(
        F.col("media_id").alias("id1"), "scene_idx",
        F.col("_hi").alias("_h1"), F.col("_lo").alias("_l1"),
    )
    bv = sb.select(
        F.col("media_id").alias("id2"), "scene_idx",
        F.col("_hi").alias("_h2"), F.col("_lo").alias("_l2"),
    )
    ham = F.bit_count(F.col("_h1").bitwiseXOR(F.col("_h2"))) + F.bit_count(
        F.col("_l1").bitwiseXOR(F.col("_l2"))
    )
    matched = (
        cand.join(av, "id1")
        .join(bv, ["id2", "scene_idx"])
        .filter(ham <= F.lit(tau))
        .groupBy("id1", "id2")
        .agg(F.count_distinct("scene_idx").alias("n_match"))
    )
    ca = sa.groupBy("media_id").agg(F.count(F.lit(1)).alias("_n1"))
    cb = sb.groupBy("media_id").agg(F.count(F.lit(1)).alias("_n2"))
    return (
        matched.join(ca.select(F.col("media_id").alias("id1"), "_n1"), "id1")
        .join(cb.select(F.col("media_id").alias("id2"), "_n2"), "id2")
        .withColumn(
            "scene_sim",
            F.round(F.col("n_match") / F.greatest("_n1", "_n2"), 4),
        )
        .filter(F.col("scene_sim") >= min_scene_sim)
        .select("id1", "id2", "n_match", "scene_sim")
    )


def video_neardup_pairs(
    media: DataFrame,
    tau: int = 10,
    min_scene_sim: float = 0.6,
    max_band_freq: int = 64,
    min_change_bits: int = 12,
) -> DataFrame:
    """Frame-level video near-dup: re-encoded / re-timed duplicate clips
    end-to-end — the family member q150 was missing (a transcoded copy
    sailed through byte-exact dedup AND text dedup; r5/r6 verdict item).

    Plan (every stage a bounded equi-join — the text-dedup banding
    discipline applied to perceptual hashes):

    1. scene signatures: :func:`extract_scene_frames` → one 64-bit ahash
       per scene, aligned by scene ORDINAL (robust to fps changes);
    2. candidates: each scene hash splits into 4×16-bit bands; clips
       collide iff some (band_idx, band_value, scene_idx) key matches —
       a hamming-≤-tau pair disagrees in ≤ tau bits, so by pigeonhole at
       least one band of some scene is IDENTICAL whenever tau < 4·16/…
       spread across bands (recall comes from many scenes × 4 bands);
       keys hotter than ``max_band_freq`` postings are DROPPED (the q154
       cap rule: boilerplate scenes — station idents, black frames —
       would otherwise quadratically expand; C(cap,2) bounds every key);
    3. verify: candidate pairs join their scene signatures ON scene_idx,
       JVM-side popcount hamming (two 32-bit halves, bit_count over
       bitwiseXOR — no Python in the verify path), matched iff ≤ tau;
       pair accepted when matched scenes ≥ ``min_scene_sim`` of the
       longer clip's scenes.

    Returns (id1, id2, n_match, scene_sim), id1 < id2. At 100 TB of
    video: signatures are ~9 bytes/scene — the pair stage runs on
    per-mille of the input bytes, partitioned by band key."""
    # eager: the decode subtree feeds several independent exchanges that
    # AQE materializes concurrently — computed lazily they serialize on
    # block locks / spawn python workers in a storm (profiled on cdc37)
    s = scene_signatures(media, min_change_bits=min_change_bits).localCheckpoint()
    return scene_neardup_pairs(
        s, tau=tau, min_scene_sim=min_scene_sim, max_band_freq=max_band_freq
    )


def scene_neardup_pairs(
    sigs: DataFrame,
    tau: int = 10,
    min_scene_sim: float = 0.6,
    max_band_freq: int = 64,
) -> DataFrame:
    """Stages 2–3 of :func:`video_neardup_pairs` over an ALREADY-DECODED
    scene-signature frame — factored out so composed pipelines that
    already hold signatures (media_pipeline's decode stage, the ingest
    stores) pay the decode pass once, not per consumer."""
    bands = scene_band_rows(sigs)
    keys = ["band", "val", "scene_idx"]
    cool = bands.join(
        bands.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_band_freq)
        .select(*keys),
        keys,
        "left_semi",
    )
    cand = (
        cool.alias("A")
        .join(cool.alias("B"), keys)
        .filter(F.col("A.media_id") < F.col("B.media_id"))
        .select(
            F.col("A.media_id").alias("id1"), F.col("B.media_id").alias("id2")
        )
        .distinct()
    )
    return scene_pair_verify(cand, sigs, sigs, tau=tau, min_scene_sim=min_scene_sim)


def pattern_frame(w: int, h: int, seed: int) -> bytes:
    """Deterministic CONTENT-DISTINCT frame: a seeded random 6×8 color
    block pattern upscaled to w×h. Unlike :func:`ppm_payload` (whose R/G
    gradients are identical across seeds — every frame ahashes the same),
    each seed gives a perceptually distinct frame: the fixture the video
    near-dup family needs (distinct scenes must NOT collide)."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(6, 8, 3))
    arr = np.kron(blocks, np.ones((h // 6, w // 8, 1))).astype(np.uint8)
    return encode_ppm(arr)


def video_scene_fixture(
    spark,
    n_clips: int = 12,
    scenes_per_clip: int = 4,
    frames_per_scene: int = 3,
    fps: int = 5,
    w: int = 32,
    h: int = 24,
) -> DataFrame:
    """Clips with real SCENE structure: each scene is a distinct seeded
    pattern held for ``frames_per_scene`` frames — scene-cut sampling
    must collapse the repeats to one representative per scene, and
    distinct clips share no scene content."""
    rows = []
    for i in range(n_clips):
        frames = []
        for s in range(scenes_per_clip):
            fr = pattern_frame(w, h, seed=i * 1000 + s * 10)
            frames.extend([fr] * frames_per_scene)
        rows.append(
            {
                "media_id": i,
                "kind": "video",
                "mime": "video/avi",
                "payload": avi_payload(frames, fps=fps, w=w, h=h),
                "meta_json": '{"scenes": %d}' % scenes_per_clip,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def extract_image_sigs(media: DataFrame) -> DataFrame:
    """Image rows → one 64-bit perceptual ahash each, in the shared
    scene-signature shape ``(media_id, scene_idx=0, _hi, _lo)`` — images
    are single-scene clips to every downstream stage (band keys, popcount
    verify, the incremental ingest store)."""
    return extract_image_features(media).select(
        "media_id",
        F.lit(0).alias("scene_idx"),
        F.conv(F.substring("phash", 1, 8), 16, 10).cast("long").alias("_hi"),
        F.conv(F.substring("phash", 9, 8), 16, 10).cast("long").alias("_lo"),
    )


def image_neardup_pairs(
    media: DataFrame, tau: int = 10, max_band_freq: int = 1024
) -> DataFrame:
    """Perceptual IMAGE near-dup: re-encoded / noise-degraded duplicate
    images (format changes included — the decode is format-blind) as
    ``(id1, id2, hamming)`` pairs, id1 < id2. The single-scene member of
    the video family: one 64-bit average-hash per image from
    :func:`extract_image_features`, the same 4×16-bit band candidate join
    (keys hotter than ``max_band_freq`` dropped — flat-color boilerplate
    images would otherwise expand quadratically), then one JVM popcount
    verify. Undecodable payloads carry the deterministic sha256-prefix
    stub hash, so byte-identical undecodable blobs still pair at
    hamming 0 while merely similar ones never do (exact-dup semantics —
    the honest fallback when pixels can't be read).

    RECALL CONTRACT (pigeonhole over 4 bands): a pair within hamming 3
    is found DETERMINISTICALLY (≤3 flipped bits cannot touch all four
    16-bit bands); pairs at hamming 4..tau are found unless the flips
    spread across every band — rare for real re-encodes, whose flips
    cluster in the blocks that changed, but not guaranteed. ahash flips
    ≤2 bits on ±8-noise re-encodes of structured images (test-pinned),
    so the deterministic regime is the operating one; callers needing a
    guarantee at larger radii should hash at higher resolution, not
    widen tau."""
    sigs = extract_image_sigs(media).localCheckpoint()  # eager: decode once
    bands = scene_band_rows(sigs)
    keys = ["band", "val", "scene_idx"]
    cool = bands.join(
        bands.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_band_freq)
        .select(*keys),
        keys,
        "left_semi",
    )
    cand = (
        cool.alias("A")
        .join(cool.alias("B"), keys)
        .filter(F.col("A.media_id") < F.col("B.media_id"))
        .select(F.col("A.media_id").alias("id1"), F.col("B.media_id").alias("id2"))
        .distinct()
    )
    a = sigs.select(F.col("media_id").alias("id1"),
                    F.col("_hi").alias("_h1"), F.col("_lo").alias("_l1"))
    b = sigs.select(F.col("media_id").alias("id2"),
                    F.col("_hi").alias("_h2"), F.col("_lo").alias("_l2"))
    ham = F.bit_count(F.col("_h1").bitwiseXOR(F.col("_h2"))) + F.bit_count(
        F.col("_l1").bitwiseXOR(F.col("_l2"))
    )
    return (
        cand.join(a, "id1")
        .join(b, "id2")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= F.lit(tau))
        .select("id1", "id2", "hamming")
    )


def cross_modal_neardup_pairs(
    images: DataFrame,
    videos: DataFrame,
    tau: int = 6,
    max_band_freq: int = 1024,
    min_change_bits: int = 12,
) -> DataFrame:
    """CROSS-MODAL near-dup: a still image duplicated as a SCENE of a
    video (poster frames, thumbnail stills, slide decks re-cut into
    clips) — the curation gap q156/q157/q158 leave open, each deduping
    WITHIN one modality (r8 verdict #5). Both sides reduce to the shared
    scene-signature shape (images are single-scene clips, video scenes
    keep their ordinal), then the q157 discipline runs ACROSS the two
    relations: 4×16-bit band keys matched WITHOUT scene alignment (an
    image may match any scene of any clip), per-key frequency caps on
    both sides (flat-color boilerplate would expand quadratically), one
    JVM popcount verify of image hash vs scene hash.

    Output: (image_id, video_id, scene_idx, hamming) with hamming ≤ tau.
    Recall contract = image_neardup_pairs': deterministic at hamming ≤ 3
    (≤3 flipped bits cannot touch all four 16-bit bands), probabilistic
    but re-encode-realistic above. Scale: ~9 signature bytes per image /
    per scene; the shuffles are one band-key equi-join plus two signature
    re-joins — pixels are touched exactly once per side, in the decode
    kernels."""
    img_sigs = extract_image_sigs(images).localCheckpoint()  # eager: decode once
    vid_sigs = scene_signatures(
        videos, min_change_bits=min_change_bits
    ).localCheckpoint()

    def _cool(bands: DataFrame) -> DataFrame:
        return bands.join(
            bands.groupBy("band", "val")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_band_freq)
            .select("band", "val"),
            ["band", "val"],
            "left_semi",
        )

    ib = _cool(scene_band_rows(img_sigs).select("media_id", "band", "val"))
    vb = _cool(scene_band_rows(vid_sigs))
    cand = (
        ib.select(F.col("media_id").alias("image_id"), "band", "val")
        .join(
            vb.select(
                F.col("media_id").alias("video_id"), "scene_idx", "band", "val"
            ),
            ["band", "val"],
        )
        .select("image_id", "video_id", "scene_idx")
        .distinct()
    )
    a = img_sigs.select(
        F.col("media_id").alias("image_id"),
        F.col("_hi").alias("_h1"),
        F.col("_lo").alias("_l1"),
    )
    b = vid_sigs.select(
        F.col("media_id").alias("video_id"),
        "scene_idx",
        F.col("_hi").alias("_h2"),
        F.col("_lo").alias("_l2"),
    )
    ham = F.bit_count(F.col("_h1").bitwiseXOR(F.col("_h2"))) + F.bit_count(
        F.col("_l1").bitwiseXOR(F.col("_l2"))
    )
    return (
        cand.join(a, "image_id")
        .join(b, ["video_id", "scene_idx"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= F.lit(tau))
        .select("image_id", "video_id", "scene_idx", "hamming")
    )


def cross_modal_fixture(
    spark, n_clips: int = 12, n_images: int = 8, planted: int = 4
) -> tuple[DataFrame, DataFrame]:
    """(images, videos) with PLANTED cross-modal truth: the videos are
    :func:`video_scene_fixture` clips; image 200+i is clip i's scene i
    re-encoded to BMP with ±2 pixel noise (new bytes, new format, same
    pixels — the poster-frame case), plus ``n_images`` content-distinct
    distractor images that appear in no clip."""
    videos = video_scene_fixture(spark, n_clips=n_clips)
    rows = []
    for i in range(n_images):
        rows.append(
            {
                "media_id": i, "kind": "image", "mime": "image/ppm",
                "payload": pattern_frame(32, 24, seed=5_000_000 + i * 7919),
                "meta_json": "{}",
            }
        )
    rng = np.random.default_rng(4321)
    for i in range(planted):
        # same seed formula as video_scene_fixture: clip i, scene i
        arr = decode_image(pattern_frame(32, 24, seed=i * 1000 + i * 10))
        noisy = np.clip(
            arr.astype(np.int16) + rng.integers(-2, 3, size=arr.shape), 0, 255
        ).astype(np.uint8)
        rows.append(
            {
                "media_id": 200 + i, "kind": "image", "mime": "image/bmp",
                "payload": bmp_payload(noisy),
                "meta_json": "{}",
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA), videos


def image_neardup_fixture(spark, n: int = 20, planted: int = 4) -> DataFrame:
    """Content-distinct pattern images 0..n-1 plus ``planted`` duplicates:
    image i re-encoded to BMP (format change) with ±2 pixel noise as id
    100+i — byte-unequal, perceptually the same."""
    rows = []
    for i in range(n):
        rows.append(
            {
                "media_id": i, "kind": "image", "mime": "image/ppm",
                "payload": pattern_frame(32, 24, seed=i * 7919 + 13),
                "meta_json": "{}",
            }
        )
    rng = np.random.default_rng(1234)
    for i in range(planted):
        arr = decode_image(rows[i]["payload"])
        noisy = np.clip(
            arr.astype(np.int16) + rng.integers(-2, 3, size=arr.shape), 0, 255
        ).astype(np.uint8)
        rows.append(
            {
                "media_id": 100 + i, "kind": "image", "mime": "image/bmp",
                "payload": bmp_payload(noisy),
                "meta_json": "{}",
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def wav_from_samples(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Float samples in [-1, 1] → mono PCM-16 WAV bytes (the generic form
    of :func:`wav_payload`, for fixtures that need composed signals)."""
    data = (np.clip(samples, -1.0, 1.0) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def audio_chunk_fingerprints(
    samples: "np.ndarray", rate: int, n_chunks: int = 4,
    n_sub: int = 4, n_mels: int = 16, rel_threshold: float = 0.1,
) -> list[int]:
    """One 64-bit spectral fingerprint per time chunk: the chunk splits
    into ``n_sub`` sub-windows, each contributing n_mels band-activity
    bits — band ACTIVE iff its mel energy exceeds ``rel_threshold`` of
    the sub-window's maximum band (16 bits × 4 sub-windows = 64). The
    ratio test is exactly invariant to amplitude scaling (re-mastering /
    volume normalization) and firmly separated for tonal content: active
    bands sit orders above the threshold, the noise floor orders below —
    unlike sign-of-adjacent-diff bits, which are coin flips on the many
    near-zero bands (measured: 16–23/64 flips on a σ=0.01 remaster; this
    scheme: 0). Chunk ORDINAL is the alignment key downstream, the same
    role scene_idx plays for video."""
    L = len(samples)
    if L == 0:
        return []
    fb = mel_filterbank(n_mels, 256, rate)
    out = []
    for c in range(n_chunks):
        chunk = samples[c * L // n_chunks : (c + 1) * L // n_chunks]
        cl = len(chunk)
        bits: list[int] = []
        for s in range(n_sub):
            sub = chunk[s * cl // n_sub : (s + 1) * cl // n_sub]
            e = (stft_power(sub, 256, 128) @ fb.T).mean(axis=0)
            mx = float(e.max())
            active = e > rel_threshold * mx if mx > 0 else np.zeros(n_mels, bool)
            bits.extend(active.astype(int).tolist())
        out.append(int("".join("1" if b else "0" for b in bits), 2))
    return out


AUDIO_CHUNK_SIG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("scene_idx", IntegerType()),
        StructField("_hi", LongType()),
        StructField("_lo", LongType()),
    ]
)


def extract_audio_chunk_sigs(media: DataFrame, n_chunks: int = 4) -> DataFrame:
    """Audio rows → chunk-aligned 64-bit spectral fingerprints in the
    scene-signature shape (media_id, scene_idx, _hi, _lo) — audio rides
    the SAME banded candidate join and popcount verify as video scenes.
    Undecodable payloads are dropped (a fingerprint of bytes that aren't
    audio is noise; byte-exact dedup owns those)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "scene_idx", "_hi", "_lo")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                wav = decode_audio(b"" if p is None else bytes(p))
                if wav is None:
                    continue
                rate, samples = wav
                for idx, v in enumerate(
                    audio_chunk_fingerprints(samples, rate, n_chunks=n_chunks)
                ):
                    out["media_id"].append(int(mid))
                    out["scene_idx"].append(idx)
                    out["_hi"].append(v >> 32)
                    out["_lo"].append(v & 0xFFFFFFFF)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "scene_idx": pd.Series(out["scene_idx"], dtype="int32"),
                    "_hi": pd.Series(out["_hi"], dtype="int64"),
                    "_lo": pd.Series(out["_lo"], dtype="int64"),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_CHUNK_SIG_SCHEMA
    )


def audio_neardup_pairs(
    media: DataFrame,
    tau: int = 3,
    min_chunk_sim: float = 0.75,
    max_band_freq: int = 1024,
    n_chunks: int = 4,
) -> DataFrame:
    """Audio near-dup: re-mastered / noise-degraded duplicate clips as
    ``(id1, id2, n_match, scene_sim)`` — the audio member of the
    multimodal dedup family, running ENTIRELY on the shared video-scene
    machinery after one decode pass (chunk ordinal = scene ordinal).
    ``tau`` defaults tighter than the visual paths: band-activity bits
    are sparse and stable (a 0.5×-amplitude σ=0.02 remaster flips ≤2 of
    64, measured), while tonally DIFFERENT clips sharing one tone can
    sit at hamming 4 — tau=3 separates the two regimes. At tau ≤ 3 the
    4×16 banding's recall is DETERMINISTIC per chunk (pigeonhole: ≤3
    flips cannot touch all four bands), so a matching chunk always
    surfaces as a candidate — no probabilistic miss mode at the
    default."""
    sigs = extract_audio_chunk_sigs(media, n_chunks=n_chunks).localCheckpoint()
    bands = scene_band_rows(sigs)
    keys = ["band", "val", "scene_idx"]
    cool = bands.join(
        bands.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_band_freq)
        .select(*keys),
        keys,
        "left_semi",
    )
    cand = (
        cool.alias("A")
        .join(cool.alias("B"), keys)
        .filter(F.col("A.media_id") < F.col("B.media_id"))
        .select(F.col("A.media_id").alias("id1"), F.col("B.media_id").alias("id2"))
        .distinct()
    )
    return scene_pair_verify(cand, sigs, sigs, tau=tau, min_scene_sim=min_chunk_sim)


def audio_neardup_fixture(spark, n: int = 10, planted: int = 3) -> DataFrame:
    """Clips of per-chunk two-tone mixtures (deterministic seeded
    frequencies — content-distinct across clips, structured across
    chunks) plus ``planted`` re-masters: id 100+i is clip i at 0.7×
    amplitude with seeded noise — new bytes, same spectral structure."""
    rate, dur = 8000, 1.0
    t = np.arange(int(rate * dur / 4)) / rate
    rows = []
    sigs = {}
    for i in range(n):
        chunks = []
        for c in range(4):
            f1 = 300.0 + 250.0 * ((i * 13 + c * 5) % 12)
            f2 = 2800.0 + 120.0 * ((i * 7 + c * 3) % 8)
            chunks.append(
                0.45 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
            )
        samples = np.concatenate(chunks)
        sigs[i] = samples
        rows.append(
            {
                "media_id": i, "kind": "audio", "mime": "audio/wav",
                "payload": wav_from_samples(samples, rate), "meta_json": "{}",
            }
        )
    rng = np.random.default_rng(4321)
    for i in range(planted):
        remaster = 0.7 * sigs[i] + rng.normal(0.0, 0.01, size=sigs[i].shape)
        rows.append(
            {
                "media_id": 100 + i, "kind": "audio", "mime": "audio/wav",
                "payload": wav_from_samples(remaster, rate), "meta_json": "{}",
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _decode_stats_sigs(media: DataFrame, n_chunks: int = 4) -> DataFrame:
    """ONE decode pass over image/audio rows emitting BOTH the decode-gate
    stats and the perceptual signatures: ``(media_id, kind, ok, n_pixels,
    seconds, scene_idx, _hi, _lo)`` — images one row (scene_idx 0), audio
    one row per time chunk, undecodable payloads one row with ok=false
    and NULL signature. Decodability is the REAL decoders returning None
    (never the stub fallback the feature extractors use — the gate must
    DROP junk, not hash it); signature values are bit-identical to
    extract_image_sigs / extract_audio_chunk_sigs (same ahash64 /
    audio_chunk_fingerprints kernels), so downstream dedup results match
    the standalone operators'. Built for :func:`media_pipeline`, whose
    decode pass was previously paid twice per modality (gate + sigs —
    the r8 review finding)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = ("media_id", "kind", "ok", "n_pixels", "seconds",
                    "scene_idx", "_hi", "_lo")
            out = {k: [] for k in cols}

            def emit(mid, kind, ok, px, sec, idx, hi, lo):
                for k, v in zip(cols, (int(mid), kind, ok, px, sec, idx, hi, lo)):
                    out[k].append(v)

            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = b"" if p is None else bytes(p)
                if kind == "image":
                    arr = decode_image(raw)
                    if arr is None:
                        emit(mid, kind, False, 0, 0.0, None, None, None)
                    else:
                        h = ahash64(arr)
                        emit(mid, kind, True, int(arr.shape[0] * arr.shape[1]),
                             0.0, 0, int(h[:8], 16), int(h[8:], 16))
                else:  # audio
                    wav = decode_audio(raw)
                    if wav is None:
                        emit(mid, kind, False, 0, 0.0, None, None, None)
                        continue
                    rate, samples = wav
                    sec = float(len(samples) / rate)
                    fps = audio_chunk_fingerprints(samples, rate,
                                                   n_chunks=n_chunks)
                    if not fps:
                        emit(mid, kind, True, 0, sec, None, None, None)
                    for idx, v in enumerate(fps):
                        emit(mid, kind, True, 0, sec, idx,
                             v >> 32, v & 0xFFFFFFFF)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "kind": pd.Series(out["kind"], dtype="object"),
                    "ok": pd.Series(out["ok"], dtype="bool"),
                    "n_pixels": pd.Series(out["n_pixels"], dtype="int64"),
                    "seconds": pd.Series(out["seconds"], dtype="float64"),
                    "scene_idx": pd.Series(out["scene_idx"], dtype="Int32"),
                    "_hi": pd.Series(out["_hi"], dtype="Int64"),
                    "_lo": pd.Series(out["_lo"], dtype="Int64"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run,
        "media_id long, kind string, ok boolean, n_pixels long, "
        "seconds double, scene_idx int, _hi long, _lo long",
    )


def media_pipeline(
    media: DataFrame,
    min_image_pixels: int = 256,
    min_audio_seconds: float = 0.25,
    min_video_scenes: int = 2,
    image_tau: int = 10,
    audio_tau: int = 3,
    video_tau: int = 10,
    min_scene_sim: float = 0.6,
    min_chunk_sim: float = 0.75,
) -> dict:
    """THE END-TO-END MULTIMODAL CURATION PIPELINE (q161) — the q119
    composition pattern for media: every stage is individually green
    elsewhere (q34/q136 decode, q156/q157/q158 perceptual dedup), but the
    product is the composition, and stage composition is where schema and
    survivor-threading drift hides. Stages, each feeding the next's
    survivors only, PER MODALITY:

      00 raw      → the mixed media frame (kind ∈ image/audio/video)
      01 decoded  → payload actually decodes (images/audio: the real
                    decoders, not the stub fallback; video: ≥1 scene) —
                    junk bytes leave the corpus here
      02 quality  → modality floors: image ≥ min_image_pixels, audio ≥
                    min_audio_seconds, video ≥ min_video_scenes
      03 dedup    → per-modality perceptual near-dup clusters (the
                    q156/q157/q158 operators), min-id representative kept

    Returns {"ledger": (stage, modality, n_items, id_sum) — the yield
    ledger a curation run reports, id_sum pinning the exact surviving
    membership; "survivors": the final (media_id, kind) frame}. At scale
    every stage is one decode pass + hash aggregates / bounded band
    joins; the ledger is four tiny aggregates unioned."""
    from .dedup import dup_clusters

    media = media.select("media_id", "kind", "mime", "payload", "meta_json")
    # ONE decode pass per modality, enforced by construction: image/audio
    # stats AND signatures come out of the same fused kernel
    # (_decode_stats_sigs); video signatures drive both the scene-count
    # gate and the dedup stage
    ss = _decode_stats_sigs(
        media.filter(F.col("kind").isin("image", "audio"))
    ).localCheckpoint()  # eager: one decode pass, many consumers
    stats = ss.select("media_id", "kind", "ok", "n_pixels", "seconds").distinct()
    vid = media.filter(F.col("kind") == "video")
    vid_sigs = scene_signatures(vid).localCheckpoint()  # eager: decode once
    n_scenes = vid_sigs.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_scenes")
    ).localCheckpoint(eager=False)

    dec_ids = {
        "image": stats.filter(
            (F.col("kind") == "image") & F.col("ok") & (F.col("n_pixels") > 0)
        ),
        "audio": stats.filter(
            (F.col("kind") == "audio") & F.col("ok") & (F.col("seconds") > 0)
        ),
        "video": n_scenes.filter(F.col("n_scenes") >= 1),
    }
    qual_ids = {
        "image": dec_ids["image"].filter(F.col("n_pixels") >= min_image_pixels),
        "audio": dec_ids["audio"].filter(F.col("seconds") >= min_audio_seconds),
        "video": dec_ids["video"].filter(F.col("n_scenes") >= min_video_scenes),
    }

    sig_cols = ["media_id", "scene_idx", "_hi", "_lo"]
    img_sigs = ss.filter(
        (F.col("kind") == "image") & F.col("_hi").isNotNull()
    ).select(*sig_cols)
    aud_sigs = ss.filter(
        (F.col("kind") == "audio") & F.col("_hi").isNotNull()
    ).select(*sig_cols)
    mod_sigs = {"image": img_sigs, "audio": aud_sigs, "video": vid_sigs}
    mod_tau = {"image": image_tau, "audio": audio_tau, "video": video_tau}
    mod_sim = {"image": 0.5, "audio": min_chunk_sim, "video": min_scene_sim}
    mod_cap = {"image": 1024, "audio": 1024, "video": 64}

    def survivors(kind: str) -> DataFrame:
        kept_sigs = mod_sigs[kind].join(
            qual_ids[kind].select("media_id"), "media_id", "left_semi"
        )
        pairs = scene_neardup_pairs(
            kept_sigs, tau=mod_tau[kind], min_scene_sim=mod_sim[kind],
            max_band_freq=mod_cap[kind],
        )
        dupes = (
            dup_clusters(pairs, id1_col="id1", id2_col="id2")
            .filter(F.col("doc_id") != F.col("cluster_id"))
            .select(F.col("doc_id").alias("media_id"))
        )
        return qual_ids[kind].select("media_id").join(
            dupes, "media_id", "left_anti"
        )

    dedup_ids = {k: survivors(k) for k in ("image", "audio", "video")}

    parts = [
        media.select(
            F.lit("00_raw").alias("stage"), F.col("kind").alias("modality"),
            "media_id",
        )
    ]
    for stage, ids in (("01_decoded", dec_ids), ("02_quality", qual_ids),
                       ("03_dedup", dedup_ids)):
        for kind, df in ids.items():
            parts.append(
                df.select(
                    F.lit(stage).alias("stage"), F.lit(kind).alias("modality"),
                    "media_id",
                )
            )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    ledger = (
        union.groupBy("stage", "modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("media_id").alias("id_sum"),
        )
        .orderBy("stage", "modality")
    )
    keep = None
    for kind, df in dedup_ids.items():
        k = df.select("media_id")
        keep = k if keep is None else keep.unionByName(k)
    return {
        "ledger": ledger,
        "survivors": media.join(keep, "media_id", "left_semi")
        .select("media_id", "kind"),
    }


def extract_video_audio_sigs(media: DataFrame, n_chunks: int = 4) -> DataFrame:
    """Video rows → chunk-aligned 64-bit spectral fingerprints of the
    clip's embedded AUDIO TRACK, in the shared scene-signature shape
    (media_id, scene_idx=chunk ordinal, _hi, _lo). The PCM decode is
    sample-identical to :func:`decode_audio` on the standalone WAV
    (int16/32768), so a track and its extraction fingerprint
    bit-identically — videos with no 'auds' stream simply emit no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "scene_idx", "_hi", "_lo")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                avi = parse_avi(b"" if p is None else bytes(p))
                if avi is None or avi["audio"] is None or avi["audio_rate"] is None:
                    continue
                samples = (
                    np.frombuffer(avi["audio"], dtype="<i2").astype(np.float64)
                    / 32768.0
                )
                for idx, v in enumerate(
                    audio_chunk_fingerprints(
                        samples, avi["audio_rate"], n_chunks=n_chunks
                    )
                ):
                    out["media_id"].append(int(mid))
                    out["scene_idx"].append(idx)
                    out["_hi"].append(v >> 32)
                    out["_lo"].append(v & 0xFFFFFFFF)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "scene_idx": pd.Series(out["scene_idx"], dtype="int32"),
                    "_hi": pd.Series(out["_hi"], dtype="int64"),
                    "_lo": pd.Series(out["_lo"], dtype="int64"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=AUDIO_CHUNK_SIG_SCHEMA
    )


def cross_modal_av_pairs(
    audios: DataFrame,
    videos: DataFrame,
    tau: int = 3,
    max_band_freq: int = 1024,
    n_chunks: int = 4,
) -> DataFrame:
    """CROSS-MODAL near-dup: a standalone audio clip that IS (or
    re-masters) the SOUNDTRACK of a video — podcast episodes re-uploaded
    as static-image videos, music extracted from clips, dubbed intros.
    The q164 pattern applied to the audio axis: both sides reduce to
    chunk-aligned spectral fingerprints (standalone WAVs via
    extract_audio_chunk_sigs, embedded tracks via
    :func:`extract_video_audio_sigs`), then band keys are matched WITH
    chunk alignment (a soundtrack aligns in time — unlike the image case,
    where a still may match any scene), per-key frequency caps on both
    sides, one JVM popcount verify.

    Output: (audio_id, video_id, chunk_idx, hamming) with hamming ≤ tau.
    Recall at tau ≤ 3 is DETERMINISTIC per chunk (pigeonhole over the
    4×16-bit bands), the q158 contract. Scale: ~9 signature bytes per
    chunk per side; audio samples are touched exactly once per side."""
    a_sigs = extract_audio_chunk_sigs(audios, n_chunks=n_chunks).localCheckpoint()
    v_sigs = extract_video_audio_sigs(videos, n_chunks=n_chunks).localCheckpoint()
    keys = ["band", "val", "scene_idx"]

    def _cool(bands: DataFrame) -> DataFrame:
        return bands.join(
            bands.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_band_freq)
            .select(*keys),
            keys,
            "left_semi",
        )

    ab = _cool(scene_band_rows(a_sigs))
    vb = _cool(scene_band_rows(v_sigs))
    cand = (
        ab.select(F.col("media_id").alias("audio_id"), *keys)
        .join(vb.select(F.col("media_id").alias("video_id"), *keys), keys)
        .select("audio_id", "video_id", F.col("scene_idx").alias("chunk_idx"))
        .distinct()
    )
    a = a_sigs.select(
        F.col("media_id").alias("audio_id"),
        F.col("scene_idx").alias("chunk_idx"),
        F.col("_hi").alias("_h1"),
        F.col("_lo").alias("_l1"),
    )
    b = v_sigs.select(
        F.col("media_id").alias("video_id"),
        F.col("scene_idx").alias("chunk_idx"),
        F.col("_hi").alias("_h2"),
        F.col("_lo").alias("_l2"),
    )
    ham = F.bit_count(F.col("_h1").bitwiseXOR(F.col("_h2"))) + F.bit_count(
        F.col("_l1").bitwiseXOR(F.col("_l2"))
    )
    return (
        cand.join(a, ["audio_id", "chunk_idx"])
        .join(b, ["video_id", "chunk_idx"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= F.lit(tau))
        .select("audio_id", "video_id", "chunk_idx", "hamming")
    )


def cross_modal_av_fixture(
    spark, n_clips: int = 10, n_audios: int = 6, planted: int = 3
) -> "tuple[DataFrame, DataFrame]":
    """(audios, videos) with PLANTED cross-modal truth: each clip carries
    a content-distinct per-chunk two-tone soundtrack (the
    audio_neardup_fixture signal family); standalone audio 300+i is clip
    i's track re-mastered at 0.7× with seeded noise — new bytes, same
    spectral structure — among ``n_audios`` distractor WAVs whose tone
    sets appear in no clip."""
    rate, dur = 8000, 1.0
    t = np.arange(int(rate * dur / 4)) / rate

    def track(seed: int) -> "np.ndarray":
        chunks = []
        for c in range(4):
            f1 = 300.0 + 250.0 * ((seed * 13 + c * 5) % 12)
            f2 = 2800.0 + 120.0 * ((seed * 7 + c * 3) % 8)
            chunks.append(
                0.45 * np.sin(2 * np.pi * f1 * t)
                + 0.3 * np.sin(2 * np.pi * f2 * t)
            )
        return np.concatenate(chunks)

    vid_rows = []
    for i in range(n_clips):
        frames = [pattern_frame(32, 24, seed=i * 1000 + s * 10) for s in range(2)]
        vid_rows.append(
            {
                "media_id": i, "kind": "video", "mime": "video/avi",
                "payload": avi_payload(frames, fps=5, w=32, h=24,
                                       audio=track(i), audio_rate=rate),
                "meta_json": "{}",
            }
        )
    aud_rows = []
    for i in range(n_audios):
        # the tone-index formula has period 12 in the seed, so "far" seeds
        # can still alias a clip's tone set; seeds 58..63 are verified
        # band-collision-free against clips 0..9 on every chunk (no shared
        # 16-bit band key anywhere — tests pin distractor-only emptiness)
        aud_rows.append(
            {
                "media_id": 100 + i, "kind": "audio", "mime": "audio/wav",
                "payload": wav_from_samples(track(58 + i), rate),
                "meta_json": "{}",
            }
        )
    rng = np.random.default_rng(4321)
    for i in range(planted):
        remaster = 0.7 * track(i) + rng.normal(0.0, 0.01, size=track(i).shape)
        aud_rows.append(
            {
                "media_id": 300 + i, "kind": "audio", "mime": "audio/wav",
                "payload": wav_from_samples(remaster, rate),
                "meta_json": "{}",
            }
        )
    return (
        spark.createDataFrame(aud_rows, schema=MEDIA_SCHEMA),
        spark.createDataFrame(vid_rows, schema=MEDIA_SCHEMA),
    )


def cross_modal_ingest_fixture(
    spark, n_clips: int = 10, n_images: int = 8, planted_images: int = 3,
    n_audios: int = 6, planted_audios: int = 3,
) -> "tuple[DataFrame, DataFrame, DataFrame]":
    """(videos, images, audios) with planted CROSS-MODAL HISTORY truth for
    cdc37 — both cross-modal axes against one video corpus. videos/audios
    are exactly :func:`cross_modal_av_fixture`'s rows (clips 0..n_clips-1
    with per-chunk two-tone audio tracks; distractor WAVs 100+i from the
    verified band-collision-free seed family; remasters 300+i of clip i's
    track). images add the q164 axis: distractors 400+i from the pattern
    family appearing in no clip, and 200+i = a BMP ±2-pixel-noise
    re-encode of clip i's SCENE 1 (the video_scene_fixture seed formula
    ``i*1000 + s*10`` at s=1) — new bytes, new container, same pixels,
    the poster-frame case arriving AFTER the clip was ingested."""
    audios, videos = cross_modal_av_fixture(
        spark, n_clips=n_clips, n_audios=n_audios, planted=planted_audios
    )
    rows = []
    for i in range(n_images):
        rows.append(
            {
                "media_id": 400 + i, "kind": "image", "mime": "image/ppm",
                "payload": pattern_frame(32, 24, seed=5_000_000 + i * 7919),
                "meta_json": "{}",
            }
        )
    rng = np.random.default_rng(987)
    for i in range(planted_images):
        arr = decode_image(pattern_frame(32, 24, seed=i * 1000 + 10))
        noisy = np.clip(
            arr.astype(np.int16) + rng.integers(-2, 3, size=arr.shape), 0, 255
        ).astype(np.uint8)
        rows.append(
            {
                "media_id": 200 + i, "kind": "image", "mime": "image/bmp",
                "payload": bmp_payload(noisy), "meta_json": "{}",
            }
        )
    return videos, spark.createDataFrame(rows, schema=MEDIA_SCHEMA), audios
