"""Stdlib-only media codecs for the multimodal operators.

Real decoders for three self-describing formats whose specs are fully
public and parseable with nothing but ``struct``/``wave``/numpy:

- PPM (P6 binary): the simplest raster format — ASCII header
  ``P6 <w> <h> <maxval>`` then raw RGB bytes.
- BMP: uncompressed 24-bit BI_RGB Windows bitmaps (bottom-up rows,
  4-byte row padding).
- WAV: RIFF PCM via the stdlib ``wave`` module (8/16-bit).

These back ``decode_stub=False`` in multimodal.py: the mapInPandas
plumbing is identical to the stub path, only the per-payload function
changes — which is the whole point of the schema contract. Heavier
formats (JPEG/MP3/MP4) slot into the same functions via PIL/ffmpeg when
available; nothing in the Spark plumbing changes.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


# -- PPM (P6) ---------------------------------------------------------------


def parse_ppm(data: bytes) -> tuple[int, int, np.ndarray]:
    """P6 PPM -> (width, height, uint8 array of shape (h, w, 3))."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace/comment-separated
    # ASCII tokens, then ONE whitespace byte, then raw RGB
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raw = data[pos : pos + need]
    if len(raw) < need:
        raise ValueError("truncated PPM payload")
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def write_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> P6 PPM bytes."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


# -- BMP (24-bit BI_RGB) ----------------------------------------------------


def parse_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed 24-bit BMP -> (width, height, uint8 (h, w, 3) RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundary
    rows = []
    for r in range(h):
        off = pixel_off + r * row_bytes
        rows.append(np.frombuffer(data[off : off + w * 3], dtype=np.uint8).reshape(w, 3))
    px = np.stack(rows[::-1] if flip else rows)
    return w, h, px[:, :, ::-1].copy()  # BGR -> RGB


def write_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> bottom-up 24-bit BMP bytes."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = pixels[:, :, ::-1]
    pad = b"\x00" * (row_bytes - w * 3)
    for r in range(h - 1, -1, -1):
        body += bgr[r].astype(np.uint8).tobytes() + pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


# -- WAV (PCM) --------------------------------------------------------------


def parse_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF PCM WAV -> (sample_rate, channels, float64 samples in [-1, 1],
    shape (n_frames, channels))."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate, nch, width = wf.getframerate(), wf.getnchannels(), wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return rate, nch, x.reshape(-1, nch)


def write_wav(rate: int, samples: np.ndarray) -> bytes:
    """float samples in [-1, 1], shape (n, ch) -> 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# -- dispatch ---------------------------------------------------------------

IMAGE_MIMES = {"image/x-portable-pixmap": parse_ppm, "image/bmp": parse_bmp}
AUDIO_MIMES = {"audio/wav", "audio/x-wav"}


def decode_image(data: bytes, mime: str) -> tuple[int, int, np.ndarray]:
    parser = IMAGE_MIMES.get(mime)
    if parser is None:
        raise NotImplementedError(
            f"no stdlib decoder for image mime {mime!r} (PPM/BMP supported; "
            "JPEG/PNG need PIL — plug into the same function)"
        )
    return parser(data)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — deterministic,
    no interpolation-library dependence."""
    h, w, _ = pixels.shape
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[rows][:, cols]


def image_features(pixels: np.ndarray, feat_dim: int) -> list[float]:
    """Real image features: mean R,G,B then per-channel std, /255,
    truncated or zero-padded to feat_dim."""
    px = pixels.reshape(-1, 3).astype(np.float64)
    vals = list(px.mean(axis=0) / 255.0) + list(px.std(axis=0) / 255.0)
    return [float(v) for v in (vals + [0.0] * feat_dim)[:feat_dim]]


def audio_features(rate: int, samples: np.ndarray, feat_dim: int) -> list[float]:
    """Real audio features: duration_s, RMS, peak, zero-crossing rate of
    the first channel, truncated/zero-padded to feat_dim."""
    mono = samples[:, 0] if samples.size else np.zeros(1)
    dur = samples.shape[0] / float(rate)
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.mean(np.signbit(mono[:-1]) != np.signbit(mono[1:]))) if len(mono) > 1 else 0.0
    vals = [dur, rms, peak, zcr]
    return [float(v) for v in (vals + [0.0] * feat_dim)[:feat_dim]]
