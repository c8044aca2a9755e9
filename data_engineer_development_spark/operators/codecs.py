"""Pure-Python/numpy media codecs for the multimodal operators.

No external media library ships in this environment, so the engine carries
its own minimal, real codecs for self-describing uncompressed formats:

- **PPM** (netpbm P6 binary / P5 grayscale): header parse (whitespace +
  ``#`` comments per the netpbm spec) + raw pixel block → ``uint8`` array.
- **BMP** (Windows BITMAPINFOHEADER, 24-bit uncompressed BI_RGB): little-
  endian header fields, 4-byte row padding, bottom-up row order.
- **WAV** (RIFF PCM 16-bit/8-bit) via the stdlib ``wave`` module → ``int16``
  samples.
- **PPM stream** ("video"): concatenated P6 documents, one per frame — a
  real (if minimal) container that exercises frame seek/decode without
  ffmpeg.

These run inside Arrow-batched ``mapInPandas`` stages
(operators/multimodal.py), so each executor decodes its own partition's
payloads; nothing crosses the driver. Compressed formats (JPEG/PNG/MP3)
have no decoder here — `decode_media` raises ``ValueError`` naming the
format so callers can fall back to the deterministic stub path explicitly.

Reference parity note: the reference repo has no media handling at all
(SURVEY.md §0) — this module is north-star extension scope (BASELINE.json
"multimodal columns"), built from the public netpbm/BMP/RIFF format specs.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# PPM / PGM (netpbm)
# ---------------------------------------------------------------------------


def _read_pnm_header(payload: bytes) -> tuple[str, int, int, int, int]:
    """Parse a P5/P6 header: returns (magic, width, height, maxval, offset).

    Netpbm allows arbitrary whitespace and ``#`` comments between header
    tokens; exactly one whitespace byte separates the maxval from the pixel
    block.
    """
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in b"56":
        raise ValueError("not a P5/P6 netpbm payload")
    magic = payload[:2].decode()
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c in b"#":
            while pos < len(payload) and payload[pos] not in b"\n":
                pos += 1
        elif 48 <= c <= 57:
            start = pos
            while pos < len(payload) and 48 <= payload[pos] <= 57:
                pos += 1
            tokens.append(int(payload[start:pos]))
        else:
            raise ValueError(f"bad netpbm header byte {c!r} at {pos}")
    if pos >= len(payload) or payload[pos] not in b" \t\r\n":
        raise ValueError("missing whitespace after netpbm maxval")
    pos += 1  # single whitespace byte before the raster
    w, h, maxval = tokens
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported netpbm maxval {maxval} (want 1-byte)")
    return magic, w, h, maxval, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode P6 (RGB) or P5 (grayscale) to a (h, w, 3) uint8 array."""
    magic, w, h, _maxval, pos = _read_pnm_header(payload)
    ch = 3 if magic == "P6" else 1
    need = w * h * ch
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(
            f"netpbm raster truncated: want {need} bytes, have {len(raster)}"
        )
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, ch)
    if ch == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode a (h, w, 3) uint8 array as binary P6."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError(f"encode_ppm wants 3 channels, got {ch}")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def iter_ppm_frames(payload: bytes):
    """Yield each P6 frame of a concatenated-PPM stream (the engine's
    minimal video container: frame k starts where frame k-1's raster ends)."""
    pos = 0
    while pos < len(payload):
        _magic, w, h, _mx, off = _read_pnm_header(payload[pos:])
        end = pos + off + w * h * 3
        if end > len(payload):
            raise ValueError(f"ppm-stream frame truncated at byte {pos}")
        yield decode_ppm(payload[pos:end])
        pos = end


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed (BI_RGB) BMP to (h, w, 3) uint8 RGB.

    BMP stores BGR byte order, rows padded to 4 bytes, bottom-up unless
    height is negative.
    """
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError(f"BMP truncated: want {need} bytes, have {len(payload)}")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a 24-bit bottom-up BMP."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    raster = body.tobytes()
    file_size = 54 + len(raster)
    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + raster


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF PCM WAV → (samples int16 of shape (n, channels), rate)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            nch, sw, rate, n = (
                f.getnchannels(),
                f.getsampwidth(),
                f.getframerate(),
                f.getnframes(),
            )
            raw = f.readframes(n)
    except wave.Error as e:
        raise ValueError(f"not a PCM WAV payload: {e}") from e
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    elif sw == 1:  # 8-bit WAV is unsigned; center to signed int16 range
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) * 256
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return samples.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode (n,) or (n, ch) int16 samples as 16-bit PCM WAV."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Dispatch + derived features
# ---------------------------------------------------------------------------

#: magic-byte sniffing, so payloads decode even with a generic mime
_MAGIC = (
    (b"P6", "image/x-portable-pixmap"),
    (b"P5", "image/x-portable-graymap"),
    (b"BM", "image/bmp"),
    (b"RIFF", "audio/wav"),
)


def sniff_mime(payload: bytes) -> str | None:
    for magic, mime in _MAGIC:
        if payload[: len(magic)] == magic:
            return mime
    return None


def decode_media(payload: bytes, mime: str | None = None) -> dict:
    """Decode a payload to ``{"kind": "image"|"audio", ...}``.

    image → ``pixels`` (h, w, 3) uint8; audio → ``samples`` (n, ch) int16 +
    ``rate``. Unsupported formats raise ``ValueError`` naming the format —
    the caller decides whether to fall back to the deterministic stub.
    """
    payload = payload or b""
    kind = sniff_mime(payload) or mime
    if kind in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        return {"kind": "image", "pixels": decode_ppm(payload)}
    if kind == "image/bmp":
        return {"kind": "image", "pixels": decode_bmp(payload)}
    if kind == "audio/wav":
        samples, rate = decode_wav(payload)
        return {"kind": "audio", "samples": samples, "rate": rate}
    raise ValueError(
        f"no codec for mime={mime!r} (magic={payload[:4]!r}); "
        "supported: PPM/PGM, 24-bit BMP, PCM WAV"
    )


def _chunk_means(flat: np.ndarray, dims: int) -> np.ndarray:
    """Mean of ``dims`` contiguous chunks of a 1-D float array (uneven tails
    fold into the last chunk) — a fixed-width, content-derived signature."""
    if flat.size == 0:
        return np.zeros(dims, dtype=np.float32)
    idx = np.linspace(0, flat.size, dims + 1, dtype=np.int64)
    out = np.empty(dims, dtype=np.float32)
    for i in range(dims):
        seg = flat[idx[i] : idx[i + 1]]
        out[i] = seg.mean() if seg.size else out[i - 1] if i else 0.0
    return out


def media_features(payload: bytes, mime: str | None, dims: int) -> np.ndarray:
    """Fixed-width feature vector from REAL decoded content, in [0, 1].

    Images: per-channel mean prefix (meanR, meanG, meanB scaled /255 — the
    SQL-checkable anchor) followed by chunked means of the grayscale plane.
    Audio: chunked mean-absolute-amplitude of the samples (scaled /32768).
    """
    m = decode_media(payload, mime)
    if m["kind"] == "image":
        px = m["pixels"].astype(np.float32)
        chan = px.reshape(-1, 3).mean(axis=0) / 255.0
        if dims <= 3:
            return chan[:dims].astype(np.float32)
        gray = px.mean(axis=2).ravel() / 255.0
        return np.concatenate(
            [chan.astype(np.float32), _chunk_means(gray, dims - 3)]
        )
    amp = np.abs(m["samples"].astype(np.float32)).mean(axis=1) / 32768.0
    return _chunk_means(amp, dims)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, 3) → (height, width, 3): pure index
    sampling, the same pixel values reappear (no interpolation error)."""
    h, w, _ = pixels.shape
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return pixels[rows][:, cols]
