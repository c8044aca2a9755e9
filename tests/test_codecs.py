"""Real codec roundtrips (operators/codecs.py): PPM/BMP/WAV decode is
checked against independently-constructed byte layouts, not against the
encoder alone, so an encoder+decoder that agree on a WRONG layout still
fail."""

from __future__ import annotations

import numpy as np
import pytest

from data_engineer_development_spark.operators import codecs


def _img(h=5, w=7, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_and_header_layout():
    img = _img()
    payload = codecs.encode_ppm(img)
    # independent layout check: exact header then raw RGB raster
    assert payload.startswith(b"P6\n7 5\n255\n")
    assert payload[len(b"P6\n7 5\n255\n") :] == img.tobytes()
    assert np.array_equal(codecs.decode_ppm(payload), img)


def test_ppm_header_comments_and_whitespace():
    img = _img(2, 2)
    payload = b"P6 # comment\n# full line\n 2\t2 # wh\n255\n" + img.tobytes()
    assert np.array_equal(codecs.decode_ppm(payload), img)


def test_pgm_p5_decodes_to_rgb():
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    payload = b"P5\n3 2\n255\n" + gray.tobytes()
    out = codecs.decode_ppm(payload)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_ppm_truncation_raises():
    img = _img(4, 4)
    payload = codecs.encode_ppm(img)
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_ppm(payload[:-5])


def test_bmp_roundtrip_including_padding_and_bottom_up():
    # width 3 → stride 12 (3*3=9 padded to 12): exercises row padding
    img = _img(4, 3, seed=9)
    payload = codecs.encode_bmp(img)
    assert payload[:2] == b"BM"
    assert np.array_equal(codecs.decode_bmp(payload), img)
    # independent check of BGR + bottom-up: first raster byte is the BLUE
    # channel of the BOTTOM-left pixel
    data_off = int.from_bytes(payload[10:14], "little")
    assert payload[data_off] == img[-1, 0, 2]


def test_wav_roundtrip_16bit_stereo():
    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32767, size=(100, 2), dtype=np.int16)
    payload = codecs.encode_wav(samples, rate=8000)
    out, rate = codecs.decode_wav(payload)
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_ppm_stream_frames():
    frames = [_img(3, 3, seed=i) for i in range(4)]
    stream = b"".join(codecs.encode_ppm(f) for f in frames)
    out = list(codecs.iter_ppm_frames(stream))
    assert len(out) == 4
    for a, b in zip(out, frames):
        assert np.array_equal(a, b)


def test_sniff_and_dispatch():
    img = _img(2, 2)
    assert codecs.decode_media(codecs.encode_ppm(img), None)["kind"] == "image"
    assert codecs.decode_media(codecs.encode_bmp(img), None)["kind"] == "image"
    wav = codecs.encode_wav(np.zeros(10, dtype=np.int16))
    assert codecs.decode_media(wav, None)["kind"] == "audio"
    with pytest.raises(ValueError, match="no codec"):
        codecs.decode_media(b"\x89PNG\r\n", "image/png")


def test_image_features_channel_means_exact():
    # solid color: channel-mean features must recover the exact bytes
    px = np.tile(np.array([200, 100, 50], dtype=np.uint8), (16, 16, 1))
    feats = codecs.media_features(codecs.encode_ppm(px), None, dims=8)
    assert len(feats) == 8
    assert round(float(feats[0]) * 255) == 200
    assert round(float(feats[1]) * 255) == 100
    assert round(float(feats[2]) * 255) == 50
    assert all(0.0 <= f <= 1.0 for f in feats)


def test_audio_features_shape_and_range():
    rng = np.random.default_rng(7)
    samples = rng.integers(-2000, 2000, size=4000, dtype=np.int16)
    feats = codecs.media_features(codecs.encode_wav(samples), None, dims=6)
    assert len(feats) == 6
    assert all(0.0 <= f <= 1.0 for f in feats)


def test_resize_nearest_preserves_solid_and_downsamples():
    img = _img(8, 8, seed=5)
    out = codecs.resize_nearest(img, 4, 2)
    assert out.shape == (2, 4, 3)
    # nearest-neighbor: every output pixel exists in the input
    flat_in = {tuple(p) for p in img.reshape(-1, 3)}
    assert all(tuple(p) in flat_in for p in out.reshape(-1, 3))


def test_bmp_top_down_negative_height():
    # height < 0 ⇒ rows stored top-down: build the payload by hand from a
    # bottom-up encode and flip the height sign + row order
    import struct

    img = _img(3, 2, seed=21)
    payload = bytearray(codecs.encode_bmp(img[::-1]))  # rows pre-flipped
    struct.pack_into("<i", payload, 22, -3)  # declare top-down
    assert np.array_equal(codecs.decode_bmp(bytes(payload)), img)


def test_wav_8bit_unsigned_decodes_centered():
    # 8-bit WAV is unsigned; decoder must center to signed int16 range
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(1)
        f.setframerate(8000)
        f.writeframes(bytes([0, 128, 255]))
    out, rate = codecs.decode_wav(buf.getvalue())
    assert rate == 8000
    assert out[:, 0].tolist() == [(0 - 128) * 256, 0, (255 - 128) * 256]


def test_media_features_pgm_grayscale():
    gray = np.full((4, 4), 100, dtype=np.uint8)
    payload = b"P5\n4 4\n255\n" + gray.tobytes()
    feats = codecs.media_features(payload, None, dims=4)
    # gray replicated to RGB: all three channel means are 100
    assert [round(float(f) * 255) for f in feats[:3]] == [100, 100, 100]


def test_ppm_maxval_over_255_rejected():
    with pytest.raises(ValueError, match="maxval"):
        codecs.decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)
