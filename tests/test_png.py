"""Pure-stdlib PNG codec: chunk walk + CRC verify, zlib inflate, the
five RFC 2083 scanline filters inverted per row, palette expansion,
and codec-independence of the perceptual pipeline (dHash of PNG(img)
== dHash of PPM(img) because both containers round-trip pixel values
exactly)."""

import hashlib
import zlib

import numpy as np
import pytest

from webcrawler_spark.operators.multimodal import (
    PNG_SIG,
    decode_image,
    decode_png,
    dhash_images,
    dhash_py,
    encode_png,
    encode_ppm,
    image_color_pixels,
    media_codec_features,
)


def _raw(seed: str, n: int) -> bytes:
    out = b"".join(
        hashlib.md5(f"{seed}:{j}".encode()).digest() for j in range(n // 16 + 1)
    )
    return bytes(b % 251 for b in out[:n])


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big") + ctype + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter_and_colortype(channels, filt):
    raw = _raw(f"rt{channels}", 9 * 10 * channels)
    d = decode_png(encode_png(raw, width=9, channels=channels, filters=filt))
    exp = np.frombuffer(raw, np.uint8).reshape(10, 9, channels)
    assert d["width"] == 9 and d["height"] == 10
    assert np.array_equal(d["pixels"], exp)


def test_roundtrip_mixed_filters_per_row():
    raw = _raw("mix", 9 * 10 * 3)
    d = decode_png(encode_png(raw, width=9, filters=[4, 3, 2, 1, 0]))
    assert np.array_equal(
        d["pixels"], np.frombuffer(raw, np.uint8).reshape(10, 9, 3)
    )


def test_palette_expands_to_rgb():
    pal = bytes(range(30))  # 10 colors
    idx = bytes([j % 10 for j in range(5 * 6)])
    lines = b"".join(b"\x00" + idx[r * 5 : (r + 1) * 5] for r in range(6))
    png = (
        PNG_SIG
        + _chunk(
            b"IHDR",
            (5).to_bytes(4, "big") + (6).to_bytes(4, "big")
            + bytes([8, 3, 0, 0, 0]),
        )
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )
    d = decode_png(png)
    assert d["pixels"].shape == (6, 5, 3)
    assert tuple(d["pixels"][0, 3]) == (9, 10, 11)


def test_crc_mismatch_raises():
    png = bytearray(encode_png(_raw("crc", 27 * 3), width=9))
    png[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_corrupt_deflate_drops_row_not_task(spark):
    good = encode_png(_raw("ok", 9 * 4 * 3), width=9)
    # replace the IDAT payload with garbage, CRC re-stamped so the
    # failure is zlib.error, not the CRC net
    bad = PNG_SIG + good[8 : 8 + 25] + _chunk(b"IDAT", b"nope") + _chunk(b"IEND", b"")
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))],
        "media_id long, content binary",
    )
    out = dhash_images(df).collect()
    assert [r["media_id"] for r in out] == [1]


def test_rejects():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope")
    ihdr16 = (
        PNG_SIG
        + _chunk(
            b"IHDR",
            (2).to_bytes(4, "big") + (2).to_bytes(4, "big")
            + bytes([16, 2, 0, 0, 0]),
        )
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(ihdr16)
    adam7 = (
        PNG_SIG
        + _chunk(
            b"IHDR",
            (2).to_bytes(4, "big") + (2).to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 1]),
        )
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(adam7)
    # JPEG sniffs into the real baseline decoder now (round 5): a
    # garbage body is a corrupt stream, not an unsupported codec
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xffjpegish")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxAVI junk")


def test_dhash_codec_independent():
    base = _raw("cross", 9 * 10 * 3)
    h_ppm = dhash_py(encode_ppm(base, width=9))
    h_png = dhash_py(encode_png(base, width=9, filters=[0, 1, 2, 3, 4]))
    assert h_ppm == h_png


def test_dhash_alpha_dropped():
    base = _raw("alpha", 9 * 10 * 3)
    rgba = b"".join(
        base[j * 3 : j * 3 + 3] + bytes([j % 256]) for j in range(9 * 10)
    )
    assert dhash_py(encode_png(rgba, width=9, channels=4, filters=2)) == dhash_py(
        encode_png(base, width=9, channels=3, filters=1)
    )
    px = image_color_pixels(decode_png(encode_png(rgba, 9, 4, 0)))
    assert px.shape == (10, 9, 3)


def test_codec_features_sniffs_png(spark):
    raw = _raw("feat", 9 * 4 * 3)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(raw, width=9))),
         (2, bytearray(encode_ppm(raw, width=9)))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in media_codec_features(df).collect()}
    assert rows[1]["kind"] == "image" and rows[1]["width"] == 9
    # identical pixels -> identical payload_md5 across containers
    assert rows[1]["payload_md5"] == rows[2]["payload_md5"]
