"""Audio spectral fingerprint: exact gain invariance (the oracle
property), discrimination, planted-copy pairs, reject handling."""

import hashlib

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.multimodal import (
    audio_fingerprint_py,
    audio_fingerprints,
    audio_near_pairs,
    encode_wav,
)


def _samples(seed: str) -> bytes:
    raw = b"".join(
        hashlib.md5(f"{seed}:{j}".encode()).digest() for j in range(32)
    )
    # center 128, even offsets in [-120, 120] so the half-gain copy is
    # integer-exact (the invariance proof needs exactly-representable
    # halving)
    return bytes(128 + 2 * ((b % 120) - 60) for b in raw)


def _half_gain(samples: bytes) -> bytes:
    return bytes(128 + (s - 128) // 2 for s in samples)


def test_gain_invariance_exact():
    s = _samples("docA")
    assert audio_fingerprint_py(encode_wav(s)) == audio_fingerprint_py(
        encode_wav(_half_gain(s))
    )


def test_discriminates():
    fps = {audio_fingerprint_py(encode_wav(_samples(f"d{i}"))) for i in range(50)}
    assert len(fps) == 50


def test_near_pairs_find_planted_copies(spark):
    rows = []
    for i in range(30):
        s = _samples(f"d{i}")
        rows.append((i, bytearray(encode_wav(s))))
        if i % 10 == 0:
            rows.append((i + 1000, bytearray(encode_wav(_half_gain(s)))))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = sorted(
        (r["a"], r["b"], r["hamming"]) for r in audio_near_pairs(media).collect()
    )
    assert got == [(0, 1000, 0), (10, 1010, 0), (20, 1020, 0)]


def test_undecodable_and_wrong_format_dropped(spark):
    s = _samples("x")
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(s))),
            (2, bytearray(b"not a wav at all")),
        ],
        "media_id long, content binary",
    )
    got = audio_fingerprints(media).collect()
    assert [r["media_id"] for r in got] == [1]


def test_too_short_rejected():
    with pytest.raises(ValueError):
        audio_fingerprint_py(encode_wav(b"\x80\x80"))
