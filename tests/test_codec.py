"""Payload codec invariants (BASELINE.json input_hint): lossless
bit-exactness, lossy PSNR >= 40 dB, caption equality, phash stability."""

from __future__ import annotations

import numpy as np

from volltextextraktion_selenium_md_spark import codec


def test_lossless_roundtrip_bit_exact():
    for key in range(20):
        arr = codec.synth_image(key)
        out = codec.decode(codec.encode(arr, "png"))
        assert np.array_equal(arr, out)


def test_lossy_psnr_above_40db():
    for key in range(20):
        arr = codec.synth_image(key)
        out = codec.decode(codec.encode(arr, "jpeg"))
        assert codec.psnr(arr, out) >= 40.0, key


def test_caption_deterministic():
    assert codec.synth_caption(7) == codec.synth_caption(7)
    assert codec.synth_caption(7) != codec.synth_caption(8)


def test_payload_row_shape_and_determinism():
    a = codec.make_payload_row(11)
    b = codec.make_payload_row(11)
    assert a == b
    assert set(a) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
    assert a["fmt"] == "jpeg" and codec.make_payload_row(10)["fmt"] == "png"
    assert isinstance(a["phash"], int)


def test_phash_similar_images_close():
    arr = codec.synth_image(3)
    noisy = arr.copy()
    noisy[0, 0] = 255 - noisy[0, 0]
    d = bin(
        (codec.average_hash(arr) & (2**64 - 1)) ^ (codec.average_hash(noisy) & (2**64 - 1))
    ).count("1")
    assert d <= 4  # tiny perturbation barely moves the hash


def test_payload_row_from_bytes_live_decode():
    """Live-mode payload rows derive from the REAL fetched bytes:
    verbatim bytes column, w/h/fmt/phash from the decoded pixels,
    lossless round-trip bit-exact, None on undecodable payloads."""
    arr = codec.synth_image(21, w=48, h=32)
    raw = codec.encode(arr, "png")
    p = codec.payload_row_from_bytes(9001, raw)
    assert p is not None
    assert p["bytes"] == raw  # stored verbatim, no re-encode
    assert (p["w"], p["h"], p["fmt"]) == (48, 32, "png")
    assert np.array_equal(codec.decode(p["bytes"]), arr)
    assert p["phash"] == codec.average_hash(arr)
    assert p["image_id"] == "img-9001"
    assert p["caption"] == codec.synth_caption(9001)

    lossy = codec.payload_row_from_bytes(7, codec.encode(arr, "jpeg"))
    assert lossy is not None and lossy["fmt"] == "jpeg"
    assert codec.psnr(arr, codec.decode(lossy["bytes"])) >= 40.0

    # corrupt / truncated payloads emit no row (error containment)
    assert codec.payload_row_from_bytes(1, b"\x89PNG not really") is None
    assert codec.payload_row_from_bytes(2, raw[: len(raw) // 2]) is None
    assert codec.payload_row_from_bytes(3, b"") is None
