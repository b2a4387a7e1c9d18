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
