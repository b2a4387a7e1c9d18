"""Image-axis operators: decode/feature-extract, phash near-dup
banding, resize, frame-sample. Every Spark result is checked against
an INDEPENDENT numpy recompute (O(n²) where relevant), so correctness
does not lean on the operator's own code paths."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL
from volltextextraktion_selenium_md_spark import codec
from volltextextraktion_selenium_md_spark.operators import images
from volltextextraktion_selenium_md_spark.plans import queries as Q


def _hamming(a: int, b: int) -> int:
    return bin(((a ^ b) + (1 << 64)) % (1 << 64)).count("1")


def _ref_corpus(n=40, variants_every=3):
    """id -> (decoded pixels, fmt) recomputed here, not via the query."""
    ref = {}
    for k in range(n):
        arr = codec.synth_image(k)
        fmt = "png" if k % 2 == 0 else "jpeg"
        stored = codec.decode(codec.encode(arr, fmt))
        ref[f"img-{k}"] = (stored, fmt)
        if k % variants_every == 0:
            v = stored.copy()
            v[0, 0, 0] ^= 1
            ref[f"img-{k}-v"] = (v, "png")
    return ref


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [
        (iid, bytearray(codec.encode(arr, fmt)))
        for iid, (arr, fmt) in _ref_corpus().items()
    ]
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_image_features_matches_numpy(spark, corpus_df):
    ref = _ref_corpus()
    got = {r["image_id"]: r for r in images.image_features(corpus_df).collect()}
    assert set(got) == set(ref)
    for iid, (arr, fmt) in ref.items():
        r = got[iid]
        assert (r["w"], r["h"], r["fmt"]) == (arr.shape[1], arr.shape[0], fmt)
        assert r["phash"] == codec.average_hash(arr)


def test_image_features_drops_undecodable(spark):
    good = codec.encode(codec.synth_image(1), "png")
    df = spark.createDataFrame(
        [("ok", bytearray(good)), ("bad", bytearray(b"nope")), ("null", None)],
        "image_id string, bytes binary",
    )
    got = images.image_features(df).collect()
    assert [r["image_id"] for r in got] == ["ok"]


def test_phash_near_dup_matches_bruteforce(spark, corpus_df):
    """Every Hamming<=k pair the O(n²) numpy scan finds, the banded
    join finds — and nothing else. Variants sit within k of their base
    (near-dups exist), random bases don't (no false family)."""
    k = Q.PHASH_MAX_HAMMING
    ref = _ref_corpus()
    ph = {iid: codec.average_hash(arr) for iid, (arr, _) in ref.items()}
    ids = sorted(ph)
    expected = {
        (a, b, _hamming(ph[a], ph[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if _hamming(ph[a], ph[b]) <= k
    }
    got = {
        (r["image_a"], r["image_b"], r["hamming"])
        for r in images.phash_near_dup(
            images.image_features(corpus_df), max_hamming=k
        ).collect()
    }
    assert got == expected
    # the corpus genuinely contains near-dups (variant pairs) ...
    assert any(a.rstrip("-v") == b.rstrip("-v") for a, b, _ in got)
    # ... and no random base pair sneaks under k
    assert all("-v" in a or "-v" in b for a, b, _ in got)


def test_phash_near_dup_band_cover_is_exact():
    """The variable-width bands partition all 64 bits (band trick's
    exactness precondition when 64 % (k+1) != 0)."""
    for k in (1, 2, 3, 4, 6, 7):
        bands = k + 1
        base, rem = divmod(images.PHASH_BITS, bands)
        widths = [base + 1] * rem + [base] * (bands - rem)
        assert sum(widths) == 64 and min(widths) >= 1


def test_phash_near_dup_max_bucket_caps_degenerate_bucket(spark):
    """A degenerate bucket (many identical phashes) pairs only the
    max_bucket smallest ids — the all-pairs scale bound."""
    n, cap = 12, 4
    feats = spark.createDataFrame(
        [(f"id-{i:02d}", 0) for i in range(n)], "image_id string, phash long"
    )
    got = images.phash_near_dup(feats, max_hamming=4, max_bucket=cap).collect()
    survivors = {f"id-{i:02d}" for i in range(cap)}
    assert len(got) == cap * (cap - 1) // 2
    assert all(r["image_a"] in survivors and r["image_b"] in survivors for r in got)


def test_resize_images_matches_numpy(spark, corpus_df):
    ref = _ref_corpus()
    got = {r["image_id"]: r for r in images.resize_images(corpus_df, factor=2).collect()}
    assert set(got) == set(ref)
    for iid, (arr, _) in ref.items():
        h, w = arr.shape[0] // 2, arr.shape[1] // 2
        tiles = arr[: h * 2, : w * 2].reshape(h, 2, w, 2, 3)
        small = (tiles.astype(np.int64).sum(axis=(1, 3)) // 4).astype(np.uint8)
        r = got[iid]
        assert (r["w"], r["h"]) == (w, h)
        assert np.array_equal(codec.decode(bytes(r["bytes"])), small)  # bit-exact


def test_sample_frames_every_kth(spark):
    vids = [
        ("vid-0", codec.synth_frames(0, n_frames=7)),
        ("vid-1", codec.synth_frames(1, n_frames=4)),
    ]
    df = spark.createDataFrame(
        [(v, bytearray(codec.encode_frames(fs, "png"))) for v, fs in vids]
        + [("vid-bad", bytearray(b"RAWVgarbage")), ("vid-null", None)],
        "video_id string, bytes binary",
    )
    got = {}
    for r in images.sample_frames(df, every_k=3).collect():
        got.setdefault(r["video_id"], {})[r["frame_idx"]] = r
    assert set(got) == {"vid-0", "vid-1"}
    for vid, frames in vids:
        want_idx = [i for i in range(len(frames)) if i % 3 == 0]
        assert sorted(got[vid]) == want_idx
        for i in want_idx:
            r = got[vid][i]
            assert np.array_equal(codec.decode(bytes(r["frame"])), frames[i])
            assert (r["w"], r["h"]) == (frames[i].shape[1], frames[i].shape[0])


def test_image_features_closes_loop_with_crawled_payloads(spark):
    """Crawl -> payload table -> image_features(bytes) reproduces the
    stored w/h/fmt/phash columns exactly: the feature extractor and the
    engine's convert-stage decode agree on every real crawled image."""
    from volltextextraktion_selenium_md_spark.plans.frontier import CrawlEngine

    res = CrawlEngine(spark, SF_SMALL, with_convert=True).run()
    assert res.payloads is not None
    stored = {r["image_id"]: r for r in res.payloads.collect()}
    assert stored
    recomputed = images.image_features(
        res.payloads.select("image_id", "bytes")
    ).collect()
    assert {r["image_id"] for r in recomputed} == set(stored)
    for r in recomputed:
        s = stored[r["image_id"]]
        assert (r["w"], r["h"], r["fmt"], r["phash"]) == (
            s["w"], s["h"], s["fmt"], s["phash"]
        )


def test_query_wrappers_run_at_sf_small(spark):
    feats = Q.q_image_features(spark, SF_SMALL)
    pairs = Q.q_phash_near_dup(spark, SF_SMALL)
    nf = feats.count()
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id").collect()
    ]
    # one image per doc + a variant for every IMG_VARIANT_EVERY-th doc
    n_variants = sum(1 for d in doc_ids if int(d) % Q.IMG_VARIANT_EVERY == 0)
    assert nf == len(doc_ids) + n_variants
    rows = pairs.collect()
    assert rows, "corpus must contain near-dup variants"
    assert all(r["hamming"] <= Q.PHASH_MAX_HAMMING for r in rows)