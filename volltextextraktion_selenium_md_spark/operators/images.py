"""Image-axis operators over binary payload columns.

The multimodal contract (BASELINE.json input_hint: image payload rows
with ``bytes``/``w``/``h``/``fmt``/``phash``) gets the full
training-data-pipeline treatment here:

- ``image_features``: decode + feature-extract (w/h/fmt + 64-bit
  perceptual average-hash) over the raw ``binary`` column, one
  Arrow-batched ``mapInPandas`` pass. Undecodable payloads emit no row
  (same containment rule as the convert stage).
- ``phash_near_dup``: near-duplicate IMAGES by perceptual-hash Hamming
  distance ≤ k — the image twin of ``dedup.simhash_dup_pairs``, found
  with the same exact band trick (k+1 bit-bands of the 64-bit hash; a
  pair within distance k must agree on ≥1 whole band) and the same
  per-(band, bucket) ``max_bucket`` rank cut so a degenerate bucket
  can never go quadratic at the 100 TB design point.
- ``resize_images``: block-mean downsample + lossless re-encode
  (the task's "resize" step), Arrow-batched.
- ``sample_frames``: every-k-th-frame extraction from a multi-frame
  container (the task's "frame-sample" step) — the container codec is
  the deterministic stand-in from ``codec.py`` (no video libs in the
  sandbox; the Spark-side schema/partitioning/batch shape is real).

All Python stages are Arrow-batched ``mapInPandas`` kernels (never
row-at-a-time UDFs); the pairing join is a pure DataFrame composition,
so the only shuffle is the banded self-join on well-distributed
(band, bucket) keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark import codec

PHASH_BITS = 64

IMAGE_FEATURES_SCHEMA = "image_id string, w int, h int, fmt string, phash long"


def image_features(
    payloads: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Decode every payload and extract (w, h, fmt, phash) from the
    PIXELS — the feature-extraction kernel a 100 TB image corpus runs
    before phash dedup / quality filtering. One Arrow-batched pass;
    rows whose bytes don't decode are dropped (containment, mirroring
    ``codec.payload_row_from_bytes``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"image_id": [], "w": [], "h": [], "fmt": [], "phash": []}
            for iid, raw in zip(pdf[id_col], pdf[bytes_col]):
                if raw is None:
                    continue
                try:
                    arr = codec.decode(bytes(raw))
                except Exception:
                    continue
                out["image_id"].append(iid)
                out["w"].append(arr.shape[1])
                out["h"].append(arr.shape[0])
                out["fmt"].append("png" if bytes(raw)[:4] == codec._MAGIC_LOSSLESS else "jpeg")
                out["phash"].append(codec.average_hash(arr))
            yield pd.DataFrame(out)

    return payloads.select(
        F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes")
    ).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def phash_near_dup(
    features: DataFrame, max_hamming: int = 4, max_bucket: int = 64
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance
    ≤ k over a (image_id, phash) relation (e.g. the payload table, or
    ``image_features`` output).

    Band trick, exact for ≤ k: the 64-bit hash splits into (k+1)
    contiguous bit-bands (widths differ by ≤1 bit when 64 % (k+1) != 0
    — the wider bands come first); a pair with ≤ k differing bits must
    match on at least one whole band, so the equi-join on
    (band, bucket) finds every qualifying pair. Per (band, bucket) only
    the ``max_bucket`` lexicographically-smallest image_ids pair up
    (one deterministic rank window — the same scale bound as
    ``dedup.minhash_lsh_pairs`` / ``simhash_dup_pairs``): a degenerate
    bucket of K images costs ≤ max_bucket²/2 candidates instead of
    K²/2; oversized near-dup components belong in a cluster operator
    (``dedup.minhash_lsh_clusters`` pattern), not an exhaustive pair
    list."""
    bands = max_hamming + 1
    base, rem = divmod(PHASH_BITS, bands)
    widths = [base + 1] * rem + [base] * (bands - rem)
    fe = features.select("image_id", "phash").cache()
    # arithmetic shift + mask == unsigned band key for every band incl.
    # the sign-bit-bearing top one (simhash parity). One projection +
    # posexplode (pos == band) replaces the bands-way union over the
    # cached features — identical rows, one scan instead of `bands`
    # (guide §2.4)
    band_keys = []
    offset = 0
    for width in widths:
        band_keys.append(
            F.shiftright(F.col("phash"), offset)
            .bitwiseAND(F.lit((1 << width) - 1))
        )
        offset += width
    banded = fe.select(
        "image_id", "phash",
        F.posexplode(F.array(*band_keys)).alias("band", "bucket"),
    )
    wb = Window.partitionBy("band", "bucket").orderBy("image_id")
    capped = (
        banded.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    cand = (
        capped.alias("x")
        .join(capped.alias("y"), ["band", "bucket"])
        .filter(F.col("x.image_id") < F.col("y.image_id"))
        .select(
            F.col("x.image_id").alias("image_a"),
            F.col("y.image_id").alias("image_b"),
            F.col("x.phash").alias("ph_a"),
            F.col("y.phash").alias("ph_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("image_a", "image_b", "hamming")
    )


RESIZE_SCHEMA = "image_id string, w int, h int, bytes binary"


def resize_images(
    payloads: DataFrame,
    factor: int = 2,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Downsample every image by an integer ``factor`` (block mean of
    each factor×factor tile, floor division — fully deterministic) and
    re-encode losslessly. Edges not covered by a whole tile are
    cropped (h,w truncate to multiples of ``factor``). Undecodable or
    too-small payloads are dropped."""
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {"image_id": [], "w": [], "h": [], "bytes": []}
            for iid, raw in zip(pdf[id_col], pdf[bytes_col]):
                if raw is None:
                    continue
                try:
                    arr = codec.decode(bytes(raw))
                except Exception:
                    continue
                h, w = arr.shape[0] // factor, arr.shape[1] // factor
                if h == 0 or w == 0:
                    continue
                tiles = arr[: h * factor, : w * factor].reshape(
                    h, factor, w, factor, arr.shape[2]
                )
                small = (
                    tiles.astype(np.int64).sum(axis=(1, 3)) // (factor * factor)
                ).astype(np.uint8)
                out["image_id"].append(iid)
                out["w"].append(w)
                out["h"].append(h)
                out["bytes"].append(codec.encode(small, "png"))
            yield pd.DataFrame(out)

    return payloads.select(
        F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes")
    ).mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "video_id string, frame_idx int, w int, h int, frame binary"


def sample_frames(
    videos: DataFrame,
    every_k: int = 2,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Explode multi-frame containers (``codec.encode_frames``) into
    every k-th frame, each re-emitted as a standalone encoded image —
    the task's "frame-sample" step for video columns. The container
    parse streams frame-by-frame (never materializing all frames), so
    per-row memory is one frame regardless of clip length. Unparseable
    containers are dropped."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "video_id": [], "frame_idx": [], "w": [], "h": [], "frame": []
            }
            for vid, raw in zip(pdf[id_col], pdf[bytes_col]):
                if raw is None:
                    continue
                try:
                    for idx, frame_bytes in codec.iter_frames(bytes(raw)):
                        if idx % every_k:
                            continue
                        arr = codec.decode(frame_bytes)
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["w"].append(arr.shape[1])
                        out["h"].append(arr.shape[0])
                        out["frame"].append(frame_bytes)
                except Exception:
                    continue
            yield pd.DataFrame(out)

    return videos.select(
        F.col(id_col).alias("video_id"), F.col(bytes_col).alias("bytes")
    ).mapInPandas(run, schema=FRAME_SCHEMA)
