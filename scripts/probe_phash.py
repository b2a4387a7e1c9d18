"""Probe: phash_near_dup warm-rep anatomy (round-7 follow-up).

Times the current operator vs a filter-before-distinct variant over the
same bench corpus, and counts the candidate rows entering the distinct
exchange in each shape. Read-only probe; bench.py untouched.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window

from volltextextraktion_selenium_md_spark.session import get_spark
from volltextextraktion_selenium_md_spark.plans import queries as Q
from volltextextraktion_selenium_md_spark.operators import images

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def phash_near_dup_v2(features, max_hamming=4, max_bucket=64):
    """Same banding, hamming filter BEFORE the distinct."""
    bands = max_hamming + 1
    base, rem = divmod(images.PHASH_BITS, bands)
    widths = [base + 1] * rem + [base] * (bands - rem)
    fe = features.select("image_id", "phash").cache()
    band_keys = []
    offset = 0
    for width in widths:
        band_keys.append(
            F.shiftright(F.col("phash"), offset).bitwiseAND(F.lit((1 << width) - 1))
        )
        offset += width
    banded = fe.select(
        "image_id", "phash", F.posexplode(F.array(*band_keys)).alias("band", "bucket")
    )
    wb = Window.partitionBy("band", "bucket").orderBy("image_id")
    capped = (
        banded.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    hamming = F.bit_count(F.col("x.phash").bitwiseXOR(F.col("y.phash")))
    return (
        capped.alias("x")
        .join(capped.alias("y"), ["band", "bucket"])
        .filter(F.col("x.image_id") < F.col("y.image_id"))
        .select(
            F.col("x.image_id").alias("image_a"),
            F.col("y.image_id").alias("image_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("WARN")

    feats = images.image_features(Q._image_corpus(spark, SF))
    n_img = feats.count()
    print(f"images: {n_img}")

    # candidate volume entering the distinct, current shape
    fe = feats.select("image_id", "phash")
    bands = Q.PHASH_MAX_HAMMING + 1
    base, rem = divmod(64, bands)
    widths = [base + 1] * rem + [base] * (bands - rem)
    bk, off = [], 0
    for w in widths:
        bk.append(F.shiftright(F.col("phash"), off).bitwiseAND(F.lit((1 << w) - 1)))
        off += w
    banded = fe.select("image_id", "phash", F.posexplode(F.array(*bk)).alias("band", "bucket"))
    wb = Window.partitionBy("band", "bucket").orderBy("image_id")
    capped = (
        banded.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= Q.PHASH_MAX_BUCKET).drop("_rn")
    )
    n_cand = (
        capped.alias("x").join(capped.alias("y"), ["band", "bucket"])
        .filter(F.col("x.image_id") < F.col("y.image_id")).count()
    )
    print(f"candidate rows entering distinct (current shape): {n_cand}")

    # timing: 3 reps each, fresh construction per rep (bench methodology)
    for name, fn in [
        ("current", lambda f: images.phash_near_dup(f, Q.PHASH_MAX_HAMMING, Q.PHASH_MAX_BUCKET)),
        ("v2_filter_first", lambda f: phash_near_dup_v2(f, Q.PHASH_MAX_HAMMING, Q.PHASH_MAX_BUCKET)),
    ]:
        times = []
        for rep in range(3):
            t0 = time.monotonic()
            f = images.image_features(Q._image_corpus(spark, SF))
            df = fn(f)
            noop(df)
            times.append(round(time.monotonic() - t0, 3))
        print(f"{name}: reps {times}")

    # equality of results
    cur = images.phash_near_dup(
        images.image_features(Q._image_corpus(spark, SF)), Q.PHASH_MAX_HAMMING, Q.PHASH_MAX_BUCKET
    )
    v2 = phash_near_dup_v2(
        images.image_features(Q._image_corpus(spark, SF)), Q.PHASH_MAX_HAMMING, Q.PHASH_MAX_BUCKET
    )
    d1 = cur.exceptAll(v2).count()
    d2 = v2.exceptAll(cur).count()
    print(f"exceptAll cur-v2={d1} v2-cur={d2} (both 0 == identical multisets)")
    spark.stop()


if __name__ == "__main__":
    main()
