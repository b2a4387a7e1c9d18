"""Probe: where does the cosine/LSH family's EXECUTION slice go?

Times noop-sink isolation (guide §1.4) of the pipeline pieces:
with_norm, lsh_banded signatures, and the full operators, at sf0.1.
Read-only probe; nothing in the engine changes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.session import get_spark
from volltextextraktion_selenium_md_spark.operators import simsearch
from volltextextraktion_selenium_md_spark.plans import queries as Q

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        noop(fn())
        walls.append(round(time.monotonic() - t0, 3))
    print(f"{label}: {walls}")


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("WARN")
    emb = Q._embs(spark, SF)
    n = emb.count()
    print(f"embeddings rows: {n}")

    t("scan only", lambda: emb.select("vec_id", "embedding"))
    t("with_norm", lambda: simsearch.with_norm(emb))
    t("lsh_banded 6x4 (near-dup planes)", lambda: simsearch.lsh_banded(
        emb.select("vec_id", "embedding"), 6, 64, 4))
    t("lsh_banded 4x8 (topk tables)", lambda: simsearch.lsh_banded(
        emb.select("vec_id", "embedding"), 4, 64, 8))
    t("embedding_near_dup full", lambda: Q.q_embedding_near_dup(spark, SF))
    t("cosine_topk_lsh full", lambda: Q.q_cosine_topk_lsh(spark, SF))
    t("cosine_topk full", lambda: Q.q_cosine_topk(spark, SF))
    spark.stop()


if __name__ == "__main__":
    main()
