"""URL-seen set: exact anti-join correctness path + filter fast path.

The reference has NO global seen set — re-POSTing a URL refetches it;
dedup exists only per-page (``app/utils.py:48-55``). The north rule
adds the global set. Design:

- `seen` state = DataFrame (url, h1, h2), hash-partitioned by h1 and
  persisted across rounds; h1/h2 are xxhash64 with two seeds, computed
  JVM-side.
- `filter_unseen` = left_anti join on `url` — exact, shuffle-hash,
  scales linearly (both sides partitioned on the same key).
- optional Bloom prefilter built DISTRIBUTEDLY (per-partition numpy
  blooms OR-merged via treeReduce) and applied in `mapInPandas`; it
  removes the bulk of already-seen candidates before the anti-join
  shuffle. At 10^10 URLs the bloom is sharded per partition
  (filters.py docstring); here one merged filter suffices.
- a CuckooFilter mirror supports deletes (permanently-failed rows can
  be evicted on resume) and serializes into the checkpoint directory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.functions.urls import url_hash, url_hash2
from volltextextraktion_selenium_md_spark.operators.filters import BloomFilter


def with_hashes(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("h1", url_hash(url_col)).withColumn("h2", url_hash2(url_col))


def build_bloom(seen: DataFrame, n_items: int, fp_rate: float = 0.01) -> BloomFilter:
    """Distributed bloom build: one numpy bloom per partition, OR-merged
    with treeReduce (driver receives a single bitset, never the keys)."""
    m_probe = BloomFilter(n_items, fp_rate)  # fixes (m, k) for all partials

    def partial(rows: Iterator) -> Iterator[bytes]:
        bf = BloomFilter.__new__(BloomFilter)
        bf.m, bf.k = m_probe.m, m_probe.k
        import numpy as np

        bf.bits = np.zeros_like(m_probe.bits)
        h1s, h2s = [], []
        for r in rows:
            h1s.append(r["h1"])
            h2s.append(r["h2"])
        if h1s:
            bf.add(np.asarray(h1s, dtype=np.int64), np.asarray(h2s, dtype=np.int64))
        yield bf.to_bytes()

    partials = seen.select("h1", "h2").rdd.mapPartitions(partial)
    merged = partials.treeReduce(
        lambda a, b: BloomFilter.from_bytes(a).union(BloomFilter.from_bytes(b)).to_bytes()
    )
    return BloomFilter.from_bytes(merged)


def bloom_prefilter(candidates: DataFrame, bloom: BloomFilter) -> DataFrame:
    """Drop candidates the bloom says are definitely-unseen? No —
    inverse: keep rows the bloom does NOT contain (definitely new) plus
    rows it claims seen go to the exact join. Here we split: rows not
    in bloom are guaranteed unseen and BYPASS the anti-join shuffle;
    the (small) maybe-seen remainder joins exactly.

    Returns (definitely_new, maybe_seen)."""
    blob = bloom.to_bytes()
    spark = candidates.sparkSession
    b_blob = spark.sparkContext.broadcast(blob)
    cols = candidates.columns

    def mark(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter.from_bytes(b_blob.value)
        for pdf in batches:
            hit = bf.contains(pdf["h1"].to_numpy(), pdf["h2"].to_numpy())
            pdf = pdf.copy()
            pdf["maybe_seen"] = hit
            yield pdf

    import pyspark.sql.types as T

    schema = T.StructType(
        list(candidates.schema.fields)
        + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    marked = candidates.mapInPandas(mark, schema=schema)
    return (
        marked.filter(~F.col("maybe_seen")).select(*cols),
        marked.filter(F.col("maybe_seen")).select(*cols),
    )


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """Exact unseen filter; bloom only reroutes definitely-new rows
    around the shuffle (false negatives impossible, so no unseen row is
    ever dropped; false positives just take the join path)."""
    if bloom is None:
        return candidates.join(seen.select("url"), on="url", how="left_anti")
    definitely_new, maybe_seen = bloom_prefilter(candidates, bloom)
    checked = maybe_seen.join(seen.select("url"), on="url", how="left_anti")
    return definitely_new.unionByName(checked)
