"""Lakehouse landing: snapshot checkpoints + MERGE INTO upserts.

The north rule lands payloads in an Iceberg table via MERGE INTO and
resumes crawls from Iceberg snapshot checkpoints. This container has no
Iceberg runtime jars, so this module implements the same contract on
plain parquet with Iceberg's commit discipline:

- **versioned snapshots**: every commit writes a new `v{N}` directory
  (immutable data files) and publishes it by writing `manifest.json`
  LAST via atomic rename — readers never see a half-written snapshot,
  exactly like Iceberg's metadata-pointer swap. Time travel = read any
  older vN.
- **MERGE INTO emulation**: copy-on-write upsert — target rows whose key
  appears in the batch are replaced, everything else re-written
  unchanged (Iceberg COW `MERGE INTO t USING b ON t.k = b.k WHEN
  MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`).
- **filter state**: the URL-seen Bloom/Cuckoo filter bytes are stored
  inside the snapshot directory so a resume does not rescan history to
  rebuild membership state (SURVEY §7 M6).

On a real cluster, swap `SnapshotStore` for `df.writeTo(tbl)` /
`MERGE INTO` SQL against an Iceberg catalog; the engine call sites are
shaped for that (commit-per-round, key-equality merge).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """Versioned snapshot directory: `<root>/v{N}/<table>.parquet` plus
    `<root>/v{N}/manifest.json` (written last, atomically)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- versions ----------------------------------------------------
    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                if os.path.exists(os.path.join(self.root, name, "manifest.json")):
                    out.append(int(name[1:]))
        return sorted(out)

    def latest(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version}")

    # -- commit ------------------------------------------------------
    def commit(
        self,
        tables: dict[str, DataFrame],
        meta: dict,
        blobs: dict[str, bytes] | None = None,
    ) -> int:
        """Write all tables + blobs, then publish the manifest last."""
        version = (self.latest() or 0) + 1
        vdir = self._vdir(version)
        os.makedirs(vdir, exist_ok=True)
        written = []
        for name, df in tables.items():
            path = os.path.join(vdir, f"{name}.parquet")
            df.write.mode("overwrite").parquet(path)
            written.append(name)
        blob_names = []
        for name, raw in (blobs or {}).items():
            with open(os.path.join(vdir, f"{name}.bin"), "wb") as f:
                f.write(raw)
            blob_names.append(name)
        manifest = {"version": version, "tables": written, "blobs": blob_names,
                    "meta": meta}
        fd, tmp = tempfile.mkstemp(dir=vdir, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, os.path.join(vdir, "manifest.json"))  # publish
        return version

    # -- read --------------------------------------------------------
    def manifest(self, version: int | None = None) -> dict:
        v = self.latest() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshot under {self.root}")
        with open(os.path.join(self._vdir(v), "manifest.json")) as f:
            return json.load(f)

    def read(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame:
        v = self.latest() if version is None else version
        return spark.read.parquet(os.path.join(self._vdir(v), f"{name}.parquet"))

    def read_blob(self, name: str, version: int | None = None) -> bytes:
        v = self.latest() if version is None else version
        with open(os.path.join(self._vdir(v), f"{name}.bin"), "rb") as f:
            return f.read()

    def expire_snapshots(self, keep_last: int = 2) -> None:
        """Iceberg `expireSnapshots` analogue: drop all but the newest K."""
        vs = self.versions()
        for v in vs[:-keep_last] if keep_last else vs:
            shutil.rmtree(self._vdir(v), ignore_errors=True)


def merge_into(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    key: str,
) -> int:
    """Copy-on-write MERGE INTO: upsert `batch` into the parquet table at
    `target_dir` on `key` equality. Returns the new row count.

    Equivalent SQL (Iceberg): MERGE INTO target t USING batch b
    ON t.key = b.key WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    THEN INSERT *. Implemented as anti-join + union + atomic swap —
    at 10^10 scale this becomes a real Iceberg COW/ MOR commit; the
    call-site contract (key-equality upsert, atomic publish) is the same.
    """
    if os.path.exists(target_dir):
        target = spark.read.parquet(target_dir)
        keep = target.join(batch.select(key).distinct(), on=key, how="left_anti")
        merged = keep.unionByName(batch.select(*target.columns))
    else:
        merged = batch
    tmp = target_dir.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(tmp)
    out = target_dir.rstrip("/") + ".old"
    if os.path.exists(target_dir):
        os.rename(target_dir, out)
    os.rename(tmp, target_dir)
    shutil.rmtree(out, ignore_errors=True)
    n = spark.read.parquet(target_dir).count()
    return n
