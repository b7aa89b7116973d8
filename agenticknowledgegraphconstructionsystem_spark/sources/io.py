"""Storage shim: Iceberg-like staged commits over parquet (SURVEY §7 item 6).

The real-cluster deployment writes Iceberg tables (``MERGE INTO``, atomic
snapshot commits, ``bucket(N, url)`` partitioning).  This sandbox has no
Iceberg jars, so the same commit semantics are provided over parquet plus a
sidecar ``_manifest.json``:

* a stage is **committed** iff its manifest exists (written strictly after
  the parquet data lands → crash between data and manifest = uncommitted,
  the stage reruns — same contract as an Iceberg snapshot),
* ``merge_by_key`` gives MERGE/upsert semantics (latest-wins by an explicit
  deterministic ordering column — never arrival order).

Keep this interface thin so the Iceberg path is a drop-in on a real
cluster.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


#: real-cluster DDL the shim stands in for (SURVEY §2.1 S13: indexes →
#: bucketed partitioning + min/max file pruning; views → saved DataFrames)
ICEBERG_DDL = {
    "pages": """
        CREATE TABLE kg.pages (
          url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
        USING iceberg PARTITIONED BY (bucket(1024, url))""",
    "mentions": """
        CREATE TABLE kg.mentions (
          url STRING, name STRING, concept_type STRING,
          relevance_pct INT, pos INT, context STRING)
        USING iceberg PARTITIONED BY (bucket(1024, url))""",
    "entities": """
        CREATE TABLE kg.entities (
          entity_id BIGINT, name STRING, concept_type STRING,
          mention_count BIGINT, sum_relevance_pct BIGINT,
          max_relevance_pct INT, min_relevance_pct INT)
        USING iceberg PARTITIONED BY (bucket(64, name))""",
    "merge_docs": """
        MERGE INTO kg.docs t USING updates s ON t.url = s.url
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""",
}


class StageStore:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def _manifest(self, stage: str) -> str:
        return os.path.join(self.base_dir, f"{stage}._manifest.json")

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(self._manifest(stage))

    def manifest(self, stage: str) -> dict:
        with open(self._manifest(stage)) as f:
            return json.load(f)

    def commit(self, stage: str, df: DataFrame, run_id: str, meta: dict | None = None) -> DataFrame:
        """Write stage output, then atomically mark committed via manifest."""
        t0 = time.time()
        df.write.mode("overwrite").parquet(self._path(stage))
        out = self.spark.read.parquet(self._path(stage))
        n = out.count()
        manifest = {
            "stage": stage,
            "run_id": run_id,
            "rows": n,
            "wall_ms": int((time.time() - t0) * 1000),
            "committed_at": time.time(),
            **(meta or {}),
        }
        tmp = self._manifest(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest(stage))
        return out

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def uncommit(self, stage: str) -> None:
        """Test hook: simulate a crash after stage k (delete the commit)."""
        if os.path.exists(self._manifest(stage)):
            os.remove(self._manifest(stage))


def merge_by_key(
    current: DataFrame, incoming: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """Iceberg ``MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``
    (database_utils.py:109-113 upsert semantics) as a window dedup:
    union → keep the row with the highest order_col per key (deterministic
    tie-break on remaining columns is the caller's duty via order_col)."""
    unioned = current.unionByName(incoming, allowMissingColumns=False)
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return unioned.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def resume_inputs(inputs: DataFrame, committed: DataFrame, key: str) -> DataFrame:
    """J7 anti-join resume (database.ts:66-81): rows whose key already
    appears in committed output are skipped."""
    return inputs.join(committed.select(key).distinct(), key, "left_anti")
