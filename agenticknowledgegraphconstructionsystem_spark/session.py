"""SparkSession factory tuned for the KG-construction workload.

Design notes for the 100 TB target (tested on local[N]):
* AQE on — runtime coalescing + skew-join splitting cover the shuffle-heavy
  stages (entity aggregation, shared-concept self-join).
* Arrow on — every per-row stage is a pandas UDF / mapInArrow; Arrow batch
  size capped so a batch of 80k-char documents stays well under executor
  memory.
* shuffle.partitions defaults to 2× cores locally; on a real cluster set it
  to ~2-3× total executor cores (or rely on AQE coalescing from a high
  initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def cut_lineage(
    df: DataFrame, eager: bool = True, preserve_partitioning: bool = False
) -> DataFrame:
    """Truncate ``df``'s lineage for iterative algorithms (PageRank /
    connected-components rounds, triangle-edge reuse, incremental deltas).

    Dispatch: when the SparkContext has a checkpoint directory configured
    (``sc.setCheckpointDir("hdfs://…")`` — the cluster deployment mode),
    use a RELIABLE ``checkpoint`` whose blocks live in fault-tolerant
    storage and survive executor loss; otherwise fall back to
    ``localCheckpoint``, whose blocks are executor-local (fine on
    local[k], where losing "an executor" is losing the whole JVM anyway).
    On a 1000-executor run of the O(log d) pointer-jumping loop, a single
    lost executor under localCheckpoint kills the job — reliable
    checkpoints make each round restartable from storage instead.

    ``preserve_partitioning``: under AQE, a checkpoint's LogicalRDD
    captures UnknownPartitioning (the AdaptiveSparkPlanExec hides the
    final plan's outputPartitioning), so every downstream consumer
    re-shuffles — the silent killer of exchange reuse across loop
    iterations (measured: the co-partitioned pagerank join re-exchanged
    BOTH checkpointed sides).  Setting this flag materializes the
    checkpoint with AQE disabled for just that job, so the LogicalRDD
    carries the real HashPartitioning and AQE-on consumers read it
    exchange-free (verified both directions).  Use it when the cut
    output's partitioning is deliberately pinned (explicit
    ``repartition(n, key)``) for reuse; leave it off where AQE's runtime
    re-planning of the producing job matters more.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    restore: str | None = None
    if preserve_partitioning:
        restore = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        if sc.getCheckpointDir() is not None:
            return df.checkpoint(eager)
        return df.localCheckpoint(eager)
    finally:
        if restore is not None:
            spark.conf.set("spark.sql.adaptive.enabled", restore)


#: rows per spread partition (env ``SPARK_GRAFT_SPREAD_ROWS``): sized so a
#: compute-heavy per-row stage (mention detection, shingling) gets full
#: core utilization at 10x-gate scale while a tiny input skips the
#: exchange entirely — the scale-adaptive middle ground between "always
#: repartition to 2x cores" (pure overhead at sf<=0.1: measured +0.7 s on
#: td_dedup_rate, +2.5 s on td_emb_near_dup) and "never" (single-task
#: scans at sf1: measured 7.8 s mention detection on one core).
SPREAD_ROWS_PER_PART = int(os.environ.get("SPARK_GRAFT_SPREAD_ROWS", "512"))


def _scan_rows(df: DataFrame) -> int | None:
    """Total parquet rows behind ``df``'s scan, from file footers on the
    driver (no Spark job).  None when the inputs are not local parquet
    files — callers fall back to the full shuffle-partition spread."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        from urllib.parse import unquote, urlparse

        import pyarrow.parquet as pq

        total = 0
        for f in files:
            u = urlparse(f)
            if u.scheme not in ("file", ""):
                return None
            total += pq.ParquetFile(unquote(u.path)).metadata.num_rows
        return total
    except Exception:
        return None


def spread_scan(df: DataFrame, *key_cols: str, nparts: int | None = None) -> DataFrame:
    """Restore parallelism lost to unsplittable input layout.

    The corpus parquet files ship as a SINGLE row group per file (verified
    with pyarrow at every sf), so Spark's split machinery caps the scan —
    and therefore every per-row stage fused above the first exchange
    (shingling, mention detection, simhash folds, repetition profiles) —
    at ONE task regardless of ``maxPartitionBytes`` / ``minPartitionNum``
    (a split only does work when a row-group midpoint falls inside it).
    The guide's remedy for unsplittable inputs is to repartition right
    after the read: one cheap exchange of the raw rows buys every
    downstream map stage full parallelism.

    The partition count is SCALE-ADAPTIVE (guide §2: derive partitioning
    from input size, never a constant tuned for one scale): ceil(rows /
    SPREAD_ROWS_PER_PART) capped at the session's shuffle partitions,
    with the row count read from the parquet footers on the driver (no
    job).  A small input (<= one partition's worth) skips the exchange
    outright — the fixed 2x-cores spread was measured pure overhead at
    gate scale (+0.5-2.5 s per query at sf0.1) while the same spread is
    a 10x win at sf1.  Unknown layouts (non-local / non-parquet) take
    the full spread, matching the pre-adaptive behavior.

    Hash-repartition on deterministic key columns, never round-robin:
    a keyed exchange skips the sort-before-repartition pass that
    round-robin pays for retry-stability, and the explicit numPartitions
    is never AQE-coalesced.  ``SPARK_GRAFT_SCAN_SPREAD=0`` disables it
    for deployments whose inputs are already well-laid-out (many row
    groups / many files), where the extra exchange is pure cost.
    """
    if os.environ.get("SPARK_GRAFT_SCAN_SPREAD", "1") == "0":
        return df
    if nparts is None:
        cap = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        rows = _scan_rows(df)
        if rows is None:
            nparts = cap
        else:
            nparts = min(cap, (rows + SPREAD_ROWS_PER_PART - 1) // SPREAD_ROWS_PER_PART)
        if nparts <= 1:
            return df
    from pyspark.sql import functions as F

    return df.repartition(nparts, *[F.col(c) for c in key_cols])


def get_spark(
    app_name: str = "kg-construct",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    ncores = os.cpu_count() if cores in ("*", None) else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * int(ncores))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at Spark's default (true): measured on the
        # scaling bench, coalescing shuffles below the core count halves
        # local[16] throughput (44.6 s vs 19.8 s on the same job) because
        # mid-size shuffles collapse to fewer tasks than cores — the
        # kilobyte-stage scheduling overhead it would save at toy scale is
        # noise next to that.  Partition-count-follows-data still holds for
        # the INPUT side (parquet split sizing); shuffle-side parallelism
        # must track the cluster.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
