"""SparkSession factory tuned for the CDC replay workload.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; the same settings are
what we would submit to a multi-executor cluster (AQE on, Arrow on, shuffle
partitions sized to cores). Nothing here is local-mode-specific except the
master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cht_sync_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with CDC-appropriate defaults.

    - AQE + skew-join handling on: hot conversations produce skewed merge
      joins (reference has no skew problem because Postgres upserts row-level;
      Spark shuffles by key — see SURVEY.md §2.5 I3).
    - Arrow on: the doc->row transform is a vectorized pandas UDF
      (north_rule: "no per-row Python").
    - shuffle partitions default to core count locally; on a real cluster this
      is set to ~2-3x total executor cores and AQE coalesces from there.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    # Executor-style resource isolation (what YARN/K8s cgroups do for real
    # executors): cap the JVM's perceived CPU count so GC / netty / fork-join
    # pools are sized to the worker's share, not the whole machine. Without
    # this, several local-mode JVMs on one host each spawn machine-sized
    # thread pools and the kernel scheduler thrashes (observed 70%+ system
    # CPU with 4 concurrent workers).
    active = os.environ.get("SPARK_GRAFT_ACTIVE_PROCS")
    jvm_extra = f"-XX:ActiveProcessorCount={active}" if active else ""
    # extra verbatim JVM flags (benches use -Xms + AlwaysPreTouch so heap
    # page-zeroing happens at JVM startup, not inside the timed region)
    jvm_extra = (jvm_extra + " " + os.environ.get("SPARK_GRAFT_JVM_OPTS", "")).strip()
    # NOTE: no objectHashAggregate fallback tuning here anymore. The LWW
    # winner selection is a row_number window whose rank-limit pushdown
    # (WindowGroupLimit) gives map-side pruning natively; the earlier
    # max_by-aggregate fast path (which motivated a raised global
    # sort-fallback threshold — an executor-heap hazard for huge per-task
    # key sets) was measured slower-or-equal in Spark 4 and removed
    # (operators/lww.py docstring has the numbers).
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.driver.extraJavaOptions", jvm_extra)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (the legacy default) carries NO parquet min/max statistics:
        # it silently disables row-group pushdown AND the manifest file
        # bounds (tables/format.py) for every timestamp column. MICROS is
        # the modern parquet timestamp — stats, pushdown, and pyarrow/DuckDB
        # interop all work.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    # Under spark-submit the JVM gateway already exists (PYSPARK_GATEWAY_PORT
    # is exported to this process) and carries the submit-provided master /
    # deploy config — setting .master() here would silently OVERRIDE the
    # cluster master and run the whole job local on the driver. Standalone
    # `python` runs have no gateway yet and get the tuned local master.
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
