"""SparkSession factory tuned for the maintenance engine.

local[N] in this sandbox; the same configs are what we'd submit with
``spark-submit --py-files`` on a real cluster (AQE on, Arrow on, shuffle
partitions sized to cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "moonlink_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    profile: str = "image",
) -> SparkSession:
    """``profile="image"`` (default for this engine) tunes the columnar
    reader/row-group sizes for 10-20 KiB binary-payload rows — a 4096-row
    default batch of images is an ~85 MiB humongous allocation per task.
    Pass ``profile="generic"`` for narrow tables to keep Spark's defaults.
    """
    # executor Python workers must be able to import this package (on a real
    # cluster: spark-submit --py-files; in local mode: PYTHONPATH inheritance)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # zstd, not snappy: image payloads arrive pre-compressed (PNG/JPEG
        # bytes), so page compression buys ~0.4% size; snappy still CHARGES
        # full memcpy+compress on write and decompress on scan (measured on
        # the 30k-image A/B: write 1.9s->0.4s, scan 1.96->2.39 GB/s). zstd's
        # incompressible fast path matches "none" on speed while the text
        # columns (captions) keep compressing.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        # field-id column resolution is ON for the whole session (documented):
        # engine tables stamp parquet.field.id on every column (fieldids.py)
        # and scans resolve by id. Set here, at construction, so scan() never
        # has to mutate a running session's conf mid-query.
        .config("spark.sql.parquet.fieldId.read.enabled", "true")
        # let the Python DataSource (datasource.py) see comparison filters
        # for manifest-stat file pruning (all filters are handed back, so
        # Spark still applies them — pruning only)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # µs-precision timestamps (reference semantics: Timestamp(µs, tz)
        # canonicalized to UTC, moonlink_type.rs:9) — also the only parquet
        # timestamp encoding whose min/max footer stats pyarrow can fold
        # (INT96 has no extractable statistics)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # modest heap: this sandbox VM materializes guest pages lazily and
        # slowly (~10-100 MB/s first-touch), so heap growth mid-job stalls
        # executors in kernel time; 12g is ample for local-mode jobs here.
        # Benchmarks additionally pass -Xms12g -XX:+AlwaysPreTouch to pay the
        # page-materialization cost once at startup (see bench.py).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if profile == "image":
        # binary-payload tables: a 4096-row columnar batch of ~20 KiB images
        # is an ~85 MiB humongous allocation per task per batch — G1 churns.
        # 1024-row batches keep vectors ~20 MiB; 32 MiB row groups give scans
        # of few-file tables real split parallelism. Scoped to this profile
        # so narrow-table sessions keep Spark's defaults.
        b = b.config("spark.sql.parquet.columnarReaderBatchSize", "1024").config(
            "spark.hadoop.parquet.block.size", str(32 * 1024 * 1024)
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
