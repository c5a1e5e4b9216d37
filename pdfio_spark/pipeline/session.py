"""SparkSession factory with the engine's standard configuration.

Tuned for the extraction workload: Arrow-batched JVM<->Python transfer
with bounded batch sizes (one batch of PDFs must fit in worker memory),
AQE on for the SQL plane, shuffle partitions sized for local[N] but
overridable for cluster runs.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(cpus: int | None = None, app: str = "pdfio_spark",
              shuffle_partitions: int | None = None,
              iceberg_warehouse: str | None = None) -> SparkSession:
    """iceberg_warehouse: when set (and the iceberg-spark runtime jar is
    on the classpath — not in this sandbox), registers a hadoop catalog
    `pdfio` so production jobs read/append Iceberg tables with snapshot
    isolation + exactly-once appends (SURVEY §4.2)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 16)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batches: rows for throughput, bytes for memory —
        # a batch of large PDFs must fit in the Python worker
        # (SURVEY §4.2 memory control)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.execution.arrow.maxBytesPerBatch",
                str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
    )
    if iceberg_warehouse:
        builder = (builder
                   .config("spark.sql.extensions",
                           "org.apache.iceberg.spark.extensions."
                           "IcebergSparkSessionExtensions")
                   .config("spark.sql.catalog.pdfio",
                           "org.apache.iceberg.spark.SparkCatalog")
                   .config("spark.sql.catalog.pdfio.type", "hadoop")
                   .config("spark.sql.catalog.pdfio.warehouse",
                           iceberg_warehouse))
    return builder.getOrCreate()
