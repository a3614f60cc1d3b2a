"""Table-format abstraction for pipeline sinks: parquet paths (sandbox
default) or Iceberg tables behind a flag (SURVEY §2.C C1/C2).

Production shape (north star): ``pages`` in, ``terms``/``triples``/
``lineage`` out, all Iceberg — idempotent re-runs via
``overwritePartitions`` and snapshot isolation.  The sandbox has no Iceberg
runtime jar, so the parquet path is the tested default and the Iceberg path
is exercised through the same Sink API with the DataFrameWriterV2 calls
unit-tested via a recording stub (tests/test_pipeline_e2e.py).

Enable on a real cluster with:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \\
      --conf spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.kg.type=hive \\
      scripts/run_pipeline.py --table-format iceberg --catalog kg ...
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class Sink:
    """Uniform write/read for the pipeline's output tables."""

    def __init__(self, spark: SparkSession, base: str,
                 table_format: str = "parquet", catalog: str | None = None,
                 database: str = "kg"):
        if table_format not in ("parquet", "iceberg"):
            raise ValueError(f"unknown table format {table_format!r}")
        if table_format == "iceberg" and not catalog:
            raise ValueError("iceberg format requires a catalog name")
        self.spark = spark
        self.base = base.rstrip("/")
        self.fmt = table_format
        self.catalog = catalog
        self.database = database

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{self.database}.{table}"

    def write(self, df: DataFrame, table: str, mode: str = "append",
              partition_by: list[str] | None = None) -> None:
        """mode: 'append' | 'overwrite' | 'overwrite_partitions'.

        overwrite_partitions is the idempotent-resume write: re-running a
        completed bucket replaces its partitions instead of duplicating —
        on parquet it degrades to dynamic partitionOverwriteMode.
        """
        if self.fmt == "parquet":
            w = df.write
            if partition_by:
                w = w.partitionBy(*partition_by)
            if mode == "overwrite_partitions":
                w = w.mode("overwrite").option(
                    "partitionOverwriteMode", "dynamic")
            else:
                w = w.mode(mode)
            w.parquet(f"{self.base}/{table}")
            return

        ident = self._ident(table)
        wv2 = df.writeTo(ident)
        if not self.spark.catalog.tableExists(ident):
            if partition_by:
                from pyspark.sql import functions as F

                wv2 = wv2.partitionedBy(*[F.col(c) for c in partition_by])
            wv2.create()
        elif mode == "append":
            wv2.append()
        elif mode == "overwrite_partitions":
            wv2.overwritePartitions()
        else:  # full overwrite
            wv2.createOrReplace()

    def read(self, table: str) -> DataFrame:
        if self.fmt == "parquet":
            return self.spark.read.parquet(f"{self.base}/{table}")
        return self.spark.table(self._ident(table))
