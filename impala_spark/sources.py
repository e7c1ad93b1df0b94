"""Multi-format table sources/sinks.

The reference's HdfsScanNode is multi-format — a partition carries its own
file format descriptor (catalog/HdfsPartition.java fileFormatDescriptor,
planner/HdfsScanNode.java:61-96 scan-range generation) and HdfsTableSink
writes TEXT/PARQUET/AVRO/SEQUENCE (planner/HdfsTableSink.java). Spark-first
mapping: every format resolves to a DataSource V2 reader/writer via
``spark.read.format(...)`` so the SAME scan machinery (partition pruning,
filter pushdown where the format supports it, column pruning for columnar
formats) applies uniformly. Formats whose jars aren't on this classpath
(avro is an external module since Spark 2.4) are gated with a clear error
instead of a stub success.

Scale note: format choice IS a scale decision — columnar formats
(parquet/orc) get pushdown + pruning + vectorized decode; row formats
(csv/json) read every byte of selected files. The reader surfaces that by
reporting ``supports_pushdown`` so pipelines can assert they're not
accidentally scanning TB of text.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class FormatSpec:
    spark_format: str
    columnar: bool  # pushdown + column pruning reach the file
    default_options: tuple[tuple[str, str], ...] = ()


#: Impala STORED AS name -> Spark source (HdfsFileFormat.java enum).
STORAGE_FORMATS: dict[str, FormatSpec] = {
    "PARQUET": FormatSpec("parquet", True),
    "ORC": FormatSpec("orc", True),
    # Impala TEXTFILE: '\001'-delimited, no header (HdfsTableSink defaults);
    # exposed options mirror ROW FORMAT DELIMITED.
    "TEXTFILE": FormatSpec("csv", False, (("sep", "\x01"), ("header", "false"))),
    "CSV": FormatSpec("csv", False, (("sep", ","), ("header", "false"))),
    "JSON": FormatSpec("json", False),
    # External module formats — present only if the jar is on the classpath.
    "AVRO": FormatSpec("avro", True),
}

_UNSUPPORTED = {
    "SEQUENCEFILE": "no Spark DSv2 source; convert with a one-off RDD job",
    "RCFILE": "legacy format; Spark reads it only through a Hive SerDe metastore table",
}


def format_spec(name: str) -> FormatSpec:
    key = name.strip().upper()
    if key in _UNSUPPORTED:
        raise ValueError(f"STORED AS {key} is not supported here: {_UNSUPPORTED[key]}")
    if key not in STORAGE_FORMATS:
        raise ValueError(f"unknown storage format {name!r} (know: {sorted(STORAGE_FORMATS)})")
    return STORAGE_FORMATS[key]


def read_table(
    spark: SparkSession, path: str, file_format: str = "PARQUET",
    schema: str | None = None, **options: str,
) -> DataFrame:
    """Read a path as an Impala-format table.

    For row formats pass ``schema`` (DDL string) — csv/json schema
    inference is a full extra pass over the data, which at 100 TB is a
    second scan; an explicit schema keeps it one.
    """
    spec = format_spec(file_format)
    reader = spark.read.format(spec.spark_format)
    for k, v in spec.default_options:
        reader = reader.option(k, v)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema:
        reader = reader.schema(schema)
    elif not spec.columnar:
        reader = reader.option("inferSchema", "true")
    try:
        return reader.load(path)
    except Exception as e:  # pragma: no cover - classpath-dependent
        if spec.spark_format == "avro" and "Failed to find data source" in str(e):
            raise ValueError(
                "AVRO needs the external spark-avro module on the classpath "
                "(--packages org.apache.spark:spark-avro_2.13:<ver>)"
            ) from e
        raise


def write_table(
    df: DataFrame, path: str, file_format: str = "PARQUET",
    mode: str = "overwrite", partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """HdfsTableSink analog: write in the named format, optionally
    dynamic-partitioned (clustered by partition dirs like the reference's
    partitioned sink)."""
    spec = format_spec(file_format)
    writer = df.write.format(spec.spark_format).mode(mode)
    for k, v in spec.default_options:
        writer = writer.option(k, v)
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
