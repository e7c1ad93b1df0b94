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


def avro_schema_to_cols(literal: str) -> str:
    """Avro schema JSON -> Impala column-def string, with the reference's
    type mapping and error surface (util/AvroSchemaParser.java: primitive
    map at :59-65, nullable-union unwrap, ARRAY/MAP/RECORD complex types,
    BYTES+decimal logicalType; top-level must be a RECORD). Used by
    CREATE TABLE ... STORED AS AVRO when the column list is omitted and
    avro.schema.literal supplies it (AvroSchemaUtils.extractAvroTblProps)."""
    import json

    from impala_spark.parser import ImpalaUnsupportedError

    try:
        schema = json.loads(literal)
    except ValueError as e:
        raise ImpalaUnsupportedError(f"Error parsing Avro schema for table: {e}")

    def type_of(s, col):
        # nullable types arrive as unions of [T, "null"] — hidden from
        # the user like the reference does
        if isinstance(s, list):
            non_null = [x for x in s if x != "null"]
            if len(non_null) == 1 and len(s) <= 2:
                return type_of(non_null[0], col)
            raise ImpalaUnsupportedError(
                f"Unsupported type 'union' of column '{col}'")
        if isinstance(s, str):
            prim = {
                "string": "STRING", "int": "INT", "boolean": "BOOLEAN",
                "long": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
            }.get(s)
            if prim:
                return prim
            if s == "bytes":
                # BYTES is only valid with logicalType=decimal, which
                # rides the object form
                raise ImpalaUnsupportedError(
                    f"logicalType for column '{col}' specified at wrong"
                    " level or was not specified")
            raise ImpalaUnsupportedError(
                f"Unsupported type '{s}' of column '{col}'")
        t = s.get("type")
        if t == "array":
            return f"ARRAY<{type_of(s['items'], col)}>"
        if t == "map":
            return f"MAP<STRING,{type_of(s['values'], col)}>"
        if t == "record":
            inner = ",".join(
                f"{f['name']}:{type_of(f['type'], f['name'])}"
                for f in s.get("fields", [])
            )
            return f"STRUCT<{inner}>"
        if t == "bytes":
            logical = s.get("logicalType")
            if logical is None:
                raise ImpalaUnsupportedError(
                    f"logicalType for column '{col}' specified at wrong"
                    " level or was not specified")
            if logical.lower() != "decimal":
                raise ImpalaUnsupportedError(
                    f"Unsupported logicalType: '{logical}' for column"
                    f" '{col}' with type BYTES")
            precision, scale = s.get("precision"), s.get("scale", 0)
            if precision is None:
                raise ImpalaUnsupportedError(
                    "No 'precision' property specified for 'decimal'"
                    " logicalType")
            return f"DECIMAL({precision},{scale})"
        return type_of(t, col)  # wrapped primitive: {"type": "long"}

    if not isinstance(schema, dict) or schema.get("type") != "record":
        got = schema.get("type") if isinstance(schema, dict) else schema
        raise ImpalaUnsupportedError(
            "Schema for table must be of type RECORD. Received type: "
            f"{got}")
    return ", ".join(
        f"{f['name']} {type_of(f['type'], f['name'])}"
        for f in schema.get("fields", [])
    )


def reconcile_avro_cols(
    declared: list[tuple[str, str]], avro_cols: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """Column-def-vs-Avro-schema reconciliation
    (util/AvroSchemaUtils.java reconcileSchemas:119-157): on a size
    mismatch the Avro schema wins entirely; per position, a
    CHAR/VARCHAR/STRING declaration against an Avro STRING keeps the
    declared TYPE under the Avro NAME; any other inconsistency resolves
    to the Avro column (the reference prefers the Avro schema so
    COMPUTE STATS stays consistent, IMPALA-1104)."""
    if len(declared) != len(avro_cols):
        return list(avro_cols)
    out: list[tuple[str, str]] = []
    for (dn, dt), (an, at) in zip(declared, avro_cols):
        d_is_str = dt.upper().split("(")[0].strip() in ("CHAR", "VARCHAR", "STRING")
        if d_is_str and at.upper() == "STRING":
            out.append((an, dt))
        else:
            out.append((an, at))
    return out
