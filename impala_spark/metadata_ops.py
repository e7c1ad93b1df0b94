"""HiveServer2 / JDBC metadata operations — the reference's
``service/MetadataOp.java`` (GetCatalogs, GetSchemas, GetTables,
GetTableTypes, GetColumns, GetFunctions), the surface a JDBC client's
``DatabaseMetaData`` calls hit. Behavior pinned by
``T/service/JdbcTest.java`` (adapted in tests/test_jdbc_metadata.py).

Result schemas and row values mirror MetadataOp exactly:

* GetCatalogs: one TABLE_CAT column, zero rows (Impala has no catalogs).
* GetSchemas: TABLE_SCHEM + TABLE_CATALOG, JDBC %/_ patterns.
* GetTables: TABLE_CAT/TABLE_SCHEM/TABLE_NAME/TABLE_TYPE/REMARKS, all
  objects typed "TABLE" (the 2.x surface has a single table type).
* GetColumns: the 23-column JDBC layout (MetadataOp.java:89-134) with
  DATA_TYPE = java.sql.Types codes (MAP reports as ARRAY like Hive),
  TYPE_NAME = bare primitive name for scalars but full toSql for
  complex types (getHs2MetadataTypeName), COLUMN_SIZE/DECIMAL_DIGITS/
  NUM_PREC_RADIX per catalog Type's JDBC descriptors
  (catalog/Type.java:467-570), ORDINAL_POSITION 1-based, NULLABLE=1,
  IS_NULLABLE='YES', IS_AUTO_INCREMENT='NO', the rest NULL.
* GetFunctions: FUNCTION_CAT/FUNCTION_SCHEM/FUNCTION_NAME/REMARKS/
  FUNCTION_TYPE/SPECIFIC_NAME; builtins live in the _impala_builtins
  database (never in default), one row per overload.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# java.sql.Types codes (JDBC standard constants)
_SQL_TYPES = {
    "NULL": 0, "BOOLEAN": 16, "TINYINT": -6, "SMALLINT": 5, "INT": 4,
    "BIGINT": -5, "FLOAT": 6, "DOUBLE": 8, "TIMESTAMP": 93,
    "STRING": 12, "VARCHAR": 12, "CHAR": 1, "BINARY": -2, "DECIMAL": 3,
    "STRUCT": 2002, "ARRAY": 2003, "MAP": 2003,  # MAP reports as ARRAY
}

#: maximum decimal precision per numeric type (Type.getPrecision)
_PRECISION = {"TINYINT": 3, "SMALLINT": 5, "INT": 10, "BIGINT": 19,
              "FLOAT": 7, "DOUBLE": 15}

#: fractional digits (Type.getDecimalDigits)
_DECIMAL_DIGITS = {"BOOLEAN": 0, "TINYINT": 0, "SMALLINT": 0, "INT": 0,
                   "BIGINT": 0, "FLOAT": 7, "DOUBLE": 15, "TIMESTAMP": 9}

_RADIX_TYPES = {"TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE",
                "DECIMAL"}

INT_MAX = 2147483647

#: builtin overload signatures surfaced by GetFunctions — the Impala
#: builtin library registers one Function per overload
#: (catalog/BuiltinsDb). Names absent here surface one generic row.
_OVERLOADS = {
    "substring": ["substring(STRING, BIGINT)",
                  "substring(STRING, BIGINT, BIGINT)"],
    "substr": ["substr(STRING, BIGINT)", "substr(STRING, BIGINT, BIGINT)"],
    "round": ["round(DOUBLE)", "round(DOUBLE, INT)"],
    "truncate": ["truncate(DOUBLE)", "truncate(DOUBLE, INT)"],
    "locate": ["locate(STRING, STRING)", "locate(STRING, STRING, BIGINT)"],
    "instr": ["instr(STRING, STRING)"],
}


def _jdbc_pattern(pat: str | None) -> str:
    """JDBC catalog patterns: % any string, _ any char; None/empty match
    everything (util/PatternMatcher.createJdbcPatternMatcher)."""
    if pat is None or pat == "":
        return ".*"
    out = []
    for ch in pat:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def _matches(pat: str | None, name: str) -> bool:
    return re.fullmatch(_jdbc_pattern(pat), name, re.IGNORECASE) is not None


def _impala_type(spark_type: str) -> str:
    """Spark catalog dataType string -> Impala type spelling (uppercase,
    parameters preserved)."""
    s = spark_type.strip()
    low = s.lower()
    simple = {
        "int": "INT", "integer": "INT", "bigint": "BIGINT",
        "smallint": "SMALLINT", "tinyint": "TINYINT", "boolean": "BOOLEAN",
        "float": "FLOAT", "real": "FLOAT", "double": "DOUBLE",
        "string": "STRING", "binary": "BINARY", "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP", "date": "TIMESTAMP",
    }
    if low in simple:
        return simple[low]
    for pref in ("decimal", "varchar", "char"):
        if low.startswith(pref):
            return pref.upper() + s[len(pref):].replace(" ", "")
    if low.startswith("array<") and low.endswith(">"):
        return f"ARRAY<{_impala_type(s[6:-1])}>"
    if low.startswith("map<") and low.endswith(">"):
        inner = s[4:-1]
        depth = 0
        for i, ch in enumerate(inner):
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            elif ch == "," and depth == 0:
                return (f"MAP<{_impala_type(inner[:i])},"
                        f"{_impala_type(inner[i + 1:])}>")
    if low.startswith("struct<") and low.endswith(">"):
        inner = s[7:-1]
        fields = []
        depth = 0
        start = 0
        for i, ch in enumerate(inner + ","):
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            elif ch == "," and depth == 0:
                f = inner[start:i]
                name, _, ftype = f.partition(":")
                fields.append(f"{name.strip()}:{_impala_type(ftype)}")
                start = i + 1
        return f"STRUCT<{','.join(fields)}>"
    return s.upper()


def _base(impala_type: str) -> str:
    u = impala_type.upper()
    for pref in ("ARRAY<", "MAP<", "STRUCT<"):
        if u.startswith(pref):
            return pref[:-1]
    return u.split("(")[0]


def _decimal_params(impala_type: str) -> tuple[int, int]:
    m = re.match(r"DECIMAL\((\d+)\s*,?\s*(\d+)?\)", impala_type.upper())
    if m:
        return int(m.group(1)), int(m.group(2) or 0)
    return 9, 0  # Impala default decimal


def _char_len(impala_type: str) -> int | None:
    m = re.match(r"(?:VAR)?CHAR\((\d+)\)", impala_type.upper())
    return int(m.group(1)) if m else None


def _column_size(impala_type: str) -> int | None:
    base = _base(impala_type)
    if base in ("STRUCT", "ARRAY", "MAP"):
        return None
    if base == "DECIMAL":
        return _decimal_params(impala_type)[0]
    if base in _PRECISION:
        return _PRECISION[base]
    if base == "STRING":
        return INT_MAX
    if base == "TIMESTAMP":
        return 29
    if base in ("CHAR", "VARCHAR"):
        return _char_len(impala_type)
    return None


def _decimal_digits(impala_type: str) -> int | None:
    base = _base(impala_type)
    if base == "DECIMAL":
        return _decimal_params(impala_type)[1]
    return _DECIMAL_DIGITS.get(base)


def _num_prec_radix(impala_type: str) -> int | None:
    return 10 if _base(impala_type) in _RADIX_TYPES else None


def _type_name(impala_type: str) -> str:
    """TYPE_NAME: bare primitive name for scalars, full toSql for
    complex types — type keywords uppercase, struct field names as
    declared (MetadataOp.getHs2MetadataTypeName)."""
    base = _base(impala_type)
    if base in ("STRUCT", "ARRAY", "MAP"):
        return impala_type
    return base


def _java_sql_type(impala_type: str) -> int:
    return _SQL_TYPES.get(_base(impala_type), 1111)  # 1111 = OTHER


GET_COLUMNS_SCHEMA = (
    "TABLE_CAT string, TABLE_SCHEM string, TABLE_NAME string,"
    " COLUMN_NAME string, DATA_TYPE int, TYPE_NAME string,"
    " COLUMN_SIZE int, BUFFER_LENGTH int, DECIMAL_DIGITS int,"
    " NUM_PREC_RADIX int, NULLABLE int, REMARKS string,"
    " COLUMN_DEF string, SQL_DATA_TYPE int, SQL_DATETIME_SUB int,"
    " CHAR_OCTET_LENGTH int, ORDINAL_POSITION int, IS_NULLABLE string,"
    " SCOPE_CATALOG string, SCOPE_SCHEMA string, SCOPE_TABLE string,"
    " SOURCE_DATA_TYPE smallint, IS_AUTO_INCREMENT string"
)


def _visible_tables(spark: SparkSession) -> list[str]:
    return sorted({t.name for t in spark.catalog.listTables()})


def get_catalogs(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "TABLE_CAT: string")


def get_schemas(spark: SparkSession, catalog: str | None = None,
                schema_pattern: str | None = None) -> DataFrame:
    dbs = sorted(d.name for d in spark.catalog.listDatabases()
                 if _matches(schema_pattern, d.name))
    return spark.createDataFrame(
        [(d, None) for d in dbs], "TABLE_SCHEM: string, TABLE_CATALOG: string")


def get_table_types(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([("TABLE",)], "TABLE_TYPE: string")


def get_tables(spark: SparkSession, catalog: str | None = None,
               schema_pattern: str | None = None,
               table_pattern: str | None = None,
               table_types: list[str] | None = None) -> DataFrame:
    rows = []
    if table_types is None or any(t.upper() == "TABLE" for t in table_types):
        db = spark.catalog.currentDatabase()
        if _matches(schema_pattern, db):
            for name in _visible_tables(spark):
                if _matches(table_pattern, name):
                    rows.append((None, db, name, "TABLE", None))
    return spark.createDataFrame(
        rows, "TABLE_CAT: string, TABLE_SCHEM: string, TABLE_NAME: string,"
        " TABLE_TYPE: string, REMARKS: string")


def get_columns(spark: SparkSession, catalog: str | None = None,
                schema_pattern: str | None = None,
                table_pattern: str | None = None,
                column_pattern: str | None = None) -> DataFrame:
    rows = []
    db = spark.catalog.currentDatabase()
    if _matches(schema_pattern, db):
        from impala_spark import ddl

        for tab in _visible_tables(spark):
            if not _matches(table_pattern, tab):
                continue
            info = ddl.table_info(tab)
            if (info is not None and info.declared_cols
                    and info.schema is not None
                    and [c for c, _t in info.declared_cols]
                    == [f.name for f in info.schema.fields]):
                # managed tables keep their declared column texts —
                # Spark's catalog erases CHAR/VARCHAR to string, the
                # declared Impala types do not. Falls through to the
                # catalog view when ALTER has drifted the column set.
                cols = list(info.declared_cols)
            else:
                try:
                    cols = [(c.name, c.dataType)
                            for c in spark.catalog.listColumns(tab)]
                except Exception:
                    continue
            for pos, (cname, ctype) in enumerate(cols):
                if not _matches(column_pattern, cname):
                    continue
                col_name = cname
                itype = _impala_type(ctype)
                rows.append((
                    None, db, tab, col_name,           # CAT/SCHEM/NAME/COL
                    _java_sql_type(itype),             # DATA_TYPE
                    _type_name(itype),                 # TYPE_NAME
                    _column_size(itype),               # COLUMN_SIZE
                    None,                              # BUFFER_LENGTH
                    _decimal_digits(itype),            # DECIMAL_DIGITS
                    _num_prec_radix(itype),            # NUM_PREC_RADIX
                    1,                                 # NULLABLE (nullable)
                    None, None, None, None, None,      # REMARKS..CHAR_OCTET
                    pos + 1,                           # ORDINAL_POSITION
                    "YES",                             # IS_NULLABLE
                    None, None, None, None,            # SCOPE_*/SOURCE
                    "NO",                              # IS_AUTO_INCREMENT
                ))
    return spark.createDataFrame(rows, GET_COLUMNS_SCHEMA)


def get_functions(spark: SparkSession, catalog: str | None = None,
                  schema_pattern: str | None = None,
                  fn_pattern: str | None = None) -> DataFrame:
    """Builtins live in _impala_builtins, never in a user database —
    getFunctions(schema='default', 'substring') is empty
    (JdbcTest.testMetaDataGetFunctions)."""
    rows = []
    if schema_pattern is None or _matches(schema_pattern, "_impala_builtins"):
        names = {r["function"] for r in
                 spark.sql("SHOW FUNCTIONS").collect()}
        names |= set(_OVERLOADS)
        for name in sorted(names):
            if not _matches(fn_pattern, name):
                continue
            for sig in _OVERLOADS.get(name, [f"{name}()"]):
                rows.append(
                    (None, "_impala_builtins", name, None, 1, sig))
    return spark.createDataFrame(
        rows, "FUNCTION_CAT: string, FUNCTION_SCHEM: string,"
        " FUNCTION_NAME: string, REMARKS: string, FUNCTION_TYPE: int,"
        " SPECIFIC_NAME: string")


#: GetTypeInfo excludes these (MetadataOp.createGetTypeInfoResults:557-566)
_TYPEINFO_EXCLUDED = {"INVALID_TYPE", "DATE", "DATETIME", "DECIMAL",
                      "CHAR", "VARCHAR"}

#: PrimitiveType declaration order (catalog/PrimitiveType.java:25-53)
_PRIMITIVE_ORDER = [
    "INVALID_TYPE", "NULL_TYPE", "BOOLEAN", "TINYINT", "SMALLINT", "INT",
    "BIGINT", "FLOAT", "DOUBLE", "DATE", "DATETIME", "TIMESTAMP",
    "STRING", "VARCHAR", "BINARY", "DECIMAL", "CHAR",
]

GET_TYPEINFO_SCHEMA = (
    "TYPE_NAME string, DATA_TYPE int, PRECISION int,"
    " LITERAL_PREFIX string, LITERAL_SUFFIX string, CREATE_PARAMS string,"
    " NULLABLE int, CASE_SENSITIVE boolean, SEARCHABLE smallint,"
    " UNSIGNED_ATTRIBUTE boolean, FIXED_PREC_SCALE boolean,"
    " AUTO_INCREMENT boolean, LOCAL_TYPE_NAME string,"
    " MINIMUM_SCALE smallint, MAXIMUM_SCALE smallint, SQL_DATA_TYPE int,"
    " SQL_DATETIME_SUB int, NUM_PREC_RADIX int"
)


def get_type_info(spark: SparkSession) -> DataFrame:
    """GetTypeInfo: one row per supported primitive type in declaration
    order — 18 columns, 11 rows (T/service/FrontendTest.TestGetTypeInfo
    pins PrimitiveType.values().length - 6)."""
    rows = []
    for ptype in _PRIMITIVE_ORDER:
        if ptype in _TYPEINFO_EXCLUDED:
            continue
        base = "NULL" if ptype == "NULL_TYPE" else ptype
        numeric = base in _PRECISION or base == "DECIMAL"
        stringy = base in ("STRING", "VARCHAR", "CHAR")
        rows.append((
            ptype,                           # TYPE_NAME (enum name)
            _SQL_TYPES.get(base, 0),         # DATA_TYPE
            _PRECISION.get(base),            # PRECISION (null non-numeric)
            None, None, None,                # LITERAL_*/CREATE_PARAMS
            1,                               # NULLABLE (typeNullable)
            stringy,                         # CASE_SENSITIVE
            3,                               # SEARCHABLE (typeSearchable)
            not numeric,                     # UNSIGNED_ATTRIBUTE
            False, False,                    # FIXED_PREC_SCALE/AUTO_INCR
            None,                            # LOCAL_TYPE_NAME
            0, 0,                            # MIN/MAX SCALE
            None, None,                      # SQL_DATA_TYPE/DATETIME_SUB
            _num_prec_radix(base),           # NUM_PREC_RADIX
        ))
    return spark.createDataFrame(rows, GET_TYPEINFO_SCHEMA)
