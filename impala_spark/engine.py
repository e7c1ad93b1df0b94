"""ImpalaEngine — the session facade.

Plays the role of the reference's service layer
(service/Frontend.java:1037 createExecRequest, :596 getExplainString,
service/CatalogOpExecutor.java for DDL): accept an Impala-dialect SQL
string, translate it (parser.py), and hand it to Catalyst. Statements
Spark SQL cannot express directly (COMPUTE STATS, SHOW surfaces, Kudu-ish
UPDATE/DELETE) are routed to Python implementations here / in ddl.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_spark import ddl
from impala_spark import functions as ifn
from impala_spark.parser import ImpalaUnsupportedError, translate
from impala_spark.session import register_tables


class ImpalaAnalysisError(ImpalaUnsupportedError):
    """Analysis failure surfaced with the reference's message text
    (Analyzer.java resolution errors). Subclasses ImpalaUnsupportedError so
    one except clause catches the whole compat surface."""

_COMPUTE_STATS_RE = re.compile(
    r"^\s*COMPUTE\s+(INCREMENTAL\s+)?STATS\s+([\w.`]+)\s*$", re.IGNORECASE
)
#: DROP STATS t | DROP INCREMENTAL STATS t PARTITION (spec)
#: (A/DropStatsStmt.java:28-30 — the PARTITION clause is only valid with
#: INCREMENTAL; both route to the same stats-demotion here)
_DROP_STATS_RE = re.compile(
    r"^\s*DROP\s+(INCREMENTAL\s+)?STATS\s+([\w.`]+)"
    r"(?:\s+PARTITION\s*\([^)]*\))?\s*$",
    re.IGNORECASE,
)
_SET_RE = re.compile(r"^\s*SET\s+(\w+)\s*=\s*(.+?)\s*$", re.IGNORECASE)
_USE_RE = re.compile(r"^\s*USE\s+([\w`]+)\s*$", re.IGNORECASE)
_EXPLAIN_RE = re.compile(r"^\s*EXPLAIN\s+(.*)$", re.IGNORECASE | re.DOTALL)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?(?P<table>[\w`]+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?"  # column permutation (InsertStmt.java:73)
    r"(?:PARTITION\s*\((?P<part>[^)]*)\)\s*)?"
    # plan hints + comments between the target and the source query
    # (InsertStmt.java planHints_: [shuffle] / /* +noshuffle */ / -- ...)
    r"(?P<hints>(?:(?:\[[^\]]*\]|/\*[^*]*\*+(?:[^/*][^*]*\*+)*/|--[^\n]*\n)\s*)*)"
    r"(?P<select>(?:SELECT|VALUES|WITH)\s.*)$",
    re.IGNORECASE | re.DOTALL,
)
_WITH_PREFIX_RE = re.compile(r"^\s*WITH\s", re.IGNORECASE)
_DML_HEAD_RE = re.compile(
    r"(?is)^((?:INSERT|UPSERT)\s+(?:INTO|OVERWRITE)\s+(?:TABLE\s+)?[\w.`]+\s*"
    r"(?:\([^)]*\)\s*)?"  # column permutation stays in the head
    r"(?:PARTITION\s*\([^)]*\)\s*)?)(.*)$"
)


_DEFAULT_REF_RE = re.compile(
    r"(?i)\bdefault\s*\.\s*(`[^`]+`|[A-Za-z_]\w*)"
)


def _strip_session_db_refs(q: str, spark) -> str:
    """Resolve `default.<name>` references against the engine's
    registered tables (Analyzer.java resolves db-qualified refs against
    the catalog; our fixture/managed tables are session temp views,
    which Spark cannot address through a database qualifier). Only
    rewrites when <name> actually exists as a temp view, so real
    catalog databases keep working; quote-aware, so string literals
    containing 'default.' are untouched."""
    if "default" not in q.lower():
        return q
    out: list[str] = []
    i, n = 0, len(q)
    in_str: str | None = None
    while i < n:
        ch = q[i]
        if in_str:
            out.append(ch)
            if ch == in_str:
                in_str = None
            i += 1
            continue
        if ch in ("'", '"'):
            in_str = ch
            out.append(ch)
            i += 1
            continue
        m = _DEFAULT_REF_RE.match(q, i)
        if m and not (i and (q[i - 1].isalnum() or q[i - 1] in "_`.")):
            name = m.group(1).strip("`")
            try:
                is_temp = spark.catalog.tableExists(name)
            except Exception:
                is_temp = False
            if is_temp:
                out.append(m.group(1))
                i = m.end()
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def _hoist_with_clause(q: str) -> str:
    """Impala's grammar allows a WITH clause to PREFIX INSERT/UPSERT
    (A/InsertStmt.java: withClause_ analyzed against the source query);
    Spark only accepts the CTE list ON the source query. Rewrite
    `WITH ... INSERT INTO t [PARTITION(...)] SELECT ...` into
    `INSERT INTO t [PARTITION(...)] WITH ... SELECT ...` — same scoping,
    since the CTEs are visible only to the select in both engines.
    Statements that aren't a WITH-prefixed DML pass through untouched."""
    if not _WITH_PREFIX_RE.match(q):
        return q
    depth = 0
    in_str: str | None = None
    for i, ch in enumerate(q):
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "IiUu" and i and not (
            q[i - 1].isalnum() or q[i - 1] in "_`"
        ):
            if re.match(r"(?i)(?:INSERT|UPSERT)\b", q[i:]):
                hm = _DML_HEAD_RE.match(q[i:])
                if hm:
                    return f"{hm.group(1).rstrip()} {q[:i].strip()} {hm.group(2)}"
                return q
    return q
_CTAS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>[\w`]+)\s*"
    r"(?:PARTITIONED\s+BY\s*\((?P<part>[^)]*)\)\s*)?"
    r"(?:PARTITION\s+BY\s+HASH\s*\((?P<hash>[^)]*)\)\s*"
    r"(?:PARTITIONS\s+(?P<nb1>\d+)|INTO\s+(?P<nb2>\d+)\s+BUCKETS)\s*)?"
    r"AS\s+(?P<select>(?:SELECT|WITH|VALUES)\s.*)$",
    re.IGNORECASE | re.DOTALL,
)

#: Kudu-style hash partition clause (sql-parser.cup tbl_partition_clauses,
#: A/KuduPartitionParam.java): PARTITION BY HASH (cols) PARTITIONS n —
#: `INTO n BUCKETS` accepted as the bucket-count spelling.
_HASH_PART_RE = re.compile(
    r"\bPARTITION\s+BY\s+HASH\s*\(([^)]*)\)\s*"
    r"(?:PARTITIONS\s+(\d+)|INTO\s+(\d+)\s+BUCKETS)",
    re.IGNORECASE,
)
#: Kudu-style range partition clause (A/KuduPartitionParam.java, cup
#: tbl_partition_clauses): PARTITION BY RANGE (cols) ( PARTITION ... ) —
#: the body is balanced-paren extracted, not regexed.
_RANGE_PART_HDR_RE = re.compile(
    r"\bPARTITION\s+BY\s+RANGE\s*\(([^)]*)\)\s*\(", re.IGNORECASE
)


def _extract_range_partition_clause(q: str):
    """Strip a PARTITION BY RANGE clause from a CREATE TABLE statement.
    Returns (range_cols, parsed_spec, statement_without_clause) or None.
    Only text before a CTAS body is considered, so a window's
    PARTITION BY inside the SELECT can never match."""
    limit = len(q)
    mas = re.search(r"(?is)\bAS\s+(?:SELECT|WITH|VALUES)\b", q)
    if mas:
        limit = mas.start()
    m = _RANGE_PART_HDR_RE.search(q, 0, limit)
    if m is None:
        return None
    cols = [c.strip().strip("`") for c in m.group(1).split(",") if c.strip()]
    depth, j = 0, m.end() - 1
    while j < len(q):
        if q[j] == "(":
            depth += 1
        elif q[j] == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if depth != 0:
        raise ValueError(f"unbalanced range partition clause in: {q!r}")
    spec = ddl.parse_range_partition_items(q[m.end():j])
    return cols, spec, q[:m.start()] + " " + q[j + 1:]


def _sql_literal(v) -> str:
    """Render a range-partition bound back to SQL literal text."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


_CREATE_LIKE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>[\w`]+)\s+LIKE\s+(?P<like>[\w`]+)\s*$",
    re.IGNORECASE,
)
_CREATE_FUNCTION_RE = re.compile(
    r"^\s*CREATE\s+(?P<agg>AGGREGATE\s+)?FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[\w.`]+)\s*(?:\((?P<args>[^)]*)\))?\s*"
    r"(?:RETURNS\s+(?P<ret>\w+))?\s*(?P<opts>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_FUNCTION_RE = re.compile(
    r"^\s*DROP\s+(?:AGGREGATE\s+)?FUNCTION\s+(?:IF\s+EXISTS\s+)?"
    r"(?P<name>[\w.`]+)\s*(?:\([^)]*\))?\s*$",
    re.IGNORECASE,
)
_SYMBOL_RE = re.compile(r"SYMBOL\s*=\s*'([^']+)'|UPDATE_FN\s*=\s*'([^']+)'", re.IGNORECASE)

#: plain CREATE TABLE with column definitions (sql-parser.cup:2373
#: create_tbl_stmt); the column list is balanced-paren-extracted in
#: _create_table_with_cols since types nest parens (DECIMAL(18,4),
#: ARRAY<STRUCT<...>>).
_CREATE_TABLE_HDR_RE = re.compile(
    r"^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<table>[\w.`]+)\s*\(",
    re.IGNORECASE,
)

_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+VIEW\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.`]+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?AS\s+"
    r"(?P<select>(?:SELECT|WITH|VALUES)\s.*)$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_VIEW_RE = re.compile(
    r"^\s*ALTER\s+VIEW\s+(?P<name>[\w.`]+)\s+AS\s+"
    r"(?P<select>(?:SELECT|WITH|VALUES)\s.*)$",
    re.IGNORECASE | re.DOTALL,
)

_DROP_TABLE_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<table>[\w`]+)\s*(?P<purge>PURGE)?\s*$",
    re.IGNORECASE,
)
#: Impala-specific SHOW forms Spark SQL lacks (service/MetadataOp.java,
#: sql-parser.cup show_stmt): SHOW FILES IN t, SHOW TABLE/COLUMN STATS t,
#: SHOW PARTITIONS t, SHOW CREATE TABLE t, SHOW FUNCTIONS.
_SHOW_RE = re.compile(
    r"^\s*SHOW\s+(?P<kind>FILES\s+IN|TABLE\s+STATS|COLUMN\s+STATS|"
    r"RANGE\s+PARTITIONS|PARTITIONS|"
    r"CREATE\s+TABLE|CREATE\s+FUNCTION|FUNCTIONS)\s*(?P<target>[\w.`]+)?\s*$",
    re.IGNORECASE,
)

_DESCRIBE_DB_RE = re.compile(
    r"^\s*DESCRIBE\s+DATABASE\s+(?:EXTENDED\s+)?(?P<db>[\w`]+)\s*$", re.IGNORECASE
)

#: ALTER TABLE t SET COLUMN STATS col ('numDVs'='n', ...)
#: (A/AlterTableSetColumnStats.java — manual metastore column stats).
_SET_COL_STATS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.`]+)\s+SET\s+COLUMN\s+STATS\s+([\w`]+)"
    r"\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)

#: the reference's StatsKey spellings, in enum order
#: (catalog/ColumnStats.java:53-57)
_COL_STATS_KEYS = ("numDVs", "numNulls", "avgSize", "maxSize")

#: SHOW [AGGREGATE|ANALYTIC] FUNCTIONS [IN db] [[LIKE] 'pattern']
#: (sql-parser.cup show_functions_stmt + opt_function_category;
#: ShowFunctionsStmt carries a TFunctionCategory).
_SHOW_FUNCS_RE = re.compile(
    r"^\s*SHOW\s+(?:(?P<cat>AGGREGATE|ANALYTIC)\s+)?FUNCTIONS"
    r"(?:\s+IN\s+(?P<db>[\w`]+))?"
    r"(?:\s+(?:LIKE\s+)?'(?P<pat>[^']*)')?\s*$",
    re.IGNORECASE,
)

#: the reference's builtin category membership (catalog/BuiltinsDb —
#: AggregateFunction registrations and AnalyticExpr.java's fn whitelist).
_AGGREGATE_FNS = sorted({
    "appx_median", "avg", "count", "distinctpc", "distinctpcsa",
    "group_concat", "histogram", "max", "min", "ndv", "sample",
    "stddev", "stddev_pop", "stddev_samp", "sum",
    "var_pop", "var_samp", "variance", "variance_pop", "variance_samp",
})
_ANALYTIC_FNS = sorted({
    "cume_dist", "dense_rank", "first_value", "lag", "last_value",
    "lead", "ntile", "percent_rank", "rank", "row_number",
})

#: Impala query option -> Spark conf (subset that makes sense on Spark).
_QUERY_OPTIONS = {
    "num_nodes": None,  # no-op on Spark
    "mem_limit": None,
    "query_timeout_s": None,  # no-op on Spark (driver-side timeout)
    "disable_codegen": "spark.sql.codegen.wholeStage",  # inverted bool
    "broadcast_threshold": "spark.sql.autoBroadcastJoinThreshold",
}


def _range_partition_descriptions(t) -> list[str]:
    """Range-partition spelling shared by SHOW CREATE TABLE and SHOW
    RANGE PARTITIONS (ToSqlUtils / KuduTable range output): 'VALUE = v'
    and '[lo <=|<] VALUES [<|<= hi]' segments, scalar spelling for
    1-column keys."""
    single = len(t.range_cols) == 1

    def emit(tv) -> str:
        if single:
            return _sql_literal(tv[0])
        return "(" + ", ".join(_sql_literal(v) for v in tv) + ")"

    out: list[str] = []
    for item in t.range_spec:
        if item[0] == "value":
            out.append(f"VALUE = {emit(item[1])}")
        else:
            _, lo, loi, hi, hii = item
            seg = ""
            if lo is not None:
                seg += f"{emit(lo)} {'<=' if loi else '<'} "
            seg += "VALUES"
            if hi is not None:
                seg += f" {'<=' if hii else '<'} {emit(hi)}"
            out.append(seg)
    return out


def _print_bytes(n: int) -> str:
    """PB/TB/GB/MB/KB with 2 decimals, bare B below 1 KB
    (common/PrintUtils.java printBytes — 5000 -> '4.88KB')."""
    for unit, name in (
        (1 << 50, "PB"),
        (1 << 40, "TB"),
        (1 << 30, "GB"),
        (1 << 20, "MB"),
        (1 << 10, "KB"),
    ):
        if n >= unit:
            return f"{n / unit:.2f}{name}"
    return f"{n}B"


def _boolean_null_outputs(df: DataFrame) -> DataFrame:
    """Untyped NULL result columns present to clients as BOOLEAN for Hive
    compatibility (IMPALA-914, pinned by JdbcTest.testSelectNull — the
    FE's NULL_TYPE result slots surface as BOOLEAN). Spark types a bare
    ``SELECT NULL`` as void; cast those columns only. Positional, like
    _ntz_outputs, so duplicate output names stay intact."""
    fields = df.schema.fields
    if not any(f.dataType.typeName() == "void" for f in fields):
        return df
    tmp = [f"__bn{i}" for i in range(len(fields))]
    out = df.toDF(*tmp)
    exprs = [
        (
            F.col(t).cast("boolean").alias(t)
            if f.dataType.typeName() == "void"
            else F.col(t)
        )
        for t, f in zip(tmp, fields)
    ]
    return out.select(*exprs).toDF(*[f.name for f in fields])


def _ntz_outputs(df: DataFrame) -> DataFrame:
    """Cast LTZ timestamp result columns back to TIMESTAMP_NTZ. The stats
    session plans in LTZ (Spark 4.1.2's FilterEstimation can't estimate
    NTZ — session.register_stats_table), but the engine's Impala-parity
    surface is timezone-less timestamps; under the UTC session the cast
    is wall-clock exact.

    Truly positional (r10 ADVICE): name-based df[name] raises
    AMBIGUOUS_REFERENCE on duplicate output names (SELECT a.k, b.k), so
    rename to unique ordinals with toDF, cast, and rename back."""
    fields = df.schema.fields
    if not any(f.dataType.typeName() == "timestamp" for f in fields):
        return df
    names = [f.name for f in fields]
    tmp = [f"__ntz_c{i}" for i in range(len(fields))]
    tmp_df = df.toDF(*tmp)
    casts = [
        tmp_df[t].cast("timestamp_ntz").alias(t)
        if f.dataType.typeName() == "timestamp"
        else tmp_df[t]
        for t, f in zip(tmp, fields)
    ]
    return tmp_df.select(*casts).toDF(*names)


class ImpalaEngine:
    """SQL-string front door with Impala dialect + statement surface."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        strict: bool = False,
        server_name: str | None = None,
        user: str | None = None,
    ):
        self.spark = spark
        #: Sentry-style authorization (authz.py; SURVEY §2 row 15).
        #: server_name=None (the default, like the reference without
        #: --server_name) disables it entirely: auth statements raise the
        #: AuthorizationStmt gating text and no privilege checks run.
        from impala_spark.authz import AuthzPolicy

        self._authz = AuthzPolicy(server_name=server_name, user=user)
        #: strict=True: reject what Impala 2.7's analyzer rejects (exact
        #: messages); default is the permissive Spark superset.
        self.strict = strict
        #: APPX_COUNT_DISTINCT query option (SelectStmt.java:643-665)
        self.appx_count_distinct = False
        #: EXPLAIN_LEVEL query option (Planner.getExplainString levels)
        self.explain_level = 1
        #: name -> SYMBOL of functions created via CREATE FUNCTION
        self._functions: dict[str, str] = {}
        #: ALTER TABLE ... SET COLUMN STATS overrides, (table, column) ->
        #: {statsKey: value} — the engine analog of the manual metastore
        #: stats the reference writes (AlterTableSetColumnStats.java).
        #: SHOW COLUMN STATS reads these over the computed numbers.
        self._manual_col_stats: dict[tuple[str, str], dict] = {}
        #: session token -> function names already re-registered there
        #: (routed session clones own an isolated FunctionRegistry)
        self._synced_functions: dict[str, set[str]] = {}
        #: names created via CREATE VIEW in this engine (AlterTableStmt
        #: .java:76-79 needs to tell views from tables)
        self._views: set[str] = set()
        #: view name -> defining SELECT text, for audit view expansion
        #: (analysis registers SELECT events on a view's underlying
        #: tables — T/analysis/AuditingTest.java TestSelect)
        self._view_texts: dict[str, str] = {}
        #: input directory for the size-gated plan rewrites (None = unknown
        #: scale, keep Catalyst's default plans)
        self._sf_dir = sf_dir or None
        #: request pools / admission control (pools.py; the reference's
        #: RequestPoolService.java surface). None until
        #: configure_request_pools() attaches the config files.
        self._pool_service = None
        self._admission = None
        #: REQUEST_POOL query option ("" = let placement rules decide)
        self._request_pool = ""
        #: option keys the user SET explicitly — pool default query
        #: options never override these (admission-control precedence)
        self._user_set_options: set[str] = set()
        #: fixture tables promoted to stats-backed catalog tables by
        #: COMPUTE STATS (see session.register_stats_table)
        self._stats_tables: set[str] = set()
        #: managed (engine-created) promoted tables -> ddl.mutation_count
        #: at ANALYZE time; a drifted count demotes the table from the
        #: CBO posture until COMPUTE STATS re-runs (stale-stats guard)
        self._stats_versions: dict[str, int] = {}
        if sf_dir:
            register_tables(spark, sf_dir)
        # Impala's fnv_hash/murmur_hash have no Spark builtin equivalent —
        # register the exact-value pandas UDFs once per session (guarded:
        # engines are constructed per statement batch in some callers).
        if not getattr(spark, "_impala_hash_udfs", False):
            from impala_spark.functions import register_hash_udfs

            register_hash_udfs(spark)
            spark._impala_hash_udfs = True

    # -- request pools / admission (util/RequestPoolService.java) ----------
    def configure_request_pools(
        self, allocation_file: str, llama_site_file: str | None = None
    ) -> None:
        """Attach fair-scheduler + llama-site configs: query statements are
        admitted against the resolved pool's limits from here on (the
        reference wires this through --fair_scheduler_allocation_path /
        --llama_site_path)."""
        from impala_spark.pools import AdmissionController, RequestPoolService

        self._pool_service = RequestPoolService(allocation_file, llama_site_file)
        self._admission = AdmissionController(self._pool_service)

    def _admit(self, q: str):
        """Resolve the session's pool and take an admission slot for a
        query statement. Returns a token to release (None when admission
        is not configured). Planning happens under the slot; the byte
        estimate reuses the stats-backed gate the plan rewrites cost from."""
        if self._admission is None:
            return None
        import getpass

        from impala_spark.pools import PoolError

        user = self._authz.user or getpass.getuser()
        try:
            pool = self._pool_service.assign_to_pool(self._request_pool, user)
        except PoolError as e:
            raise ImpalaAnalysisError(str(e)) from e
        if pool is None:
            raise ImpalaAnalysisError(
                f"No mapping found for request from user '{user}' with "
                f"requested pool '{self._request_pool}'"
            )
        try:
            estimate = self._gate_input_bytes(q) if self._sf_dir else 0
        except Exception:
            estimate = 0
        return self._admission.admit(pool, user, estimate_bytes=estimate)

    # -- equivalence classes / layout advice (util/DisjointSet.java) -------
    def equiv_classes(self, query: str) -> list[set]:
        """Column equivalence classes implied by the statement's equality
        conjuncts (the analyzer's equivClassMembers surface,
        A/Analyzer.java:277, built on util/DisjointSet.java). Catalyst
        performs the corresponding predicate propagation at plan time;
        this surface exists for workload/layout analysis."""
        from impala_spark.equivalence import column_equiv_classes

        return column_equiv_classes(query)

    def colocation_advice(self, workload: list) -> list:
        """Rank a workload's join-key equivalence classes by statement
        coverage — the candidates for a hash-bucketed colocated layout
        (CREATE TABLE ... PARTITION BY HASH, ddl.py). When the engine
        knows its data directory, classes also carry the bytes a join
        would shuffle per use, and heavier classes win coverage ties."""
        import os as _os

        from impala_spark.equivalence import colocation_advice
        from impala_spark.session import TABLES

        sizes: dict[str, int] | None = None
        if self._sf_dir:
            sizes = {}
            for t in TABLES:
                p = _os.path.join(self._sf_dir, f"{t}.parquet")
                if _os.path.isfile(p):
                    sizes[t] = _os.path.getsize(p)
                elif _os.path.isdir(p):
                    sizes[t] = sum(
                        _os.path.getsize(_os.path.join(root, f))
                        for root, _d, files in _os.walk(p)
                        for f in files
                    )
        return colocation_advice(workload, table_bytes=sizes)

    # -- the main path (Frontend.createExecRequest analog) -----------------
    def sql(self, query: str) -> DataFrame:
        q = _hoist_with_clause(query.strip().rstrip(";"))
        q = _strip_session_db_refs(q, self.spark)

        if re.match(r"^\s*COMMENT\b", q, re.IGNORECASE):
            # no COMMENT statement in the 2.7 grammar (sql-parser.cup has
            # no comment_on rule) — reject like the parser, never fall
            # through to Spark's COMMENT ON
            raise ImpalaUnsupportedError(
                "Syntax error: COMMENT is not a statement in Impala 2.7 "
                "(use ALTER TABLE ... SET TBLPROPERTIES ('comment'='...'))"
            )

        from impala_spark import authz as _authz_mod

        if _authz_mod.is_authz_statement(q):
            # CREATE/DROP ROLE, GRANT/REVOKE, SHOW ROLES/GRANT ROLE —
            # privilege checks on catalog objects are skipped for these
            # (GrantRevokePrivStmt.java:31-34)
            return self._authz.execute(self.spark, q, engine=self)
        self._enforce_authz(q)

        m = _EXPLAIN_RE.match(q)
        if m and m.group(1).strip().upper().split()[0] not in ("ANALYZE",):
            # the reference authorizes EXPLAIN exactly like the inner
            # statement (Frontend analyzes before planning)
            self._enforce_authz(m.group(1).strip())
            return self._explain_df(m.group(1))

        m = _COMPUTE_STATS_RE.match(q)
        if m:
            return self.compute_stats(m.group(2).strip("`"))
        m = _DROP_STATS_RE.match(q)
        if m:
            # DROP STATS reverts the planner to the stats-less posture
            # (the reference drops the metastore stats and the planner
            # falls back to as-written plans) — here: the table leaves
            # the stats-routing set, so subsequent statements plan in
            # the default session again. Catalog numbers themselves are
            # harmless to keep (nothing reads them once unrouted).
            tname = m.group(2).strip("`")
            if tname.split(".")[-1] in self._views:
                # A/DropStatsStmt.java:89-91 exact text
                raise ImpalaAnalysisError(
                    f"DROP STATS not allowed on a view: {tname.split('.')[-1]}")
            if tname in self._stats_tables:
                self._stats_tables.discard(tname)
                self._stats_versions.pop(tname, None)
                return self.spark.sql(
                    "SELECT 'stats dropped (table left the CBO posture)' AS result"
                )
            return self.spark.sql("SELECT 'stats dropped (no-op on Spark)' AS result")
        m = _SET_RE.match(q)
        if m:
            return self.set_option(m.group(1), m.group(2))
        if re.match(r"^\s*SET\s*$", q, re.IGNORECASE):
            # bare SET lists query options (Impala shell behavior)
            rows = [
                ("appx_count_distinct", str(self.appx_count_distinct).lower()),
                ("explain_level", str(self.explain_level)),
                ("request_pool", self._request_pool),
            ]
            for opt, conf in sorted(_QUERY_OPTIONS.items()):
                if conf:
                    try:
                        val = str(self.spark.conf.get(conf))
                    except Exception:
                        val = "(unset)"
                else:
                    val = "(no-op on Spark)"
                rows.append((opt, val))
            return self.spark.createDataFrame(rows, "option: string, value: string")
        m = _USE_RE.match(q)
        if m:
            db = m.group(1).strip("`")
            try:
                self.spark.catalog.setCurrentDatabase(db)
            except Exception as e:
                # analysis/UseStmt / Analyzer.getDb error text
                raise ImpalaAnalysisError(f"Database does not exist: {db}") from e
            return self.spark.sql("SELECT current_database() AS db")

        m = _SHOW_FUNCS_RE.match(q)
        if m:
            return self.show_functions(
                category=(m.group("cat") or "").upper() or None,
                pattern=m.group("pat"),
                db=(m.group("db") or "").strip("`") or None,
            )
        m = _SHOW_RE.match(q)
        if m:
            kind = re.sub(r"\s+", " ", m.group("kind").upper().strip())
            target = (m.group("target") or "").strip("`")
            if target and kind in (
                "FILES IN", "TABLE STATS", "COLUMN STATS", "PARTITIONS",
                "RANGE PARTITIONS", "CREATE TABLE",
            ):
                # table-targeted metadata needs ANY privilege on the
                # object (AuthorizationChecker Privilege.ANY)
                self._authz.check_any_access(self.spark, target)
                bare_t = target.split(".")[-1]
                if kind == "CREATE TABLE" and bare_t in self._views:
                    # the definition exposes the underlying tables — the
                    # user needs privileges on each (TestShowCreateTable:
                    # "...to see the definition of view")
                    from impala_spark.authz import AuthorizationError
                    from impala_spark.rewrites import referenced_base_tables

                    refs = referenced_base_tables(
                        self._view_texts.get(bare_t, "")
                    )
                    for ref in sorted(refs or set()):
                        if not self._authz.visible_table(
                            self.spark, ref, include_column_privs=False
                        ):
                            raise AuthorizationError(
                                f"User '{self._authz.user}' does not have"
                                " privileges to see the definition of"
                                f" view 'default.{bare_t}'."
                            )
            if kind == "FILES IN":
                return self.show_files(target)
            if kind == "TABLE STATS":
                return self.show_table_stats(target)
            if kind == "COLUMN STATS":
                return self.show_column_stats(target)
            if kind == "RANGE PARTITIONS":
                return self.show_range_partitions(target)
            if kind == "PARTITIONS":
                return self.show_partitions(target)
            if kind == "CREATE TABLE":
                return self.show_create_table(target)
            if kind == "FUNCTIONS":
                return self.show_functions()
            if kind == "CREATE FUNCTION":
                # show_create_function_stmt (sql-parser.cup:5760s analog)
                name = target
                if name not in self._functions:
                    raise ImpalaAnalysisError(f"default.{name}() unknown")
                stmt = (
                    f"CREATE FUNCTION {name} LOCATION '<library>' "
                    f"SYMBOL='{self._functions[name]}'"
                )
                return self.spark.createDataFrame(
                    [(stmt,)], "create_function: string"
                )

        m = _DESCRIBE_DB_RE.match(q)
        if m:
            # describe_db_stmt: database metadata surface
            db = m.group("db").strip("`")
            try:
                return self.spark.sql(f"DESCRIBE DATABASE {db}")
            except Exception as e:
                raise ImpalaAnalysisError(f"Database does not exist: {db}") from e

        upper = q.upper()
        m = _INSERT_RE.match(q)
        if m and ddl.table_info(m.group("table").strip("`")) is None:
            tgt = m.group("table").strip("`")
            if tgt.split(".")[-1] in self._views:
                # InsertStmt.java:386-390 exact text
                raise ImpalaAnalysisError(
                    "Impala does not support INSERTing into views: "
                    f"default.{tgt.split('.')[-1]}")
            # never let a write statement fall through to Spark against a
            # read-only fixture view — it would try to write the view's
            # backing files.
            raise ValueError(
                f"INSERT target '{m.group('table')}' is not a managed table; "
                "create it with CTAS/CREATE TABLE first"
            )
        if m:
            static = None
            if m.group("part"):
                static = {}
                for kv in m.group("part").split(","):
                    k, eq, v = kv.partition("=")
                    if eq:  # static key; dynamic keys have no '='
                        static[k.strip().strip("`")] = v.strip().strip("'\"")
            hints = [
                h.lower()
                for h in re.findall(r"[A-Za-z_]+", m.group("hints") or "")
            ]
            return ddl.insert(
                self.spark,
                m.group("table").strip("`"),
                m.group("select"),
                overwrite=m.group("mode").upper() == "OVERWRITE",
                static_partition=static or None,
                columns=(m.group("cols").split(",")
                         if m.group("cols") is not None else None),
                hints=hints or None,
            )
        m = _CREATE_FUNCTION_RE.match(q)
        if m:
            # analysis/CreateUdfStmt.java:35-75 / CreateUdaStmt.java:30-60:
            # LOCATION points at a native binary — accepted and ignored
            # here; SYMBOL resolves into the Arrow-batched UDF library.
            sym = _SYMBOL_RE.search(m.group("opts") or "")
            symbol = (sym.group(1) or sym.group(2)) if sym else m.group("name").strip("`")
            name = m.group("name").strip("`")
            ifn.create_function(
                self.spark, name, symbol, aggregate=bool(m.group("agg"))
            )
            self._functions[name] = symbol
            return self.spark.sql(f"SELECT 'function {name} created' AS result")
        m = _DROP_FUNCTION_RE.match(q)
        if m:
            name = m.group("name").strip("`")
            existed = self._functions.pop(name, None)
            # Spark has no udf.unregister; the engine-side catalog entry is
            # what SHOW FUNCTIONS surfaces, so dropping it is the contract.
            status = "dropped" if existed else "did not exist"
            return self.spark.sql(f"SELECT 'function {name} {status}' AS result")
        rng = None
        if re.match(r"^\s*CREATE\s+TABLE\b", q, re.IGNORECASE):
            # PARTITION BY RANGE -> physical layout (r12): strip the
            # clause so the plain CTAS / column-list regexes apply, and
            # thread the parsed spec into the create
            ext = _extract_range_partition_clause(q)
            if ext is not None:
                rng_cols, rng_spec, q = ext
                rng = (rng_cols, rng_spec)
        m = _CTAS_RE.match(q)
        if m:
            tname = m.group("table").strip("`")
            if re.search(r"\bIF\s+NOT\s+EXISTS\b", q, re.IGNORECASE) and (
                ddl.table_info(tname) is not None
                or tname in self._views
                or self.spark.catalog.tableExists(tname)
            ):
                # IF NOT EXISTS CTAS keeps the existing object and skips
                # the select (CreateTableAsSelectStmt — the statement is
                # a no-op, it must not replace the table's rows)
                return self.spark.sql("SELECT 'table exists (kept)' AS result")
            # analysis/CreateTableStmt.java error text; non-strict mode
            # keeps create-or-replace so harness queries stay idempotent
            self._strict_create_guard(q, tname)
            if rng:
                if m.group("hash") or m.group("part"):
                    raise ImpalaUnsupportedError(
                        "PARTITION BY RANGE cannot be combined with other"
                        " partition clauses"
                    )
                return ddl.create_table_range_partitioned(
                    self.spark, tname, rng[0], rng[1],
                    query_or_df=m.group("select"),
                )
            if m.group("hash"):
                # PARTITION BY HASH -> persisted bucketed layout (r11)
                hcols = [
                    c.strip().strip("`")
                    for c in m.group("hash").split(",") if c.strip()
                ]
                n = int(m.group("nb1") or m.group("nb2"))
                return ddl.create_table_hash_bucketed(
                    self.spark, tname, hcols, n,
                    query_or_df=m.group("select"),
                )
            pcols = [c.strip().strip("`") for c in (m.group("part") or "").split(",") if c.strip()]
            return ddl.create_table_as_select(
                self.spark, m.group("table").strip("`"), m.group("select"),
                partition_cols=pcols or None,
            )
        m = _CREATE_LIKE_RE.match(q)
        if m:
            return ddl.create_table_like(
                self.spark, m.group("table").strip("`"), m.group("like").strip("`")
            )
        m = _CREATE_TABLE_HDR_RE.match(q)
        if m:
            return self._create_table_with_cols(q, m, rng=rng)
        m = re.match(
            r"(?is)^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\s+"
            r"(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>`[^`]+`|[\w.]+)\s+"
            r"STORED\s+AS\s+AVRO\b.*?"
            r"avro\.schema\.(?:literal'\s*=\s*'(?P<lit>(?:[^']|'')*)'"
            r"|url'\s*=\s*'(?P<url>[^']*)')", q)
        if m:
            # column list omitted: the Avro schema literal supplies it
            # (AvroSchemaUtils.extractAvroTblProps + AvroSchemaParser —
            # the reference infers the columns when none are declared,
            # CreateTableStmt.analyzeAvroSchema)
            from impala_spark.sources import avro_schema_to_cols

            tname = self._session_view_name(m.group("table"))
            if ddl.table_info(tname) is not None and re.search(
                r"\bIF\s+NOT\s+EXISTS\b", q, re.IGNORECASE
            ):
                return self.spark.sql("SELECT 'table exists (kept)' AS result")
            if m.group("lit") is not None:
                lit = m.group("lit").replace("''", "'")
            else:
                # avro.schema.url: read the schema file (file/hdfs-less
                # path over the local fs, HdfsUri analysis already ran)
                from urllib.parse import urlparse

                p = urlparse(m.group("url")).path or m.group("url")
                try:
                    with open(p) as fh:
                        lit = fh.read()
                except OSError as e:
                    raise ImpalaAnalysisError(
                        f"Failed to read Avro schema at: {m.group('url')}. "
                        f"{e.strerror}") from e
            cols = avro_schema_to_cols(lit)
            if not cols:
                raise ImpalaAnalysisError(
                    "An Avro table requires column definitions or an "
                    "Avro schema")
            return ddl.create_table(self.spark, tname, cols)
        m = _CREATE_VIEW_RE.match(q)
        if m:
            # analysis/CreateViewStmt.java. Fixture tables are session
            # temp views, so the view is session-scoped too (a persistent
            # Spark view cannot reference temp objects); within the
            # session it resolves through the catalog exactly like the
            # reference's LocalView.
            vname = self._session_view_name(m.group("name"))
            exists = any(
                v.name == vname for v in self.spark.catalog.listTables()
            )
            if exists and m.group("ine"):
                return self.spark.sql("SELECT 'view exists (kept)' AS result")
            if exists and self.strict:
                raise ImpalaAnalysisError(f"Table already exists: default.{vname}")
            cols = (m.group("cols") or "").strip()
            col_list = f" ({cols})" if cols else ""
            self._sql_with_impala_errors(
                f"CREATE OR REPLACE TEMPORARY VIEW {vname}{col_list} AS "
                + translate(m.group("select"), strict=self.strict)
            )
            self._views.add(vname)
            self._view_texts[vname] = m.group("select")
            return self.spark.sql(f"SELECT 'view {vname} created' AS result")
        m = _ALTER_VIEW_RE.match(q)
        if m:
            # analysis/AlterViewStmt.java: redefine an existing view
            vname = self._session_view_name(m.group("name"))
            if not any(v.name == vname for v in self.spark.catalog.listTables()):
                raise ImpalaAnalysisError(f"Table does not exist: default.{vname}")
            if vname not in self._views:
                # AlterViewStmt.java:50-53 exact text — without this the
                # redefinition would silently REPLACE a table's session
                # view with the new select
                raise ImpalaAnalysisError(
                    f"ALTER VIEW not allowed on a table: default.{vname}")
            self._sql_with_impala_errors(
                f"CREATE OR REPLACE TEMPORARY VIEW {vname} AS "
                + translate(m.group("select"), strict=self.strict)
            )
            self._view_texts[vname] = m.group("select")
            return self.spark.sql(f"SELECT 'view {vname} altered' AS result")
        m = re.match(
            r"(?is)^\s*(?P<op>CREATE|DROP)\s+(?:DATABASE|SCHEMA)\s+"
            r"(?P<ine>IF\s+(?:NOT\s+)?EXISTS\s+)?(?P<db>`[^`]+`|\w+)"
            r"(?P<tail>.*)$", q)
        if m:
            # db-DDL error parity (Analyzer.java:113-114, DropDbStmt.java
            # :73-76) — Spark's SCHEMA_* texts never surface
            db = m.group("db").strip("`")
            exists = any(
                d.name == db for d in self.spark.catalog.listDatabases()
            )
            if m.group("op").upper() == "CREATE":
                if exists and not m.group("ine"):
                    raise ImpalaAnalysisError(f"Database already exists: {db}")
            else:
                if not exists and not m.group("ine"):
                    raise ImpalaAnalysisError(f"Database does not exist: {db}")
                if exists and db.lower() in (
                    "default", self.spark.catalog.currentDatabase().lower()
                ):
                    raise ImpalaAnalysisError(
                        f"Cannot drop current default database: {db}")
                if exists and not re.search(
                    r"(?i)\bCASCADE\b", m.group("tail") or ""
                ) and any(
                    not t.isTemporary
                    for t in self.spark.catalog.listTables(db)
                ):
                    raise ImpalaAnalysisError(
                        f"Cannot drop non-empty database: {db}")
            return self._sql_with_impala_errors(q)
        m = _DROP_TABLE_RE.match(q)
        if m:
            tname = m.group("table").strip("`")
            if tname in self._views:
                # analysis/DropTableOrViewStmt.java:94-96 exact text
                raise ImpalaAnalysisError(
                    f"DROP TABLE not allowed on a view: default.{tname}")
            if ddl.table_info(tname) is not None:
                ddl.drop_table(self.spark, tname, purge=True)
                return self.spark.sql("SELECT 'dropped' AS result")
            if not self.spark.catalog.tableExists(tname):
                if re.search(r"\bIF\s+EXISTS\b", q, re.IGNORECASE):
                    return self.spark.sql("SELECT 'did not exist' AS result")
                # analysis/DropTableOrViewStmt.java error text
                raise ImpalaAnalysisError(f"Table does not exist: default.{tname}")
        if upper.startswith("ALTER TABLE"):
            m2 = re.match(r"ALTER\s+TABLE\s+(`[^`]+`|\S+)", q, re.IGNORECASE)
            if m2 and m2.group(1).strip("`") in self._views:
                # AlterTableStmt.java:76-79
                raise ImpalaAnalysisError(
                    "ALTER TABLE not allowed on a view: "
                    + m2.group(1).strip("`")
                )
            m2 = _SET_COL_STATS_RE.match(q)
            if m2:
                return self._set_column_stats(
                    m2.group(1).strip("`"), m2.group(2).strip("`"), m2.group(3)
                )
            return ddl.alter_table(self.spark, q)
        if upper.startswith(("UPDATE ", "DELETE ", "UPSERT ")):
            mt = re.match(
                r"(?is)^\s*(UPDATE|DELETE|UPSERT)\s+(?:FROM\s+|INTO\s+)?"
                r"(?:TABLE\s+)?(`[^`]+`|[\w.]+)", q)
            if mt and mt.group(2).strip("`").split(".")[-1] in self._views:
                kind = mt.group(1).upper()
                if kind == "UPSERT":
                    # InsertStmt.java:386-390 (op name UPSERT)
                    raise ImpalaAnalysisError(
                        "Impala does not support UPSERTing into views: "
                        f"default.{mt.group(2).strip('`').split('.')[-1]}")
                # ModifyStmt analysis rejects view targets
                raise ImpalaAnalysisError(
                    "Impala does not support modifying a non-Kudu table: "
                    f"default.{mt.group(2).strip('`').split('.')[-1]}")
            return ddl.modify(self.spark, q, strict=self.strict)
        if upper.startswith("TRUNCATE"):
            return ddl.truncate(self.spark, q)
        if upper.startswith("LOAD DATA"):
            return ddl.load_data(self.spark, q)
        if upper.startswith(("INVALIDATE METADATA", "REFRESH")):
            # REFRESH t [PARTITION (spec)] (IMPALA-1683, 2.7): the
            # partition spec narrows the reload in the reference; Spark's
            # refreshTable reloads the table's file listing either way
            m = re.match(
                r"(?is)^\s*(?:INVALIDATE\s+METADATA|REFRESH)\s+"
                r"(`[^`]+`|[\w.]+)\s*(?:PARTITION\s*\([^)]*\)\s*)?$", q)
            target = m.group(1).strip("`") if m else None
            if target and target.upper() != "METADATA":
                self.spark.catalog.refreshTable(target)
            else:
                self.spark.catalog.clearCache()
            return self.spark.sql("SELECT 'metadata refreshed' AS result")

        if upper.startswith("DROP VIEW"):
            m2 = re.match(
                r"DROP\s+VIEW\s+(?:IF\s+EXISTS\s+)?(`[^`]+`|\S+)", q,
                re.IGNORECASE,
            )
            if m2:
                vname = m2.group(1).strip("`")
                if vname not in self._views and (
                    ddl.table_info(vname) is not None
                    or self.spark.catalog.tableExists(vname)
                ):
                    # DropTableOrViewStmt.java:97-99 exact text
                    raise ImpalaAnalysisError(
                        f"DROP VIEW not allowed on a table: default.{vname}")
                # keep the view registry in sync for ALTER TABLE checks
                self._views.discard(vname)
                self._view_texts.pop(vname, None)
        if self.appx_count_distinct:
            from impala_spark.parser import rewrite_appx_count_distinct

            q = rewrite_appx_count_distinct(q)
        token = self._admit(q)
        try:
            return self._run_query_stmt(q)
        finally:
            if token is not None:
                token.release()

    def _run_query_stmt(self, q: str) -> DataFrame:
        # strict-mode analysis always runs on the USER's text first
        sql_text = translate(q, strict=self.strict)
        rw = self._plan_rewrite(q)
        sess = self._route_session(q)
        # two-pass global rank (r12) composes on top of the distinct
        # rewrite's output when both fire (the rewritten text re-emits
        # the user's ranking window over the joined group rows)
        grk = self._global_rank_df(rw if rw is not None else q, sess)
        if grk is not None:
            df = grk
            orig_cols = self._sql_with_impala_errors(sql_text, spark=sess).columns
            if df.columns != orig_cols:
                df = df.toDF(*orig_cols)
        elif rw is not None:
            df = self._sql_with_impala_errors(translate(rw), spark=sess)
            # The rewrite renames UNALIASED aggregate outputs (__cd0/__a0,
            # r10 ADVICE): restore the original statement's output names
            # positionally. Analysis-only — the unrewritten frame is never
            # executed, and the rewrite preserves select-item order/count.
            orig_cols = self._sql_with_impala_errors(sql_text, spark=sess).columns
            if df.columns != orig_cols:
                df = df.toDF(*orig_cols)
        else:
            df = self._sql_with_impala_errors(sql_text, spark=sess)
        if sess is not self.spark:
            df = _ntz_outputs(df)
        return _boolean_null_outputs(df)

    def _enforce_authz(self, q: str) -> None:
        """Privilege enforcement (authorization/AuthorizationChecker.java
        — the reference's Frontend registers PrivilegeRequests during
        analysis and fails before planning). No-op unless the engine was
        constructed with server_name. Classification is by statement
        kind; referenced tables come from the rewrite layer's resolver,
        with its 'unknown shape' answer treated conservatively (only a
        database- or server-scope grant authorizes). Table-targeted
        SHOW/DESCRIBE metadata surfaces require ANY privilege on the
        object and COMPUTE STATS requires ALL (check_metadata_access /
        engine routing)."""
        if not self._authz.server_name:
            return
        from impala_spark.rewrites import referenced_base_tables

        mw = re.match(r"\s*([A-Za-z_]+)", q)
        head = mw.group(1).upper() if mw else ""
        if head in ("SELECT", "WITH", "VALUES"):
            refs = referenced_base_tables(q)
            self._authz.check_access(
                self.spark, q, "SELECT",
                sorted(refs) if refs is not None else None,
            )
        elif head in ("INSERT", "UPSERT"):
            m = re.match(
                r"(?is)^\s*(?:INSERT|UPSERT)\s+(?:INTO|OVERWRITE)\s+"
                r"(?:TABLE\s+)?(`[^`]+`|[\w.]+)", q)
            target = m.group(1).strip("`") if m else None
            sel = q[q.upper().find("SELECT"):] if "SELECT" in q.upper() else ""
            refs = referenced_base_tables(sel) if sel else set()
            self._authz.check_access(
                self.spark, q, "INSERT",
                sorted(refs) if refs is not None else None, target,
            )
        elif head in ("UPDATE", "DELETE", "TRUNCATE"):
            m = re.match(
                r"(?is)^\s*(?:UPDATE\s+|DELETE\s+(?:FROM\s+)?|TRUNCATE\s+"
                r"(?:TABLE\s+)?(?:IF\s+EXISTS\s+)?)(`[^`]+`|[\w.]+)", q)
            if m:
                target = m.group(1).strip("`")
                # join-form DELETE names the target by ALIAS — resolve it
                # against the FROM clause so the ALL check lands on the
                # real table, not the alias
                fm = re.match(r"(?is)^\s*DELETE\s+([\w`]+)\s+FROM\s+(.*)$", q)
                if fm and ddl.table_info(target) is None:
                    try:
                        target = ddl._resolve_modify_target(
                            fm.group(1), fm.group(2))
                    except ValueError:
                        pass
                self._authz.check_access(self.spark, q, head, [], target)
        elif head == "USE":
            # TestUseDb: USE requires ANY privilege on the database
            m = re.match(r"(?is)^\s*USE\s+(`[^`]+`|\w+)", q)
            if m and not self._authz.visible_db(
                self.spark, m.group(1).strip("`")
            ):
                from impala_spark.authz import AuthorizationError

                raise AuthorizationError(
                    f"User '{self._authz.user}' does not have privileges"
                    f" to access: {m.group(1).strip('`')}.*"
                )
        elif head in ("INVALIDATE", "REFRESH"):
            # TestResetMetadata: table-targeted reset needs table-level
            # ANY (column-only grants insufficient); bare INVALIDATE
            # METADATA is a server-scope action
            m = re.match(
                r"(?is)^\s*(?:INVALIDATE\s+METADATA|REFRESH)\s+"
                r"(`[^`]+`|[\w.]+)", q)
            if m and m.group(1).upper() != "FUNCTIONS":
                self._authz.check_any_access(
                    self.spark, m.group(1).strip("`"))
            elif not m and head == "INVALIDATE":
                from impala_spark.authz import AuthorizationError

                if not any(
                    p.scope == "SERVER"
                    for r in self._authz._roles_of(self._authz.user)
                    for p in self._authz.role_privs.get(r, ())
                ):
                    raise AuthorizationError(
                        f"User '{self._authz.user}' does not have "
                        "privileges to access: server"
                    )
        elif head in ("CREATE", "DROP") and re.match(
                r"(?is)^\s*\w+\s+(?:AGGREGATE\s+)?FUNCTION\b", q):
            # function management is server-admin only (TestFunction)
            self._authz.check_create_drop_functions()
        elif head == "SHOW" and re.match(
                r"(?is)^\s*SHOW\s+(?:AGGREGATE\s+|ANALYTIC\s+)?FUNCTIONS\b",
                q):
            # SHOW FUNCTIONS needs ANY privilege on the db (TestFunction:
            # "show functions" errors, "show functions in tpch" passes)
            m = re.match(
                r"(?is)^\s*SHOW\s+(?:AGGREGATE\s+|ANALYTIC\s+)?FUNCTIONS"
                r"(?:\s+IN\s+(`[^`]+`|\w+))?", q)
            db = (m.group(1) or "").strip("`") if m else ""
            db = db or self.spark.catalog.currentDatabase()
            if not self._authz.visible_db(self.spark, db):
                from impala_spark.authz import AuthorizationError

                raise AuthorizationError(
                    f"User '{self._authz.user}' does not have privileges"
                    f" to access: {db}"
                )
        elif head in ("CREATE", "DROP", "ALTER") and re.match(
                r"(?is)^\s*\w+\s+(TABLE|VIEW)\b", q):
            self._authz.check_access(
                self.spark, q, "DROP" if head == "DROP" else "CREATE", [])
        elif head == "DESCRIBE":
            m = re.match(
                r"(?is)^\s*DESCRIBE\s+(?P<fmt>FORMATTED\s+|EXTENDED\s+)?"
                r"(?P<t>`[^`]+`|[\w.]+)\s*$", q)
            if m and m.group("t").upper() != "DATABASE":
                # plain DESCRIBE accepts column-level grants; FORMATTED
                # needs table scope or higher (TestDescribe)
                self._authz.check_any_access(
                    self.spark, m.group("t").strip("`"),
                    allow_column_privs=m.group("fmt") is None)
        elif head == "COMPUTE":
            # COMPUTE [INCREMENTAL] STATS needs ALL on the table (the
            # 2.x Sentry model has no ALTER privilege level)
            m = re.match(
                r"(?is)^\s*COMPUTE\s+(?:INCREMENTAL\s+)?STATS\s+"
                r"(`[^`]+`|[\w.]+)", q)
            if m:
                self._authz.check_access(
                    self.spark, q, "COMPUTE STATS", [],
                    m.group(1).strip("`"))
        elif head == "LOAD":
            # LOAD DATA INPATH 'uri' INTO TABLE t: the reference requires
            # ALL on the URI (AuthorizeableUri) + INSERT on the target
            m = re.match(
                r"(?is)^\s*LOAD\s+DATA\s+INPATH\s+'([^']*)'\s+"
                r"(?:OVERWRITE\s+)?INTO\s+TABLE\s+(`[^`]+`|[\w.]+)", q)
            if m:
                self._authz.check_uri_access(m.group(1))
                self._authz.check_access(
                    self.spark, q, "INSERT", [], m.group(2).strip("`"))

    # -- auditing (Analyzer.getAccessEvents analog) ---------------------------
    def _qual(self, name: str) -> str:
        name = name.strip("`")
        if "." in name:
            return name.lower()
        return f"{self.spark.catalog.currentDatabase()}.{name}".lower()

    def _obj_type(self, name: str) -> str:
        return "VIEW" if name.strip("`").split(".")[-1] in self._views \
            else "TABLE"

    def _select_events(self, q: str) -> set[tuple[str, str, str]]:
        """SELECT events with view expansion: a view reference records
        the view AND its underlying objects, transitively
        (AuditingTest.TestSelect — view_view yields 3 events)."""
        from impala_spark.rewrites import audit_table_refs

        events: set[tuple[str, str, str]] = set()
        pending = [q]
        seen_views: set[str] = set()
        while pending:
            text = pending.pop()
            for ref in audit_table_refs(text):
                bare = ref.split(".")[-1]
                if bare in self._views:
                    events.add((self._qual(ref), "VIEW", "SELECT"))
                    if bare not in seen_views:
                        seen_views.add(bare)
                        pending.append(self._view_texts.get(bare, ""))
                else:
                    events.add((self._qual(ref), "TABLE", "SELECT"))
        return events

    def access_events(self, q: str) -> set[tuple[str, str, str]]:
        """The access events analysis would register for ``q`` — the
        reference's Analyzer.getAccessEvents() (A/Analyzer.java
        addAccessEvent callers; verdicts pinned by
        T/analysis/AuditingTest.java). Returns a de-duplicated set of
        (fully-qualified name, object type, privilege) triples:

        * SELECT records each base table; a view records the view AND
          its underlying objects transitively; CTE names never appear
          but tables inside CTE bodies do even if the body is unused.
        * EXPLAIN audits like the statement it explains; INVALIDATE
          METADATA / REFRESH record nothing; USE records (db, ANY).
        * INSERT/UPSERT: INSERT on the target + SELECT on sources;
          UPDATE/DELETE: SELECT + INSERT on the target plus SELECT on
          FROM-clause sources; LOAD DATA / TRUNCATE: INSERT.
        * DDL: CREATE/DROP on the object; LIKE sources VIEW_METADATA;
          RENAME adds CREATE on the new name; COMPUTE/DROP STATS is
          ALTER; DESCRIBE is ANY, DESCRIBE FORMATTED/EXTENDED and the
          SHOW metadata surfaces are VIEW_METADATA.

        Not reproduced: the reference's `_impala_builtins` DATABASE
        VIEW_METADATA artifact (a side effect of its builtin-function
        resolution inside rewritten subqueries — our function registry
        is not a catalog database).
        """
        text = q.strip().rstrip(";")
        mw = re.match(r"\s*([A-Za-z_]+)", text)
        head = mw.group(1).upper() if mw else ""

        if head == "EXPLAIN":
            return self.access_events(text[len("EXPLAIN"):])
        if head == "USE":
            m = re.match(r"(?is)^\s*USE\s+(`[^`]+`|\w+)", text)
            return {(m.group(1).strip("`").lower(), "DATABASE", "ANY")} \
                if m else set()
        if head in ("INVALIDATE", "REFRESH"):
            return set()
        if head in ("SELECT", "WITH", "VALUES"):
            return self._select_events(text)
        if head in ("INSERT", "UPSERT"):
            m = re.match(
                r"(?is)^\s*(?:INSERT|UPSERT)\s+(?:INTO|OVERWRITE)\s+"
                r"(?:TABLE\s+)?(`[^`]+`|[\w.]+)", text)
            events: set[tuple[str, str, str]] = set()
            if m:
                events.add((self._qual(m.group(1)), "TABLE", "INSERT"))
            up = text.upper()
            for kw in ("SELECT", "WITH"):
                pos = up.find(kw)
                if pos >= 0:
                    events |= self._select_events(text[pos:])
                    break
            return events
        if head in ("UPDATE", "DELETE"):
            m = re.match(
                r"(?is)^\s*(?:UPDATE\s+|DELETE\s+(?:FROM\s+)?)"
                r"(`[^`]+`|[\w.]+)", text)
            events = set()
            if m:
                target = m.group(1).strip("`")
                fm = re.match(
                    r"(?is)^\s*(?:DELETE|UPDATE)\s+([\w`]+)\s+"
                    r"(?:FROM|SET)\s+(.*)$", text)
                if fm and ddl.table_info(target) is None \
                        and fm.group(1).strip("`") == target:
                    try:
                        rest = fm.group(2)
                        from_m = re.search(r"(?is)\bFROM\s+(.*)$", text)
                        if head == "DELETE" or from_m:
                            src = from_m.group(1) if from_m else rest
                            target = ddl._resolve_modify_target(
                                fm.group(1), src)
                    except ValueError:
                        pass
                events.add((self._qual(target), "TABLE", "SELECT"))
                events.add((self._qual(target), "TABLE", "INSERT"))
            from_m = re.search(r"(?is)\bFROM\s", text)
            if from_m:
                events |= self._select_events(text[from_m.start():])
            return events
        if head == "TRUNCATE":
            m = re.match(
                r"(?is)^\s*TRUNCATE\s+(?:TABLE\s+)?(?:IF\s+EXISTS\s+)?"
                r"(`[^`]+`|[\w.]+)", text)
            return {(self._qual(m.group(1)), "TABLE", "INSERT")} \
                if m else set()
        if head == "LOAD":
            m = re.search(r"(?is)\bINTO\s+TABLE\s+(`[^`]+`|[\w.]+)", text)
            return {(self._qual(m.group(1)), "TABLE", "INSERT")} \
                if m else set()
        if head == "COMPUTE" or (head == "DROP" and re.match(
                r"(?is)^\s*DROP\s+(?:INCREMENTAL\s+)?STATS\b", text)):
            m = re.search(
                r"(?is)\bSTATS\s+(`[^`]+`|[\w.]+)", text)
            return {(self._qual(m.group(1)), "TABLE", "ALTER")} \
                if m else set()
        if head == "CREATE":
            m = re.match(
                r"(?is)^\s*CREATE\s+DATABASE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
                r"(`[^`]+`|\w+)", text)
            if m:
                return {(m.group(1).strip("`").lower(), "DATABASE",
                         "CREATE")}
            m = re.match(
                r"(?is)^\s*CREATE\s+VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?"
                r"(`[^`]+`|[\w.]+)", text)
            if m:
                events = {(self._qual(m.group(1)), "VIEW", "CREATE")}
                am = re.search(r"(?is)\bAS\s+(SELECT|WITH|VALUES)\b", text)
                if am:
                    events |= self._select_events(text[am.start(1):])
                return events
            m = re.match(
                r"(?is)^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\s+"
                r"(?:IF\s+NOT\s+EXISTS\s+)?(`[^`]+`|[\w.]+)", text)
            if m:
                events = {(self._qual(m.group(1)), "TABLE", "CREATE")}
                lm = re.search(
                    r"(?is)\bLIKE\s+(PARQUET\s+'[^']*'|`[^`]+`|[\w.]+)",
                    text)
                if lm and not lm.group(1).upper().startswith("PARQUET"):
                    events.add((self._qual(lm.group(1)), "TABLE",
                                "VIEW_METADATA"))
                am = re.search(r"(?is)\bAS\s+(SELECT|WITH)\b", text)
                if am:
                    events |= self._select_events(text[am.start(1):])
                return events
            return set()
        if head == "DROP":
            m = re.match(
                r"(?is)^\s*DROP\s+(DATABASE|SCHEMA|VIEW|TABLE)\s+"
                r"(?:IF\s+EXISTS\s+)?(`[^`]+`|[\w.]+)", text)
            if not m:
                return set()
            kind, name = m.group(1).upper(), m.group(2)
            if kind in ("DATABASE", "SCHEMA"):
                return {(name.strip("`").lower(), "DATABASE", "DROP")}
            objtype = "VIEW" if kind == "VIEW" else self._obj_type(name)
            return {(self._qual(name), objtype, "DROP")}
        if head == "ALTER":
            m = re.match(
                r"(?is)^\s*ALTER\s+(TABLE|VIEW)\s+(`[^`]+`|[\w.]+)", text)
            if not m:
                return set()
            objtype = "VIEW" if m.group(1).upper() == "VIEW" \
                else self._obj_type(m.group(2))
            events = {(self._qual(m.group(2)), objtype, "ALTER")}
            rm = re.search(
                r"(?is)\bRENAME\s+TO\s+(`[^`]+`|[\w.]+)", text)
            if rm:
                events.add((self._qual(rm.group(1)), objtype, "CREATE"))
            am = re.search(r"(?is)\bAS\s+(SELECT|WITH)\b", text)
            if am and m.group(1).upper() == "VIEW":
                events |= self._select_events(text[am.start(1):])
            return events
        if head == "DESCRIBE":
            m = re.match(
                r"(?is)^\s*DESCRIBE\s+DATABASE\s+(?:EXTENDED\s+|FORMATTED\s+)?"
                r"(`[^`]+`|\w+)", text)
            if m:
                return {(m.group(1).strip("`").lower(), "DATABASE",
                         "VIEW_METADATA")}
            m = re.match(
                r"(?is)^\s*DESCRIBE\s+(FORMATTED\s+|EXTENDED\s+)?"
                r"(`[^`]+`|[\w.]+)", text)
            if not m:
                return set()
            priv = "VIEW_METADATA" if m.group(1) else "ANY"
            # a nested-collection path audits the enclosing table
            name = m.group(2).strip("`")
            parts = name.split(".")
            if len(parts) > 2:
                name = ".".join(parts[:2])
            return {(self._qual(name), self._obj_type(name), priv)}
        if head == "SHOW":
            m = re.match(
                r"(?is)^\s*SHOW\s+(PARTITIONS|TABLE\s+STATS|COLUMN\s+STATS|"
                r"CREATE\s+TABLE|FILES\s+IN)\s+(`[^`]+`|[\w.]+)", text)
            if m:
                name = m.group(2)
                return {(self._qual(name), self._obj_type(name),
                         "VIEW_METADATA")}
            return set()
        return set()

    def _route_session(self, q: str):
        """Pick the session a plain query plans in. After COMPUTE STATS
        promoted every base table a SELECT reads, the statement plans in
        the stats session — CBO + catalog stats reproduce the broadcast
        shapes the registry otherwise needs hand hints for (the
        reference's stats-costed DistributedPlanner.java:420-536
        decision). Anything the scanner can't prove (views, engine-DDL
        tables, qualified names, derived tables) keeps the default
        session and Catalyst's stats-less planning."""
        if not self._stats_tables or self._sf_dir is None:
            return self.spark
        head = q.lstrip()[:8].upper().split(None, 1)
        if not head or head[0] not in ("SELECT", "WITH"):
            return self.spark
        from impala_spark.rewrites import referenced_base_tables

        refs = referenced_base_tables(q)
        if not refs:
            return self.spark
        for r in refs:
            if r not in self._stats_tables or r in self._views:
                return self.spark
            if r in self._stats_versions:
                # promoted as a MANAGED table: any write since ANALYZE
                # (or a DROP/RENAME) demotes it until stats recompute —
                # the catalog entry would read stale files otherwise
                info = ddl.table_info(r)
                if info is None or ddl.mutation_count(r) != self._stats_versions[r]:
                    self._stats_tables.discard(r)
                    self._stats_versions.pop(r, None)
                    return self.spark
            elif ddl.table_info(r) is not None:
                # fixture-promoted name now shadowed by an engine table:
                # the stats db entry points at the fixture, the session
                # name resolves to the engine table — never route
                return self.spark
        from impala_spark.session import stats_session

        sess = stats_session(self.spark, self._sf_dir)
        self._sync_functions(sess)
        return sess

    def _sync_functions(self, sess: SparkSession) -> None:
        """spark.newSession() clones own an ISOLATED FunctionRegistry, so
        a CREATE FUNCTION UDF registered on the default session would be
        unknown in the routed stats session (r10 ADVICE, high): register
        every engine function there before the statement plans. DROP
        FUNCTION parity matches the default session (Spark has no
        udf.unregister; the engine-side catalog is the contract)."""
        if not self._functions:
            return
        from impala_spark.session import _session_token

        synced = self._synced_functions.setdefault(_session_token(sess), set())
        for name, symbol in self._functions.items():
            if name in synced:
                continue
            entry = ifn.UDF_LIBRARY.get(symbol.strip().strip("'\""))
            ifn.create_function(
                sess, name, symbol, aggregate=bool(entry and entry[0])
            )
            synced.add(name)

    def _plan_rewrite(self, q: str) -> str | None:
        """Input-size-gated plan rewrites on plain user SQL — the engine
        analog of the reference's stats-driven aggregate planning
        (A/AggregateInfo.java:42-60 two-phase DISTINCT). Only fires above
        the rewrite's input-size knee, like queries.gate_broadcast_hints."""
        if self._sf_dir is None:
            return None
        from impala_spark.rewrites import (
            TWO_LEVEL_DISTINCT_MIN_INPUT_BYTES,
            two_level_distinct,
        )

        if self._gate_input_bytes(q) < TWO_LEVEL_DISTINCT_MIN_INPUT_BYTES:
            return None
        # session UDAs (CREATE AGGREGATE FUNCTION) must be recognized as
        # aggregates — an unknown aggregate name would read as a scalar fn
        return two_level_distinct(q, extra_aggs=frozenset(self._functions))

    def _global_rank_df(self, q: str, sess) -> DataFrame | None:
        """Two-pass global rank (r12): a statement whose select list
        carries a single GLOBAL ranking window executes as
        operators.global_rank — range exchange + slice-local window +
        broadcast offset join — instead of Spark's single-task
        WindowExec ("No Partition Defined"); the reference relies on its
        single-node analytic sort (planner/AnalyticPlanner.java), which
        has no distributed equivalent without this split. Gated on
        statement input size like the distinct rewrite."""
        if self._sf_dir is None:
            return None
        from impala_spark.rewrites import parse_global_rank

        plan = parse_global_rank(q)
        if plan is None:
            return None
        import impala_spark.rewrites as _rw_mod

        if self._gate_input_bytes(q) < _rw_mod.GLOBAL_RANK_MIN_INPUT_BYTES:
            return None
        from pyspark.sql import functions as F

        from impala_spark.functions import asc_impala, desc_impala
        from impala_spark.operators import global_rank

        base_df = self._sql_with_impala_errors(
            translate(plan.base_sql), spark=sess
        )
        # Impala default null ordering (ASC -> NULLS LAST, DESC -> NULLS
        # FIRST) — the translate shim injects this into SQL ORDER BYs;
        # the DataFrame path must match it explicitly.
        sort_cols = [
            (desc_impala if d else asc_impala)(F.col(f"__wo{i}"))
            for i, d in enumerate(plan.descending)
        ]
        # uniform direction: range-partition on the full order (better
        # balance); mixed: first key only — rows equal on it co-locate,
        # so cross-partition comparisons are decided by it alone
        uniform = len(set(plan.descending)) == 1
        part_cols = sort_cols if uniform else sort_cols[:1]
        ranked = global_rank(
            base_df, sort_cols, partition_order_by=part_cols,
            kind=plan.kind, out_col="__grank",
            num_partitions=int(
                sess.conf.get("spark.sql.shuffle.partitions", "32")
            ),
        )
        items = []
        for pos, alias in enumerate(plan.item_aliases):
            if pos == plan.win_pos:
                c = F.col("__grank")
                if plan.cast_type:
                    c = c.cast(plan.cast_type)
                items.append(c.alias(alias))
            else:
                items.append(ranked[alias])
        df = ranked.select(*items)
        if plan.out_order:
            ocols = []
            for name, desc, nulls in plan.out_order:
                c = df[name]
                if nulls == "FIRST":
                    c = c.desc_nulls_first() if desc else c.asc_nulls_first()
                elif nulls == "LAST":
                    c = c.desc_nulls_last() if desc else c.asc_nulls_last()
                else:
                    c = desc_impala(c) if desc else asc_impala(c)
                ocols.append(c)
            df = df.orderBy(*ocols)
        if plan.limit is not None:
            df = df.limit(plan.limit)
        return df

    def _gate_input_bytes(self, q: str) -> int:
        """Input-size estimate for the size-gated rewrites, preferring
        catalog stats over file sizes (r10 verdict task #5 — the
        reference costs every such decision from COMPUTE STATS numbers):
        per referenced table, catalog sizeInBytes when promoted, the
        table's own files when its path is known (fixture parquet /
        managed warehouse dir), and the whole fixture dir only as the
        conservative unknown-shape fallback."""
        import os as _os

        from impala_spark.rewrites import referenced_base_tables
        from impala_spark.session import (
            TABLES,
            _dir_total_bytes,
            table_stats_bytes,
        )

        fallback = _dir_total_bytes(self._sf_dir)
        refs = referenced_base_tables(q)
        if not refs:
            return fallback
        total = 0
        for r in refs:
            b = None
            if r in self._stats_tables and r not in self._views:
                b = table_stats_bytes(
                    self.spark, self._sf_dir, r, self._stats_versions.get(r, 0)
                )
            if b is None:
                info = ddl.table_info(r)
                if info is not None:
                    # fresh walk, not _dir_total_bytes: managed tables
                    # mutate, so a per-path size cache would go stale
                    b = 0
                    for root, _dirs, files in _os.walk(info.path):
                        for f in files:
                            try:
                                b += _os.path.getsize(_os.path.join(root, f))
                            except OSError:
                                pass
                elif r in TABLES and r not in self._views:
                    p = _os.path.join(self._sf_dir, f"{r}.parquet")
                    if _os.path.isfile(p):
                        try:
                            b = _os.path.getsize(p)
                        except OSError:
                            b = None
                    elif _os.path.isdir(p):
                        b = _dir_total_bytes(p)
            if b is None:
                return fallback  # view / unknown name: conservative
            total += b
        return total

    def _session_view_name(self, raw: str) -> str:
        """Resolve a possibly db-qualified view/table name to a session
        (temp-view) name. Fixture tables live as session temp views, so
        only the current database (`default`) is addressable; a
        qualified name in another database gets the reference's
        CreateTableOrViewStmt error rather than silently falling through
        to Spark-native parsing (analysis/CreateOrAlterViewStmtBase.java)."""
        name = raw.strip("`")
        if "." not in name:
            return name
        db, _, base = name.rpartition(".")
        db = db.strip("`")
        try:
            current = self.spark.catalog.currentDatabase()
        except Exception:
            current = "default"
        if db == current or db == "default":
            return base.strip("`")
        if not any(d.name == db for d in self.spark.catalog.listDatabases()):
            raise ImpalaAnalysisError(f"Database does not exist: {db}")
        raise ImpalaUnsupportedError(
            f"Views outside the current database are session-scoped on this "
            f"engine; USE {db} first, then CREATE VIEW {base.strip('`')}"
        )

    def _strict_create_guard(self, q: str, tname: str) -> None:
        """Strict mode: any catalog-resolvable name (engine table, engine
        view, or fixture view) blocks CREATE like the reference analyzer
        (CreateTableStmt/CreateViewStmt 'Table already exists'); without
        it a strict CREATE TABLE region would silently SHADOW the fixture
        session view. Permissive mode keeps create-or-replace."""
        if not self.strict or re.search(
            r"\bIF\s+NOT\s+EXISTS\b", q, re.IGNORECASE
        ):
            return
        if (
            ddl.table_info(tname) is not None
            or tname in self._views
            or self.spark.catalog.tableExists(tname)
        ):
            raise ImpalaAnalysisError(f"Table already exists: default.{tname}")

    def _create_table_with_cols(
        self, q: str, m: "re.Match[str]", rng: tuple | None = None
    ) -> DataFrame:
        """CREATE TABLE t (cols...) [PARTITIONED BY (...)] [STORED AS fmt]
        [LOCATION ...] — balanced-paren extraction of the column list,
        then ddl.create_table registers an empty managed table."""
        from impala_spark.sources import format_spec

        tname = self._session_view_name(m.group("table"))
        if re.search(r"\bIF\s+NOT\s+EXISTS\b", q, re.IGNORECASE) and (
            ddl.table_info(tname) is not None
            or tname in self._views
            or self.spark.catalog.tableExists(tname)
        ):
            # IF NOT EXISTS keeps ANY resolvable object — a managed
            # table, an engine view, or a fixture session view (shadowing
            # the fixture would silently empty the name)
            return self.spark.sql("SELECT 'table exists (kept)' AS result")
        self._strict_create_guard(q, tname)
        open_idx = m.end() - 1
        depth = 0
        close_idx = -1
        for i in range(open_idx, len(q)):
            if q[i] == "(":
                depth += 1
            elif q[i] == ")":
                depth -= 1
                if depth == 0:
                    close_idx = i
                    break
        if close_idx < 0:
            raise ValueError(f"unbalanced column list in: {q!r}")
        col_defs = q[open_idx + 1:close_idx]
        rest = q[close_idx + 1:]
        part_defs = None
        pm = re.search(r"(?is)\bPARTITIONED\s+BY\s*\(", rest)
        if pm:
            d, j = 0, pm.end() - 1
            while j < len(rest):
                if rest[j] == "(":
                    d += 1
                elif rest[j] == ")":
                    d -= 1
                    if d == 0:
                        break
                j += 1
            part_defs = rest[pm.end():j]
        hm = _HASH_PART_RE.search(rest)
        sm = re.search(r"(?is)\bSTORED\s+AS\s+(\w+)", rest)
        if sm and not ((hm or rng) and sm.group(1).upper() == "KUDU"):
            # STORED AS KUDU rides the hash/range-partition dialect (the
            # reference's only hash/range-partitioned storage); anything
            # else validates as before
            format_spec(sm.group(1))  # validate; unsupported formats raise
        am = re.search(
            r"(?is)avro\.schema\.(?:literal'\s*=\s*'(?P<lit>(?:[^']|'')*)'"
            r"|url'\s*=\s*'(?P<url>[^']*)')", rest)
        if am and sm and sm.group(1).upper() == "AVRO":
            # declared columns + an Avro schema: the schema wins, except
            # string-typed declarations keep their CHAR/VARCHAR width
            # (AvroSchemaUtils.reconcileSchemas; warnings-only surface)
            from impala_spark.sources import (
                avro_schema_to_cols,
                reconcile_avro_cols,
            )

            if am.group("lit") is not None:
                lit = am.group("lit").replace("''", "'")
            else:
                from urllib.parse import urlparse

                p = urlparse(am.group("url")).path or am.group("url")
                with open(p) as fh:
                    lit = fh.read()
            avro_cols = [
                tuple(x.strip().split(" ", 1))
                for x in avro_schema_to_cols(lit).split(", ") if x
            ]
            declared, _pk9 = ddl._parse_col_defs(col_defs, normalize=False)
            merged = reconcile_avro_cols(
                [(c, t) for c, t in declared], avro_cols)
            col_defs = ", ".join(f"{c} {t}" for c, t in merged)
        if rng:
            if part_defs or hm:
                raise ImpalaUnsupportedError(
                    "PARTITION BY RANGE cannot be combined with other"
                    " partition clauses"
                )
            return ddl.create_table_range_partitioned(
                self.spark, tname, rng[0], rng[1], col_defs=col_defs,
            )
        if hm:
            if part_defs:
                raise ImpalaUnsupportedError(
                    "PARTITIONED BY and PARTITION BY HASH cannot be combined"
                )
            hcols = [c.strip().strip("`") for c in hm.group(1).split(",") if c.strip()]
            n = int(hm.group(2) or hm.group(3))
            return ddl.create_table_hash_bucketed(
                self.spark, tname, hcols, n, col_defs=col_defs,
            )
        return ddl.create_table(self.spark, tname, col_defs, part_defs)

    def _sql_with_impala_errors(
        self, spark_sql: str, spark: SparkSession | None = None
    ) -> DataFrame:
        """Run translated SQL, remapping Catalyst resolution failures onto
        the reference's exact analyzer messages (Analyzer.java:~712
        "Could not resolve table reference", Path resolution
        "Could not resolve column/field reference")."""
        from pyspark.errors import AnalysisException

        try:
            return (spark or self.spark).sql(spark_sql)
        except AnalysisException as e:
            cond = ""
            for attr in ("getCondition", "getErrorClass"):
                try:
                    cond = getattr(e, attr)() or ""
                    if cond:
                        break
                except Exception:
                    continue
            params: dict[str, str] = {}
            try:
                params = e.getMessageParameters() or {}
            except Exception:
                pass

            def _name(*keys: str) -> str:
                for k in keys:
                    v = params.get(k)
                    if v:
                        return v.replace("`", "")
                return ""

            if cond.startswith("TABLE_OR_VIEW_NOT_FOUND"):
                raise ImpalaAnalysisError(
                    f"Could not resolve table reference: '{_name('relationName')}'"
                ) from e
            if cond.startswith(("UNRESOLVED_COLUMN", "UNRESOLVED_FIELD", "FIELD_NOT_FOUND")):
                raise ImpalaAnalysisError(
                    "Could not resolve column/field reference: "
                    f"'{_name('objectName', 'fieldName')}'"
                ) from e
            if cond.startswith("UNRESOLVED_ROUTINE"):
                rn = _name("routineName")
                label = rn if "." in rn else f"default.{rn}"
                raise ImpalaAnalysisError(f"{label}() unknown") from e
            if cond.startswith("AMBIGUOUS_REFERENCE"):
                raise ImpalaAnalysisError(
                    f"Column/field reference is ambiguous: '{_name('name')}'"
                ) from e
            raise

    # -- COMPUTE STATS -> ANALYZE TABLE (analysis/ComputeStatsStmt.java) ---
    def compute_stats(self, table: str) -> DataFrame:
        """Impala COMPUTE STATS: table row count + per-column NDV/nulls/sizes
        (ComputeStatsStmt.java:218-242 issues exactly these child queries).
        Spark: ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS feeds
        the same numbers to the CBO.

        Fixture tables are PROMOTED to stats-backed catalog tables
        (session.register_stats_table): subsequent plain SELECTs over
        only-promoted tables plan in the stats session, where CBO + join
        reorder reproduce the broadcast shapes the registry otherwise
        needs hand hints for — the reference's own coupling (COMPUTE
        STATS feeds DistributedPlanner.java:420-536's cost model; without
        it the planner runs left-deep as written).
        """
        if table.split(".")[-1] in self._views:
            raise ImpalaAnalysisError(
                f"COMPUTE STATS not supported for view: {table.split('.')[-1]}")
        from impala_spark.session import (
            TABLES,
            register_stats_managed,
            register_stats_table,
            stats_db_name,
        )

        tname = table.strip("`")
        info = ddl.table_info(tname)
        if info is not None and info.catalog_name:
            # hash-bucketed tables ARE catalog tables already: ANALYZE in
            # place (a LOCATION-pointing promotion would lose the bucket
            # spec, and with it the exchange-free joins the layout buys).
            # NTZ columns excluded — Spark 4.1.2's FilterEstimation
            # MatchError with CBO on (see the catalog-table path below).
            cols = [
                f.name
                for f in self.spark.table(info.catalog_name).schema.fields
                if f.dataType.typeName() != "timestamp_ntz"
            ]
            if cols:
                self.spark.sql(
                    f"ANALYZE TABLE {info.catalog_name} COMPUTE STATISTICS"
                    " FOR COLUMNS " + ", ".join(f"`{c}`" for c in cols)
                )
            else:
                self.spark.sql(
                    f"ANALYZE TABLE {info.catalog_name} COMPUTE STATISTICS"
                )
            self.spark.conf.set("spark.sql.cbo.enabled", "true")
            self.spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
            all_cols = self.spark.table(info.catalog_name).columns
            ndvs = ", ".join(
                f"approx_count_distinct(`{c}`) AS ndv_{c}" for c in all_cols
            )
            return self.spark.sql(
                f"SELECT count(*) AS row_count, {ndvs} FROM {info.catalog_name}"
            )
        if self._sf_dir and info is not None and tname not in self._views:
            # engine-created (CTAS/CREATE TABLE/INSERT target) table: the
            # reference's ComputeStatsStmt works on ANY catalog table —
            # promote it into the same stats db as the fixtures. Always
            # re-creates + re-ANALYZEs (mutable source; stale-memo guard).
            version = ddl.mutation_count(tname)
            if register_stats_managed(self.spark, self._sf_dir, info):
                self._stats_tables.add(tname)
                self._stats_versions[tname] = version
                db = stats_db_name(self._sf_dir)
                cols = self.spark.table(f"{db}.`{tname}`").columns
                ndvs = ", ".join(
                    f"approx_count_distinct(`{c}`) AS ndv_{c}" for c in cols
                )
                return self.spark.sql(
                    f"SELECT count(*) AS row_count, {ndvs} FROM {db}.`{tname}`"
                )
        if (
            self._sf_dir
            and tname in TABLES
            and tname not in self._views
            and ddl.table_info(tname) is None
            and register_stats_table(self.spark, self._sf_dir, tname)
        ):
            self._stats_tables.add(tname)
            db = stats_db_name(self._sf_dir)
            # same output contract as the temp-view path: the reference's
            # child-query numbers (row count + per-column NDV)
            cols = self.spark.table(f"{db}.`{tname}`").columns
            ndvs = ", ".join(
                f"approx_count_distinct(`{c}`) AS ndv_{c}" for c in cols
            )
            return self.spark.sql(
                f"SELECT count(*) AS row_count, {ndvs} FROM {db}.`{tname}`"
            )
        is_temp_view = any(
            t.name == table and t.tableType in ("TEMPORARY", "TEMP")
            for t in self.spark.catalog.listTables()
        )
        if is_temp_view:
            # ANALYZE doesn't work on temp views; compute the reference's
            # child-query stats directly so callers still get numbers.
            cols = self.spark.table(table).columns
            ndvs = ", ".join(
                f"approx_count_distinct(`{c}`) AS ndv_{c}" for c in cols
            )
            return self.spark.sql(f"SELECT count(*) AS row_count, {ndvs} FROM `{table}`")
        # Exclude TIMESTAMP_NTZ columns: Spark 4.1.2's FilterEstimation
        # has no TimestampNTZType case (MatchError at
        # FilterEstimation.scala:281, found r10) — with CBO on, NTZ
        # column stats crash the optimizer on the first join + NTZ
        # comparison (repro: two analyzed bucketed tables, ts filter).
        # The table keeps row-count stats; NTZ predicates just estimate
        # at default selectivity.
        cols = [
            f.name
            for f in self.spark.table(table).schema.fields
            if f.dataType.typeName() != "timestamp_ntz"
        ]
        if cols:
            self.spark.sql(
                f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS "
                + ", ".join(f"`{c}`" for c in cols)
            )
        else:
            self.spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
        # Stats unlock cost-based planning — the same coupling as the
        # reference (COMPUTE STATS is what feeds Impala's cost model;
        # without it the planner falls back to as-written join order).
        # The session default is cbo off because over stats-less,
        # path-based temp views CBO only adds per-plan metadata walks
        # (session.py); once catalog stats exist it starts paying for
        # join reordering and explain() cardinality annotations.
        self.spark.conf.set("spark.sql.cbo.enabled", "true")
        self.spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        return self.spark.sql(f"DESCRIBE EXTENDED {table}")

    # -- SET (query options) ------------------------------------------------
    def set_option(self, key: str, value: str) -> DataFrame:
        k = key.lower()
        self._user_set_options.add(k)
        if k == "request_pool":
            # REQUEST_POOL: validated against the placement policy right
            # away when pools are configured; the pool's default query
            # options apply UNDER anything the user set explicitly
            # (admission-control option precedence)
            pool = value.strip("'\" ")
            if self._pool_service is not None and pool:
                import getpass

                user = self._authz.user or getpass.getuser()
                resolved = self._pool_service.assign_to_pool(pool, user)
                if resolved is None or not self._pool_service.has_access(resolved, user):
                    raise ImpalaAnalysisError(
                        f"Request from user '{user}' with requested pool "
                        f"'{pool}' denied access to assigned pool"
                    )
                self._request_pool = pool
                defaults = self._pool_service.get_pool_config(resolved).default_query_options
                for item in filter(None, (s.strip() for s in defaults.split(","))):
                    dk, _, dv = item.partition("=")
                    dk = dk.strip().lower()
                    # unknown options are dropped like the backend's
                    # query-option parser; user-set options win
                    if dk in self._user_set_options or (
                        dk not in _QUERY_OPTIONS
                        and dk not in ("appx_count_distinct", "explain_level")
                    ):
                        continue
                    self.set_option(dk, dv.strip())
                    self._user_set_options.discard(dk)
            else:
                self._request_pool = pool
            return self.spark.createDataFrame(
                [(key, "set")], "option: string, status: string"
            )
        if k == "appx_count_distinct":
            # SelectStmt.java:643-665 — rewrite count(distinct) to ndv()
            self.appx_count_distinct = value.strip("'\" ").lower() in ("1", "true")
        elif k == "explain_level":
            # Planner.getExplainString levels (TExplainLevel): 0=MINIMAL,
            # 1=STANDARD, 2=EXTENDED, 3=VERBOSE (names accepted too)
            v = value.strip("'\" ").upper()
            names = {"MINIMAL": 0, "STANDARD": 1, "EXTENDED": 2, "VERBOSE": 3}
            self.explain_level = names.get(v, int(v) if v.isdigit() else 1)
        elif k in _QUERY_OPTIONS:
            conf = _QUERY_OPTIONS[k]
            if conf == "spark.sql.codegen.wholeStage":
                value = "false" if value.strip("'\" ").lower() in ("1", "true") else "true"
            if conf:
                self.spark.conf.set(conf, value.strip("'\" "))
        else:
            self.spark.conf.set(key if key.startswith("spark.") else f"spark.{key}", value.strip("'\" "))
        # literal DataFrame, not interpolated SQL — the user-supplied key
        # must never be spliced into a SQL string
        return self.spark.createDataFrame([(key, "set")], "option: string, status: string")

    # -- multi-statement scripts (impala-shell -f analog) -------------------
    def run_script(self, script: str) -> DataFrame:
        """Execute a `;`-separated statement script in order and return the
        LAST statement's DataFrame (impala-shell `-f file` / `-q "a; b"`
        behavior). Statements are split at top-level semicolons only —
        semicolons inside string literals/comments never split (the split
        walks the tokenizer's output, not raw text)."""
        from impala_spark.parser import tokenize, untokenize

        tokens = tokenize(script)
        stmts: list[str] = []
        start = 0
        for i, t in enumerate(tokens):
            if t.kind == "op" and t.text == ";":
                s = untokenize(tokens[start:i]).strip()
                if s:
                    stmts.append(s)
                start = i + 1
        tail = untokenize(tokens[start:]).strip()
        if tail:
            stmts.append(tail)
        if not stmts:
            raise ValueError("empty script")
        out: DataFrame | None = None
        for s in stmts:
            out = self.sql(s)
        assert out is not None
        return out

    # -- SHOW / DESCRIBE surfaces (service/MetadataOp.java) -----------------
    def show_tables(self, pattern: str | None = None) -> DataFrame:
        df = self.spark.sql("SHOW TABLES")
        if pattern:
            like = pattern.replace("*", ".*")
            df = df.filter(df.tableName.rlike(f"^{like}$"))
        if self._authz.server_name:
            # listings show only objects the user holds ANY privilege on
            # — column-level grants included (TestShowTableResultsFiltered)
            visible = [
                r.tableName for r in df.collect()
                if self._authz.visible_table(self.spark, r.tableName)
            ]
            df = df.filter(F.col("tableName").isin(visible))
        return df

    def show_databases(self) -> DataFrame:
        df = self.spark.sql("SHOW DATABASES")
        if self._authz.server_name:
            # TestShowDbResultsFiltered: only dbs the user has ANY
            # permission on (directly or via an object inside)
            visible = [
                r.namespace for r in df.collect()
                if self._authz.visible_db(self.spark, r.namespace)
            ]
            df = df.filter(F.col("namespace").isin(visible))
        return df

    def show_functions(
        self,
        category: str | None = None,
        pattern: str | None = None,
        db: str | None = None,
    ) -> DataFrame:
        """SHOW [AGGREGATE|ANALYTIC] FUNCTIONS [IN db] [[LIKE] 'pat']
        (ShowFunctionsStmt; category from opt_function_category). The
        category listings are the reference's builtin membership —
        engine-registered UDAs join the AGGREGATE list. Patterns use the
        reference's show_pattern ('*' wildcard, '|' alternation)."""
        if db is not None and db.lower() not in (
            d.name.lower() for d in self.spark.catalog.listDatabases()
        ):
            # ShowFunctionsStmt.analyze (AnalysisException text)
            raise ImpalaAnalysisError(f"Database does not exist: {db}")
        if category == "AGGREGATE":
            udas = {
                n for n, s in self._functions.items()
                if (e := ifn.UDF_LIBRARY.get(s.strip().strip("'\""))) and e[0]
            }
            names = sorted(set(_AGGREGATE_FNS) | udas)
            df = self.spark.createDataFrame(
                [(n,) for n in names], "function: string"
            )
        elif category == "ANALYTIC":
            df = self.spark.createDataFrame(
                [(n,) for n in _ANALYTIC_FNS], "function: string"
            )
        else:
            df = self.spark.sql("SHOW FUNCTIONS")
        if pattern:
            like = "|".join(
                re.escape(alt).replace(r"\*", ".*")
                for alt in pattern.split("|")
            )
            df = df.filter(F.col("function").rlike(f"^(?:{like})$"))
        return df

    def describe(self, table: str, formatted: bool = False) -> DataFrame:
        return self.spark.sql(f"DESCRIBE {'FORMATTED ' if formatted else ''}{table}")

    def show_partitions(self, table: str) -> DataFrame:
        """SHOW PARTITIONS (catalog/HdfsTable partition listing). Managed
        partitioned tables list distinct partition values + file stats;
        unpartitioned targets raise the reference's analysis text
        (A/ShowStatsStmt.java:74-77)."""
        bare = table.split(".")[-1]
        t = ddl.table_info(bare)
        if t is not None and t.partition_cols:
            df = self.spark.read.parquet(t.path)
            return (
                df.groupBy(*t.partition_cols)
                .agg(F.count(F.lit(1)).cast("bigint").alias("num_rows"))
                .orderBy(*t.partition_cols)
            )
        if bare in self._views:
            raise ImpalaAnalysisError(
                f"SHOW PARTITIONS not applicable to a view: default.{bare}")
        if t is not None:
            raise ImpalaAnalysisError(f"Table is not partitioned: default.{bare}")
        try:
            return self.spark.sql(f"SHOW PARTITIONS {table}")
        except Exception:
            # fixture views are this engine's unpartitioned HDFS tables;
            # unknown names resolve like the analyzer
            try:
                self.spark.table(bare)
            except Exception:
                raise ImpalaAnalysisError(f"Table does not exist: default.{bare}")
            raise ImpalaAnalysisError(f"Table is not partitioned: default.{bare}")

    def show_range_partitions(self, table: str) -> DataFrame:
        """SHOW RANGE PARTITIONS (A/ShowStatsStmt.java:78-97 analysis;
        output one row per range partition under a 'RANGE (cols)'
        column like the Kudu listing). Kudu-surface = engine tables with
        a primary key / hash layout; only range-partitioned ones list."""
        from pyspark.sql.types import StringType, StructField, StructType

        bare = table.split(".")[-1]
        t = ddl.table_info(bare)
        if bare in self._views:
            raise ImpalaAnalysisError(
                "SHOW RANGE PARTITIONS not applicable to a view: "
                f"default.{bare}")
        if t is None:
            # fixture views and unknown names: fixtures are the HDFS
            # tables of this engine
            try:
                self.spark.table(bare)
            except Exception:
                raise ImpalaAnalysisError(f"Table does not exist: default.{bare}")
            raise ImpalaAnalysisError(
                f"SHOW RANGE PARTITIONS must target a Kudu table: default.{bare}")
        if not t.range_cols:
            if t.primary_key or t.bucket_cols:
                raise ImpalaAnalysisError(
                    "SHOW RANGE PARTITIONS requested but table does not "
                    f"have range partitions: default.{bare}")
            raise ImpalaAnalysisError(
                f"SHOW RANGE PARTITIONS must target a Kudu table: default.{bare}")
        col = f"RANGE ({', '.join(t.range_cols)})"
        schema = StructType([StructField(col, StringType())])
        return self.spark.createDataFrame(
            [(d,) for d in _range_partition_descriptions(t)], schema)

    def show_files(self, table: str) -> DataFrame:
        """SHOW FILES IN t — data files + sizes (HdfsTable file descriptors)."""
        if table.split(".")[-1] in self._views:
            raise ImpalaAnalysisError(
                f"SHOW FILES not applicable to a non hdfs table: default.{table.split('.')[-1]}")
        import os

        t = ddl.table_info(table)
        if t is None:
            # view over files (fixture tables): the scan's file listing is
            # exactly the reference's file-descriptor set for the table
            from urllib.parse import urlparse

            rows = []
            for uri in self.spark.table(table).inputFiles():
                p = urlparse(uri).path
                rows.append((os.path.basename(p), os.path.getsize(p)))
            if not rows:
                raise ValueError(f"SHOW FILES: '{table}' has no backing files")
            return self.spark.createDataFrame(rows, "path: string, size_bytes: long")
        rows = []
        for root, _dirs, files in os.walk(t.path):
            for f in files:
                if f.endswith((".parquet", ".snappy.parquet")):
                    p = os.path.join(root, f)
                    rows.append((os.path.relpath(p, t.path), os.path.getsize(p)))
        return self.spark.createDataFrame(rows, "path: string, size_bytes: long")

    def show_table_stats(self, table: str) -> DataFrame:
        """SHOW TABLE STATS — row count + on-disk size + format
        (catalog/HdfsTable.java table-level stats)."""
        if table.split(".")[-1] in self._views:
            raise ImpalaAnalysisError(
                f"SHOW TABLE STATS not applicable to a view: default.{table.split('.')[-1]}")
        rows = self.spark.table(table).count()
        t = ddl.table_info(table)
        size = -1
        if t is not None:
            import os

            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(t.path)
                for f in fs
            )
        return self.spark.createDataFrame(
            [(rows, size, "PARQUET")], "num_rows: long, size_bytes: long, format: string"
        )

    def _set_column_stats(self, table: str, col: str, body: str) -> DataFrame:
        """ALTER TABLE ... SET COLUMN STATS col ('key'='value', ...) —
        manual metastore column stats (A/AlterTableSetColumnStats.java,
        exact analysis texts). Stored engine-side; SHOW COLUMN STATS
        surfaces them over the computed numbers, like the reference's
        SHOW reading what the HMS holds."""
        tname = table.strip("`").removeprefix("default.")
        try:
            sdf = self.spark.table(tname)
        except Exception as e:
            raise ImpalaAnalysisError(f"Table does not exist: default.{tname}") from e
        fields = {f.name.lower(): f for f in sdf.schema.fields}
        f = fields.get(col.lower())
        if f is None:
            # AlterTableSetColumnStats.java:64 exact text
            raise ImpalaAnalysisError(
                f"Column '{col}' does not exist in table: default.{tname}"
            )
        t = ddl.table_info(tname)
        if t is not None and col.lower() in {p.lower() for p in t.partition_cols}:
            # AlterTableSetColumnStats.java:70 exact text
            raise ImpalaAnalysisError(
                f"Updating the stats of a partition column is not allowed: {col}"
            )
        type_sql = f.dataType.simpleString().upper()
        if f.dataType.simpleString().startswith(("array", "map", "struct")):
            # ColumnStats.isSupportedColType rejects complex types
            raise ImpalaAnalysisError(
                f"Statistics for column '{f.name}' are not supported because "
                f"it has type '{type_sql}'."
            )
        variable_length = f.dataType.simpleString() in ("string", "binary") \
            or f.dataType.simpleString().startswith("varchar")
        from impala_spark.ddl import _PROP_PAIR_RE

        stored = self._manual_col_stats.setdefault((tname, f.name), {})
        for key, value in _PROP_PAIR_RE.findall(body):
            canon = next(
                (k for k in _COL_STATS_KEYS if k.lower() == key.lower()), None
            )
            if canon is None:
                raise ImpalaAnalysisError(
                    f"Invalid column stats key: {key}\n"
                    f"Valid keys are: {','.join(_COL_STATS_KEYS)}"
                )
            if canon in ("avgSize", "maxSize") and not variable_length:
                raise ImpalaAnalysisError(
                    f"Cannot update the '{canon}' stats of column '{f.name}' "
                    f"with type '{type_sql}'.\nChanging '{canon}' is only "
                    f"allowed for variable-length columns."
                )
            if canon in ("numDVs", "numNulls", "maxSize"):
                try:
                    v = int(value)
                except ValueError:
                    v = None
                if v is None or v < -1:
                    raise ImpalaAnalysisError(
                        f"Invalid stats value '{value}' for column stats key: "
                        f"{canon}\nExpected a positive integer or -1 for unknown."
                    )
                stored[canon] = v
            else:  # avgSize
                try:
                    v = float(value)
                except ValueError:
                    v = None
                import math as _math

                if v is None or _math.isnan(v) or _math.isinf(v) \
                        or (v < 0 and v != -1):
                    raise ImpalaAnalysisError(
                        f"Invalid stats value '{value}' for column stats key: "
                        f"{canon}\nExpected a positive floating-point number "
                        f"or -1 for unknown."
                    )
                stored[canon] = v
        return self.spark.sql(
            f"SELECT 'column stats set on {tname}.{f.name}' AS result"
        )

    def show_column_stats(self, table: str) -> DataFrame:
        """SHOW COLUMN STATS — per-column NDV / null count / max size
        (the child-query stats ComputeStatsStmt.java:218-242 gathers).

        After COMPUTE STATS promoted the table, the numbers come from
        the metastore (DESCRIBE EXTENDED col) with NO scan — Impala's
        own behavior: SHOW COLUMN STATS reads what COMPUTE STATS stored,
        it never recomputes."""
        if table.split(".")[-1] in self._views:
            raise ImpalaAnalysisError(
                f"SHOW COLUMN STATS not applicable to a view: default.{table.split('.')[-1]}")
        tname = table.strip("`")
        if tname in self._stats_tables and self._sf_dir:
            from impala_spark.session import stats_db_name

            db = stats_db_name(self._sf_dir)
            sdf = self.spark.table(f"{db}.`{tname}`")
            rows = []
            for f in sdf.schema.fields:
                stats = {
                    r["info_name"]: r["info_value"]
                    for r in self.spark.sql(
                        f"DESCRIBE EXTENDED {db}.`{tname}` `{f.name}`"
                    ).collect()
                }

                def _num(key):
                    v = stats.get(key)
                    return int(v) if v is not None and v.isdigit() else -1

                rows.append(
                    (f.name, f.dataType.simpleString(),
                     _num("distinct_count"), _num("num_nulls"))
                )
            return self.spark.createDataFrame(
                self._apply_manual_col_stats(tname, rows),
                "column: string, type: string, ndv: long, num_nulls: long",
            )
        df = self.spark.table(table)
        aggs = []
        for f in df.schema.fields:
            aggs += [
                F.approx_count_distinct(f.name).alias(f"ndv_{f.name}"),
                F.count(F.when(F.col(f.name).isNull(), 1)).alias(f"nulls_{f.name}"),
            ]
        r = df.agg(*aggs).first()
        rows = [
            (f.name, f.dataType.simpleString(), r[f"ndv_{f.name}"], r[f"nulls_{f.name}"])
            for f in df.schema.fields
        ]
        return self.spark.createDataFrame(
            self._apply_manual_col_stats(table.strip("`"), rows),
            "column: string, type: string, ndv: long, num_nulls: long",
        )

    def _apply_manual_col_stats(self, tname: str, rows: list) -> list:
        """Overlay ALTER TABLE SET COLUMN STATS values onto a SHOW COLUMN
        STATS row set — the manual stats shadow the computed ones, same
        as the reference's HMS write."""
        if not self._manual_col_stats:
            return rows
        out = []
        for name, typ, ndv, nulls in rows:
            manual = self._manual_col_stats.get((tname, name), {})
            out.append((
                name, typ,
                int(manual.get("numDVs", ndv)),
                int(manual.get("numNulls", nulls)),
            ))
        return out

    def show_create_table(self, table: str) -> DataFrame:
        """SHOW CREATE TABLE — reconstructed DDL text."""
        t = ddl.table_info(table)
        if t is not None:
            cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in self.spark.table(table).schema.fields)
            if t.bucket_cols:
                # Kudu-style hash layout: the reference's SHOW CREATE
                # TABLE emits the PARTITION BY clause (ToSqlUtils)
                part = (
                    f" PARTITION BY HASH ({', '.join(t.bucket_cols)})"
                    f" PARTITIONS {t.num_buckets}"
                )
            elif t.range_cols:
                items = [
                    f"PARTITION {d}" for d in _range_partition_descriptions(t)
                ]
                part = (
                    f" PARTITION BY RANGE ({', '.join(t.range_cols)})"
                    f" ({', '.join(items)})"
                )
            elif t.partition_cols:
                part = f" PARTITIONED BY ({', '.join(t.partition_cols)})"
            else:
                part = ""
            props = ""
            if t.cached_pool:
                props += f" CACHED IN '{t.cached_pool}'"
            if t.serde_properties:
                kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(t.serde_properties.items()))
                props += f" WITH SERDEPROPERTIES ({kv})"
            if t.tbl_properties:
                kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(t.tbl_properties.items()))
                props += f" TBLPROPERTIES ({kv})"
            fmt = getattr(t, "file_format", "PARQUET") or "PARQUET"
            ddl_text = f"CREATE TABLE {table} ({cols}) STORED AS {fmt}{part} LOCATION '{t.path}'{props}"
            return self.spark.createDataFrame([(ddl_text,)], "createtab_stmt: string")
        try:
            return self.spark.sql(f"SHOW CREATE TABLE {table}")
        except Exception:
            # temp view over files (fixture tables): Spark's SHOW CREATE
            # TABLE rejects views — reconstruct the external-table DDL.
            import os
            from urllib.parse import urlparse

            df = self.spark.table(table)
            cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
            files = df.inputFiles()
            loc = os.path.dirname(urlparse(files[0]).path) if files else "<in-memory>"
            ddl_text = (
                f"CREATE EXTERNAL TABLE {table} ({cols}) STORED AS PARQUET LOCATION '{loc}'"
            )
            return self.spark.createDataFrame([(ddl_text,)], "createtab_stmt: string")

    # -- HS2/JDBC metadata ops (service/MetadataOp.java) ----------------------
    def get_catalogs(self) -> DataFrame:
        from impala_spark import metadata_ops as mo
        return mo.get_catalogs(self.spark)

    def get_schemas(self, catalog=None, schema_pattern=None) -> DataFrame:
        from impala_spark import metadata_ops as mo
        df = mo.get_schemas(self.spark, catalog, schema_pattern)
        if self._authz.server_name:
            # HS2 metadata is privilege-filtered like the SHOW surfaces
            # (AuthorizationTest.TestHs2GetSchema)
            visible = [
                r.TABLE_SCHEM for r in df.collect()
                if self._authz.visible_db(self.spark, r.TABLE_SCHEM)
            ]
            df = df.filter(F.col("TABLE_SCHEM").isin(visible))
        return df

    def get_tables(self, catalog=None, schema_pattern=None,
                   table_pattern=None, table_types=None) -> DataFrame:
        from impala_spark import metadata_ops as mo
        df = mo.get_tables(self.spark, catalog, schema_pattern,
                           table_pattern, table_types)
        if self._authz.server_name:
            # TestHs2GetTables: column-level grants keep the table listed
            visible = [
                r.TABLE_NAME for r in df.collect()
                if self._authz.visible_table(self.spark, r.TABLE_NAME)
            ]
            df = df.filter(F.col("TABLE_NAME").isin(visible))
        return df

    def get_table_types(self) -> DataFrame:
        from impala_spark import metadata_ops as mo
        return mo.get_table_types(self.spark)

    def get_columns(self, catalog=None, schema_pattern=None,
                    table_pattern=None, column_pattern=None) -> DataFrame:
        from impala_spark import metadata_ops as mo
        df = mo.get_columns(self.spark, catalog, schema_pattern,
                            table_pattern, column_pattern)
        if self._authz.server_name:
            # TestHs2GetColumns: only columns of visible tables return
            visible = [
                t for t in {r.TABLE_NAME for r in df.collect()}
                if self._authz.visible_table(self.spark, t)
            ]
            df = df.filter(F.col("TABLE_NAME").isin(visible))
        return df

    def get_functions(self, catalog=None, schema_pattern=None,
                      fn_pattern=None) -> DataFrame:
        from impala_spark import metadata_ops as mo
        return mo.get_functions(self.spark, catalog, schema_pattern,
                                fn_pattern)

    def get_type_info(self) -> DataFrame:
        from impala_spark import metadata_ops as mo
        return mo.get_type_info(self.spark)

    def rewrite_expr(self, expr_sql: str, rules=None) -> str:
        """Run the reference's ExprRewriteRules over a scalar expression
        and return the rewritten Impala SQL (rewrite/ExprRewriter.java:36,
        BetweenToCompoundRule/ExtractCommonConjunctRule/FoldConstantsRule).

        ``rules`` is a rule-name list (see exprrules.RULES_BY_NAME);
        defaults to the full list in the reference's registration order
        (A/Analyzer.java registers BetweenToCompound before the planner's
        constant folding). This is a frontend surface: Catalyst performs
        the equivalent optimizations during planning regardless.
        """
        from impala_spark.exprrules import RULES_BY_NAME, rewrite_sql

        if rules is None:
            rules = list(RULES_BY_NAME)
        return rewrite_sql(expr_sql, rules)[0]

    # -- EXPLAIN (Frontend.getExplainString analog) --------------------------
    def _explain_df(self, query: str) -> DataFrame:
        text = self.explain(query)
        return self.spark.createDataFrame(
            [(line,) for line in text.split("\n")], "explain_string: string"
        )

    def to_sql(self, query: str) -> str:
        """The reference's analyzed-statement toSql() — the spelling
        views persist and SHOW CREATE VIEW replays (A/SelectStmt.java
        #toSql, pinned by T/analysis/ToSqlTest.java). Bare table refs
        qualify against the session database like the analyzer's
        resolution step."""
        from impala_spark.tosql import to_impala_sql

        stripped = query.lstrip()
        # first WORD, not a fixed slice: 'SELECT(1+1)' / 'VALUES(1)' /
        # 'SELECT/*c*/1' have no whitespace after the keyword (r11 ADVICE)
        mw = re.match(r"[A-Za-z_]+", stripped)
        head = mw.group(0).upper() if mw else ""
        if head == "WITH" and _hoist_with_clause(
            stripped.rstrip().rstrip(";")
        ).lstrip()[:2].upper() in ("IN", "UP"):
            # WITH-prefixed INSERT/UPSERT is a DML statement, not a query
            # — replay verbatim like the other statement kinds
            return query.strip().rstrip(";")
        if not stripped.startswith("(") and head not in (
            "SELECT", "WITH", "VALUES", "",
        ):
            # the ToSqlTest surface is the query family; DDL/DML
            # statements replay verbatim (their toSql in the reference
            # is statement-specific and our engine re-parses the
            # original text anyway)
            return query.strip().rstrip(";")
        return to_impala_sql(
            query, default_db=self.spark.catalog.currentDatabase()
        )

    def _explain_dml(self, query: str) -> str | None:
        """EXPLAIN of a write statement: the sink line the reference's
        planner puts at the plan root (HdfsTableSink 'WRITE TO HDFS
        [db.t, OVERWRITE=...]'; Kudu-surface UPDATE/DELETE/UPSERT sinks)
        over the planned SOURCE query. Returns None for non-DML."""
        q = query.strip().rstrip(";")
        m = re.match(
            r"(?is)^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            r"(`[^`]+`|[\w.]+).*?\bAS\s+((?:SELECT|WITH|VALUES)\b.*)$", q)
        if m:
            # EXPLAIN CTAS plans the source under the table sink — it must
            # NEVER execute the create (spark.sql would run the command
            # eagerly; caught by a tableExists probe)
            target = m.group(1).strip("`")
            body = self.explain(m.group(2))
            return (
                f"WRITE TO HDFS [default.{target}, OVERWRITE=false]\n|\n"
                + body
            )
        mw = re.match(r"\s*([A-Za-z_]+)", q)
        head = mw.group(1).upper() if mw else ""
        if head in (
            "CREATE", "DROP", "ALTER", "TRUNCATE", "LOAD", "SET", "USE",
            "SHOW", "DESCRIBE", "COMPUTE", "INVALIDATE", "REFRESH",
            "GRANT", "REVOKE",
        ):
            # the grammar only accepts EXPLAIN over query/DML statements
            # (sql-parser.cup explain_stmt) — anything else is a syntax
            # error, and must never execute as a side effect
            raise ImpalaUnsupportedError(
                f"Syntax error: EXPLAIN is not supported for {head} "
                "statements (EXPLAIN accepts queries, INSERT/UPSERT/"
                "UPDATE/DELETE, and CREATE TABLE AS SELECT)"
            )
        m = re.match(
            r"(?is)^\s*(INSERT|UPSERT)\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?"
            r"(`[^`]+`|[\w.]+)\s*(?:\([^)]*\)\s*)?"
            r"(?:PARTITION\s*\([^)]*\)\s*)?"
            r"((?:SELECT|WITH|VALUES)\b.*)$", q)
        if m:
            head, mode, target, src = (
                m.group(1).upper(), m.group(2).upper(),
                m.group(3).strip("`"), m.group(4),
            )
            sink = (
                f"UPSERT INTO [default.{target}]"
                if head == "UPSERT"
                else f"WRITE TO HDFS [default.{target}, "
                     f"OVERWRITE={'true' if mode == 'OVERWRITE' else 'false'}]"
            )
            body = self.explain(src)
            return f"{sink}\n|\n" + body
        m = re.match(
            r"(?is)^\s*UPDATE\s+(`[^`]+`|[\w.]+)\s+SET\s+"
            r"(?P<set>.*?)(?:\s+FROM\s+(?P<from>.*?))?"
            r"(?:\s+WHERE\s+(?P<where>.*))?$", q)
        if m and ddl.table_info(m.group(1).strip("`")) is not None:
            target = m.group(1).strip("`")
            where = f" WHERE {m.group('where')}" if m.group("where") else ""
            # join-form UPDATE plans the joined source (ModifyStmt's
            # source statement); the plain form scans the target
            frm = m.group("from") or target
            body = self.explain(f"SELECT * FROM {frm}{where}")
            return f"UPDATE [default.{target}]\n|\n" + body
        m = re.match(
            r"(?is)^\s*DELETE\s+FROM\s+(`[^`]+`|[\w.]+)"
            r"(?:\s+WHERE\s+(.*))?$", q)
        if m and ddl.table_info(m.group(1).strip("`")) is not None:
            target = m.group(1).strip("`")
            where = f" WHERE {m.group(2)}" if m.group(2) else ""
            body = self.explain(f"SELECT * FROM {target}{where}")
            return f"DELETE FROM [default.{target}]\n|\n" + body
        m = re.match(
            r"(?is)^\s*DELETE\s+([\w`]+)\s+FROM\s+(.*)$", q)
        if m:
            # join-form DELETE: the target names an alias of the joined
            # refs; plan the source join (ModifyStmt source statement)
            try:
                target = ddl._resolve_modify_target(m.group(1), m.group(2))
            except ValueError:
                target = m.group(1).strip("`")
            if ddl.table_info(target) is not None:
                body = self.explain(f"SELECT * FROM {m.group(2)}")
                return f"DELETE FROM [default.{target}]\n|\n" + body
        return None

    def explain(self, query: str) -> str:
        """Impala-style plan text (planner/PlanNode.getExplainString analog).

        Maps Spark physical nodes to the reference's node names so the
        plan-shape reads like an Impala EXPLAIN. `EXCHANGE` markers appear
        exactly where the reference's DistributedPlanner would insert
        ExchangeNodes (shuffle boundaries).
        """
        dml = self._explain_dml(query)
        if dml is not None:
            return dml
        # strict engines apply the same analyzer rejections to EXPLAIN as
        # to sql() — Impala analyzes before planning, so EXPLAIN of an
        # invalid query raises the analysis error, not a plan.
        # EXPLAIN plans in the same session AND through the same plan
        # rewrites sql() would use, so after COMPUTE STATS the text shows
        # the CBO plan and above the distinct-rewrite gate it shows the
        # two-phase join plan the statement will actually get (the
        # reference's EXPLAIN always reflects the executed plan).
        sql_text = translate(query, strict=self.strict)
        rw = self._plan_rewrite(query)
        sess = self._route_session(query)
        grk = self._global_rank_df(rw if rw is not None else query, sess)
        if grk is not None:
            df = grk
            orig_cols = sess.sql(sql_text).columns
            if df.columns != orig_cols:
                df = df.toDF(*orig_cols)
        elif rw is not None:
            df = sess.sql(translate(rw))
            # same positional output-name restore sql() performs — the
            # plan text must show the statement's own column names, not
            # the rewrite's internal __cd0/__a0 (r11 ADVICE)
            orig_cols = sess.sql(sql_text).columns
            if df.columns != orig_cols:
                df = df.toDF(*orig_cols)
        else:
            df = sess.sql(sql_text)
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        # Cardinality/size annotations (planner/PlanNode.getExplainString
        # emits per-node "cardinality=N size=B"): Catalyst's stats live on
        # the optimized LOGICAL plan — root estimate for the plan header,
        # per-leaf estimates for the scans (in traversal order, which
        # matches the physical scans' order). rowCount needs CBO stats
        # (COMPUTE STATS / ANALYZE TABLE); absent those Impala prints
        # "unavailable" and so do we.
        def _fmt_stats(st) -> str:
            try:
                rc = st.rowCount()
                card = str(rc.get()) if not rc.isEmpty() else "unavailable"
            except Exception:
                card = "unavailable"
            try:
                size = int(st.sizeInBytes())
            except Exception:
                size = None
            if size is not None and size >= (1 << 62):
                # Catalyst's unknown-stats default is Long.MaxValue —
                # the reference prints unavailable, not 8192PB
                size = None
            size_s = _print_bytes(size) if size is not None else "unavailable"
            return f"cardinality={card} size={size_s}"

        scan_stats: list[str] = []
        header = ""
        try:
            opt = qe.optimizedPlan()
            header = f"   {_fmt_stats(opt.stats())}\n"
            leaves = opt.collectLeaves()
            for i in range(leaves.size()):
                scan_stats.append(_fmt_stats(leaves.apply(i).stats()))
        except Exception:
            pass
        out = []
        node_id = 0
        mapping = [
            (r"AdaptiveSparkPlan.*", None),
            (r"ResultQueryStage.*", None),
            (r"ShuffleQueryStage.*", None),
            (r"BroadcastQueryStage.*", None),
            (r"InputAdapter.*", None),
            (r"WholeStageCodegen.*", None),
            (r"ReusedExchange.*", "EXCHANGE (reused)"),
            (r"Exchange hashpartitioning.*", "EXCHANGE [HASH]"),
            (r"Exchange rangepartitioning.*", "EXCHANGE [RANGE]"),
            (r"Exchange SinglePartition.*", "EXCHANGE [UNPARTITIONED]"),
            (r"BroadcastExchange.*", "EXCHANGE [BROADCAST]"),
            (r"BroadcastHashJoin.*", "HASH JOIN [BROADCAST]"),
            (r"ShuffledHashJoin.*", "HASH JOIN [PARTITIONED]"),
            (r"SortMergeJoin.*", "MERGE JOIN [PARTITIONED]"),
            (r"BroadcastNestedLoopJoin.*", "NESTED LOOP JOIN [BROADCAST]"),
            (r"CartesianProduct.*", "NESTED LOOP JOIN [CROSS]"),
            (r"HashAggregate\(keys=\[\].*, functions=.*", "AGGREGATE"),
            (r"HashAggregate.*", "AGGREGATE [HASH]"),
            (r"ObjectHashAggregate.*", "AGGREGATE [HASH]"),
            (r"SortAggregate.*", "AGGREGATE [SORT]"),
            (r"TakeOrderedAndProject.*", "TOP-N"),
            (r"Sort .*", "SORT"),
            (r"Filter .*", "SELECT (filter)"),
            (r"Project .*", "PROJECT"),
            (r"Window .*", "ANALYTIC"),
            (r"Expand .*", "EXPAND (distinct agg)"),
            (r"GlobalLimit.*", "LIMIT"),
            (r"LocalLimit.*", "LIMIT (local)"),
            (r"Union", "UNION"),
            (r"Generate .*", "UNNEST"),
            (r".*Scan parquet.*", "SCAN PARQUET"),
            (r"Scan .*", "SCAN"),
            (r"LocalTableScan.*", "VALUES/LOCAL SCAN"),
            (r"RowToColumnar.*", None),
            (r"ColumnarToRow.*", None),
        ]
        # Per-scan stats pair logical leaves with physical scan lines by
        # position; that alignment only holds when the counts agree (a
        # ReusedExchange or AQE replan can drop/reorder physical scans).
        # On mismatch, skip per-scan annotations rather than mislabel.
        n_scan_lines = 0
        matched: list[tuple[str | None, int]] = []
        for raw in plan.split("\n"):
            stripped = raw.lstrip(" +-:*()0123456789")
            indent = len(raw) - len(raw.lstrip(" +-:"))
            for pat, name in mapping:
                if re.match(pat, stripped):
                    if name:
                        matched.append((name, indent))
                        if name.startswith("SCAN"):
                            n_scan_lines += 1
                    break
        annotate_scans = n_scan_lines == len(scan_stats)
        # Per-host resource estimate header (Planner.computeResourceReqs
        # analog) from the reference's cost-model constants:
        #   hash-table space overhead 1.1        (PlannerContext.java:38)
        #   min hash table 10 MiB, agg cap 128M  (AggregationNode.java:53-56)
        #   8 MiB IO buffers, <=10 per thread    (HdfsScanNode.java:81-92)
        # Input sizes come from Catalyst's optimized-plan stats; absent CBO
        # stats Impala prints "unavailable" per node but still sums floors.
        MiB = 1024 * 1024
        leaf_sizes = []
        missing_stats: list[str] = []
        try:
            leaves = qe.optimizedPlan().collectLeaves()
            for i in range(leaves.size()):
                leaf = leaves.apply(i)
                lb = int(leaf.stats().sizeInBytes())
                # Catalyst's unknown-stats default is Long.MaxValue — a
                # zero-file scan would otherwise estimate petabytes of
                # per-host memory
                leaf_sizes.append(0 if lb >= (1 << 62) else lb)
                # Planner.getExplainString:295-307 missing-stats warning —
                # a leaf without a CBO rowCount is a stats-less table
                try:
                    if leaf.stats().rowCount().isEmpty():
                        name = leaf.relation().location().rootPaths().head().getName()
                        name = name.removesuffix(".parquet")
                        if f"default.{name}" not in missing_stats:
                            missing_stats.append(f"default.{name}")
                except Exception:
                    pass
        except Exception:
            pass
        total_mem = 0
        scan_i = 0
        vcores = 0
        for name, _indent in matched:
            if name.startswith("SCAN"):
                size = leaf_sizes[scan_i] if scan_i < len(leaf_sizes) else 0
                scan_i += 1
                total_mem += min(size, 10 * 8 * MiB)  # <=10 8MiB IO buffers
                vcores += 1
            elif name.startswith("AGGREGATE"):
                src = max(leaf_sizes, default=0)
                total_mem += min(max(int(src * 1.1), 10 * MiB), 128 * MiB)
            elif "JOIN [BROADCAST]" in name or "JOIN [PARTITIONED]" in name:
                build = min(leaf_sizes, default=0)
                total_mem += max(int(build * 1.1), 10 * MiB)
        resources = (
            "Estimated Per-Host Requirements: "
            f"Memory={total_mem / MiB:.2f}MB VCores={max(vcores, 1)}\n"
        )
        if missing_stats:
            # Planner.getExplainString:295-307 exact warning text
            resources += (
                "WARNING: The following tables are missing relevant table "
                "and/or column statistics.\n" + ", ".join(missing_stats) + "\n"
            )
        scan_seen = 0
        for name, indent in matched:
            line = f"{'|  ' * (indent // 3)}{node_id:02d}:{name}"
            if name.startswith("SCAN") and annotate_scans:
                line += f"  [{scan_stats[scan_seen]}]"
                scan_seen += 1
            out.append(line)
            node_id += 1
        if not out:
            return plan
        level = getattr(self, "explain_level", 1)
        body = "\n".join(out)
        if level <= 0:  # MINIMAL: plan shape only
            return body
        text = resources + header + body
        if level >= 3:  # VERBOSE: append the physical plan (fragment detail)
            text += "\n---- Spark physical plan ----\n" + plan
        return text
