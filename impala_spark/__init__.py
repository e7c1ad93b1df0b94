"""impala_spark — a PySpark-native analytics engine with the SQL surface
and query semantics of the Apache Impala frontend (reference:
/root/reference, fe/src/main/java/org/apache/impala/*).

Architecture (SURVEY.md §7): Catalyst is the planner — we do NOT port
Impala's SingleNodePlanner/DistributedPlanner. We port the *surface*:

- session.py   : SparkSession factory tuned for scale (AQE, runtime bloom
                 filters, broadcast thresholds) + fixture-table registration.
- types.py     : Impala<->Spark type mapping, implicit-cast and decimal
                 result-type rules (reference: analysis/TypesUtil.java).
- functions.py : builtin alias table — ndv, appx_median, group_concat,
                 decode, nvl, zeroifnull, ... (reference: catalog/BuiltinsDb.java).
- parser.py    : Impala-dialect SQL -> Spark SQL translation (IREGEXP,
                 plan hints, NULLS ordering defaults, DIV, ...) —
                 reference grammar: fe/src/main/cup/sql-parser.cup.
- engine.py    : ImpalaEngine facade — sql(), EXPLAIN, SET/USE,
                 SHOW/DESCRIBE, COMPUTE STATS (reference: service/Frontend.java).
- ddl.py       : CTAS, INSERT [OVERWRITE] [PARTITION], TRUNCATE, LOAD DATA,
                 UPDATE/DELETE/UPSERT as read-modify-overwrite
                 (reference: analysis/InsertStmt.java, analysis/ModifyStmt.java).
- operators.py : DataFrame-level operator library mirroring the plan-node
                 inventory (reference: planner/*Node.java).
- llm_ops.py   : beyond-reference LLM-data-pipeline operators (dedup,
                 ANN similarity, text analysis) — scale-safe, bucketed.
- streaming.py : beyond-reference Structured-Streaming surface on `events`.
"""

from impala_spark.session import get_spark, register_tables, TABLES
from impala_spark.engine import ImpalaEngine

__all__ = ["get_spark", "register_tables", "TABLES", "ImpalaEngine"]
__version__ = "0.2.0"
