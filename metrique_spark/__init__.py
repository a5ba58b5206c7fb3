"""metrique_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
calmrat/metrique (the reference at /root/reference), re-expressed Spark-first:

- temporally-versioned object tables (``_oid``/``_start``/``_end`` SCD2)
- the MQL query language compiled to ``pyspark.sql.Column`` predicates
- temporal analytics (as-of, history spine, version windows) as DataFrame ops
- snapshot/history upsert as a distributed merge
- large-scale training-data ops: dedup, similarity search, text analysis,
  multimodal column plumbing

Design stance: declare logical plans with the DataFrame/SQL API and let
Catalyst/Tungsten pick physical strategy; Python UDFs only where built-ins
genuinely can't express the semantics (always Arrow-batched).
"""

from metrique_spark.engine import Engine
from metrique_spark.mql import compile_mql, date_range_predicate
from metrique_spark.objects import assign_autoincrement, stamp, validate
from metrique_spark.session import get_spark
from metrique_spark.temporal import asof_join, deptree, dfind, history, on_date

__version__ = "0.1.0"

__all__ = [
    "Engine", "compile_mql", "date_range_predicate", "get_spark",
    "stamp", "validate", "assign_autoincrement",
    "on_date", "history", "asof_join", "dfind", "deptree",
]
