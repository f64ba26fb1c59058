"""okera_trino_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the cerebro-data/okera-trino reference.

The reference is a Trino connector plugin (catalog + governed scan layer)
hosted inside the Trino 400 SQL engine; its full query surface is therefore
(connector scan/catalog semantics) x (Trino SQL operators). This package
re-expresses both halves Spark-first:

- ``sources``    — parquet-backed governed catalog (schema registry, column
  authorization, sampled catalogs, limit/sampling session properties);
  mirrors the connector's metadata layer
  (reference: RecordServiceMetadata.java, RecordServiceSplitManagerImpl.java).
- ``operators``  — the full relational operator surface (scan, filter, join,
  aggregate, window, sort, set ops, subqueries, scalar functions) declared
  through the DataFrame/SQL API so Catalyst owns optimization and Tungsten
  owns execution (reference delegates these to Trino 400).
- ``functions``  — Trino-compatibility shims where Trino and Spark SQL
  function semantics differ, plus the plugin's UDF surface
  (reference: udfs/CurrentDatabaseUdf.java, RecordServicePlugin.java:70-78).
- ``plans``      — plan-inspection helpers (pushdown/broadcast assertions)
  used by tests to enforce 100-TB-scale physical plans.
- ``streaming``  — Structured Streaming extensions (tumbling/sliding/session
  windows, watermark dedup); batch-checkable forms for the oracle.
- ``llm``        — LLM-training-data pipeline operators (dedup families,
  similarity search, text analysis, multimodal column plumbing).
- ``registry``   — single source of truth mapping query keys from SURVEY.md
  §2 to (Spark callable, DuckDB oracle SQL).
"""

from okera_trino_spark.registry import QUERIES, load_all_queries, query
from okera_trino_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["QUERIES", "get_spark", "load_all_queries", "query", "__version__"]
