"""am_kinesis_pay_spark — a PySpark-native analytics engine.

Re-expresses every data abstraction and data operation of the reference
(robwoodgate/am-kinesis-pay, a payment-gateway event pipeline) as
Spark-first DataFrame / SQL / Structured Streaming plans, plus the
LLM-data-pipeline operator surface (dedup, similarity search, text
analysis, multimodal columns) required for large-scale training-data
work.

Design principles (SURVEY.md §1.3, §3.2, §4.2):
- DataFrame/SQL only; no RDDs. Catalyst + Tungsten pick physical plans.
- Every operator is registered in ``registry`` with an optional DuckDB
  oracle SQL string so correctness accrues per-commit.
- Pandas UDFs (Arrow-batched) only where built-ins can't express the
  semantics (HMAC signing, MinHash, multimodal decode).
"""

from am_kinesis_pay_spark.registry import REGISTRY, register, queries, oracle_sql

__all__ = ["REGISTRY", "register", "queries", "oracle_sql"]

__version__ = "0.1.0"
