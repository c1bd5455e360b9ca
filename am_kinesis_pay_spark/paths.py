"""Per-session scratch locations for queries that materialize through
the filesystem or the catalog (bucketed layouts, conf-scoped rewrites,
format round-trips).

Fixed names like ``/tmp/akps_bucketed`` / table ``akps_orders_b`` are
correct for one session but clobber each other when concurrent sessions
share a tmpdir or metastore (parallel bench runs, multi-user clusters).
Suffixing every scratch path and table name with the Spark
``applicationId`` makes them per-session-unique while staying stable
within a session (so overwrite-then-read-back patterns still work).
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import SparkSession


def session_token(spark: SparkSession) -> str:
    """applicationId sanitized to a SQL-identifier-safe suffix."""
    return re.sub(r"[^A-Za-z0-9]", "_", spark.sparkContext.applicationId)


def scratch_path(spark: SparkSession, name: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"{name}_{session_token(spark)}")


def scratch_table(spark: SparkSession, name: str) -> str:
    return f"{name}_{session_token(spark)}"
