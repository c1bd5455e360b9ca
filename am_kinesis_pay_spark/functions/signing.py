"""HMAC-SHA256 request signing (SURVEY.md §2.8 fn_hmac_sha256_upper).

The reference signs every API call with
``strtoupper(hash_hmac('SHA256', nonce.method.url.json, secret))``
(kinesis-pay.php:422-424). Spark has no HMAC built-in (``sha2`` is a
plain hash, not HMAC), so this is the canonical Pandas-UDF slow-path:
Arrow-batched, vectorized over the column, no per-row Python overhead
beyond the hmac core.

No DuckDB oracle exists for HMAC → rows-only driver check; the pytest
suite verifies the digest against Python ``hmac`` directly
(SURVEY.md §7 hard-part #5).
"""

from __future__ import annotations

import hashlib
import hmac as _hmac

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load

SECRET = "s3cr3t-t0k3n"


def make_hmac_udf(secret: str):
    """Vectorized HMAC-SHA256 (uppercase hex) over a string column."""
    key = secret.encode("utf-8")

    @F.pandas_udf(StringType())
    def hmac_sha256_upper(messages: pd.Series) -> pd.Series:
        return messages.map(
            lambda m: _hmac.new(key, m.encode("utf-8"), hashlib.sha256)
            .hexdigest()
            .upper()
            if m is not None
            else None
        )

    return hmac_sha256_upper


def sign_requests(df: DataFrame, message_col: str, secret: str = SECRET) -> DataFrame:
    """Append an ``x_signature`` column — the reference's
    ``x-signature`` header (kinesis-pay.php:424,434)."""
    return df.withColumn("x_signature", make_hmac_udf(secret)(F.col(message_col)))


@register("fn_hmac_sign", oracle=None, tags=("scalar", "udf"))
def fn_hmac_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signing pipeline end-to-end: build the nonce.method.path.payload
    message (kinesis-pay.php:423), HMAC it, uppercase the hex digest
    (:424). Rows-only check; digest correctness is pinned in
    tests/test_signing.py against Python hmac."""
    ev = load(spark, sf_dir, "events")
    msg = F.concat(
        F.unix_millis("ts").cast("string"),
        F.lit("POST"),
        F.lit("/api/merchants/payment"),
        F.coalesce("props", F.lit("{}")),
    )
    return sign_requests(
        ev.select("event_id", msg.alias("signing_message")), "signing_message"
    ).select("event_id", "signing_message", "x_signature")
