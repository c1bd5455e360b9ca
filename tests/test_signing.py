"""HMAC signing has no SQL oracle — pin the digest against Python hmac
directly (SURVEY.md §7 hard-part #5)."""

from __future__ import annotations

import hashlib
import hmac

from am_kinesis_pay_spark.functions.signing import SECRET
from am_kinesis_pay_spark.registry import queries

from tests.conftest import SF_DIR


def expected_sig(message: str) -> str:
    return (
        hmac.new(SECRET.encode(), message.encode(), hashlib.sha256)
        .hexdigest()
        .upper()
    )


def test_hmac_matches_python(spark):
    rows = queries()["fn_hmac_sign"](spark, SF_DIR).limit(50).collect()
    assert rows
    for r in rows:
        assert r.x_signature == expected_sig(r.signing_message)
        assert r.x_signature == r.x_signature.upper()
        assert len(r.x_signature) == 64
