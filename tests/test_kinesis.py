"""Kinesis production-source smoke path.

The connector jar is not shipped in this image, so the default run
SKIPS the live smoke — but the same test executes for real when the
session is launched with ``kinesis_submit_conf()`` applied (e.g.
``spark-submit --packages ...`` against AWS or a localstack endpoint
in ``AKPS_KINESIS_ENDPOINT``). What always runs: the recipe contents
and the gate's error message, so the prod path can't silently rot.
"""

from __future__ import annotations

import os

import pytest

from am_kinesis_pay_spark.sources.readers import (
    KINESIS_CONNECTOR_PACKAGE,
    kinesis_connector_available,
    kinesis_stream,
    kinesis_submit_conf,
)


def test_kinesis_submit_recipe():
    conf = kinesis_submit_conf()
    assert conf["spark.jars.packages"] == KINESIS_CONNECTOR_PACKAGE
    group, artifact, version = KINESIS_CONNECTOR_PACKAGE.split(":")
    assert group and artifact and version
    assert kinesis_submit_conf("g:a:1")["spark.jars.packages"] == "g:a:1"


def test_kinesis_stream_smoke_or_clean_skip(spark):
    """Runs the real readStream when the connector is on the classpath
    (optionally against AKPS_KINESIS_ENDPOINT); skips cleanly here."""
    if not kinesis_connector_available(spark):
        with pytest.raises(NotImplementedError, match="--packages"):
            kinesis_stream(spark, "akps-smoke")
        pytest.skip("Kinesis connector jar not on classpath")
    df = kinesis_stream(
        spark,
        os.environ.get("AKPS_KINESIS_STREAM", "akps-smoke"),
        endpoint=os.environ.get("AKPS_KINESIS_ENDPOINT"),
    )
    assert df.isStreaming
    assert "data" in [f.name.lower() for f in df.schema.fields]
