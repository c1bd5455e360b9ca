"""Property test: the union+window as-of join must agree with
pandas.merge_asof (the well-tested reference implementation) on
randomized tick/lookup sets — including exact-timestamp ties, leading
lookups with no prior tick, and keys present on only one side."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
from pyspark.sql import Window as W, functions as F


def spark_asof(spark, ticks_pdf: pd.DataFrame, lookups_pdf: pd.DataFrame):
    """Same pattern as operators/joins.py join_asof_rate, on arbitrary
    (key, ts, value) ticks and (key, ts, lookup_id) lookups."""
    ticks = spark.createDataFrame(ticks_pdf).select(
        "key", "ts", F.col("value").alias("tick_value"),
        F.lit(None).cast("bigint").alias("lookup_id"),
    )
    lookups = spark.createDataFrame(lookups_pdf).select(
        "key", "ts", F.lit(None).cast("double").alias("tick_value"), "lookup_id"
    )
    w = (
        W.partitionBy("key")
        .orderBy("ts", F.col("lookup_id").isNotNull().cast("int"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ticks.unionByName(lookups)
        .withColumn("rate", F.last("tick_value", ignorenulls=True).over(w))
        .filter(F.col("lookup_id").isNotNull())
        .select("lookup_id", "rate")
    )


def test_asof_matches_pandas_merge_asof(spark):
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    n_keys = 6
    ticks = []
    for i in range(300):
        ticks.append(
            {
                "key": rng.randrange(n_keys),
                "ts": base + dt.timedelta(seconds=rng.randrange(0, 50_000)),
                "value": round(rng.uniform(1, 100), 2),
            }
        )
    lookups = []
    for i in range(200):
        if i < 5:
            ts = base - dt.timedelta(seconds=rng.randrange(1, 100))  # before any tick
        elif i < 10:
            ts = ticks[rng.randrange(len(ticks))]["ts"]  # exact tie with a tick
        else:
            ts = base + dt.timedelta(seconds=rng.randrange(0, 55_000))
        lookups.append({"key": rng.randrange(n_keys + 1), "ts": ts, "lookup_id": i})

    ticks_pdf = pd.DataFrame(ticks)
    lookups_pdf = pd.DataFrame(lookups)

    got = {
        r.lookup_id: r.rate
        for r in spark_asof(spark, ticks_pdf, lookups_pdf).collect()
    }

    # reference: pandas merge_asof (backward = at-or-before, inclusive)
    t_sorted = ticks_pdf.sort_values(["ts", "key"]).reset_index(drop=True)
    l_sorted = lookups_pdf.sort_values(["ts", "key"]).reset_index(drop=True)
    ref = pd.merge_asof(
        l_sorted, t_sorted, on="ts", by="key", direction="backward"
    )
    want = {
        int(r.lookup_id): (None if pd.isna(r.value) else float(r.value))
        for r in ref.itertuples()
    }
    assert len(got) == len(want) == 200
    # ties at identical ts: multiple ticks share (key, ts) rarely; both
    # implementations pick within the tie set — compare against the set
    tick_index: dict = {}
    for t in ticks:
        tick_index.setdefault((t["key"], t["ts"]), set()).add(t["value"])
    for lid, want_rate in want.items():
        got_rate = got[lid]
        if got_rate == want_rate or (got_rate is None and want_rate is None):
            continue
        lk = lookups_pdf[lookups_pdf.lookup_id == lid].iloc[0]
        tie_set = tick_index.get((lk.key, lk.ts), set())
        assert got_rate in tie_set and want_rate in tie_set, (
            lid,
            got_rate,
            want_rate,
        )
