"""Driver-blind-spot insurance: the external driver re-checks the
same ~50-query sample every round (the CORRECTNESS_r*.json keys), so
most of the registry only ever gets builder-side verification. This
suite replicates the DRIVER'S OWN comparison protocol — row count,
schema as the sorted column-name list, and a value hash over rows
with columns sorted by name (so a Spark/oracle column-order or alias
drift breaks the hash exactly as it would in the driver) — over a
date-seeded rotating sample drawn from the queries the driver has
NOT been sampling. Every run covers a different slice; over a few
weeks of CI the whole blind spot cycles through the driver's exact
comparison semantics.
"""

from __future__ import annotations

import datetime
import json
import os
import random

import duckdb
import pytest

from am_kinesis_pay_spark.registry import REGISTRY, queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_SF_DIR = "/root/testdata/sf0.01"
N_ROTATED = 8


def _driver_sampled_names() -> set:
    """Union of every query name a CORRECTNESS_r*.json has checked —
    the driver's (never-rotated) sample."""
    names: set = set()
    for fn in sorted(os.listdir(REPO)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            try:
                with open(os.path.join(REPO, fn)) as fh:
                    names.update(json.load(fh).keys())
            except (OSError, json.JSONDecodeError):
                pass
    return names


def _rotation() -> list:
    """Date-seeded deterministic sample of oracle-bearing queries the
    driver has never checked (falls back to the full oracle list when
    no CORRECTNESS files exist)."""
    with_oracle = sorted(
        n for n in queries() if REGISTRY[n].oracle is not None
    )
    blind = [n for n in with_oracle if n not in _driver_sampled_names()]
    pool = blind or with_oracle
    seed = datetime.date.today().isoformat()
    rng = random.Random(seed)
    return rng.sample(pool, min(N_ROTATED, len(pool)))


# The canonicalizer and hash are THE single shared implementation in
# tools/correctness_full.py (the full-surface sweep, VERDICT r8 #1) so
# this rotating lane and the per-round artifact can never drift apart.
from tools.correctness_full import _canon, value_hash as _value_hash  # noqa: E402,F401


@pytest.fixture(scope="module")
def driver_duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{DRIVER_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _rotation())
def test_rotated_driver_protocol(spark, driver_duck, name):
    """The driver's exact three-way check (rows / schema / value hash)
    for one rotated blind-spot query at the driver's sf0.01."""
    sdf = queries()[name](spark, DRIVER_SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    cur = driver_duck.execute(REGISTRY[name].oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert len(srows) == len(drows), f"{name}: row count"
    assert sorted(scols) == sorted(dcols), f"{name}: schema"

    s_order = sorted(range(len(scols)), key=lambda i: scols[i])
    d_index = {c: i for i, c in enumerate(dcols)}
    d_order = [d_index[scols[i]] for i in s_order]
    assert _value_hash(srows, s_order) == _value_hash(drows, d_order), (
        f"{name}: value hash (driver-style) mismatch"
    )


def _rows_only_rotation() -> list:
    """Date-seeded sample of the no-oracle queries (the driver records
    a weaker rows-only check for these — emulate that too)."""
    rows_only = sorted(n for n in queries() if REGISTRY[n].oracle is None)
    seed = "rows:" + datetime.date.today().isoformat()
    rng = random.Random(seed)
    return rng.sample(rows_only, min(4, len(rows_only)))


@pytest.mark.parametrize("name", _rows_only_rotation())
def test_rotated_rows_only_protocol(spark, name):
    """The driver's rows-only fallback for no-oracle queries: the query
    must run at the driver's sf0.01 and yield a well-formed frame."""
    df = queries()[name](spark, DRIVER_SF_DIR)
    assert df.count() >= 0
    assert df.columns
