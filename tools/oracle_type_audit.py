"""Arrow-type parity audit: DuckDB oracle schema vs Spark result schema.

The driver's correctness gate hashes *typed* values, so a DuckDB column
that comes back HUGEINT (int128 / decimal128(38,0) in Arrow) while the
Spark side is BIGINT hash-mismatches even when every value is equal —
the exact failure mode of `q_priority_shipping` in round 1 (VERDICT.md
§What's-wrong #1).  `tests/test_oracle.py` compares Python values, which
erases that type distinction; this audit closes the gap by comparing
the Arrow schema DuckDB produces against the Spark result schema for
EVERY oracle-bearing registered query.

Run standalone (`python tools/oracle_type_audit.py [sf_dir]`) or via
tests/test_oracle_types.py which asserts zero mismatches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

from pyspark.sql import types as T


def canon_arrow(t: pa.DataType) -> str:
    """Canonical tag for an Arrow type (DuckDB result side)."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"  # tz-ness collapses: driver hashes wall values
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"array<{canon_arrow(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{canon_arrow(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_arrow(t.key_type)},{canon_arrow(t.item_type)}>"
    return f"UNKNOWN_ARROW:{t}"


def canon_spark(t: T.DataType) -> str:
    """Canonical tag for a Spark type (query result side)."""
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, T.LongType):
        return "bigint"
    if isinstance(t, T.IntegerType):
        return "int"
    if isinstance(t, T.ShortType):
        return "smallint"
    if isinstance(t, T.ByteType):
        return "tinyint"
    if isinstance(t, T.DoubleType):
        return "double"
    if isinstance(t, T.FloatType):
        return "float"
    if isinstance(t, T.BooleanType):
        return "boolean"
    if isinstance(t, T.DecimalType):
        return f"decimal({t.precision},{t.scale})"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, T.ArrayType):
        return f"array<{canon_spark(t.elementType)}>"
    if isinstance(t, T.StructType):
        inner = ",".join(f"{f.name}:{canon_spark(f.dataType)}" for f in t.fields)
        return f"struct<{inner}>"
    if isinstance(t, T.MapType):
        return f"map<{canon_spark(t.keyType)},{canon_spark(t.valueType)}>"
    return f"UNKNOWN_SPARK:{t}"


def audit(spark, sf_dir: str, names: list[str] | None = None):
    """Return [(query, column, spark_type, duck_type), ...] mismatches."""
    from am_kinesis_pay_spark.registry import REGISTRY, queries
    from am_kinesis_pay_spark.tables import TABLES

    qs = queries()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    mismatches = []
    targets = names or sorted(n for n in qs if REGISTRY[n].oracle is not None)
    for name in targets:
        sdf = qs[name](spark, sf_dir)
        stypes = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}
        atable = con.execute(REGISTRY[name].oracle).fetch_arrow_table()
        dtypes = {f.name: canon_arrow(f.type) for f in atable.schema}
        for col in stypes:
            if col not in dtypes:
                mismatches.append((name, col, stypes[col], "<missing>"))
            elif stypes[col] != dtypes[col]:
                mismatches.append((name, col, stypes[col], dtypes[col]))
        for col in dtypes:
            if col not in stypes:
                mismatches.append((name, col, "<missing>", dtypes[col]))
    con.close()
    return mismatches


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    from am_kinesis_pay_spark.session import get_session

    spark = get_session("oracle_type_audit")
    bad = audit(spark, sf_dir)
    if not bad:
        print("OK: all oracle result types match Spark result types")
        return 0
    print(f"{len(bad)} type mismatches:")
    for name, col, st, dt in bad:
        print(f"  {name:40s} {col:28s} spark={st:24s} duck={dt}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
