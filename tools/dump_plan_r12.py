#!/usr/bin/env python
"""Dump explain('formatted') for named queries into plans/r12/.

Usage: python tools/dump_plan_r12.py <suffix> <query> [<query>...]
suffix: 'before' or 'after'. SF dir from $SPARK_GRAFT_SF_DIR
(default sf0.1 — same data the bench times).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from am_kinesis_pay_spark.registry import queries
from am_kinesis_pay_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("dump_plans_r12")
    qs = queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write("== Physical Plan ==\n" if not txt.startswith("==") else "")
            fh.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
