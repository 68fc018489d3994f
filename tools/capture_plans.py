"""Capture .explain('formatted') for named corpus queries into files.

Optimization-round helper (guide §1: record the plan shape — Exchange
count, join strategy, PushedFilters/ReadSchema, codegen spans — before
and after each change, so plan-diff claims are checkable without
running Spark).

Usage:
    python tools/capture_plans.py <out_dir> <suffix> <q1,q2,...|ALL>

Writes <out_dir>/<query>_<suffix>.txt, one per query. Plans are
captured against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) —
explain only analyzes/optimizes, it does not execute the query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_data_warehouse_spark.queries.corpus import QUERIES  # noqa: E402
from sales_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = (
        list(QUERIES)
        if sys.argv[3] == "ALL"
        else sys.argv[3].split(",")
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sdw-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exchange = plan.count("Exchange")
        print(f"{name}: {n_exchange} Exchange -> {path}")


if __name__ == "__main__":
    main()
