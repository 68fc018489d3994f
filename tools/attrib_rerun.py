"""Per-query 3x rerun attribution (r7 VERDICT #2).

The round-over-round headline drifted 18.5 s (r4) -> 24.1 s (r7) while
~15 members moved 1.2-1.6x on byte-identical code — variance or
regression? This tool answers it per query: run the named corpus
queries N times each at bench settings (same session factory, same
noop-sink materialization as bench.py) against an arbitrary checkout,
and print ALL samples so the spread is visible (bench.py prints only
the min; a regression claim needs the distribution).

Usage:
    python tools/attrib_rerun.py <repo_path> <q1,q2,...> [runs]

Run it once on the current tree and once on a `git worktree` of the
prior round's tag; overlapping sample ranges = run variance, disjoint
ranges = a real code regression to bisect. Output: one JSON line
{"repo": ..., "sf_dir": ..., "samples": {q: [s1, s2, ...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    queries = sys.argv[2].split(",")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sys.path.insert(0, repo)

    from sales_data_warehouse_spark.queries.corpus import QUERIES
    from sales_data_warehouse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sdw-attrib")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM / codegen / parquet-reader paths
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(16).write.format(
        "noop"
    ).mode("overwrite").save()

    samples: dict[str, list[float]] = {}
    for name in queries:
        fn = QUERIES[name]
        out = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out.append(round(time.perf_counter() - t0, 3))
        samples[name] = out
    print(json.dumps({"repo": repo, "sf_dir": sf_dir, "samples": samples}))


if __name__ == "__main__":
    main()
