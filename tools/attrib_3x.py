"""Isolated 1x/3x/10x scaling attribution for a corpus query.

The bench's sf1 block records only (base, x10) — a ratio alone cannot
distinguish a fixed-overhead-dominated operator (marginal cost per
added data copy FALLS) from a super-linear stage (marginal cost
RISES). This tool adds the 3x point: it replicates the documents
table with the SAME scheme as bench.py's `_sf1_block` (disjoint
doc_id ranges, repartition(32) so the layout matches real multi-split
tables, not the single-file artifact), times the named corpus queries
min-of-2 at each scale in ONE fresh session, and prints the marginal
seconds per added copy for each step.

Run it ALONE (no concurrent Spark work — shared-session/machine
contention is exactly the artifact this exists to rule out):

    python tools/attrib_3x.py dedup_repeated_spans unigram_surprisal

Interpretation (the op_semantic_dedup r9 precedent): marginal s/copy
falling step-over-step = fixed overhead (plan compile, Python-worker
and broadcast startup) amortizing over a linear variable stage;
rising = a genuinely super-linear stage that needs a fix.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_data_warehouse_spark import get_spark  # noqa: E402
from sales_data_warehouse_spark.queries.corpus import (  # noqa: E402
    QUERIES,
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def replicate(spark, copies: int) -> str:
    """Documents replicated `copies`x with disjoint doc_id ranges
    (bench.py scheme); other tables symlink-copied as-is — the two
    target queries read only documents, but the dir must present the
    full load_table surface."""
    out = os.path.join(
        tempfile.gettempdir(), f"sdw_attrib3x_{copies}x"
    )
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if name != "documents":
            os.symlink(src, dst)
            continue
        df = load_table(spark, SF_DIR, name)
        if copies == 1:
            df.repartition(32).write.mode("overwrite").parquet(dst)
            continue
        df = df.withColumn(
            "__copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        ).select(
            (
                F.col("doc_id").cast("bigint")
                + F.lit(1_000_000_000).cast("bigint") * F.col("__copy")
            ).alias("doc_id"),
            *[c for c in df.columns if c not in ("doc_id", "__copy")],
        )
        df.repartition(32).write.mode("overwrite").parquet(dst)
    return out


def main() -> None:
    names = sys.argv[1:] or ["dedup_repeated_spans", "unigram_surprisal"]
    spark = get_spark(
        master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    dirs = {c: replicate(spark, c) for c in (1, 3, 10)}
    # warm-up: one untimed run per query — codegen + Python-worker +
    # broadcast first-call costs otherwise land entirely on whichever
    # point runs FIRST (a first run measured 1x SLOWER than 3x for
    # dedup_repeated_spans: 3.18 s vs 2.82 s, pure session warm-up)
    for name in names:
        QUERIES[name](spark, dirs[1]).write.format("noop").mode(
            "overwrite"
        ).save()
    results: dict[str, dict[int, float]] = {}
    for name in names:
        results[name] = {}
        for copies in (1, 3, 10):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, dirs[copies]).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name][copies] = round(best, 3)
            print(f"{name} {copies}x: {best:.3f}s", flush=True)
    for name, r in results.items():
        # fit t = F + c*copies through the 1x and 10x endpoints; the
        # 3x point's residual is the super-linearity evidence — a
        # fixed+linear operator lands near the line, a quadratic stage
        # lands well BELOW it (endpoints pulled up by the 10x cost)
        c = (r[10] - r[1]) / 9
        fixed = r[1] - c
        pred3 = fixed + 3 * c
        resid = r[3] - pred3
        verdict = (
            "consistent with fixed+linear"
            if resid >= -max(0.1, 0.05 * r[3])
            else "3x point far below the endpoint line — super-linear "
            "stage, needs a fix"
        )
        print(
            f"SUMMARY {name}: 1x/3x/10x = {r[1]}/{r[3]}/{r[10]}s; "
            f"linear fit fixed={fixed:.3f}s, {c:.3f} s/copy; 3x "
            f"predicted {pred3:.3f} vs measured {r[3]} "
            f"(resid {resid:+.3f}) — {verdict}"
        )
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
