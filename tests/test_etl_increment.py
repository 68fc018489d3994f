"""run_etl_increment: full rebuild over (first half + second half) and
(run_etl on first half, then increment with second half) must agree on
the warehouse contents — dimensions exactly, facts up to surrogate-id
assignment order (compared on natural keys + measures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_data_warehouse_spark.etl import run_etl, run_etl_increment
from sales_data_warehouse_spark.operators.cleansing import cleanse
from sales_data_warehouse_spark.sources.csv_ingest import ingest_csv
from tests.conftest import REFERENCE_CSV

CUT = "2019-01-15"


@pytest.fixture(scope="module")
def split_csvs(spark, tmp_path_factory):
    # split the raw CSV by cleansed order_date, writing two valid CSVs
    d = tmp_path_factory.mktemp("inc")
    raw = open(REFERENCE_CSV).read().splitlines()
    header, body = raw[0], raw[1:]

    cleansed, _ = cleanse(ingest_csv(spark, REFERENCE_CSV))
    # identify which raw dates belong to each half by parsing MM/DD/YY
    def half(line: str) -> int:
        # order date is the 5th CSV field but addresses contain commas
        # inside quotes — date format "MM/DD/YY HH:MM" is unambiguous
        import re

        m = re.search(r"(\d\d)/(\d\d)/(\d\d) \d\d:\d\d", line)
        if not m:
            return 1  # malformed rows ride along in the first batch
        mm, dd, yy = m.groups()
        return 1 if f"20{yy}-{mm}-{dd}" <= CUT else 2

    f1 = d / "first.csv"
    f2 = d / "second.csv"
    f1.write_text("\n".join([header] + [l for l in body if half(l) == 1]) + "\n")
    f2.write_text("\n".join([header] + [l for l in body if half(l) == 2]) + "\n")
    return str(f1), str(f2)


def test_increment_matches_full(spark, tmp_path, split_csvs):
    f1, f2 = split_csvs
    full_dir = str(tmp_path / "full")
    inc_dir = str(tmp_path / "inc")

    full = run_etl(spark, REFERENCE_CSV, output_dir=full_dir)
    run_etl(spark, f1, output_dir=inc_dir)
    inc = run_etl_increment(spark, f2, output_dir=inc_dir)

    # cleansed corpus identical (dedup is per-batch; reference dup rows
    # are within one day so the split preserves them)
    assert inc.cleansed.count() == full.cleansed.count() == 9671

    # time dimension identical bit-for-bit
    assert sorted(map(tuple, inc.time_dimension.collect())) == sorted(
        map(tuple, full.time_dimension.collect())
    )

    # location/product: same natural keys; ids append-stable (unique)
    for dim, key in [
        (inc.location_dimension, ["street_name", "city_name", "state_name", "postal"]),
        (inc.product_dimension, ["product_name", "price_each"]),
    ]:
        fdim = (
            full.location_dimension
            if "street_name" in key
            else full.product_dimension
        )
        assert dim.count() == fdim.count()
        assert dim.select(*key).exceptAll(fdim.select(*key)).count() == 0

    # facts agree on natural keys + measures (surrogate ids may differ)
    cols = ["product", "order_date", "street_name", "postal",
            "quantity_ordered", "price_each"]
    f_rows = sorted(map(tuple, full.fact.select(*cols).collect()))
    i_rows = sorted(map(tuple, inc.fact.select(*cols).collect()))
    assert f_rows == i_rows
    # revenue invariant
    rev = inc.fact.agg(
        F.sum(F.col("quantity_ordered") * F.col("price_each"))
    ).first()[0]
    assert float(rev) == pytest.approx(1814491.55, abs=0.01)
