from __future__ import annotations

import pytest

from sales_data_warehouse_spark.session import get_spark

REFERENCE_CSV = "/root/reference/Sales_January_2019.csv"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
