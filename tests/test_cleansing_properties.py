"""Property-based checks of the cleansing stage (SURVEY §5 layer d).

Hypothesis generates landing batches mixing valid rows, null-field rows,
cast-garbage rows, and duplicate rows; the invariants must hold for ANY
input, not just the reference CSV's defect mix:

  1. conservation: every landing row lands in exactly one of
     {cleansed (pre-distinct), invalid}
  2. cleansed is fully typed: no nulls in required typed columns
  3. every invalid row carries a reject reason from the known set
  4. Q10-assigned ids (for null-id valid rows) are unique and continue
     strictly past the largest surviving explicit id. Explicit ids may
     legitimately repeat: the reference keeps them (Cleansing.sql:118-122
     is full-row DISTINCT; one order spans multiple lines), so only the
     engine-assigned ids carry a uniqueness guarantee.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_warehouse_spark.operators.cleansing import cleanse
from sales_data_warehouse_spark.sources.csv_ingest import landing_from_rows

ADDRESSES = [
    "1 Main St, Boston, MA 02215",
    "9 Elm St, Austin, TX 73301",
    "77 Oak Ave, Seattle, WA 98101",
]

valid_row = st.builds(
    lambda oid, qty, price, day, addr: (
        str(oid) if oid is not None else None,
        "Widget",
        str(qty),
        f"{price / 100:.2f}",
        f"01/{day:02d}/19 10:00",
        addr,
    ),
    oid=st.one_of(st.none(), st.integers(1, 99999)),
    qty=st.integers(1, 9),
    price=st.integers(1, 99999),
    day=st.integers(1, 28),
    addr=st.sampled_from(ADDRESSES),
)

null_row = st.sampled_from(
    [
        (None, None, None, None, None, None),
        ("5", "Widget", None, "9.99", "01/05/19 10:00", ADDRESSES[0]),
        ("6", None, "2", "9.99", "01/05/19 10:00", ADDRESSES[1]),
    ]
)

garbage_row = st.sampled_from(
    [
        # repeated header line
        (
            "Order ID",
            "Product",
            "Quantity Ordered",
            "Price Each",
            "Order Date",
            "Purchase Address",
        ),
        ("7", "Widget", "notanint", "9.99", "01/05/19 10:00", ADDRESSES[0]),
        ("8", "Widget", "2", "notaprice", "01/05/19 10:00", ADDRESSES[1]),
        ("9", "Widget", "2", "9.99", "not a date", ADDRESSES[2]),
        ("xx", "Widget", "2", "9.99", "01/05/19 10:00", ADDRESSES[0]),
    ]
)

landing_batch = st.lists(
    st.one_of(valid_row, null_row, garbage_row), min_size=1, max_size=40
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=landing_batch)
def test_cleanse_invariants(spark, rows):
    landing = landing_from_rows(spark, rows)
    cleansed, invalid = cleanse(landing)
    c = cleansed.collect()
    i = invalid.collect()

    # 1. conservation: invalid keeps every rejected row (no dedup there),
    #    cleansed is post-distinct, so the split covers the input exactly
    #    when inputs are distinct and never exceeds it otherwise
    assert len(c) + len(i) <= len(rows)
    if len(set(rows)) == len(rows):
        assert len(c) + len(i) == len(rows)

    # 2. typed completeness
    for r in c:
        assert r["order_id"] is not None
        assert r["quantity_ordered"] is not None
        assert r["price_each"] is not None
        assert r["order_date"] is not None

    # 3. known reject reasons only
    assert {r["reject_reason"] for r in i} <= {
        "null_required_field",
        "cast_failure",
    }

    # 4. Q10 assigns ids only to null-id rows; those assigned ids must be
    #    unique and strictly exceed every explicit id that survived.
    #    Explicit ids may repeat (full-row DISTINCT keeps distinct lines
    #    of the same order, matching Cleansing.sql:118-122).
    #
    #    "Explicit" must count only ids on rows that SURVIVE cleansing:
    #    the engine seeds its counter with max(id) over VALID rows, so
    #    an id that only ever appears on a rejected row (e.g. the
    #    null-quantity "5" fixture) is fair game for assignment — the
    #    old raw-input derivation misclassified such an assigned id as
    #    explicit (hypothesis found exactly that collision).
    def _survives(r) -> bool:
        if any(x is None for x in r):
            return False
        oid, _product, qty, price, date, _addr = r
        if not qty.lstrip("-").isdigit():
            return False
        try:
            float(price)
        except ValueError:
            return False
        import re as _re

        return bool(_re.fullmatch(r"\d\d/\d\d/\d\d \d\d:\d\d", date))

    ids = [r["order_id"] for r in c]
    explicit = {
        int(r[0])
        for r in rows
        if r[0] is not None and r[0].isdigit() and _survives(r)
    }
    assigned = [x for x in ids if x not in explicit]
    assert len(assigned) == len(set(assigned))
    if assigned and explicit:
        survived_explicit = [x for x in ids if x in explicit]
        if survived_explicit:
            assert min(assigned) > max(survived_explicit)


@pytest.mark.parametrize("dup_count", [2, 3])
def test_exact_duplicates_collapse(spark, dup_count):
    row = ("1", "Widget", "2", "9.99", "01/05/19 10:00", ADDRESSES[0])
    landing = landing_from_rows(spark, [row] * dup_count)
    cleansed, invalid = cleanse(landing)
    # Q9: full-row distinct — identical rows collapse to one
    assert cleansed.count() == 1
    assert invalid.count() == 0
