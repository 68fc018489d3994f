"""Shuffle-partition default resolution (scale-adaptive, r14 opt).

The value is deployment-dependent: an explicit production override
wins, then the local-mode core count the harness exports, then the
historical 32-core fallback. Pure-Python — no Spark session needed.
"""

from __future__ import annotations

from sales_data_warehouse_spark.session import _default_shuffle_partitions


def test_explicit_override_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "400")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    assert _default_shuffle_partitions() == "400"


def test_follows_local_core_count(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    assert _default_shuffle_partitions() == "8"


def test_fallback_is_bench_comparable(monkeypatch):
    # the 32-core driver box must resolve to the historical constant
    # whether CPUS is exported (32) or not (fallback)
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    assert _default_shuffle_partitions() == "32"
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    assert _default_shuffle_partitions() == "32"


def test_garbage_values_fall_through(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "-1")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "*")
    assert _default_shuffle_partitions() == "32"
