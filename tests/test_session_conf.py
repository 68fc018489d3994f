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


def test_resolution_happens_at_get_spark_time(monkeypatch):
    # r15 (r14 ADVICE): env set AFTER module import must be honored —
    # _resolve_conf is exactly the dict get_spark applies to a new
    # session, so testing it tests resolution through get_spark's path
    # without building a JVM.
    from sales_data_warehouse_spark.session import _resolve_conf

    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4096")
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "12g")
    conf = _resolve_conf()
    assert conf["spark.sql.shuffle.partitions"] == "4096"
    assert conf["spark.driver.memory"] == "12g"
    # the explicit get_spark(shuffle_partitions=...) argument still wins
    assert (
        _resolve_conf(shuffle_partitions=7)["spark.sql.shuffle.partitions"]
        == "7"
    )
    # ...and extra_conf wins over defaults but not over the argument
    assert (
        _resolve_conf(extra_conf={"spark.driver.memory": "2g"})[
            "spark.driver.memory"
        ]
        == "2g"
    )


def test_state_store_provider_knob(monkeypatch):
    from sales_data_warehouse_spark.session import _resolve_conf

    monkeypatch.delenv("SPARK_GRAFT_STATE_STORE", raising=False)
    assert (
        "spark.sql.streaming.stateStore.providerClass"
        not in _resolve_conf()
    )
    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "rocksdb")
    conf = _resolve_conf()
    assert conf["spark.sql.streaming.stateStore.providerClass"].endswith(
        "RocksDBStateStoreProvider"
    )
    assert (
        conf[
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        ]
        == "true"
    )
    # semantic configs always survive the merge
    assert conf["spark.sql.ansi.enabled"] == "false"
