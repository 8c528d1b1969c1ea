"""Iceberg-backed storage (feature-gated: skips when the runtime jar is
absent — this sandbox ships none). On a cluster with
iceberg-spark-runtime + a configured catalog these exercise the
CheckpointStore-shaped snapshot/resume surface against real Iceberg tables."""

from __future__ import annotations

import pytest


def _available(spark):
    from nemo_spark.engine.iceberg import iceberg_available

    return iceberg_available(spark, catalog="nemo")


def test_probe_is_clean_offline(spark):
    """The availability probe must answer (not raise) without the jar."""
    from nemo_spark.engine.iceberg import iceberg_available

    assert iceberg_available(spark) in (True, False)
    assert iceberg_available(spark, catalog="nemo") in (True, False)


def test_store_refuses_without_runtime(spark):
    if _available(spark):
        pytest.skip("iceberg runtime present: refusal path not applicable")
    from nemo_spark.engine.iceberg import IcebergCheckpointStore

    with pytest.raises(RuntimeError, match="Iceberg"):
        IcebergCheckpointStore(spark, catalog="nemo")


def test_snapshot_resume_roundtrip(spark):
    if not _available(spark):
        pytest.skip("no Iceberg runtime jar in this container")
    from nemo_spark.engine.iceberg import IcebergCheckpointStore

    store = IcebergCheckpointStore(spark, catalog="nemo")
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    store.snapshot("t", df0, 0)
    df1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    store.snapshot("t", df1, 1)
    assert store.latest_step("t") == 1
    assert store.load("t").count() == 3
    assert store.load("t", 0).count() == 2  # VERSION AS OF the first snapshot
    assert store.lineage().filter("name = 't'").count() > 0
    assert [m["step"] for m in store.metrics("t")] == [0, 1]
