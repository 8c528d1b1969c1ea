"""Explicit salting for skewed joins (ops/skew.py) — row-identical to the
plain join, hot keys spread across salt_factor reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from nemo_spark.ops.skew import salted_join, top_keys


def _skewed(spark):
    # hot key 0 carries half the fact rows
    rows = [(0, i) for i in range(3000)] + [(k, i) for k in range(1, 200) for i in range(15)]
    big = spark.createDataFrame(rows, "k long, payload long")
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(150)], "k long, attr string")
    return big, dim


def test_salted_join_row_identical(spark):
    big, dim = _skewed(spark)
    for how in ("inner", "left", "left_semi", "left_anti"):
        want = sorted(tuple(r) for r in big.join(dim, on="k", how=how).collect())
        got = sorted(tuple(r) for r in salted_join(big, dim, on="k", how=how).collect())
        assert got == want, how


def test_salted_join_spreads_hot_key(spark):
    big, dim = _skewed(spark)
    from nemo_spark.ops.skew import _row_salt

    salted = big.withColumn("__salt", _row_salt(big, 16))
    per_bucket = (
        salted.filter(F.col("k") == 0).groupBy("__salt").count().collect()
    )
    # the 3000 hot rows spread over ~16 buckets instead of one reducer
    assert len(per_bucket) >= 12
    assert max(r["count"] for r in per_bucket) < 3000 * 0.25


def test_salted_join_rejects_right_outer(spark):
    import pytest

    big, dim = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(big, dim, on="k", how="right")


def test_top_keys(spark):
    big, _ = _skewed(spark)
    top = top_keys(big, "k", n=3).collect()
    assert top[0]["k"] == 0 and top[0]["n_rows"] == 3000
    assert all(r["n_rows"] == 15 for r in top[1:])
