"""Scalar-function semantics tests — nemo's error-is-no-result contract.

Mirrors testcases under ``/root/reference/resources/testcases/arithmetic``
semantics: i64 overflow / division-by-zero / failed cast => row dropped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nemo_spark.functions import ops

I64_MAX = 2**63 - 1


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_overflow_yields_null(spark):
    assert _one(spark, ops.num_sum(F.lit(I64_MAX), F.lit(1))) is None
    assert _one(spark, ops.num_product(F.lit(2**40), F.lit(2**40))) is None
    assert _one(spark, ops.num_subtraction(F.lit(-(2**63)), F.lit(1))) is None


def test_division_semantics(spark):
    assert _one(spark, ops.num_division(F.lit(1), F.lit(0))) is None
    assert _one(spark, ops.num_int_division(F.lit(7), F.lit(2))) == 3
    assert _one(spark, ops.num_int_division(F.lit(-7), F.lit(2))) == -3  # trunc toward zero
    assert _one(spark, ops.num_int_division(F.lit(7), F.lit(0))) is None
    assert _one(spark, ops.num_int_division(F.lit(I64_MAX), F.lit(1))) == I64_MAX
    assert _one(spark, ops.num_remainder(F.lit(-7), F.lit(2))) == -1  # Rust rem sign
    assert _one(spark, ops.num_remainder(F.lit(7), F.lit(0))) is None


def test_casts(spark):
    assert _one(spark, ops.cast_to_integer(F.lit("42"))) == 42
    assert _one(spark, ops.cast_to_integer(F.lit("4.2x"))) is None
    assert _one(spark, ops.cast_to_double(F.lit("4.5"))) == 4.5


def test_string_functions(spark):
    assert _one(spark, ops.str_before(F.lit("hello world"), F.lit(" "))) == "hello"
    assert _one(spark, ops.str_after(F.lit("hello world"), F.lit(" "))) == "world"
    assert _one(spark, ops.str_after(F.lit("hello"), F.lit("x"))) == ""
    assert _one(spark, ops.str_substring(F.lit("hello"), F.lit(2))) == "ello"
    assert _one(spark, ops.str_substring(F.lit("hello"), F.lit(2), F.lit(3))) == "ell"
    assert _one(spark, ops.str_levenshtein(F.lit("kitten"), F.lit("sitting"))) == 3
    assert _one(spark, ops.str_compare(F.lit("a"), F.lit("b"))) == -1
    assert _one(spark, ops.str_uriencode(F.lit("a b"))) == "a%20b"
    assert _one(spark, ops.fstring("x={} y={}", F.lit(1), F.lit("z"))) == "x=1 y=z"


def test_misc_numeric(spark):
    assert _one(spark, ops.num_lukasiewicz(F.lit(0.7), F.lit(0.6))) == 0.3 or abs(
        _one(spark, ops.num_lukasiewicz(F.lit(0.7), F.lit(0.6))) - 0.3
    ) < 1e-9
    assert _one(spark, ops.num_squareroot(F.lit(-1.0))) is None
    assert _one(spark, ops.num_minimum(F.lit(3), F.lit(1), F.lit(2))) == 1
    assert _one(spark, ops.num_maximum(F.lit(3), F.lit(1), F.lit(2))) == 3
