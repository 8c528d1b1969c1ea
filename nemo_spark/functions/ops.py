"""Nemo's scalar-function surface on Spark Columns.

Mirrors the ``OperationKind`` catalogue (reference:
``nemo/src/rule_model/components/term/operation/operation_kind.rs:78-403``)
and the physical implementations under ``nemo-physical/src/function/definitions``.

Semantics contract (critical): nemo evaluation errors produce NO RESULT — the
row is dropped (integer overflow, division by zero, failed cast:
``nemo-physical/src/function/definitions/numeric/integer64.rs``). We encode
"no result" as NULL and the engine drops null-valued assignment rows /
null-valued filter rows, so built-in ``try_*`` functions give exact parity.

All functions are Catalyst expressions — JVM-side, codegen'd, no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- arithmetic
# nemo: checked i64 arithmetic; overflow/div-by-zero => row dropped.


def num_sum(a: Column, b: Column) -> Column:
    return F.try_add(a, b)


def num_subtraction(a: Column, b: Column) -> Column:
    return F.try_subtract(a, b)


def num_product(a: Column, b: Column) -> Column:
    return F.try_multiply(a, b)


def num_division(a: Column, b: Column) -> Column:
    # floating division; by-zero => null (row dropped)
    return F.try_divide(a, b)


def num_int_division(a: Column, b: Column) -> Column:
    """i64 division, truncation-toward-zero, /0 => null (Rust checked_div).

    Exact at full i64 range: (a - a % b) is divisible by b, computed in
    decimal(38,0) to avoid double rounding."""
    exact = (a - (a % b)).cast("decimal(38,0)") / b.cast("decimal(38,0)")
    # i64::MIN / -1 overflows (checked_div => None); the bare cast would
    # ANSI-abort the whole query on that legal input
    ok = (b != F.lit(0)) & ~((a == F.lit(-(2**63))) & (b == F.lit(-1)))
    return F.when(ok, exact.try_cast("long")).otherwise(F.lit(None))


def num_remainder(a: Column, b: Column) -> Column:
    # i64::MIN % -1 is checked_rem overflow (no result) in the reference;
    # Spark's long remainder quietly returns 0 there
    ok = (b != F.lit(0)) & ~((a == F.lit(-(2**63))) & (b == F.lit(-1)))
    return F.when(ok, a % b).otherwise(F.lit(None))


def num_power(a: Column, b: Column) -> Column:
    return F.pow(a, b)


def num_logarithm(a: Column, base: Column) -> Column:
    # nemo: log(value, base). Computed as a log-ratio: pyspark's two-arg
    # F.log requires a FLOAT literal base and raises NOT_ITERABLE when
    # handed a Column (same workaround as typed.py's _int_log).
    return F.log(a) / F.log(base)


def num_absolute(a: Column) -> Column:
    # abs(i64::MIN) ANSI-aborts; checked_abs => no result (null)
    return F.when(a >= 0, a).otherwise(F.try_subtract(F.lit(0), a))


def num_negation(a: Column) -> Column:
    # -(i64::MIN) ANSI-aborts; checked_neg => no result (null)
    return F.try_subtract(F.lit(0), a)


def num_squareroot(a: Column) -> Column:
    # sqrt of negative => NaN in Spark; nemo => no result
    return F.when(a >= 0, F.sqrt(a)).otherwise(F.lit(None))


def num_sine(a: Column) -> Column:
    return F.sin(a)


def num_cosine(a: Column) -> Column:
    return F.cos(a)


def num_tangent(a: Column) -> Column:
    return F.tan(a)


def num_ceil(a: Column) -> Column:
    return F.ceil(a)


def num_floor(a: Column) -> Column:
    return F.floor(a)


def num_round(a: Column) -> Column:
    return F.round(a, 0)


def num_minimum(*cols: Column) -> Column:
    return F.least(*cols)


def num_maximum(*cols: Column) -> Column:
    return F.greatest(*cols)


def num_lukasiewicz(a: Column, b: Column) -> Column:
    """Łukasiewicz t-norm: max(0, a + b - 1), computed in double — the
    fuzzy domain is [0, 1], and a long+long sum at i64 extremes would
    ANSI-abort before the double subtraction."""
    return F.greatest(F.lit(0.0), a.cast("double") + b.cast("double") - F.lit(1.0))


# ----------------------------------------------------------------- bit ops


def bit_and(a: Column, b: Column) -> Column:
    return a.bitwiseAND(b)


def bit_or(a: Column, b: Column) -> Column:
    return a.bitwiseOR(b)


def bit_xor(a: Column, b: Column) -> Column:
    return a.bitwiseXOR(b)


def bit_shl(a: Column, b: Column) -> Column:
    return F.shiftleft(a, b)


def bit_shr(a: Column, b: Column) -> Column:
    return F.shiftright(a, b)


def bit_shru(a: Column, b: Column) -> Column:
    return F.shiftrightunsigned(a, b)


# ----------------------------------------------------------------- boolean


def bool_and(a: Column, b: Column) -> Column:
    return a & b


def bool_or(a: Column, b: Column) -> Column:
    return a | b


def bool_not(a: Column) -> Column:
    return ~a


# ------------------------------------------------------------------ strings
# operation_kind.rs: StringConcatenation..StringLevenshtein — near-1:1 Spark.


def str_concat(*cols: Column) -> Column:
    return F.concat(*cols)


def str_contains(s: Column, sub: Column) -> Column:
    return F.contains(s, sub)


def str_starts(s: Column, prefix: Column) -> Column:
    return F.startswith(s, prefix)


def str_ends(s: Column, suffix: Column) -> Column:
    return F.endswith(s, suffix)


def str_before(s: Column, sep: Column) -> Column:
    # SPARQL STRBEFORE: '' when no match
    return F.when(
        F.contains(s, sep), F.substr(s, F.lit(1), F.instr(s, sep) - F.lit(1))
    ).otherwise(F.lit(""))


def str_after(s: Column, sep: Column) -> Column:
    # SPARQL STRAFTER: '' when no match
    return F.when(
        F.contains(s, sep), F.substr(s, F.instr(s, sep) + F.length(sep))
    ).otherwise(F.lit(""))


def str_substring(s: Column, start: Column, length: Column | None = None) -> Column:
    """nemo SUBSTR is 1-based; 2-arg = to end (definitions.rs:368 ternary)."""
    if length is None:
        return F.substr(s, start)
    return F.substr(s, start, length)


def str_regex(s: Column, pattern: Column) -> Column:
    return s.rlike(pattern)


def str_length(s: Column) -> Column:
    return F.length(s)


def str_reverse(s: Column) -> Column:
    return F.reverse(s)


def str_lowercase(s: Column) -> Column:
    return F.lower(s)


def str_uppercase(s: Column) -> Column:
    return F.upper(s)


def str_uriencode(s: Column) -> Column:
    # url_encode is Java form-style; nemo percent-encodes with the RFC 3986
    # unreserved set (urlencoding::encode — bare A-Za-z0-9-_.~). Diffs:
    # space ('+' vs %20), '*' (bare vs %2A), '~' (%7E vs bare)
    out = F.replace(F.url_encode(s), F.lit("+"), F.lit("%20"))
    out = F.replace(out, F.lit("*"), F.lit("%2A"))
    return F.replace(out, F.lit("%7E"), F.lit("~"))


def str_uridecode(s: Column) -> Column:
    return F.try_url_decode(s)


def str_levenshtein(a: Column, b: Column) -> Column:
    return F.levenshtein(a, b)


def str_compare(a: Column, b: Column) -> Column:
    """nemo StringCompare: -1/0/1; NULL inputs propagate (no-result) —
    the bare otherwise() branch used to map them to 1."""
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("int")).when(
        a < b, F.lit(-1)
    ).when(a == b, F.lit(0)).otherwise(F.lit(1))


def fstring(fmt: str, *cols: Column) -> Column:
    """nemo f-strings (parser/ast/expression/complex/fstring.rs) — '{}' slots.
    Literal '%' is escaped FIRST: java.util.Formatter would otherwise read
    it as a conversion and abort the query ('100% of {}')."""
    return F.format_string(fmt.replace("%", "%%").replace("{}", "%s"), *cols)


# ------------------------------------------------------------------- casts
# failed cast => row dropped (nemo CastToInteger etc.)


def cast_to_integer(a: Column) -> Column:
    return a.try_cast("long")


def cast_to_double(a: Column) -> Column:
    return a.try_cast("double")


def cast_to_float(a: Column) -> Column:
    return a.try_cast("float")


# ------------------------------------------------------------- type checks


def check_is_integer(a: Column) -> Column:
    return a.try_cast("long").isNotNull()


def check_is_numeric(a: Column) -> Column:
    return a.try_cast("double").isNotNull()


def check_is_null(a: Column) -> Column:
    return a.isNull()


def check_is_string(a: Column) -> Column:
    return a.try_cast("string").isNotNull()
