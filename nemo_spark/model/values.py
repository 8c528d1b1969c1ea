"""Typed value model: nemo's dynamically-typed RDF data values on Spark.

The reference stores every value as (datatype, lexical form) with a
cross-domain total order (``nemo-physical/src/datavalues/datavalue.rs:45-221``,
``any_datavalue.rs:719`` Ord). We encode a value as a 4-field struct column

    struct<t: int, i: bigint, d: double, s: string>

with exactly one payload field populated per domain (unused fields are
normalized to 0 / 0.0 / ""), so

- struct EQUALITY  == value equality (disjoint domains stay distinct:
  Int(3) != Double(3.0), matching the reference), and
- struct ORDERING  == nemo's cross-domain total order: ``t`` carries
  ``relative_domain_position`` (datavalue.rs:163-221), and within a domain
  only one of i/d/s is populated, so field-wise struct comparison reduces to
  the within-domain value order (AnyDataValue::cmp, any_datavalue.rs:719).
  This makes ``F.min/F.max`` over value-struct columns implement nemo's
  #min/#max directly.

Integer subdomains (Int/Long/NonNegative*/Unsigned* — all i64-representable)
collapse to one INT tag: their relative positions (100-110) exist only so the
domain order agrees with natural integer order across disjoint ranges, which
plain i64 ordering under a single tag already provides. u64 values above
i64::MAX keep nemo's UnsignedLong position (110) with the value wrapped to
i64 (monotone within the tag).

Driver-side :class:`Value` mirrors AnyDataValue construction/serialization
(``any_datavalue.rs:new_from_*``, DSV serialization ``dsv/value_format.rs``);
the struct encoding is shared with the Catalyst expression library in
:mod:`nemo_spark.functions.typed`.
"""

from __future__ import annotations

import re
import struct as _struct
from dataclasses import dataclass
from decimal import Decimal

# domain tags = nemo relative_domain_position (datavalue.rs:163-221)
T_NULL = 10
T_IRI = 13
T_STRING = 20
T_LANG = 22
T_OTHER = 24
T_TUPLE = 26  # labeled tuple / function term (tuple_datavalue.rs)
T_MAP = 28  # ordered map (map_datavalue.rs)
T_BOOLEAN = 30
T_FLOAT = 50
T_DOUBLE = 52
T_INT = 100
T_ULONG = 110  # u64 values > i64::MAX (nemo ValueDomain::UnsignedLong)

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
NEMO_TUPLE = "nemo:tuple"  # ValueDomain::type_iri (datavalue.rs:117)
NEMO_MAP = "nemo:map"  # datavalue.rs:119

I64_MIN = -(1 << 63)
I64_MAX = (1 << 63) - 1
U64_MAX = (1 << 64) - 1

# Spark schema of one encoded value column
VALUE_SCHEMA = "struct<t:int,i:bigint,d:double,s:string>"

# payload separator inside s for LANG (text SEP tag) / OTHER (lexical SEP
# dtype). In-band by design (language tags and datatype IRIs can never
# contain NUL); the one representational limit is lang-TEXT/OTHER-lexical
# payloads containing NUL themselves — lang_pair/other_pair split on the
# FIRST separator, so such payloads truncate (documented, property-tested).
SEP = "\x00"


class ValueError_(ValueError):
    """Value creation failed (nemo: DataValueCreationError => eval error =>
    the row is dropped / the fact is rejected)."""


@dataclass(frozen=True)
class Value:
    """One nemo data value in normalized struct form (t, i, d, s)."""

    t: int
    i: int = 0
    d: float = 0.0
    s: str = ""

    # ------------------------------------------------------------ constructors

    @staticmethod
    def int(v: int) -> "Value":
        if v < I64_MIN:
            raise ValueError_(f"integer out of range: {v}")
        if v > I64_MAX:
            if v > U64_MAX:
                raise ValueError_(f"integer out of range: {v}")
            return Value(T_ULONG, i=v - (1 << 64))
        return Value(T_INT, i=v)

    @staticmethod
    def double(v: float) -> "Value":
        if v != v or v in (float("inf"), float("-inf")):
            # nemo excludes NaN/Inf from the Double domain (datavalue.rs:58)
            raise ValueError_(f"double not finite: {v}")
        return Value(T_DOUBLE, d=float(v))

    @staticmethod
    def float32(v: float) -> "Value":
        f = f32_round(v)
        if f != f or f in (float("inf"), float("-inf")):
            raise ValueError_(f"float not finite: {v}")
        return Value(T_FLOAT, d=f)

    @staticmethod
    def string(v: str) -> "Value":
        return Value(T_STRING, s=v)

    @staticmethod
    def lang_string(text: str, tag: str) -> "Value":
        return Value(T_LANG, s=text + SEP + tag.lower())

    @staticmethod
    def iri(v: str) -> "Value":
        return Value(T_IRI, s=v)

    @staticmethod
    def boolean(v: bool) -> "Value":
        return Value(T_BOOLEAN, i=1 if v else 0)

    @staticmethod
    def null(label: str) -> "Value":
        return Value(T_NULL, s=label)

    @staticmethod
    def other(lexical: str, datatype: str) -> "Value":
        return Value(T_OTHER, s=lexical + SEP + datatype)

    @staticmethod
    def tuple_of(elements: "list[Value]", label: "Value | None" = None) -> "Value":
        """Tuple / labeled function term (tuple_datavalue.rs). The payload
        ``s`` is nemo's lexical form — element CANONICAL strings joined by
        ',' inside '()', prefixed by the label's canonical form (an IRI) for
        function terms (tuple_datavalue.rs:43-57); ``i`` holds the length.
        The lexical form is injective over element values, so struct
        equality equals nemo tuple equality. (Within-domain ORDER is the
        lexical string order, not nemo's element-wise value order — see
        module docstring caveat.)"""
        lex = ",".join(e.canonical() for e in elements)
        head = label.canonical() if label is not None else ""
        return Value(T_TUPLE, i=len(elements), s=head + "(" + lex + ")")

    @staticmethod
    def map_of(
        pairs: "list[tuple[Value, Value]]", label: "Value | None" = None
    ) -> "Value":
        """Ordered map (map_datavalue.rs): key-sorted by nemo's cross-domain
        VALUE order (BTreeMap) — i.e. ``order_key()``, which compares
        tuple/map keys element-wise; the raw struct order would sort a
        structured key by its length field first and store pairs in the
        wrong canonical order. Duplicate keys keep the last value; lexical
        form 'label?{k=v,...}' over canonical strings."""
        dedup: dict[tuple, tuple[Value, Value]] = {}
        for k, v in pairs:
            dedup[k.as_row()] = (k, v)
        items = sorted(dedup.values(), key=lambda kv: kv[0].order_key())
        lex = ",".join(k.canonical() + "=" + v.canonical() for k, v in items)
        head = label.canonical() if label is not None else ""
        return Value(T_MAP, i=len(items), s=head + "{" + lex + "}")

    # -------------------------------------------------------------- accessors

    def lang_pair(self) -> tuple[str, str]:
        text, _, tag = self.s.partition(SEP)
        return text, tag

    def other_pair(self) -> tuple[str, str]:
        lex, _, dt = self.s.partition(SEP)
        return lex, dt

    def int_value(self) -> int:
        if self.t == T_INT:
            return self.i
        if self.t == T_ULONG:
            return self.i + (1 << 64)
        raise ValueError_("not an integer")

    def as_row(self) -> tuple[int, int, float, str]:
        return (self.t, self.i, self.d, self.s)

    @staticmethod
    def from_cell(c) -> "Value":
        """Normalize a stored-table cell: engine tables carry pyspark
        ``Row(t, i, d, s)`` structs; constants are already :class:`Value`.
        Explicit None checks — ``c.d or 0.0`` would coerce IEEE -0.0 (falsy)
        to +0.0, which prints as "0.0" instead of "-0.0"."""
        if isinstance(c, Value):
            return c
        return Value(
            int(c.t),
            0 if c.i is None else int(c.i),
            0.0 if c.d is None else float(c.d),
            c.s or "",
        )

    # ---------------------------------------------------------- serialization

    def datatype_iri(self) -> str | None:
        """Canonical datatype IRI (ValueDomain::type_iri, datavalue.rs:95)."""
        if self.t == T_STRING:
            return XSD + "string"
        if self.t == T_LANG:
            return RDF_LANGSTRING
        if self.t == T_IRI:
            return XSD + "anyURI"
        if self.t == T_FLOAT:
            return XSD + "float"
        if self.t == T_DOUBLE:
            return XSD + "double"
        if self.t == T_BOOLEAN:
            return XSD + "boolean"
        if self.t == T_ULONG:
            return XSD + "unsignedLong"
        if self.t == T_INT:
            v = self.i
            return XSD + ("int" if -(1 << 31) <= v < (1 << 31) else "long")
        if self.t == T_OTHER:
            return self.other_pair()[1]
        if self.t == T_TUPLE:
            return NEMO_TUPLE
        if self.t == T_MAP:
            return NEMO_MAP
        return None  # null

    def canonical(self) -> str:
        """nemo's canonical_string per value type (string_datavalue.rs:38,
        iri_datavalue.rs:73, float_datavalues.rs:60,143, null_datavalue.rs:48,
        other_datavalue.rs:32, integer canonical decimal)."""
        if self.t == T_INT:
            return str(self.i)
        if self.t == T_ULONG:
            return str(self.i + (1 << 64))
        if self.t == T_DOUBLE:
            return quote_string(rust_f64_str(self.d)) + "^^" + quote_iri(XSD + "double")
        if self.t == T_FLOAT:
            return quote_string(rust_f32_str(self.d)) + "^^" + quote_iri(XSD + "float")
        if self.t == T_STRING:
            return quote_string(self.s)
        if self.t == T_LANG:
            text, tag = self.lang_pair()
            return quote_string(text) + "@" + tag
        if self.t == T_IRI:
            return quote_iri(self.s)
        if self.t == T_BOOLEAN:
            return quote_string("true" if self.i else "false") + "^^" + quote_iri(XSD + "boolean")
        if self.t == T_NULL:
            return "_:" + self.s
        if self.t == T_OTHER:
            lex, dt = self.other_pair()
            return quote_string(lex) + "^^" + quote_iri(dt)
        if self.t in (T_TUPLE, T_MAP):
            # tuple_datavalue.rs:63 / map_datavalue.rs:74
            return quote_string(self.s) + "^^" + quote_iri(self.datatype_iri())
        raise ValueError_(f"unknown tag {self.t}")

    def rdf_term(self) -> str:
        """N-Triples term form (RDF export, ``rdf/writer.rs`` via oxrdf):
        IRIs bracketed, labeled nulls as blank nodes, plain strings bare
        quoted, language strings tagged, everything else a typed literal
        over the canonical lexical form."""
        if self.t == T_IRI:
            return "<" + self.s + ">"
        if self.t == T_NULL:
            return "_:" + self.s
        if self.t == T_STRING:
            return quote_string(self.s)
        if self.t == T_LANG:
            text, tag = self.lang_pair()
            return quote_string(text) + "@" + tag
        return quote_string(self.lexical()) + "^^" + quote_iri(self.datatype_iri())

    def dsv_any(self) -> str:
        """DSV export, 'anything' format: integers plain, plain strings
        canonical (quoted), IRIs bare, rest canonical
        (``dsv/value_format.rs:serialize_any_value_to_string``).

        Integer-valued floats/doubles/booleans are NOT integers here —
        serialize_integer_to_string only fires for integer domains."""
        if self.t in (T_INT, T_ULONG):
            return str(self.int_value())
        if self.t == T_IRI:
            return self.s
        return self.canonical()

    def lexical(self) -> str:
        """STR()-style lexical form (LexicalValue): payload without quotes."""
        if self.t == T_INT:
            return str(self.i)
        if self.t == T_ULONG:
            return str(self.i + (1 << 64))
        if self.t == T_DOUBLE:
            return rust_f64_str(self.d)
        if self.t == T_FLOAT:
            return rust_f32_str(self.d)
        if self.t in (T_STRING, T_IRI, T_NULL, T_TUPLE, T_MAP):
            return self.s
        if self.t == T_LANG:
            return self.lang_pair()[0]
        if self.t == T_BOOLEAN:
            return "true" if self.i else "false"
        if self.t == T_OTHER:
            return self.other_pair()[0]
        raise ValueError_(f"unknown tag {self.t}")

    # ------------------------------------------------------------- ordering

    def structured_parts(self) -> "tuple[Value | None, list]":
        """Parse a tuple/map payload back into ``(label, elements)`` /
        ``(label, [(key, value), ...])`` — the inverse of :meth:`tuple_of` /
        :meth:`map_of` over the canonical lexical form."""
        if self.t not in (T_TUPLE, T_MAP):
            raise ValueError_("not a structured value")
        return _structured_parts(self.s, self.t == T_MAP)

    def order_key(self):
        """Python-comparable key realizing nemo's total order
        (``AnyDataValue::cmp``, any_datavalue.rs:719): domain position
        first; within tuples/maps, ELEMENT-WISE recursion (the derived
        ``Ord`` of TupleDataValue/MapDataValue: label first, ``None`` before
        ``Some``, then slice/BTreeMap lexicographic over element values) —
        NOT the canonical-string order the raw struct encoding yields."""
        t = self.t
        if t in (T_INT, T_ULONG):
            return (t, self.int_value())
        if t in (T_FLOAT, T_DOUBLE):
            return (t, self.d + 0.0)  # -0.0 normalizes to 0.0 (reference: Equal)
        if t == T_BOOLEAN:
            return (t, self.i)
        if t in (T_STRING, T_IRI, T_NULL):
            return (t, self.s)
        if t == T_LANG:
            return (t, self.lang_pair())  # derived Ord over (text, tag)
        if t == T_OTHER:
            return (t, self.other_pair())  # derived Ord over (lexical, dtype)
        if t == T_TUPLE:
            label, elems = self.structured_parts()
            lk = (0, "") if label is None else (1, label.s)  # None < Some
            return (t, lk, tuple(e.order_key() for e in elems))
        if t == T_MAP:
            label, pairs = self.structured_parts()
            lk = (0, "") if label is None else (1, label.s)
            return (t, lk, tuple((k.order_key(), v.order_key()) for k, v in pairs))
        raise ValueError_(f"unknown tag {self.t}")

    def sort_key_bytes(self) -> bytes:
        """Order-preserving byte encoding of :meth:`order_key`: comparing
        keys as unsigned byte strings (Spark ``BinaryType`` ordering) equals
        comparing values in nemo's total order. Used by the typed #min/#max
        aggregate (``min_by/max_by`` over this key) so tuple/map columns
        order element-wise even distributed."""
        t = self.t
        head = bytes([t])
        if t == T_INT:
            return head + _struct.pack(">Q", self.i + (1 << 63))
        if t == T_ULONG:
            return head + _struct.pack(">Q", self.int_value() - (1 << 63))
        if t in (T_FLOAT, T_DOUBLE):
            bits = _struct.unpack(">Q", _struct.pack(">d", self.d + 0.0))[0]
            bits = (~bits & ((1 << 64) - 1)) if bits >> 63 else (bits | (1 << 63))
            return head + _struct.pack(">Q", bits)
        if t == T_BOOLEAN:
            return head + bytes([self.i])
        if t in (T_STRING, T_IRI, T_NULL):
            return head + _esc_key(self.s.encode("utf-8"))
        if t == T_LANG:
            text, tag = self.lang_pair()
            return head + _esc_key(text.encode("utf-8")) + _esc_key(tag.encode("utf-8"))
        if t == T_OTHER:
            lex, dt = self.other_pair()
            return head + _esc_key(lex.encode("utf-8")) + _esc_key(dt.encode("utf-8"))
        if t in (T_TUPLE, T_MAP):
            label, parts = self.structured_parts()
            out = head + (b"\x00" if label is None else b"\x01" + _esc_key(label.s.encode("utf-8")))
            if t == T_TUPLE:
                for e in parts:
                    out += _esc_key(e.sort_key_bytes())
            else:
                for k, v in parts:
                    out += _esc_key(k.sort_key_bytes()) + _esc_key(v.sort_key_bytes())
            return out
        raise ValueError_(f"unknown tag {self.t}")

    def __repr__(self) -> str:  # pragma: no cover
        return f"Value({self.canonical()})"


# ------------------------------------------------- structured-order helpers


def _esc_key(b: bytes) -> bytes:
    """Order-preserving, prefix-free encoding of one variable-length key
    segment: 0x00 -> 0x00 0xFF, terminated by 0x00 0x00 (the standard
    composite-key escape; concatenated segments then compare like the
    segment sequence)."""
    return b.replace(b"\x00", b"\x00\xff") + b"\x00\x00"


def _scan_term(s: str, i: int, stops: str) -> tuple[str, int]:
    """Scan one canonical term from position ``i`` until a top-level stop
    character; quoted strings (backslash escapes) and <IRIs> are opaque."""
    start = i
    n = len(s)
    while i < n:
        c = s[i]
        if c == '"':
            i += 1
            while i < n:
                if s[i] == "\\":
                    i += 2
                    continue
                if s[i] == '"':
                    i += 1
                    break
                i += 1
        elif c == "<":
            while i < n and s[i] != ">":
                i += 1
            i += 1
        elif c in stops:
            break
        else:
            i += 1
    return s[start:i], i


def _parse_struct_elem(text: str) -> "Value":
    """One tuple/map element from its canonical string; nested tuples/maps
    (quoted literals typed nemo:tuple / nemo:map) reconstruct structurally."""
    t = text.strip()
    m = _LITERAL_RE.match(t)
    if m and m.group("dt") in (NEMO_TUPLE, NEMO_MAP):
        lex = unescape_string(m.group("lex"))
        tag = T_TUPLE if m.group("dt") == NEMO_TUPLE else T_MAP
        _, parts = _structured_parts(lex, tag == T_MAP)
        return Value(tag, i=len(parts), s=lex)
    return parse_canonical(t)


def _structured_parts(s: str, is_map: bool) -> "tuple[Value | None, list]":
    open_, close = ("{", "}") if is_map else ("(", ")")
    label = None
    i = 0
    if s.startswith("<"):
        j = s.index(">")
        label = Value.iri(s[1:j])
        i = j + 1
    if i >= len(s) or s[i] != open_ or not s.endswith(close):
        raise ValueError_(f"malformed structured payload: {s!r}")
    body = s[i + 1 : -1]
    parts: list = []
    if not body:
        return label, parts
    i = 0
    while True:
        if is_map:
            k, i = _scan_term(body, i, "=")
            i += 1  # '='
            v, i = _scan_term(body, i, ",")
            parts.append((_parse_struct_elem(k), _parse_struct_elem(v)))
        else:
            e, i = _scan_term(body, i, ",")
            parts.append(_parse_struct_elem(e))
        if i >= len(body):
            break
        i += 1  # ','
    return label, parts


# ------------------------------------------------------------------ escaping


def quote_string(s: str) -> str:
    """datavalue.rs:15 quote_string."""
    return (
        '"'
        + s.replace("\\", "\\\\").replace('"', '\\"').replace("\r", "\\r").replace("\n", "\\n")
        + '"'
    )


def unescape_string(s: str) -> str:
    out = []
    it = iter(range(len(s)))
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            out.append({"n": "\n", "r": "\r", "t": "\t", "\\": "\\", '"': '"'}.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def quote_iri(s: str) -> str:
    return f"<{s}>"


# -------------------------------------------------------- float formatting


def f32_round(v: float) -> float:
    """Round a Python float (f64) to the nearest f32, returned as float."""
    return _struct.unpack("f", _struct.pack("f", v))[0]


def rust_f64_str(v: float) -> str:
    """Rust's ``f64::to_string()``: shortest round-trip decimal, never
    exponent notation, integral values without '.0' (3.0 -> "3")."""
    s = repr(float(v))  # Python repr is also shortest-round-trip
    if "e" in s or "E" in s:
        s = format(Decimal(s), "f")
    if s.endswith(".0"):
        s = s[:-2]
    if s == "-0":
        return "-0"
    return s


def rust_f32_str(v: float) -> str:
    """Rust's ``f32::to_string()`` for an f32 stored in a double."""
    import numpy as np

    f = np.float32(v)
    s = np.format_float_positional(f, unique=True, trim="-")
    return s


# ----------------------------------------------------------------- parsing


_INT_RE = re.compile(r"^[+-]?\d+$")
_DECIMAL_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")
# nemo's fallback IRI token consumes everything except '>', ' ', '\n'
# (parser Token::iri = is_not("> \n"), token.rs:406) — so in the DSV
# 'anything' format ANY space/'>'-free cell that isn't numeric or quoted
# becomes an IRI; only cells with spaces/'>' fall back to plain strings.
_IRI_TOKEN_RE = re.compile(r"^[^> \n]+$")
_LANG_RE = re.compile(r"^[a-zA-Z]+(-[a-zA-Z0-9]+)*$")


def canonical_decimal(lexical: str) -> tuple[str, bool, bool]:
    """Canonicalize a decimal literal: strip '+', leading zeros, trailing
    fractional zeros; '-.123' -> '-0.123'. Returns (canonical,
    has_nonzero_fraction, ok). Mirrors any_datavalue.rs
    parse_large_decimal_literal."""
    m = _DECIMAL_RE.match(lexical)
    if not m:
        return lexical, False, False
    neg = lexical.startswith("-")
    body = lexical.lstrip("+-")
    if "." in body:
        ip, fp = body.split(".", 1)
    else:
        ip, fp = body, ""
    ip = ip.lstrip("0")
    fp = fp.rstrip("0")
    if not ip:
        ip = "0"
    out = ("-" if neg and (ip != "0" or fp) else "") + ip + (("." + fp) if fp else "")
    return out, bool(fp), True


def from_decimal_literal(lexical: str, integer_only: bool = False) -> Value:
    """new_from_decimal_literal / new_from_integer_literal semantics:
    i64 if it fits; u64 if it fits; trailing-zero fractions collapse to
    integer; otherwise Other(xsd:decimal / xsd:integer)."""
    canon, has_fraction, ok = canonical_decimal(lexical)
    if not ok or (integer_only and "." in lexical):
        raise ValueError_(f"not a decimal literal: {lexical}")
    if has_fraction:
        if integer_only:
            raise ValueError_(f"not an integer literal: {lexical}")
        return Value.other(canon, XSD + "decimal")
    n = int(canon.split(".")[0])
    if I64_MIN <= n <= U64_MAX:
        return Value.int(n)
    return Value.other(canon.split(".")[0], XSD + "integer")


def from_typed_literal(lexical: str, datatype: str) -> Value:
    """AnyDataValue::new_from_typed_literal (any_datavalue.rs:231+)."""
    if datatype.startswith(XSD):
        t = datatype[len(XSD):]
        if t == "string":
            return Value.string(lexical)
        ranges = {
            "long": (I64_MIN, I64_MAX),
            "int": (-(1 << 31), (1 << 31) - 1),
            "short": (-32768, 32767),
            "byte": (-128, 127),
            "unsignedInt": (0, 4294967295),
            "unsignedShort": (0, 65535),
            "unsignedByte": (0, 255),
        }
        if t in ranges:
            if not _INT_RE.match(lexical):
                raise ValueError_(f"bad {t} literal: {lexical}")
            n = int(lexical)
            lo, hi = ranges[t]
            if not (lo <= n <= hi):
                raise ValueError_(f"{t} out of range: {lexical}")
            return Value.int(n)
        if t == "unsignedLong":
            if not _INT_RE.match(lexical) or lexical.startswith("-"):
                raise ValueError_(f"bad unsignedLong literal: {lexical}")
            n = int(lexical)
            if n > U64_MAX:
                raise ValueError_(f"unsignedLong out of range: {lexical}")
            return Value.int(n)
        if t in ("decimal", "integer", "positiveInteger", "nonNegativeInteger",
                 "negativeInteger", "nonPositiveInteger"):
            v = from_decimal_literal(lexical, integer_only=(t != "decimal"))
            # derived integer types constrain the value space
            # (any_datavalue.rs:319-333 new_from_decimal_type_literal):
            # out-of-domain lexicals are creation errors => fact rejected
            if v.t == T_INT:
                n = v.i
                if (
                    (t == "positiveInteger" and n <= 0)
                    or (t == "nonNegativeInteger" and n < 0)
                    or (t == "negativeInteger" and n >= 0)
                    or (t == "nonPositiveInteger" and n > 0)
                ):
                    raise ValueError_(f"out-of-domain {t} literal: {lexical}")
            elif v.t == T_ULONG and t in ("negativeInteger", "nonPositiveInteger"):
                raise ValueError_(f"out-of-domain {t} literal: {lexical}")  # > i64::MAX
            return v
        if t == "double":
            try:
                return Value.double(float(lexical))
            except (ValueError, OverflowError) as e:
                raise ValueError_(f"bad double literal: {lexical}") from e
        if t == "boolean":
            if lexical in ("true", "1"):
                return Value.boolean(True)
            if lexical in ("false", "0"):
                return Value.boolean(False)
            raise ValueError_(f"bad boolean literal: {lexical}")
        # xsd:float et al. fall through to Other (reference keeps them lexical)
    if datatype == RDF_LANGSTRING:
        # not constructible via typed literal in the reference either
        raise ValueError_("langString requires a language tag")
    return Value.other(lexical, datatype)


_LITERAL_RE = re.compile(r'^"(?P<lex>(?:[^"\\]|\\.)*)"(?:@(?P<lang>[A-Za-z0-9\-]+)|\^\^<(?P<dt>[^>]*)>)?$')


def parse_dsv_any(cell: str) -> Value:
    """DSV 'anything' format parser
    (``dsv/value_format.rs:parse_any_value_from_string``): trim; empty ->
    ""; <iri>; leading digit/sign -> decimal literal; quoted literal with
    optional @lang / ^^<dt>; bare tag name or absolute IRI -> IRI; else
    plain string."""
    cell = cell.strip()
    if not cell:
        return Value.string("")
    c0 = cell[0]
    if c0 == "<" and cell.endswith(">"):
        return Value.iri(cell[1:-1])
    if c0.isdigit() or c0 in "+-":
        try:
            return from_decimal_literal(cell)
        except ValueError_:
            pass
    if c0 == '"':
        pos = cell.rfind('"')
        if pos == len(cell) - 1 and pos > 0:
            return Value.string(cell[1:-1])
        if pos > 0 and pos + 1 < len(cell) and cell[pos + 1] == "@":
            return Value.lang_string(cell[1:pos], cell[pos + 2:])
        if pos > 0 and cell.endswith(">") and cell[pos:pos + 4] == '"^^<':
            try:
                return from_typed_literal(cell[1:pos], cell[pos + 4:-1])
            except ValueError_:
                pass
    if _IRI_TOKEN_RE.match(cell):
        return Value.iri(cell)
    return Value.string(cell)


def parse_dsv_string(cell: str) -> Value:
    return Value.string(cell)


def parse_dsv_int(cell: str) -> Value:
    return from_decimal_literal(cell.strip(), integer_only=True)


def parse_dsv_double(cell: str) -> Value:
    try:
        return Value.double(float(cell.strip()))
    except (ValueError, OverflowError) as e:
        raise ValueError_(f"bad double: {cell}") from e


def parse_canonical(text: str) -> Value:
    """Parse a value from nemo's canonical/export serialization (inverse of
    :meth:`Value.canonical` / :meth:`Value.dsv_any`): used by the golden
    harness to compare outputs as VALUES, not strings."""
    text_s = text.strip()
    if not text_s:
        return Value.string("")
    if text_s.startswith("_:"):
        return Value.null(text_s[2:])
    if text_s.startswith("<") and text_s.endswith(">"):
        return Value.iri(text_s[1:-1])
    m = _LITERAL_RE.match(text_s)
    if m:
        lex = unescape_string(m.group("lex"))
        if m.group("lang"):
            return Value.lang_string(lex, m.group("lang"))
        if m.group("dt") is not None:
            if m.group("dt") == XSD + "double":
                return Value.double(float(lex))
            if m.group("dt") == XSD + "float":
                return Value.float32(float(lex))
            return from_typed_literal(lex, m.group("dt"))
        return Value.string(lex)
    if _INT_RE.match(text_s):
        return from_decimal_literal(text_s)
    return Value.iri(text_s)
