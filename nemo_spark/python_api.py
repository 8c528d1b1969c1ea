"""``nmo_python``-compatible Python API.

Mirrors the reference's Python bindings surface
(``/root/reference/nemo-python/src/lib.rs``) over the Spark engine, so
scripts written against ``nmo_python`` — ``load_string`` / ``load_file``,
``NemoEngine``, ``NemoResults``, ``NemoOutputManager``, ``NemoLiteral`` —
run with only the import changed (or unchanged, via the top-level
``nmo_python`` shim module).

Parity notes (each mirrors a lib.rs behavior):

- value conversion (lib.rs:167 ``datavalue_to_python``): plain strings and
  IRIs arrive as their CANONICAL strings (``"quoted"`` / ``<bracketed>``),
  language-tagged strings as :class:`NemoLiteral`, numbers as int/float,
  booleans as bool, nulls as ``_:N`` strings, and other typed literals as
  :class:`NemoLiteral`; tuples/maps raise (the reference panics with
  ``todo!``).
- row order: the reference yields rows in its internal trie order, which its
  own blackbox test treats as irrelevant (multiset compare,
  nemo-python/tests/test_blackbox.py:45-56). Here rows come sorted by nemo's
  cross-domain total order — deterministic across runs.
- null names: the reference numbers nulls by dictionary id; here ``_:N`` is
  assigned per engine in first-conversion order (stable within an engine,
  consistent across result() calls — the property programs rely on).
- ``write_result`` (lib.rs:464): silently does nothing unless the predicate
  is known AND the program declares an ``@export`` for it; writes ONE file
  (the reference's ExportManager layout), distributed-serialized then
  concatenated from the part files.
"""

from __future__ import annotations

import logging
import os
import re
import shutil
import tempfile
from dataclasses import dataclass, field
from datetime import timedelta

from nemo_spark.model.values import (
    RDF_LANGSTRING,
    T_BOOLEAN,
    T_DOUBLE,
    T_FLOAT,
    T_INT,
    T_IRI,
    T_LANG,
    T_MAP,
    T_NULL,
    T_STRING,
    T_TUPLE,
    Value,
    XSD,
    quote_iri,
    quote_string,
)

XSD_STRING = XSD + "string"

log = logging.getLogger("nemo_spark.python_api")

_NAME_RE = re.compile(r"[A-Za-z][A-Za-z0-9_%]*\Z")  # IriDataValue::is_name


class NemoError(Exception):
    """Engine/program error (lib.rs:29 ``create_exception!(NemoError)``)."""


def load_file(file: str) -> "NemoProgram":
    with open(file) as f:
        contents = f.read()
    prog = load_string(contents)
    prog._workdir = os.path.dirname(os.path.abspath(file))
    return prog


def load_string(rules: str) -> "NemoProgram":
    """Parse + validate a program (lib.rs:67); errors raise NemoError."""
    from nemo_spark.parser.compile import CompileError, compile_program
    from nemo_spark.parser.rls import parse_rls

    try:
        ast = parse_rls(rules)
        compiled = compile_program(ast)
    except (SyntaxError, CompileError, ValueError) as err:
        raise NemoError(str(err)) from err
    return NemoProgram(rules, ast, compiled)


class NemoProgram:
    """A parsed and transformed nemo program (lib.rs:56)."""

    def __init__(self, source: str, ast, compiled) -> None:
        self._source = source
        self._ast = ast
        self._compiled = compiled
        self._workdir = "."

    def output_predicates(self) -> list[str]:
        """@output predicates; when the program declares neither @output nor
        @export, every derived predicate (set_default_outputs.rs:23-27)."""
        if self._compiled.outputs or self._compiled.exports:
            return list(self._compiled.outputs)
        out, seen = [], set()
        for rule in self._compiled.program.rules:
            for head in rule.heads():
                # the reference's SetDefaultOutputs runs on the SOURCE rule
                # model; compiler-minted intermediates (``__agg_rN`` splits)
                # are not user predicates and must not leak
                if head.pred.startswith("__"):
                    continue
                if head.pred not in seen:
                    seen.add(head.pred)
                    out.append(head.pred)
        return out

    def edb_predicates(self) -> set[str]:
        """Predicates with an @import (ProgramRead::import_predicates)."""
        return {imp.pred for imp in self._compiled.imports}


class NemoOutputManager:
    """Export destination (lib.rs:93): base path + overwrite/gzip flags."""

    def __init__(self, path: str, overwrite: bool = False, gzip: bool = False) -> None:
        self._path = path
        self._overwrite = overwrite
        self._gzip = gzip


class NemoLiteral:
    """An RDF literal value (lib.rs:109-162): language-tagged or typed."""

    def __init__(self, value: str, lang: str | None = None, datatype: str | None = None):
        if not isinstance(value, str):
            raise NemoError("Only string arguments are currently supported")
        self._value = value
        self._language = lang
        if datatype is not None:
            self._datatype = datatype
        else:
            self._datatype = RDF_LANGSTRING if lang is not None else XSD_STRING

    def value(self) -> str:
        return self._value

    def datatype(self) -> str:
        return self._datatype

    def language(self) -> str | None:
        return self._language

    def __eq__(self, other) -> bool:
        if not isinstance(other, NemoLiteral):
            return NotImplemented
        return (self._value, self._language, self._datatype) == (
            other._value,
            other._language,
            other._datatype,
        )

    def __hash__(self) -> int:
        return hash((self._value, self._language, self._datatype))

    def __lt__(self, other):  # lib.rs:157: ordering is not implemented
        raise NotImplementedError("RDF comparison is not implemented")

    __le__ = __gt__ = __ge__ = __lt__

    def __repr__(self) -> str:
        if self._language is not None:
            return f"{quote_string(self._value)}@{self._language}"
        return f"{quote_string(self._value)}^^{quote_iri(self._datatype)}"


class NemoTuple(tuple):
    """A nemo tuple / function term as a Python tuple (beyond-reference:
    lib.rs:193-194 ``todo!()``s this conversion). Function-term labels (IRI
    strings) ride on ``.label`` and participate in equality — ``f(1,2)`` and
    ``g(1,2)`` are different nemo values. Unlabeled tuples compare equal to
    plain Python tuples."""

    def __new__(cls, iterable=(), label=None):
        self = super().__new__(cls, iterable)
        self.label = label
        return self

    def __eq__(self, other):
        if not isinstance(other, tuple):
            return NotImplemented
        if not tuple.__eq__(self, other):
            return False
        return self.label == getattr(other, "label", None)

    def __ne__(self, other):
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    def __hash__(self) -> int:
        # unlabeled tuples compare equal to plain tuples, so they must hash
        # like them (set/dict membership breaks otherwise); labeled tuples
        # fold the label in
        return tuple.__hash__(self) if self.label is None else hash((self.label, tuple(self)))

    def __repr__(self) -> str:
        head = "" if self.label is None else str(self.label)
        return head + "(" + ", ".join(repr(e) for e in self) + ")"


class NemoMap(dict):
    """A nemo ordered map as a Python dict (insertion order = nemo's
    key-sorted BTreeMap order). The optional map label rides on ``.label``
    and participates in equality."""

    label = None

    def __eq__(self, other):
        if not isinstance(other, dict):
            return NotImplemented
        return dict.__eq__(self, other) and self.label == getattr(other, "label", None)

    def __ne__(self, other):
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    __hash__ = None  # dicts are unhashable; so are nemo maps used as keys here

    def __repr__(self) -> str:
        head = "" if self.label is None else str(self.label)
        return head + "{" + ", ".join(f"{k!r} = {v!r}" for k, v in self.items()) + "}"


class NemoResults:
    """Iterator over converted result rows (lib.rs:316-333)."""

    def __init__(self, rows: list) -> None:
        self._it = iter(rows)

    def __iter__(self) -> "NemoResults":
        return self

    def __next__(self):
        return next(self._it)


def _as_value(v) -> Value:
    """Normalize a trace-witness cell (see :meth:`Value.from_cell`)."""
    return Value.from_cell(v)


def _display(v: Value) -> str:
    """nemo's Display for data values: canonical form, except plain-name
    IRIs print bare (iri_datavalue.rs:85-92)."""
    if v.t == T_IRI and _NAME_RE.match(v.s):
        return v.s
    return v.canonical()


class NemoFact:
    """A ground fact in a trace (lib.rs:206-225)."""

    def __init__(self, pred: str, values: tuple, conv) -> None:
        self._pred = pred
        self._values = values
        self._conv = conv

    def predicate(self) -> str:
        return self._pred

    def constants(self) -> list:
        return [self._conv(v) for v in self._values]

    def __repr__(self) -> str:
        return f"{self._pred}({', '.join(_display(v) for v in self._values)})"


class NemoTrace:
    """Derivation tree of a traced fact (lib.rs:227-267): rule-application
    nodes carry rule text / assignment / optional name / display; leaves are
    facts."""

    def __init__(self, node: dict, engine: "NemoEngine") -> None:
        self._node = node
        self._engine = engine

    def _is_leaf(self) -> bool:
        return not self._node.get("rule")

    def subtraces(self) -> list["NemoTrace"] | None:
        if self._is_leaf():
            return None
        return [NemoTrace(p, self._engine) for p in self._node.get("premises", [])]

    def fact(self) -> NemoFact | None:
        if not self._is_leaf():
            return None
        pred, values = self._node["fact"]
        return NemoFact(pred, tuple(_as_value(v) for v in values), self._engine._to_python)

    def rule(self) -> str | None:
        if self._is_leaf():
            return None
        return self._engine._rule_text(self._node["rule"])

    def assignement(self) -> dict | None:  # sic — reference spelling
        if self._is_leaf():
            return None
        return {
            var: self._engine._to_python(val)
            for var, val in self._engine._assignment(self._node).items()
        }

    def dict(self) -> dict:
        if self._is_leaf():
            pred, values = self._node["fact"]
            return {"fact": f"{pred}({', '.join(_display(_as_value(v)) for v in values)})"}
        out: dict = {
            "rule": self.rule(),
            "assignment": self.assignement(),
        }
        label = self._node["rule"]
        name = self._engine._rule_attr(label, "name")
        if name is not None:
            out["name"] = name
        display = self._engine._rule_attr(label, "display", self._engine._assignment(self._node))
        if display is not None:
            out["display"] = display
        out["subtraces"] = [t.dict() for t in self.subtraces()]
        return out


@dataclass
class NemoTiming:
    """A node of the reasoning timing tree (lib.rs:340-402). The Spark
    engine tracks wall time only, so system/process/thread time all report
    it (the reference's three clocks differ on a multi-threaded native
    engine; here per-rule work happens in executor JVMs)."""

    name: str
    _wall_ms: float = 0.0
    _children: list = field(default_factory=list)

    @property
    def system_time(self) -> timedelta:
        return timedelta(milliseconds=self._wall_ms)

    process_time = system_time
    thread_time = system_time

    @property
    def subnodes(self) -> list["NemoTiming"]:
        return list(self._children)

    def subnode(self, name: str) -> "NemoTiming | None":
        node = self
        for part in name.split("/"):
            node = next((c for c in node._children if c.name == part), None)
            if node is None:
                return None
        return node

    def __repr__(self) -> str:
        ms = int(self._wall_ms)
        return (
            f"NemoTiming(name = {self.name!r}, process_time = {ms}ms, "
            f"system_time = {ms}ms, thread_time = {ms}ms)"
        )


class NemoEngine:
    """Execution engine over one program (lib.rs:404-517)."""

    def __init__(self, program: NemoProgram, spark=None) -> None:
        from nemo_spark.parser.runner import RlsRunner
        from nemo_spark.session import get_spark

        self._program = program
        spark = spark if spark is not None else get_spark()
        try:
            self._runner = RlsRunner(
                spark,
                source=program._source,
                workdir=program._workdir,
                trace=True,  # the reference always supports .trace()
            )
        except (SyntaxError, ValueError) as err:
            raise NemoError(str(err)) from err
        self._reasoned = False
        self._wall_ms = 0.0
        self._null_ids: dict[str, int] = {}

    # ------------------------------------------------------------- reasoning

    def reason(self) -> None:
        import time

        t0 = time.time()
        try:
            self._runner.run()
        except Exception as err:
            # lib.rs:42-44 py_res: EVERY engine error surfaces as NemoError —
            # including import failures, which on this backend arrive as
            # pyspark AnalysisException / Py4JJavaError rather than ValueError
            raise NemoError(str(err)) from err
        self._wall_ms = (time.time() - t0) * 1000.0
        self._reasoned = True

    # --------------------------------------------------------------- results

    def _resolve(self, predicate: str) -> str:
        from nemo_spark.parser.runner import _ResolverView

        return _ResolverView(self._runner.compiled).pred(predicate)

    def _to_python(self, v: Value):
        """lib.rs:167 datavalue_to_python."""
        v = _as_value(v)
        if v.t == T_LANG:
            text, tag = v.lang_pair()
            return NemoLiteral(text, lang=tag)
        if v.t in (T_STRING, T_IRI):
            return v.canonical()
        if v.t in (T_DOUBLE, T_FLOAT):
            return v.d
        if v.t == T_INT:
            return v.i
        if v.t == T_BOOLEAN:
            return bool(v.i)
        if v.t == T_NULL:
            n = self._null_ids.setdefault(v.s, len(self._null_ids))
            return f"_:{n}"
        if v.t == T_TUPLE:
            # beyond the reference: lib.rs:193-194 todo!()s tuple conversion,
            # but the value model is complete here — convert to a Python
            # tuple (function-term labels ride on .label)
            label, elems = v.structured_parts()
            return NemoTuple(
                (self._to_python(e) for e in elems),
                label=None if label is None else self._to_python(label),
            )
        if v.t == T_MAP:
            label, pairs = v.structured_parts()
            try:
                m = NemoMap((self._to_python(k), self._to_python(val)) for k, val in pairs)
            except TypeError as err:  # nested-map key: dicts can't key a dict
                raise NemoError(f"map key not convertible to Python: {err}") from err
            m.label = None if label is None else self._to_python(label)
            return m
        # UnsignedLong / Other -> typed literal
        return NemoLiteral(v.lexical(), datatype=v.datatype_iri())

    def _rows(self, predicate: str) -> list[tuple]:
        resolved = self._resolve(predicate)
        try:
            df = self._runner.table(resolved)
        except (KeyError, ValueError) as err:
            raise NemoError(str(err)) from err
        nullary = resolved in self._runner.compiled.nullary
        rows = []
        for row in df.collect():
            if nullary:
                rows.append(())
                continue
            rows.append(tuple(_as_value(c) for c in row))
        rows.sort(key=lambda r: tuple(v.order_key() for v in r))
        return rows

    def result(self, predicate: str) -> NemoResults:
        return NemoResults([[self._to_python(v) for v in row] for row in self._rows(predicate)])

    # ---------------------------------------------------------------- export

    def write_result(self, predicate: str, output_manager: NemoOutputManager) -> None:
        """Write one predicate through its @export handler into the output
        manager's directory as a single file (lib.rs:464-501: unknown
        predicate or missing export handler is a silent no-op; like the
        reference's ``.find``, only the FIRST matching export declaration
        is written). Serialization (limit/delimiter/compression) is shared
        with ``write_exports`` via ``RlsRunner.serialize_export``."""
        resolved = self._resolve(predicate)
        match = next(
            (
                (name, df, exp)
                for name, (df, exp) in self._runner.export_frames().items()
                if exp.pred == resolved
            ),
            None,
        )
        if match is None:
            return
        name, df, exp = match
        os.makedirs(output_manager._path, exist_ok=True)
        from nemo_spark.parser.runner import _interpreted_expressions

        if output_manager._gzip and not name.endswith(".gz"):
            name = name + ".gz"
        target = os.path.join(output_manager._path, name)
        if os.path.exists(target) and not output_manager._overwrite:
            raise NemoError(f"export target exists: {target}")
        tmp = tempfile.mkdtemp(prefix="nmo_export_")
        try:
            with _interpreted_expressions(self._runner.spark):
                ser, kind, opts = self._runner.serialize_export(df, exp)
                if output_manager._gzip:
                    opts["compression"] = "gzip"
                w = ser.write.mode("overwrite")
                for k, v in opts.items():
                    w = w.option(k, v)
                if kind == "text":
                    w.text(tmp)
                else:
                    w.csv(tmp)
            # concatenate the part files into ONE file (concatenated gzip
            # members form a valid gzip stream, so this covers both modes)
            parts = sorted(
                f for f in os.listdir(tmp) if f.startswith("part-") and not f.endswith(".crc")
            )
            with open(target, "wb") as out:
                for p in parts:
                    with open(os.path.join(tmp, p), "rb") as src:
                        shutil.copyfileobj(src, out)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # ----------------------------------------------------------------- trace

    def trace(self, fact_string: str) -> NemoTrace | None:
        try:
            tree = self._runner.trace(fact_string)
        except (SyntaxError, ValueError) as err:
            # lib.rs:440 maps only parse/validation failures to None
            # (CompileError subclasses ValueError); genuine backend failures
            # (Py4J/analysis errors mid-trace) must stay distinguishable from
            # "fact not derived", so they surface as NemoError
            log.debug("trace(%r): not parseable/derivable: %s", fact_string, err)
            return None
        except Exception as err:
            raise NemoError(f"trace failed: {err}") from err
        if tree is None:
            return None
        return NemoTrace(tree, self)

    def _label_ast_rule(self, label: str):
        m = re.search(r"r(\d+)", label)
        if m is None:
            return None
        idx = int(m.group(1))
        rules = self._runner.ast.rules
        return rules[idx] if idx < len(rules) else None

    def _rule_text(self, label: str) -> str:
        rast = self._label_ast_rule(label)
        return _render_rule(rast) if rast is not None else label

    def _assignment(self, node: dict) -> dict:
        """Reconstruct the rule-application substitution by unifying the
        compiled rule's body atoms with the premise facts."""
        from nemo_spark.model.rules import Var

        label = node["rule"]
        rule = self._runner.engine._rules_by_label.get(label)
        if rule is None:
            return {}
        out: dict = {}
        for atom, premise in zip(rule.body, node.get("premises", [])):
            _, fact_vals = premise["fact"]
            for i, t in enumerate(atom.terms):
                if isinstance(t, Var) and not t.name.startswith("__"):
                    out[f"?{t.name}"] = _as_value(fact_vals[i])
        return out

    def _rule_attr(self, label: str, key: str, assignment: dict | None = None):
        """Evaluate a rule attribute (#[name(...)] / #[display(...)]) under
        the given assignment; None when absent or not evaluable (the
        reference's instantiated_display is likewise optional)."""
        rast = self._label_ast_rule(label)
        if rast is None or key not in rast.attrs:
            return None
        from nemo_spark.parser.runner import _ResolverView

        env = {
            k[1:]: v for k, v in (assignment or {}).items()
        }  # strip the '?' prefix
        ev = _env_eval_cls()(
            _ResolverView(self._runner.compiled), self._runner.compiled.params, env
        )
        try:
            return ev.eval(rast.attrs[key]).lexical()
        except Exception:
            return None

    # ---------------------------------------------------------------- timing

    def timing(self) -> NemoTiming:
        """lib.rs:457: the TimedCode tree. Shape: root -> Reasoning ->
        Rules -> Rule {i} (one node per source rule, main.rs --report
        tree), with compiled sub-rules (aggregate/multi-head splits)
        folded into their source rule's node."""
        per_rule: dict[int, float] = {}
        if self._reasoned:
            for label, stats in self._runner.report()["rules"].items():
                # compiled sub-rule labels carry the source index embedded
                # (``r3h0``, ``__agg_r3``) — fold them into Rule 3. Merged
                # rounds are recorded under '+'-joined labels (``r1+r2``
                # when several rules derive one head predicate); that wall
                # is genuinely joint, so split it evenly across the
                # constituent rules rather than crediting the first.
                idxs = [int(m.group(1)) for m in re.finditer(r"r(\d+)", label)]
                for idx in set(idxs):
                    per_rule[idx] = per_rule.get(idx, 0.0) + stats["wall_ms"] / len(set(idxs))
        rule_nodes = [
            NemoTiming(f"Rule {i}", per_rule.get(i, 0.0))
            for i in range(len(self._runner.ast.rules))
        ]
        rules = NemoTiming("Rules", sum(n._wall_ms for n in rule_nodes), rule_nodes)
        reasoning = NemoTiming("Reasoning", self._wall_ms, [rules])
        return NemoTiming("root", self._wall_ms, [reasoning])


_ENV_EVAL_CLS = None


def _env_eval_cls():
    """GroundEval variant resolving ``?var`` terms from a bound environment
    (rule-attribute instantiation). Built lazily — importing GroundEval at
    module top would pull pyspark into every ``import nmo_python``."""
    global _ENV_EVAL_CLS
    if _ENV_EVAL_CLS is None:
        from nemo_spark.parser.compile import GroundEval
        from nemo_spark.parser.rls import TVar

        class _EnvEval(GroundEval):
            def __init__(self, resolver, params, env) -> None:
                super().__init__(resolver, params)
                self._env = env

            def eval(self, n):
                if isinstance(n, TVar):
                    if n.name not in self._env:
                        raise ValueError(f"unbound ?{n.name}")
                    return self._env[n.name]
                return super().eval(n)

        _ENV_EVAL_CLS = _EnvEval
    return _ENV_EVAL_CLS


# ------------------------------------------------------------- rule display

# renderers live in parser/render.py (shared with the compiler, which stamps
# each Rule's ``display``); keep the private aliases for existing callers
from nemo_spark.parser.render import (  # noqa: E402
    render_atom as _render_atom,
    render_rule as _render_rule,
    render_term as _render_term,
)
