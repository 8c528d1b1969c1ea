"""Internalize simple rules over JSON imports into reader-side patterns.

Reference: ``nemo/src/rule_model/pipeline/transformations/filter_imports.rs``
(TransformationFilterImports) rewrites rules of the shape

    head(...) :- imported(...), condition, assignment, ... .

— exactly one positive body atom naming an imported predicate, no negation,
one head atom, no aggregates/existentials — by DELETING the rule and
attaching its conditions + head projection to the import as
FilterTransformPatterns, provided the imported predicate is used nowhere
else (not exported, not an output, no facts, no other rules). The import
then produces the head predicate directly and the reader filters/projects
each row as it streams in (``format_builder.rs:693`` build_import).

Spark mapping: DSV imports scan through Spark's native csv reader, where
Catalyst already pushes filters/pruning into the scan (plan-asserted in
tests/test_ops.py), so internalizing would only duplicate the optimizer.
JSON imports parse inside ``mapInPandas`` — a Catalyst Filter above them
runs AFTER the full (node, key, value) expansion crosses the Arrow
boundary, so for JSON we mirror the reference's internalization: qualifying
rules compile to plain-Python closures over Value rows, applied inside the
reader task (:mod:`nemo_spark.sources.patterns`).

Closures must survive cloudpickle to executors, so every ground leaf is
evaluated eagerly on the driver (capturing only Values / ints / strings /
module-level functions — never the resolver or compiled program, which
hold unpicklable Catalyst objects).
"""

from __future__ import annotations

from nemo_spark.model.values import T_BOOLEAN, Value, ValueError_
from nemo_spark.parser.compile import _GROUND_FNS, CompileError, GroundEval
from nemo_spark.parser.rls import (
    ProgramAST,
    RuleAST,
    TAgg,
    TCall,
    TEVar,
    TFString,
    TIri,
    TMap,
    TName,
    TNum,
    TParam,
    TPName,
    TString,
    TTuple,
    TVar,
    TWildcard,
)
from nemo_spark.sources.patterns import FilterTransformPattern

_GROUND_PRIMS = (TNum, TString, TIri, TPName, TName, TParam)


def _expr_vars(node) -> set[str]:
    if isinstance(node, TVar):
        return {node.name}
    if isinstance(node, (TCall, TAgg)):
        out: set[str] = set()
        for a in node.args:
            out |= _expr_vars(a)
        return out
    if isinstance(node, TFString):
        out = set()
        for p in node.parts:
            if not isinstance(p, str):
                out |= _expr_vars(p)
        return out
    return set()


def _expr_supported(node) -> bool:
    """Can :func:`_compile_expr` evaluate this node per row?"""
    if isinstance(node, TVar):
        return True
    if isinstance(node, TCall):
        return node.fn in _GROUND_FNS and all(_expr_supported(a) for a in node.args)
    if isinstance(node, TFString):
        return all(isinstance(p, str) or _expr_supported(p) for p in node.parts)
    if isinstance(node, (TAgg, TEVar, TWildcard)):
        return False
    if isinstance(node, TTuple):
        return all(_expr_supported(e) and not _expr_vars(e) for e in node.elems)
    if isinstance(node, TMap):
        return all(
            _expr_supported(k) and _expr_supported(v) and not (_expr_vars(k) | _expr_vars(v))
            for k, v in node.pairs
        )
    return isinstance(node, _GROUND_PRIMS)


def check_rule(rule: RuleAST) -> str | None:
    """filter_imports.rs:52 ``check_rule``: the body predicate if the rule
    can be internalized into an import of that predicate, else None. We
    additionally require one head ATOM (the reference allows several atoms
    over one predicate; pattern construction maps one rule to one pattern)
    and that every condition / head term is expressible with the driver
    ground-function catalogue."""
    if len(rule.heads) != 1:
        return None
    if not rule.heads[0].terms:
        # a nullary head would internalize to zero transforms (an empty
        # reader schema); leave it to the engine's nullary rewrite
        return None
    atoms = [i for k, i in rule.body if k == "atom"]
    if len(atoms) != 1 or any(k == "neg" for k, _ in rule.body):
        return None
    atom = atoms[0]
    bound: set[str] = set()
    for t in atom.terms:
        if isinstance(t, TVar):
            bound.add(t.name)
        elif isinstance(t, TWildcard):
            continue
        elif not (isinstance(t, _GROUND_PRIMS) and _expr_supported(t)):
            return None
    for k, e in rule.body:
        if k != "expr":
            continue
        if not _expr_supported(e) or not _expr_vars(e) <= bound:
            return None
    for t in rule.heads[0].terms:
        if not _expr_supported(t) or not _expr_vars(t) <= bound:
            return None
    return atom.pred


def internalize_filter_imports(ast: ProgramAST) -> int:
    """Mutate ``ast``: qualifying rules over JSON imports are removed and
    attached to the import as ``imp.filter_rules``; the import is retargeted
    to the head predicate. Returns the number of internalized rules.

    Runs on raw AST names (pre-resolution): a prefixed/full-IRI spelling
    mismatch between sites simply fails the textual match and skips the
    rewrite — always safe, the rule then evaluates normally."""
    forbidden: set[str] = set()
    rule_body_pred: dict[int, str] = {}
    for rule in ast.rules:
        bp = check_rule(rule)
        if bp is None:
            for h in rule.heads:
                forbidden.add(h.pred)
            for k, item in rule.body:
                if k in ("atom", "neg"):
                    forbidden.add(item.pred)
        else:
            rule_body_pred[id(rule)] = bp
    forbidden |= {f.pred for f in ast.facts}
    forbidden |= {e.pred for e in ast.exports}
    forbidden |= set(ast.outputs)

    import_fmts: dict[str, set[str]] = {}
    for imp in ast.imports:
        import_fmts.setdefault(imp.pred, set()).add(imp.fmt)

    # a predicate that is an internalization SOURCE cannot also be a
    # retarget DESTINATION: its import-produced rows would bypass the very
    # rules being internalized elsewhere
    sources = {
        imp.pred
        for imp in ast.imports
        if import_fmts[imp.pred] == {"json"}
        and imp.pred not in forbidden
        and any(bp == imp.pred for bp in rule_body_pred.values())
    }

    internalized: set[int] = set()
    for imp in ast.imports:
        if imp.fmt != "json" or import_fmts[imp.pred] != {"json"}:
            continue  # mixed-format predicates would need patterns on all
        if imp.pred in forbidden:
            continue
        rules = [r for r in ast.rules if rule_body_pred.get(id(r)) == imp.pred]
        if not rules:
            continue
        heads = {r.heads[0].pred for r in rules}
        if len(heads) != 1:  # same_head_predicate (filter_imports.rs:86)
            continue
        if len({len(r.heads[0].terms) for r in rules}) != 1:
            # mixed head arities: an invalid program (predicate arity
            # conflict) — leave the rules in place so compile_program
            # raises its arity error instead of truncating columns
            continue
        head_pred = next(iter(heads))
        if head_pred in sources or head_pred == imp.pred:
            continue
        imp.filter_rules = rules
        imp.pred = head_pred
        internalized |= {id(r) for r in rules}

    if internalized:
        ast.rules = [r for r in ast.rules if id(r) not in internalized]
    return len(internalized)


# ------------------------------------------------------------- compilation


def _truth(v: Value) -> bool:
    if v.t != T_BOOLEAN:
        raise ValueError_("filter condition is not boolean")
    return bool(v.i)


def _compile_expr(node, ge: GroundEval, var_pos: dict[str, int]):
    """AST expression -> closure(row) -> Value. Ground leaves evaluate NOW
    (driver-side, with the program's resolver/params); the closure captures
    only the result."""
    if isinstance(node, TVar):
        pos = var_pos[node.name]
        return lambda row: row[pos]
    if isinstance(node, TCall):
        fn = _GROUND_FNS.get(node.fn)
        if fn is None:
            raise CompileError(f"cannot internalize function {node.fn}")
        args = [_compile_expr(a, ge, var_pos) for a in node.args]
        return lambda row: fn(*[a(row) for a in args])
    if isinstance(node, TFString):
        parts = [p if isinstance(p, str) else _compile_expr(p, ge, var_pos) for p in node.parts]
        return lambda row: Value.string(
            "".join(p if isinstance(p, str) else p(row).lexical() for p in parts)
        )
    const = ge.eval(node)
    return lambda row: const


def build_patterns(rules: list[RuleAST], ge: GroundEval):
    """Internalized rules -> (patterns, output_arity).

    Pattern shape per rule (rule.rs:553 ``into_filter_transform_pattern``):
    atom constants and repeated variables become equality filters, body
    expressions become boolean filters, head terms become per-position
    transforms."""
    patterns = []
    arity = None
    for rule in rules:
        atom = next(i for k, i in rule.body if k == "atom")
        var_pos: dict[str, int] = {}
        filters = []
        for pos, t in enumerate(atom.terms):
            if isinstance(t, TWildcard):
                continue
            if isinstance(t, TVar):
                if t.name in var_pos:
                    first = var_pos[t.name]
                    filters.append(lambda row, a=first, b=pos: row[a] == row[b])
                else:
                    var_pos[t.name] = pos
            else:
                const = ge.eval(t)
                filters.append(lambda row, p=pos, c=const: row[p] == c)
        for k, e in rule.body:
            if k != "expr":
                continue
            cond = _compile_expr(e, ge, var_pos)
            filters.append(lambda row, c=cond: _truth(c(row)))
        transforms = tuple(_compile_expr(t, ge, var_pos) for t in rule.heads[0].terms)
        patterns.append(FilterTransformPattern(tuple(filters), transforms))
        arity = len(transforms)
    return patterns, arity
