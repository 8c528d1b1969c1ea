"""Render parsed rls AST nodes back to reference-Display-style text.

The reference renders rules via their Display impl (used by ``nmo`` trace
output and the Python bindings' rule listing); this module is the
AST-level equivalent, shared by the bindings (`python_api._render_rule`)
and the compiler (which stamps each compiled Rule's ``display`` so trace
exports show rule text instead of a Python dataclass repr)."""

from __future__ import annotations

from nemo_spark.model.values import quote_string


def render_term(t) -> str:
    from nemo_spark.parser import rls as R

    if isinstance(t, R.TVar):
        return f"?{t.name}"
    if isinstance(t, R.TEVar):
        return f"!{t.name}"
    if isinstance(t, R.TWildcard):
        return "_"
    if isinstance(t, R.TNum):
        return t.text
    if isinstance(t, R.TString):
        out = quote_string(t.text)
        if t.lang:
            out += f"@{t.lang}"
        elif t.datatype is not None:
            out += f"^^{render_term(t.datatype)}"
        return out
    if isinstance(t, R.TIri):
        return f"<{t.iri}>"
    if isinstance(t, R.TPName):
        return f"{t.prefix}:{t.local}"
    if isinstance(t, R.TName):
        return t.name
    if isinstance(t, R.TParam):
        return f"${t.name}"
    if isinstance(t, R.TFString):
        inner = "".join(p if isinstance(p, str) else "{" + render_term(p) + "}" for p in t.parts)
        return f'f"{inner}"'
    if isinstance(t, R.TTuple):
        head = render_term(t.label) if t.label is not None else ""
        inner = ", ".join(render_term(e) for e in t.elems)
        if t.label is None and len(t.elems) == 1:
            inner += ","  # 1-tuple disambiguator, as the parser requires
        return f"{head}({inner})"
    if isinstance(t, R.TMap):
        head = render_term(t.label) if t.label is not None else ""
        inner = ", ".join(f"{render_term(k)} = {render_term(v)}" for k, v in t.pairs)
        return head + "{" + inner + "}"
    if isinstance(t, R.TAgg):
        return f"{t.op}({', '.join(render_term(a) for a in t.args)})"
    if isinstance(t, R.TCall):
        if t.fn in ("SUM", "SUBTRACTION", "PRODUCT", "DIVISION") and len(t.args) == 2:
            op = {"SUM": "+", "SUBTRACTION": "-", "PRODUCT": "*", "DIVISION": "/"}[t.fn]
            return f"{render_term(t.args[0])} {op} {render_term(t.args[1])}"
        cmp = {
            "EQUALITY": "=",
            "UNEQUALITY": "!=",
            "NUMGREATER": ">",
            "NUMGREATEREQ": ">=",
            "NUMLESS": "<",
            "NUMLESSEQ": "<=",
        }.get(t.fn)
        if cmp and len(t.args) == 2:
            return f"{render_term(t.args[0])} {cmp} {render_term(t.args[1])}"
        return f"{t.fn}({', '.join(render_term(a) for a in t.args)})"
    return repr(t)


def render_atom(a) -> str:
    return f"{a.pred}({', '.join(render_term(t) for t in a.terms)})"


def render_rule(rast) -> str:
    """Reference Display form: ``head :- body, items .``"""
    heads = ", ".join(render_atom(h) for h in rast.heads)
    items = []
    for kind, *rest in [(b[0], *b[1:]) for b in rast.body]:
        if kind == "atom":
            items.append(render_atom(rest[0]))
        elif kind == "neg":
            items.append("~" + render_atom(rest[0]))
        else:
            items.append(render_term(rest[0]))
    return f"{heads} :- {', '.join(items)} ."
