"""Parser for nemo's ``.rls`` rule language (text -> statement AST).

Re-implements the surface grammar of the reference's nom-based parser
(``nemo/src/parser.rs:104-114``, AST ``nemo/src/parser/ast/**``,
token definitions ``nemo/src/parser/ast/token.rs``) as a regex tokenizer +
recursive-descent parser. Covered surface (everything the reference's
testcase corpus uses):

- directives: @prefix @base @import @export @output @parameter @declare
  (``nemo/src/syntax.rs:15-58``)
- facts (ground atoms, incl. ground arithmetic: ``fact(5 * 2)``)
- rules: multi-atom heads, positive/negated body atoms, comparisons,
  assignments, aggregates ``#min/#max/#sum/#count(expr, distinct...)``,
  existentials ``!V``, wildcards ``_``, f-strings ``f"...{expr}..."``
- terms: variables, numbers (incl. 0b/0o/0x encodings and f/F/d/D float
  markers, ``parser/ast/expression/basic/{number,enc_number}.rs``), strings
  with @lang / ^^datatype, IRIs, prefixed names, bare-name constants (IRIs),
  infix arithmetic with precedence, builtin function calls (syntax.rs name
  catalogue), parameters ``$x``

The tokenizer mirrors two reference quirks exactly: names may contain ``%``
(``Token::name`` = alpha (alnum|_|%)*, token.rs:386), so ``%`` starts a
comment only at token-start; and ``<...>`` IRIs may hold arbitrary non-space
content (``<+>`` is an IRI constant).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

# --------------------------------------------------------------------- AST


@dataclass(frozen=True)
class TVar:
    name: str


@dataclass(frozen=True)
class TEVar:
    name: str


@dataclass(frozen=True)
class TWildcard:
    pass


@dataclass(frozen=True)
class TParam:
    name: str


@dataclass(frozen=True)
class TNum:
    """Number literal, kept lexical (sign folded in); marker: None|'f'|'d'."""

    text: str
    marker: str | None = None
    radix: int = 10


@dataclass(frozen=True)
class TString:
    text: str  # unescaped
    lang: str | None = None
    # datatype as ('iri', value) or ('pname', prefix, local)
    datatype: tuple | None = None


@dataclass(frozen=True)
class TIri:
    iri: str


@dataclass(frozen=True)
class TPName:
    prefix: str
    local: str


@dataclass(frozen=True)
class TName:
    """Bare name constant (an IRI in nemo's model) — also booleans."""

    name: str


@dataclass(frozen=True)
class TCall:
    fn: str  # canonical uppercase-name from syntax.rs builtin::function
    args: tuple


@dataclass(frozen=True)
class TAgg:
    op: str  # min|max|sum|count
    args: tuple  # first = aggregated expr, rest = distinct variables


@dataclass(frozen=True)
class TFString:
    parts: tuple  # str | expr nodes


@dataclass(frozen=True)
class TTuple:
    """Tuple '(a, b)' or labeled function term 'f(a, b)' (parser
    ast/expression/complex/tuple.rs; label = nemo FunctionTerm tag)."""

    elems: tuple
    label: object = None  # TName | TPName | TIri | None


@dataclass(frozen=True)
class TMap:
    """Map '{k = v, ...}', optionally labeled (complex/map.rs)."""

    pairs: tuple  # ((key expr, value expr), ...)
    label: object = None


@dataclass(frozen=True)
class AtomAST:
    pred: str  # resolved predicate name (prefixed names joined)
    terms: tuple


@dataclass
class RuleAST:
    heads: list[AtomAST]
    body: list  # ('atom', AtomAST) | ('neg', AtomAST) | ('expr', expr-node)
    # rule attributes (``#[name("...")] #[display(f"...")]`` prefixes,
    # nemo/src/rule_model/components/rule.rs attributes): attribute name ->
    # argument term node (one argument each; unknown names are preserved
    # here and ignored downstream, matching the reference's lenient set)
    attrs: dict = field(default_factory=dict)


@dataclass
class ImportAST:
    pred: str
    fmt: str
    options: dict
    body: list = field(default_factory=list)  # extra body items (computed names)


@dataclass
class ExportAST:
    pred: str
    fmt: str
    options: dict
    body: list = field(default_factory=list)


@dataclass
class ProgramAST:
    prefixes: dict = field(default_factory=dict)
    base: str | None = None
    parameters: list = field(default_factory=list)  # (name, expr)
    declares: list = field(default_factory=list)
    imports: list = field(default_factory=list)
    exports: list = field(default_factory=list)
    outputs: list = field(default_factory=list)
    facts: list = field(default_factory=list)  # AtomAST
    rules: list = field(default_factory=list)  # RuleAST


# --------------------------------------------------------------- tokenizer

_TOKEN_RES = [
    ("WS", r"[ \t\r\n]+"),
    # triple-quoted (multi-line) variants must precede the plain ones, and
    # f-strings must precede NAME ('f' is a valid name start)
    ("FSTRING3", r'f"""(?:[^"\\]|\\.|"(?!""))*"""'),
    ("STRING3", r'"""(?:[^"\\]|\\.|"(?!""))*"""'),
    ("FSTRING", r'f"(?:[^"\\]|\\.)*"'),
    ("STRING", r'"(?:[^"\\]|\\.)*"'),
    ("ENCNUM", r"0b[01]+|0o[0-7]+|0x[0-9A-Fa-f]+"),
    ("NUMBER", r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?(?:[fFdD](?![A-Za-z0-9_]))?"),
    # local part may CONTAIN '.' but not END with one (Turtle PN_LOCAL):
    # a trailing dot is the statement terminator ('@output ex:result.')
    ("PNAME", r"(?:[A-Za-z][A-Za-z0-9_%]*)?:[A-Za-z](?:[A-Za-z0-9_%\-./#]*[A-Za-z0-9_%\-/#])?"),
    ("NAME", r"[A-Za-z][A-Za-z0-9_%]*"),
    ("VAR", r"\?[A-Za-z][A-Za-z0-9_]*"),
    ("EVAR", r"![A-Za-z][A-Za-z0-9_]*"),
    ("PARAM", r"\$[A-Za-z][A-Za-z0-9_]*"),
    ("ATTR", r"#\["),  # rule attribute opener; must precede AGG (both start '#')
    ("AGG", r"#[A-Za-z]+"),
    # subtags included: "color"@en-US is ONE language tag (without them the
    # '-US' leaked into arithmetic as string-minus-constant, silently)
    ("DIRECTIVE", r"@[A-Za-z]+(?:-[A-Za-z0-9]+)*"),
    ("IRIREF", r"<[^<>\s]*>"),
    ("WILDCARD", r"_[A-Za-z0-9_]*"),
    ("ARROW", r":-"),
    ("DCARET", r"\^\^"),
    ("OP", r">=|<=|!=|=|<|>|\+|-|\*|/"),
    ("PUNCT", r"[(){},.;~:\[\]]"),
    ("COMMENT", r"%[^\n]*"),
]
_MASTER = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_RES))


@dataclass(frozen=True)
class Tok:
    kind: str
    text: str
    pos: int


def tokenize(src: str) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    n = len(src)
    while i < n:
        m = _MASTER.match(src, i)
        if not m:
            raise SyntaxError(f"rls: cannot tokenize at offset {i}: {src[i:i+30]!r}")
        kind = m.lastgroup
        text = m.group()
        if kind not in ("WS", "COMMENT"):
            out.append(Tok(kind, text, i))
        i = m.end()
    out.append(Tok("EOF", "", n))
    return out


# ------------------------------------------------------------------ parser


_UNESC = {"n": "\n", "r": "\r", "t": "\t", "\\": "\\", '"': '"'}


def _unescape(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(_UNESC.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class Parser:
    def __init__(self, toks: list[Tok]) -> None:
        self.toks = toks
        self.i = 0

    # ---- token utilities

    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> Tok | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> Tok:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise SyntaxError(f"rls: expected {kind}{'/' + text if text else ''}, got "
                              f"{got.kind} {got.text!r} at offset {got.pos}")
        return t

    # ---- entry

    def parse(self) -> ProgramAST:
        prog = ProgramAST()
        while self.peek().kind != "EOF":
            t = self.peek()
            if t.kind == "DIRECTIVE":
                self._directive(prog)
            else:
                self._fact_or_rule(prog)
        return prog

    def _attributes(self) -> dict:
        """``#[name(args...)]`` prefixes before a rule. One argument term is
        kept per attribute (name/display each take exactly one); trailing
        arguments of unknown multi-arg attributes are parsed and dropped."""
        attrs: dict = {}
        while self.peek().kind == "ATTR":
            self.next()
            key = self.expect("NAME").text
            self.expect("PUNCT", "(")
            args = [self._expr()]
            while self.accept("PUNCT", ","):
                args.append(self._expr())
            self.expect("PUNCT", ")")
            self.expect("PUNCT", "]")
            attrs[key] = args[0]
        return attrs

    # ---- directives

    def _directive(self, prog: ProgramAST) -> None:
        d = self.next().text[1:].lower()
        if d == "prefix":
            # @prefix name: <iri> .  (also the empty prefix: "@prefix : <iri>")
            if self.peek().kind == "PUNCT" and self.peek().text == ":":
                self.next()
                name = ""
            else:
                name_tok = self.next()
                name = name_tok.text
                if name.endswith(":"):
                    name = name[:-1]
                else:
                    self.accept("PUNCT", ":")
            iri = self.expect("IRIREF").text[1:-1]
            self.expect("PUNCT", ".")
            prog.prefixes[name] = iri
        elif d == "base":
            prog.base = self.expect("IRIREF").text[1:-1]
            self.expect("PUNCT", ".")
        elif d == "import" or d == "export":
            pred = self._pred_name()
            self.expect("ARROW")
            fmt = self.expect("NAME").text.lower()
            self.expect("PUNCT", "{")
            options: dict = {}
            while not self.accept("PUNCT", "}"):
                key = self.expect("NAME").text
                self.expect("OP", "=")
                options[key] = self._import_option_value()
                if not self.accept("PUNCT", ","):
                    self.expect("PUNCT", "}")
                    break
            body = []
            while self.accept("PUNCT", ","):
                body.append(self._body_item())
            self.expect("PUNCT", ".")
            tgt = prog.imports if d == "import" else prog.exports
            cls = ImportAST if d == "import" else ExportAST
            tgt.append(cls(pred, fmt, options, body))
        elif d == "output":
            prog.outputs.append(self._pred_name())
            while self.accept("PUNCT", ","):
                prog.outputs.append(self._pred_name())
            self.expect("PUNCT", ".")
        elif d == "parameter":
            # expression optional (parmater_declaration.rs: a bare
            # '@parameter $x .' must then be supplied externally)
            name = self.expect("PARAM").text[1:]
            expr = None
            if self.accept("OP", "="):
                expr = self._expr()
            self.expect("PUNCT", ".")
            prog.parameters.append((name, expr))
        elif d == "declare":
            # @declare pred(type, ...) — types recorded but not enforced
            pred = self._pred_name()
            self.expect("PUNCT", "(")
            types = []
            while not self.accept("PUNCT", ")"):
                tok = self.next()
                if tok.kind == "EOF":
                    # next() does not advance past EOF: without this check
                    # an unclosed @declare spun forever growing `types`
                    raise SyntaxError("rls: unclosed @declare type list")
                if tok.text != ",":
                    types.append(tok.text)
            self.expect("PUNCT", ".")
            prog.declares.append((pred, types))
        else:
            raise SyntaxError(f"rls: unknown directive @{d}")

    def _import_option_value(self):
        """Option value: string, f-string, number, name, or tuple (a, b, ...)."""
        if self.accept("PUNCT", "("):
            items = []
            while not self.accept("PUNCT", ")"):
                items.append(self._import_option_value())
                if not self.accept("PUNCT", ","):
                    self.expect("PUNCT", ")")
                    break
            return tuple(items)
        t = self.peek()
        if t.kind in ("STRING", "FSTRING", "NUMBER", "ENCNUM", "NAME", "IRIREF", "PNAME"):
            return self._expr()
        raise SyntaxError(f"rls: bad option value {t.text!r}")

    # ---- statements

    def _pred_name(self) -> str:
        t = self.peek()
        if t.kind in ("NAME", "PNAME"):
            return self.next().text
        if t.kind == "IRIREF":
            # KEEP the angle brackets: stripping them here made <urn:uuid:1>
            # indistinguishable from a pname (the 'urn' prefix), and
            # <ex:local> silently prefix-expanded. Resolver.pred strips them
            # after routing bracketed names down the absolute/relative-IRI
            # path instead of prefix resolution.
            return self.next().text
        raise SyntaxError(f"rls: expected predicate name, got {t.text!r}")

    def _fact_or_rule(self, prog: ProgramAST) -> None:
        attrs = self._attributes()
        heads = [self._atom()]
        while self.accept("PUNCT", ","):
            heads.append(self._atom())
        if self.accept("ARROW"):
            body = [self._body_item()]
            while self.accept("PUNCT", ","):
                body.append(self._body_item())
            self.expect("PUNCT", ".")
            prog.rules.append(RuleAST(heads, body, attrs=attrs))
        else:
            self.expect("PUNCT", ".")
            if attrs:
                raise SyntaxError("rls: attributes are only allowed on rules")
            if len(heads) != 1:
                raise SyntaxError("rls: fact statements have a single atom")
            prog.facts.append(heads[0])

    def _body_item(self):
        if self.accept("PUNCT", "~"):
            return ("neg", self._atom())
        # atom iff NAME/PNAME/IRIREF directly followed by '('
        t = self.peek()
        if t.kind in ("NAME", "PNAME", "IRIREF") and self.peek(1).text == "(":
            # could still be a builtin call used as a filter — treat known
            # builtin names as expressions, everything else as atoms
            if t.text.lower() not in _BUILTINS_CI:
                return ("atom", self._atom())
        return ("expr", self._expr())

    def _atom(self) -> AtomAST:
        pred = self._pred_name()
        self.expect("PUNCT", "(")
        terms = []
        if not self.accept("PUNCT", ")"):
            terms.append(self._expr())
            while self.accept("PUNCT", ","):
                terms.append(self._expr())
            self.expect("PUNCT", ")")
        return AtomAST(pred, tuple(terms))

    # ---- expressions (precedence: comparison < add/sub < mul/div < unary)

    _CMP_MAP = {
        "=": "EQUALITY",
        "!=": "UNEQUALITY",
        ">": "NUMGREATER",
        ">=": "NUMGREATEREQ",
        "<": "NUMLESS",
        "<=": "NUMLESSEQ",
    }

    def _expr(self):
        left = self._addsub()
        t = self.peek()
        if t.kind == "OP" and t.text in self._CMP_MAP:
            op = self.next().text
            right = self._addsub()
            return TCall(self._CMP_MAP[op], (left, right))
        return left

    def _addsub(self):
        left = self._muldiv()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("+", "-"):
                op = self.next().text
                right = self._muldiv()
                left = TCall("SUM" if op == "+" else "SUBTRACTION", (left, right))
            else:
                return left

    def _muldiv(self):
        left = self._unary()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("*", "/"):
                op = self.next().text
                right = self._unary()
                left = TCall("PRODUCT" if op == "*" else "DIVISION", (left, right))
            else:
                return left

    def _unary(self):
        if self.accept("OP", "-"):
            inner = self._unary()
            # fold the sign into the literal ONCE: '-(-5)' must become
            # INVERTSIGN(-5), not the invalid lexical '--5'
            if isinstance(inner, TNum) and not inner.text.startswith("-"):
                return TNum("-" + inner.text, inner.marker, inner.radix)
            return TCall("INVERTSIGN", (inner,))
        return self._primary()

    def _primary(self):
        t = self.next()
        if t.kind == "STRING3":
            t = Tok("STRING", t.text[2:-2], t.pos)  # strip to single-quoted form
        if t.kind == "FSTRING3":
            return self._fstring(t.text[4:-3])
        if t.kind == "NUMBER":
            marker = None
            text = t.text
            if text[-1] in "fFdD" and not text[-1].isdigit():
                marker = text[-1].lower()
                text = text[:-1]
            return TNum(text, marker)
        if t.kind == "ENCNUM":
            radix = {"b": 2, "o": 8, "x": 16}[t.text[1]]
            return TNum(t.text[2:], None, radix)
        if t.kind == "STRING":
            body = _unescape(t.text[1:-1])
            # optional @lang or ^^datatype directly after
            if self.peek().kind == "DIRECTIVE":  # "@en" tokenizes as DIRECTIVE
                lang = self.next().text[1:]
                return TString(body, lang=lang)
            if self.accept("DCARET"):
                dt_tok = self.next()
                if dt_tok.kind == "IRIREF":
                    return TString(body, datatype=("iri", dt_tok.text[1:-1]))
                if dt_tok.kind == "PNAME":
                    p, _, l = dt_tok.text.partition(":")
                    return TString(body, datatype=("pname", p, l))
                raise SyntaxError(f"rls: bad datatype {dt_tok.text!r}")
            return TString(body)
        if t.kind == "FSTRING":
            return self._fstring(t.text[2:-1])
        if t.kind == "IRIREF":
            node = TIri(t.text[1:-1])
            if self.peek().kind == "PUNCT" and self.peek().text == "(":
                return self._function_term(node)
            if self.peek().kind == "PUNCT" and self.peek().text == "{":
                self.next()
                return self._map_body(node)
            return node
        if t.kind == "PNAME":
            p, _, l = t.text.partition(":")
            if self.peek().text == "(":
                return self._call_args(t.text, label_node=TPName(p, l))
            if self.peek().kind == "PUNCT" and self.peek().text == "{":
                self.next()
                return self._map_body(TPName(p, l))
            return TPName(p, l)
        if t.kind == "VAR":
            return TVar(t.text[1:])
        if t.kind == "EVAR":
            return TEVar(t.text[1:])
        if t.kind == "PARAM":
            return TParam(t.text[1:])
        if t.kind == "WILDCARD":
            return TWildcard()
        if t.kind == "AGG":
            op = t.text[1:].lower()
            if op not in ("min", "max", "sum", "count"):
                raise SyntaxError(f"rls: unknown aggregate #{op}")
            self.expect("PUNCT", "(")
            args = [self._expr()]
            while self.accept("PUNCT", ",") or self.accept("PUNCT", ";"):
                args.append(self._expr())
            self.expect("PUNCT", ")")
            return TAgg(op, tuple(args))
        if t.kind == "NAME":
            if self.peek().text == "(":
                return self._call_args(t.text, label_node=TName(t.text))
            if self.peek().kind == "PUNCT" and self.peek().text == "{":
                self.next()
                return self._map_body(TName(t.text))
            return TName(t.text)
        if t.kind == "PUNCT" and t.text == "(":
            # '()' / '(a, b)' / '(a,)' are tuple terms (complex/tuple.rs);
            # '(e)' without a comma is a parenthesized expression
            if self.accept("PUNCT", ")"):
                return TTuple(())
            inner = self._expr()
            if self.peek().kind == "PUNCT" and self.peek().text == ",":
                elems = [inner]
                while self.accept("PUNCT", ","):
                    if self.peek().kind == "PUNCT" and self.peek().text == ")":
                        break  # trailing comma (1-tuples: '(a,)')
                    elems.append(self._expr())
                self.expect("PUNCT", ")")
                return TTuple(tuple(elems))
            self.expect("PUNCT", ")")
            return inner
        if t.kind == "PUNCT" and t.text == "{":
            return self._map_body(None)
        raise SyntaxError(f"rls: unexpected token {t.kind} {t.text!r} at offset {t.pos}")

    def _map_body(self, label) -> TMap:
        """'{k = v, ...}' after the opening brace (complex/map.rs)."""
        pairs = []
        while not self.accept("PUNCT", "}"):
            key = self._addsub()
            self.expect("OP", "=")
            val = self._addsub()
            pairs.append((key, val))
            if not self.accept("PUNCT", ","):
                self.expect("PUNCT", "}")
                break
        return TMap(tuple(pairs), label)

    def _call_args(self, name: str, label_node=None):
        canon = _BUILTINS_CI.get(name.lower())
        self.expect("PUNCT", "(")
        args = []
        if not self.accept("PUNCT", ")"):
            args.append(self._expr())
            while self.accept("PUNCT", ","):
                args.append(self._expr())
            self.expect("PUNCT", ")")
        if canon is None:
            # not a builtin: a labeled function term f(a, b) — a tuple with
            # the tag as label (rule_model/components/term/function.rs;
            # ground.rs:118 TupleDataValue with label)
            if label_node is None:
                raise SyntaxError(f"rls: unknown function {name!r}")
            return TTuple(tuple(args), label=label_node)
        return TCall(canon, tuple(args))

    def _function_term(self, label_node) -> TTuple:
        self.expect("PUNCT", "(")
        args = []
        if not self.accept("PUNCT", ")"):
            args.append(self._expr())
            while self.accept("PUNCT", ","):
                args.append(self._expr())
            self.expect("PUNCT", ")")
        return TTuple(tuple(args), label=label_node)

    def _fstring(self, body: str) -> TFString:
        """f-string: literal text with {expr} slots (fstring.rs)."""
        parts: list[Any] = []
        buf = []
        i = 0
        while i < len(body):
            c = body[i]
            if c == "\\" and i + 1 < len(body):
                buf.append(_UNESC.get(body[i + 1], body[i + 1]))
                i += 2
            elif c == "{":
                j = body.find("}", i)
                if j < 0:
                    raise SyntaxError(f"rls f-string: unterminated '{{' in {body!r}")
                if buf:
                    parts.append("".join(buf))
                    buf = []
                sub = Parser(tokenize(body[i + 1:j]))
                expr = sub._expr()
                if sub.peek().kind != "EOF":
                    # a slot is ONE expression: silently dropping trailing
                    # tokens turned typos into wrong output strings
                    raise SyntaxError(
                        f"rls f-string: trailing input in expression slot {body[i + 1:j]!r}"
                    )
                parts.append(expr)
                i = j + 1
            else:
                buf.append(c)
                i += 1
        if buf:
            parts.append("".join(buf))
        return TFString(tuple(parts))


# builtin function names, case-preserved per syntax.rs (lowercase-insensitive
# lookup because the corpus uses both #MAX and #max style casing for some)
_BUILTIN_NAMES = [
    "EQUALITY", "UNEQUALITY", "NUMGREATER", "NUMGREATEREQ", "NUMLESS", "NUMLESSEQ",
    "isInteger", "isFloat", "isDouble", "isIri", "isNumeric", "isNull", "isString",
    "ABS", "SQRT", "NOT", "fullStr", "STR", "SIN", "COS", "TAN", "STRLEN", "STRREV",
    "UCASE", "LCASE", "URIENCODE", "URIDECODE", "ROUND", "CEIL", "FLOOR", "DATATYPE",
    "STRLANG", "LANG", "INT", "DOUBLE", "FLOAT", "IRI", "LOG", "POW", "COMPARE",
    "CONTAINS", "SUBSTR", "STRSTARTS", "STRENDS", "STRBEFORE", "STRAFTER", "REGEX",
    "REM", "BITAND", "BITOR", "BITXOR", "BITSHL", "BITSHRU", "BITSHR", "MAX", "MIN",
    "LUKA", "SUM", "PRODUCT", "SUBTRACTION", "DIVISION", "INVERTSIGN", "AND", "OR",
    "CONCAT", "LEVENSHTEIN",
]
# case-insensitive lookup (the corpus uses both STRSTARTS and strStarts
# casings); keyed lowercase, values are the canonical upper-case names
_BUILTINS_CI = {n.lower(): n for n in _BUILTIN_NAMES}


def parse_rls(src: str) -> ProgramAST:
    return Parser(tokenize(src)).parse()


def parse_term(src: str):
    """Parse one standalone term expression (GroundTerm::parse parity for
    externally supplied ``--param key=value`` values)."""
    p = Parser(tokenize(src))
    expr = p._expr()
    if p.peek().kind != "EOF":
        raise SyntaxError(f"rls term: trailing input at offset {p.peek().pos}: {src!r}")
    return expr
