"""Minimal SPARQL ASK evaluator over an in-memory triple list.

Drives the RDFa conformance oracle offline: the reference evaluates each
test's ASK query through Sesame (RdfaTestSuiteHelper.runTestBundle,
/root/reference/rdfa/src/test/java/org/semarglproject/rdf/rdfa/
RdfaTestSuiteHelper.java:82-108, SesameTestHelper.askModel:214-259); we
evaluate the same queries with a small backtracking matcher instead of a
SPARQL engine (executors/CI are offline, SURVEY.md §7.4 risk 6).

Supported surface (everything the rdfa-testsuite queries use):
PREFIX decls, basic graph patterns with ``a`` / IRIs / prefixed names /
literals (plain, @lang, ^^typed) / ?vars / _:labels, OPTIONAL blocks,
FILTER with isBlank / bound / lang() / str() / datatype(), comparisons
(= !=), && || !.
"""

from __future__ import annotations

import re

from ..kernels.model import Triple

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class _BudgetExceeded(Exception):
    """Evaluation step budget exhausted — treat as no match."""

_PREFIX_RE = re.compile(r"(?i)\bPREFIX\s+([\w-]*):\s*<([^>]*)>")
_BASE_RE = re.compile(r"(?i)\bBASE\s*<([^>]*)>")
_ASK_RE = re.compile(r"(?is)\bASK\s*(WHERE)?\s*\{(.*)\}\s*\Z")


class Term:
    __slots__ = ("kind", "value", "lang", "dtype")

    def __init__(self, kind, value, lang=None, dtype=None):
        self.kind = kind  # 'iri' | 'literal' | 'var' | 'bnode'
        self.value = value
        self.lang = lang
        self.dtype = dtype

    def __repr__(self):
        return f"Term({self.kind},{self.value!r},{self.lang},{self.dtype})"


class _Tokenizer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self):
        while self.pos < len(self.text):
            ch = self.text[self.pos]
            if ch in " \t\r\n":
                self.pos += 1
            elif ch == "#":
                nl = self.text.find("\n", self.pos)
                self.pos = len(self.text) if nl < 0 else nl
            else:
                break

    def eof(self):
        self.skip_ws()
        return self.pos >= len(self.text)

    def peek(self, n=1):
        self.skip_ws()
        return self.text[self.pos : self.pos + n]

    def take(self, n=1):
        self.skip_ws()
        s = self.text[self.pos : self.pos + n]
        self.pos += n
        return s

    def match_word(self, word):
        self.skip_ws()
        if self.text[self.pos : self.pos + len(word)].upper() == word.upper():
            end = self.pos + len(word)
            if end >= len(self.text) or not (self.text[end].isalnum() or self.text[end] == "_"):
                self.pos = end
                return True
        return False

    def read_until(self, stop_chars):
        # no skip_ws here: inside IRIREFs '#' is a fragment, not a comment
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos] not in stop_chars:
            self.pos += 1
        return self.text[start : self.pos]


def _unescape(s: str) -> str:
    return (
        s.replace("\\\\", "\x00")
        .replace('\\"', '"')
        .replace("\\n", "\n")
        .replace("\\t", "\t")
        .replace("\\r", "\r")
        .replace("\x00", "\\")
    )


class AskQuery:
    def __init__(self, text: str, base: str | None = None):
        self.prefixes = dict(_PREFIX_RE.findall(text))
        bm = _BASE_RE.search(text)
        self.base = bm.group(1) if bm else base
        m = _ASK_RE.search(text)
        if not m:
            raise ValueError("not an ASK query")
        self.patterns, self.optionals, self.filters = self._parse_group(
            _Tokenizer(m.group(2))
        )

    def _iri(self, ref: str) -> str:
        if self.base and not re.match(r"[A-Za-z][A-Za-z0-9+.\-]*:", ref):
            from urllib.parse import urljoin

            return urljoin(self.base, ref)
        return ref

    # ------------------------------------------------------------ parsing

    _collection_n = 0

    @classmethod
    def _fresh_bnode(cls) -> Term:
        cls._collection_n += 1
        return Term("bnode", f"__anon{cls._collection_n}")

    def _parse_term(self, tz: _Tokenizer, patterns=None):
        ch = tz.peek()
        if ch == "(":
            # RDF collection shorthand → first/rest/nil chain patterns
            tz.take()
            items = []
            while not tz.eof() and tz.peek() != ")":
                items.append(self._parse_term(tz, patterns))
            if tz.peek() == ")":
                tz.take()
            rdf_ns = RDF_TYPE.rsplit("#", 1)[0] + "#"
            first = Term("iri", rdf_ns + "first")
            rest = Term("iri", rdf_ns + "rest")
            nil = Term("iri", rdf_ns + "nil")
            if not items:
                return nil
            head = self._fresh_bnode()
            node = head
            for i, item in enumerate(items):
                if patterns is not None:
                    patterns.append((node, first, item))
                nxt = self._fresh_bnode() if i < len(items) - 1 else nil
                if patterns is not None:
                    patterns.append((node, rest, nxt))
                node = nxt
            return head
        if ch == "[":
            # [ p o; p2 o2 ] anonymous bnode with property list
            tz.take()
            anon = self._fresh_bnode()
            last_p = None
            while not tz.eof() and tz.peek() != "]":
                if tz.peek() in ";,.":
                    sep = tz.take()
                    if sep == ";":
                        last_p = None
                    continue
                pos0 = tz.pos
                if last_p is None:
                    p = self._parse_term(tz, patterns)
                else:
                    p = last_p
                o = self._parse_term(tz, patterns)
                if patterns is not None:
                    patterns.append((anon, p, o))
                last_p = p
                if tz.pos == pos0:
                    break
            if tz.peek() == "]":
                tz.take()
            return anon
        if ch == "<":
            tz.take()
            iri = tz.read_until(">")
            tz.take()
            return Term("iri", self._iri(iri))
        if ch == "?" or ch == "$":
            tz.take()
            name = re.match(r"[\w]+", tz.text[tz.pos:]).group(0)
            tz.pos += len(name)
            return Term("var", name)
        if ch == '"':
            if tz.peek(3) == '"""':
                tz.take(3)
                end = tz.text.find('"""', tz.pos)
                content = tz.text[tz.pos : end if end >= 0 else len(tz.text)]
                tz.pos = (end + 3) if end >= 0 else len(tz.text)
                content = _unescape(content)
            else:
                tz.take()
                # scan with escapes
                buf = []
                while tz.pos < len(tz.text):
                    c = tz.text[tz.pos]
                    if c == "\\":
                        buf.append(tz.text[tz.pos : tz.pos + 2])
                        tz.pos += 2
                        continue
                    if c == '"':
                        tz.pos += 1
                        break
                    buf.append(c)
                    tz.pos += 1
                content = _unescape("".join(buf))
            lang = dtype = None
            if tz.text[tz.pos : tz.pos + 1] == "@":
                tz.pos += 1
                m = re.match(r"[A-Za-z0-9\-]+", tz.text[tz.pos:])
                lang = m.group(0)
                tz.pos += len(lang)
            elif tz.text[tz.pos : tz.pos + 2] == "^^":
                tz.pos += 2
                if tz.text[tz.pos] == "<":
                    tz.pos += 1
                    dtype = tz.read_until(">")
                    tz.take()
                else:
                    pname = re.match(r"[\w-]*:[\w.\-]*", tz.text[tz.pos:]).group(0)
                    # Turtle PN_LOCAL may contain dots but not end with
                    # one — a trailing '.' is the statement terminator
                    pname = pname.rstrip(".")
                    tz.pos += len(pname)
                    p, _, l = pname.partition(":")
                    dtype = self.prefixes.get(p, p + ":") + l
            return Term("literal", content, lang, dtype)
        if ch == "_" and tz.peek(2) == "_:":
            tz.take(2)
            m = re.match(r"[\w.\-]+", tz.text[tz.pos:])
            # same PN_LOCAL rule: '_:a.' is bnode 'a' + terminator '.'
            name = m.group(0).rstrip(".")
            tz.pos += len(name)
            return Term("bnode", name)
        if tz.match_word("a"):
            return Term("iri", RDF_TYPE)
        # prefixed name or number
        tok = tz.read_until(" \t\r\n;,.{}()")
        if re.fullmatch(r"[+-]?\d+", tok) and re.match(
            r"\.\d", tz.text[tz.pos : tz.pos + 2]
        ):
            # read_until stops at '.', so reassemble 'digits . digits'
            tz.pos += 1
            tok = tok + "." + tz.read_until(" \t\r\n;,.{}()")
        if re.fullmatch(r"[+-]?\d+", tok):
            return Term("literal", tok, None, "http://www.w3.org/2001/XMLSchema#integer")
        if re.fullmatch(r"[+-]?\d*\.\d+", tok):
            return Term("literal", tok, None, "http://www.w3.org/2001/XMLSchema#decimal")
        p, _, l = tok.partition(":")
        return Term("iri", self.prefixes.get(p, p + ":") + l)

    def _parse_group(self, tz: _Tokenizer):
        patterns: list[tuple[Term, Term, Term]] = []
        optionals: list[list] = []
        filters: list[str] = []
        last_subj = last_pred = None
        while not tz.eof():
            if tz.peek() == "}":
                tz.take()
                break
            if tz.match_word("OPTIONAL"):
                assert tz.take() == "{"
                optionals.append(self._parse_group(tz))
                continue
            if tz.match_word("FILTER"):
                filters.append(self._read_filter(tz))
                continue
            if tz.peek() in ".;,":
                sep = tz.take()
                if sep == ".":
                    last_subj = last_pred = None
                continue
            pos_before = tz.pos
            if last_subj is None:
                s = self._parse_term(tz, patterns)
                if tz.peek() in ".}" or tz.eof():
                    # lone bnode-property-list statement "[ ... ] ."
                    if tz.peek() == ".":
                        tz.take()
                    continue
                p = self._parse_term(tz, patterns)
                o = self._parse_term(tz, patterns)
            elif last_pred is None:
                s = last_subj
                p = self._parse_term(tz, patterns)
                o = self._parse_term(tz, patterns)
            else:
                s, p = last_subj, last_pred
                o = self._parse_term(tz, patterns)
            if tz.pos == pos_before:  # no progress → bail (malformed)
                raise ValueError("ASK parse stalled")
            patterns.append((s, p, o))
            sep = tz.peek()
            if sep == ";":
                tz.take()
                last_subj, last_pred = s, None
            elif sep == ",":
                tz.take()
                last_subj, last_pred = s, p
            elif sep == ".":
                tz.take()
                last_subj = last_pred = None
            else:
                last_subj = last_pred = None
        return patterns, optionals, filters

    def _read_filter(self, tz: _Tokenizer) -> str:
        tz.skip_ws()
        if tz.peek() == "(":
            depth = 0
            start = tz.pos
            while tz.pos < len(tz.text):
                c = tz.text[tz.pos]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        tz.pos += 1
                        return tz.text[start : tz.pos]
                tz.pos += 1
            return tz.text[start:]
        # e.g. FILTER isBlank(?a)
        start = tz.pos
        while tz.pos < len(tz.text) and tz.text[tz.pos] not in "\n.}":
            tz.pos += 1
        return tz.text[start : tz.pos]

    # ------------------------------------------------------------ evaluation

    def ask(self, triples: list[Triple]) -> bool:
        facts = [
            (
                Term("bnode", t.subj[2:]) if t.subj.startswith("_:") else Term("iri", t.subj),
                Term("iri", t.pred),
                Term("bnode", t.obj[2:])
                if t.obj_kind == "bnode"
                else (
                    Term("iri", t.obj)
                    if t.obj_kind == "iri"
                    else Term("literal", t.obj, t.lang, t.dtype)
                ),
            )
            for t in triples
        ]
        by_pred: dict[str, list] = {}
        for fact in facts:
            by_pred.setdefault(fact[1].value, []).append(fact)
        budget = [500_000]  # fact visits across the whole evaluation
        try:
            for binding in self._solve(self.patterns, facts, {}, by_pred, budget):
                b = dict(binding)
                # OPTIONAL: extend bindings when possible
                for opt_patterns, _o, opt_filters in self.optionals:
                    for ob in self._solve(opt_patterns, facts, dict(b), by_pred, budget):
                        if all(self._eval_filter(f, ob) for f in opt_filters):
                            b = ob
                            break
                if all(self._eval_filter(f, b) for f in self.filters):
                    return True
        except _BudgetExceeded:
            return False
        return False

    def _term_matches(self, pat: Term, fact: Term, binding):
        if pat.kind == "var":
            bound = binding.get(pat.value)
            if bound is None:
                return [(pat.value, fact)]
            return [] if self._terms_equal(bound, fact) else None
        if pat.kind == "bnode":
            # query bnodes are non-distinguished variables (SPARQL
            # semantics): they match any RDF term
            key = "_:" + pat.value
            bound = binding.get(key)
            if bound is None:
                return [(key, fact)]
            return [] if self._terms_equal(bound, fact) else None
        return [] if self._terms_equal(pat, fact) else None

    @staticmethod
    def _terms_equal(a: Term, b: Term) -> bool:
        if a.kind != b.kind:
            return False
        if a.kind == "literal":
            da = a.dtype or ""
            db = b.dtype or ""
            # xsd:string-typed and plain literals compare equal (RDF 1.1
            # semantics; Sesame behaves the same for these suites)
            xs = "http://www.w3.org/2001/XMLSchema#string"
            if {da, db} == {xs, ""}:
                da = db = ""
            return a.value == b.value and (a.lang or "") == (b.lang or "") and da == db
        return a.value == b.value

    def _solve(self, patterns, facts, binding, by_pred=None, budget=None):
        if not patterns:
            yield binding
            return

        def bound_score(pat):
            s, p, o = pat
            sc = 0
            for t in (s, p, o):
                if t.kind == "var":
                    sc += 2 if t.value in binding else -1
                elif t.kind == "bnode":
                    sc += 2 if ("_:" + t.value) in binding else -1
                else:
                    sc += 2
            return sc

        best = max(range(len(patterns)), key=lambda i: bound_score(patterns[i]))
        s, p, o = patterns[best]
        rest = patterns[:best] + patterns[best + 1:]

        candidates = facts
        if by_pred is not None and p.kind == "iri":
            candidates = by_pred.get(p.value, [])

        for fs, fp, fo in candidates:
            if budget is not None:
                budget[0] -= 1
                if budget[0] <= 0:
                    raise _BudgetExceeded()
            b2 = dict(binding)
            ok = True
            for pat, fact in ((s, fs), (p, fp), (o, fo)):
                m = self._term_matches(pat, fact, b2)
                if m is None:
                    ok = False
                    break
                for k, v in m:
                    b2[k] = v
            if ok:
                yield from self._solve(rest, facts, b2, by_pred, budget)

    # filter expression evaluation ------------------------------------

    def _eval_filter(self, expr: str, binding) -> bool:
        try:
            return bool(self._eval_expr(expr.strip(), binding))
        except Exception:
            return False

    def _eval_expr(self, expr: str, binding):
        expr = expr.strip()
        while expr.startswith("(") and expr.endswith(")") and _balanced(expr[1:-1]):
            expr = expr[1:-1].strip()
        # split on top-level || then &&
        for op, fn in (("||", any), ("&&", all)):
            parts = _split_top(expr, op)
            if len(parts) > 1:
                return fn(self._eval_expr(p, binding) for p in parts)
        if expr.startswith("!"):
            return not self._eval_expr(expr[1:], binding)
        for op in ("!=", "="):
            parts = _split_top(expr, op)
            if len(parts) == 2:
                left = self._eval_value(parts[0], binding)
                right = self._eval_value(parts[1], binding)
                eq = left == right
                return (not eq) if op == "!=" else eq
        m = re.match(r"(?i)(isBlank|bound|isIRI|isURI|isLiteral)\s*\(\s*\?(\w+)\s*\)", expr)
        if m:
            fn, var = m.group(1).lower(), m.group(2)
            t = binding.get(var)
            if fn == "bound":
                return t is not None
            if t is None:
                return False
            if fn == "isblank":
                return t.kind == "bnode"
            if fn in ("isiri", "isuri"):
                return t.kind == "iri"
            return t.kind == "literal"
        raise ValueError(f"unsupported filter: {expr}")

    def _eval_value(self, expr: str, binding):
        expr = expr.strip()
        m = re.match(r"(?i)(lang|str|datatype)\s*\(\s*\?(\w+)\s*\)\Z", expr)
        if m:
            fn, var = m.group(1).lower(), m.group(2)
            t = binding.get(var)
            if t is None:
                raise ValueError("unbound")
            if fn == "lang":
                return t.lang or ""
            if fn == "str":
                return t.value
            return t.dtype or ""
        if expr.startswith('"'):
            mm = re.match(r'"((?:[^"\\]|\\.)*)"', expr)
            return _unescape(mm.group(1))
        if expr.startswith("<"):
            return expr[1:-1]
        if expr.startswith("?"):
            t = binding.get(expr[1:])
            if t is None:
                raise ValueError("unbound")
            return t.value
        m = re.fullmatch(r"([\w-]*):([\w.\-]*)", expr)
        if m and m.group(1) in self.prefixes:
            # prefixed name in value position (e.g. datatype(?v) = xsd:date)
            return self.prefixes[m.group(1)] + m.group(2)
        return expr


def _balanced(s: str) -> bool:
    depth = 0
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


def _split_top(expr: str, op: str) -> list[str]:
    parts = []
    depth = 0
    last = 0
    in_str = False
    i = 0
    while i < len(expr):
        c = expr[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and expr.startswith(op, i):
            # avoid splitting '!=' when looking for '='
            if op == "=" and i > 0 and expr[i - 1] in "!<>":
                i += 1
                continue
            parts.append(expr[last:i])
            i += len(op)
            last = i
            continue
        i += 1
    parts.append(expr[last:])
    return parts
