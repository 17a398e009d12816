r"""Turtle parser kernel — the input-side complement of
kernels/turtle.py (the serializer).

The reference ships Turtle as an output format only
(/root/reference/rdf/src/main/java/org/semarglproject/rdf/TurtleSerializer.java:34-60);
round-tripping its own output therefore needs a parser the reference
never had. This one covers the W3C Turtle constructs the serializer
emits plus the common input-side surface:

* ``@prefix`` / ``@base`` and SPARQL-style ``PREFIX`` / ``BASE``
  directives, any number of prefixes, later bindings shadow earlier;
* IRIREF with ``\uXXXX``/``\UXXXXXXXX`` escapes, resolved against the
  current base (kernels/iri.py resolve_iri — same quirks as every other
  kernel);
* prefixed names (PNAME_LN / PNAME_NS) with ``\``-escaped local-part
  punctuation and ``%XX`` sequences passed through verbatim;
* ``a`` → rdf:type; ``;`` predicate lists; ``,`` object lists;
* ``_:label`` bnodes (relabeled through BnodeAllocator exactly like
  every other kernel), ``[]`` / ``[ ... ]`` anonymous bnodes,
  ``( ... )`` collections → rdf:first/rest/nil chains;
* literals: ``"…"``, ``'…'``, ``\"\"\"…\"\"\"``, ``'''…'''`` with
  NTriples escape handling, ``@lang``, ``^^dtype``; bare numeric
  shorthand (xsd:integer / xsd:decimal / xsd:double) and
  ``true`` / ``false`` (xsd:boolean) keep their LEXICAL form, as the
  Turtle spec requires;
* ``#`` comments outside quoted content;
* error recovery (E10): a malformed statement records an error and
  skips to the next top-level ``.`` — never a task failure.

Deliberately a fresh recursive-descent implementation, structurally
unrelated to tests/turtle_reader.py (the strict test-side comparator):
the two stay independent so round-trip property tests can't have a
shared bug cancel out.
"""

from __future__ import annotations

import re

from .iri import resolve_iri
from .model import (
    RDF_FIRST,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    RDF_TYPE,
    XSD_NS,
    BnodeAllocator,
    ParseError,
    Triple,
)
from .ntriples import unescape

_XSD_INTEGER = XSD_NS + "integer"
_XSD_DECIMAL = XSD_NS + "decimal"
_XSD_DOUBLE = XSD_NS + "double"
_XSD_BOOLEAN = XSD_NS + "boolean"

_TOKEN = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<long2>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
    | (?P<long1>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<lit2>\"(?:[^"\\\n]|\\.)*\")
    | (?P<lit1>'(?:[^'\\\n]|\\.)*')
    | (?P<iri><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<bnode>_:[A-Za-z0-9_][A-Za-z0-9_.\-]*)
    | (?P<dir>@prefix\b|@base\b)
    | (?P<lang>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<double>[+-]?(?:\d+\.\d*|\.?\d+)[eE][+-]?\d+)
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+(?![\w.]))
    | (?P<hat>\^\^)
    | (?P<punct>[\[\](){};,.])
    | (?P<pname>(?:[A-Za-z_][\w.\-]*)?:(?:[\w:%\-]|\\.|\.)*)
    | (?P<word>[A-Za-z][\w\-]*)
    """,
    re.X,
)


def _tokenize(doc: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    n = len(doc)
    while pos < n:
        m = _TOKEN.match(doc, pos)
        if m is None:
            raise ParseError(f"lex error at offset {pos}: {doc[pos:pos + 20]!r}")
        kind = m.lastgroup
        text = m.group()
        pos = m.end()
        if kind == "pname":
            # a trailing '.' run belongs to the sentence, not the local
            # name (Turtle PN_LOCAL may contain but not end with '.')
            while text.endswith("."):
                text = text[:-1]
                pos -= 1
        if kind != "ws":
            toks.append((kind, text))
    toks.append(("eof", ""))
    return toks


class _Parser:
    def __init__(self, text: str, base_uri: str, bnodes: BnodeAllocator,
                 trig: bool = False):
        self.toks = _tokenize(text)
        self.i = 0
        self.base = base_uri
        self.prefixes: dict[str, str] = {}
        self.bnodes = bnodes
        self.out: list[Triple] = []
        self.errors: list[str] = []
        self.trig = trig
        self.graph: str | None = None  # TriG: label of the open block

    # ------------------------------------------------------------ plumbing

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        if t[0] != "eof":  # eof is sticky: recovery paths that consume
            self.i += 1    # it must not run the cursor off the list
        return t

    def expect_punct(self, ch: str) -> None:
        kind, text = self.take()
        if kind != "punct" or text != ch:
            raise ParseError(f"expected {ch!r}, got {text!r}")

    def _skip_statement(self) -> None:
        """Error recovery: consume tokens to the next top-level '.'."""
        depth = 0
        while True:
            kind, text = self.take()
            if kind == "eof":
                return
            if kind == "punct":
                if text in "[({":
                    depth += 1
                elif text in "])}" and depth > 0:
                    depth -= 1
                elif text == "." and depth == 0:
                    return

    def _skip_in_graph(self) -> None:
        """Error recovery inside a TriG graph block: consume to the next
        '.' at depth 0, or stop BEFORE the block's closing '}' (which
        belongs to wrapped_graph) — never past the block."""
        depth = 0
        while True:
            kind, text = self.peek()
            if kind == "eof":
                return
            if kind == "punct" and text == "}" and depth == 0:
                return
            self.take()
            if kind == "punct":
                if text in "[({":
                    depth += 1
                elif text in "])}" and depth > 0:
                    depth -= 1
                elif text == "." and depth == 0:
                    return

    # ------------------------------------------------------------- grammar

    def run(self) -> None:
        while True:
            kind, text = self.peek()
            if kind == "eof":
                return
            start = self.i
            try:
                if kind == "dir" or (
                    kind == "word" and text.lower() in ("prefix", "base")
                ):
                    self.directive()
                elif self.trig:
                    self.block()
                else:
                    self.statement()
            except ParseError as exc:
                self.errors.append(str(exc))
                if self.i == start:
                    self.i += 1  # guarantee progress
                self._skip_statement()

    def directive(self) -> None:
        kind, text = self.take()
        sparql_style = kind == "word"
        which = text.lower().lstrip("@")
        if which == "prefix":
            k, pn = self.take()
            if k != "pname" or not pn.endswith(":"):
                raise ParseError(f"bad prefix name {pn!r}")
            k, iri = self.take()
            if k != "iri":
                raise ParseError(f"bad prefix IRI {iri!r}")
            self.prefixes[pn[:-1]] = self._iri(iri)
        else:
            k, iri = self.take()
            if k != "iri":
                raise ParseError(f"bad base IRI {iri!r}")
            self.base = self._iri(iri)
        if not sparql_style:
            self.expect_punct(".")

    # --------------------------------------------------------- TriG blocks

    def _tok_at(self, off: int) -> tuple[str, str]:
        return self.toks[min(self.i + off, len(self.toks) - 1)]

    def block(self) -> None:
        """TriG top level: GRAPH label {..} | label {..} | {..} | triples.

        Graph labels are single-token IRIs / prefixed names / bnodes (or
        the anonymous '[]'), so one/two-token lookahead for the opening
        '{' is enough to tell a labeled block from a plain statement."""
        kind, text = self.peek()
        if kind == "word" and text.lower() == "graph":
            self.take()
            self.wrapped_graph(self.graph_label())
            return
        if kind == "punct" and text == "{":
            self.wrapped_graph(None)
            return
        if kind in ("iri", "pname", "bnode") and self._tok_at(1) == ("punct", "{"):
            self.wrapped_graph(self.graph_label())
            return
        if (
            kind == "punct" and text == "["
            and self._tok_at(1) == ("punct", "]")
            and self._tok_at(2) == ("punct", "{")
        ):
            self.wrapped_graph(self.graph_label())
            return
        self.statement()

    def graph_label(self) -> str:
        kind, text = self.take()
        if kind == "iri":
            return self._resolve(self._iri(text))
        if kind == "pname":
            return self._pname(text)
        if kind == "bnode":
            return self.bnodes.rename(text)
        if kind == "punct" and text == "[":
            self.expect_punct("]")
            return self.bnodes.fresh()
        raise ParseError(f"bad graph label {text!r}")

    def wrapped_graph(self, label: str | None) -> None:
        """'{' triples ('.' triples?)* '}' with the current graph set to
        ``label`` (None = default graph); per-statement error recovery
        stays INSIDE the block so one bad statement never swallows the
        closing '}' or leaks the graph label past it."""
        self.expect_punct("{")
        self.graph = label
        try:
            while True:
                kind, text = self.peek()
                if kind == "punct" and text == "}":
                    self.take()
                    return
                if kind == "eof":
                    raise ParseError("unterminated graph block")
                start = self.i
                try:
                    self.graph_statement()
                except ParseError as exc:
                    self.errors.append(str(exc))
                    if self.i == start:
                        self.i += 1  # guarantee progress
                    self._skip_in_graph()
        finally:
            self.graph = None

    def graph_statement(self) -> None:
        """A triples statement inside a graph block: same as statement()
        but the trailing '.' is optional immediately before '}'."""
        kind, text = self.peek()
        if kind == "punct" and text == "[":
            subj = self.bnode_property_list()
            kind, text = self.peek()
            if kind == "punct" and text in ".}":
                if text == ".":
                    self.take()
                return  # bare blankNodePropertyList statement
        else:
            subj = self.subject()
        self.predicate_object_list(subj)
        kind, text = self.peek()
        if kind == "punct" and text == ".":
            self.take()
            return
        if kind == "punct" and text == "}":
            return
        raise ParseError(f"expected '.' or '}}' in graph block, got {text!r}")

    def statement(self) -> None:
        kind, text = self.peek()
        if kind == "punct" and text == "[":
            subj = self.bnode_property_list()
            kind, text = self.peek()
            if kind == "punct" and text == ".":
                self.take()  # bare blankNodePropertyList statement
                return
        else:
            subj = self.subject()
        self.predicate_object_list(subj)
        self.expect_punct(".")

    def subject(self) -> str:
        kind, text = self.take()
        if kind == "iri":
            return self._resolve(self._iri(text))
        if kind == "pname":
            return self._pname(text)
        if kind == "bnode":
            return self.bnodes.rename(text)
        if kind == "punct" and text == "(":
            return self.collection()
        raise ParseError(f"bad subject {text!r}")

    def predicate(self) -> str:
        kind, text = self.take()
        if kind == "word" and text == "a":
            return RDF_TYPE
        if kind == "iri":
            return self._resolve(self._iri(text))
        if kind == "pname":
            return self._pname(text)
        raise ParseError(f"bad predicate {text!r}")

    def predicate_object_list(self, subj: str) -> None:
        while True:
            pred = self.predicate()
            while True:
                self.object(subj, pred)
                kind, text = self.peek()
                if kind == "punct" and text == ",":
                    self.take()
                    continue
                break
            kind, text = self.peek()
            if kind == "punct" and text == ";":
                self.take()
                # a dangling ';' before '.' / ']' is legal Turtle
                kind, text = self.peek()
                if kind == "punct" and text in ".]":
                    return
                continue
            return

    def object(self, subj: str, pred: str) -> None:
        kind, text = self.peek()
        if kind == "punct" and text == "[":
            self.emit(subj, pred, self.bnode_property_list(), "bnode")
            return
        if kind == "punct" and text == "(":
            self.take()
            obj = self.collection()
            self.emit(subj, pred, obj, "iri" if obj == RDF_NIL else "bnode")
            return
        kind, text = self.take()
        if kind == "iri":
            self.emit(subj, pred, self._resolve(self._iri(text)), "iri")
        elif kind == "pname":
            self.emit(subj, pred, self._pname(text), "iri")
        elif kind == "bnode":
            self.emit(subj, pred, self.bnodes.rename(text), "bnode")
        elif kind in ("lit2", "lit1", "long2", "long1"):
            body = text[3:-3] if kind.startswith("long") else text[1:-1]
            value = unescape(body)
            lang = dtype = None
            nk, nt = self.peek()
            if nk == "lang":
                lang = self.take()[1][1:]
            elif nk == "hat":
                self.take()
                dk, dt = self.take()
                if dk == "iri":
                    dtype = self._resolve(self._iri(dt))
                elif dk == "pname":
                    dtype = self._pname(dt)
                else:
                    raise ParseError(f"bad datatype {dt!r}")
            self.out.append(Triple(subj, pred, value, "literal", lang, dtype, self.graph))
        elif kind == "integer":
            self.out.append(Triple(subj, pred, text, "literal", None, _XSD_INTEGER, self.graph))
        elif kind == "decimal":
            self.out.append(Triple(subj, pred, text, "literal", None, _XSD_DECIMAL, self.graph))
        elif kind == "double":
            self.out.append(Triple(subj, pred, text, "literal", None, _XSD_DOUBLE, self.graph))
        elif kind == "word" and text in ("true", "false"):
            self.out.append(Triple(subj, pred, text, "literal", None, _XSD_BOOLEAN, self.graph))
        else:
            raise ParseError(f"bad object {text!r}")

    def bnode_property_list(self) -> str:
        """'[' predicateObjectList? ']' → fresh bnode label."""
        self.expect_punct("[")
        label = self.bnodes.fresh()
        kind, text = self.peek()
        if not (kind == "punct" and text == "]"):
            self.predicate_object_list(label)
        self.expect_punct("]")
        return label

    def collection(self) -> str:
        """object* ')' → rdf:first/rest chain ('(' already consumed);
        an empty collection is the rdf:nil IRI."""
        items_head: str | None = None
        prev: str | None = None
        while True:
            kind, text = self.peek()
            if kind == "punct" and text == ")":
                self.take()
                break
            if kind == "eof":
                raise ParseError("unterminated collection")
            node = self.bnodes.fresh()
            if prev is None:
                items_head = node
            else:
                self.out.append(Triple(prev, RDF_REST, node, "bnode", None, None, self.graph))
            self.object(node, RDF_FIRST)
            prev = node
        if prev is None:
            return RDF_NIL
        self.out.append(Triple(prev, RDF_REST, RDF_NIL, "iri", None, None, self.graph))
        return items_head  # type: ignore[return-value]

    # ---------------------------------------------------------------- terms

    @staticmethod
    def _iri(tok: str) -> str:
        return unescape(tok[1:-1])

    def _resolve(self, iri: str) -> str:
        try:
            got = resolve_iri(self.base, iri)
        except Exception as exc:  # MalformedIriError must become a
            raise ParseError(str(exc)) from exc  # recoverable parse error
        if got is None:
            raise ParseError(f"unresolvable IRI {iri!r} against base {self.base!r}")
        return got

    def _pname(self, tok: str) -> str:
        prefix, _, local = tok.partition(":")
        ns = self.prefixes.get(prefix)
        if ns is None:
            if prefix == "rdf":  # serializer default, always bound
                ns = RDF_NS
            else:
                raise ParseError(f"undefined prefix {prefix!r}:")
        # PN_LOCAL \-escapes drop the backslash; %XX stays verbatim
        local = re.sub(r"\\(.)", r"\1", local)
        return ns + local

    def emit(self, subj: str, pred: str, obj: str, kind: str) -> None:
        self.out.append(Triple(subj, pred, obj, kind, None, None, self.graph))


def parse(
    text: str, *, base_uri: str = "", doc_key: str = "", recover: bool = True
) -> tuple[list[Triple], list[str]]:
    """Parse a Turtle document → ``(triples, errors)``.

    With ``recover=False`` the first error raises ParseError, matching
    the ENABLE_ERROR_RECOVERY contract every other kernel follows
    (StreamProcessor.java:47-48).
    """
    return _parse(text, base_uri, doc_key, recover, trig=False)


def parse_trig(
    text: str, *, base_uri: str = "", doc_key: str = "", recover: bool = True
) -> tuple[list[Triple], list[str]]:
    """Parse a TriG document → ``(quads, errors)``: the full Turtle
    surface above plus TriG 1.1 graph blocks — ``GRAPH <label> {...}``,
    the labeled shorthand ``<label> {...}`` (label = IRI, prefixed name,
    ``_:b`` or anonymous ``[]``), ``{...}`` for the wrapped default
    graph, and bare top-level triples (default graph, ``graph`` None).
    The trailing '.' inside a block is optional before '}', per the
    grammar. Error recovery is block-scoped: a malformed statement
    inside a graph never consumes the closing '}' (E10 contract).

    Like the Turtle reader this is target-side surface the reference
    never had (it ships no TriG support); the quads align with
    kernels/ntriples.py parse_nquads so the NQuads serializer and the
    named-graph query surface consume both interchangeably."""
    return _parse(text, base_uri, doc_key, recover, trig=True)


def _parse(
    text: str, base_uri: str, doc_key: str, recover: bool, trig: bool
) -> tuple[list[Triple], list[str]]:
    bnodes = BnodeAllocator(doc_key)
    try:
        p = _Parser(text, base_uri, bnodes, trig=trig)
    except ParseError as exc:
        if not recover:
            raise
        return [], [str(exc)]
    p.run()
    if p.errors and not recover:
        raise ParseError(p.errors[0])
    return p.out, p.errors
