"""Minimal test-side Turtle reader for round-trip property tests.

Covers exactly the subset the kernel serializer emits: @base/@prefix
directives, ``<iri>``, ``rdf:local``, ``a``, ``_:label`` bnodes,
``[ ... ]`` anonymous bnodes (arbitrary nesting), ``;`` predicate
grouping, ``,`` object lists, plain/lang/typed literals with NTriples
escapes, and ``\"\"\"`` long strings. Independent implementation (plain
recursive descent over a token stream) so serializer bugs cannot cancel
out — the reader is deliberately strict and raises on anything outside
the subset.
"""

from __future__ import annotations

import itertools
import re

from semargl_spark.kernels.model import RDF_NS, RDF_TYPE, Triple

_TOKEN = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<long>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
    | (?P<lit>\"(?:[^"\\\n]|\\.)*\")
    | (?P<iri><[^<>]*>)
    | (?P<bnode>_:[A-Za-z0-9_.\-]+)
    | (?P<directive>@prefix|@base)
    | (?P<lang>@[a-zA-Z][a-zA-Z0-9\-]*)
    | (?P<rdfq>rdf:[A-Za-z0-9_\-]*)
    | (?P<hat>\^\^)
    | (?P<punct>[\[\];,.])
    | (?P<a>a(?![A-Za-z0-9]))
    """,
    re.X,
)

_UNESC = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|.)")
_SIMPLE = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
           '"': '"', "\\": "\\"}


def _unescape(body: str) -> str:
    def repl(m):
        e = m.group(1)
        if e[0] in "uU":
            return chr(int(e[1:], 16))
        got = _SIMPLE.get(e)
        if got is None:
            raise ValueError(f"unknown escape \\{e}")
        return got

    return _UNESC.sub(repl, body)


def _tokenize(doc: str):
    pos = 0
    while pos < len(doc):
        m = _TOKEN.match(doc, pos)
        if m is None:
            raise ValueError(f"lex error at {pos}: {doc[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            yield kind, m.group()
    yield "eof", ""


class _Reader:
    def __init__(self, doc: str):
        self.toks = list(_tokenize(doc))
        self.i = 0
        self.fresh = (f"_:anon{n}" for n in itertools.count())
        self.triples: list[Triple] = []
        self.base: str | None = None

    def peek(self):
        return self.toks[self.i]

    def next(self, want: str | None = None, value: str | None = None):
        kind, text = self.toks[self.i]
        if want is not None and kind != want:
            raise ValueError(f"expected {want}, got {kind} {text!r}")
        if value is not None and text != value:
            raise ValueError(f"expected {value!r}, got {text!r}")
        self.i += 1
        return text

    # ---------------------------------------------------------- grammar

    def read(self) -> list[Triple]:
        while True:
            kind, text = self.peek()
            if kind == "eof":
                return self.triples
            if kind == "directive":
                self.directive()
            else:
                self.statement()

    def directive(self):
        which = self.next("directive")
        if which == "@prefix":
            name = self.next("rdfq")
            if name != "rdf:":
                raise ValueError(f"only rdf: prefix supported, got {name}")
        iri = self.next("iri")[1:-1]
        if which == "@base":
            self.base = iri
        elif iri != RDF_NS:
            raise ValueError(f"rdf: must bind {RDF_NS}")
        self.next("punct", ".")

    def statement(self):
        kind, text = self.peek()
        was_bracket = kind == "punct" and text == "["
        subj = self.subject()
        kind, text = self.peek()
        # blankNodePropertyList subject may end the statement directly
        if not (was_bracket and kind == "punct" and text == "."):
            self.predicate_object_list(subj)
        self.next("punct", ".")

    def subject(self) -> str:
        kind, text = self.peek()
        if kind == "iri":
            return self.resolve(self.next()[1:-1])
        if kind == "rdfq":
            return RDF_NS + self.next()[4:]
        if kind == "bnode":
            return self.next()
        if kind == "punct" and text == "[":
            return self.bracket()
        raise ValueError(f"bad subject {kind} {text!r}")

    def bracket(self) -> str:
        """'[' predicate_object_list? ']' → fresh bnode."""
        self.next("punct", "[")
        label = next(self.fresh)
        kind, text = self.peek()
        if not (kind == "punct" and text == "]"):
            self.predicate_object_list(label)
        self.next("punct", "]")
        return label

    def predicate_object_list(self, subj: str):
        while True:
            pred = self.predicate()
            self.object_list(subj, pred)
            kind, text = self.peek()
            if kind == "punct" and text == ";":
                self.next()
                continue
            return

    def predicate(self) -> str:
        kind, text = self.peek()
        if kind == "a":
            self.next()
            return RDF_TYPE
        if kind == "iri":
            return self.resolve(self.next()[1:-1])
        if kind == "rdfq":
            return RDF_NS + self.next()[4:]
        raise ValueError(f"bad predicate {kind} {text!r}")

    def object_list(self, subj: str, pred: str):
        while True:
            self.object(subj, pred)
            kind, text = self.peek()
            if kind == "punct" and text == ",":
                self.next()
                continue
            return

    def object(self, subj: str, pred: str):
        kind, text = self.peek()
        if kind == "iri":
            obj = self.resolve(self.next()[1:-1])
            self.triples.append(Triple(subj, pred, obj, "iri", None, None, None))
        elif kind == "rdfq":
            obj = RDF_NS + self.next()[4:]
            self.triples.append(Triple(subj, pred, obj, "iri", None, None, None))
        elif kind == "bnode":
            self.triples.append(
                Triple(subj, pred, self.next(), "bnode", None, None, None)
            )
        elif kind == "punct" and text == "[":
            label = self.bracket()
            self.triples.append(Triple(subj, pred, label, "bnode", None, None, None))
        elif kind in ("lit", "long"):
            raw = self.next()
            body = raw[3:-3] if kind == "long" else raw[1:-1]
            value = _unescape(body)
            nk, nt = self.peek()
            lang = dtype = None
            if nk == "lang":
                lang = self.next()[1:]
            elif nk == "hat":
                self.next()
                dk, _ = self.peek()
                if dk == "iri":
                    dtype = self.resolve(self.next()[1:-1])
                else:
                    dtype = RDF_NS + self.next("rdfq")[4:]
            self.triples.append(
                Triple(subj, pred, value, "literal", lang, dtype, None)
            )
        else:
            raise ValueError(f"bad object {kind} {text!r}")

    def resolve(self, iri: str) -> str:
        # the serializer only relativizes under @base by prefix-stripping
        if self.base and "://" not in iri and not iri.startswith("urn:"):
            return self.base + iri
        return iri


def read_turtle(doc: str) -> list[Triple]:
    return _Reader(doc).read()
