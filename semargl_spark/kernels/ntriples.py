r"""NTriples / NQuads parser kernel.

Pure-Python reimplementation of the semantics of the reference's
streaming FSM parsers (/root/reference/rdf/src/main/java/org/
semarglproject/rdf/NTriplesParser.java:34-395 and NQuadsParser.java:34-404):

* tokens: ``<iri>``, ``_:bnode`` (ends at whitespace or ``.``),
  ``"literal"`` with optional ``@lang`` or ``^^<datatype>``, ``#`` comments
  to end of line, ``.`` sentence terminator;
* escape sequences ``\\ \' \" \b \f \n \r \t \uXXXX \UXXXXXXXX`` are
  unescaped in IRIs and literal bodies (NTriplesParser.java:335-393);
  unknown escapes drop the backslash, as the reference's default case does;
* statements assemble positionally S → P → O; NTriples emits at the third
  term (NTriplesParser.java:243-255), NQuads commits at the sentence ``.``
  because an optional 4th non-literal term is the graph label
  (NQuadsParser.java:249-286);
* error recovery: on a malformed sentence the parser records an error,
  drops the partial statement, and skips ahead to the next ``.``
  (NTriplesParser.java:92-103,125-129) — it never aborts the stream.

Unlike the reference we see the whole document per call (one transcript
turn), so no cross-buffer token reassembly is needed
(NTriplesParser.java:295-309 has no Spark analogue).
"""

from __future__ import annotations

import re

from .model import BnodeAllocator, ParseError, Triple

_WS = " \t\r\n"
_IRI_RE = re.compile(r"<([^>]*)>")
_LITERAL_RE = re.compile(r'"((?:[^"\\]|\\.)*)"', re.DOTALL)
_LANG_RE = re.compile(r"@([A-Za-z][A-Za-z0-9\-]*)")
_DTYPE_RE = re.compile(r"\^\^<([^>]*)>")
_BNODE_RE = re.compile(r"_:?[^ \t\r\n.]*")

_UNESCAPE_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", re.DOTALL)

_SIMPLE_ESCAPES = {
    "\\": "\\",
    "'": "'",
    '"': '"',
    "b": "\b",
    "f": "\f",
    "n": "\n",
    "r": "\r",
    "t": "\t",
}


def unescape(value: str) -> str:
    """NTriples unescaping (NTriplesParser.java:335-393)."""

    def repl(m: re.Match) -> str:
        body = m.group(1)
        if body[0] in "uU" and len(body) > 1:
            return chr(int(body[1:], 16))
        return _SIMPLE_ESCAPES.get(body, body)

    if "\\" not in value:
        return value
    return _UNESCAPE_RE.sub(repl, value)


def _scan(
    text: str,
    *,
    quads: bool,
    doc_key: str,
    recover: bool,
    name_keyed: bool = False,
) -> tuple[list[Triple], list[str]]:
    bnodes = BnodeAllocator(doc_key, name_keyed=name_keyed)
    triples: list[Triple] = []
    errors: list[str] = []
    n = len(text)
    pos = 0
    # accumulated terms of the current sentence: (value, kind, lang, dtype)
    terms: list[tuple[str, str, str | None, str | None]] = []
    # NTriples mode: statement already emitted, awaiting the closing '.'
    waiting_for_end = False
    max_terms = 4 if quads else 3

    def error(msg: str) -> int:
        """Record error; return scan position just past the next '.'."""
        errors.append(msg)
        if not recover:
            raise ParseError(msg)
        terms.clear()
        nxt = text.find(".", pos)
        return (n if nxt < 0 else nxt) + 1

    def commit() -> bool:
        """Validate and emit the accumulated sentence. True on success."""
        s_val, s_kind = terms[0][0], terms[0][1]
        p_kind = terms[1][1]
        o_val, o_kind, o_lang, o_dtype = terms[2]
        # the reference assigns S/P positionally without kind checks
        # (onNonLiteral, NTriplesParser.java:243-255) — bnode predicates
        # pass through; only literals are rejected in S/P position
        if s_kind == "literal" or p_kind == "literal":
            return False
        graph = None
        if len(terms) == 4:
            g_val, g_kind = terms[3][0], terms[3][1]
            if g_kind == "literal":
                return False
            graph = g_val
        triples.append(Triple(s_val, terms[1][0], o_val, o_kind, o_lang, o_dtype, graph))
        terms.clear()
        return True

    while pos < n:
        ch = text[pos]
        if ch in _WS:
            pos += 1
            continue
        if ch == "#":
            nl = n
            for stop in ("\n", "\r"):
                i = text.find(stop, pos)
                if i != -1:
                    nl = min(nl, i)
            pos = nl
            continue
        if ch == ".":
            if waiting_for_end:
                waiting_for_end = False
                pos += 1
            elif quads and len(terms) >= 3:
                if commit():
                    pos += 1
                else:
                    pos = error("Malformed statement")
            else:
                pos = error("Unexpected end of sentence")
            continue
        if waiting_for_end or len(terms) >= max_terms:
            pos = error("End of sentence expected")
            waiting_for_end = False
            continue

        if ch == "<":
            m = _IRI_RE.match(text, pos)
            if not m:
                pos = error("Unterminated IRI")
                continue
            terms.append((unescape(m.group(1)), "iri", None, None))
            pos = m.end()
        elif ch == "_":
            m = _BNODE_RE.match(text, pos)
            terms.append((bnodes.rename(m.group(0)), "bnode", None, None))
            pos = m.end()
        elif ch == '"':
            m = _LITERAL_RE.match(text, pos)
            if not m:
                pos = error("Unterminated literal")
                continue
            content = unescape(m.group(1))
            pos = m.end()
            lang = dtype = None
            if pos < n and text[pos] == "@":
                lm = _LANG_RE.match(text, pos)
                if not lm:
                    pos = error("Malformed language tag")
                    continue
                lang = lm.group(1)
                pos = lm.end()
            elif pos < n and text[pos] == "^":
                dm = _DTYPE_RE.match(text, pos)
                if not dm:
                    pos = error("Literal type can not be parsed")
                    continue
                dtype = unescape(dm.group(1))
                if dtype.startswith("_:"):
                    # bnode datatype IRIs (nonstandard, used by the
                    # json-ld-org goldens) share the document bnode scope
                    dtype = bnodes.rename(dtype)
                pos = dm.end()
            terms.append((content, "literal", lang, dtype))
        else:
            pos = error(f"Unexpected character '{ch}'")
            continue

        # NTriples emits as soon as the object arrives
        # (NTriplesParser.java:243-255); the '.' is then mandatory.
        if not quads and len(terms) == 3:
            if commit():
                waiting_for_end = True
            else:
                pos = error("Malformed statement")

    if terms or waiting_for_end:
        errors.append("Unexpected end of stream")
        if not recover:
            raise ParseError("Unexpected end of stream")
    return triples, errors


def parse(
    text: str, *, doc_key: str = "", recover: bool = True, name_keyed: bool = False
) -> tuple[list[Triple], list[str]]:
    """Parse an NTriples document. Returns ``(triples, errors)``.

    With ``recover=False`` the first error raises ParseError
    (reference: ENABLE_ERROR_RECOVERY disabled, StreamProcessor.java:47-48).
    ``name_keyed`` switches bnode relabeling from appearance-order
    counters to a pure function of the author name, so independently
    parsed chunks of one document unify (see BnodeAllocator).
    """
    return _scan(
        text, quads=False, doc_key=doc_key, recover=recover, name_keyed=name_keyed
    )


def parse_nquads(
    text: str, *, doc_key: str = "", recover: bool = True, name_keyed: bool = False
) -> tuple[list[Triple], list[str]]:
    """Parse an NQuads document; 4th non-literal term = graph label."""
    return _scan(
        text, quads=True, doc_key=doc_key, recover=recover, name_keyed=name_keyed
    )
