r"""Turtle serializer kernel.

Reimplements the observable output rules of the reference's streaming
Turtle writer (/root/reference/rdf/src/main/java/org/semarglproject/rdf/
TurtleSerializer.java:32-238):

* ``@base`` / ``@prefix rdf:`` header (:113-123);
* same-subject grouping with ``;`` and same-predicate grouping with
  ``,`` (startTriple:149-184);
* ``rdf:type`` rendered as ``a`` (:186-192);
* IRIs inside the rdf: namespace shortened to ``rdf:local`` and IRIs
  under the base shortened to relative form (:194-204);
* literals containing newlines use ``\"\"\"`` quoting (:212-219);
* blank-node labels pass through (``[...]`` inlining applies only to
  the reference's internal "shortenable" bnodes, which our statement
  model does not mark — labels keep graph isomorphism intact).

The kernel is pure (list of statements → text); the Spark operator
groups per subject with ``collect_list`` over the stable turn ordering.
"""

from __future__ import annotations

from .model import BNODE_PREFIX, RDF_NS, RDF_TYPE, Triple
from .serialize import escape_iri, escape_literal

_MULTILINE_CHARS = ("\n", "\r")


def _shorten(iri: str, base: str | None) -> str:
    if iri.startswith(RDF_NS):
        return "rdf:" + iri[len(RDF_NS):]
    if base and iri.startswith(base) and len(iri) > len(base):
        return f"<{escape_iri(iri[len(base):])}>"
    return f"<{escape_iri(iri)}>"


def _term(value: str, kind: str, lang, dtype, base) -> str:
    if kind == "bnode" or (kind != "literal" and value.startswith(BNODE_PREFIX)):
        return value
    if kind == "iri":
        return _shorten(value, base)
    if any(c in value for c in _MULTILINE_CHARS):
        # every quote escapes, exactly like the reference's addContent
        # (TurtleSerializer.java:212-219) — escaping only triple-quote
        # runs would leave a literal-final '"' adjacent to the closing
        # delimiter, which is invalid Turtle
        body = '"""' + value.replace("\\", "\\\\").replace('"', '\\"') + '"""'
    else:
        body = f'"{escape_literal(value)}"'
    if lang:
        return f"{body}@{lang}"
    if dtype:
        return f"{body}^^{_shorten(dtype, base)}"
    return body


def serialize(triples: list[Triple], base: str | None = None) -> str:
    """Statements → Turtle document (grouped, header included)."""
    out: list[str] = []
    if base:
        out.append(f"@base <{escape_iri(base)}> .")
    out.append(f"@prefix rdf: <{RDF_NS}> .")
    out.append("")

    prev_subj = None
    prev_pred = None
    line: list[str] = []

    def flush_line(terminator: str):
        if line:
            out.append("".join(line) + terminator)
            line.clear()

    for t in triples:
        subj = t.subj if t.subj.startswith(BNODE_PREFIX) else _shorten(t.subj, base)
        pred = "a" if t.pred == RDF_TYPE else _shorten(t.pred, base)
        obj = _term(t.obj, t.obj_kind, t.lang, t.dtype, base)
        if t.subj == prev_subj:
            if t.pred == prev_pred:
                line.append(f", {obj}")
            else:
                flush_line(" ;")
                line.append(f"    {pred} {obj}")
        else:
            flush_line(" .")
            line.append(f"{subj} {pred} {obj}")
        prev_subj, prev_pred = t.subj, t.pred
    flush_line(" .")
    return "\n".join(out) + "\n"
