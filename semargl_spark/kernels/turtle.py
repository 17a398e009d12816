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
* "shortenable" bnodes — labels carrying the generated-and-never-
  referenced ``sbl`` marker (RDF.java:26, stamped by the RDFa kernel's
  create_bnode mirroring DocumentContext.createBnode(boolean)) — inline
  as ``[...]`` via the same open/close stack discipline as the
  reference (openBnode/closeBnode/startTriple:149-236, including the
  namedBnodes guard); other bnode labels pass through.

Formatting stays in this kernel's compact style (objects grouped on one
line with ``, ``; single space between terms) rather than replicating
the reference's raw char stream (which double-spaces after IRI objects
and puts each ``,``-grouped object on its own line) — the structure,
grouping, and inlining semantics match, and output re-parses to an
isomorphic graph (property-tested).

The kernel is pure (list of statements → text); the Spark operator
groups per subject with ``collect_list`` over the stable turn ordering.
"""

from __future__ import annotations

from collections import deque

from .model import (
    BNODE_PREFIX,
    RDF_NS,
    RDF_TYPE,
    SHORTENABLE_BNODE_SUFFIX,
    Triple,
)
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


def _is_bnode(value: str, kind: str) -> bool:
    return kind == "bnode" or (kind != "literal" and value.startswith(BNODE_PREFIX))


def _header(base: str | None) -> str:
    h = f"@base <{escape_iri(base)}> .\n" if base else ""
    return h + f"@prefix rdf: <{RDF_NS}> .\n\n"


def serialize(triples: list[Triple], base: str | None = None) -> str:
    """Statements → Turtle document (grouped, header included,
    shortenable bnodes inlined as ``[...]``).

    State machine mirroring the reference's TurtleSerializer: the bnode
    stack opens on a shortenable object/subject bnode
    (openBnode:221-226), closes when a triple arrives whose subject is
    not the innermost open bnode (startTriple:159-163), and namedBnodes
    suppresses inlining for a bnode already written by label
    (addNonLiteral:73-77). The reference keeps its stack in a FIFO Queue
    (offer/poll), which only matters past nesting depth 1 — mirrored
    verbatim for parity."""
    return _header(base) + _serialize_body(triples, base)


def _serialize_body(triples: list[Triple], base: str | None = None) -> str:
    """The grouped statement text of :func:`serialize`, header-less —
    shared by the Turtle writer and the per-graph blocks of
    :func:`serialize_trig` (bnode/grouping state is per body: bnode
    scopes never cross graph blocks, matching the parser's per-block
    scoping in turtle_read)."""
    w: list[str] = []

    prev_subj: str | None = None
    prev_pred: str | None = None
    stack: deque[str] = deque()
    named: set[str] = set()

    def write_pred(pred: str) -> None:
        w.append("a " if pred == RDF_TYPE else _shorten(pred, base) + " ")

    def open_bnode(label: str) -> None:
        nonlocal prev_subj, prev_pred
        w.append("[ ")
        stack.append(label)
        prev_subj, prev_pred = label, None

    def close_bnode() -> None:
        nonlocal prev_subj, prev_pred
        w.append(" ]")
        stack.popleft()  # reference Queue.poll (FIFO) — see docstring
        prev_subj = stack[0] if stack else None
        prev_pred = None
        if prev_subj is None:
            w.append(" .\n")

    def start_triple(subj: str, pred: str) -> None:
        nonlocal prev_subj, prev_pred
        if subj == prev_subj:
            if pred == prev_pred:
                w.append(", ")
                return  # same predicate: object list continues
            if prev_pred is not None:
                w.append(" ;\n" + "    " * (len(stack) + 1))
            write_pred(pred)
        else:
            if stack:
                close_bnode()
                start_triple(subj, pred)
                return
            if prev_subj is not None:
                w.append(" .\n")
            if subj.startswith(BNODE_PREFIX):
                if subj.endswith(SHORTENABLE_BNODE_SUFFIX) and subj not in named:
                    open_bnode(subj)
                else:
                    w.append(subj + " ")
                    named.add(subj)
            else:
                w.append(_shorten(subj, base) + " ")
            write_pred(pred)
        prev_subj, prev_pred = subj, pred

    for t in triples:
        start_triple(t.subj, t.pred)
        if _is_bnode(t.obj, t.obj_kind):
            if (
                t.obj not in named
                and t.obj.endswith(SHORTENABLE_BNODE_SUFFIX)
            ):
                open_bnode(t.obj)
            else:
                w.append(t.obj)
        else:
            w.append(_term(t.obj, t.obj_kind, t.lang, t.dtype, base))

    while stack:
        close_bnode()
    if prev_pred is not None:
        w.append(" .\n")
    return "".join(w)


def serialize_trig(triples: list[Triple], base: str | None = None) -> str:
    """Statements → TriG document: the writer-side completion of the
    TriG reader (turtle_read.parse_trig) — default-graph statements
    first as bare Turtle, then one ``<graph> { ... }`` block per named
    graph in FIRST-APPEARANCE order (deterministic for a fixed
    statement sequence, the same stance as the streaming writer's
    subject grouping). Graph labels shorten like subjects; each block's
    body reuses the full Turtle grouping/inlining state machine with
    fresh per-block bnode state, so a document round-trips through
    parse_trig to an isomorphic dataset. (Reference parity n/a: the
    reference writes Turtle only, TurtleSerializer.java:32 — this is
    the target-side quad analogue.)"""
    default: list[Triple] = []
    order: list[str] = []
    groups: dict[str, list[Triple]] = {}
    for t in triples:
        if t.graph is None:
            default.append(t)
        else:
            if t.graph not in groups:
                groups[t.graph] = []
                order.append(t.graph)
            groups[t.graph].append(t)
    parts = [_header(base)]
    if default:
        parts.append(_serialize_body(default, base))
    for g in order:
        label = g if g.startswith(BNODE_PREFIX) else _shorten(g, base)
        parts.append(label + " {\n")
        parts.append(_serialize_body(groups[g], base))
        parts.append("}\n")
    return "".join(parts)
