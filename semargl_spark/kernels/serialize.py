"""NTriples / NQuads serialization kernel.

Mirrors the reference's escaping rules (/root/reference/rdf/src/main/java/
org/semarglproject/rdf/NTriplesSerializer.java:29-227, NQuadsSerializer.
java:25-88): literal content escapes ``\\ \" \b \f \n \r \t`` and renders
non-ASCII as ``\\uXXXX`` / ``\\UXXXXXXXX``; IRIs escape the reference's
"escapable" control/delimiter set; blank-node labels pass through
unchanged (NTriplesSerializer.java:130-136).

These are pure string functions so they can run either inside a pandas
UDF or be mirrored by a JVM-side ``concat_ws`` projection for the common
ASCII-only fast path (see operators/serialize_ops.py).
"""

from __future__ import annotations

from .model import BNODE_PREFIX, Triple

# characters the reference escapes inside IRIs (NTriplesSerializer.java:38-62)
_IRI_ESCAPABLE = set('<>"{}|^`\\') | {chr(c) for c in range(0x21)}

_LITERAL_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def escape_literal(content: str) -> str:
    out: list[str] = []
    for ch in content:
        esc = _LITERAL_ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ord(ch) < 0x20 or ord(ch) > 0x7E:
            cp = ord(ch)
            out.append(f"\\u{cp:04X}" if cp <= 0xFFFF else f"\\U{cp:08X}")
        else:
            out.append(ch)
    return "".join(out)


def escape_iri(iri: str) -> str:
    out: list[str] = []
    for ch in iri:
        if ch in _IRI_ESCAPABLE:
            cp = ord(ch)
            out.append(f"\\u{cp:04X}" if cp <= 0xFFFF else f"\\U{cp:08X}")
        elif ord(ch) > 0x7E:
            cp = ord(ch)
            out.append(f"\\u{cp:04X}" if cp <= 0xFFFF else f"\\U{cp:08X}")
        else:
            out.append(ch)
    return "".join(out)


def render_term(value: str, kind: str, lang: str | None, dtype: str | None) -> str:
    if kind == "bnode" or value.startswith(BNODE_PREFIX) and kind != "literal":
        return value
    if kind == "iri":
        return f"<{escape_iri(value)}>"
    body = f'"{escape_literal(value)}"'
    if lang:
        return f"{body}@{lang}"
    if dtype:
        return f"{body}^^<{escape_iri(dtype)}>"
    return body


def render_ntriple(t: Triple) -> str:
    s = t.subj if t.subj.startswith(BNODE_PREFIX) else f"<{escape_iri(t.subj)}>"
    p = f"<{escape_iri(t.pred)}>"
    o = render_term(t.obj, t.obj_kind, t.lang, t.dtype)
    return f"{s} {p} {o} ."


def render_nquad(t: Triple) -> str:
    s = t.subj if t.subj.startswith(BNODE_PREFIX) else f"<{escape_iri(t.subj)}>"
    p = f"<{escape_iri(t.pred)}>"
    o = render_term(t.obj, t.obj_kind, t.lang, t.dtype)
    if t.graph:
        g = t.graph if t.graph.startswith(BNODE_PREFIX) else f"<{escape_iri(t.graph)}>"
        return f"{s} {p} {o} {g} ."
    return f"{s} {p} {o} ."
