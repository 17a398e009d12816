"""Shared statement model for all parser kernels.

The reference delivers statements through three sink callbacks
(addNonLiteral / addPlainLiteral / addTypedLiteral, see
/root/reference/core/src/main/java/org/semarglproject/sink/TripleSink.java:29-47)
plus a graph-term variant (QuadSink.java:31-51). We encode which callback
fired in an ``obj_kind`` discriminator so the representation is losslessly
invertible to the reference's event stream:

    (subj, pred, obj, obj_kind, lang, dtype, graph)

    obj_kind = 'iri'     → addNonLiteral with an IRI object
               'bnode'   → addNonLiteral with a ``_:`` label
               'literal' → addPlainLiteral (dtype is None) or
                           addTypedLiteral (dtype is the datatype IRI)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

BNODE_PREFIX = "_:"
# marker for auto-generated bnodes that are never referenced by name in
# the source, so a Turtle writer may inline them as [...] (reference:
# RDF.SHORTENABLE_BNODE_SUFFIX, core/.../vocab/RDF.java:26)
SHORTENABLE_BNODE_SUFFIX = "sbl"

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_XML_LITERAL = RDF_NS + "XMLLiteral"

XSD_NS = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD_NS + "string"
XSD_INTEGER = XSD_NS + "integer"
XSD_DOUBLE = XSD_NS + "double"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DATE = XSD_NS + "date"
XSD_DATE_TIME = XSD_NS + "dateTime"
XSD_TIME = XSD_NS + "time"
XSD_DURATION = XSD_NS + "duration"
XSD_G_YEAR = XSD_NS + "gYear"
XSD_G_YEAR_MONTH = XSD_NS + "gYearMonth"


class Triple(NamedTuple):
    subj: str
    pred: str
    obj: str
    obj_kind: str  # 'iri' | 'bnode' | 'literal'
    lang: Optional[str] = None
    dtype: Optional[str] = None
    graph: Optional[str] = None


def non_literal(subj: str, pred: str, obj: str, graph: str | None = None) -> Triple:
    kind = "bnode" if obj.startswith(BNODE_PREFIX) else "iri"
    return Triple(subj, pred, obj, kind, None, None, graph)


def plain_literal(
    subj: str, pred: str, content: str, lang: str | None, graph: str | None = None
) -> Triple:
    return Triple(subj, pred, content, "literal", lang, None, graph)


def typed_literal(
    subj: str, pred: str, content: str, dtype: str, graph: str | None = None
) -> Triple:
    return Triple(subj, pred, content, "literal", None, dtype, graph)


class ParseError(Exception):
    """Fatal parse error (when error recovery is disabled)."""


class BnodeAllocator:
    """Per-document blank-node labeler.

    The reference generates ``_:n<counter>`` labels from a per-document
    monotone counter and renames author-written labels through a
    per-document map so they never collide across documents
    (rdfa/.../DocumentContext.java:57-102, jsonld/.../DocumentContext.java:38-60).
    We do the same but bake global uniqueness into the label itself:
    ``_:b{doc_key}_n{counter}`` — deterministic per document, unique
    across the corpus, so distributed extraction needs no coordination.
    """

    def __init__(self, doc_key: str = "", name_keyed: bool = False):
        self._base = f"{BNODE_PREFIX}b{doc_key}_" if doc_key else f"{BNODE_PREFIX}"
        self._prefix = self._base + "n"
        self._next = 0
        self._renames: dict[str, str] = {}
        # name-keyed mode: author labels map to a pure function of their
        # NAME (not appearance order), so two chunks of one oversized
        # document parsed independently under the same doc_key produce
        # identical labels — the unification contract of chunked
        # conversation reassembly. The 'x' marker keeps the name-keyed
        # namespace disjoint from generated '_n<counter>' labels.
        self._name_keyed = name_keyed

    def fresh(self) -> str:
        label = f"{self._prefix}{self._next}"
        self._next += 1
        return label

    def rename(self, author_label: str) -> str:
        """Map an author-written ``_:name`` to a document-unique label."""
        if self._name_keyed:
            return f"{self._base}x{author_label[len(BNODE_PREFIX):]}"
        got = self._renames.get(author_label)
        if got is None:
            got = self.fresh()
            self._renames[author_label] = got
        return got
