"""RDF/XML parser kernel.

Pure-Python SAX implementation of the reference's streaming RDF/XML
mode machine (/root/reference/rdf/src/main/java/org/semarglproject/rdf/
RdfXmlParser.java:42-728). Semantics replicated:

* node elements: subject from rdf:about (base-resolved) / rdf:ID
  (base-concatenated NCName, duplicate detection, RdfXmlParser.java:528-539)
  / rdf:nodeID (bnode) / fresh bnode; typed node elements emit rdf:type
  (RdfXmlParser.java:182-188); property attributes on node elements emit
  plain literals (processResourceAttrs, :272-290);
* property elements: rdf:resource / rdf:nodeID objects, rdf:datatype
  typed literals, xml:lang plain literals from captured text;
  rdf:li → rdf:_1, rdf:_2, ... per-element counters (:211-214);
  property attributes queue *pending* literal triples attached to a
  fresh bnode only if the element proves empty (:234-249,377-386);
* parseType="Literal" captures raw XML as an rdf:XMLLiteral (:348-351,
  453-456), "Resource" creates a nested bnode scope (:352-358),
  "Collection" builds rdf:first/rest/nil chains (:359-367,418-439);
* reification via rdf:ID on a property element emits the 4 reification
  triples (:488-516);
* xml:lang / xml:base are scoped via stacks (:312-332); xml:base gets
  its fragment replaced by ``#`` like the reference;
* error recovery pushes an ERROR_RECOVERY mode and skips the subtree
  (:119-129) — errors are reported, the stream continues.

Blank nodes use the document-scoped allocator (model.BnodeAllocator)
instead of the reference's ``_:n<counter>``/``_:n<hashCode>`` labels —
same per-document determinism, globally unique.
"""

from __future__ import annotations

from xml.sax.handler import ContentHandler

from .iri import MalformedIriError, is_absolute_iri, is_iri, resolve_iri
from .model import (
    RDF_FIRST,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    RDF_TYPE,
    RDF_XML_LITERAL,
    BnodeAllocator,
    Triple,
    non_literal,
    plain_literal,
    typed_literal,
)
from .xmlutil import XML_NS, is_valid_ncname, serialize_open_tag

RDF_RDF = RDF_NS + "RDF"
RDF_DESCRIPTION = RDF_NS + "Description"
RDF_LI = RDF_NS + "li"
RDF_ABOUT = RDF_NS + "about"
RDF_ID = RDF_NS + "ID"
RDF_NODEID = RDF_NS + "nodeID"
RDF_RESOURCE = RDF_NS + "resource"
RDF_DATATYPE = RDF_NS + "datatype"
RDF_PARSE_TYPE = RDF_NS + "parseType"
RDF_ABOUT_EACH = RDF_NS + "aboutEach"
RDF_ABOUT_EACH_PREFIX = RDF_NS + "aboutEachPrefix"
RDF_BAG_ID = RDF_NS + "bagID"
RDF_STATEMENT = RDF_NS + "Statement"
RDF_SUBJECT = RDF_NS + "subject"
RDF_PREDICATE = RDF_NS + "predicate"
RDF_OBJECT = RDF_NS + "object"

_FORBIDDEN_NODE_IRIS = {
    RDF_PARSE_TYPE, RDF_ABOUT_EACH, RDF_DATATYPE, RDF_BAG_ID, RDF_ABOUT,
    RDF_RESOURCE, RDF_NODEID, RDF_ID, RDF_ABOUT_EACH_PREFIX,
}

# modes
INSIDE_OF_PROPERTY = 1
INSIDE_OF_RESOURCE = 2
PARSE_TYPE_LITERAL = 3
PARSE_TYPE_COLLECTION = 4
PARSE_TYPE_RESOURCE = 5
ERROR_RECOVERY = 6


class _Handler(ContentHandler):
    def __init__(self, base_uri: str, doc_key: str):
        super().__init__()
        self.triples: list[Triple] = []
        self.errors: list[str] = []
        self.bnodes = BnodeAllocator(doc_key)

        base = base_uri or ""
        # the reference appends '#' when the base ends with a letter
        # (RdfXmlParser.setBaseUri:666-672)
        if base and base[-1].isalpha():
            base += "#"
        self.mode = INSIDE_OF_PROPERTY
        self.mode_stack: list[int] = []
        self.lang_stack: list[str | None] = [None]
        self.base_stack: list[str] = [base]
        self.subj_stack: list[str] = []
        self.li_index_stack: list[int] = []
        self.ns_mappings: dict[str, str] = {}
        self.processed_ids: set[str] = set()

        self.subj: str | None = None
        self.seq_tail: str | None = None
        self.pred: str | None = None
        self.datatype: str | None = None
        self.reify: str | None = None
        self.capture_literal = False
        self.parse_depth = 0
        self.root_seen = False
        self.buf: list[str] = []
        # pending property-attribute triples: (prop_res, attr_iri, value)
        self.pending: list[tuple[str | None, str, str]] = []
        # expat reports no qnames; rebuild them from prefix-mapping events.
        # ns_prefixes (uri → prefix stack) answers "what prefix renders
        # this uri"; prefix_scopes (prefix → uri stack) owns the scope
        # bookkeeping so shadowed prefixes (outer p→u1, inner p→u2)
        # unwind innermost-first
        self.ns_prefixes: dict[str, list[str]] = {}
        self.prefix_scopes: dict[str, list[str]] = {}

    def _qname(self, ns_uri: str | None, lname: str) -> str:
        if not ns_uri:
            return lname
        stack = self.ns_prefixes.get(ns_uri)
        if stack and stack[-1]:
            return f"{stack[-1]}:{lname}"
        return lname

    # -------------------------------------------------------------- errors

    def _error(self, msg: str) -> None:
        self.errors.append(msg)
        self.mode_stack.append(self.mode)
        self.mode = ERROR_RECOVERY

    # -------------------------------------------------------------- emit

    def _emit_non_literal(self, subj: str, pred: str, obj: str) -> None:
        self.triples.append(non_literal(subj, pred, obj))
        if self.reify is not None:
            r = self.reify
            self.reify = None
            self.triples.append(non_literal(r, RDF_TYPE, RDF_STATEMENT))
            self.triples.append(non_literal(r, RDF_SUBJECT, subj))
            self.triples.append(non_literal(r, RDF_PREDICATE, pred))
            self.triples.append(non_literal(r, RDF_OBJECT, obj))

    def _emit_literal(self, subj: str, pred: str, value: str,
                      lang_or_dt: str | None, typed: bool) -> None:
        if typed:
            self.triples.append(typed_literal(subj, pred, value, lang_or_dt))
        else:
            self.triples.append(plain_literal(subj, pred, value, lang_or_dt))
        if self.reify is not None:
            r = self.reify
            self.reify = None
            self.triples.append(non_literal(r, RDF_TYPE, RDF_STATEMENT))
            self.triples.append(non_literal(r, RDF_SUBJECT, subj))
            self.triples.append(non_literal(r, RDF_PREDICATE, pred))
            if typed:
                self.triples.append(typed_literal(r, RDF_OBJECT, value, lang_or_dt))
            else:
                self.triples.append(plain_literal(r, RDF_OBJECT, value, lang_or_dt))

    # -------------------------------------------------------------- helpers

    def _resolve(self, base: str, iri: str) -> str | None:
        try:
            return resolve_iri(base, iri)
        except MalformedIriError as e:
            self._error(str(e))
            return None

    def _resolve_no_resolve(self, base: str, iri: str) -> str | None:
        """rdf:ID-style resolution: absolute passes, else NCName
        concatenated onto the base (RdfXmlParser.java:567-581)."""
        if is_absolute_iri(iri):
            return iri
        if not is_valid_ncname(iri):
            self._error("Vocab term must be a valid NCName")
            return None
        result = base + iri
        if is_absolute_iri(result) or is_iri(result):
            return result
        self._error(f"Malformed IRI: {iri}")
        return None

    def _get_subject(self, attrs) -> str | None:
        count = 0
        result: str | None = None
        about = attrs.get((RDF_NS, "about"))
        if about is not None:
            result = self._resolve(self.base_stack[-1], about)
            if result is not None:
                count += 1
        id_val = attrs.get((RDF_NS, "ID"))
        if id_val is not None:
            result = self._resolve_no_resolve(self.base_stack[-1], id_val)
            if result is not None:
                if result in self.processed_ids:
                    self._error(f"Duplicate definition for resource ID = {result}")
                    return None
                self.processed_ids.add(result)
                count += 1
        node_id = attrs.get((RDF_NS, "nodeID"))
        if node_id is not None:
            if not is_valid_ncname(node_id):
                self._error("Invalid nodeID")
                return None
            result = self.bnodes.rename("_:" + node_id)
            count += 1
        if count == 0:
            return self.bnodes.fresh()
        if count > 1:
            self._error("Ambiguous identifier definition")
            return None
        return result

    def _process_pending(self, force_new_bnode: bool) -> None:
        for prop_res, attr, value in self.pending:
            if force_new_bnode or prop_res is None:
                bnode = self.bnodes.fresh()
                self._emit_non_literal(self.subj, self.pred, bnode)
                self.triples.append(plain_literal(bnode, attr, value, self.lang_stack[-1]))
            else:
                self.triples.append(plain_literal(prop_res, attr, value, self.lang_stack[-1]))
        self.pending.clear()

    def _process_lang_and_base(self, attrs) -> None:
        lang = self.lang_stack[-1]
        xml_lang = attrs.get((XML_NS, "lang"))
        if xml_lang is not None:
            lang = xml_lang
        self.lang_stack.append(lang)

        base = self.base_stack[-1]
        xml_base = attrs.get((XML_NS, "base"))
        if xml_base is not None:
            b = xml_base
            if "#" in b:
                b = b[: b.rindex("#")]
            b += "#"
            if is_absolute_iri(b):
                base = b
            else:
                self._error("Invalid base IRI")
        self.base_stack.append(base)

    # -------------------------------------------------------------- SAX

    def startElementNS(self, name, qname, attrs):
        self._process_pending(True)
        self.mode_stack.append(self.mode)

        ns_uri, lname = name
        ns_uri = ns_uri or ""
        if qname is None:
            qname = self._qname(ns_uri, lname)

        if self.parse_depth > 0:
            self.parse_depth += 1
            if self.mode == PARSE_TYPE_LITERAL:
                attr_list = [
                    (attrs.getQNameByName(k) or self._qname(k[0], k[1]), attrs.getValue(k))
                    for k in attrs.getNames()
                ]
                mappings = dict(self.ns_mappings)
                el_prefix = qname.partition(":")[0] if ":" in qname else ""
                if ns_uri:
                    mappings[el_prefix] = ns_uri
                used = {el_prefix}
                for aq, _v in attr_list:
                    if ":" in aq and not aq.startswith("xmlns"):
                        used.add(aq.partition(":")[0])
                emit = {k: v for k, v in mappings.items() if k in used}
                self.buf.append(serialize_open_tag(qname, emit, attr_list))
                self.ns_mappings.clear()
                return

        if self.mode == ERROR_RECOVERY:
            return

        self._process_lang_and_base(attrs)

        iri = ns_uri + lname
        if iri == RDF_RDF:
            # any rdf:RDF element (root or nested wrapper) is ignored
            # and its children processed (RdfXmlParser.java:162-164)
            self.root_seen = True
            return
        if self.subj is None and not ns_uri:
            return
        if not iri or iri in _FORBIDDEN_NODE_IRIS:
            self._error(f"{qname} is not allowed here")
            return

        adict = {k: attrs.getValue(k) for k in attrs.getNames()}

        if self.mode in (PARSE_TYPE_COLLECTION, INSIDE_OF_PROPERTY):
            subj = self._get_subject(adict)
            if subj is None:
                return
            self.subj = subj
            if self.mode != PARSE_TYPE_COLLECTION and self.subj_stack:
                self._emit_non_literal(self.subj_stack[-1], self.pred, subj)
            if iri != RDF_DESCRIPTION:
                if iri == RDF_LI:
                    self._error(f"{qname} is not allowed here")
                    return
                self.triples.append(non_literal(subj, RDF_TYPE, iri))
            self._process_resource_attrs(qname, attrs)
            self.subj_stack.append(subj)
            self.li_index_stack.append(1)
            if self.mode == INSIDE_OF_PROPERTY:
                self.mode = INSIDE_OF_RESOURCE
        elif self.mode in (PARSE_TYPE_RESOURCE, INSIDE_OF_RESOURCE):
            li_index = self.li_index_stack.pop()
            if not self._check_property(qname, iri, adict):
                self.li_index_stack.append(li_index)
                return
            self.pred = iri
            if iri == RDF_LI:
                self.pred = f"{RDF_NS}_{li_index}"
                li_index += 1
            self.li_index_stack.append(li_index)

            node_id = adict.get((RDF_NS, "ID"))
            if node_id is not None:
                self.reify = self._resolve_no_resolve(self.base_stack[-1], node_id)

            self.capture_literal = True
            self.mode = INSIDE_OF_PROPERTY
            self._process_property_attrs(ns_uri, attrs)
            if self.capture_literal:
                self.buf = []

    def _check_property(self, qname, iri, adict) -> bool:
        if iri in (RDF_NIL, RDF_DESCRIPTION):
            self._error(f"{qname} is not allowed here")
            return False
        if not is_iri(iri):
            self._error("Invalid property IRI")
            return False
        if (RDF_NS, "resource") in adict and (RDF_NS, "nodeID") in adict:
            self._error("Both rdf:resource and rdf:nodeID are present")
            return False
        if (RDF_NS, "parseType") in adict:
            for (uri, ln), _v in adict.items():
                full = (uri or "") + ln
                if uri == XML_NS or full in (RDF_PARSE_TYPE, RDF_ID):
                    continue
                self._error("rdf:parseType conflicts with other attributes")
                return False
        return True

    def _process_resource_attrs(self, qname, attrs) -> None:
        for key in attrs.getNames():
            uri, ln = key
            tag = (uri or "") + ln
            aqname = attrs.getQNameByName(key) or self._qname(uri, ln)
            if tag in (RDF_NODEID, RDF_ABOUT, RDF_ID) or aqname.startswith("xml") or (uri or "") == XML_NS:
                continue
            value = attrs.getValue(key)
            if tag == RDF_TYPE:
                self.triples.append(non_literal(self.subj, RDF_TYPE, value))
            elif tag in _FORBIDDEN_NODE_IRIS or tag == RDF_LI or not tag:
                self._error(f"{qname} is not allowed here")
            else:
                self.triples.append(
                    plain_literal(self.subj, tag, value, self.lang_stack[-1])
                )

    def _process_property_attrs(self, ns_uri, attrs) -> None:
        adict = {k: attrs.getValue(k) for k in attrs.getNames()}
        prop_res: str | None = None
        res_val = adict.get((RDF_NS, "resource"))
        if res_val is not None:
            prop_res = self._resolve(self.base_stack[-1], res_val)
            if prop_res is not None:
                self._emit_non_literal(self.subj, self.pred, prop_res)
                self.capture_literal = False

        for key in attrs.getNames():
            uri, ln = key
            if key == (RDF_NS, "resource"):
                continue
            attr = (uri or "") + ln
            aqname = attrs.getQNameByName(key) or self._qname(uri, ln)
            if aqname.startswith("xml") or (uri or "") == XML_NS or attr == RDF_ID:
                continue
            value = attrs.getValue(key)
            self._process_property_tag_attr(ns_uri, attr, value, prop_res)

    def _process_property_tag_attr(self, ns_uri, attr, value, prop_res) -> None:
        if attr == RDF_DATATYPE:
            self.datatype = self._resolve_no_resolve(ns_uri or "", value)
        elif attr == RDF_PARSE_TYPE:
            self.parse_depth = 1
            v = value.lower()
            if v == "literal":
                self.buf = []
                self.mode = PARSE_TYPE_LITERAL
            elif v == "resource":
                bnode = self.bnodes.fresh()
                self._emit_non_literal(self.subj, self.pred, bnode)
                self.subj = bnode
                self.subj_stack.append(bnode)
                self.li_index_stack.append(1)
                self.mode = PARSE_TYPE_RESOURCE
            elif v == "collection":
                bnode = self.bnodes.fresh()
                self.triples.append(non_literal(self.subj, self.pred, bnode))
                self.subj = bnode
                self.seq_tail = None
                self.subj_stack.append(bnode)
                self.li_index_stack.append(1)
                self.mode = PARSE_TYPE_COLLECTION
            self.capture_literal = False
        elif attr == RDF_NODEID:
            if not is_valid_ncname(value):
                self._error("Invalid nodeID")
            else:
                bnode = self.bnodes.rename("_:" + value)
                self._emit_non_literal(self.subj, self.pred, bnode)
                self.capture_literal = False
        else:
            if attr in _FORBIDDEN_NODE_IRIS or attr == RDF_NIL or not attr:
                self._error(f"{attr} is not allowed here")
            else:
                self.pending.append((prop_res, attr, value))
                self.capture_literal = False

    def endElementNS(self, name, qname):
        self._process_pending(False)
        if qname is None:
            qname = self._qname(name[0] or "", name[1])
        if self.parse_depth > 0:
            self.parse_depth -= 1
            if self.mode == PARSE_TYPE_LITERAL and self.parse_depth > 0:
                self.buf.append(f"</{qname}>")
                return
        if not self.subj_stack:
            return

        if self.mode in (PARSE_TYPE_RESOURCE, INSIDE_OF_RESOURCE):
            self.subj_stack.pop()
            if self.subj_stack:
                self.subj = self.subj_stack[-1]
            self.li_index_stack.pop()
            if self.mode == INSIDE_OF_RESOURCE:
                self.mode = INSIDE_OF_PROPERTY
            else:
                self.mode = INSIDE_OF_RESOURCE
        elif self.mode == PARSE_TYPE_COLLECTION:
            self.subj_stack.pop()
            self.li_index_stack.pop()
            if self.parse_depth > 0:
                if self.seq_tail is None:
                    self.seq_tail = self.subj_stack[-1]
                    self.triples.append(non_literal(self.seq_tail, RDF_FIRST, self.subj))
                else:
                    bnode = self.bnodes.fresh()
                    self.triples.append(non_literal(self.seq_tail, RDF_REST, bnode))
                    self.triples.append(non_literal(bnode, RDF_FIRST, self.subj))
                    self.seq_tail = bnode
            else:
                self.triples.append(non_literal(self.seq_tail, RDF_REST, RDF_NIL))
                if self.subj_stack:
                    self.subj = self.subj_stack[-1]
                self.mode = INSIDE_OF_RESOURCE
        elif self.mode == INSIDE_OF_PROPERTY:
            if self.capture_literal:
                value = "".join(self.buf)
                if self.datatype is not None:
                    self._emit_literal(self.subj, self.pred, value, self.datatype, True)
                    self.datatype = None
                else:
                    self._emit_literal(self.subj, self.pred, value, self.lang_stack[-1], False)
                self.capture_literal = False
            self.mode = INSIDE_OF_RESOURCE
        elif self.mode == PARSE_TYPE_LITERAL:
            self._emit_literal(self.subj, self.pred, "".join(self.buf), RDF_XML_LITERAL, True)
            self.mode = INSIDE_OF_RESOURCE
        elif self.mode == ERROR_RECOVERY:
            self.mode = self.mode_stack.pop()
            return

        self.lang_stack.pop()
        self.base_stack.pop()
        saved = self.mode_stack.pop()
        if saved == PARSE_TYPE_RESOURCE:
            self.mode = saved

    def characters(self, content):
        self._process_pending(True)
        if self.mode == PARSE_TYPE_LITERAL or self.capture_literal:
            self.buf.append(content)

    def ignorableWhitespace(self, whitespace):
        self.characters(whitespace)

    def processingInstruction(self, target, data):
        self._process_pending(True)
        if self.parse_depth > 0 and self.mode == PARSE_TYPE_LITERAL:
            self.buf.append(f"<?{target} {data}?>")

    def startPrefixMapping(self, prefix, uri):
        p = prefix or ""
        self.prefix_scopes.setdefault(p, []).append(uri)
        self.ns_prefixes.setdefault(uri, []).append(p)
        if self.mode == PARSE_TYPE_LITERAL:
            self.ns_mappings[p] = uri

    def endPrefixMapping(self, prefix):
        p = prefix or ""
        scopes = self.prefix_scopes.get(p)
        if not scopes:
            return
        uri = scopes.pop()  # the innermost binding of this prefix
        stack = self.ns_prefixes.get(uri, [])
        for i in range(len(stack) - 1, -1, -1):
            if stack[i] == p:
                del stack[i]
                break


class _ExpatAttrs:
    """Minimal xml.sax AttributesNS facade over an expat attrs dict
    keyed by (ns_uri_or_None, lname)."""

    __slots__ = ("d",)

    def __init__(self, d):
        self.d = d

    def get(self, key, default=None):
        return self.d.get(key, default)

    def getNames(self):
        return list(self.d)

    def getValue(self, key):
        return self.d[key]

    def getQNameByName(self, key):
        # expat drops original qnames; the handler reconstructs them
        # from its prefix-mapping stacks
        return None


def parse(
    text: str, *, base_uri: str = "", doc_key: str = "", recover: bool = True
) -> tuple[list[Triple], list[str]]:
    """Parse an RDF/XML document. Returns ``(triples, errors)``.

    Direct pyexpat with namespace processing (the reference's SAX scan,
    XmlSource.java:31-93) — no expatreader dispatch layers. Internal DTD
    entities expand; external DTD/entity loading stays off (expat never
    fetches unless enabled), matching XmlSource's disabled DTD fetch."""
    from xml.parsers import expat

    handler = _Handler(base_uri, doc_key)
    parser = expat.ParserCreate(namespace_separator=" ")

    def _split(n: str):
        i = n.rfind(" ")
        return (None, n) if i < 0 else (n[:i], n[i + 1:])

    def _start(name, attrs):
        handler.startElementNS(
            _split(name), None, _ExpatAttrs({_split(k): v for k, v in attrs.items()})
        )

    def _end(name):
        handler.endElementNS(_split(name), None)

    def _comment(content):
        handler._process_pending(True)
        if handler.parse_depth > 0 and handler.mode == PARSE_TYPE_LITERAL:
            handler.buf.append(f"<!--{content}-->")

    parser.StartElementHandler = _start
    parser.EndElementHandler = _end
    parser.CharacterDataHandler = handler.characters
    parser.StartNamespaceDeclHandler = lambda prefix, uri: handler.startPrefixMapping(
        prefix, uri
    )
    parser.EndNamespaceDeclHandler = handler.endPrefixMapping
    parser.CommentHandler = _comment
    parser.ProcessingInstructionHandler = handler.processingInstruction
    try:
        parser.Parse(text, True)
    except Exception as exc:
        handler.errors.append(f"XML parse error: {exc}")
        if not recover:
            raise
    return handler.triples, handler.errors
