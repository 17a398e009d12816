"""HTML microdata → triples kernel (schema.org itemscope/itemprop).

The reference covers RDFa, the W3C's other embedded-HTML metadata
syntax (rdfa/src/main/java/org/semarglproject/rdf/rdfa/RdfaParser.java);
crawl corpora carry schema.org microdata at least as often, so this
kernel completes the embedded-metadata matrix. Mapping follows the
W3C "Microdata to RDF" note's core algorithm:

* ``itemscope`` starts an item: subject = resolved ``itemid`` IRI if
  present, else a fresh document-scoped blank node;
* ``itemtype`` tokens → ``rdf:type`` IRIs; the FIRST type's base
  (up to the last ``#`` or ``/``) becomes the item's vocabulary for
  short property names;
* ``itemprop`` names: absolute IRIs pass through; short names append
  to the item's vocabulary, or to
  ``http://www.w3.org/1999/xhtml/microdata#`` for untyped items (the
  note's fallback);
* property VALUES by element: a/area/link→href, img/audio/video/
  embed/iframe/source/track→src, object→data, meta→content,
  data/meter→value (literals), time→datetime attr else text; an
  element that is itself ``itemscope`` contributes the nested item's
  subject; anything else contributes its concatenated descendant text
  as a plain literal with the nearest ``lang`` in scope.

Documented subset: ``itemref`` is not supported (it requires a second
pass over out-of-tree elements; occurrences produce a warning entry,
never a task failure), and ``<base href>`` does not override the
caller's ``base_uri``.

Front-ends are shared with the RDFa kernel (kernels/rdfa.py): strict
pyexpat for well-formed XML/XHTML, the lenient ``html.parser`` tag-soup
fallback for real HTML — same error-recovery contract (E10): malformed
input yields ``([], errors)``.
"""

from __future__ import annotations

import re

from .iri import MalformedIriError, is_iri, is_urn, resolve_iri
from .model import RDF_TYPE, BnodeAllocator, Triple, non_literal, plain_literal

MD_VOCAB = "http://www.w3.org/1999/xhtml/microdata#"

_URL_ATTR = {
    "a": "href", "area": "href", "link": "href",
    "img": "src", "audio": "src", "video": "src", "embed": "src",
    "iframe": "src", "source": "src", "track": "src",
    "object": "data",
}
_VALUE_ATTR = {"meta": "content", "data": "value", "meter": "value"}

_WS = re.compile(r"\s+")


class _Item:
    __slots__ = ("subject", "vocab")

    def __init__(self, subject: str, vocab: str | None):
        self.subject = subject
        self.vocab = vocab


class _Frame:
    """One open element."""

    __slots__ = ("name", "item", "lang", "collector", "pending")

    def __init__(self, name, item, lang, collector, pending):
        self.name = name
        self.item = item          # innermost item in scope at this depth
        self.lang = lang
        self.collector = collector  # list accumulating text, or None
        self.pending = pending      # (subject, [pred], lang) for text props


def _vocab_of(type_iri: str) -> str:
    h = type_iri.rfind("#")
    if h >= 0:
        return type_iri[: h + 1]
    s = type_iri.rfind("/")
    return type_iri[: s + 1] if s >= 0 else type_iri + "#"


class _MicrodataEngine:
    def __init__(self, base_uri: str, doc_key: str):
        self.base = base_uri
        self.bnodes = BnodeAllocator(doc_key)
        self.triples: list[Triple] = []
        self.errors: list[str] = []
        self.warnings: list[str] = []
        self.stack: list[_Frame] = []
        self.collectors: list[list] = []

    # -- front-end interface (same as _RdfaEngine's) -------------------
    def process_dtd(self, name, pubid):  # pragma: no cover - no-op
        pass

    def chars(self, data: str) -> None:
        for c in self.collectors:
            c.append(data)

    def _resolve(self, ref: str) -> str | None:
        if is_iri(ref) or is_urn(ref):
            return ref
        try:
            return resolve_iri(self.base, ref)
        except MalformedIriError:
            return None

    def _pred(self, name: str, item: _Item | None) -> str | None:
        if is_iri(name) or is_urn(name):
            return name
        if ":" in name or "/" in name:
            return None  # relative-URL property names are out of scope
        vocab = item.vocab if item is not None and item.vocab else MD_VOCAB
        return vocab + name

    def start(self, name: str, attrs: dict) -> None:
        name = name.rsplit(":", 1)[-1].lower()
        parent = self.stack[-1] if self.stack else None
        lang = attrs.get("lang") or attrs.get("xml:lang") or (
            parent.lang if parent else None
        )
        parent_item = parent.item if parent else None

        if "itemref" in attrs:
            self.warnings.append("itemref is not supported; ignored")

        item = parent_item
        new_item = None
        if "itemscope" in attrs:
            itemid = attrs.get("itemid")
            subject = self._resolve(itemid) if itemid else None
            if subject is None:
                subject = self.bnodes.fresh()
            types = _WS.split(attrs.get("itemtype", "").strip())
            types = [t for t in types if t]
            vocab = None
            for t in types:
                iri = self._resolve(t)
                if iri:
                    self.triples.append(non_literal(subject, RDF_TYPE, iri))
                    if vocab is None:
                        vocab = _vocab_of(iri)
            new_item = _Item(subject, vocab)
            item = new_item

        collector = None
        pending = None
        prop = attrs.get("itemprop")
        if prop is not None and parent_item is not None:
            preds = [
                p for p in (_WS.split(prop.strip()) if prop.strip() else [])
            ]
            preds = [self._pred(p, parent_item) for p in preds]
            preds = [p for p in preds if p]
            if preds:
                if new_item is not None:
                    for p in preds:
                        self.triples.append(
                            non_literal(parent_item.subject, p, new_item.subject)
                        )
                elif name in _URL_ATTR:
                    ref = attrs.get(_URL_ATTR[name])
                    iri = self._resolve(ref) if ref is not None else None
                    if iri is not None:
                        for p in preds:
                            self.triples.append(
                                non_literal(parent_item.subject, p, iri)
                            )
                    else:
                        self.warnings.append(
                            f"unresolvable URL property value on <{name}>"
                        )
                elif name in _VALUE_ATTR and _VALUE_ATTR[name] in attrs:
                    val = attrs[_VALUE_ATTR[name]]
                    for p in preds:
                        self.triples.append(
                            plain_literal(parent_item.subject, p, val, lang)
                        )
                elif name == "time" and "datetime" in attrs:
                    val = attrs["datetime"]
                    for p in preds:
                        self.triples.append(
                            plain_literal(parent_item.subject, p, val, lang)
                        )
                else:
                    collector = []
                    self.collectors.append(collector)
                    pending = (parent_item.subject, preds, lang)

        self.stack.append(_Frame(name, item, lang, collector, pending))

    def end(self, _name: str) -> None:
        if not self.stack:
            return
        frame = self.stack.pop()
        if frame.collector is not None:
            self.collectors.remove(frame.collector)
            text = "".join(frame.collector)
            subject, preds, lang = frame.pending
            for p in preds:
                self.triples.append(plain_literal(subject, p, text, lang))

    def finish(self) -> None:
        while self.stack:  # unclosed elements still emit their text props
            self.end(self.stack[-1].name)


def parse(
    text: str, *, base_uri: str = "", doc_key: str = "", recover: bool = True
) -> tuple[list[Triple], list[str]]:
    """Parse an HTML/XHTML document with microdata annotations.

    Returns ``(triples, errors)``; front-end selection and recovery
    mirror the RDFa kernel's.
    """
    from .rdfa import _HTML_SNIFF, _XML_DECL, _HtmlFrontend

    html_first = bool(_HTML_SNIFF.match(text)) and not _XML_DECL.match(text)

    def run_sax():
        from xml.parsers import expat

        engine = _MicrodataEngine(base_uri, doc_key)
        parser = expat.ParserCreate()

        def _start(name, attrs):
            engine.start(name, {k.lower(): v for k, v in attrs.items()})

        parser.StartElementHandler = _start
        parser.EndElementHandler = engine.end
        parser.CharacterDataHandler = engine.chars
        parser.Parse(text, True)
        engine.finish()
        return engine

    def run_html():
        engine = _MicrodataEngine(base_uri, doc_key)
        fe = _HtmlFrontend(engine)
        fe.feed(text)
        fe.close()
        engine.finish()
        return engine

    try:
        engine = run_html() if html_first else run_sax()
    except Exception as first_exc:
        try:
            engine = run_sax() if html_first else run_html()
        except Exception as second_exc:
            if not recover:
                raise
            return [], [
                f"microdata parse error: {first_exc}; fallback: {second_exc}"
            ]
    return engine.triples, engine.errors + engine.warnings
