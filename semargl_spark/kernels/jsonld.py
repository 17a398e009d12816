"""JSON-LD → quads kernel.

Reimplements what the reference's JSON-LD pipeline computes
(/root/reference/jsonld/src/main/java/org/semarglproject/jsonld/
JsonLdParser.java:41-423 — char-FSM tokenizer — and
JsonLdContentHandler.java:32-383 + EvalContext.java:35-473 — context
resolution and triple emission) as a recursive walk over ``json.loads``
output. The reference's out-of-order machinery (deferral queues gated on
an ``ID_DECLARED|CONTEXT_DECLARED|PARENT_SAFE`` bitmask,
EvalContext.java:37-74,167-202) exists only because it is single-pass;
holding the (small, per-turn) document lets us resolve in order and emit
identical statements.

Supported semantics (JsonLd.java:24-43 keyword surface):
@context (term→IRI, @id/@type/@language/@container/@reverse term
definitions, @vocab, @base, null resets, compact IRIs), @id, @type,
@value, @language, @graph (named graphs), @list/@set (RDF collection
construction, JsonLdContentHandler.java:114-139,275-282), @reverse
(triple flip, EvalContext.java:275-294), @index containers (flattened),
@language containers (language maps), scalar typing (bool/int/double →
xsd, JsonLdContentHandler.java:301-338). Remote (string) contexts are
rejected offline — executors must never fetch (SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import math
import re
from typing import Any

from .iri import MalformedIriError, is_iri, is_urn, resolve_iri
from .model import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    BnodeAllocator,
    Triple,
    non_literal,
    plain_literal,
    typed_literal,
)

KEYWORDS = {
    "@context", "@id", "@type", "@value", "@language", "@container",
    "@list", "@set", "@reverse", "@graph", "@base", "@vocab", "@index",
}

_TERM_RE = re.compile(r"[a-zA-Z0-9_-]+\Z")


class _Float(float):
    """Float preserving its JSON lexical form (to classify int vs double
    the way the tokenizer does by lexical shape, JsonLdParser.java:203-207)."""

    lexical: str

    def __new__(cls, s: str):
        obj = super().__new__(cls, s)
        obj.lexical = s
        return obj


def _canon_double(v: float) -> str:
    """Canonical xsd:double lexical form (matches the W3C toRdf expected
    outputs, e.g. 1.1E1)."""
    if math.isinf(v) or math.isnan(v):
        return "INF" if v > 0 else ("-INF" if v < 0 else "NaN")
    mantissa, exp = f"{v:1.15E}".split("E")
    mantissa = mantissa.rstrip("0")
    if mantissa.endswith("."):
        mantissa += "0"
    return f"{mantissa}E{int(exp)}"


class _TermDef:
    __slots__ = ("iri", "type_mapping", "language", "has_language", "container", "reverse")

    def __init__(self, iri=None, type_mapping=None, language=None, has_language=False,
                 container=None, reverse=False):
        self.iri = iri
        self.type_mapping = type_mapping
        self.language = language
        self.has_language = has_language
        self.container = container
        self.reverse = reverse


class _Context:
    __slots__ = ("terms", "vocab", "base", "language")

    def __init__(self, base: str | None):
        self.terms: dict[str, _TermDef] = {}
        self.vocab: str | None = None
        self.base = base
        self.language: str | None = None

    def copy(self) -> "_Context":
        c = _Context(self.base)
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.language = self.language
        return c


class _State:
    def __init__(self, base_uri: str, doc_key: str,
                 context_registry: dict | None = None):
        self.bnodes = BnodeAllocator(doc_key)
        self.triples: list[Triple] = []
        self.errors: list[str] = []
        self.doc_base = base_uri
        # offline remote-context resolution: IRI → parsed context value
        # (executors must NEVER fetch — the registry is caller-supplied
        # and ships like a broadcast dict; unresolved IRIs stay errors)
        self.context_registry = context_registry or {}


def parse(
    text: str, *, base_uri: str = "", doc_key: str = "", recover: bool = True,
    context_registry: dict | None = None,
) -> tuple[list[Triple], list[str]]:
    """Parse a JSON-LD document into quads. Returns ``(triples, errors)``.

    ``context_registry`` maps remote @context IRIs to their (already
    parsed) context values, enabling schema.org-style corpora offline;
    a string @context not present in the registry is an error row, as
    before — executors never fetch.
    """
    st = _State(base_uri, doc_key, context_registry)
    try:
        doc = json.loads(text, parse_float=_Float)
    except Exception as exc:
        st.errors.append(f"JSON parse error: {exc}")
        return [], st.errors
    ctx = _Context(base_uri)
    try:
        _walk_value(doc, ctx, None, st)
    except RecursionError:
        st.errors.append("JSON-LD nesting too deep")
    return st.triples, st.errors


# ---------------------------------------------------------------- context


# processed-context cache: real corpora repeat a handful of @context
# values across millions of documents (the reference caches vocabularies
# per thread the same way, RdfaParser.java:96-101). A context is
# cacheable when (a) the active context is pristine (top-level @context
# over a fresh document context) and (b) processing cannot depend on
# the per-document base: no "@base" entry and no null reset item —
# term-IRI expansion never consults ctx.base (terms resolve via other
# terms, compact IRIs, or @vocab only), so under (b) the resulting
# terms/vocab/language are document-independent and only ``base`` is
# re-stamped per document on a hit. Errors emitted during processing
# are replayed on every hit. _TermDef values are immutable after
# construction and _Context.copy() is shallow by design, so sharing
# them across documents is safe.
_CTX_CACHE: dict = {}
_CTX_CACHE_MAX = 4096


def _resolve_remote(local: Any, st: _State) -> Any:
    """Substitute registry-known remote @context IRIs with their parsed
    values (splicing lists), so downstream processing and the context
    cache both see the resolved content — the cache key can never alias
    two different registries. Unknown strings pass through to the
    error path. Registry values may themselves reference registry IRIs
    (one level per round, bounded to avoid cycles)."""
    if not st.context_registry:
        return local
    items = local if isinstance(local, list) else [local]
    for _ in range(5):
        if not any(isinstance(i, str) and i in st.context_registry for i in items):
            break
        out: list = []
        for item in items:
            if isinstance(item, str) and item in st.context_registry:
                val = st.context_registry[item]
                out.extend(val if isinstance(val, list) else [val])
            else:
                out.append(item)
        items = out
    return items


def _base_independent(local: Any) -> bool:
    items = local if isinstance(local, list) else [local]
    for item in items:
        if item is None:
            return False
        if isinstance(item, dict) and "@base" in item:
            return False
    return True


def _process_context(active: _Context, local: Any, st: _State) -> _Context:
    local = _resolve_remote(local, st)
    cache_key = None
    if (
        not active.terms
        and active.vocab is None
        and active.language is None
        and _base_independent(local)
    ):
        try:
            cache_key = json.dumps(local, sort_keys=True)
        except (TypeError, ValueError):
            cache_key = None
    if cache_key is not None:
        hit = _CTX_CACHE.get(cache_key)
        if hit is not None:
            cached_ctx, cached_errors = hit
            st.errors.extend(cached_errors)
            out = cached_ctx.copy()
            out.base = active.base
            return out
    pre_errors = len(st.errors)
    ctx = _process_context_uncached(active, local, st)
    if cache_key is not None and len(_CTX_CACHE) < _CTX_CACHE_MAX:
        _CTX_CACHE[cache_key] = (ctx.copy(), tuple(st.errors[pre_errors:]))
    return ctx


def _process_context_uncached(active: _Context, local: Any, st: _State) -> _Context:
    ctx = active.copy()
    items = local if isinstance(local, list) else [local]
    for item in items:
        if item is None:
            fresh = _Context(st.doc_base)
            ctx = fresh
            continue
        if isinstance(item, str):
            # remote context: executors are offline by design
            st.errors.append(f"remote @context not supported offline: {item}")
            continue
        if not isinstance(item, dict):
            continue
        if "@base" in item:
            b = item["@base"]
            ctx.base = st.doc_base if b is None else (
                b if is_iri(b) or is_urn(b) else _try_resolve(ctx.base or st.doc_base, b)
            )
        if "@vocab" in item:
            ctx.vocab = item["@vocab"]
        if "@language" in item:
            lv = item["@language"]
            if lv is None or isinstance(lv, str):
                ctx.language = lv
            else:
                st.errors.append("invalid @language in @context: non-string")
        for term, defn in item.items():
            if term in ("@base", "@vocab", "@language") or term in KEYWORDS:
                continue
            ctx.terms[term] = _make_term_def(term, defn, item, ctx, st)
    return ctx


def _make_term_def(term: str, defn: Any, local: dict, ctx: _Context, st: _State) -> _TermDef:
    td = _TermDef()
    seen = frozenset({term})  # a term definition never resolves through itself
    if defn is None:
        return td  # explicit null → term dropped (onNull, JsonLdContentHandler.java:326)
    if isinstance(defn, str):
        td.iri = _expand_term_iri(defn, local, ctx, st, seen)
        return td
    if not isinstance(defn, dict):
        return td
    if "@reverse" in defn:
        td.iri = _expand_term_iri(defn["@reverse"], local, ctx, st, seen)
        td.reverse = True
    if "@id" in defn:
        if defn["@id"] is None:
            return td  # explicit null @id → term maps to nothing (0072)
        td.iri = _expand_term_iri(defn["@id"], local, ctx, st, seen)
    if td.iri is None:
        # term name itself may be a compact IRI / vocab word
        td.iri = _expand_term_iri(term, local, ctx, st, seen)
    if "@type" in defn:
        t = defn["@type"]
        td.type_mapping = t if (isinstance(t, str) and t.startswith("@")) else _expand_term_iri(t, local, ctx, st, seen)
    if "@language" in defn:
        td.language = defn["@language"]
        td.has_language = True
    if "@container" in defn:
        c = defn["@container"]
        td.container = c if isinstance(c, str) else (c[0] if isinstance(c, list) and c else None)
    return td


def _expand_term_iri(value: str | None, local: dict | None, ctx: _Context, st: _State,
                     _seen: frozenset = frozenset()) -> str | None:
    """Expand a term-definition IRI: keyword | term | compact IRI | vocab
    word | absolute IRI (EvalContext.resolveMapping semantics,
    jsonld/.../EvalContext.java:387-443)."""
    if value is None or not isinstance(value, str):
        return None
    if value.startswith("@"):
        return value if value in KEYWORDS else None
    if value not in _seen:
        td = ctx.terms.get(value)
        if td is not None:
            return td.iri
    if local is not None and value in local and value not in _seen:
        inner = local[value]
        ref = inner if isinstance(inner, str) else (
            inner.get("@id") if isinstance(inner, dict) else None
        )
        if isinstance(ref, str):
            return _expand_term_iri(ref, local, ctx, st, _seen | {value})
    if value.startswith("_:"):
        return value  # raw label; renamed at use sites (cf. 0078 concat)
    if ":" in value:
        prefix, _, suffix = value.partition(":")
        if not suffix.startswith("//"):  # '//'-suffixes are absolute IRIs (0107)
            ptd = ctx.terms.get(prefix)
            if ptd is not None and ptd.iri:
                return ptd.iri + suffix
            if local is not None and prefix in local and prefix not in _seen:
                base = _expand_term_iri(prefix, local, ctx, st, _seen)
                if base:
                    return base + suffix
        if is_iri(value) or is_urn(value):
            return value
        return None
    if ctx.vocab:
        return ctx.vocab + value
    return None


# ---------------------------------------------------------------- expansion


def _rename_if_bnode(result: str | None, st: _State) -> str | None:
    if result is not None and result.startswith("_:"):
        return st.bnodes.rename(result)
    return result


def _expand_pred(key: str, ctx: _Context, st: _State) -> str | None:
    """Expand a node-object key into a predicate IRI, keyword, or None."""
    if key.startswith("@") and key in KEYWORDS:
        return key
    td = ctx.terms.get(key)
    if td is not None:
        if td.iri is not None and td.iri.startswith("@"):
            return td.iri  # keyword alias (JsonLdContentHandler.java:168-178)
        return _rename_if_bnode(td.iri, st)
    if key.startswith("_:"):
        return st.bnodes.rename(key)
    if ":" in key:
        prefix, _, suffix = key.partition(":")
        if not suffix.startswith("//"):
            ptd = ctx.terms.get(prefix)
            if ptd is not None and ptd.iri:
                return _rename_if_bnode(ptd.iri + suffix, st)
        if is_iri(key) or is_urn(key):
            return key
        return None
    if ctx.vocab:
        return ctx.vocab + key
    return None


def _expand_node_ref(value: str, ctx: _Context, st: _State) -> str | None:
    """Expand an @id / node-reference string to an IRI or bnode label."""
    if value.startswith("_:"):
        return st.bnodes.rename(value)
    # bare words are never treated as terms in @id position
    # (TERM_PATTERN "./"-forcing, JsonLdContentHandler.java:266-269 — 0088)
    if ":" in value:
        # CURIE prefix mappings take precedence over the opaque-IRI
        # interpretation (EvalContext.resolveCurieOrIri semantics)
        prefix, _, suffix = value.partition(":")
        if not suffix.startswith("//"):
            ptd = ctx.terms.get(prefix)
            if ptd is not None and ptd.iri and not ptd.iri.startswith("@"):
                return _rename_if_bnode(ptd.iri + suffix, st)
    if is_iri(value) or is_urn(value):
        return value
    base = ctx.base or st.doc_base
    # bare words are never treated as terms in @id position: the reference
    # forces "./"-prefixing before base resolution
    # (JsonLdContentHandler.java:266-269)
    ref = value
    try:
        return resolve_iri(base, ref)
    except MalformedIriError:
        return None


def _expand_type(value: str, ctx: _Context, st: _State) -> str | None:
    """@type values resolve vocab-style, then doc-relative."""
    if value.startswith("_:"):
        return st.bnodes.rename(value)
    td = ctx.terms.get(value)
    if td is not None and td.iri and not td.iri.startswith("@"):
        return _rename_if_bnode(td.iri, st)
    if ":" in value:
        prefix, _, suffix = value.partition(":")
        if not suffix.startswith("//"):
            ptd = ctx.terms.get(prefix)
            if ptd is not None and ptd.iri:
                return _rename_if_bnode(ptd.iri + suffix, st)
        if is_iri(value) or is_urn(value):
            return value
        return None
    if ctx.vocab:
        return ctx.vocab + value
    # vocab expansion for @type falls back to document-relative (0099/0100)
    return _try_resolve(ctx.base or st.doc_base, value)


def _try_resolve(base: str, ref: str) -> str | None:
    try:
        return resolve_iri(base, ref)
    except MalformedIriError:
        return None


def _java_double_str(v: float) -> str:
    """Java Double.toString-style lexical form — what the reference feeds
    its sink for doubles (JsonLdContentHandler.onNumber:332-334)."""
    if v != v or v in (float("inf"), float("-inf")):
        return _canon_double(v)
    a = abs(v)
    if 1e-3 <= a < 1e7 or v == 0:
        s = repr(v)
        return s if "." in s or "e" in s or "E" in s else s + ".0"
    mantissa, exp = f"{v:1.16E}".split("E")
    mantissa = mantissa.rstrip("0")
    if mantissa.endswith("."):
        mantissa += "0"
    return f"{mantissa}E{int(exp)}"


def _scalar_literal(value: Any, td: _TermDef | None, ctx: _Context, st: _State | None = None):
    """(content, lang, dtype) for a JSON scalar in object position."""
    custom_dt = (
        td.type_mapping
        if td is not None and td.type_mapping and not td.type_mapping.startswith("@")
        else None
    )
    if custom_dt is not None and custom_dt.startswith("_:") and st is not None:
        custom_dt = st.bnodes.rename(custom_dt)
    if isinstance(value, bool):
        return ("true" if value else "false", None, custom_dt or XSD_BOOLEAN)
    if isinstance(value, _Float):
        lex = value.lexical
        if re.fullmatch(r"-?\d+", lex):
            return (lex, None, custom_dt or XSD_INTEGER)
        if custom_dt:
            # coerced doubles keep the reference's Double.toString lexical
            return (_java_double_str(float(value)), None, custom_dt)
        return (_canon_double(float(value)), None, XSD_DOUBLE)
    if isinstance(value, int):
        return (str(value), None, custom_dt or XSD_INTEGER)
    # string
    if custom_dt is not None:
        return (value, None, custom_dt)
    lang = None
    if td is not None and td.has_language:
        lang = td.language  # may be None (null override)
    else:
        lang = ctx.language
    return (value, lang, None)


def _is_value_object(obj: dict, ctx: _Context) -> bool:
    return any(_aliases_to(k, "@value", ctx) for k in obj)


def _aliases_to(key: str, keyword: str, ctx: _Context) -> bool:
    if key == keyword:
        return True
    td = ctx.terms.get(key)
    return td is not None and td.iri == keyword


def _keyword_get(obj: dict, keyword: str, ctx: _Context):
    for k, v in obj.items():
        if _aliases_to(k, keyword, ctx):
            return v
    return None


def _build_list(values: list, ctx: _Context, td: _TermDef | None, st: _State,
                graph: str | None) -> str:
    """RDF collection construction: rdf:first/rest/nil chain
    (JsonLdContentHandler.java:275-282, EvalContext.java:205-247).
    Null entries (JSON null / null @value) contribute no cells."""
    terms = []
    for v in values:
        term = _expand_value(v, ctx, td, st, graph)
        if term is not None:
            terms.append(term)
    if not terms:
        return RDF_NIL
    head = st.bnodes.fresh()
    node = head
    for i, term in enumerate(terms):
        kind, *rest = term
        if kind == "node":
            st.triples.append(non_literal(node, RDF_FIRST, rest[0], graph))
        elif kind == "literal":
            content, lang, dtype = rest
            if dtype:
                st.triples.append(typed_literal(node, RDF_FIRST, content, dtype, graph))
            else:
                st.triples.append(plain_literal(node, RDF_FIRST, content, lang, graph))
        nxt = st.bnodes.fresh() if i < len(terms) - 1 else RDF_NIL
        st.triples.append(non_literal(node, RDF_REST, nxt, graph))
        node = nxt
    return head


def _expand_value(value: Any, ctx: _Context, td: _TermDef | None, st: _State,
                  graph: str | None):
    """Expand one object-position value.

    Returns ('node', id) | ('literal', content, lang, dtype) | None.
    """
    if value is None:
        return None
    if isinstance(value, (bool, int, float, str)):
        if isinstance(value, str) and td is not None:
            if td.reverse and td.type_mapping is None:
                # reverse-property values are node references (0089)
                ref = _expand_node_ref(value, ctx, st)
                if ref is not None:
                    return ("node", ref)
                return None
            if td.type_mapping == "@id":
                ref = _expand_node_ref(value, ctx, st)
                if ref is not None:
                    return ("node", ref)
                return ("literal", value, ctx.language, None)
            if td.type_mapping == "@vocab":
                ref = _expand_type(value, ctx, st) or _expand_node_ref(value, ctx, st)
                if ref is not None:
                    return ("node", ref)
        content, lang, dtype = _scalar_literal(value, td, ctx, st)
        return ("literal", content, lang, dtype)
    if isinstance(value, dict):
        local_ctx = _keyword_get(value, "@context", ctx)
        inner_ctx = _process_context(ctx, local_ctx, st) if local_ctx is not None or any(
            _aliases_to(k, "@context", ctx) for k in value
        ) else ctx
        if _is_value_object(value, inner_ctx):
            val = _keyword_get(value, "@value", inner_ctx)
            if val is None:
                return None
            if not isinstance(val, (bool, int, float, str)):
                # non-scalar @value is invalid JSON-LD; dropping it with
                # an error keeps Triple fields strictly strings (a list
                # here would crash Arrow serialization task-side, E10)
                st.errors.append("invalid @value: non-scalar")
                return None
            type_v = _keyword_get(value, "@type", inner_ctx)
            lang_v = _keyword_get(value, "@language", inner_ctx)
            if lang_v is not None and not isinstance(lang_v, str):
                st.errors.append("invalid @language: non-string")
                lang_v = None
            if type_v is not None and isinstance(type_v, str):
                dtype = _expand_type(type_v, inner_ctx, st)
                if isinstance(val, bool):
                    val = "true" if val else "false"
                elif isinstance(val, _Float):
                    val = val.lexical if re.fullmatch(r"-?\d+", val.lexical) else _canon_double(float(val))
                return ("literal", str(val), None, dtype)
            if isinstance(val, (bool, int, float)):
                content, lang, dtype = _scalar_literal(val, None, _Context(None))
                return ("literal", content, lang, dtype)
            return ("literal", val, lang_v if lang_v is not None else None, None)
        list_v = _keyword_get(value, "@list", inner_ctx)
        if list_v is not None:
            if not isinstance(list_v, list):
                list_v = [list_v]
            return ("node", _build_list(list_v, inner_ctx, td, st, graph))
        set_v = _keyword_get(value, "@set", inner_ctx)
        if set_v is not None:
            # @set flattens: caller iterates; signal via special marker
            return ("set", set_v, inner_ctx)
        node_id = _walk_node(value, inner_ctx, graph, st, pre_ctx=True)
        if node_id is None:
            return None
        return ("node", node_id)
    return None


def _attach(subj: str, pred: str, term, graph: str | None, st: _State,
            reverse: bool = False) -> None:
    if term is None:
        return
    kind = term[0]
    if kind == "node":
        if reverse:
            st.triples.append(non_literal(term[1], pred, subj, graph))
        else:
            st.triples.append(non_literal(subj, pred, term[1], graph))
    elif kind == "literal":
        if reverse:
            return  # literals cannot be reversed subjects
        _, content, lang, dtype = term
        if dtype:
            st.triples.append(typed_literal(subj, pred, content, dtype, graph))
        else:
            st.triples.append(plain_literal(subj, pred, content, lang, graph))


def _walk_value(doc: Any, ctx: _Context, graph: str | None, st: _State) -> None:
    """Top-level dispatch: document may be a node object or an array."""
    if isinstance(doc, list):
        for item in doc:
            _walk_value(item, ctx, graph, st)
    elif isinstance(doc, dict):
        _walk_node(doc, ctx, graph, st, is_top=True)


def _walk_node(obj: dict, ctx: _Context, graph: str | None, st: _State,
               pre_ctx: bool = False, is_top: bool = False) -> str | None:
    """Process a node object; emit its triples; return its id."""
    if not pre_ctx:
        local_ctx = None
        has_ctx = False
        for k in obj:
            if _aliases_to(k, "@context", ctx):
                local_ctx = obj[k]
                has_ctx = True
                break
        if has_ctx:
            ctx = _process_context(ctx, local_ctx, st)

    if _is_value_object(obj, ctx):
        return None  # floating value object: dropped (JsonLdContentHandler.java:82)

    # subject: @id else fresh bnode (EvalContext.java:90-101)
    node_id: str | None = None
    id_v = _keyword_get(obj, "@id", ctx)
    if isinstance(id_v, str):
        node_id = _expand_node_ref(id_v, ctx, st)
    explicit_id = node_id is not None
    if node_id is None:
        node_id = st.bnodes.fresh()

    has_props = False
    graph_values = None  # deferred @graph payloads (top-level only)
    for key, value in obj.items():
        pred = _expand_pred(key, ctx, st)
        if pred is None:
            continue
        if pred in ("@context", "@id", "@index"):
            continue
        if pred == "@type":
            values = value if isinstance(value, list) else [value]
            for v in values:
                if isinstance(v, str):
                    t = _expand_type(v, ctx, st)
                    if t:
                        st.triples.append(non_literal(node_id, RDF_TYPE, t, graph))
                        has_props = True
            continue
        if pred == "@graph":
            # @graph names a graph after this node unless it is the
            # top-level wrapper whose other members all vanish under
            # expansion (null values, unmappable terms, empty @reverse):
            # the JSON-LD expansion algorithm removes those *before* the
            # graph-object decision, so a {"@reverse": null, "@graph": x}
            # document is a default-graph wrapper, matching expand()
            # (JsonLdContentHandler.java:53-60 keys off raw members; the
            # spec path is what both this kernel and jsonld_api follow).
            # At top level the decision needs to know whether any other
            # member *survives*, so the walk is deferred past them.
            if is_top:
                if graph_values is None:
                    graph_values = []
                graph_values.append(value)
            else:
                _walk_graph_value(value, ctx, node_id, st)
            continue
        if pred == "@reverse":
            if isinstance(value, dict):
                for rkey, rval in value.items():
                    rpred = _expand_pred(rkey, ctx, st)
                    if rpred is None or rpred.startswith("@"):
                        continue
                    rtd = ctx.terms.get(rkey)
                    double_reversed = rtd is not None and rtd.reverse
                    rvalues = rval if isinstance(rval, list) else [rval]
                    for rv in rvalues:
                        term = _expand_value(rv, ctx, rtd, st, graph)
                        if term is not None and term[0] == "node":
                            if double_reversed:
                                # @reverse of a @reverse term → forward (0083)
                                st.triples.append(non_literal(node_id, rpred, term[1], graph))
                            else:
                                st.triples.append(non_literal(term[1], rpred, node_id, graph))
                            has_props = True
            continue
        if pred.startswith("@"):
            continue

        td = ctx.terms.get(key)
        reverse = td.reverse if td is not None else False
        # has_props tracks *emission*, not raw keys: a member whose value
        # expands to nothing (null, empty) must not make this node a
        # named-graph wrapper, matching the expansion algorithm; tracking
        # stops once the first emission is seen (hot-path cost control)
        track = not has_props
        n_before = len(st.triples) if track else 0

        if td is not None and td.container == "@language" and isinstance(value, dict):
            for lang_key, lv in value.items():
                for s in lv if isinstance(lv, list) else [lv]:
                    if isinstance(s, str):
                        st.triples.append(plain_literal(node_id, pred, s, lang_key, graph))
        elif td is not None and td.container == "@index" and isinstance(value, dict):
            for _idx, iv in value.items():
                for s in iv if isinstance(iv, list) else [iv]:
                    term = _expand_value(s, ctx, td, st, graph)
                    if term is not None and term[0] == "set":
                        for sv in term[1]:
                            _attach(node_id, pred, _expand_value(sv, term[2], td, st, graph), graph, st, reverse)
                    else:
                        _attach(node_id, pred, term, graph, st, reverse)
        elif td is not None and td.container == "@list" and not (
            isinstance(value, dict)
        ):
            # scalar values under a @list container wrap into a
            # single-item list (JsonLdContentHandler.java:226-231,342-346)
            items = value if isinstance(value, list) else [value]
            head = _build_list(items, ctx, td, st, graph)
            st.triples.append(non_literal(node_id, pred, head, graph))
        else:
            values = value if isinstance(value, list) else [value]
            for v in values:
                term = _expand_value(v, ctx, td, st, graph)
                if term is not None and term[0] == "set":
                    for sv in term[1]:
                        _attach(node_id, pred, _expand_value(sv, term[2], td, st, graph), graph, st, reverse)
                else:
                    _attach(node_id, pred, term, graph, st, reverse)
        if track and len(st.triples) != n_before:
            has_props = True

    if graph_values:
        # top-level graph decision, deferred until member survival is known:
        # wrapper (default graph) iff no @id resolved and nothing emitted
        inner_graph = graph if (not explicit_id and not has_props) else node_id
        for gv in graph_values:
            _walk_graph_value(gv, ctx, inner_graph, st)

    return node_id


def _walk_graph_value(value: Any, ctx: _Context, graph: str | None, st: _State) -> None:
    if isinstance(value, list):
        for item in value:
            _walk_graph_value(item, ctx, graph, st)
    elif isinstance(value, dict):
        _walk_node(value, ctx, graph, st)
