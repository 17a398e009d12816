"""XML helpers: NCName validation and XML-literal open-tag serialization
(semantics of /root/reference/core/src/main/java/org/semarglproject/xml/
XmlUtils.java:74-167)."""

from __future__ import annotations

import re

XML_NS = "http://www.w3.org/XML/1998/namespace"

# NCName per XML 1.0 + Namespaces: start = letter | '_' (no digits, no
# combining marks); rest adds digits, '.', '-', '·', combining marks
_NCNAME_START_CATS = {"Ll", "Lu", "Lo", "Lt", "Nl"}
_NCNAME_REST_CATS = _NCNAME_START_CATS | {"Mc", "Mn", "Nd", "Pc", "Cf"}


def is_valid_ncname(value: str) -> bool:
    if not value:
        return False
    import unicodedata

    first = value[0]
    if first != "_" and unicodedata.category(first) not in _NCNAME_START_CATS:
        return False
    for ch in value[1:]:
        if ch in "._-·":
            continue
        if unicodedata.category(ch) not in _NCNAME_REST_CATS:
            return False
    return True


def escape_attr(value: str) -> str:
    return (
        value.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


def serialize_open_tag(
    qname: str, ns_mappings: dict[str, str], attrs: list[tuple[str, str]]
) -> str:
    """Render an open tag for XMLLiteral capture, including pending
    namespace declarations (XmlUtils.serializeOpenTag semantics)."""
    parts = [f"<{qname}"]
    for prefix, uri in sorted(ns_mappings.items()):
        decl = f'xmlns:{prefix}="{escape_attr(uri)}"' if prefix else f'xmlns="{escape_attr(uri)}"'
        parts.append(" " + decl)
    for aqname, avalue in attrs:
        parts.append(f' {aqname}="{escape_attr(avalue)}"')
    parts.append(">")
    return "".join(parts)
