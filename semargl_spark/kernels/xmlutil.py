"""XML helpers: NCName validation and XML-literal open-tag serialization
(semantics of /root/reference/core/src/main/java/org/semarglproject/xml/
XmlUtils.java:74-167)."""

from __future__ import annotations

import re

XML_NS = "http://www.w3.org/XML/1998/namespace"

# NCName per XML 1.0 (letter/underscore start; no colon)
_NCNAME_RE = re.compile(r"[A-Za-z_À-￿][\w.\-·À-￿]*\Z")


def is_valid_ncname(value: str) -> bool:
    return bool(value) and bool(_NCNAME_RE.match(value))


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
