"""IRI validation & resolution.

Replicates the observable behavior of the reference's resource-identifier
utilities (see /root/reference/core/src/main/java/org/semarglproject/ri/
RIUtils.java:27-115): an IRI is accepted when it matches either the
absolute *hierarchical* pattern or the absolute *opaque* pattern; URNs get
their own check; relative references are resolved against a base with
three special cases (``?``-prefixed refs, empty refs, and bases ending in
``#``), falling back to plain concatenation when URL resolution fails.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

# scheme ":" opaque-part (no '/' first char, no '#' anywhere)
_ABS_OPAQUE_IRI = re.compile(r"[a-zA-Z][a-zA-Z0-9+.\-]*:[^#/][^#]*\Z", re.DOTALL)

# scheme "://..." hierarchical form: user@host:port/path?query#fragment
_ABS_HIER_IRI = re.compile(
    r"[a-zA-Z][a-zA-Z0-9+.\-]*:"
    r"/{1,3}(([^/?#@]*)@)?"          # user
    r"(\[[^@/?#]+\]|([^@/?#:]+))"    # host
    r"(:([^/?#]*))?"                  # port
    r"([^#?]*)?"                      # path
    r"(\?([^#]*))?"                   # query
    r"(#[^#]*)?\Z",                   # fragment
    re.DOTALL,
)

_URN = re.compile(r"urn:[a-zA-Z0-9][a-zA-Z0-9\-]{1,31}:.+\Z", re.DOTALL)


class MalformedIriError(ValueError):
    """Raised when a reference cannot be resolved to a valid IRI."""


def is_iri(value: str) -> bool:
    return bool(_ABS_HIER_IRI.match(value) or _ABS_OPAQUE_IRI.match(value))


def is_absolute_iri(value: str) -> bool:
    return bool(_ABS_HIER_IRI.match(value))


def is_urn(value: str) -> bool:
    return bool(_URN.match(value))


def resolve_iri(base: str, iri: str | None) -> str | None:
    """Resolve ``iri`` against ``base``; absolute IRIs/URNs pass through.

    Special cases mirror the reference: ``?``-prefixed or empty refs are
    appended to the base (with a trailing ``#`` on the base stripped
    first); failed URL resolution falls back to ``base + iri``; the final
    result must itself validate as an IRI or MalformedIriError is raised.
    """
    if iri is None:
        return None
    if is_iri(iri) or is_urn(iri):
        return iri
    if iri.startswith("?") or iri == "":
        if base.endswith("#"):
            return base[:-1] + iri
        return base + iri
    try:
        result = urljoin(base, iri)
        # urljoin drops empty fragments/queries; the reference keeps them
        if iri.endswith("#") and not result.endswith("#"):
            result += "#"
        elif iri.endswith("?") and not result.endswith("?"):
            result += "?"
    except ValueError:
        result = base + iri
    if is_iri(result):
        return result
    # urljoin of e.g. an opaque urn base yields the ref unchanged; mimic
    # the reference's concatenation fallback before giving up.
    fallback = base + iri
    if is_iri(fallback):
        return fallback
    raise MalformedIriError(f"Malformed IRI: {iri}")
