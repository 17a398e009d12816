"""RDF Dataset Canonicalization (RDFC-1.0, a.k.a. URDNA2015).

Deterministic blank-node labeling for RDF datasets — the W3C
rdf-canon algorithm (https://www.w3.org/TR/rdf-canon/): each blank
node gets a canonical ``c14n{i}`` identifier derived from SHA-256
hashes of its quad neighborhood, so two isomorphic datasets produce
byte-identical canonical N-Quads. This is the primitive behind graph
signing, cross-snapshot diffing, and content-addressed KG dedup — none
of which the reference ships (it stops at per-document bnode labeling,
``rdf/src/main/java/org/semarglproject/rdf/NTriplesParser.java`` makes
labels document-unique but not structure-canonical); target-side
surface for the KG pipeline.

Implementation follows the spec's structure:

* 4.6  Hash First Degree Quads  → :func:`_hash_first_degree`
* 4.7  Hash Related Blank Node  → inside :func:`_hash_n_degree`
* 4.8  Hash N-Degree Quads      → :func:`_hash_n_degree`
* 4.4  Canonicalization         → :func:`canonical_labels`

Serialization uses canonical N-Quads escaping (ECHAR only for
``\\`` ``"`` LF CR; everything else literal UTF-8), intentionally
narrower than kernels/serialize.py's exhaustive NTriples escaping —
both engines of the oracle gate rebuild the exact same byte strings.

Complexity note for the 10^12-scale posture: hashing is linear in the
dataset for the overwhelmingly common case (first-degree hashes
unique); the N-degree permutation walk only triggers for automorphic
bnode clusters, whose size is bounded per DOCUMENT here (the operator
canonicalizes each transcript turn independently — dataset-global
canonicalization of a trillion-quad graph is neither needed nor
attempted). A ``max_degree_nodes`` guard refuses pathological
documents instead of burning factorial time.
"""

from __future__ import annotations

import hashlib
from itertools import permutations

from .model import BNODE_PREFIX, Triple

__all__ = ["canonical_labels", "canonicalize", "canonical_nquads"]


def _is_bnode(term: str | None) -> bool:
    return term is not None and term.startswith(BNODE_PREFIX)


def _esc(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _term(value: str, kind: str, lang, dtype, label) -> str:
    """Serialize one term; ``label`` maps bnode ids."""
    if kind == "bnode" or (_is_bnode(value) and kind != "literal"):
        return label(value)
    if kind == "iri":
        return f"<{value}>"
    body = f'"{_esc(value)}"'
    if lang:
        return f"{body}@{lang}"
    if dtype:
        return f"{body}^^<{dtype}>"
    return body


def _nquad(q: Triple, label) -> str:
    s = label(q.subj) if _is_bnode(q.subj) else f"<{q.subj}>"
    o = _term(q.obj, q.obj_kind, q.lang, q.dtype, label)
    parts = [s, f"<{q.pred}>", o]
    if q.graph:
        parts.append(label(q.graph) if _is_bnode(q.graph) else f"<{q.graph}>")
    return " ".join(parts) + " .\n"


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


class _Issuer:
    """Identifier issuer (spec 4.5): prefix + counter + issued map."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.counter = 0
        self.issued: dict[str, str] = {}
        self.order: list[str] = []  # issue order, for canonical handoff

    def issue(self, node: str) -> str:
        got = self.issued.get(node)
        if got is None:
            got = f"{self.prefix}{self.counter}"
            self.counter += 1
            self.issued[node] = got
            self.order.append(node)
        return got

    def copy(self) -> "_Issuer":
        c = _Issuer(self.prefix)
        c.counter = self.counter
        c.issued = dict(self.issued)
        c.order = list(self.order)
        return c


def _hash_first_degree(node: str, quads: list[Triple]) -> str:
    """Spec 4.6: serialize the node's quads with it as ``_:a`` and every
    other bnode as ``_:z``, sort, concatenate, SHA-256."""
    lines = sorted(
        _nquad(q, lambda b: "_:a" if b == node else "_:z") for q in quads
    )
    return _sha256("".join(lines))


def canonical_labels(
    quads: list[Triple], max_degree_nodes: int = 8
) -> dict[str, str]:
    """RDFC-1.0 → mapping original bnode label → ``c14n{i}``.

    ``max_degree_nodes`` bounds the size of any single automorphic
    hash group entering the factorial N-degree walk (spec security
    consideration: poison graphs); larger groups raise ValueError.
    """
    by_node: dict[str, list[Triple]] = {}
    for q in quads:
        for t in (q.subj, q.obj if q.obj_kind != "literal" else None, q.graph):
            if _is_bnode(t):
                by_node.setdefault(t, []).append(q)

    canonical = _Issuer("c14n")
    first: dict[str, str] = {
        n: _hash_first_degree(n, qs) for n, qs in by_node.items()
    }
    groups: dict[str, list[str]] = {}
    for n, h in first.items():
        groups.setdefault(h, []).append(n)

    for h in sorted(groups):
        if len(groups[h]) == 1:
            canonical.issue(groups[h][0])

    def hash_related(related: str, quad: Triple, issuer: _Issuer,
                     position: str) -> str:
        inp = position
        if position != "g":
            inp += f"<{quad.pred}>"
        if related in canonical.issued:
            inp += "_:" + canonical.issued[related]
        elif related in issuer.issued:
            inp += "_:" + issuer.issued[related]
        else:
            inp += first[related]
        return _sha256(inp)

    def hash_n_degree(identifier: str, issuer: _Issuer):
        """Spec 4.8 → (hash, issuer)."""
        hn: dict[str, list[str]] = {}
        for quad in by_node[identifier]:
            for pos, comp in (
                ("s", quad.subj),
                ("o", quad.obj if quad.obj_kind != "literal" else None),
                ("g", quad.graph),
            ):
                if _is_bnode(comp) and comp != identifier:
                    hn.setdefault(
                        hash_related(comp, quad, issuer, pos), []
                    ).append(comp)
        data = ""
        for related_hash in sorted(hn):
            data += related_hash
            chosen_path = ""
            chosen_issuer = None
            for perm in permutations(sorted(set(hn[related_hash]))):
                issuer_copy = issuer.copy()
                path = ""
                recursion: list[str] = []
                abandoned = False
                for related in perm:
                    if related in canonical.issued:
                        path += "_:" + canonical.issued[related]
                    else:
                        if related not in issuer_copy.issued:
                            recursion.append(related)
                        path += "_:" + issuer_copy.issue(related)
                    if chosen_path and len(path) >= len(chosen_path) \
                            and path > chosen_path:
                        abandoned = True
                        break
                if abandoned:
                    continue
                for related in recursion:
                    rhash, rissuer = hash_n_degree(related, issuer_copy)
                    path += "_:" + issuer_copy.issue(related)
                    path += f"<{rhash}>"
                    issuer_copy = rissuer
                    if chosen_path and len(path) >= len(chosen_path) \
                            and path > chosen_path:
                        abandoned = True
                        break
                if abandoned:
                    continue
                if not chosen_path or path < chosen_path:
                    chosen_path = path
                    chosen_issuer = issuer_copy
            data += chosen_path
            issuer = chosen_issuer if chosen_issuer is not None else issuer
        return _sha256(data), issuer

    for h in sorted(groups):
        nodes = [n for n in groups[h] if n not in canonical.issued]
        if not nodes:
            continue
        if len(nodes) > max_degree_nodes:
            raise ValueError(
                f"automorphic bnode group of {len(nodes)} exceeds "
                f"max_degree_nodes={max_degree_nodes}"
            )
        results = []
        for n in sorted(nodes):
            temp = _Issuer("b")
            temp.issue(n)
            results.append(hash_n_degree(n, temp))
        for _rhash, rissuer in sorted(results, key=lambda r: r[0]):
            for existing in rissuer.order:
                canonical.issue(existing)

    return {n: "_:" + canonical.issued[n] for n in by_node}


def canonicalize(
    quads: list[Triple], max_degree_nodes: int = 8
) -> list[Triple]:
    """Relabel every bnode to its canonical ``_:c14n{i}`` identifier."""
    labels = canonical_labels(quads, max_degree_nodes)

    def rl(t):
        return labels.get(t, t) if t is not None else None

    return [
        Triple(
            rl(q.subj),
            q.pred,
            rl(q.obj) if q.obj_kind != "literal" else q.obj,
            q.obj_kind,
            q.lang,
            q.dtype,
            rl(q.graph),
        )
        for q in quads
    ]


def canonical_nquads(
    quads: list[Triple], max_degree_nodes: int = 8
) -> str:
    """Canonical N-Quads document: relabel, serialize, sort, join —
    byte-identical for isomorphic inputs (the signable form)."""
    return "".join(
        sorted(
            _nquad(q, lambda b: b)
            for q in canonicalize(quads, max_degree_nodes)
        )
    )
