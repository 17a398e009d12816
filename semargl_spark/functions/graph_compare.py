"""Graph-model comparison: set equality modulo blank-node isomorphism.

The reference's conformance oracle compares parsed output and golden
files *as models* — sets of statements with blank-node bijection
(`ModelUtil.equals` via SesameTestHelper.areModelsEqual,
/root/reference/core/src/test/java/org/semarglproject/test/
SesameTestHelper.java:188-196). This module reimplements that check:
ground statements must match exactly; bnode-containing statements must
admit a label bijection, found by backtracking over signature-pruned
candidates (conformance graphs are small, so worst cases stay cheap).
"""

from __future__ import annotations

from collections import defaultdict

from ..kernels.model import Triple

_B = "\x00B\x00"  # bnode placeholder inside signatures

_XSD = "http://www.w3.org/2001/XMLSchema#"
_INTEGER_TYPES = {
    _XSD + t
    for t in (
        "integer", "long", "int", "short", "byte", "nonNegativeInteger",
        "nonPositiveInteger", "negativeInteger", "positiveInteger",
        "unsignedLong", "unsignedInt", "unsignedShort", "unsignedByte",
    )
}


def normalize_literal(value: str, dtype: str | None) -> str:
    """Canonicalize known XSD datatypes the way the reference's oracle
    does (Sesame NORMALIZE_DATATYPE_VALUES, SesameTestHelper.java:131-134)
    so lexically-different-but-equal literals compare equal."""
    if dtype is None or not value:
        return value
    try:
        if dtype in _INTEGER_TYPES:
            v = value.strip()
            sign = "-" if v.startswith("-") else ""
            digits = v.lstrip("+-").lstrip("0") or "0"
            return ("-" if sign and digits != "0" else "") + digits
        if dtype in (_XSD + "double", _XSD + "float"):
            import math

            f = float(value)
            if math.isinf(f):
                return "INF" if f > 0 else "-INF"
            if math.isnan(f):
                return "NaN"
            # 17 significant digits round-trip IEEE doubles losslessly;
            # fewer would collide distinct values to one canonical form
            mantissa, exp = f"{f:1.16E}".split("E")
            mantissa = mantissa.rstrip("0")
            if mantissa.endswith("."):
                mantissa += "0"
            return f"{mantissa}E{int(exp)}"
        if dtype == _XSD + "decimal":
            v = value.strip().lstrip("+")
            sign = "-" if v.startswith("-") else ""
            v = v.lstrip("-")
            if "." not in v:
                v += ".0"
            intpart, frac = v.split(".", 1)
            intpart = intpart.lstrip("0") or "0"
            frac = frac.rstrip("0") or "0"
            return f"{sign}{intpart}.{frac}"
        if dtype == _XSD + "boolean":
            v = value.strip()
            return {"1": "true", "0": "false"}.get(v, v)
    except (ValueError, ArithmeticError):
        return value
    return value


def _rows(triples) -> list[tuple]:
    out = []
    for t in triples:
        obj = normalize_literal(t.obj, t.dtype) if t.obj_kind == "literal" else t.obj
        out.append((t.subj, t.pred, obj, t.obj_kind, t.lang or "", t.dtype or "", t.graph or ""))
    return out


def _is_bnode(term: str) -> bool:
    return isinstance(term, str) and term.startswith("_:")


def _split_rows(rows):
    ground, bnoded = [], []
    for r in rows:
        subj, pred, obj, kind, lang, dtype, graph = r
        if (_is_bnode(subj) or kind == "bnode" or _is_bnode(graph)
                or _is_bnode(pred) or _is_bnode(dtype)):
            bnoded.append(r)
        else:
            ground.append(r)
    return ground, bnoded


def _signature(row):
    subj, pred, obj, kind, lang, dtype, graph = row
    return (
        _B if _is_bnode(subj) else subj,
        _B if _is_bnode(pred) else pred,
        _B if kind == "bnode" else obj,
        kind,
        lang,
        _B if _is_bnode(dtype) else dtype,
        _B if _is_bnode(graph) else graph,
    )


def _row_bnodes(row):
    subj, pred, obj, kind, lang, dtype, graph = row
    out = []
    if _is_bnode(subj):
        out.append(subj)
    if _is_bnode(pred):
        out.append(pred)
    if kind == "bnode":
        out.append(obj)
    if _is_bnode(dtype):
        out.append(dtype)
    if _is_bnode(graph):
        out.append(graph)
    return out


def isomorphic(a, b) -> bool:
    """True iff the two statement collections are equal as RDF models
    (set semantics, bnode-label bijection)."""
    ra, rb = set(_rows(a)), set(_rows(b))
    ga, ba = _split_rows(ra)
    gb, bb = _split_rows(rb)
    if set(ga) != set(gb):
        return False
    if len(ba) != len(bb):
        return False
    if not ba:
        return True

    # group by structural signature; counts must agree
    sig_a, sig_b = defaultdict(list), defaultdict(list)
    for r in ba:
        sig_a[_signature(r)].append(r)
    for r in bb:
        sig_b[_signature(r)].append(r)
    if set(sig_a) != set(sig_b):
        return False
    if any(len(sig_a[s]) != len(sig_b[s]) for s in sig_a):
        return False

    bnodes_a = sorted({n for r in ba for n in _row_bnodes(r)})
    bnodes_b = sorted({n for r in bb for n in _row_bnodes(r)})
    if len(bnodes_a) != len(bnodes_b):
        return False

    # candidate targets per bnode pruned by per-node signature multiset
    def node_profile(rows, node):
        prof = []
        for r in rows:
            if node in _row_bnodes(r):
                prof.append(_signature(r))
        return tuple(sorted(prof))

    prof_a = {n: node_profile(ba, n) for n in bnodes_a}
    prof_b = {n: node_profile(bb, n) for n in bnodes_b}
    candidates = {
        n: [m for m in bnodes_b if prof_b[m] == prof_a[n]] for n in bnodes_a
    }
    if any(not c for c in candidates.values()):
        return False

    bb_set = set(bb)
    order = sorted(bnodes_a, key=lambda n: len(candidates[n]))

    def substitute(row, mapping):
        subj, pred, obj, kind, lang, dtype, graph = row
        return (
            mapping.get(subj, subj) if _is_bnode(subj) else subj,
            mapping.get(pred, pred) if _is_bnode(pred) else pred,
            mapping.get(obj, obj) if kind == "bnode" else obj,
            kind,
            lang,
            mapping.get(dtype, dtype) if _is_bnode(dtype) else dtype,
            mapping.get(graph, graph) if _is_bnode(graph) else graph,
        )

    def consistent(mapping):
        # rows fully mapped must exist in bb
        for r in ba:
            ns = _row_bnodes(r)
            if all(n in mapping for n in ns):
                if substitute(r, mapping) not in bb_set:
                    return False
        return True

    used: set[str] = set()

    def backtrack(i, mapping):
        if i == len(order):
            return True
        n = order[i]
        for m in candidates[n]:
            if m in used:
                continue
            mapping[n] = m
            used.add(m)
            if consistent(mapping) and backtrack(i + 1, mapping):
                return True
            del mapping[n]
            used.discard(m)
        return False

    return backtrack(0, {})


def diff(a, b):
    """Sorted (a_only, b_only) ground-row diff for failure messages
    (reference analogue: SesameTestHelper.diff:198-212)."""
    ra, rb = set(_rows(a)), set(_rows(b))
    return sorted(ra - rb), sorted(rb - ra)
