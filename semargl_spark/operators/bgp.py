"""Distributed basic-graph-pattern (BGP) matching over a triple table.

SPARQL-style conjunctive SELECT, compiled to a Catalyst join tree: each
triple pattern ``(s, p, o)`` — constants and ``?var`` terms — becomes a
filtered scan of the triples DataFrame with its variable positions
projected out, and patterns are folded together with equi-joins on their
shared variables. Everything stays declarative, so Catalyst gets filter
pushdown (constant positions reach the parquet scan as PushedFilters),
join reordering, and AQE sizing for free.

Join-order: greedy-connected over a cost estimate (:func:`join_order`)
— start from the cheapest pattern, then repeatedly join the cheapest
pattern that SHARES a variable with the patterns already joined
(declaration order as tie-break). With :func:`predicate_counts`
statistics the estimate is the constant predicate's true edge count;
without, it degrades to most-constants-first. Deterministic, starts
from the smallest intermediate result, and never introduces a Cartesian
intermediate for a connected query. Patterns in a genuinely
disconnected group fall back to a crossJoin (legal SPARQL, flagged here
because at scale a Cartesian BGP is almost always a query bug).

The driver-side ASK evaluator (functions/ask.py) covers the conformance
suite's one-document queries; this module is the cluster-scale
counterpart for querying the materialized KG itself. The reference has
no query engine (it delegates to Sesame in tests,
rdfa/src/test/java/org/semarglproject/rdf/rdfa/RdfaTestSuiteHelper.java:82-108);
this is target-side surface beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("s", "p", "o", "g")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def predicate_counts(
    triples: DataFrame, p_col: str = "pred"
) -> dict[str, int]:
    """Per-predicate edge counts — the one statistic that matters for
    BGP join ordering (RDF predicates are a small closed set even at
    10^12 edges, so this collect is vocabulary-sized, not data-sized).
    Compute once per materialized KG snapshot and reuse across queries."""
    from pyspark.sql import functions as F

    return {
        r[0]: r[1]
        for r in triples.groupBy(p_col).agg(F.count("*")).collect()
        if r[0] is not None
    }


def join_order(
    patterns: list[tuple[str, ...]],
    pred_stats: dict[str, int] | None = None,
    total: int | None = None,
) -> list[int]:
    """Deterministic greedy-connected join order over pattern indices.

    Cost model: a pattern's scan estimate is the predicate's edge count
    when the predicate is constant and statistics are supplied (else the
    table total, else a uniform default), divided by 16 for each further
    constant position (subject/object/graph constants are selective but
    unquantified). Without statistics this degrades to the
    most-constants-first heuristic. Ordering: cheapest pattern first,
    then repeatedly the cheapest pattern sharing a variable with the
    bound set (declaration order breaks ties); disconnected patterns are
    deferred until nothing connected remains — a connected query never
    produces a Cartesian intermediate."""
    if total is None:
        total = max(pred_stats.values(), default=1) * 16 if pred_stats else 1 << 40

    def est(pat) -> float:
        n_const = sum(0 if _is_var(t) else 1 for t in pat)
        if pred_stats is not None and len(pat) >= 2 and not _is_var(pat[1]):
            base = pred_stats.get(pat[1], 0)  # absent predicate → empty scan
            other_consts = n_const - 1
        else:
            base = total
            other_consts = n_const
        return base / (16 ** other_consts)

    def pat_vars(pat):
        return {t[1:] for t in pat if _is_var(t)}

    remaining = sorted(range(len(patterns)), key=lambda i: (est(patterns[i]), i))
    order = [remaining.pop(0)]
    bound = pat_vars(patterns[order[0]])
    while remaining:
        i = next(
            (j for j in remaining if pat_vars(patterns[j]) & bound),
            remaining[0],
        )
        remaining.remove(i)
        order.append(i)
        bound |= pat_vars(patterns[i])
    return order


def match_bgp(
    triples: DataFrame,
    patterns: list[tuple[str, ...]],
    s_col: str = "src",
    p_col: str = "pred",
    o_col: str = "dst",
    g_col: str = "graph",
    pred_stats: dict[str, int] | None = None,
) -> DataFrame:
    """Match a conjunctive pattern list against ``triples`` →
    one column per distinct ``?var`` (name without the ``?``).

    ``pred_stats`` (from :func:`predicate_counts`, computed once per KG
    snapshot) switches the join ordering from the most-constants-first
    heuristic to true cardinality estimates — two patterns with one
    constant each can differ by 10^6× in scan size when one predicate
    is rdf:type and the other is a rare relation.

    Patterns are 3-tuples ``(s, p, o)`` or 4-tuples ``(s, p, o, g)``
    whose 4th term matches the ``g_col`` column (SPARQL ``GRAPH`` —
    quad-level matching against a dataset table; the reference's
    QuadSink carries the same 4th term, QuadSink.java:31-51). The input
    is treated as the caller provides it — apply set semantics
    (``.distinct()`` on the quad projection) upstream if RDF dataset
    semantics are wanted.

    Within a single pattern a repeated variable (e.g. ``(?x, p, ?x)``)
    becomes an equality filter; across patterns shared variables become
    join keys. Raises on patterns with no variables (use a filter) and
    on an empty pattern list.
    """
    if not patterns:
        raise ValueError("empty BGP")
    cols = {"s": s_col, "p": p_col, "o": o_col, "g": g_col}

    def scan(pat):
        df = triples
        out = []
        seen: dict[str, str] = {}
        for pos, term in zip(_POS, pat):
            if _is_var(term):
                name = term[1:]
                if name in seen:  # repeated var inside one pattern
                    df = df.filter(F.col(cols[pos]) == F.col(seen[name]))
                else:
                    seen[name] = cols[pos]
                    out.append(F.col(cols[pos]).alias(name))
            else:
                df = df.filter(F.col(cols[pos]) == term)
        if not out:
            raise ValueError(f"pattern {pat} has no variables")
        return df.select(*out), set(seen)

    # greedy-connected join ordering (see join_order): cheapest pattern
    # first, then always a pattern sharing a variable with the bound set
    # — a pure selectivity order would crossJoin on pattern lists like
    # [(?a p ?b), (?c q ?d), (?b r ?c)] where the middle pattern is
    # disconnected *at that point*, and at 10^12 triples an avoidable
    # Cartesian intermediate is the difference between a plan and an
    # outage. crossJoin remains only for genuinely disconnected groups.
    order = join_order(patterns, pred_stats)
    acc, bound = scan(patterns[order[0]])
    for i in order[1:]:
        df, vs = scan(patterns[i])
        shared = sorted(bound & vs)
        if shared:
            acc = acc.join(df, on=shared)
        else:
            acc = acc.crossJoin(df)
        bound |= vs
    return acc.select(*sorted(bound))


def match_bgp_filter(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    filters: list[str],
    s_col: str = "src",
    p_col: str = "pred",
    o_col: str = "dst",
    pred_stats: dict[str, int] | None = None,
) -> DataFrame:
    """SPARQL ``FILTER``: boolean SQL expressions over the bound
    variables (bare names, no ``?``), applied to the BGP result.

    Declarative on purpose: each filter becomes a Catalyst predicate,
    so a filter on a single-pattern variable is pushed below the join
    tree all the way into the pattern's scan (verified by the plan
    audit) — exactly what a SPARQL engine's FILTER placement
    optimization does, for free. Filters referencing unbound variables
    raise (SPARQL would silently evaluate them to an error/False; at
    10^12 triples a typo'd variable must not silently drop every row).
    """
    out = match_bgp(triples, patterns, s_col, p_col, o_col, pred_stats=pred_stats)
    return apply_filters(out, filters)


def apply_filters(out: DataFrame, filters: list[str]) -> DataFrame:
    """Apply boolean SQL expressions over bound-variable columns, with
    the unbound-reference check from :func:`match_bgp_filter`."""
    import re as _re

    bound = set(out.columns)
    for flt in filters:
        # identifiers in the expression that aren't SQL keywords/functions;
        # string literals are stripped first so 'abc' never reads as a
        # variable reference
        bare = _re.sub(r"'(?:[^'\\]|\\.)*'", "''", flt)
        names = set(_re.findall(r"\b[a-zA-Z_]\w*\b(?!\s*\()", bare))
        unknown = {
            n for n in names
            if n.lower() not in _SQL_WORDS and n not in bound
        }
        if unknown:
            raise ValueError(f"FILTER {flt!r} references unbound variables {sorted(unknown)}")
        out = out.filter(F.expr(flt))
    return out


_SQL_WORDS = {
    "and", "or", "not", "is", "null", "true", "false", "in", "like",
    "rlike", "between", "case", "when", "then", "else", "end", "cast",
    "as", "int", "bigint", "double", "string", "distinct",
}


def match_bgp_agg(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    group_vars: list[str],
    aggs: dict[str, str],
    s_col: str = "src",
    p_col: str = "pred",
    o_col: str = "dst",
    filters: list[str] | None = None,
) -> DataFrame:
    """SPARQL ``GROUP BY`` + aggregates over the BGP solution multiset:
    ``group_vars`` are bound variable names (no ``?``), ``aggs`` maps
    output column → SQL aggregate expression over bound variables
    (``{"n": "count(*)", "n_src": "count(distinct a)"}``).

    ``filters`` apply BEFORE the aggregation (SPARQL FILTER scopes to
    the group pattern, not the aggregated result — that is HAVING);
    Catalyst pushes them below the join tree into the scans.

    Declarative: the BGP join tree feeds one hash aggregation, so
    Catalyst runs map-side partial aggregation before the group-key
    shuffle — at 10^12 triples the shuffle carries only the partial
    states, not the solution multiset. Unbound group variables or
    aggregate expressions referencing unknown names raise (same
    typo-must-not-silently-drop stance as FILTER).
    """
    import re as _re

    if not aggs:
        raise ValueError("empty aggregate list")
    out = match_bgp(triples, patterns, s_col, p_col, o_col)
    if filters:
        out = apply_filters(out, filters)
    bound = set(out.columns)
    missing = [v for v in group_vars if v not in bound]
    if missing:
        raise ValueError(f"GROUP BY references unbound variables {missing}")
    for name, expr in aggs.items():
        names = set(_re.findall(r"\b[a-zA-Z_]\w*\b(?!\s*\()", expr))
        unknown = {
            n for n in names if n.lower() not in _SQL_WORDS and n not in bound
        }
        if unknown:
            raise ValueError(
                f"aggregate {expr!r} references unbound variables {sorted(unknown)}"
            )
    cols = [F.expr(expr).alias(name) for name, expr in aggs.items()]
    return out.groupBy(*group_vars).agg(*cols)


def construct(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    s_col: str = "src",
    p_col: str = "pred",
    o_col: str = "dst",
    filters: list[str] | None = None,
) -> DataFrame:
    """SPARQL ``CONSTRUCT``: evaluate the WHERE BGP, then instantiate
    every template triple per solution → a derived graph as (src, pred,
    dst) rows with set semantics (CONSTRUCT emits a graph, so duplicate
    instantiations collapse — one ``distinct``).

    Template terms are ``?var`` (must be bound by the BGP — an unbound
    template variable raises rather than silently dropping the triple,
    the same stance as FILTER) or constants. Plan shape: the one BGP
    join tree fans out through an N-way shuffle-free Union of
    projections, then a single distinct keyed on the full triple — the
    only added shuffle, carrying exactly the output graph.
    """
    if not template:
        raise ValueError("empty CONSTRUCT template")
    sol = (
        match_bgp_filter(triples, patterns, filters, s_col, p_col, o_col)
        if filters
        else match_bgp(triples, patterns, s_col, p_col, o_col)
    )
    bound = set(sol.columns)
    for pat in template:
        for term in pat:
            if _is_var(term) and term[1:] not in bound:
                raise ValueError(
                    f"CONSTRUCT template {pat} references unbound variable {term}"
                )

    def inst(term: str, alias: str):
        col = F.col(term[1:]) if _is_var(term) else F.lit(term)
        return col.alias(alias)

    parts = [
        sol.select(inst(s, "src"), inst(p, "pred"), inst(o, "dst"))
        for s, p, o in template
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.distinct()


def match_bgp_optional(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    optionals: list[list[tuple[str, str, str]]],
    s_col: str = "src",
    p_col: str = "pred",
    o_col: str = "dst",
    group_filters: list[list[str]] | None = None,
) -> DataFrame:
    """SPARQL ``OPTIONAL``: the required BGP left-joined with each
    optional pattern group on their shared variables; variables bound
    only in a non-matching optional come back NULL.

    Each optional group is itself a full BGP (so multi-pattern
    OPTIONALs keep their internal joins), evaluated bottom-up exactly
    like SPARQL's algebra ``LeftJoin(required, group)``. An optional
    sharing no variable with the required part is a SPARQL-legal
    Cartesian extension; Spark expresses that as a left crossJoin-like
    full pairing only when rows exist — we instead raise, because at
    10^12 triples a disconnected OPTIONAL is invariably a query bug.
    Plan: each group is an equi-left-join Catalyst can reorder/broadcast.

    ``group_filters[i]`` (SQL boolean expressions) scope to optional
    group i, applied to the group's solutions BEFORE its left join —
    equivalent to SPARQL's ``LeftJoin(Ω1, Ω2, expr)`` whenever the
    expression references only group variables (a required-side row
    whose every candidate fails the filter keeps its NULL padding,
    exactly the algebra's fallback), and cheaper: the filter prunes
    the group BEFORE the join shuffle instead of riding the join
    condition. Expressions over variables the group does not bind
    raise (that form needs the filter inside the join condition, out
    of this subset)."""
    acc = match_bgp(triples, patterns, s_col, p_col, o_col)
    for i, group in enumerate(optionals):
        opt = match_bgp(triples, group, s_col, p_col, o_col)
        for expr in (group_filters[i] if group_filters else []):
            import re as _re

            bare = _re.sub(r"'(?:[^'\\]|\\.)*'", "''", expr)
            names = set(_re.findall(r"\b[a-zA-Z_]\w*\b(?!\s*\()", bare))
            unknown = {
                n for n in names
                if n.lower() not in _SQL_WORDS and n not in opt.columns
            }
            if unknown:
                raise ValueError(
                    f"OPTIONAL-group filter {expr!r} references variables "
                    f"{sorted(unknown)} the group does not bind"
                )
            opt = opt.filter(F.expr(expr))
        shared = sorted(set(acc.columns) & set(opt.columns))
        if not shared:
            raise ValueError(f"OPTIONAL group {group} shares no variable with the required BGP")
        acc = acc.join(opt, on=shared, how="left")
    return acc.select(*sorted(acc.columns))


def match_bgp_union(
    triples: DataFrame,
    branches: list[list[tuple[str, str, str]]],
    s_col: str = "src",
    p_col: str = "pred",
    o_col: str = "dst",
) -> DataFrame:
    """SPARQL ``UNION``: evaluate each branch BGP independently and
    concatenate, padding variables unbound in a branch with NULL (bag
    semantics, no dedup — SPARQL UNION is a multiset union).

    Plan: N independent join trees under one Union node — Catalyst
    optimizes each branch separately and the union is shuffle-free.
    """
    if not branches:
        raise ValueError("empty UNION")
    results = [match_bgp(triples, pats, s_col, p_col, o_col) for pats in branches]
    allvars = sorted(set().union(*[set(r.columns) for r in results]))
    padded = [
        r.select(
            *[
                F.col(v) if v in r.columns else F.lit(None).cast("string").alias(v)
                for v in allvars
            ]
        )
        for r in results
    ]
    out = padded[0]
    for r in padded[1:]:
        out = out.unionByName(r)
    return out


def match_bgp_minus(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    minus: list[tuple[str, str, str]],
    s_col: str = "src",
    p_col: str = "pred",
    o_col: str = "dst",
) -> DataFrame:
    """SPARQL ``MINUS``: drop solutions of ``patterns`` that agree with
    some solution of ``minus`` on their SHARED variables.

    SPARQL-faithful corner: when the two groups share no variable,
    MINUS removes nothing (every pair of solutions is trivially
    compatible-on-∅, and the spec keeps the left row). We raise instead
    of silently returning the input — at 10^12 triples a disjoint MINUS
    is a query bug, not a no-op the user intended. ``FILTER NOT
    EXISTS`` (which WOULD empty the result there) can be expressed as a
    filter once a correlated need arises.

    Plan: the minus group is projected onto the shared variables,
    deduplicated (a map-side-partial hash agg), then removed with ONE
    left-anti hash join — never a per-row subquery. AQE broadcasts the
    minus side when it is small, which is the common SPARQL case
    (a selective exclusion set).
    """
    left = match_bgp(triples, patterns, s_col, p_col, o_col)
    right = match_bgp(triples, minus, s_col, p_col, o_col)
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        raise ValueError(
            "MINUS group shares no variables with the BGP — SPARQL "
            "semantics would remove nothing; restate the query"
        )
    return left.join(right.select(*shared).distinct(), on=shared, how="left_anti")


def match_bgp_exists(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    exists: list[list[tuple[str, str, str]]] | None = None,
    not_exists: list[list[tuple[str, str, str]]] | None = None,
    s_col: str = "src",
    p_col: str = "pred",
    o_col: str = "dst",
) -> DataFrame:
    """SPARQL ``FILTER EXISTS { ... }`` / ``FILTER NOT EXISTS { ... }``:
    keep (drop) solutions of ``patterns`` for which the sub-group has at
    least one solution compatible on the SHARED variables.

    Each group must share ≥1 variable with the outer BGP — a
    disconnected EXISTS is a constant (the whole result or nothing),
    which at 10^12 triples is a query bug; we raise instead of silently
    keeping/dropping everything.

    Plan: one LEFT-SEMI (EXISTS) or LEFT-ANTI (NOT EXISTS) hash join
    per group, keyed on the shared variables — never a per-row
    subquery, and the sub-group's non-shared variables are projected
    away before the join so the probe side stays narrow. AQE broadcasts
    a small sub-group result, the common case (a selective existence
    test)."""
    out = match_bgp(triples, patterns, s_col, p_col, o_col)
    for groups, how, kw in ((exists, "leftsemi", "EXISTS"),
                            (not_exists, "leftanti", "NOT EXISTS")):
        for pats in groups or []:
            sub = match_bgp(triples, pats, s_col, p_col, o_col)
            shared = sorted(set(out.columns) & set(sub.columns))
            if not shared:
                raise ValueError(
                    f"{kw} group shares no variables with the BGP — the "
                    "condition is row-independent; restate the query"
                )
            out = out.join(sub.select(*shared), on=shared, how=how)
    return out


def match_bgp_topk(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    order_by: list[tuple[str, str]],
    k: int,
    s_col: str = "src",
    p_col: str = "pred",
    o_col: str = "dst",
) -> DataFrame:
    """SPARQL ``ORDER BY ... LIMIT k`` over a BGP → deterministic top-k.

    ``order_by`` is [(var, 'asc'|'desc'), ...]. Every bound variable not
    named is appended ascending as a tie-break, so the returned SET is
    total-order deterministic at any parallelism (SPARQL leaves ties
    implementation-defined; a reproducible pipeline cannot).

    Plan: Spark compiles ``orderBy().limit(k)`` to TakeOrderedAndProject
    — each task keeps a k-row heap and the driver merges P·k rows; no
    global sort, no full-result shuffle. That is THE top-k plan to want
    at 10^12 rows (k ≪ |result|); a ``row_number() OVER (ORDER BY ...)``
    filter would funnel everything through one partition instead.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out = match_bgp(triples, patterns, s_col, p_col, o_col)
    bound = set(out.columns)
    keys = []
    named = set()
    for var, direction in order_by:
        if var not in bound:
            raise ValueError(f"ORDER BY references unbound variable {var!r}")
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        keys.append(F.col(var).asc() if direction == "asc" else F.col(var).desc())
        named.add(var)
    keys.extend(F.col(v).asc() for v in sorted(bound - named))
    return out.orderBy(*keys).limit(k)
