"""Transcript-shape analytics over the (conv_id, turn_idx, role, text,
tool, ts) table — the input_hint payload itself, before any RDF
extraction.

Two rollups an agent-transcript corpus owner runs constantly:

* role-transition matrix — who speaks after whom, with total gap
  seconds (dialogue-shape census; a spike in tool→tool transitions
  means runaway agent loops, user→user means dropped assistant turns);
* per-role stats — turn counts, conversation reach, tool-call counts.

Both are pure Catalyst: one window (the same stable (conv_id ⟶
turn_idx) ordering the north rule mandates for text equality) feeding a
tiny-key groupBy for the matrix, one groupBy for the stats. Gap
arithmetic is integer seconds (unix_timestamp difference) so the
oracles are exact.

Scale shape: the window shuffle partitions by conv_id — 10^12 turns
spread over ~10^9 conversations is a uniform key space (no conversation
is a hub at the partitioner level; a single pathological conversation
is bounded by the chunking guard in operators/extract.py). The
follow-up aggregates collapse to ≤ |roles|² rows with map-side
partials.

Reference parity: the reference is a parser framework; transcript-table
analytics are target-side payload surface (axes A+B, transcripts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def turn_transitions(transcripts: DataFrame) -> DataFrame:
    """→ (from_role, to_role, n_transitions, sum_gap_s): the corpus
    role-transition matrix with total inter-turn gap seconds, computed
    with one lag window over the stable turn ordering."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x = transcripts.select(
        "conv_id",
        "turn_idx",
        F.col("role"),
        F.lag("role").over(w).alias("from_role"),
        (
            F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
        ).alias("gap_s"),
    )
    return (
        x.filter(F.col("from_role").isNotNull())
        .groupBy("from_role", F.col("role").alias("to_role"))
        .agg(
            F.count("*").cast("long").alias("n_transitions"),
            F.sum("gap_s").cast("long").alias("sum_gap_s"),
        )
    )


def tool_stats(transcripts: DataFrame) -> DataFrame:
    """→ (tool, n_calls, n_convs, sum_out_bytes, sum_latency_s): per-tool
    usage census over the transcript table's ``tool`` column.

    ``sum_latency_s`` is the summed integer gap between a tool turn's
    timestamp and the immediately preceding turn (the wall the agent
    waited for the tool) — one lag window over the stable ordering, then
    one groupBy on the (small) tool-name key with map-side partials.
    ``sum_out_bytes`` totals the tool output payload (octet_length of
    text). Non-tool turns are filtered AFTER the lag so the preceding
    turn of a tool call is whatever actually preceded it, tool or not.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x = transcripts.select(
        "conv_id",
        "tool",
        F.octet_length("text").cast("long").alias("out_bytes"),
        (
            F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
        ).alias("latency_s"),
    ).filter(F.col("tool").isNotNull())
    return x.groupBy("tool").agg(
        F.count("*").cast("long").alias("n_calls"),
        F.count_distinct("conv_id").cast("long").alias("n_convs"),
        F.sum("out_bytes").cast("long").alias("sum_out_bytes"),
        F.sum("latency_s").cast("long").alias("sum_latency_s"),
    )


def tool_chains(transcripts: DataFrame) -> DataFrame:
    """→ (from_tool, to_tool, n): tool-call bigram counts — which tool
    follows which across each conversation's tool-turn subsequence
    (intervening user/assistant turns are skipped, as in tool-loop
    mining). A conversation's first tool call appears with from_tool
    NULL-filtered out, matching :func:`turn_transitions` semantics.

    Plan: filter to tool turns FIRST (the lag is over the tool
    subsequence), one window, one tiny-key groupBy. At 10^12 turns the
    filter prunes ~2/3 of rows before the window shuffle.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool")
        .withColumn("from_tool", F.lag("tool").over(w))
        .filter(F.col("from_tool").isNotNull())
    )
    return x.groupBy("from_tool", F.col("tool").alias("to_tool")).agg(
        F.count("*").cast("long").alias("n")
    )


def role_stats(transcripts: DataFrame) -> DataFrame:
    """→ (role, n_turns, n_convs, n_tool_turns): per-role reach rollup.
    n_convs is an exact distinct (one extra shuffle on (role, conv_id)
    partials — at 10^12 turns prefer approx_count_distinct unless the
    report feeds a reconciliation check; exactness is what the oracle
    gate needs here)."""
    return transcripts.groupBy("role").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.count_distinct("conv_id").cast("long").alias("n_convs"),
        F.count(F.col("tool")).cast("long").alias("n_tool_turns"),
    )


def response_latency(transcripts: DataFrame) -> DataFrame:
    """→ (conv_id, n_responses, sum_latency_s, max_latency_s): how fast
    the assistant answers — for each assistant turn that immediately
    follows a user turn (in the stable (conv_id, turn_idx) order),
    latency = integer seconds from the user turn's ts.

    The core SLA/health rollup for an agent-transcript corpus; also the
    quality signal RLHF pipelines use to filter degenerate instant or
    stalled responses. One window (the same north-rule ordering every
    conversation query reuses) + one groupBy(conv_id); integer-second
    arithmetic keeps the oracle exact. Conversations with no
    user→assistant adjacency are reported with n_responses = 0 (a
    zero-row vanishing conversation would read as data loss in a
    lineage audit).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_role = F.lag("role").over(w)
    prev_ts = F.lag(F.col("ts").cast("timestamp")).over(w)
    lat = F.when(
        (F.col("role") == "assistant") & (prev_role == "user"),
        F.col("ts").cast("timestamp").cast("long") - prev_ts.cast("long"),
    )
    return (
        transcripts.select("conv_id", lat.alias("lat"))
        .groupBy("conv_id")
        .agg(
            F.count("lat").cast("long").alias("n_responses"),
            F.coalesce(F.sum("lat"), F.lit(0)).cast("long").alias("sum_latency_s"),
            F.max("lat").cast("long").alias("max_latency_s"),
        )
    )


def transcripts_profile(transcripts: DataFrame) -> DataFrame:
    """Data-profiling report over the input table → one row per column:
    (col_name, n_rows, n_null, n_distinct, min_len, max_len).

    The first thing a corpus owner runs on a new 10^12-turn delivery:
    null-rate spikes mean a broken exporter, distinct-count collapse on
    conv_id means a partition got duplicated. One pass, one aggregation
    — every per-column statistic is a conditional expression over the
    same scan (exact distincts per column via count_distinct, which
    Spark executes as expand+partial-agg, not one reducer); the stack
    to long format is a row-local explode of an already-1-row result.
    """
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    present = [c for c in cols if c in transcripts.columns]
    aggs = []
    for c in present:
        s = F.col(c).cast("string")
        aggs.extend([
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.length(s)).alias(f"{c}__minlen"),
            F.max(F.length(s)).alias(f"{c}__maxlen"),
        ])
    one = transcripts.agg(*aggs)
    pairs = []
    for c in present:
        pairs.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__rows").cast("long").alias("n_rows"),
            F.col(f"{c}__null").cast("long").alias("n_null"),
            F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
            F.col(f"{c}__minlen").cast("long").alias("min_len"),
            F.col(f"{c}__maxlen").cast("long").alias("max_len"),
        ))
    return one.select(F.explode(F.array(*pairs)).alias("s")).select("s.*")


def agent_loops(transcripts: DataFrame, min_run: int = 2) -> DataFrame:
    """Stuck-tool-loop detector over agent transcripts →
    (conv_id, n_tool_calls, n_runs, max_run, n_stuck_runs): run-length
    encode each conversation's consecutive tool-call subsequence
    (intervening user/assistant turns are skipped, like
    :func:`tool_chains`) and report the longest same-tool run plus the
    number of runs of at least ``min_run`` repeats — the standard
    degenerate-agent-loop signal used to filter stuck trajectories out
    of training corpora.

    Gaps-and-islands with ONE shuffle: both windows (the lag change
    flag and its running sum) share the (conv_id ⟶ turn_idx) sort, so
    Catalyst plans a single exchange + sort; the two downstream
    aggregations are map-side-partial hash aggs on (conv_id, grp) then
    conv_id. At 10^12 turns the tool filter prunes ~2/3 of rows before
    the only wide stage, and per-conversation ordering is the same
    stable window every transcript operator uses (north_rule).
    Deterministic: integer counts only."""
    if min_run < 2:
        raise ValueError(f"min_run must be >= 2, got {min_run}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool")
        .withColumn(
            "chg",
            F.when(
                F.lag("tool").over(w).isNull()
                | (F.lag("tool").over(w) != F.col("tool")),
                1,
            ).otherwise(0),
        )
        .withColumn("grp", F.sum("chg").over(w))
    )
    runs = x.groupBy("conv_id", "grp").agg(
        F.count("*").cast("long").alias("run_len")
    )
    return runs.groupBy("conv_id").agg(
        F.sum("run_len").cast("long").alias("n_tool_calls"),
        F.count("*").cast("long").alias("n_runs"),
        F.max("run_len").cast("long").alias("max_run"),
        F.sum(
            F.when(F.col("run_len") >= min_run, 1).otherwise(0)
        ).cast("long").alias("n_stuck_runs"),
    )


def topic_shifts(
    transcripts: DataFrame, boundary_permille: int = 100
) -> DataFrame:
    """Intra-conversation topic-shift detection → (conv_id, turn_idx,
    jaccard_pm, is_shift): the exact integer per-mille Jaccard between
    each turn's distinct word set and its predecessor's under the
    stable (conv_id, turn_idx) ordering; a turn opens a new topic
    segment when overlap falls below ``boundary_permille`` — the
    classic lexical-cohesion segmenter (TextTiling, Hearst 1997)
    reduced to its exactly-replayable core: set Jaccard instead of
    cosine over smoothed term vectors, so the external gate recomputes
    it bit-for-bit.

    Shape: one lag window over the per-conversation ordering (the same
    window every turn-ordering query already shuffles by — at 10^12
    turns this is the partitioning the table is stored under), then
    row-local array intersect/union; no joins, no Python. First turns
    have NULL jaccard_pm and is_shift=0 (nothing to compare against);
    two empty turns count as identical (1000), not a shift.
    """
    words = F.array_distinct(
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda x: x != "",
        )
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x = transcripts.select(
        "conv_id",
        "turn_idx",
        words.alias("ws"),
        F.lag(words).over(w).alias("prev"),
    ).select(
        "conv_id",
        "turn_idx",
        F.col("prev").isNull().alias("first"),
        F.size(F.array_intersect("ws", "prev")).cast("long").alias("i"),
        F.size(F.array_union("ws", "prev")).cast("long").alias("u"),
    )
    jac = F.when(F.col("first"), F.lit(None).cast("long")).otherwise(
        F.when(F.col("u") == 0, F.lit(1000)).otherwise(
            F.expr("(i * 1000) div u")
        ).cast("long")
    )
    return x.select(
        "conv_id",
        "turn_idx",
        jac.alias("jaccard_pm"),
        F.when(F.col("first"), F.lit(0))
        .when(jac < boundary_permille, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_shift"),
    )


def chat_render(
    transcripts: DataFrame,
    mask_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Chat-template rendering with loss-mask spans → (conv_id,
    rendered, n_chars, n_mask, mask_spans): each conversation becomes
    ONE training document under the fixed template

        ``<|{role}|>\\n{text}\\n<|end|>\\n``   (one block per turn)

    concatenated in the stable (conv_id, turn_idx) ordering, plus the
    character spans a supervised-finetuning loss should actually train
    on — the text body (template tokens and non-``mask_roles`` turns
    excluded).  ``mask_spans`` is ``;``-joined ``start-end`` pairs
    (0-based, end-exclusive, turn order), chosen over an array column
    so the external gate hashes a flat string.

    This is the canonical transcripts→pretraining-text exit of the
    pipeline: downstream packing (curation.pack_sequences) and
    context-window chunking (curation.context_windows) consume the
    rendered column; span offsets survive both because they are
    relative to the rendered document.

    Shape: ONE hash aggregation keyed by conv_id (map-side partials,
    the same key the table is stored under at 10^12 turns — no window
    sort): collect_list → array_sort restores turn order inside the
    row, rendering is a linear JVM array_join over the sorted blocks,
    and offsets come from a single F.aggregate fold that carries only
    (running char offset, span list) — never a quadratic running
    string.  A pathological conversation is bounded by the same
    chunking guard as extract.reassemble_conversations; spans stay
    correct under chunking because each chunk re-renders from offset 0.
    """
    roles = [str(r) for r in mask_roles]
    items = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("turn_idx").alias("i"),
                F.col("role").alias("r"),
                F.col("text").alias("x"),
            )
        )
    )
    block = lambda t: F.concat(  # noqa: E731 — inline template
        F.lit("<|"), t["r"], F.lit("|>\n"), t["x"], F.lit("\n<|end|>\n")
    )
    # per-block char accounting: header "<|"+role+"|>\n" = len(role)+5,
    # trailer "\n<|end|>\n" = 9  →  block = len(role)+len(text)+14
    spans = F.aggregate(
        F.col("_items"),
        F.struct(
            F.lit(0).cast("long").alias("off"),
            F.expr("cast(array() as array<string>)").alias("sp"),
        ),
        lambda acc, t: F.struct(
            (acc["off"] + F.length(t["r"]) + F.length(t["x"]) + 14).alias(
                "off"
            ),
            F.when(
                t["r"].isin(roles),
                F.concat(
                    acc["sp"],
                    F.array(
                        F.concat_ws(
                            "-",
                            (acc["off"] + F.length(t["r"]) + 5).cast(
                                "string"
                            ),
                            (
                                acc["off"]
                                + F.length(t["r"])
                                + 5
                                + F.length(t["x"])
                            ).cast("string"),
                        )
                    ),
                ),
            )
            .otherwise(acc["sp"])
            .alias("sp"),
        ),
        lambda acc: acc["sp"],
    )
    return (
        transcripts.groupBy("conv_id")
        .agg(items.alias("_items"))
        .select(
            "conv_id",
            F.array_join(F.transform(F.col("_items"), block), "").alias(
                "rendered"
            ),
            F.aggregate(
                F.col("_items"),
                F.lit(0).cast("long"),
                lambda a, t: a + F.length(t["r"]) + F.length(t["x"]) + 14,
            ).alias("n_chars"),
            F.size(
                F.filter(F.col("_items"), lambda t: t["r"].isin(roles))
            )
            .cast("int")
            .alias("n_mask"),
            spans.alias("_sp"),
        )
        .select(
            "conv_id",
            "rendered",
            "n_chars",
            "n_mask",
            F.array_join(F.col("_sp"), ";").alias("mask_spans"),
        )
    )


_KNOWN_ROLES = ("user", "assistant", "tool", "system")


def validate_transcripts(
    transcripts: DataFrame,
    roles: tuple[str, ...] = _KNOWN_ROLES,
) -> DataFrame:
    """Input-contract validation of the transcripts table → violation
    rows (conv_id, turn_idx, check, detail): the schema-on-read gate a
    10^12-turn ingest runs BEFORE extraction, because every downstream
    stage assumes the (conv_id, turn_idx) contract the north rule
    states. Emitted checks:

    * ``null_text``   — text NULL or empty after trim;
    * ``dup_turn``    — (conv_id, turn_idx) appears more than once;
    * ``turn_gap``    — ordering breaks: first turn_idx ≠ 0, or a turn
      doesn't follow its predecessor by exactly 1 (detail carries the
      expected index);
    * ``bad_role``    — role outside the known vocabulary (NULL
      included);
    * ``ts_regress``  — ts earlier than the previous turn's ts.

    Conforming rows emit nothing — violations only, like
    validate_shapes. Shape: ONE (conv_id ⟶ turn_idx) window exchange
    shared by the lag/dup checks (the same partitioning the table is
    stored under), row-local predicates, a shuffle-free union of the
    violation projections. Every check is exactly replayable.
    """
    from pyspark.sql.window import Window

    # ts as a secondary sort key: duplicate turn_idx rows (the very
    # thing dup_turn flags) would otherwise make lag(ts) depend on the
    # arbitrary tie order; identical full duplicates remain
    # indistinguishable (and emit identical rows either way)
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    wd = Window.partitionBy("conv_id", "turn_idx")
    x = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "ts",
        F.lag("turn_idx").over(w).alias("_prev_i"),
        F.lag("ts").over(w).alias("_prev_ts"),
        F.count("*").over(wd).alias("_n_dup"),
    )

    def v(cond, check, detail):
        return x.filter(cond).select(
            "conv_id",
            "turn_idx",
            F.lit(check).alias("check"),
            detail.cast("string").alias("detail"),
        )

    null_text = v(
        F.col("text").isNull() | (F.length(F.trim("text")) == 0),
        "null_text",
        F.lit("empty"),
    )
    dup = v(
        F.col("_n_dup") > 1, "dup_turn", F.concat(F.lit("n="), "_n_dup")
    )
    gap = v(
        F.when(F.col("_prev_i").isNull(), F.col("turn_idx") != 0).otherwise(
            F.col("turn_idx") != F.col("_prev_i") + 1
        ),
        "turn_gap",
        F.concat(
            F.lit("expected="),
            F.coalesce(F.col("_prev_i") + 1, F.lit(0)).cast("string"),
        ),
    )
    bad_role = v(
        F.col("role").isNull() | ~F.col("role").isin(list(roles)),
        "bad_role",
        F.coalesce(F.col("role"), F.lit("NULL")),
    )
    ts_regress = v(
        F.col("_prev_ts").isNotNull() & (F.col("ts") < F.col("_prev_ts")),
        "ts_regress",
        F.lit("ts<prev"),
    )
    return (
        null_text.unionByName(dup)
        .unionByName(gap)
        .unionByName(bad_role)
        .unionByName(ts_regress)
    )


def instruction_pairs(transcripts: DataFrame) -> DataFrame:
    """SFT pair mining → (conv_id, turn_idx, instruction, response):
    every assistant turn that immediately follows a user turn in the
    stable ordering becomes one (instruction, response) training pair
    — the single-turn extraction complementing chat_render's
    whole-conversation exit (multi-turn context lives there; this is
    the classic instruction-tuning table). One lag window over the
    same (conv_id ⟶ turn_idx) exchange every turn query shuffles by;
    row-local filter, no joins.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.lag("role").over(w).alias("_pr"),
        F.lag("text").over(w).alias("_pt"),
    )
    return x.filter(
        (F.col("role") == "assistant") & (F.col("_pr") == "user")
    ).select(
        "conv_id",
        "turn_idx",
        F.col("_pt").alias("instruction"),
        F.col("text").alias("response"),
    )


def turn_edit_sim(
    transcripts: DataFrame, role: str = "assistant", near_pm: int = 250
) -> DataFrame:
    """Consecutive same-role turn similarity via Levenshtein distance —
    the regeneration / self-repair signal: an agent retrying a response
    leaves two adjacent assistant turns that are near-copies, and a
    training pipeline wants to keep only the final attempt.

    → (conv_id, turn_idx, prev_turn_idx, edit_dist, max_len, dist_pm,
    is_near): one row per consecutive pair of ``role`` turns within a
    conversation, with the normalized distance in integer permil
    (``1000·dist div max_len`` — engine-exact, no float drift) and the
    near-duplicate verdict at ``near_pm``.

    Scale shape: filter-then-lag (the role filter prunes ~2/3 of rows
    BEFORE the window shuffle, same discipline as tool_chains); one
    per-conversation window over the stable (conv_id ⟶ turn_idx)
    ordering every turn query already shuffles by; Levenshtein is a
    JVM codegen expression (O(len²) per pair, but row-local — no join,
    no Python). Pathologically long turns should be length-capped
    upstream like every text operator here.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x = (
        transcripts.filter(F.col("role") == role)
        .select(
            "conv_id",
            "turn_idx",
            "text",
            F.lag("turn_idx").over(w).alias("prev_turn_idx"),
            F.lag("text").over(w).alias("prev_text"),
        )
        .filter(F.col("prev_turn_idx").isNotNull())
    )
    return x.select(
        "conv_id",
        "turn_idx",
        "prev_turn_idx",
        F.levenshtein("text", "prev_text").cast("int").alias("edit_dist"),
        F.greatest(F.length("text"), F.length("prev_text"))
        .cast("int")
        .alias("max_len"),
    ).selectExpr(
        "conv_id",
        "turn_idx",
        "prev_turn_idx",
        "edit_dist",
        "max_len",
        "CAST(1000 * edit_dist div greatest(max_len, 1) AS BIGINT) AS dist_pm",
        f"1000 * edit_dist div greatest(max_len, 1) <= {int(near_pm)} AS is_near",
    )


def tool_arg_validate(
    transcripts: DataFrame, required: dict[str, list[str]]
) -> DataFrame:
    """Tool-call argument QA over agent transcripts: each tool turn's
    ``text`` is expected to carry a JSON argument object; ``required``
    maps tool name → required argument keys. Emits one row per tool
    turn with the missing keys and a validity verdict — the trajectory
    filter that catches malformed tool calls before SFT export.

    → (conv_id, turn_idx, tool, is_json, missing_keys, ok):
    ``missing_keys`` is sorted; a non-JSON body reports all required
    keys missing and ``is_json`` false; tools absent from ``required``
    validate trivially (empty requirement). A required key counts as
    PRESENT when it is a member of the top-level object even with an
    explicit JSON ``null`` value — presence is probed with
    ``json_object_keys`` membership, not ``get_json_object`` null-ness
    (which cannot tell ``{"path": null}`` from an absent key).

    Scale shape: row-local JSON probes (``json_object_keys`` once per
    row — JVM-side Jackson, no Python); the requirement dict is a
    constant folded into the plan (broadcast semantics). No shuffle.
    """
    rows = transcripts.filter(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool", "text"
    )
    # valid-object probe: the whole body parses as a JSON object
    is_json = F.get_json_object(F.col("text"), "$").isNotNull() & F.col(
        "text"
    ).rlike(r"^\s*\{")
    obj_keys = F.json_object_keys(F.col("text"))
    missing = F.array().cast("array<string>")
    for tool, keys in sorted(required.items()):
        tool_missing = F.array_compact(
            F.array(
                *[
                    F.when(
                        ~F.array_contains(obj_keys, k),
                        F.lit(k),
                    )
                    for k in sorted(keys)
                ]
            )
        ) if keys else F.array().cast("array<string>")
        all_keys = F.array(*[F.lit(k) for k in sorted(keys)])
        missing = F.when(
            F.col("tool") == tool,
            F.when(is_json, tool_missing).otherwise(all_keys),
        ).otherwise(missing)
    return rows.select(
        "conv_id",
        "turn_idx",
        "tool",
        is_json.alias("is_json"),
        missing.alias("missing_keys"),
        (F.size(missing) == 0).alias("ok"),
    )


def dedup_regenerations(
    transcripts: DataFrame, role: str = "assistant", near_pm: int = 250
) -> DataFrame:
    """Drop superseded regeneration attempts: when consecutive
    same-role turns are near-copies (:func:`turn_edit_sim` permil ≤
    ``near_pm``), the EARLIER twin is removed and the final attempt
    survives — chains of retries collapse to their last member, since
    every earlier link is the ``prev`` of some near pair. All other
    turns (and all other roles) pass through untouched.

    Scale shape: the similarity frame's window cost (filter-then-lag)
    plus one left-anti join keyed on the (conv_id, turn_idx) exchange
    the window already established.
    """
    drop = (
        turn_edit_sim(transcripts, role=role, near_pm=near_pm)
        .filter(F.col("is_near"))
        .select("conv_id", F.col("prev_turn_idx").alias("turn_idx"))
    )
    return transcripts.join(drop, ["conv_id", "turn_idx"], "left_anti")
