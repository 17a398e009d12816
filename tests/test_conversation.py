"""Transcript-shape analytics (operators/conversation.py)."""

from __future__ import annotations

import datetime as dt

from semargl_spark.operators.conversation import role_stats, turn_transitions


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_turn_transitions_matrix_and_gaps(spark):
    t = _t(
        spark,
        [
            ("c1", 0, "user", "hi", None, _ts(0)),
            ("c1", 1, "assistant", "hello", None, _ts(10)),
            ("c1", 2, "user", "do it", None, _ts(25)),
            ("c2", 0, "user", "hey", None, _ts(0)),
            ("c2", 1, "assistant", "yo", None, _ts(7)),
        ],
    )
    out = {(r["from_role"], r["to_role"]): r for r in turn_transitions(t).collect()}
    assert out[("user", "assistant")]["n_transitions"] == 2
    assert out[("user", "assistant")]["sum_gap_s"] == 17  # 10 + 7
    assert out[("assistant", "user")]["n_transitions"] == 1
    assert out[("assistant", "user")]["sum_gap_s"] == 15
    assert len(out) == 2  # first turns produce no transition


def test_turn_transitions_order_not_input_order(spark):
    # rows arrive shuffled; the window must order by turn_idx
    t = _t(
        spark,
        [
            ("c1", 2, "tool", "r", "search", _ts(20)),
            ("c1", 0, "user", "q", None, _ts(0)),
            ("c1", 1, "assistant", "a", None, _ts(5)),
        ],
    )
    out = {(r["from_role"], r["to_role"]) for r in turn_transitions(t).collect()}
    assert out == {("user", "assistant"), ("assistant", "tool")}


def test_role_stats_counts(spark):
    t = _t(
        spark,
        [
            ("c1", 0, "user", "q", None, _ts(0)),
            ("c1", 1, "assistant", "a", None, _ts(1)),
            ("c1", 2, "tool", "r", "search", _ts(2)),
            ("c2", 0, "user", "q2", None, _ts(0)),
            ("c2", 1, "tool", "r2", "calc", _ts(1)),
        ],
    )
    out = {r["role"]: r for r in role_stats(t).collect()}
    assert (out["user"]["n_turns"], out["user"]["n_convs"]) == (2, 2)
    assert out["tool"]["n_tool_turns"] == 2
    assert out["assistant"]["n_convs"] == 1
    assert out["user"]["n_tool_turns"] == 0


def test_tool_stats_latency_bytes_and_reach(spark):
    from semargl_spark.operators.conversation import tool_stats

    t = _t(
        spark,
        [
            ("c1", 0, "user", "q", None, _ts(0)),
            ("c1", 1, "assistant", "call", None, _ts(5)),
            ("c1", 2, "tool", "12345", "search", _ts(12)),   # latency 7
            ("c1", 3, "assistant", "call2", None, _ts(20)),
            ("c1", 4, "tool", "xy", "search", _ts(23)),      # latency 3
            ("c2", 0, "tool", "abc", "exec", _ts(40)),       # first turn: NULL latency
        ],
    )
    out = {r["tool"]: r for r in tool_stats(t).collect()}
    assert out["search"]["n_calls"] == 2
    assert out["search"]["n_convs"] == 1
    assert out["search"]["sum_out_bytes"] == 7  # 5 + 2
    assert out["search"]["sum_latency_s"] == 10  # 7 + 3
    assert out["exec"]["n_calls"] == 1
    assert out["exec"]["sum_latency_s"] is None  # no preceding turn


def test_tool_chains_skip_non_tool_turns(spark):
    from semargl_spark.operators.conversation import tool_chains

    t = _t(
        spark,
        [
            ("c1", 0, "tool", "a", "search", _ts(0)),
            ("c1", 1, "assistant", "x", None, _ts(1)),
            ("c1", 2, "tool", "b", "exec", _ts(2)),    # search→exec
            ("c1", 3, "tool", "c", "search", _ts(3)),  # exec→search
            ("c2", 0, "tool", "d", "exec", _ts(0)),    # lone call: no bigram
        ],
    )
    out = {(r["from_tool"], r["to_tool"]): r["n"] for r in tool_chains(t).collect()}
    assert out == {("search", "exec"): 1, ("exec", "search"): 1}


def test_transcripts_profile_counts(spark):
    from pyspark.sql import functions as F

    from semargl_spark.operators.conversation import transcripts_profile

    df = spark.createDataFrame(
        [("c1", 0, "user", "hi", None, 1.0),
         ("c1", 1, "assistant", "hello there", "t1", 2.0),
         ("c2", 0, "user", None, None, 3.0)],
        "conv_id string, turn_idx int, role string, text string, tool string, epoch double",
    ).select("conv_id", "turn_idx", "role", "text", "tool",
             F.timestamp_seconds(F.col("epoch")).alias("ts"))
    out = {r["col_name"]: r for r in transcripts_profile(df).collect()}
    assert set(out) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    assert out["conv_id"]["n_rows"] == 3 and out["conv_id"]["n_distinct"] == 2
    assert out["text"]["n_null"] == 1 and out["text"]["n_distinct"] == 2
    assert out["text"]["min_len"] == 2 and out["text"]["max_len"] == 11
    assert out["tool"]["n_null"] == 2 and out["tool"]["n_distinct"] == 1


def test_agent_loops_run_length_encoding(spark):
    import pytest

    from semargl_spark.operators.conversation import agent_loops

    # c1: grep grep grep ls grep grep  -> runs [3,1,2], 2 stuck runs
    # c2: a b a                        -> runs [1,1,1], 0 stuck
    # c3: no tool turns at all         -> absent from the output
    rows = []
    for i, tool in enumerate(["grep", "grep", "grep", "ls", "grep", "grep"]):
        rows.append(("c1", i, "tool", "t", tool, _ts(i)))
    for i, tool in enumerate(["a", "b", "a"]):
        rows.append(("c2", i, "tool", "t", tool, _ts(i)))
    rows.append(("c3", 0, "user", "hi", None, _ts(0)))
    out = {r["conv_id"]: r for r in agent_loops(_t(spark, rows)).collect()}
    assert set(out) == {"c1", "c2"}
    c1 = out["c1"]
    assert (c1["n_tool_calls"], c1["n_runs"], c1["max_run"],
            c1["n_stuck_runs"]) == (6, 3, 3, 2)
    c2 = out["c2"]
    assert (c2["n_tool_calls"], c2["n_runs"], c2["max_run"],
            c2["n_stuck_runs"]) == (3, 3, 1, 0)
    # min_run raises the stuck threshold; user turns between tool calls
    # do not break a run (the lag runs over the tool subsequence)
    out3 = {r["conv_id"]: r for r in agent_loops(_t(spark, rows), min_run=3).collect()}
    assert out3["c1"]["n_stuck_runs"] == 1
    gap = [("c4", 0, "tool", "t", "x", _ts(0)),
           ("c4", 1, "user", "u", None, _ts(1)),
           ("c4", 2, "tool", "t", "x", _ts(2))]
    g = agent_loops(_t(spark, gap)).collect()[0]
    assert (g["max_run"], g["n_stuck_runs"]) == (2, 1)
    with pytest.raises(ValueError, match=">= 2"):
        agent_loops(_t(spark, rows), min_run=1)


def test_agent_loops_single_exchange_plan(spark):
    from semargl_spark.operators.conversation import agent_loops

    rows = [("c1", i, "tool", "t", "x", _ts(i)) for i in range(4)]
    plan = agent_loops(_t(spark, rows))._jdf.queryExecution().executedPlan().toString()
    # both windows share one (conv_id -> turn_idx) sort: exactly one
    # exchange feeds the window stage (plus the two aggregations)
    n_window_exchanges = plan.count("hashpartitioning(conv_id")
    assert plan.count("Window") >= 1
    assert n_window_exchanges <= 2, plan


def test_topic_shifts_exact_values_and_edges(spark):
    from pyspark.sql import functions as F

    from semargl_spark.operators.conversation import topic_shifts

    rows = [
        ("c1", 0, "alpha beta gamma"),
        ("c1", 1, "alpha beta gamma"),          # identical -> 1000
        ("c1", 2, "alpha beta delta"),          # 2/4 -> 500
        ("c1", 3, "zeta eta theta"),            # 0/6 -> 0, shift
        ("c1", 4, ""),                          # 0/3 -> 0, shift
        ("c1", 5, ""),                          # empty vs empty -> 1000
        ("c2", 0, "solo"),                      # first turn: NULL, no shift
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        (r["conv_id"], r["turn_idx"]): (r["jaccard_pm"], r["is_shift"])
        for r in topic_shifts(t, boundary_permille=400).collect()
    }
    assert got[("c1", 0)] == (None, 0)
    assert got[("c1", 1)] == (1000, 0)
    assert got[("c1", 2)] == (500, 0)
    assert got[("c1", 3)] == (0, 1)
    assert got[("c1", 4)] == (0, 1)
    assert got[("c1", 5)] == (1000, 0)
    assert got[("c2", 0)] == (None, 0)


def test_chat_render_exact_template_and_spans(spark):
    from semargl_spark.operators.conversation import chat_render

    t = _t(
        spark,
        [
            # shuffled input order: rendering must follow turn_idx
            ("c1", 1, "assistant", "hello there", None, _ts(1)),
            ("c1", 0, "user", "hi", None, _ts(0)),
            ("c1", 2, "tool", "{}", "search", _ts(2)),
            ("c2", 0, "tool", "x", "t", _ts(0)),  # no assistant turns
        ],
    )
    out = {r["conv_id"]: r for r in chat_render(t).collect()}
    c1 = out["c1"]
    expected = (
        "<|user|>\nhi\n<|end|>\n"
        "<|assistant|>\nhello there\n<|end|>\n"
        "<|tool|>\n{}\n<|end|>\n"
    )
    assert c1["rendered"] == expected
    assert c1["n_chars"] == len(expected)
    # assistant text starts after "<|user|>\nhi\n<|end|>\n<|assistant|>\n"
    start = len("<|user|>\nhi\n<|end|>\n") + len("<|assistant|>\n")
    end = start + len("hello there")
    assert c1["mask_spans"] == f"{start}-{end}"
    assert c1["n_mask"] == 1
    assert expected[start:end] == "hello there"
    c2 = out["c2"]
    assert c2["mask_spans"] == "" and c2["n_mask"] == 0
    assert c2["rendered"] == "<|tool|>\nx\n<|end|>\n"


def test_chat_render_custom_mask_roles_multi_span(spark):
    from semargl_spark.operators.conversation import chat_render

    t = _t(
        spark,
        [
            ("c1", 0, "user", "a", None, _ts(0)),
            ("c1", 1, "assistant", "bb", None, _ts(1)),
            ("c1", 2, "user", "c", None, _ts(2)),
            ("c1", 3, "assistant", "dd", None, _ts(3)),
        ],
    )
    row = chat_render(t, mask_roles=("user", "assistant")).collect()[0]
    spans = [
        tuple(int(v) for v in s.split("-"))
        for s in row["mask_spans"].split(";")
    ]
    assert len(spans) == 4 and row["n_mask"] == 4
    texts = [row["rendered"][s:e] for s, e in spans]
    assert texts == ["a", "bb", "c", "dd"]
    # spans are emitted in turn order and non-overlapping
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(3))


def test_validate_transcripts_all_checks(spark):
    from semargl_spark.operators.conversation import validate_transcripts

    t = _t(
        spark,
        [
            ("c1", 0, "user", "hi", None, _ts(0)),
            ("c1", 1, "assistant", "", None, _ts(1)),      # null_text
            ("c1", 3, "user", "late", None, _ts(0)),       # turn_gap + ts_regress
            ("c2", 1, "user", "starts at 1", None, _ts(0)),  # turn_gap (first != 0)
            ("c3", 0, "narrator", "x", None, _ts(0)),      # bad_role
            ("c4", 0, "user", "a", None, _ts(0)),
            ("c4", 0, "user", "a", None, _ts(0)),          # dup_turn ×2
        ],
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["check"], r["detail"])
        for r in validate_transcripts(t).collect()
    )
    assert got == sorted([
        ("c1", 1, "null_text", "empty"),
        ("c1", 3, "turn_gap", "expected=2"),
        ("c1", 3, "ts_regress", "ts<prev"),
        ("c2", 1, "turn_gap", "expected=0"),
        ("c3", 0, "bad_role", "narrator"),
        ("c4", 0, "dup_turn", "n=2"),
        ("c4", 0, "dup_turn", "n=2"),
        # the second copy also breaks the ordering contract itself
        ("c4", 0, "turn_gap", "expected=1"),
    ])


def test_validate_transcripts_clean_corpus_is_empty(spark):
    from semargl_spark.operators.conversation import validate_transcripts

    t = _t(
        spark,
        [
            ("c1", 0, "user", "hi", None, _ts(0)),
            ("c1", 1, "assistant", "yo", None, _ts(5)),
            ("c1", 2, "tool", "{}", "search", _ts(6)),
        ],
    )
    assert validate_transcripts(t).count() == 0


def test_chat_render_spans_exact_under_tricky_content(spark):
    """Span offsets must slice the rendered document to the exact turn
    body for multi-byte, newline, quote, and template-collision
    content (offsets are codepoint-based on both engines)."""
    from semargl_spark.operators.conversation import chat_render

    texts = [
        "héllo wörld éè",          # latin accents
        "emoji \U0001F600\U0001F680 end",     # astral plane
        "line1\nline2\n\nline4",              # embedded newlines
        'quotes "x" and <|end|> inside',      # template collision
        "",                                    # empty body
        "\t tab \t",
    ]
    rows = [("c1", i, "assistant" if i % 2 else "user", t, None, _ts(i))
            for i, t in enumerate(texts)]
    df = _t(spark, rows)
    out = chat_render(df).collect()[0]
    spans = ([tuple(int(v) for v in s.split("-"))
              for s in out["mask_spans"].split(";")]
             if out["mask_spans"] else [])
    # assistant turns are indices 1, 3, 5
    assert [out["rendered"][a:b] for a, b in spans] == [
        texts[1], texts[3], texts[5]
    ]
    assert out["n_chars"] == len(out["rendered"])


def test_instruction_pairs_adjacency_only(spark):
    from semargl_spark.operators.conversation import instruction_pairs

    t = _t(
        spark,
        [
            ("c1", 0, "user", "ask1", None, _ts(0)),
            ("c1", 1, "assistant", "ans1", None, _ts(1)),
            ("c1", 2, "tool", "{}", "x", _ts(2)),
            ("c1", 3, "assistant", "after tool", None, _ts(3)),  # no pair
            ("c2", 0, "assistant", "unprompted", None, _ts(0)),  # no pair
            ("c2", 1, "user", "ask2", None, _ts(1)),
            ("c2", 2, "assistant", "ans2", None, _ts(2)),
        ],
    )
    got = {(r["conv_id"], r["turn_idx"]): (r["instruction"], r["response"])
           for r in instruction_pairs(t).collect()}
    assert got == {("c1", 1): ("ask1", "ans1"), ("c2", 2): ("ask2", "ans2")}


def test_turn_edit_sim_regeneration_signal(spark):
    from semargl_spark.operators.conversation import turn_edit_sim

    t = spark.createDataFrame(
        [
            # near-identical retry: 1-char edit over 12 chars → 83 permil
            ("c1", 0, "user", "question"),
            ("c1", 1, "assistant", "answer is 42"),
            ("c1", 2, "assistant", "answer is 43"),
            # full rewrite → far
            ("c1", 3, "assistant", "completely different reply"),
            # single assistant turn in c2 → no pair emitted
            ("c2", 0, "assistant", "solo"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    rows = {(r.conv_id, r.turn_idx): r
            for r in turn_edit_sim(t, near_pm=250).collect()}
    assert set(rows) == {("c1", 2), ("c1", 3)}
    retry = rows[("c1", 2)]
    assert retry.prev_turn_idx == 1 and retry.edit_dist == 1
    assert retry.dist_pm == 83 and bool(retry.is_near)
    rewrite = rows[("c1", 3)]
    assert rewrite.prev_turn_idx == 2 and not rewrite.is_near


def test_tool_arg_validate_verdicts(spark):
    from semargl_spark.operators.conversation import tool_arg_validate

    t = spark.createDataFrame(
        [
            ("c1", 0, "search", '{"q":"x","k":3}'),
            ("c1", 1, "search", '{"k":3}'),
            ("c1", 2, "search", "not json"),
            ("c1", 3, "exec", '{"cmd":"ls"}'),
            ("c1", 4, "unknown_tool", "whatever"),  # no requirements → ok
            ("c1", 5, None, "user turn"),           # non-tool → no row
            ("c1", 6, "search", '{"q":null,"k":3}'),  # null arg = present
        ],
        "conv_id string, turn_idx int, tool string, text string",
    )
    got = {r.turn_idx: r for r in
           tool_arg_validate(t, {"search": ["q", "k"],
                                 "exec": ["cmd"]}).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 6}
    assert got[0].ok and got[0].missing_keys == []
    assert got[1].missing_keys == ["q"] and not got[1].ok
    # malformed body: all required keys reported, is_json false
    assert not got[2].is_json and got[2].missing_keys == ["k", "q"]
    assert got[3].ok
    assert got[4].ok and not got[4].is_json
    # present-but-null required arg validates (key membership, not value)
    assert got[6].ok and got[6].missing_keys == []


def test_dedup_regenerations_keeps_final_attempt(spark):
    from semargl_spark.operators.conversation import dedup_regenerations

    t = spark.createDataFrame(
        [
            ("c1", 0, "user", "question"),
            ("c1", 1, "assistant", "answer is 42"),   # retry chain 1→2→3
            ("c1", 2, "assistant", "answer is 43"),
            ("c1", 3, "assistant", "answer is 43!"),
            ("c1", 4, "assistant", "unrelated reply entirely"),
            ("c2", 0, "assistant", "solo"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    kept = {(r.conv_id, r.turn_idx)
            for r in dedup_regenerations(t).collect()}
    # the whole chain collapses to its final member; far turn + user +
    # other conversations untouched
    assert kept == {("c1", 0), ("c1", 3), ("c1", 4), ("c2", 0)}
