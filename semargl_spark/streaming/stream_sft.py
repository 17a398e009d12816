"""Streaming SFT exit: cross-batch conversation assembly → one
chat-rendered training document per conversation, emitted EXACTLY ONCE
when the conversation completes.

The batch exit (conversation.chat_render) needs the whole table; a
live transcript feed doesn't have it — turns of one conversation
arrive across micro-batches. ``applyInPandasWithState`` keys the state
by conv_id (the natural shuffle key), buffers turns until the
completion contract is met, renders with the SAME template as the
batch operator (``render_conversation`` below is the shared pure
kernel; parity is differentially tested), emits the document, and
REMOVES the state — so state size tracks in-flight conversations,
not the corpus, and the HDFS-backed store makes the stream resumable.

Completion here is an explicit expected-turn-count (the deterministic
stand-in for a production end-of-conversation marker turn); a
conversation emits when all of turns 0..n-1 have arrived, regardless
of arrival order or batch boundaries.

Scale notes: state per in-flight conversation is its buffered turns —
bounded by the same conversation-length guard as batch reassembly.
Two production hazards are handled explicitly: (1) a conversation
that NEVER completes (dropped turn, truncated feed) would pin its
state forever under NoTimeout — pass ``ttl_ms`` to arm a
ProcessingTimeTimeout that drops (default) or force-emits the partial
document for stale conversations; (2) an at-least-once upstream
re-delivers turns — the buffer is deduplicated on the full
(turn_idx, role, text) triple before the completion check, so a
redelivered turn can neither double-render nor fake completion.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "conv_id string, rendered string, n_chars long, n_mask int, "
    "mask_spans string"
)
STATE_SCHEMA = "turns string"

_COLS = ["conv_id", "rendered", "n_chars", "n_mask", "mask_spans"]


def render_conversation(
    turns: list[tuple[int, str, str]],
    mask_roles: tuple[str, ...] = ("assistant",),
) -> tuple[str, int, int, str]:
    """(turn_idx, role, text) list → (rendered, n_chars, n_mask,
    mask_spans) under EXACTLY the template of
    conversation.chat_render — ``<|{role}|>\\n{text}\\n<|end|>\\n``
    blocks in turn order, ``;``-joined ``start-end`` spans over the
    mask-role text bodies (0-based, end-exclusive)."""
    parts: list[str] = []
    spans: list[str] = []
    off = 0
    n_mask = 0
    for i, role, text in sorted(turns):
        header = f"<|{role}|>\n"
        parts.append(header + text + "\n<|end|>\n")
        if role in mask_roles:
            start = off + len(header)
            spans.append(f"{start}-{start + len(text)}")
            n_mask += 1
        off += len(header) + len(text) + 9
    rendered = "".join(parts)
    return rendered, len(rendered), n_mask, ";".join(spans)


def _updater(
    expected_turns: int,
    mask_roles: tuple[str, ...],
    ttl_ms: int | None,
    on_timeout: str,
):
    def _render_frame(key, buf):
        rendered, n_chars, n_mask, spans = render_conversation(
            [(i, r, x) for i, r, x in buf], mask_roles
        )
        return pd.DataFrame(
            [(key[0], rendered, n_chars, n_mask, spans)], columns=_COLS
        )

    def update(key, pdfs, state):
        if ttl_ms is not None and state.hasTimedOut:
            # stale conversation: reclaim state; optionally emit the
            # partial render so the document isn't silently lost.
            # The (empty) input iterator MUST still be drained — an
            # early return mid-stream desyncs the Arrow worker protocol
            for _ in pdfs:
                pass
            buf = json.loads(state.get[0]) if state.exists else []
            state.remove()
            if on_timeout == "emit" and buf:
                yield _render_frame(key, buf)
            else:
                yield pd.DataFrame(columns=_COLS)
            return
        buf = json.loads(state.get[0]) if state.exists else []
        for pdf in pdfs:
            buf.extend(
                [int(i), str(r), str(x)]
                for i, r, x in zip(
                    pdf["turn_idx"], pdf["role"], pdf["text"]
                )
            )
        # at-least-once upstream: a redelivered turn must not render
        # twice in the emitted document (dedupe the FULL triple — two
        # genuinely different texts at one turn_idx both survive and
        # sort deterministically)
        buf = sorted({(i, r, x) for i, r, x in buf})
        have = {t[0] for t in buf}
        if have >= set(range(expected_turns)):
            state.remove()
            yield _render_frame(key, buf)
        else:
            state.update((json.dumps(buf),))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(columns=_COLS)

    return update


def stream_chat_render(
    transcripts: DataFrame,
    expected_turns: int,
    mask_roles: tuple[str, ...] = ("assistant",),
    ttl_ms: int | None = None,
    on_timeout: str = "drop",
) -> DataFrame:
    """Streaming transcripts → append-style stream of completed
    rendered conversations (each conversation exactly once).

    ``ttl_ms`` arms a per-conversation processing-time TTL (reset on
    every arriving turn): a conversation idle past it is removed from
    the state store — dropped, or force-emitted as a partial document
    when ``on_timeout='emit'``. Without it, an abandoned conversation
    pins its buffered turns forever.

    Trigger caveat: ProcessingTimeTimeout makes the stateful operator
    report "may need another batch" after every batch, so a
    ``ttl_ms`` query under ``trigger(availableNow=True)`` NEVER
    terminates (it keeps running empty batches to fire future
    timeouts). Use the TTL only with a continuous trigger
    (``processingTime=...``) — which is the only setting where an
    abandoned-conversation TTL is meaningful anyway; drain-and-stop
    batch replays should leave ``ttl_ms=None``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if expected_turns < 1:
        raise ValueError(
            f"expected_turns must be >= 1, got {expected_turns}"
        )
    if on_timeout not in ("drop", "emit"):
        raise ValueError(
            f"on_timeout must be 'drop' or 'emit', got {on_timeout!r}"
        )
    if ttl_ms is not None and ttl_ms < 1:
        raise ValueError(f"ttl_ms must be >= 1, got {ttl_ms}")
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        transcripts.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _updater(expected_turns, tuple(mask_roles), ttl_ms, on_timeout),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            timeout,
        )
    )
