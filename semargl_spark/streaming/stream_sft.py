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
bounded by the same conversation-length guard as batch reassembly; a
terminal-marker variant would pair this with a state TTL
(GroupStateTimeout) so abandoned conversations don't pin state
forever.
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


def _updater(expected_turns: int, mask_roles: tuple[str, ...]):
    def update(key, pdfs, state):
        buf = json.loads(state.get[0]) if state.exists else []
        for pdf in pdfs:
            buf.extend(
                [int(i), str(r), str(x)]
                for i, r, x in zip(
                    pdf["turn_idx"], pdf["role"], pdf["text"]
                )
            )
        have = {t[0] for t in buf}
        if have >= set(range(expected_turns)):
            rendered, n_chars, n_mask, spans = render_conversation(
                [(i, r, x) for i, r, x in buf], mask_roles
            )
            state.remove()
            yield pd.DataFrame(
                [(key[0], rendered, n_chars, n_mask, spans)],
                columns=_COLS,
            )
        else:
            state.update((json.dumps(buf),))
            yield pd.DataFrame(columns=_COLS)

    return update


def stream_chat_render(
    transcripts: DataFrame,
    expected_turns: int,
    mask_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Streaming transcripts → append-style stream of completed
    rendered conversations (each conversation exactly once)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if expected_turns < 1:
        raise ValueError(
            f"expected_turns must be >= 1, got {expected_turns}"
        )
    return (
        transcripts.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _updater(expected_turns, tuple(mask_roles)),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
