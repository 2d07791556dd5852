"""Tests for conversation-level stats and quality filtering."""

from __future__ import annotations

from cminer_spark.pipeline.dialogs import conversation_stats, filter_conversations


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


GOOD = [
    ("c1", 0, "user", "hi there"),
    ("c1", 1, "assistant", "hello! how can I help"),
    ("c1", 2, "user", "do x"),
    ("c1", 3, "assistant", "done"),
]
BROKEN = [  # double-assistant break, no user at end
    ("c2", 0, "user", "a"),
    ("c2", 1, "assistant", "b"),
    ("c2", 2, "assistant", "c"),
    ("c2", 3, "tool", None),
]
SHORT = [("c3", 0, "user", "only one turn")]


def test_conversation_stats(spark):
    st = {
        r["conv_id"]: r
        for r in conversation_stats(_tr(spark, GOOD + BROKEN + SHORT)).collect()
    }
    c1 = st["c1"]
    assert c1["n_turns"] == 4 and c1["n_user_turns"] == 2
    assert c1["n_assistant_turns"] == 2 and c1["n_alternation_breaks"] == 0
    assert c1["user_chars"] == len("hi there") + len("do x")
    assert c1["assistant_chars"] == len("hello! how can I help") + len("done")
    exp = c1["assistant_chars"] / c1["user_chars"]
    assert abs(c1["assistant_char_ratio"] - round(exp, 6)) < 1e-9
    c2 = st["c2"]
    assert c2["n_alternation_breaks"] == 1 and c2["n_tool_turns"] == 1
    # null text counts as zero chars
    assert c2["user_chars"] == 1
    c3 = st["c3"]
    assert c3["n_turns"] == 1 and c3["assistant_char_ratio"] == 0.0


def test_filter_conversations_reasons(spark):
    out = {
        r["conv_id"]: r
        for r in filter_conversations(
            _tr(spark, GOOD + BROKEN + SHORT),
            min_turns=2,
            max_turns=10,
            max_alternation_breaks=0,
        ).collect()
    }
    assert out["c1"]["keep"] and out["c1"]["fail_reason"] is None
    assert not out["c2"]["keep"] and out["c2"]["fail_reason"] == "alternation"
    assert not out["c3"]["keep"] and out["c3"]["fail_reason"] == "too_short"


def test_filter_reason_priority(spark):
    # a conversation that is BOTH too short and break-laden reports
    # the first rule (too_short)
    rows = [("c4", 0, "assistant", "x")]
    out = filter_conversations(
        _tr(spark, rows), min_turns=2, max_alternation_breaks=0
    ).collect()[0]
    assert out["fail_reason"] == "too_short"


def test_tool_transitions(spark):
    from cminer_spark.pipeline.dialogs import tool_transitions

    rows = [
        # conv A: search -> fetch -> search ; conv B: search -> search
        ("a", 0, "user", "q", None),
        ("a", 1, "tool", None, "search"),
        ("a", 2, "tool", None, "fetch"),
        ("a", 3, "assistant", "x", None),
        ("a", 4, "tool", None, "search"),
        ("b", 0, "tool", None, "search"),
        ("b", 1, "tool", None, "search"),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    out = {
        (r["prev_tool"], r["tool"]): (r["n"], r["p"])
        for r in tool_transitions(tr).collect()
    }
    assert out[("^", "search")] == (2, 1.0)  # both chains start at search
    assert out[("search", "fetch")] == (1, 0.5)
    assert out[("search", "search")] == (1, 0.5)
    assert out[("fetch", "search")] == (1, 1.0)
    # every invocation appears exactly once as a destination
    assert sum(n for n, _ in out.values()) == 5
    # per-prev probabilities sum to 1
    from collections import defaultdict
    sums = defaultdict(float)
    for (prev, _), (_, p) in out.items():
        sums[prev] += p
    assert all(abs(v - 1.0) < 1e-6 for v in sums.values())
