"""Tests for dialogue (context, response) training-pair assembly
(pipeline/dialogs.py)."""

from __future__ import annotations

import pytest

from cminer_spark.pipeline.dialogs import build_training_pairs


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_pairs_hand_computed(spark):
    tr = _tr(
        spark,
        [
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "hello"),
            ("c1", 2, "user", "add 2+2"),
            ("c1", 3, "tool", "4"),
            ("c1", 4, "assistant", "it is 4"),
        ],
    )
    out = {
        r.turn_idx: r for r in build_training_pairs(tr, history=3).collect()
    }
    assert set(out) == {1, 4}
    assert out[1].context == "user: hi"
    assert out[1].n_context_turns == 1
    assert out[1].response == "hello"
    # turn 4 sees turns 1..3, oldest first
    assert out[4].context == "assistant: hello\nuser: add 2+2\ntool: 4"
    assert out[4].n_context_turns == 3
    assert out[4].response == "it is 4"


def test_pairs_turn0_response_has_empty_context(spark):
    tr = _tr(spark, [("c1", 0, "assistant", "welcome")])
    rows = build_training_pairs(tr, history=2).collect()
    assert len(rows) == 1
    assert rows[0].context == ""
    assert rows[0].n_context_turns == 0


def test_pairs_null_text_renders_empty_and_bounded_history(spark):
    tr = _tr(
        spark,
        [
            ("c1", 0, "user", None),
            ("c1", 1, "user", "a"),
            ("c1", 2, "user", "b"),
            ("c1", 3, "assistant", None),
        ],
    )
    rows = build_training_pairs(tr, history=2).collect()
    assert len(rows) == 1
    # history=2: only turns 1 and 2; null text renders as ''
    assert rows[0].context == "user: a\nuser: b"
    assert rows[0].response == ""


def test_pairs_conversations_are_independent(spark):
    tr = _tr(
        spark,
        [
            ("c1", 0, "user", "one"),
            ("c2", 0, "user", "two"),
            ("c2", 1, "assistant", "re-two"),
        ],
    )
    rows = build_training_pairs(tr, history=5).collect()
    assert len(rows) == 1
    assert rows[0].conv_id == "c2"
    assert rows[0].context == "user: two"


def test_pairs_target_role_filter(spark):
    tr = _tr(
        spark,
        [("c1", 0, "user", "q"), ("c1", 1, "tool", "r")],
    )
    rows = build_training_pairs(tr, history=2, target_role="tool").collect()
    assert len(rows) == 1 and rows[0].response == "r"


def test_pairs_validates_history(spark):
    tr = _tr(spark, [("c1", 0, "user", "x")])
    with pytest.raises(ValueError):
        build_training_pairs(tr, history=0)
