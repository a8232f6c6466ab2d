"""Hand fixtures for the SFT-pair extraction and chat-template rendering.

The DuckDB oracles prove Spark ≡ SQL on the synthetic corpus; these pin
the semantics on transcripts small enough to verify by eye: tool turns
between a user prompt and the assistant response are skipped, trailing
prompts with no later assistant turn are dropped, and rendering keeps
only the conversation tail in turn order.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tiny_transcripts(spark):
    rows = [
        # conv A: user → tool → assistant → user (dangling)
        ("A", 0, "user", "what is two plus two"),
        ("A", 1, "tool", "calc(2+2)"),
        ("A", 2, "assistant", "four"),
        ("A", 3, "user", "thanks bye"),
        # conv B: assistant first (no prompt), then user → assistant
        ("B", 0, "assistant", "hello"),
        ("B", 1, "user", "tell me a joke"),
        ("B", 2, "assistant", "knock knock"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_sft_pairs_skip_tools_drop_dangling(tiny_transcripts):
    from ed_twitter_spark.operators.sft import sft_pairs_df

    got = {
        (r["conv_id"], r["prompt_turn_idx"]): (
            r["response_turn_idx"],
            r["response"],
            r["prompt_tokens"],
            r["response_tokens"],
        )
        for r in sft_pairs_df(tiny_transcripts).collect()
    }
    assert got == {
        ("A", 0): (2, "four", 5, 1),  # tool turn 1 skipped
        ("B", 1): (2, "knock knock", 4, 2),
    }  # A turn 3 dangles (no later assistant); B turn 0 is not a prompt


def test_chat_render_truncates_to_tail_in_turn_order(spark):
    from ed_twitter_spark.operators.sft import chat_render_df

    rows = [("C", i, "user" if i % 2 == 0 else "assistant", f"t{i}") for i in range(10)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = chat_render_df(df, last_turns=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_turns_total"], r["n_turns_rendered"]) == (10, 3)
    assert r["rendered"] == "assistant: t7\nuser: t8\nassistant: t9"
    assert r["render_chars"] == len(r["rendered"])


def test_tool_grounding_overlap_by_hand(spark):
    from ed_twitter_spark.operators.sft import tool_grounding_df

    rows = [
        ("D", 0, "user", "look up spark docs"),
        ("D", 1, "tool", "spark runs on jvm clusters"),
        ("D", 2, "assistant", "spark runs distributed on clusters"),
        ("D", 3, "tool", "dangling tool output"),  # no later assistant
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = tool_grounding_df(df).collect()
    assert len(out) == 1  # turn 3 dangles
    r = out[0]
    assert (r["tool_turn_idx"], r["answer_turn_idx"]) == (1, 2)
    # answer tokens {spark, runs, distributed, on, clusters}: 4 of 5 appear
    # in the tool output (distributed does not)
    assert (r["n_tool_tokens"], r["n_answer_tokens"], r["n_shared_tokens"]) == (5, 5, 4)
    assert r["grounding_ratio"] == 0.8


def test_preference_pairs_block_and_rank(spark, monkeypatch):
    """Two prompts sharing a 2-token prefix pair up chosen-vs-rejected by
    response length; a lone-block prompt emits nothing."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import sft

    rows = [
        ("X", 0, "user", "how to sort lists"),
        ("X", 1, "assistant", "use the sort builtin with a key"),
        ("Y", 0, "user", "how to merge maps"),
        ("Y", 1, "assistant", "update one"),
        ("Z", 0, "user", "why is it slow"),
        ("Z", 1, "assistant", "profile first"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    monkeypatch.setattr(synth, "transcripts", lambda s, d: df)
    got = sft.preference_pairs(spark, "unused").collect()
    assert len(got) == 1
    r = got[0]
    assert r["block_key"] == "how to"
    assert r["chosen_conv"] == "X" and r["rejected_conv"] == "Y"
    assert r["chosen_tokens"] == 7 and r["rejected_tokens"] == 2


def test_sft_pipeline_stage_order(spark, monkeypatch):
    """Quality floor drops the short response; dedup keeps the EARLIEST
    duplicate; the split hashes the prompt — and a deduped pair never
    reaches the split (stage order)."""
    from ed_twitter_spark import synth
    from ed_twitter_spark.operators import sft

    rows = [
        ("B", 0, "user", "same question again asked"),   # dup, later conv…
        ("B", 1, "assistant", "identical answer text here"),
        ("A", 0, "user", "same question again asked"),   # …A wins (conv order)
        ("A", 1, "assistant", "identical answer text here"),
        ("C", 0, "user", "short reply please now"),
        ("C", 1, "assistant", "ok"),                     # fails response floor
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    monkeypatch.setattr(synth, "transcripts", lambda s, d: df)
    got = sft.sft_pipeline(spark, "unused").collect()
    assert len(got) == 1
    r = got[0]
    assert r["conv_id"] == "A"  # earliest (conv_id, turn) kept
    assert r["split"] in ("train", "val")
