"""Randomized replica tests for the SFT training-prep operators
(cliner_spark/sftprep.py): random transcript frames, independent
straight-line Python oracle, exact comparison — the same oracle style as
test_random_replicas_r2."""

from __future__ import annotations

import hashlib
import random

ROLES = ["user", "assistant", "tool"]


def _random_tx(seed, n_convs=12):
    rng = random.Random(seed)
    rows = []
    for c in range(n_convs):
        for t in range(rng.randrange(1, 14)):
            n_words = rng.randrange(1, 30)
            text = " ".join(
                rng.choice("alpha beta gamma delta epsilon".split())
                for _ in range(n_words)
            )
            rows.append(
                {
                    "conv_id": f"c{c}",
                    "turn_idx": t,
                    "role": rng.choice(ROLES),
                    "text": text,
                    "n_toks": n_words,
                }
            )
    return rows


def _tx_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, n_toks long",
    ).repartition(7)  # deliberately scramble physical order


def test_loss_mask_spans_match_python(spark):
    from cliner_spark.sftprep import loss_mask_spans

    for seed in (3, 19):
        rows = _random_tx(seed)
        got = {
            (r.conv_id, r.span_start_tok): (
                r.span_end_tok, r.n_turns_merged, r.n_masked_toks
            )
            for r in loss_mask_spans(_tx_df(spark, rows)).collect()
        }
        want = {}
        by_conv = {}
        for r in rows:
            by_conv.setdefault(r["conv_id"], []).append(r)
        for conv, turns in by_conv.items():
            turns.sort(key=lambda r: r["turn_idx"])
            off = 0
            span = None  # (start, end, n_turns, n_toks)
            for r in turns:
                if r["role"] != "assistant":
                    if span is None:
                        span = [off, off + r["n_toks"], 1, r["n_toks"]]
                    else:
                        span[1] = off + r["n_toks"]
                        span[2] += 1
                        span[3] += r["n_toks"]
                else:
                    if span is not None:
                        want[(conv, span[0])] = (span[1], span[2], span[3])
                        span = None
                off += r["n_toks"]
            if span is not None:
                want[(conv, span[0])] = (span[1], span[2], span[3])
        assert got == want, seed


def test_truncate_to_budget_matches_python(spark):
    from cliner_spark.sftprep import truncate_to_budget

    for seed, budget in ((7, 40), (23, 5)):
        rows = _random_tx(seed)
        got = {
            r.conv_id: (r.first_kept_turn, r.n_kept_turns, r.kept_toks, r.dropped_toks)
            for r in truncate_to_budget(_tx_df(spark, rows), budget=budget).collect()
        }
        want = {}
        by_conv = {}
        for r in rows:
            by_conv.setdefault(r["conv_id"], []).append(r)
        for conv, turns in by_conv.items():
            turns.sort(key=lambda r: r["turn_idx"], reverse=True)
            total = sum(r["n_toks"] for r in turns)
            kept, s = [], 0
            for r in turns:
                if s + r["n_toks"] > budget:
                    break
                s += r["n_toks"]
                kept.append(r)
            if kept:
                want[conv] = (
                    min(r["turn_idx"] for r in kept), len(kept), s, total - s
                )
        assert got == want, seed


def test_render_chat_is_order_invariant_and_matches_python(spark):
    from cliner_spark.sftprep import render_chat

    rows = _random_tx(41)
    # feed the frame in REVERSED turn order: md5 must still match the
    # turn-ordered python render (order pinned in-row, not by input order)
    df = _tx_df(spark, sorted(rows, key=lambda r: -r["turn_idx"]))
    got = {r.conv_id: (r.n_turns, r.n_chars, r.render_md5)
           for r in render_chat(df).collect()}
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        text = "\n".join(f"<|{r['role']}|>{r['text']}" for r in turns)
        want = (len(turns), len(text), hashlib.md5(text.encode()).hexdigest())
        assert got[conv] == want, conv
