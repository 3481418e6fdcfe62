"""Independent-oracle replica tests for the eval/search-loop batch
(q_majority_vote / q_successive_halving / q_replay_policy_eval)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, n_chars "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def test_majority_vote_matches_replica(spark):
    by_src = defaultdict(list)
    for doc_id, source, n_chars in _docs():
        by_src[source].append((_md5(str(doc_id)), doc_id, n_chars % 4))
    ledger = defaultdict(lambda: [0, 0, 0, 0])  # wins, votes, unan, margin
    unanimous_seen = plural_seen = 0
    for source, rows in by_src.items():
        rows.sort()
        for g in range(len(rows) // 5):
            grp = rows[5 * g : 5 * g + 5]
            cnt = Counter(a for _h, _d, a in grp)
            win, n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            row = ledger[(source, win)]
            row[0] += 1
            row[1] += n
            row[2] += 1 if n == 5 else 0
            row[3] += 2 * n - 5
            unanimous_seen += n == 5
            plural_seen += n < 5
    rows = entry.queries()["q_majority_vote"](spark, SF).collect()
    got = {
        (r["source"], r["answer"]): (
            r["n_wins"],
            r["winner_votes"],
            r["n_unanimous"],
            r["margin_sum"],
        )
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in ledger.items()}
    # fixture non-vacuity: both unanimous and contested groups occur
    assert plural_seen > 0


def test_successive_halving_matches_replica(spark):
    score = defaultdict(lambda: [0, 0, 0, 0])  # per config, per shard sum
    ndocs = Counter()
    for doc_id, _source, n_chars in _docs():
        cfg = int(_md5(f"cfg:{doc_id}")[0], 16)
        shard = int(_md5(f"rung:{doc_id}")[0], 16) % 4
        score[cfg][shard] += n_chars
        ndocs[cfg] += 1
    r1 = {c: v[0] for c, v in score.items()}
    r2 = {c: v[0] + v[1] for c, v in score.items()}
    r3 = {c: sum(v) for c, v in score.items()}
    top8 = set(sorted(r1, key=lambda c: (-r1[c], c))[:8])
    top4 = set(sorted(top8, key=lambda c: (-r2[c], c))[:4])
    final = {
        c: i + 1
        for i, c in enumerate(sorted(top4, key=lambda c: (-r3[c], c)))
    }
    rows = entry.queries()["q_successive_halving"](spark, SF).collect()
    assert len(rows) == 16
    for r in rows:
        c = r["config"]
        assert r["n_docs"] == ndocs[c]
        assert r["r1_reward"] == r1[c]
        assert r["alive2"] == (c in top8)
        assert r["r2_seen"] == (r2[c] if c in top8 else -1)
        assert r["alive3"] == (c in top4)
        assert r["r3_seen"] == (r3[c] if c in top4 else -1)
        assert r["final_rank"] == final.get(c, 0)
    # monotone budget: a survivor's seen rewards never decrease across rungs
    for r in rows:
        if r["alive3"]:
            assert r["r1_reward"] <= r["r2_seen"] <= r["r3_seen"]


def test_replay_policy_eval_matches_replica(spark):
    ev = duckdb.sql(
        f"SELECT user_id, event_type, round(value * 100) "
        f"FROM read_parquet('{SF}/events.parquet') "
        f"WHERE event_type IN ('click', 'view')"
    ).fetchall()
    pol_led = {
        p: [0, 0, 0, 0]
        for p in ("always_click", "always_view", "md5_personalized")
    }
    for uid, action, cents in ev:
        cents = int(cents)
        arm = "click" if int(_md5(f"pol:{uid}")[0], 16) % 2 == 0 else "view"
        for p, chosen in (
            ("always_click", "click"),
            ("always_view", "view"),
            ("md5_personalized", arm),
        ):
            row = pol_led[p]
            row[0] += 1
            if chosen == action:
                row[1] += 1
                row[2] += cents
                row[3] += cents * cents
    rows = entry.queries()["q_replay_policy_eval"](spark, SF).collect()
    got = {
        r["policy"]: (
            r["n_logged"],
            r["n_matched"],
            r["matched_cents"],
            r["matched_cents_sq"],
        )
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in pol_led.items()}
    # replay keeps a strict subset of logs per constant policy, and the two
    # constant arms partition the logged stream exactly
    assert (
        got["always_click"][1] + got["always_view"][1]
        == got["always_click"][0]
    )
    # the personalized policy matches somewhere strictly between never/always
    assert 0 < got["md5_personalized"][1] < got["md5_personalized"][0]
