"""Independent-oracle replica tests for the LLM training-infra batch
(q_grpo_advantage / q_moe_routing / q_checkpoint_shards): the zero-sum
whitening identity, a full router simulation with capacity drops, and the
zigzag-beats-round-robin spread proof."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_grpo_advantage_matches_replica(spark):
    ids = [
        d for (d,) in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    ]
    rew = {d: int(_md5(f"rw:{d}")[:2], 16) for d in ids}
    groups = defaultdict(list)
    for d in ids:
        groups[d // 8].append(d)
    got = {r["doc_id"]: r for r in entry.queries()["q_grpo_advantage"](spark, SF).collect()}
    assert set(got) == set(ids)
    for pid, ds in groups.items():
        n = len(ds)
        s = sum(rew[d] for d in ds)
        ss = sum(rew[d] ** 2 for d in ds)
        adv_sum = 0
        for d in ds:
            r = got[d]
            assert (r["pid"], r["reward"]) == (pid, rew[d])
            assert (r["n"], r["s"], r["ss"]) == (n, s, ss)
            assert r["adv_num"] == n * rew[d] - s
            adv_sum += r["adv_num"]
            if n * ss > s * s:
                std = math.sqrt((ss - s * s / n) / n)
                assert math.isclose(
                    r["advantage"], round((n * rew[d] - s) / (n * std), 6),
                    abs_tol=1e-6,
                )
            else:
                assert r["advantage"] is None
        # the whole point of group-relative whitening: zero-sum per group
        assert adv_sum == 0


def test_moe_routing_matches_replica(spark):
    toks = [
        t for (t,) in duckdb.sql(
            f"SELECT event_id FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    n_tokens = len(toks)
    capacity = math.ceil(2 * n_tokens * 1.25 / 8)
    per_expert = defaultdict(list)  # expert -> [(gate, tok, choice)]
    for t in toks:
        gates = sorted(
            ((_md5(f"g:{t}:{e}"), e) for e in range(8)),
            key=lambda ge: (ge[0], -ge[1]),
            reverse=True,
        )
        for choice, (g, e) in enumerate(gates[:2], 1):
            per_expert[e].append((g, t, choice))
    got = {r["expert"]: r for r in entry.queries()["q_moe_routing"](spark, SF).collect()}
    assert set(got) == set(range(8))
    total_kept = total_dropped = 0
    for e in range(8):
        lst = sorted(per_expert[e], key=lambda gtc: (gtc[0], -gtc[1]), reverse=True)
        kept = sum(1 for i in range(len(lst)) if i < capacity)
        dropped = len(lst) - kept
        r = got[e]
        assert r["n_routed"] == len(lst)
        assert (r["n_kept"], r["n_dropped"]) == (kept, dropped)
        assert r["n_top1"] == sum(1 for _g, _t, c in lst if c == 1)
        assert (r["capacity"], r["n_tokens"]) == (capacity, n_tokens)
        assert math.isclose(
            r["load_share"], round(len(lst) / (2 * n_tokens), 6), abs_tol=1e-9
        )
        # md5 gates are near-uniform: every load within 3x of the 1/8 band
        assert 1 / 24 < len(lst) / (2 * n_tokens) < 3 / 8
        total_kept += kept
        total_dropped += dropped
    assert total_kept + total_dropped == 2 * n_tokens


def test_checkpoint_shards_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    ranked = sorted(rows, key=lambda dv: (-dv[1], dv[0]))
    total = sum(v for _d, v in rows)
    shards = {"round_robin": defaultdict(lambda: [0, 0]), "zigzag": defaultdict(lambda: [0, 0])}
    for rk, (_d, v) in enumerate(ranked):
        shards["round_robin"][rk % 8][0] += 1
        shards["round_robin"][rk % 8][1] += v
        fold = rk % 16
        z = fold if fold < 8 else 15 - fold
        shards["zigzag"][z][0] += 1
        shards["zigzag"][z][1] += v
    got = {
        (r["strategy"], r["shard"]): r
        for r in entry.queries()["q_checkpoint_shards"](spark, SF).collect()
    }
    spreads = {}
    for strat, sh in shards.items():
        sizes = [sh[i][1] for i in range(8)]
        spreads[strat] = max(sizes) - min(sizes)
        for i in range(8):
            r = got[(strat, i)]
            assert (r["n_tensors"], r["shard_bytes"]) == tuple(sh[i])
            assert r["total"] == total
            assert r["dev_num"] == 8 * sh[i][1] - total
            assert r["spread"] == spreads[strat]
        assert sum(sizes) == total
    # the zigzag argument: pairing big with small beats naive round-robin
    # on a size-sorted sequence
    assert spreads["zigzag"] <= spreads["round_robin"]
