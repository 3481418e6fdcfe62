"""Independent-oracle replica tests for the storage-layout advisor batch
(q_encoding_size / q_hilbert_layout / q_bitmap_index), incl. a from-scratch
Hilbert xy2d (bijection + unit-step proof) and the advisor sanity shapes."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_encoding_size_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, "
        f"CAST(l_quantity AS BIGINT), CAST(CAST(l_shipdate AS DATE) AS VARCHAR), "
        f"l_suppkey FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    cols = {
        "l_returnflag": lambda r: r[2],
        "l_linestatus": lambda r: r[3],
        "l_quantity": lambda r: str(r[4]),
        "l_shipdate": lambda r: r[5],
        "l_suppkey": lambda r: str(r[6]),
    }
    got = {r["colname"]: r for r in entry.queries()["q_encoding_size"](spark, SF).collect()}
    assert set(got) == set(cols)
    for name, fx in cols.items():
        vals = [(r[0] // 2048, r[0], r[1], fx(r)) for r in rows]
        vals.sort()
        plain = sum(len(v) + 4 for *_k, v in vals)
        distinct = {v for *_k, v in vals}
        card = len(distinct)
        dict_table = sum(len(v) + 4 for v in distinct)
        code = 1 if card <= 256 else (2 if card <= 65536 else 4)
        n_runs = 0
        prev = None  # (page, val)
        for page, _ok, _ln, v in vals:
            if prev is None or prev[0] != page or prev[1] != v:
                n_runs += 1
            prev = (page, v)
        r = got[name]
        assert (r["n_rows"], r["card"], r["n_runs"]) == (len(vals), card, n_runs)
        assert r["plain_bytes"] == plain
        assert r["dict_bytes"] == dict_table + len(vals) * code
        assert r["rle_bytes"] == dict_table + n_runs * (code + 4)
        best = min(r["plain_bytes"], r["dict_bytes"], r["rle_bytes"])
        assert math.isclose(r["best_ratio"], round(best / plain, 6), abs_tol=1e-9)
    # advisor sanity: 1-char flags compress via dict/rle; near-unique suppkey
    # gains little
    assert got["l_returnflag"]["best_encoding"] in ("dict", "rle")
    assert got["l_returnflag"]["best_ratio"] < 0.5
    assert got["l_suppkey"]["best_ratio"] > got["l_returnflag"]["best_ratio"]


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_layout_matches_replica(spark):
    # the generated arithmetic must BE the Hilbert curve: bijection + unit steps
    pos = {}
    for x in range(16):
        for y in range(16):
            pos[_xy2d(16, x, y)] = (x, y)
    assert sorted(pos) == list(range(256))
    assert all(
        abs(pos[i][0] - pos[i + 1][0]) + abs(pos[i][1] - pos[i + 1][1]) == 1
        for i in range(255)
    )
    rows = duckdb.sql(
        f"SELECT o_custkey % 16, (dayofyear(o_orderdate) - 1) // 23 "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()

    def zord(x, y):
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    exp = {}
    for layout, fkey in (
        ("rowmajor", lambda x, y: y),
        ("zorder", lambda x, y: zord(x, y) // 16),
        ("hilbert", lambda x, y: _xy2d(16, x, y) // 16),
    ):
        boxes = defaultdict(lambda: [16, -1, 16, -1, 0])
        for x, y in rows:
            b = boxes[fkey(x, y)]
            b[0], b[1] = min(b[0], x), max(b[1], x)
            b[2], b[3] = min(b[2], y), max(b[3], y)
            b[4] += 1
        areas = [(b[1] - b[0] + 1) * (b[3] - b[2] + 1) for b in boxes.values()]
        exp[layout] = dict(
            n_files=len(boxes),
            n_rows=sum(b[4] for b in boxes.values()),
            sum_bbox_area=sum(areas),
            max_bbox_area=max(areas),
            files_hit_x47=sum(1 for b in boxes.values() if b[1] >= 4 and b[0] <= 7),
            files_hit_y47=sum(1 for b in boxes.values() if b[3] >= 4 and b[2] <= 7),
        )
    got = {r["layout"]: r for r in entry.queries()["q_hilbert_layout"](spark, SF).collect()}
    assert set(got) == {"rowmajor", "zorder", "hilbert"}
    for layout, e in exp.items():
        for col, v in e.items():
            assert got[layout][col] == v, (layout, col)
    # the layout argument: curves prune the x-predicate, row-major cannot
    assert got["hilbert"]["files_hit_x47"] < got["rowmajor"]["files_hit_x47"]
    assert got["zorder"]["files_hit_x47"] < got["rowmajor"]["files_hit_x47"]
    # Hilbert's boxes are no worse than Z-order's on this grid
    assert got["hilbert"]["sum_bbox_area"] <= got["zorder"]["sum_bbox_area"]


def test_bitmap_index_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT o_orderpriority, o_orderkey "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    chunks = defaultdict(list)
    for val, rid in rows:
        chunks[(val, rid // 4096)].append(rid)
    per_val = defaultdict(lambda: dict(n=0, ch=0, a=0, b=0, r=0, chosen=0))
    for (val, _c), rids in chunks.items():
        rids.sort()
        n = len(rids)
        n_runs = 1 + sum(1 for i in range(1, n) if rids[i] != rids[i - 1] + 1)
        b_array, b_bitmap, b_run = 2 + 2 * n, 512, 2 + 4 * n_runs
        if b_array <= b_bitmap and b_array <= b_run:
            cont, best = "a", b_array
        elif b_bitmap <= b_run:
            cont, best = "b", b_bitmap
        else:
            cont, best = "r", b_run
        s = per_val[val]
        s["n"] += n
        s["ch"] += 1
        s[cont] += 1
        s["chosen"] += best
    got = {r["value"]: r for r in entry.queries()["q_bitmap_index"](spark, SF).collect()}
    assert set(got) == set(per_val)
    for val, e in per_val.items():
        r = got[val]
        assert (r["n_rids"], r["n_chunks"]) == (e["n"], e["ch"])
        assert (r["n_array"], r["n_bitmap"], r["n_run"]) == (e["a"], e["b"], e["r"])
        assert (r["bytes_chosen"], r["bytes_plain"]) == (e["chosen"], e["n"] * 8)
        assert math.isclose(
            r["compression_ratio"], round(e["chosen"] / (e["n"] * 8), 6), abs_tol=1e-9
        )
        # the index must beat the plain 8-byte/rid list
        assert r["bytes_chosen"] < r["bytes_plain"]
