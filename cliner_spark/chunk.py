"""IOB tag-sequence <-> span conversion (SURVEY.md §2.9 M3/M4; reference:
code/documents.py span<->IOB helpers, approx/unverified — SURVEY.md §0).

Pure numpy over flattened tag arrays (all turns of an Arrow batch
concatenated with a parallel turn-id array) — no per-row Python. The pure-SQL
twin of M3 (posexplode + running B-count segment ids) lives in
entry_queries.q_iob_chunk's oracle.
"""

from __future__ import annotations

import numpy as np


def chunk_flat_tags(
    tags: np.ndarray, turn_ids: np.ndarray, labels: tuple[str, ...]
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | tuple[()]:
    """Flat tag ids [N] -> spans (turn_row, tok_start, tok_end, concept_type).

    Labels convention: labels[0] == 'O'; others 'B-<type>' / 'I-<type>'.
    A span is a maximal run 'B-x (I-x)*' within one turn. Decoder output
    guarantees I follows B/I of the same type, but this function re-checks
    type/turn continuity so it is also safe on arbitrary (e.g. gold) input.
    Offsets are 0-based token indices within the turn, end-inclusive
    (i2b2 offset scheme; lines/turns never crossed).
    """
    n = len(tags)
    if n == 0:
        return ()
    lab = np.asarray(labels, dtype=object)
    kind = np.asarray([l[0] for l in lab], dtype="U1")  # 'O', 'B', 'I'
    typ_of = np.asarray(["" if l == "O" else l[2:] for l in lab], dtype=object)

    k = kind[tags]
    ty = typ_of[tags]

    prev_ty = np.empty_like(ty)
    prev_ty[0] = None
    prev_ty[1:] = ty[:-1]
    same_turn_as_prev = np.zeros(n, dtype=bool)
    same_turn_as_prev[1:] = turn_ids[1:] == turn_ids[:-1]

    is_b = k == "B"
    # I that genuinely continues the previous token's span
    cont = (k == "I") & same_turn_as_prev & (ty == prev_ty)
    cont[1:] &= (k[:-1] != "O")
    # orphan I (no valid predecessor) opens its own span, like a B
    start = is_b | ((k == "I") & ~cont)

    starts = np.nonzero(start)[0]
    if len(starts) == 0:
        return ()
    # span end = last index of the maximal cont-run following each start
    non_cont = np.nonzero(~cont)[0]  # every start is non-cont; pads align
    nxt = np.searchsorted(non_cont, starts, side="right")
    ends = np.where(nxt < len(non_cont), non_cont[np.minimum(nxt, len(non_cont) - 1)] - 1, n - 1)

    # token position within turn
    turn_change = np.zeros(n, dtype=bool)
    turn_change[0] = True
    turn_change[1:] = turn_ids[1:] != turn_ids[:-1]
    turn_start_idx = np.maximum.accumulate(np.where(turn_change, np.arange(n), 0))

    rows = turn_ids[starts]
    tok_start = starts - turn_start_idx[starts]
    tok_end = ends - turn_start_idx[starts]
    return rows, tok_start.astype(np.int64), tok_end.astype(np.int64), ty[starts]


def spans_to_flat_tags(
    spans: list[tuple[int, int, int, str]],
    lengths: np.ndarray,
    labels: tuple[str, ...],
) -> np.ndarray:
    """M4 inverse: spans (turn_row, tok_start, tok_end, type) -> flat tag ids.

    Later spans overwrite earlier on conflict (callers pass non-overlapping
    gold). Used by the fixture generator and the perceptron trainer.
    """
    label_idx = {l: i for i, l in enumerate(labels)}
    n = int(lengths.sum())
    out = np.zeros(n, dtype=np.int64)  # O
    starts_of_turn = np.concatenate([[0], np.cumsum(lengths)[:-1]]) if len(lengths) else np.zeros(0, int)
    for row, s, e, typ in spans:
        base = starts_of_turn[row]
        out[base + s] = label_idx[f"B-{typ}"]
        if e > s:
            out[base + s + 1 : base + e + 1] = label_idx[f"I-{typ}"]
    return out
