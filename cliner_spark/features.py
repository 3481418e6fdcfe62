"""Per-token feature extraction (SURVEY.md §2.8 F1–F7, F9; reference:
code/feature_extraction/word_features.py + wordshape.py, approx/unverified —
SURVEY.md §0).

Everything here is pure numpy/pandas over FLATTENED token arrays (all tokens
of an Arrow batch concatenated, with a parallel turn-id array) — no per-row
Python, no Spark imports. Features are hashed to indices in a fixed-dim
weight table (feature hashing), so the emission model is

    emission[n, l] = sum_f W[h_f(token_n), l]      (numpy fancy indexing)

Feature families (reference analogs):
  F1 word identity   "w=<lower>"
  F2 length bin      "len=<min(len,9)>"
  F3 mitre regexes   INITCAP ALLCAPS CAPSMIX HASDIGIT SINGLEDIGIT DOUBLEDIGIT
                     FOURDIGITS NATURALNUM REALNUM ALPHANUM HASDASH PUNCT
  F5 prefix/suffix   first/last 3 chars
  F6 word shape      char-class map 'Abc12' -> 'Xxxdd' + collapsed run form
  F8 POS tag         "pos=<tag>" closed-class + suffix heuristic (gated by
                     TagModel.use_pos, mirroring the reference's optional
                     GENIA/nltk POS features)
  F9 gazetteer flags are computed separately in tagger.py (phrase-level).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

HASH_DIM = 1 << 18
_MASK = HASH_DIM - 1

# stable 64-bit FNV-1a over utf-8 — deterministic across workers/sessions
# (python hash() is salted per-process; never use it in a distributed UDF)
_FNV_OFF = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def fnv1a(s: str) -> int:
    h = _FNV_OFF
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_bucket(prefixed: pd.Series) -> np.ndarray:
    """Vectorized-ish stable hash -> [N] int32 bucket ids. Memoized per
    distinct value so cost is O(distinct), not O(tokens)."""
    uniq = pd.unique(prefixed)
    table = {u: fnv1a(u) & _MASK for u in uniq}
    return prefixed.map(table).to_numpy(dtype=np.int64)


_MITRE = [
    ("INITCAP", re.compile(r"^[A-Z].*$")),
    ("ALLCAPS", re.compile(r"^[A-Z]+$")),
    ("CAPSMIX", re.compile(r"^[A-Za-z]*[A-Z][a-z][A-Za-z]*$|^[a-z]+[A-Z][A-Za-z]*$")),
    ("HASDIGIT", re.compile(r"^.*[0-9].*$")),
    ("SINGLEDIGIT", re.compile(r"^[0-9]$")),
    ("DOUBLEDIGIT", re.compile(r"^[0-9][0-9]$")),
    ("FOURDIGITS", re.compile(r"^[0-9][0-9][0-9][0-9]$")),
    ("NATURALNUM", re.compile(r"^[0-9]+$")),
    ("REALNUM", re.compile(r"^-?[0-9]+[.,][0-9]+$")),
    ("ALPHANUM", re.compile(r"^(?=.*[0-9])(?=.*[A-Za-z])[A-Za-z0-9]+$")),
    ("HASDASH", re.compile(r"^.*-.*$")),
    ("PUNCT", re.compile(r"^[^\w\s]+$")),
]

# F7 metric units (reference word_features.py ~L180-210 approx): bare unit
# tokens and number+unit compounds like "81mg" / "0.5ml"
METRIC_UNITS = frozenset(
    "mg ml cc mcg ug kg g l dl mmol mol iu meq mghr mgdl".split()
)
_NUM_UNIT_RE = re.compile(r"^\d+(?:[.,]\d+)?(%s)$" % "|".join(sorted(METRIC_UNITS)))


def is_metric_unit(tok_lower: str) -> bool:
    return tok_lower in METRIC_UNITS or bool(_NUM_UNIT_RE.match(tok_lower))


_SHAPE_TABLE = str.maketrans(
    {
        **{c: "X" for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"},
        **{c: "x" for c in "abcdefghijklmnopqrstuvwxyz"},
        **{c: "d" for c in "0123456789"},
    }
)
_COLLAPSE_RE = re.compile(r"(.)\1+")


def word_shape(tok: str) -> str:
    return tok.translate(_SHAPE_TABLE)


def word_shape_collapsed(tok: str) -> str:
    return _COLLAPSE_RE.sub(r"\1", word_shape(tok))


def feature_indices(tokens: pd.Series) -> list[np.ndarray]:
    """All hashed feature-bucket index arrays for a flat token Series [N].

    Returns a list of [N] int arrays (one per feature family that fired;
    non-firing binary features map to a shared NOFEAT bucket so array shapes
    stay rectangular — its weight row is trained like any other).

    All families are computed over the DISTINCT tokens of the batch and
    scattered back via integer codes — natural-language batches repeat
    tokens heavily, so per-family cost is O(vocab_of_batch), not O(tokens).
    """
    toks = tokens.fillna("")
    # factorize once: codes [N] into the distinct-token table
    codes, uniq_idx = pd.factorize(toks)
    uniq = pd.Series(uniq_idx, dtype="object")
    uniq_low = uniq.str.lower()

    def scatter(uniq_buckets: np.ndarray) -> np.ndarray:
        return uniq_buckets[codes]

    out: list[np.ndarray] = []
    out.append(scatter(hash_bucket("w=" + uniq_low)))                       # F1
    out.append(scatter(hash_bucket("len=" + uniq.str.len().clip(upper=9).astype(str))))  # F2
    out.append(scatter(hash_bucket("pre=" + uniq_low.str[:3])))             # F5
    out.append(scatter(hash_bucket("suf=" + uniq_low.str[-3:])))            # F5
    out.append(scatter(hash_bucket("shape=" + uniq.map(word_shape))))       # F6
    out.append(scatter(hash_bucket("cshape=" + uniq.map(word_shape_collapsed))))

    for name, rx in _MITRE:                                                 # F3
        fired = uniq.str.match(rx).fillna(False)
        keyed = np.where(fired, f"mitre={name}", "NOFEAT")
        out.append(scatter(hash_bucket(pd.Series(keyed))))

    from cliner_spark.stem import porter_stem                               # F4

    out.append(scatter(hash_bucket("stem=" + uniq_low.map(porter_stem))))

    fired = uniq_low.map(is_metric_unit).to_numpy(dtype=bool)               # F7
    out.append(scatter(hash_bucket(pd.Series(np.where(fired, "UNIT", "NOFEAT")))))
    return out


# F8 POS tags (SURVEY.md §2.8-F8; reference: GENIA/nltk POS-tag token
# features, optional there and off by default). Context-free closed-class +
# suffix heuristic in the spirit of the classic NLTK RegexpTagger backoff
# patterns (public): tagset fidelity is not the point — a stable,
# informative partition of the vocabulary is, since tags only feed the
# hashed emission table.
_POS_CLOSED = {
    **{w: "DT" for w in "the a an this that these those each every no".split()},
    **{
        w: "IN"
        for w in (
            "of in on at by for with from to into over under after before "
            "during without against between among per"
        ).split()
    },
    **{w: "PRP" for w in "i you he she it we they me him her us them".split()},
    **{w: "CC" for w in "and or but nor so yet".split()},
    **{w: "MD" for w in "can could may might must shall should will would".split()},
    **{w: "BE" for w in "is are was were be been being am".split()},
}
_POS_RULES = [
    ("CD", re.compile(r"^-?\d+([.,/:]\d+)*$")),
    ("PUNC", re.compile(r"^[^\w\s]+$")),
    ("VBG", re.compile(r"^\w+ing$")),
    ("VBD", re.compile(r"^\w+ed$")),
    ("RB", re.compile(r"^\w+ly$")),
    ("JJ", re.compile(r"^\w+(ous|ble|ive|ic|al|ful|less|ar|ary)$")),
    ("NNS", re.compile(r"^\w+(ses|xes|zes|ches|shes|[^su]s)$")),
]


def pos_tag(tok_lower: str) -> str:
    tag = _POS_CLOSED.get(tok_lower)
    if tag is not None:
        return tag
    for tag, rx in _POS_RULES:
        if rx.match(tok_lower):
            return tag
    return "NN"


def pos_indices(tokens: pd.Series) -> list[np.ndarray]:
    """F8 family: hashed 'pos=<tag>' bucket per token (memoized over the
    batch vocabulary like every other family). Gated by TagModel.use_pos."""
    toks = tokens.fillna("")
    codes, uniq_idx = pd.factorize(toks)
    uniq_low = pd.Series(uniq_idx, dtype="object").str.lower()
    buckets = hash_bucket("pos=" + uniq_low.map(pos_tag))
    return [buckets[codes]]


def context_indices(
    per_family: list[np.ndarray], turn_ids: np.ndarray, offsets: tuple[int, ...] = (-1, 1)
) -> list[np.ndarray]:
    """W1 context conjunction: the word-identity bucket of the token at
    relative offset o (within the same turn), rehashed with the offset tag.
    Tokens whose neighbor falls outside the turn get a boundary bucket."""
    word_idx = per_family[0]
    n = len(word_idx)
    out = []
    bound = fnv1a("ctx=BOUNDARY") & _MASK
    for o in offsets:
        shifted = np.full(n, bound, dtype=np.int64)
        if o < 0:
            ok = np.arange(n) + o >= 0
            ok &= np.roll(turn_ids, -o) == turn_ids  # same turn
            src = np.roll(word_idx, -o)
        else:
            ok = np.arange(n) + o < n
            ok &= np.roll(turn_ids, -o) == turn_ids
            src = np.roll(word_idx, -o)
        # rehash (bucket, offset) -> new bucket; cheap integer mix (uint64)
        mix_const = np.uint64((o & 0xFF) * 0x9E3779B9)
        mixed = (
            (src.astype(np.uint64) * np.uint64(_FNV_PRIME & 0xFFFFFFFF)) ^ mix_const
        ).astype(np.int64) & _MASK
        shifted[ok] = mixed[ok]
        out.append(shifted)
    return out


def emissions_from_indices(
    fam_indices: list[np.ndarray], W: np.ndarray
) -> np.ndarray:
    """Sum hashed-feature weight rows -> [N, L] emission scores."""
    n = len(fam_indices[0])
    em = np.zeros((n, W.shape[1]), dtype=np.float32)
    for idx in fam_indices:
        em += W[idx]
    return em
