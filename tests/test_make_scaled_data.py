"""The derived-corpus generator is load-bearing for the scale
evidence (sf1/sf3 sweeps), so its core invariant is pinned here: the
per-copy character maps are BIJECTIONS and pairwise DISTINCT — the
property whose violation (Caesar cycling at 26 copies) silently
inflated cross-copy near-dup counts in the first sf3 sweep.  The
formulas below are the ones in tools/make_scaled_data.py; if that
file changes its mapping, change this in lockstep."""

from __future__ import annotations

import string

LOWER = string.ascii_lowercase
DIGITS = string.digits
MULTS26 = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
MULTS10 = [1, 3, 7, 9]


def _maps(copies: int):
    out = []
    for k in range(copies):
        a26, b26 = MULTS26[(k // 26) % len(MULTS26)], k % 26
        perm_l = "".join(LOWER[(a26 * i + b26) % 26] for i in range(26))
        a10, b10 = MULTS10[(k // 10) % len(MULTS10)], k % 10
        perm_d = "".join(DIGITS[(a10 * i + b10) % 10] for i in range(10))
        out.append((perm_l, perm_d))
    return out


def test_affine_maps_are_distinct_bijections():
    maps = _maps(312)
    for perm_l, perm_d in maps:
        assert sorted(perm_l) == list(LOWER)   # letter bijection
        assert sorted(perm_d) == list(DIGITS)  # digit bijection
    # pairwise distinct letter maps for k < 312 (the documented bound);
    # the old Caesar recipe failed this at k=26 (map 26 == map 0)
    letters = [m[0] for m in maps]
    assert len(set(letters)) == len(letters), "letter maps repeat"


def test_sf1_range_matches_old_caesar():
    """Copies 1..9 (the sf1 recipe) must stay bit-identical to the
    original Caesar rotation so BENCH sf1 rounds remain comparable."""
    for k in range(1, 10):
        perm_l, perm_d = _maps(10)[k]
        assert perm_l == LOWER[k % 26:] + LOWER[: k % 26]
        assert perm_d == DIGITS[k % 10:] + DIGITS[: k % 10]


def test_cross_copy_word_overlap_bounded():
    """No MULTI-letter word of the sf0.1 vocabulary maps onto any
    vocabulary word under any copy's bijection (k=1..29) — the
    property that keeps cross-copy shingle overlap ~zero and pair
    growth linear.  Known, accepted exception: an affine map with
    b=0 (copy 26) fixes the letter 'a', so the one-letter word "a"
    maps to itself; a shared shingle then needs THREE consecutive
    colliding words ("a a a"), and the measured sf3 sweep still came
    out exactly 3.00x pairs for 3x rows (DESIGN_NOTES sf3 sweep)."""
    vocab = {"key", "agg", "row", "scan", "slow", "fast", "table",
             "value", "part", "hash", "merge", "batch", "spark", "order",
             "data", "column", "join", "small", "line", "customer",
             "query", "the", "a", "filter", "window", "group", "big",
             "vector"}
    upper = LOWER.upper()
    for k, (perm_l, perm_d) in enumerate(_maps(30)):
        if k == 0:
            continue
        rot = str.maketrans(LOWER + upper + DIGITS,
                            perm_l + perm_l.upper() + perm_d)
        collisions = {
            (w, w.translate(rot))
            for w in vocab
            if w.translate(rot) in vocab
        }
        assert collisions <= {("a", "a")}, (
            f"copy {k}: unexpected vocab collisions {collisions}"
        )
