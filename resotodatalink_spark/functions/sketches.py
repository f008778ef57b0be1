"""Portable HyperLogLog building blocks (Flajolet et al. 2007), shared
by the Spark implementation and its DuckDB oracle.

Neither engine's native HLL is oracle-checkable (Spark's
``approx_count_distinct`` and DuckDB's ``approx_count_distinct`` keep
engine-private register layouts), so — like the KMV sketch beside it
(queries/relational.py distinct_kmv_estimate) — the registers are built
from an md5-derived 60-bit hash with plain SQL arithmetic that is
bit-identical across engines:

* ``hv`` uniform in [0, 2^60): first 15 hex chars of md5(key);
* bucket = hv % m (m = 2^b registers), w = hv // m (60-b bits);
* rank = position of w's leftmost 1-bit in those 60-b bits (w == 0 =>
  61-b), expressed as a literal integer CASE chain — pure comparisons,
  whole-stage codegen on Spark, vectorized on DuckDB;
* the register harmonic sum is kept EXACT-INTEGER by scaling: each
  register contributes 2^(R+1-rank) (R = 60-b), empty registers
  2^(R+1); the sum stays < m * 2^(R+1) <= 2^63, so it is
  order-insensitive — no float-summation nondeterminism across
  partitions or engines.  The only float ops are one division and one
  floor at the very end, identical single IEEE ops on both engines.

At cluster scale the register frame is the whole state: m rows after
one map-side-combined groupBy, mergeable by construction (union =
max-merge per bucket), so the sketch composes across partitions,
tables, and days exactly like production HLL pipelines.
"""

from __future__ import annotations

HLL_B = 7  # 2^7 = 128 registers: std err 1.04/sqrt(128) ~= 9.2%
HLL_M = 1 << HLL_B
HLL_R = 60 - HLL_B  # bit width of w; rank in 1..R+1

# alpha_m * m^2 * 2^(R+1) as one exact double literal (repr round-trips,
# so both engines parse the identical IEEE value).
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_NUMERATOR = repr(HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_R + 1)))


def hll_hash_sql(key: str, dialect: str) -> str:
    """60-bit uniform hash of ``key``: first 15 hex chars of md5 (the
    KMV slug's portable-hash pattern).  The hex->int step is the one
    dialect split: Spark has conv(hex, 16, 10), DuckDB casts an
    0x-prefixed literal."""
    if dialect == "spark":
        return (
            f"CAST(conv(substring(md5(CAST({key} AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)"
        )
    return (
        f"CAST(concat('0x', substring(md5(CAST({key} AS VARCHAR)), 1, 15))"
        " AS BIGINT)"
    )


def hll_rank_sql(w: str) -> str:
    """Leftmost-1-bit position of the (60-b)-bit value ``w`` as a
    literal CASE chain (rank 1 = top bit set, R+1 = w == 0)."""
    arms = " ".join(
        f"WHEN {w} >= {1 << (HLL_R - k)} THEN {k}" for k in range(1, HLL_R + 1)
    )
    return f"CASE {arms} ELSE {HLL_R + 1} END"


def hll_term_sql(rank: str, dialect: str) -> str:
    """Scaled integer register term 2^(R+1-rank)."""
    if dialect == "spark":
        return f"shiftleft(CAST(1 AS BIGINT), {HLL_R + 1} - {rank})"
    return f"(CAST(1 AS BIGINT) << ({HLL_R + 1} - {rank}))"


HLL_EMPTY_TERM = 1 << (HLL_R + 1)  # empty register: rank 0 => 2^(R+1)
