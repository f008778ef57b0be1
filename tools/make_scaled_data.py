"""Generate sf1-scale bench data from the driver's sf0.1 parquet.

PERF-ONLY data (docs/DESIGN_NOTES.md note 14: sf0.1 walls are
stage-count-bound; volume behavior needs sf >= 1).  Correctness slugs
keep running against the driver's own /root/testdata — this derived set
exists solely so bench.py can report an sf1 section.

Scaling rules (10 copies, copy 0 == the original rows):

* fact/dim keys are shifted by copy * (max_key + 1) on BOTH sides of
  every join (orderkey in orders+lineitem, custkey in customer+orders,
  suppkey/partkey in supplier/part/lineitem) so join selectivity and
  group cardinality scale linearly, not quadratically.
* nation/region stay as-is (bounded dimensions, like the real world).
* documents get a per-copy AFFINE character bijection (letter i ->
  a*i + b mod 26 with b = k mod 26 and the multiplier a stepping
  through units of Z26 every 26 copies; digits likewise over Z10): a
  character bijection preserves token lengths and therefore the
  truncated-prefix hash's collision structure EXACTLY, so within-copy
  near-dup structure is the original's and cross-copy shingle overlap
  is zero — duplicate density stays constant as volume grows (10x
  rows => ~10x true pairs).  For k < 10 (the sf1 range) this IS the
  previous Caesar rotation bit-for-bit; the multiplier step exists
  because a pure rotation cycles at 26 copies — copies k and k+26
  shared a letter map and their cross-overlap inflated pair counts
  ~4x at 30 copies (caught by the sf3 sweep).  Distinct bijections
  are guaranteed for k < 312.  (A token prefix/suffix tag was tried
  first and rejected: it shifts every shingle's 16-char hash window
  and inflated the minhash pair count 8x through truncation
  collisions.)
* embeddings for copies >= 1 are fresh seeded-random unit-ish vectors
  (cross-copy cosine ~ 0 for 64-dim random data), and EVERY copy gets
  n//100 planted near-twin pairs (per-coordinate scale noise, cosine
  ~ 0.9998) so qualifying-pair mass at a dedup threshold >= 0.8 is
  exactly linear in copies — see _scale_embeddings.
* events shift event_id/user_id and keep the timestamp distribution.

Usage: python tools/make_scaled_data.py [dest_dir] [n_copies] [tables]
``tables`` is an optional comma-separated subset (e.g. ``documents``):
the sf10 decade sweep only exercises the dedup family, so generating
just documents keeps the 100-copy set at document scale instead of
dragging 60M lineitem rows onto disk.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(
    dest: str = "benchdata/sf1",
    copies: int = 10,
    tables: list[str] | None = None,
) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()

    def wanted(t: str) -> bool:
        return tables is None or t in tables

    def src(t: str) -> str:
        return f"'{SRC}/{t}.parquet'"

    def write(t: str, sql: str) -> None:
        # ROW_GROUP_SIZE pinned: DuckDB's COPY emits one row group per
        # output pipeline chunk, so a single-pipeline query (documents,
        # embeddings) can land 500k rows in ONE group — and Spark's
        # input splits are row-group-atomic, so every downstream scan
        # runs on ONE task no matter how many byte-range splits exist
        # (spread_partitions can't help: getNumPartitions() counts the
        # empty splits).  Caught in round 11 when a regenerated sf10
        # corpus ran document-family queries 2-4x slower with
        # byte-identical shuffle telemetry.  Pinning makes the bench
        # substrate deterministic and matches how real 100 TB tables
        # arrive (thousands of splits).
        con.execute(
            f"COPY ({sql}) TO '{dest}/{t}.parquet'"
            " (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dest}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    # bounded dims: pass through
    for t in ("region", "nation"):
        if wanted(t):
            write(t, f"SELECT * FROM {src(t)}")

    def keymax(table: str, col: str) -> int:
        return con.execute(f"SELECT max({col})+1 FROM {src(table)}").fetchone()[0]

    # every join key shifts by the SAME per-copy stride on all tables
    # that carry it, so join fan-out stays exactly the original's
    shifts = {
        "o_orderkey": keymax("orders", "o_orderkey"),
        "l_orderkey": keymax("orders", "o_orderkey"),
        "c_custkey": keymax("customer", "c_custkey"),
        "o_custkey": keymax("customer", "c_custkey"),
        "s_suppkey": keymax("supplier", "s_suppkey"),
        "l_suppkey": keymax("supplier", "s_suppkey"),
        "p_partkey": keymax("part", "p_partkey"),
        "l_partkey": keymax("part", "p_partkey"),
        "event_id": keymax("events", "event_id"),
        "user_id": keymax("events", "user_id"),
    }
    copies_rel = f"(SELECT unnest(generate_series(0, {copies - 1})) AS k)"

    def scaled(table: str) -> str:
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src(table)}").fetchall()
        ]
        sel = ", ".join(
            f"{c} + k * {shifts[c]} AS {c}" if c in shifts else c for c in cols
        )
        return f"SELECT {sel} FROM {src(table)}, {copies_rel}"

    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        if wanted(t):
            write(t, scaled(t))

    if not wanted("documents"):
        if wanted("embeddings"):
            _scale_embeddings(con, src, dest, copies)
        return
    docs_tbl = pq.read_table(f"{SRC}/documents.parquet")
    did_shift = max(docs_tbl["doc_id"].to_pylist()) + 1
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    digits = "0123456789"
    chunks = []
    for k in range(copies):
        if k == 0:
            chunks.append(docs_tbl)
            continue
        # affine bijection: identical to the old Caesar for k < 26
        # (multiplier 1), new multiplier every full rotation cycle
        mults26 = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
        a26, b26 = mults26[(k // 26) % len(mults26)], k % 26
        perm_l = "".join(lower[(a26 * i + b26) % 26] for i in range(26))
        mults10 = [1, 3, 7, 9]
        a10, b10 = mults10[(k // 10) % len(mults10)], k % 10
        perm_d = "".join(digits[(a10 * i + b10) % 10] for i in range(10))
        rot = str.maketrans(
            lower + upper + digits, perm_l + perm_l.upper() + perm_d
        )
        cols = {}
        for name in docs_tbl.column_names:
            if name == "doc_id":
                cols[name] = pa.array(
                    [d + k * did_shift for d in docs_tbl["doc_id"].to_pylist()],
                    pa.int64(),
                )
            elif name == "text":
                cols[name] = pa.array(
                    [t.translate(rot) for t in docs_tbl["text"].to_pylist()]
                )
            else:
                cols[name] = docs_tbl[name].combine_chunks()
        chunks.append(pa.table(cols).cast(docs_tbl.schema))
    pq.write_table(
        pa.concat_tables(chunks),
        f"{dest}/documents.parquet",
        row_group_size=122880,  # same rationale as the COPY sites
    )
    print(f"documents: {sum(len(c) for c in chunks)} rows")

    if wanted("embeddings"):
        _scale_embeddings(con, src, dest, copies)


def _scale_embeddings(con, src, dest: str, copies: int) -> None:
    # embeddings: copy 0 original; further copies fresh random vectors.
    #
    # PLANTED NEAR-DUPLICATES (round-10, VERDICT r9 item 4): every
    # copy — including copy 0 — gets n//100 vectors overwritten as a
    # noisy twin of the immediately preceding vector (per-coordinate
    # scale drawn from U[0.97, 1.03]).  Two properties make this the
    # realistic dedup corpus the r9 ledger veto asked for: (a)
    # cosine(v, v*s) ~ 1 - var(s)/2 ~ 0.99985, so each planted pair
    # qualifies at any dedup-sensible threshold (>= 0.8) while
    # independent 64-dim pairs at that threshold occur with
    # probability ~(1-0.8^2)^31 ~ 1e-14 — the qualifying-pair set IS
    # the planted set; and (b) the twin's angle to its source is ~1
    # degree, so a random-hyperplane sign bit flips with p ~ 0.006 and
    # a 16-bit/4-band signature misses the pair with p ~ (1-0.994^16)
    # ^4 ~ 6e-5 — ~0.1 expected misses across the full sf10 planted
    # set, and deterministic given the fixed seeds, so the banded
    # slug's recall is measurably exact.  Pairs per copy are constant
    # (n//100), cross-copy cosines ~ 0, so qualifying-pair mass is
    # exactly linear in copies: 10x copies => 10.0x pairs.
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM {src('embeddings')} ORDER BY vec_id"
    ).fetchall()
    n, dim = len(emb), len(emb[0][1])
    vid_shift = max(r[0] for r in emb) + 1
    rng = np.random.default_rng(0xBEEF)
    n_plant = n // 100
    # twin targets: vector (stride*j + 1) copies vector (stride*j) —
    # disjoint source/target index sets, so pairs never chain and the
    # planted-pair count per copy is exactly n_plant.
    stride = max(2, n // max(1, n_plant))
    plant_at = [(stride * j, stride * j + 1) for j in range(n_plant)
                if stride * j + 1 < n]

    def plant(mat: "np.ndarray", copy_seed: int) -> None:
        prng = np.random.default_rng(0xD0D0 + copy_seed)
        for src_i, dst_i in plant_at:
            scale = prng.uniform(0.97, 1.03, size=dim).astype(np.float32)
            mat[dst_i] = mat[src_i] * scale

    base = np.array(
        [np.asarray(r[1], dtype=np.float32) for r in emb], dtype=np.float32
    )
    plant(base, 0)
    ids, vecs, labels = [], [], []
    for i, r in enumerate(emb):
        ids.append(r[0]); vecs.append(base[i]); labels.append(r[2])
    for k in range(1, copies):
        fresh = rng.standard_normal((n, dim)).astype(np.float32)
        plant(fresh, k)
        for i in range(n):
            ids.append(emb[i][0] + k * vid_shift)
            vecs.append(fresh[i])
            labels.append(int(rng.integers(0, 10)))
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(
        tbl, f"{dest}/embeddings.parquet", row_group_size=122880
    )
    print(f"embeddings: {len(ids)} rows")


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    tables = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    main(dest, copies, tables)
