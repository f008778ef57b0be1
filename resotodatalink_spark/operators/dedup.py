"""Deduplication operators for large-scale document pipelines.

Beyond the reference's surface (its dedup story is the `_id` primary
key, sql.py:187): these are the operators a 100 TB training-data
pipeline needs.  All are pure DataFrame compositions — shingling and
hashing run inside whole-stage codegen (functions/hashing.py), and every
candidate-generation step is an equi-join on a hash/bucket key, never an
O(n^2) comparison:

* exact:   hash-groupBy on a content fingerprint — one shuffle.
* MinHash: shingle -> 16 permuted min-hashes -> 8 bands of 2 ->
           band-bucket equi-join (the LSH trick), then exact signature
           agreement on the candidates only.
* SimHash: frequency-weighted bit votes -> 16-bit signature ->
           pigeonhole block join (hamming <= k needs k+1 blocks, one
           must match exactly) -> exact hamming filter.
* Jaccard: distinct-shingle inverted-index join, count commons per
           pair, |A∩B| / (|A|+|B|-|A∩B|).

Skew note: hot shingles/buckets fan out quadratically; AQE skew-join
handles moderate skew, and a frequency cap on shingles (drop grams in
> max_doc_freq docs) is the standard mitigation — exposed as a knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from resotodatalink_spark.functions.hashing import (
    MINHASH_COEFS,
    MOD,
    N_BANDS,
    N_MINHASH,
    spread_sql,
)
from resotodatalink_spark.operators.spread import spread_partitions


def exact_dedup(
    df: DataFrame, fingerprint: F.Column, id_col: str = "doc_id"
) -> DataFrame:
    """Survivor (min id) + duplicate count per content fingerprint."""
    return (
        df.select(fingerprint.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").cast("int").alias("n_dupes"),
        )
    )


def shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, h): one row per word n-gram occurrence.

    Staged explode-then-project on purpose: putting the hash inside a
    higher-order ``transform`` lambda keeps it out of whole-stage
    codegen (lambdas are interpreted, no common-subexpression
    elimination), which re-evaluates split/slice per ascii() call —
    measured 10x slower at sf0.1.  Here each level is a materialized
    column and the 16-term hash projection codegens with CSE."""
    from resotodatalink_spark.functions.hashing import str_hash_sql
    from resotodatalink_spark.operators.spread import spread_partitions

    # byte-small scans feed a ~50x explode of 16-term hash chains: at
    # sf1 documents.parquet scans as TWO partitions, so the whole
    # shingle+hash stage ran on 2 of 32 cores (round-9 find, measured
    # on the bigram LM slug first: 31.4s -> 8.1s).  spread is a no-op
    # on a wide cluster scan.
    docs = spread_partitions(docs, id_col)
    toks = docs.select(F.col(id_col), F.split(text_col, " ").alias("__toks"))
    pos = toks.select(
        F.col(id_col),
        "__toks",
        F.explode(
            F.expr(f"sequence(1, greatest(size(__toks) - {n - 1}, 1))")
        ).alias("__i"),
    )
    sh = pos.select(
        F.col(id_col),
        F.expr(f"array_join(slice(__toks, __i, {n}), ' ')").alias("__sh"),
    )
    return sh.select(F.col(id_col), F.expr(str_hash_sql("__sh")).alias("h"))


def shingle_hashes_pos(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, pos, span, h): positioned word n-grams with the gram text
    kept (span dedup / winnowing need positions; the span column prunes
    away for callers that only read h).  No 1-shingle floor: documents
    shorter than ``n`` tokens contribute no rows — a padded partial gram
    has no meaningful position.  Same staged explode-then-project shape
    as :func:`shingle_hashes` (codegen + CSE, no lambda interpretation)."""
    from resotodatalink_spark.functions.hashing import str_hash_sql
    from resotodatalink_spark.operators.spread import spread_partitions

    docs = spread_partitions(docs, id_col)  # same rule as shingle_hashes
    toks = docs.select(F.col(id_col), F.split(text_col, " ").alias("__toks"))
    pos = toks.filter(F.size("__toks") >= n).select(
        F.col(id_col),
        "__toks",
        F.explode(F.expr(f"sequence(1, size(__toks) - {n - 1})")).alias("pos"),
    )
    sp = pos.select(
        F.col(id_col),
        "pos",
        F.expr(f"array_join(slice(__toks, pos, {n}), ' ')").alias("span"),
    )
    return sp.select(
        F.col(id_col), "pos", "span", F.expr(str_hash_sql("span")).alias("h")
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, m0..m15): min over shingles of each permuted hash.
    min() is duplicate-insensitive, so no distinct needed before the
    aggregate — one shuffle on id."""
    g = shingle_hashes(docs, id_col, text_col, n)
    aggs = [
        F.min((F.col("h") * a + b) % MOD).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_COEFS)
    ]
    # signatures feed self-joins downstream (bands, agreement); without
    # materialization Spark re-runs the whole shingle+hash pipeline per
    # branch (plan showed 7 exchanges) — checkpoint computes it once.
    # EAGER: both self-join sides are independent AQE query stages that
    # materialize CONCURRENTLY, so a lazy checkpoint races its own
    # materialization and each side re-derives the shingle pipeline
    # (same-session A/B sf0.1: dedup_minhash 3.40 -> 2.68s,
    # minhash_estimate_vs_exact 3.17 -> 2.22s, identical shuffle
    # bytes; optimization round 13, guide §1.1/§5)
    return g.groupBy(id_col).agg(*aggs).localCheckpoint(eager=True)


def _band_rows(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, h1, h2): one row per LSH band of each signature."""
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.col(f"m{2 * i}").alias("h1"),
                        F.col(f"m{2 * i + 1}").alias("h2"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.band", "b.h1", "b.h2")


def minhash_band_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """LSH candidate pairs: ids sharing at least one of the 8 (2-row)
    bands.  Explode to (band, h1, h2) buckets and equi-join — the
    scalable path; candidates ~ true near-dups, not n^2."""
    bands = _band_rows(sig, id_col)
    a = bands.withColumnRenamed(id_col, "doc_a")
    b = bands.withColumnRenamed(id_col, "doc_b")
    return (
        # band self-join: both sides are the full 8x-corpus band frame;
        # a broadcast build side only looks small pre-shuffle (the
        # round-7 sf10 OOM class) — pin sort-merge (spillable)
        a.join(b.hint("merge"), ["band", "h1", "h2"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_pairs_between(
    sig_a: DataFrame, sig_b: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Asymmetric LSH candidates: (doc_a from sig_a, doc_b from sig_b)
    sharing at least one band — the incremental-dedup shape (new batch
    vs stored corpus).  The corpus is never self-joined: band rows of
    the batch equi-join band rows of the corpus, so per-increment cost
    is O(batch + collisions) regardless of corpus size."""
    a = _band_rows(sig_a, id_col).withColumnRenamed(id_col, "doc_a")
    b = _band_rows(sig_b, id_col).withColumnRenamed(id_col, "doc_b")
    return a.join(b, ["band", "h1", "h2"]).select("doc_a", "doc_b").distinct()


def minhash_pairs_with_agreement(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_a, doc_b, n_common): LSH candidates + exact count of agreeing
    minhashes (the Jaccard estimate is n_common / 16)."""
    sig = minhash_signatures(docs, id_col, text_col, n)
    pairs = minhash_band_pairs(sig, id_col)
    sa = sig.select(
        F.col(id_col).alias("doc_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(N_MINHASH)]
    )
    sb = sig.select(
        F.col(id_col).alias("doc_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(N_MINHASH)]
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    return (
        # sa/sb are the corpus-size checkpointed signature frame; Scan
        # ExistingRDD size estimates fooled AQE into broadcasting such
        # frames at sf10 (round-7 find) — pin sort-merge
        pairs.join(sa.hint("merge"), "doc_a")
        .join(sb.hint("merge"), "doc_b")
        .select("doc_a", "doc_b", agree.cast("int").alias("n_common"))
    )


def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 16,
    hash_fn: str = "portable",
) -> DataFrame:
    """(id, simhash): frequency-weighted bit votes over word hashes.
    Bit j is 1 iff #(tokens with bit j set) >= #(without) — pure integer
    comparison, no float sign games.

    SIZE THE SIGNATURE TO THE CORPUS: a b-bit space saturates once
    n^2 / 2^b birthday collisions rival true pairs — the sf1 sweep
    measured 4.4M hamming<=1 pairs over 50k docs at the default 16
    bits (the oracle-checked slug keeps 16 for cross-engine
    expressibility).  At production scale use ``n_bits=62`` — the
    widest signature the two portable 31-bit spreads can feed (bits
    0..30 from spread 1, 31..61 from the independent spread 2; the
    per-bit vote for bit j<16 is identical at every width, tested).

    ``hash_fn="xxhash64"`` is the production 64-bit variant: one
    JVM-side ``xxhash64`` per token feeds all 64 bit positions
    directly (no spreads), so ``n_bits`` may go to 64 and the per-token
    cost drops from two spread expressions to one hash.  NOT oracle-
    portable (DuckDB has no xxhash64 with Spark's seed) — use it when
    cross-engine parity isn't required; the vote/block plan shape is
    identical, and the planted-pair recall at hamming<=2 matches the
    portable path on the fixture corpus (tests/test_dedup_ops.py)."""
    max_bits = 64 if hash_fn == "xxhash64" else 62
    if hash_fn not in ("portable", "xxhash64"):
        raise ValueError(f"hash_fn must be portable|xxhash64, got {hash_fn!r}")
    if not 1 <= n_bits <= max_bits:
        raise ValueError(f"n_bits must be 1..{max_bits}, got {n_bits}")
    from resotodatalink_spark.operators.spread import spread_partitions

    # same narrow-scan rule as shingle_hashes: the per-token vote
    # expressions are 2 x 16-term chains and the scan is 2 partitions
    # at sf1
    toks = spread_partitions(docs, id_col).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    from resotodatalink_spark.functions.hashing import spread2_sql, str_hash_sql

    if hash_fn == "xxhash64":
        hh = toks.select(F.col(id_col), F.xxhash64("tok").alias("hh"))
        aggs = [
            F.sum(F.expr(f"shiftright(hh, {j}) & 1")).alias(f"c{j}")
            for j in range(n_bits)
        ] + [F.count("*").alias("n")]
        votes = hh.groupBy(id_col).agg(*aggs)
        sim = sum(
            F.when(
                2 * F.col(f"c{j}") >= F.col("n"),
                F.shiftleft(F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(n_bits)
        )
        return (
            votes.select(F.col(id_col), sim.cast("long").alias("simhash"))
            # eager: feeds both sides of the block self-join — see the
            # minhash_signatures comment (round-13 concurrent-stage race)
            .localCheckpoint(eager=True)
        )

    h = str_hash_sql("tok")
    cols = [F.col(id_col), F.expr(spread_sql(h)).alias("hh")]
    if n_bits > 31:  # second spread only when high bits are sampled
        cols.append(F.expr(spread2_sql(h)).alias("hh2"))
    hh = toks.select(*cols)
    aggs = [
        F.sum(
            F.expr(
                f"shiftright(hh, {j}) & 1"
                if j < 31
                else f"shiftright(hh2, {j - 31}) & 1"
            )
        ).alias(f"c{j}")
        for j in range(n_bits)
    ] + [F.count("*").alias("n")]
    votes = hh.groupBy(id_col).agg(*aggs)
    # shiftleft on a long literal, NOT a Python int literal: 1 << 62
    # still fits a long, but the expression form keeps every bit
    # position overflow-safe and uniform
    sim = sum(
        F.when(
            2 * F.col(f"c{j}") >= F.col("n"),
            F.shiftleft(F.lit(1).cast("long"), j),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(n_bits)
    )
    return (
        votes.select(F.col(id_col), sim.cast("long").alias("simhash"))
        .localCheckpoint(eager=False)  # self-joined by simhash_pairs
    )


def simhash_block_candidates(
    sig: DataFrame, n_blocks: int, id_col: str = "doc_id", n_bits: int = 16
) -> DataFrame:
    """(doc_a, doc_b, hamming): the UNFILTERED pigeonhole candidate set
    — every pair agreeing on >= 1 of ``n_blocks`` signature blocks,
    with its exact hamming distance.  :func:`simhash_pairs` is this
    plus the threshold filter; the calibration audit reads the raw
    histogram to see how much verify work the block join generates
    per hamming bucket."""
    width = -(-n_bits // n_blocks)  # ceil
    mask = (1 << width) - 1
    blocks = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        (
                            F.shiftright(F.col("simhash"), i * width)
                            .bitwiseAND(F.lit(mask))
                        ).alias("bv"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.blk", "b.bv")
    a = blocks.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sa"), "blk", "bv"
    )
    b = blocks.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sb"), "blk", "bv"
    )
    return (
        # block self-join: same never-broadcast / sort-merge rule as
        # the band join
        a.join(b.hint("merge"), ["blk", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
        )
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_pairs(
    sig: DataFrame, max_hamming: int = 2, id_col: str = "doc_id", n_bits: int = 16
) -> DataFrame:
    """(doc_a, doc_b, hamming <= max_hamming) via pigeonhole blocking:
    split the signature into max_hamming+1 blocks; any pair within the
    hamming budget must match exactly on >= 1 block, so a per-block
    equi-join finds all candidates without an n^2 scan."""
    return simhash_block_candidates(
        sig, max_hamming + 1, id_col, n_bits
    ).filter(F.col("hamming") <= max_hamming)


def posting_join_width(g2: DataFrame, rows_per_task: int = 100_000) -> int | None:
    """Partition count for a corpus posting self-join, sized to the
    posting frame instead of the session default.

    The join's OUTPUT (candidate pairs) is what costs memory: the
    per-task pair aggregate holds its partition's distinct (doc_a,
    doc_b) keys, and with the session's default width (32 locally) the
    sf10 run spilled 25.8 GB / 3.7 GB mem/disk on a 2.4 GB shuffle
    (round-10 telemetry, BENCH_LOCAL sf10_stage_metrics) — the cause
    of the 38-164s cross-session swing the r9 verdict flagged.  Wider
    tasks shrink each concurrent hash map: peak concurrent memory is
    (running tasks) x (total pair keys / n_partitions), so 8x the
    partitions is ~8x less concurrent footprint at the same
    parallelism.  ~100k posting rows per task keeps the fan-out's
    working set in-memory at any measured SF; on a real cluster this
    is the "size shuffle partitions so tasks fit" rule applied to the
    one join whose fan-out outgrows its input.

    Returns None when the session default already suffices — driver
    SFs keep a bit-identical plan; the count() materializes the lazy
    checkpoint the join is about to reuse, so it adds no duplicated
    compute.  Capped at 4096 (the cap is ~410M posting rows per 4096
    tasks; past that, raise rows_per_task with executor memory)."""
    import math

    n = g2.count()
    spark = g2.sparkSession
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    target = math.ceil(n / rows_per_task)
    if target <= default:
        return None
    return min(target, 4096)


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    prefix_filter: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard over distinct shingle-hash sets, candidates
    from the inverted-index self-join.  The division c/(sa+sb-c) of
    exact ints is a single correctly-rounded IEEE op — engine-stable.

    ``prefix_filter=True`` switches candidate generation to PPJoin-style
    prefix filtering (Xiao et al.): under a global shingle order (the
    hash value), any pair with J >= t must collide within each doc's
    first ``sz - ceil(t*sz) + 1`` shingles, so only prefixes enter the
    self-join; candidates are then verified by counting the FULL
    intersection.  Exactness-preserving — both paths return the same
    pair set (asserted in tests).

    Default OFF after measurement: prefix filtering pays when posting
    lists are long (hot shingles drive a quadratic inverted join); on
    corpora with near-unique shingles the base join is already cheap
    and the candidate-x-full-posting verify join dominates — measured
    2x SLOWER at sf0.1 (2.7 -> 5.6s) and sf1 (21 -> 48s) here.  Flip
    it on for skewed shingle distributions (boilerplate-heavy corpora),
    ideally with a frequency-ascending prefix order.

    Also measured and REJECTED (optimization round 13): a grouped
    within-posting pair expansion — groupBy(h) + collect_list +
    higher-order i<j struct expansion — to replace the SMJ's two
    posting exchanges with one.  sf10 per-stage telemetry shows the
    SMJ's posting exchange is already written ONCE and read twice
    (ReusedExchange), so the rewrite saved nothing (shuffle write
    2375 -> 2483 MB, the struct wrapper is WIDER than the flat row)
    and the interpreted pair-expansion lambdas roughly doubled the
    wall (same-session alternating medians 37.9 -> 72.9s).  The
    byte king of this slug is the candidate-pair partial-aggregate
    exchange (fan-out-sized), which both shapes pay identically."""
    g = shingle_hashes(docs, id_col, text_col, n).distinct()
    # per-doc set size via an unordered window count: ONE repartition
    # by doc id, vs the groupBy-sizes + join-back shape's extra
    # full-stream shuffle (measured: sf1 17s -> 12.5s for the slug).
    # g2 feeds both sides of the posting self-join — materialize once
    # instead of re-running shingling per branch.  EAGER: the two join
    # sides are concurrent AQE stages; lazy raced the materialization
    # and re-shingled per side (same-session sf10 A/B: 50.7 -> 30.7s
    # median, identical 2.38 GB shuffle/stages/tasks; optimization
    # round 13, guide §1.1/§5).
    g2 = g.withColumn(
        "sz", F.count("*").over(Window.partitionBy(id_col))
    ).localCheckpoint(eager=True)
    # size-ratio prune inside the join (exactness-preserving): jaccard
    # >= t forces min(sz)/max(sz) >= t, so wildly different-sized docs
    # never reach the expensive per-pair aggregation.
    # Relative nudge on the double product (same hazard as the prefix
    # ceil below): 0.7*10 floats to 7.000000000000001, and a raw >=
    # would prune a true borderline pair whose exact ratio equals the
    # threshold.  Scaling the slack with the product keeps it exact.
    ratio_ok = (
        F.col("sza") >= (F.lit(threshold) * F.col("szb")) * F.lit(1.0 - 1e-12)
    ) & (F.col("szb") >= (F.lit(threshold) * F.col("sza")) * F.lit(1.0 - 1e-12))
    if prefix_filter:
        from pyspark.sql import Window as W

        w = W.partitionBy(id_col).orderBy("h")
        prefix = (
            g2.withColumn("rn", F.row_number().over(w))
            .filter(
                # ceil over doubles is hazardous: 0.7*10 floats to
                # 7.000000000000001 and ceils to 8, shortening the prefix
                # by one and dropping true pairs.  The nudge must be
                # RELATIVE to the product: double rounding error scales
                # with threshold*sz, so a fixed epsilon stops covering it
                # once the product outgrows epsilon/ulp.  1e-12 of the
                # product clears the ~1e-16 relative repr error with four
                # orders of margin and stays far below 1 for any feasible
                # per-document shingle count.
                F.col("rn")
                <= F.col("sz")
                - F.ceil(
                    (F.lit(threshold) * F.col("sz"))
                    * F.lit(1.0 - 1e-12)
                )
                + 1
            )
            .drop("rn")
            # eager: feeds both prefix-join sides (round-13 race note
            # on g2 above)
            .localCheckpoint(eager=True)
        )
        pa_ = prefix.select(F.col(id_col).alias("doc_a"), "h", F.col("sz").alias("sza"))
        pb_ = prefix.select(F.col(id_col).alias("doc_b"), "h", F.col("sz").alias("szb"))
        cand = (
            pa_.join(pb_.hint("merge"), "h")
            .filter((F.col("doc_a") < F.col("doc_b")) & ratio_ok)
            .select("doc_a", "doc_b", "sza", "szb")
            .distinct()
        )
        fa = g2.select(F.col(id_col).alias("doc_a"), "h")
        fb = g2.select(F.col(id_col).alias("doc_b"), "h")
        common = (
            # fa/fb read the corpus-size checkpoint — same sort-merge
            # pin as the agreement joins
            cand.join(fa.hint("merge"), "doc_a")
            .join(fb.hint("merge"), ["doc_b", "h"])
            .groupBy("doc_a", "doc_b", "sza", "szb")
            .agg(F.count("*").alias("c"))
        )
    else:
        a = g2.select(F.col(id_col).alias("doc_a"), "h", F.col("sz").alias("sza"))
        b = g2.select(F.col(id_col).alias("doc_b"), "h", F.col("sz").alias("szb"))
        width = posting_join_width(g2)
        if width:
            # explicit hash distribution on the join key: the SMJ
            # reuses it (no extra exchange), each task's pair
            # aggregate shrinks by default/width
            a = a.repartition(width, "h")
            b = b.repartition(width, "h")
        common = (
            # NEVER broadcast the posting self-join: both sides are the
            # full corpus shingle frame, which only looks small in the
            # pre-shuffle estimate — at sf10 in a long-lived JVM AQE
            # broadcast the build side and OOMed the driver (round-7
            # full-bench find, the levenshtein round-6 failure's twin).
            # Sort-merge, not shuffle-hash: SHJ builds a per-task hash
            # map of the full build partition, and 32 concurrent sf10
            # builds GC-thrashed the shared local JVM (second round-7
            # find); SMJ sorts and spills, the only shape that is safe
            # at any scale for corpus x corpus.
            a.join(b.hint("merge"), "h")
            .filter((F.col("doc_a") < F.col("doc_b")) & ratio_ok)
        )
        common = common.groupBy("doc_a", "doc_b", "sza", "szb").agg(
            F.count("*").alias("c")
        )
    return (
        common.withColumn(
            "jaccard",
            F.col("c") / (F.col("sza") + F.col("szb") - F.col("c")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """ASYMMETRIC near-dup: containment C(a in b) = |A∩B| / |A| over
    distinct shingle-hash sets — the relation Jaccard can't see.  A
    short document quoted inside a long one has high containment but
    low Jaccard (the union is dominated by B), and training pipelines
    drop the contained side, so this is a directed (doc_a, doc_b) pair
    list, not an unordered one.

    Same scale shape as ``jaccard_pairs``: inverted-index equi-join on
    the shingle hash with an exactness-preserving size prune —
    C >= t and |A∩B| <= |B| force |B| >= t*|A|, so tiny-B candidates
    never reach the per-pair aggregation (no bound the other way:
    arbitrarily large B can contain A).  The division c/|A| of exact
    ints is one correctly-rounded IEEE op — engine-stable."""
    g = shingle_hashes(docs, id_col, text_col, n).distinct()
    # same one-shuffle window-count shape as jaccard_pairs; eager for
    # the same both-sides concurrent-stage reason (round-13 A/B:
    # dedup_containment 1.81 -> 1.57s, identical shuffle)
    g2 = g.withColumn(
        "sz", F.count("*").over(Window.partitionBy(id_col))
    ).localCheckpoint(eager=True)
    a = g2.select(F.col(id_col).alias("doc_a"), "h", F.col("sz").alias("sza"))
    b = g2.select(F.col(id_col).alias("doc_b"), "h", F.col("sz").alias("szb"))
    width = posting_join_width(g2)
    if width:
        # fan-out-sized join width — see posting_join_width
        a = a.repartition(width, "h")
        b = b.repartition(width, "h")
    common = (
        # posting self-join: never broadcast, sort-merge for spill
        # safety (see jaccard_pairs)
        a.join(b.hint("merge"), "h")
        .filter(
            (F.col("doc_a") != F.col("doc_b"))
            # relative nudge: threshold*sza can round above the exact
            # product (0.7*10 -> 7.000000000000001) and silently drop a
            # true pair with containment exactly == threshold
            & (
                F.col("szb")
                >= (F.lit(threshold) * F.col("sza")) * F.lit(1.0 - 1e-12)
            )
        )
        .groupBy("doc_a", "doc_b", "sza")
        .agg(F.count("*").alias("c"))
    )
    return (
        common.withColumn("containment", F.col("c") / F.col("sza"))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def _levenshtein_salt_histogram(
    e: DataFrame,
    block_cols: tuple[str, ...],
    target_pairs: int,
    max_salt: int,
) -> DataFrame:
    """Per-(block, bucket) shard counts for ``salt='auto'``: a key with
    ``c`` exploded rows enumerates ~``c*c`` comparisons in one task;
    splitting side A into ``s`` shards bounds that at ``c*c/s``.  So
    ``s = clamp(ceil(c*c / target_pairs), 1, max_salt)`` — quadratic in
    the key's row count, which is exactly the shape of the work.  The
    histogram is a narrow map-side-combining count over the key
    columns only (no text bytes move) and is broadcast back onto both
    join sides; cardinality is #blocks x #length-buckets, bounded by
    vocabulary not corpus size, so the broadcast holds at 100 TB."""
    return (
        e.groupBy(*block_cols, "bk")
        .agg(F.count("*").alias("_kcnt"))
        .withColumn(
            "_nsalt",
            F.greatest(
                F.lit(1),
                F.least(
                    F.lit(max_salt),
                    F.ceil(
                        F.col("_kcnt") * F.col("_kcnt") / F.lit(target_pairs)
                    ),
                ),
            ).cast("int"),
        )
        .drop("_kcnt")
    )


def levenshtein_pairs(
    docs: DataFrame,
    max_distance: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    bucket_width: int | None = None,
    salt: int | str = 1,
    salt_target_pairs: int = 25_000_000,
    max_salt: int = 64,
) -> DataFrame:
    """Blocked edit-distance near-dup: every pair (a, b) in the same
    block with ``levenshtein(text_a, text_b) <= max_distance`` — the
    classic record-linkage formulation (block on a cheap key, verify
    with the expensive metric).

    Candidate generation is an EXACTNESS-PRESERVING equi-join, not a
    cross join: edit distance <= d forces ``|len(a) - len(b)| <= d``
    (each edit changes the length by at most 1), so each doc is
    assigned to its length bucket AND the next one (bucket width
    ``w > d``); any qualifying pair then shares at least one
    (block, bucket) key.  A pair can share TWO keys (both docs in the
    same base bucket), so the join keeps only the CANONICAL match —
    ``bk == max(base_bucket_a, base_bucket_b)`` — which every
    qualifying pair satisfies exactly once: no dropDuplicates, no
    shuffle of the candidate pairs at all (the only exchange is the
    2x-corpus explode partitioned by (block, bucket); candidates are
    generated and verified inside the join stage and only true pairs
    leave it).  The verify step is Spark's banded
    ``levenshtein(..., threshold)`` — O(len*d) per pair instead of
    O(len^2), returning -1 above the band so the filter is a single
    comparison.  Survives a 1000-executor scale-up wherever the
    block/bucket histogram does.

    ``salt > 1`` is the hot-block mitigation (skew_join_salted's
    playbook applied to a self-join): side A additionally keys on
    ``pmod(hash(id), salt)`` — each row lands in ONE salt shard — and
    side B replicates each row across all ``salt`` shards, so every
    qualifying pair still meets exactly once but the hottest
    (block, bucket)'s pair enumeration splits across ``salt`` tasks.
    Cost: B's explode grows x salt (input bytes, cheap); exactness is
    unchanged (pinned by the salted-equals-unsalted test).

    ``salt="auto"`` derives the shard count PER KEY from the observed
    (block, bucket) histogram (``_levenshtein_salt_histogram``):
    ``ceil(cnt^2 / salt_target_pairs)`` capped at ``max_salt``, so the
    modal length bucket of the dominant language — the key that
    concentrates a quadratic enumeration in one task at corpus scale —
    splits, while cold keys replicate nothing.  The shard count is a
    function of the join key itself (both sides read it from the same
    broadcast histogram), so the meet-exactly-once property is
    preserved per key.  When NO key is hot the auto path falls back to
    the unsalted exchange-free plan — the decision is one O(1) driver
    scalar (``max(_nsalt)``), the same bounded-collect pattern as the
    connected-components convergence check.

    Reference parity: the reference has no fuzzy matching at all (its
    dedup surface is the SQL target's DISTINCT); this is part of the
    training-pipeline layer, same family as ``jaccard_pairs``."""
    w = bucket_width or (max_distance + 1)
    if w <= max_distance:
        raise ValueError("bucket_width must exceed max_distance")
    base = (
        docs.select(
            F.col(id_col), F.col(text_col), *[F.col(c) for c in block_cols]
        )
        .withColumn("len", F.length(text_col))
        # Per-doc letter histogram for the exactness-preserving L1
        # prune (round 11): one edit changes each letter's count by at
        # most 1 and at most two letters' counts total (substitution),
        # so dist <= d forces sum_c |cnt_a(c) - cnt_b(c)| <= 2d over
        # ANY subset of characters (ignoring a character only weakens
        # the necessary condition).  Computed ONCE per doc (26
        # replace-scans, codegen, pre-explode); the per-PAIR check is
        # then ~26 integer ops vs the banded levenshtein's
        # O(len * d) ~ 10^4 — and for unrelated same-length-bucket
        # texts the expected L1 is ~hundreds >> 2d, so nearly every
        # false candidate dies before the expensive verify.  Measured
        # sf10 (500k docs, ~2e9 candidates — quadratic in copies
        # because the scaled corpus stacks identical length
        # histograms): 838.8s -> 204.5s wall, 19,789 -> 3,410
        # executor-CPU-s, identical 7,900 pairs, zero spill.  The
        # residual CPU is ~1.7us/candidate — the hash-join
        # enumeration floor, reducible only by a finer blocking key.
        .withColumn(
            "hst",
            F.expr(
                f"transform(sequence(97, 122), a -> "
                f"length({text_col}) - length(replace({text_col}, char(a), '')))"
            ),
        )
    )
    e = base.withColumn(
        "bk",
        F.explode(
            F.array(
                F.floor(F.col("len") / w), F.floor(F.col("len") / w) + 1
            )
        ),
    )
    # FLOP-heavy probe side over a byte-small scan: without the spread
    # the whole banded-verify join runs on the scan's 1-2 splits
    # (measured 180s at sf1; 17.5s on 32 cores after).
    e = spread_partitions(e, *block_cols, "bk")
    key_cols = [*block_cols, "bk"]
    hist = None
    if salt == "auto":
        hist = _levenshtein_salt_histogram(
            e, block_cols, salt_target_pairs, max_salt
        )
        # O(1) driver scalar (bounded-collect, same pattern as the CC
        # convergence check): when no key is hot, drop back to the
        # unsalted plan so the cold path stays exchange-free.
        # max over zero rows is None (empty corpus) — treat as unsalted
        if (hist.agg(F.max("_nsalt")).collect()[0][0] or 0) <= 1:
            hist = None
    join_keys = list(key_cols)
    a = e.select(
        F.col(id_col).alias("doc_a"),
        F.col(text_col).alias("text_a"),
        F.col("len").alias("len_a"),
        F.col("hst").alias("hst_a"),
        "bk",
        *[F.col(c) for c in block_cols],
    )
    b = e.select(
        F.col(id_col).alias("doc_b"),
        F.col(text_col).alias("text_b"),
        F.col("len").alias("len_b"),
        F.col("hst").alias("hst_b"),
        "bk",
        *[F.col(c) for c in block_cols],
    )
    if hist is not None:
        join_keys.append("sl")
        a = (
            a.join(F.broadcast(hist), key_cols)
            .withColumn("sl", F.pmod(F.xxhash64("doc_a"), F.col("_nsalt")))
            .drop("_nsalt")
        )
        b = (
            b.join(F.broadcast(hist), key_cols)
            .withColumn(
                "sl", F.explode(F.sequence(F.lit(0), F.col("_nsalt") - 1))
            )
            .drop("_nsalt")
        )
    elif isinstance(salt, int) and salt > 1:
        join_keys.append("sl")
        a = a.withColumn("sl", F.pmod(F.xxhash64("doc_a"), F.lit(salt)))
        b = b.withColumn("sl", F.explode(F.array(*[F.lit(s) for s in range(salt)])))
    # NEVER broadcast this self-join: the build side is the whole
    # exploded corpus, which only looks broadcast-small in the scan
    # estimate — at sf1 inside a long-lived JVM the 60MB+ build OOMed
    # the driver ("Not enough memory to build and broadcast").  The
    # shuffle-hash hint keeps the join on the (block, bucket) hash
    # partitioning the spread already established (no extra exchange)
    # and is the only plan that exists at corpus scale anyway.  When
    # salted, hint side A: B replicates each hot key's rows into every
    # salt shard, so per-task A (one shard) is nsalt-x smaller — build
    # the hash table from the small side.
    if "sl" in join_keys:
        cand = a.hint("shuffle_hash").join(b, join_keys).filter(
            _levenshtein_join_filter(max_distance, w)
        )
    else:
        cand = a.join(b.hint("shuffle_hash"), join_keys).filter(
            _levenshtein_join_filter(max_distance, w)
        )
    return (
        cand.withColumn(
            "edit_distance",
            F.levenshtein("text_a", "text_b", max_distance),
        )
        # banded levenshtein returns -1 when the distance exceeds the
        # threshold band
        .filter(F.col("edit_distance") >= 0)
        .select("doc_a", "doc_b", "edit_distance")
    )


def _levenshtein_join_filter(max_distance: int, w: int):
    return (
        (F.col("doc_a") < F.col("doc_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= F.lit(max_distance))
        # canonical-key rule: of the (up to two) shared exploded keys,
        # count the pair only at the greater base bucket
        & (
            F.col("bk")
            == F.greatest(
                F.floor(F.col("len_a") / w), F.floor(F.col("len_b") / w)
            )
        )
        # letter-histogram L1 prune (necessary condition for
        # dist <= d; see levenshtein_pairs docstring) — ordered LAST
        # among the cheap conjuncts so codegen short-circuits the
        # id/len/bucket checks first, and BEFORE the banded
        # levenshtein, which only runs on survivors.  Spelled as 26
        # explicit element_at terms, NOT aggregate(zip_with(...)):
        # higher-order functions drop out of whole-stage codegen and
        # pay per-element lambda dispatch, and this expression runs
        # once per CANDIDATE — the A/B at sf10 (500k docs) measured
        # the HOF form at 6,046s executor-CPU vs 3,376s for the
        # unrolled form (301s vs 173s wall).
        & (
            sum(
                (
                    F.abs(
                        F.element_at("hst_a", i) - F.element_at("hst_b", i)
                    )
                    for i in range(2, 27)
                ),
                start=F.abs(
                    F.element_at("hst_a", 1) - F.element_at("hst_b", 1)
                ),
            )
            <= F.lit(2 * max_distance)
        )
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id): connected components over an undirected
    pair list; cluster_id = min node id in the component.

    Iterative min-label propagation (the simple cousin of
    large-star/small-star): each round every node takes the min of its
    own label and its neighbors' labels — one shuffle join per round,
    converging in O(component diameter) rounds.  Near-dup components
    are short chains, so this terminates in a handful of rounds even at
    billions of edges; persist each round to cut lineage."""
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    edges = edges.distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # labels only ever decrease, so sum(lab) strictly decreases until
    # the fixpoint — one cheap aggregate per round beats a self-join
    # convergence check
    prev_sum = labels.agg(F.sum("lab")).collect()[0][0]
    for _ in range(max_iter):
        msgs = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lab").alias("nbr_lab"))
        )
        new_labels = labels.join(msgs, "node", "left").select(
            "node",
            F.least(F.col("lab"), F.coalesce("nbr_lab", F.col("lab"))).alias("lab"),
        )
        # localCheckpoint TRUNCATES the lineage, not just caches it —
        # without this the logical plan deepens every round and blows
        # the planner's stack after ~8 iterations (persist alone does
        # not cut the plan).  On a cluster prefer checkpoint() with a
        # reliable dir; localCheckpoint is the local/executor-disk form.
        # LAZY checkpoint + the convergence aggregate as the
        # materializing action: the sum rides the same pass that pins
        # the blocks, one job per round instead of eager's count + agg
        # (optimization round 13, guide §1.3).
        # Re-adjudicated in optimization round 14 (r13 verdict item 7):
        # same-session sf10 A/B lazy 11.31s vs eager 10.86s median at
        # identical 245.7 MB shuffle — a wash; the driver's r13
        # dedup_clusters regression does not reproduce on a quiet
        # host.  Lazy kept (one job per round).
        new_labels = new_labels.localCheckpoint(eager=False)
        cur_sum = new_labels.agg(F.sum("lab")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("lab").alias("cluster_id"))
