"""Round-13 optimization invariants: the rewritten driver-loop
internals (literal-inlined picks/merges) must stay bit-equal to the
column-based forms they replaced.

The full-value proofs are the tri-SF oracle gates (the slugs'
CORRECTNESS rows); these tests pin the two equivalence claims the
rewrites rest on, so a future edit cannot silently break them:

1. ``dot_lit_spark`` (driver-collected vector inlined as double
   literals) performs the identical IEEE op sequence as ``dot_spark``
   against the same vector stored in a column.
2. The BPE literal fold (merge pair inlined as string literals) equals
   the old broadcast-column fold for the same pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from resotodatalink_spark.functions import vectors as V


def _vecs(spark, n=8, dim=V.EMBED_DIM):
    """Deterministic float32 arrays with awkward mantissas."""
    rows = [
        (
            i,
            [
                float((i * 31 + j * 17 + 3) % 101) / 7.0 - 5.0
                for j in range(dim)
            ],
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, raw array<double>")
    return df.select(
        "vec_id", F.col("raw").cast("array<float>").alias("embedding")
    )


def test_dot_lit_matches_dot_column(spark):
    e = _vecs(spark)
    probe = e.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    # column form: cross join the probe row in (the old mmr shape)
    q = e.filter(F.col("vec_id") == 3).select(F.col("embedding").alias("qv"))
    col_form = (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", V.dot_spark("embedding", "qv").alias("d"))
        .collect()
    )
    lit_form = e.select(
        "vec_id", V.dot_lit_spark("embedding", probe).alias("d")
    ).collect()
    col_map = {r["vec_id"]: r["d"] for r in col_form}
    lit_map = {r["vec_id"]: r["d"] for r in lit_form}
    assert col_map.keys() == lit_map.keys()
    for k in col_map:
        # bit-equality, not approx: the chains must be the same IEEE ops
        assert col_map[k] == lit_map[k], (k, col_map[k], lit_map[k])


def test_bpe_literal_fold_matches_column_fold(spark):
    from resotodatalink_spark.queries.text import _bpe_fold

    words = spark.createDataFrame(
        [("banana",), ("anna",), ("aaa",), ("ban",), ("a",)], "word string"
    ).select(
        "word",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("toks"),
    )
    pair = spark.createDataFrame([("a", "n")], "l string, r string")
    old = (
        words.crossJoin(F.broadcast(pair))
        .select("word", F.expr(_bpe_fold("toks", "l", "r", "spark")).alias("toks"))
        .collect()
    )
    new = words.select(
        "word", F.expr(_bpe_fold("toks", "'a'", "'n'", "spark")).alias("toks")
    ).collect()
    assert {r["word"]: r["toks"] for r in old} == {
        r["word"]: r["toks"] for r in new
    }
    # the greedy no-chain rule survives the literal form
    folded = {r["word"]: r["toks"] for r in new}
    assert folded["banana"] == ["b", "an", "an", "a"]
    assert folded["aaa"] == ["a", "a", "a"]  # (a,n) never fires


def test_span_minmax_dup_set_matches_count_distinct(spark):
    """A min(doc_id) <> max(doc_id) rewrite of dup_span_merge's
    dup-gram filter was evaluated in round 13 and REVERTED on byte
    evidence (wider partials, +80% shuffle at sf10 — see the source
    comment).  This test records the equivalence fact the evaluation
    rested on: the two predicates select the IDENTICAL h set (>= 2
    distinct ids iff the extremes differ), pinned on a frame with
    every branch — single-doc grams, same-doc repeats, cross-doc
    repeats — so a future retry at different corpus statistics starts
    from proven ground."""
    g = spark.createDataFrame(
        [
            (1, 10),  # h=10 only in doc 1 (twice: same-doc repeat)
            (1, 10),
            (2, 20),  # h=20 in docs 2 and 3 (cross-doc)
            (3, 20),
            (3, 30),  # h=30 only in doc 3, once
            (4, 20),  # h=20 also in doc 4
        ],
        "doc_id bigint, h bigint",
    )
    old = {
        r["h"]
        for r in g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    }
    new = {
        r["h"]
        for r in g.groupBy("h")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .collect()
    }
    assert old == new == {20}


def test_jl_diff_array_chain_bit_equal(spark):
    """jl_projection_audit's 17 chains were rewritten over a shared
    zip_with difference array.  Reusing the one subtraction per element
    must be BIT-equal to re-expanding CAST(a_i)-CAST(b_i) inside every
    chain (same casts, same op order) — pin it on awkward-mantissa
    float32 pairs for every plane and the L2 chain."""
    from resotodatalink_spark.queries.similarity import (
        _JL_K,
        _jl_diff_dot,
        _jl_diff_dot_arr,
        _l2_from_diff,
        _l2_spark,
    )

    df = _vecs(spark, n=6)
    a = df.select(F.col("vec_id"), F.col("embedding").alias("ea"))
    b = df.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("eb")
    )
    j = a.join(b, "vec_id").withColumn(
        "df_",
        F.expr("zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"),
    )
    exprs = [(_l2_spark("ea", "eb", V.EMBED_DIM), _l2_from_diff("df_", V.EMBED_DIM))]
    exprs += [
        (
            _jl_diff_dot(V.DEDUP_PLANES[p], "ea", "eb", "element_at"),
            _jl_diff_dot_arr(V.DEDUP_PLANES[p], "df_"),
        )
        for p in range(_JL_K)
    ]
    sel = j.select(
        *[F.expr(o).alias(f"o{i}") for i, (o, _) in enumerate(exprs)],
        *[F.expr(n).alias(f"n{i}") for i, (_, n) in enumerate(exprs)],
    )
    for r in sel.collect():
        for i in range(len(exprs)):
            assert r[f"o{i}"] == r[f"n{i}"], (i, r[f"o{i}"], r[f"n{i}"])


def test_sparse_hashed_key_matches_string_reference(spark, tmp_path):
    """sparse_cosine_pairs groups tf/df by ``xxhash64(bigram)`` instead
    of the bigram string (round-13 shuffle-width optimization, guide
    §2.3): absent a 64-bit collision inside the corpus vocabulary the
    pair set and every cosine are IDENTICAL to the string-keyed
    computation.  Pin that with an exact Python string-keyed reference
    of the same tf-idf pipeline on a corpus that exercises shared
    8-token shingles, repeated bigrams, and a candidate-less doc."""
    import math

    docs = [
        (1, "a b c d e f g h i j k l"),
        (2, "a b c d e f g h i j k z"),
        (3, "z y x w v u t s r q p o"),
        (4, "z y x w v u t s r q p n"),
        (5, "m m m m m m m m m m m m"),
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    from resotodatalink_spark.queries.similarity import (
        _SPARSE_TAU,
        sparse_cosine_pairs,
    )

    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in sparse_cosine_pairs(spark, str(tmp_path)).collect()
    }

    # string-keyed reference: tf, df, w = tf * ln(n/df), candidates by
    # shared 8-token shingle, full weighted cosine
    n = len(docs)
    toks = {d: t.split(" ") for d, t in docs}
    tf: dict = {}
    for d, ts in toks.items():
        for i in range(len(ts) - 1):
            k = (d, ts[i] + "_" + ts[i + 1])
            tf[k] = tf.get(k, 0) + 1
    df: dict = {}
    for _, b in tf:
        df[b] = df.get(b, 0) + 1
    w = {k: c * math.log(float(n) / df[k[1]]) for k, c in tf.items()}
    sh = {
        d: {" ".join(ts[i : i + 8]) for i in range(len(ts) - 7)}
        for d, ts in toks.items()
    }
    expect = {}
    for a in toks:
        for b in toks:
            if a < b and sh[a] & sh[b]:
                wa = {k[1]: v for k, v in w.items() if k[0] == a}
                wb = {k[1]: v for k, v in w.items() if k[0] == b}
                dot = sum(wa[t] * wb[t] for t in set(wa) & set(wb))
                na = math.sqrt(sum(v * v for v in wa.values()))
                nb = math.sqrt(sum(v * v for v in wb.values()))
                if na > 0 and nb > 0 and dot / (na * nb) >= _SPARSE_TAU:
                    expect[(a, b)] = dot / (na * nb)
    assert set(got) == set(expect), (set(got), set(expect))
    for k, v in expect.items():
        # the slug rounds to 6 decimals; the reference sums in a
        # different addend order, so allow one ulp of the rounding
        assert abs(got[k] - v) <= 2e-6, (k, got[k], v)


def test_packed_node_labels_match_string_concat(spark):
    """graph_shortest_paths runs its BFS on packed-long node ids
    (tag<<60 | key<<4 | linenumber) and rebuilds the prefixed string
    only on the output (round-13 narrower-types optimization).  Pin
    the round trip: for adversarial keys (0, 1, large, max linenumber)
    the packed->label reconstruction is bit-identical to the original
    concat encoding, and packing is injective."""
    from pyspark.sql import functions as F

    rows = [
        (0, 1), (1, 1), (7, 7), (599999999, 7), (123456789, 3),
        (2 ** 40, 1), (999, 4),
    ]
    df = spark.createDataFrame(rows, "k bigint, line int")
    C, O, L, S = (1 << 60), (2 << 60), (3 << 60), (4 << 60)
    packed = {
        "C": F.lit(C) + F.col("k") * 16,
        "O": F.lit(O) + F.col("k") * 16,
        "L": F.lit(L) + F.col("k") * 16 + F.col("line").cast("long"),
        "S": F.lit(S) + F.col("k") * 16,
    }
    sel = df.select(
        "k",
        "line",
        *[v.cast("long").alias(f"p{t}") for t, v in packed.items()],
    )

    def label(col):
        tag = F.shiftright(F.col(col), 60)
        key = F.shiftright(F.col(col), 4).bitwiseAND(F.lit((1 << 56) - 1))
        line = F.col(col).bitwiseAND(F.lit(15))
        return (
            F.when(tag == 1, F.concat(F.lit("C"), key.cast("string")))
            .when(tag == 2, F.concat(F.lit("O"), key.cast("string")))
            .when(
                tag == 3,
                F.concat(
                    F.lit("L"), key.cast("string"),
                    F.lit("-"), line.cast("string"),
                ),
            )
            .otherwise(F.concat(F.lit("S"), key.cast("string")))
        )

    out = sel.select(
        "k", "line", *[label(f"p{t}").alias(f"s{t}") for t in "COLS"]
    ).collect()
    seen = set()
    for r in out:
        assert r["sC"] == f"C{r['k']}"
        assert r["sO"] == f"O{r['k']}"
        assert r["sL"] == f"L{r['k']}-{r['line']}"
        assert r["sS"] == f"S{r['k']}"
    packs = sel.collect()
    for r in packs:
        for t in "COLS":
            v = r[f"p{t}"]
            assert v not in seen, (t, v)
            seen.add(v)


def test_kn_array_pairing_matches_lead_window(spark):
    """kneser_ney_bigram pairs adjacent tokens in-array before the
    explode (round-13 shuffle removal); pin that the pair MULTISET it
    produces equals the old lead-window form on a corpus with repeated
    bigrams, single-token docs (no pairs), and empty-ish docs."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = [
        (1, "a b a b a"),
        (2, "x"),
        (3, "y y"),
        (4, "p q r p q"),
    ]
    d = spark.createDataFrame(docs, "doc_id bigint, text string")

    # old: lead window over (doc_id, position)
    pos = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("i", "tok"))
    old = (
        pos.withColumn("w2", F.lead("tok").over(W.partitionBy("doc_id").orderBy("i")))
        .filter(F.col("w2").isNotNull())
        .groupBy(F.col("tok").alias("w1"), "w2")
        .agg(F.count("*").alias("c12"))
    )
    # new: in-array adjacency
    arr = d.select(F.split("text", " ").alias("a"))
    new = (
        arr.filter(F.size("a") >= 2)
        .select("a", F.explode(F.expr("sequence(1, size(a) - 1)")).alias("i"))
        .select(
            F.element_at("a", F.col("i")).alias("w1"),
            F.element_at("a", F.col("i") + 1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    o = {(r["w1"], r["w2"]): r["c12"] for r in old.collect()}
    n = {(r["w1"], r["w2"]): r["c12"] for r in new.collect()}
    assert o == n, (o, n)
    assert o[("a", "b")] == 2 and o[("y", "y")] == 1
