"""Training-data pipeline slugs beyond per-doc text stats: PII
redaction, benchmark decontamination, Gopher-style repetition filters,
class rebalancing, and deterministic global shuffle/sharding.

All pure built-in-expression plans (regexp / explode / hash-sample /
per-shard windows) — no Python in the hot path, every join keyed on a
hash or bounded benchmark set, so each survives a 1000-executor 100 TB
run.  Reference scope note: resotodatalink (reference sql.py) stops at
load/sync; these are the curation operators its users run downstream,
re-expressed Spark-first per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from resotodatalink_spark.functions.hashing import (
    SPREAD_MOD,
    SPREAD_MULT,
    duck_shingle_cte,
)
from resotodatalink_spark.registry import query
from resotodatalink_spark.operators.checkpoint import ckpt as _ckpt
from resotodatalink_spark.sources.tables import table

# deterministic doc_id -> pseudo-uniform value, shared with the oracle
# (same Knuth-multiplier spread used by sample_hash_stratified)
_SPREAD = f"(doc_id * {SPREAD_MULT} + 919380) % {SPREAD_MOD}"

_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+"
_IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


@query(
    "pii_redaction",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com at '
                  || (doc_id % 223 + 10) || '.' || (doc_id % 251) || '.'
                  || (doc_id % 241) || '.' || (doc_id % 199) AS raw
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_IP_RE}')) AS INTEGER) AS n_ips,
           regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_IP_RE}', '<IP>', 'g') AS redacted
    FROM enriched
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over text (emails, IPv4s) — pure
    regexp built-ins, codegen speed at 100 TB.  The synthetic corpus
    carries no PII, so the slug first derives a deterministic
    PII-bearing column from doc_id (same expression in the oracle),
    then runs the generic count+redact pass a real pipeline would run
    on raw crawl text.  Spark regexp_replace is global by default;
    DuckDB needs the 'g' flag — same semantics."""
    d = table(spark, sf_dir, "documents")
    raw = F.expr(
        "concat(text, ' contact user', doc_id, '@example.com at ', "
        "doc_id % 223 + 10, '.', doc_id % 251, '.', doc_id % 241, '.', "
        "doc_id % 199)"
    )
    enriched = d.select("doc_id", raw.alias("raw"))
    redacted = F.regexp_replace(
        F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return enriched.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("raw", F.lit(_IP_RE), 0)).alias("n_ips"),
        redacted.alias("redacted"),
    )


@query(
    "repetition_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tok_counts AS (
      SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY doc_id, tok
    ),
    tok_stats AS (
      SELECT doc_id, max(n) AS top_tok_n, CAST(sum(n) AS INTEGER) AS n_tokens
      FROM tok_counts GROUP BY doc_id
    ),
    grams AS (
      SELECT doc_id,
             array_to_string(list_slice(t, i, i + 1), ' ') AS g
      FROM (
        SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - 1, 1)))::BIGINT AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      )
    ),
    gram_stats AS (
      SELECT doc_id, count(*) AS n_bigrams, count(DISTINCT g) AS n_distinct
      FROM grams GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_tokens,
           round(s.top_tok_n * 1.0 / s.n_tokens, 6) AS top_token_frac,
           round(1.0 - g.n_distinct * 1.0 / g.n_bigrams, 6) AS dup_bigram_frac,
           (s.top_tok_n * 1.0 / s.n_tokens <= 0.12
            AND 1.0 - g.n_distinct * 1.0 / g.n_bigrams <= 0.2) AS keep
    FROM tok_stats s JOIN gram_stats g ON s.doc_id = g.doc_id
    """,
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality rules (Rae et al. 2021, public):
    most-frequent-token dominance and duplicated-bigram fraction per
    document, with a keep flag.  Two explode+agg branches keyed by
    doc_id joined at the end — all shuffles are on doc_id, so the plan
    is embarrassingly parallel across documents at any corpus size."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tok_stats = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("top_tok_n"),
            F.sum("n").cast("int").alias("n_tokens"),
        )
    )
    arr = d.select("doc_id", F.split("text", " ").alias("t"))
    grams = arr.select(
        "doc_id",
        F.explode(
            F.expr("sequence(1, greatest(size(t) - 1, 1))")
        ).alias("i"),
        "t",
    ).select("doc_id", F.expr("array_join(slice(t, i, 2), ' ')").alias("g"))
    gram_stats = grams.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.countDistinct("g").alias("n_distinct"),
    )
    top_frac = F.col("top_tok_n") / F.col("n_tokens")
    dup_frac = 1.0 - F.col("n_distinct") / F.col("n_bigrams")
    return tok_stats.join(gram_stats, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(top_frac, 6).alias("top_token_frac"),
        F.round(dup_frac, 6).alias("dup_bigram_frac"),
        ((top_frac <= 0.12) & (dup_frac <= 0.2)).alias("keep"),
    )


@query(
    "decontamination",
    oracle=f"""
    WITH {duck_shingle_cte("documents", "doc_id", "text", 3)},
    distinct_grams AS (SELECT DISTINCT doc_id, h FROM __hashes),
    bench AS (
      SELECT DISTINCT h FROM distinct_grams WHERE doc_id % 13 = 0
    ),
    train AS (
      SELECT doc_id, h FROM distinct_grams WHERE doc_id % 13 <> 0
    ),
    totals AS (
      SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id
    ),
    shared AS (
      SELECT t.doc_id, count(*) AS n_shared
      FROM train t JOIN bench b ON t.h = b.h
      GROUP BY t.doc_id
    )
    SELECT t.doc_id, CAST(t.n_shingles AS INTEGER) AS n_shingles,
           CAST(s.n_shared AS INTEGER) AS n_shared,
           round(s.n_shared * 1.0 / t.n_shingles, 6) AS contamination,
           s.n_shared * 2 >= t.n_shingles AS contaminated
    FROM totals t JOIN shared s ON t.doc_id = s.doc_id
    """,
)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the n-gram-overlap check every
    public LLM data pipeline runs, e.g. GPT-3 appendix C): docs whose
    word-3-gram hash sets overlap a held-out benchmark set (here:
    doc_id % 13 == 0) are flagged when >= half their shingles appear
    in the benchmark.  Scale shape: the benchmark shingle set is
    bounded (benchmark-sized, not corpus-sized) so the join is an
    equi-join against a small build side — AQE broadcasts it at
    runtime; no forced hint, no O(n^2) doc comparison."""
    from resotodatalink_spark.operators.dedup import shingle_hashes

    d = table(spark, sf_dir, "documents")
    grams = shingle_hashes(d).distinct()
    bench = (
        grams.filter(F.col("doc_id") % 13 == 0).select("h").distinct()
    )
    train = grams.filter(F.col("doc_id") % 13 != 0)
    totals = train.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_shingles")
    )
    shared = (
        train.join(bench, "h")
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_shared"))
    )
    return totals.join(shared, "doc_id").select(
        "doc_id",
        "n_shingles",
        "n_shared",
        F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias("contamination"),
        (F.col("n_shared") * 2 >= F.col("n_shingles")).alias("contaminated"),
    )


@query(
    "class_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang, n,
             (SELECT min(n) FROM counts) * 1.0 / n AS rate
      FROM counts
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {_SPREAD} < CAST(floor(r.rate * {SPREAD_MOD}) AS BIGINT)
    """,
)
def class_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: downsample every language class to the
    minority-class rate (expected counts equalize) using the same
    reproducible doc_id-hash acceptance as sample_hash_stratified —
    rand() would not be reproducible across engines, re-runs, or stage
    retries.  The per-class rate table is #classes rows — broadcast by
    AQE; the corpus is never shuffled, only filtered at scan speed."""
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    # min over an unpartitioned window: fine here because the frame is
    # the per-class count table (#classes rows), never the corpus
    rates = counts.select(
        "lang", (F.min("n").over(W.partitionBy()) / F.col("n")).alias("rate")
    )
    h = F.expr(_SPREAD)
    return (
        d.join(rates, "lang")
        # floor on BOTH sides (Spark cast-to-long truncates, DuckDB
        # CAST rounds): a doc whose spread hash lands exactly on
        # floor(rate*MOD) must get the same verdict in both engines.
        .filter(h < F.floor(F.col("rate") * SPREAD_MOD))
        .select("doc_id", "lang")
    )


@query(
    "global_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST({_SPREAD} % 64 AS INTEGER) AS shard_id,
           CAST(row_number() OVER (
             PARTITION BY {_SPREAD} % 64
             ORDER BY {_SPREAD}, doc_id) AS INTEGER) AS pos
    FROM documents
    """,
)
def global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    (every epoch-0 data loader needs one): shard = hash(doc_id) % 64,
    position = rank within shard by hash.  64 independent per-shard
    windows — one shuffle partitioned by shard, no global orderBy
    (which would serialize the corpus through a single task at 100 TB);
    shard files can then be written with partitionBy('shard_id')."""
    d = table(spark, sf_dir, "documents")
    h = F.expr(_SPREAD)
    sharded = d.select("doc_id", h.alias("__h"), (h % 64).cast("int").alias("shard_id"))
    w = W.partitionBy("shard_id").orderBy("__h", "doc_id")
    return sharded.select(
        "doc_id",
        "shard_id",
        F.row_number().over(w).cast("int").alias("pos"),
    )


@query(
    "dataset_split",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN {_SPREAD} % 100 < 80 THEN 'train'
                WHEN {_SPREAD} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by doc_id hash
    bucket — the split every training pipeline pins before anything
    else.  Hash-based (never rand()): reproducible across engines,
    re-runs, stage retries, and INCREMENTAL ingestion — a new document
    lands in a split without touching existing assignments, which a
    row_number-based split cannot guarantee.  Pure projection at scan
    speed, zero shuffles at any scale."""
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(_SPREAD) % 100
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "mixture_weights",
    oracle="""
    WITH s AS (
      SELECT source, sum(len(string_split(text, ' '))) AS tokens
      FROM documents GROUP BY source
    )
    SELECT source, CAST(tokens AS BIGINT) AS tokens,
           tokens * 1.0 / sum(tokens) OVER () AS share,
           (1.0 / count(*) OVER ()) / (tokens * 1.0 / sum(tokens) OVER ())
             AS weight
    FROM s
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture re-weighting (the DoReMi-style knob every
    multi-source training run needs): per-source token mass, its share
    of the corpus, and the sampling weight that moves the mixture to a
    uniform target (weight = target_share / current_share; >1 means
    upsample).  The heavy part is one groupBy over the corpus; the
    share/weight math runs on the #sources-row aggregate via
    unpartitioned windows — fine at any scale because the aggregate IS
    tiny, never the input."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("tokens")
    )
    w = W.partitionBy(F.lit(1))
    share = F.col("tokens") * 1.0 / F.sum("tokens").over(w)
    target = 1.0 / F.count("*").over(w)
    return per_src.select(
        "source",
        F.col("tokens").cast("long").alias("tokens"),
        share.alias("share"),
        (target / share).alias("weight"),
    )


_BLOOM_M = 8192  # bit positions
_BLOOM_K = 3  # hash functions (MINHASH_COEFS[0..2])


def _bloom_pos_sql(h: str, i: int) -> str:
    from resotodatalink_spark.functions.hashing import MINHASH_COEFS, MOD

    a, b = MINHASH_COEFS[i]
    return f"((({h}) * {a} + {b}) % {MOD}) % {_BLOOM_M}"


@query(
    "bloom_prefilter_audit",
    oracle=f"""
    WITH {duck_shingle_cte("documents", "doc_id", "text", 3)},
    distinct_grams AS (SELECT DISTINCT doc_id, h FROM __hashes),
    bench AS (SELECT DISTINCT h FROM distinct_grams WHERE doc_id % 13 = 0),
    bits AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(
            f"SELECT {_bloom_pos_sql('h', i)} AS pos FROM bench"
            for i in range(_BLOOM_K)
        )}
      )
    ),
    probes AS (
      SELECT DISTINCT h FROM distinct_grams WHERE doc_id % 13 <> 0
    ),
    hits AS (
      SELECT p.h FROM probes p
      WHERE EXISTS (SELECT 1 FROM bits b WHERE b.pos = {_bloom_pos_sql('p.h', 0)})
        AND EXISTS (SELECT 1 FROM bits b WHERE b.pos = {_bloom_pos_sql('p.h', 1)})
        AND EXISTS (SELECT 1 FROM bits b WHERE b.pos = {_bloom_pos_sql('p.h', 2)})
    ),
    truth AS (SELECT p.h FROM probes p JOIN bench b ON p.h = b.h)
    SELECT (SELECT count(*) FROM probes) AS n_probes,
           (SELECT count(*) FROM truth) AS n_true_members,
           (SELECT count(*) FROM hits) AS n_bloom_hits,
           (SELECT count(*) FROM hits) - (SELECT count(*) FROM truth)
             AS n_false_positives,
           round(((SELECT count(*) FROM hits) - (SELECT count(*) FROM truth))
                 * 1.0 /
                 ((SELECT count(*) FROM probes) - (SELECT count(*) FROM truth)),
                 6) AS fp_rate
    """,
)
def bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter prefilter calibration (the join-pruning sibling of
    the CMS audit): build an m=8192/k=3 Bloom filter over the benchmark
    shingle set (decontamination's bench side), probe every distinct
    training shingle, and report hits vs exact membership — the
    false-positive rate that decides whether shipping the filter to
    the scan side is worth it before the exact decontamination join.
    Blooms never miss a member (hits >= truth, asserted by
    construction here), so the audit is one number: wasted verify work.

    Scale shape: the bits table is bounded (<= m rows) and BROADCAST;
    the probe side checks k positions via broadcast semi-joins at scan
    speed — exactly how a production prefilter deploys (push the
    broadcast bitset into the scan, verify survivors exactly).  The
    corpus-sized work is the two distinct-shingle passes
    decontamination already pays."""
    from resotodatalink_spark.operators.dedup import shingle_hashes

    d = table(spark, sf_dir, "documents")
    # the distinct-gram frame feeds FOUR plan arms (bench, probes, the
    # truth semi-join, and transitively the bit build); without
    # materialization each arm re-runs shingling+distinct — measured
    # 18.0s -> 12.2s at sf1 with the checkpoint (the rest is the two
    # post-checkpoint distinct exchanges + three probe semi-joins)
    # eager on grams and bits: bench/probes and the k probe arms are
    # concurrent AQE stages (round-13 race; A/B sf0.1 1.80 -> 1.37s)
    grams = _ckpt(shingle_hashes(d).distinct(), eager=True)
    bench = grams.filter(F.col("doc_id") % 13 == 0).select("h").distinct()
    probes = grams.filter(F.col("doc_id") % 13 != 0).select("h").distinct()
    bits = (
        bench.select(
            F.explode(
                F.array(
                    *[F.expr(_bloom_pos_sql("h", i)) for i in range(_BLOOM_K)]
                )
            ).alias("pos")
        )
        .distinct()
        .transform(lambda d: _ckpt(d, eager=True))  # probed k times below
    )
    hit = probes
    for i in range(_BLOOM_K):
        hit = hit.join(
            F.broadcast(bits.withColumnRenamed("pos", f"p{i}")),
            F.expr(_bloom_pos_sql("h", i)) == F.col(f"p{i}"),
            "left_semi",
        )
    n_probes = probes.agg(F.count("*").alias("n_probes"))
    n_true = (
        probes.join(bench, "h", "left_semi")
        .agg(F.count("*").alias("n_true_members"))
    )
    n_hits = hit.agg(F.count("*").alias("n_bloom_hits"))
    out = n_probes.crossJoin(n_true).crossJoin(n_hits)
    fp = F.col("n_bloom_hits") - F.col("n_true_members")
    return out.select(
        "n_probes",
        "n_true_members",
        "n_bloom_hits",
        fp.alias("n_false_positives"),
        F.round(
            fp / (F.col("n_probes") - F.col("n_true_members")), 6
        ).alias("fp_rate"),
    )


# --- privacy governance: k-anonymity audit -------------------------------

_QI_BUCKET = "CAST(floor(c_acctbal / 1000) AS BIGINT)"


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH groups AS (
      SELECT c_nationkey, c_mktsegment, {_QI_BUCKET} AS bal_bucket,
             count(*) AS g
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, {_QI_BUCKET})
    SELECT count(*) AS n_groups,
           CAST(min(g) AS BIGINT) AS min_group,
           CAST(sum(CASE WHEN g < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(sum(CASE WHEN g < 5 THEN g ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           sum(CASE WHEN g < 5 THEN g ELSE 0 END) * 1.0
             / sum(g) AS risk_share
    FROM groups
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit (the release gate a training-data
    platform runs before publishing a derived table): k-anonymity of
    the quasi-identifier triple (nation, market segment, account
    balance generalized to 1000-unit buckets) — how many QI groups
    fall below k=5, and what share of ROWS they put at
    re-identification risk.

    Scale shape: one scan into a map-side-combined groupBy on the QI
    triple, then a second aggregate over the group-size frame (one
    row per QI GROUP — bounded by the generalization lattice, not
    the corpus); risk_share is one float division of exact integer
    counts.  The pii_redaction slug removes direct identifiers; this
    measures what the quasi-identifiers still leak."""
    c = table(spark, sf_dir, "customer")
    groups = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    ).agg(F.count("*").alias("g"))
    small = F.when(F.col("g") < 5, F.col("g")).otherwise(F.lit(0))
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.min("g").alias("min_group"),
        F.sum(F.when(F.col("g") < 5, 1).otherwise(0)).alias("n_small_groups"),
        F.sum(small).alias("rows_at_risk"),
        (F.sum(small) * 1.0 / F.sum("g")).alias("risk_share"),
    )


# --- weighted sampling: priority sampling (Duffield-Lund-Thorup) ----------

# Distinct additive constant (vs 919380 used by the stratified
# sampler) so the two samplers never emit the SAME pseudo-uniform for
# a doc.  NOT statistically independent: both use SPREAD_MULT, so the
# streams differ only by a fixed shift mod 2^31 — fine while the
# samplers are used separately (they are); if they are ever combined,
# switch this sampler to hashing.SPREAD_MULT2 for genuine independence.
_WS_SPREAD = f"(doc_id * {SPREAD_MULT} + 424117) % {SPREAD_MOD}"
_WS_K = 120


@query(
    "weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars,
           n_chars * {float(SPREAD_MOD)} / ({_WS_SPREAD} + 1) AS priority
    FROM documents
    ORDER BY priority DESC, doc_id
    LIMIT {_WS_K}
    """,
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without replacement via PRIORITY
    SAMPLING (Duffield-Lund-Thorup, JACM 2007): each item gets
    priority q_i = w_i / u_i for u_i uniform in (0,1], and the sample
    is the top-k by priority — the estimator a mixture pipeline uses
    to over-sample long/high-quality documents with a bounded-variance
    subset-sum guarantee.  Here w = n_chars.

    Determinism across engines/retries: u_i derives from the shared
    Knuth-multiplier spread hash (u = (h+1)/2^31, h a bijection of
    doc_id), not rand(); the priority is ONE multiply + ONE divide of
    exact integers, so the double is bit-identical in both engines and
    the rank order cannot drift.

    Scale shape: no shuffle at all — the priority is a scan-time
    expression and top-k is TakeOrderedAndProject (per-partition heaps
    + driver merge of k rows), the same plan at 100 TB."""
    d = table(spark, sf_dir, "documents")
    h = F.expr(_WS_SPREAD)
    return (
        d.select(
            "doc_id",
            "n_chars",
            (F.col("n_chars") * float(SPREAD_MOD) / (h + 1)).alias("priority"),
        )
        .orderBy(F.desc("priority"), "doc_id")
        .limit(_WS_K)
    )


# --- staged quality-gate funnel -------------------------------------------

# Gate thresholds, shared with the oracle: min tokens, min mean word
# length (x3 cross-multiplied), max stopword share (1/5), min
# type-token ratio (1/2).  All integer cross-multiplications — no float
# ratio ever compares against a boundary.
_QF_STOPWORDS = ("a", "the")


@query(
    "quality_filter_cascade",
    oracle="""
    WITH feats AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_tok,
             length(text) - (len(string_split(text, ' ')) - 1) AS tok_chars,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('a', 'the'))) AS n_stop,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents
    ),
    gates AS (
      SELECT source, n_tok,
             (n_tok >= 20) AS g1,
             (n_tok >= 20 AND tok_chars >= 3 * n_tok) AS g2,
             (n_tok >= 20 AND tok_chars >= 3 * n_tok
              AND 5 * n_stop <= n_tok) AS g3,
             (n_tok >= 20 AND tok_chars >= 3 * n_tok
              AND 5 * n_stop <= n_tok
              AND 2 * n_distinct >= n_tok) AS g4
      FROM feats
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
           CAST(sum(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordlen,
           CAST(sum(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopword,
           CAST(sum(CASE WHEN g4 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all,
           CAST(sum(CASE WHEN g4 THEN n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM gates GROUP BY source
    """,
)
def quality_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged quality-gate funnel (the C4/Gopher/RefinedWeb pattern):
    four cumulative per-document gates — length, mean word length,
    stopword share, type-token ratio — with per-source attrition counts
    after each stage, the report a curation pipeline publishes so a
    sudden per-source collapse at one gate is visible BEFORE training.
    Complements ``quality_score`` (per-doc score) and
    ``repetition_filter`` (single gate): this slug is the composed
    funnel with stage attribution.

    Exactness: every gate is an integer cross-multiplication
    (tok_chars >= 3*n_tok; 5*n_stop <= n_tok; 2*n_distinct >= n_tok) —
    no float ratios near thresholds.  Token character mass is
    length(text) - (n_tok - 1): the corpus is single-space joined, so
    chars-minus-separators needs no second pass over tokens.

    Scale shape: ONE scan; all features are per-row array expressions
    (split / filter / distinct on the token array); the funnel is a
    map-side-combined conditional aggregate onto the bounded source
    frame.  Zero joins, zero extra shuffles at any corpus size."""
    stop_list = ", ".join(f"'{w}'" for w in _QF_STOPWORDS)
    d = table(spark, sf_dir, "documents").select(
        "source",
        F.expr("split(text, ' ')").alias("t"),
        F.length("text").alias("len_text"),
    )
    feats = d.select(
        "source",
        F.size("t").alias("n_tok"),
        (F.col("len_text") - (F.size("t") - 1)).alias("tok_chars"),
        F.size(F.expr(f"filter(t, x -> x IN ({stop_list}))")).alias("n_stop"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
    )
    g1 = F.col("n_tok") >= 20
    g2 = g1 & (F.col("tok_chars") >= 3 * F.col("n_tok"))
    g3 = g2 & (5 * F.col("n_stop") <= F.col("n_tok"))
    g4 = g3 & (2 * F.col("n_distinct") >= F.col("n_tok"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return feats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        one(g1).alias("pass_len"),
        one(g2).alias("pass_wordlen"),
        one(g3).alias("pass_stopword"),
        one(g4).alias("pass_all"),
        F.sum(F.when(g4, F.col("n_tok")).otherwise(0)).alias("kept_tokens"),
    )


# --- DSIR importance weighting (round 11, second wave) --------------------------------

from resotodatalink_spark.functions.hashing import str_hash_sql as _str_hash

_DSIR_B = 64  # hashed-unigram feature buckets
_DSIR_TOPK = 25  # resample quota per source


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH db AS (
      SELECT doc_id, source, lang,
             ({_str_hash('tok')}) % {_DSIR_B} AS bucket,
             count(*) AS n
      FROM (SELECT doc_id, source, lang,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, source, lang, bucket
    ),
    raw AS (SELECT bucket, sum(n) AS cr FROM db GROUP BY bucket),
    tgt AS (SELECT bucket, sum(n) AS ct FROM db WHERE lang = 'en'
            GROUP BY bucket),
    lr AS (
      SELECT raw.bucket,
             ln((coalesce(ct, 0) + 1.0)
                / (sum(coalesce(ct, 0)) OVER () + {_DSIR_B}))
           - ln((cr + 1.0) / (sum(cr) OVER () + {_DSIR_B})) AS logratio
      FROM raw LEFT JOIN tgt USING (bucket)
    ),
    wts AS (
      SELECT doc_id, source, lang,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             round(sum(n * logratio), 6) AS weight
      FROM db JOIN lr USING (bucket)
      GROUP BY doc_id, source, lang
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY weight DESC, doc_id) AS rnk
      FROM wts
    )
    SELECT doc_id, source, lang, n_tokens, weight,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_DSIR_TOPK}
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023) with hashed-unigram features: score every document by how
    much more likely its tokens are under the TARGET distribution
    (here: the corpus's English slice) than under the raw corpus, then
    keep the top 25 per source — the published recipe for tilting a
    web-scale crawl toward a target domain without training a model.
    weight(doc) = sum_b n_b * (ln p_tgt(b) - ln p_raw(b)) over 64 hash
    buckets, add-1 smoothed.

    Scale shape: ONE corpus explode collapses straight to (doc, bucket)
    counts (map-side combine; checkpointed so the two distribution
    aggregates don't re-derive it); both bucket distributions are
    64-row aggregates OF that frame with window totals over the bounded
    frame (mutual_information's pattern); the log-ratio frame joins
    back by explicit broadcast.  Selection is a per-SOURCE rank window
    (sources scale in count, so no global sort).  The per-doc sum folds
    <= 64 doubles, rounded 6dp per the float discipline."""
    from resotodatalink_spark.operators.spread import spread_partitions

    # spread by doc_id BEFORE the explode (operators/spread.py rule —
    # no-op on a wide cluster scan): the hash chains then run at full
    # session width instead of the scan's splits, AND the doc_id hash
    # partitioning satisfies the (doc_id, source, lang, bucket)
    # clustering (subset rule), so the bucket-count aggregation rides
    # the spread exchange with NO exchange of its own — one compressed
    # text shuffle replaces the partial-agg shuffle.  Same-session
    # sf10 A/B: 26.0 -> 6.9s median, shuffle 321 -> 103 MB
    # (optimization round 13, guide §2.4/§2.6).
    d = spread_partitions(table(spark, sf_dir, "documents"), "doc_id")
    # EAGER: db feeds three subtrees (raw, tgt via the lr broadcast
    # build, wts) that AQE materializes CONCURRENTLY — a lazy
    # checkpoint races its own materialization and each consumer
    # job re-derives the corpus explode+hash (profiled: 3x the
    # 1.2 GB input scanned at sf10; eager pins blocks first and cut
    # the same-session median 31.4 -> 24.4s, identical shuffle
    # bytes; optimization round 13, guide §1.1/§5).
    db = _ckpt(
        eager=True,
        df=d.select(
            "doc_id",
            "source",
            "lang",
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .select(
            "doc_id",
            "source",
            "lang",
            (F.expr(_str_hash("tok")) % _DSIR_B).alias("bucket"),
        )
        .groupBy("doc_id", "source", "lang", "bucket")
        .agg(F.count("*").alias("n"))
    )
    raw = db.groupBy("bucket").agg(F.sum("n").alias("cr"))
    tgt = (
        db.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.sum("n").alias("ct"))
    )
    w_all = W.partitionBy()
    ct0 = F.coalesce(F.col("ct"), F.lit(0))
    lr = raw.join(tgt, "bucket", "left").select(
        "bucket",
        (
            F.log((ct0 + 1.0) / (F.sum(ct0).over(w_all) + _DSIR_B))
            - F.log((F.col("cr") + 1.0) / (F.sum("cr").over(w_all) + _DSIR_B))
        ).alias("logratio"),
    )
    wts = (
        db.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("n") * F.col("logratio")), 6).alias("weight"),
        )
    )
    rnk = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("weight"), "doc_id")
    )
    return (
        wts.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= _DSIR_TOPK)
        .select(
            "doc_id", "source", "lang", "n_tokens", "weight",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# --- temperature-scaled mixture (round 11, third wave) --------------------

_TEMP_ALPHA = 0.7  # XLM-R's multilingual sampling exponent


@query(
    "temperature_mixture",
    oracle=f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    p AS (
      SELECT source, n_docs,
             n_docs * 1.0 / sum(n_docs) OVER () AS nat_share,
             pow(n_docs * 1.0 / sum(n_docs) OVER (), {_TEMP_ALPHA})
               AS unnorm
      FROM s
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           round(nat_share, 6) AS nat_share,
           round(unnorm / sum(unnorm) OVER (), 6) AS temp_share,
           round((unnorm / sum(unnorm) OVER ()) / nat_share, 6) AS boost
    FROM p
    """,
)
def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (the XLM-R / mBERT rule:
    sample source i with p_i ∝ share_i^alpha, alpha=0.7) — the
    standard interpolation between natural proportions (alpha=1) and
    the uniform target mixture_weights computes (alpha=0): rare
    sources get boosted, dominant ones damped, without the uniform
    rule's extreme upsampling of tiny sources.  Output per source:
    natural share, temperature share, and the boost factor a sampler
    applies.

    Scale shape: one map-side-combined count by source, then all math
    on the #sources-row aggregate via unpartitioned windows (bounded
    frame — mixture_weights' pattern).  pow(x, 0.7) is the one
    libm-dependent term; all emitted floats are rounded 6dp on ~O(1)
    magnitudes, far above cross-engine last-ulp wobble."""
    d = table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = W.partitionBy(F.lit(1))
    nat = F.col("n_docs") * 1.0 / F.sum("n_docs").over(w)
    p = s.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        nat.alias("nat_share"),
        F.pow(nat, _TEMP_ALPHA).alias("unnorm"),
    )
    temp = F.col("unnorm") / F.sum("unnorm").over(w)
    return p.select(
        "source",
        "n_docs",
        F.round("nat_share", 6).alias("nat_share"),
        F.round(temp, 6).alias("temp_share"),
        F.round(temp / F.col("nat_share"), 6).alias("boost"),
    )


# --- privacy governance: l-diversity audit (round 11, third wave) ---------

_LDIV_SIZE_BUCKET = "CAST(floor(n_chars / 100) AS BIGINT)"
_LDIV_L = 2


@query(
    "l_diversity_audit",
    oracle=f"""
    WITH groups AS (
      SELECT source, {_LDIV_SIZE_BUCKET} AS size_bucket,
             count(*) AS g, count(DISTINCT lang) AS l
      FROM documents
      GROUP BY source, {_LDIV_SIZE_BUCKET})
    SELECT count(*) AS n_groups,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_diversity,
           CAST(sum(CASE WHEN l < {_LDIV_L} THEN g ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           sum(CASE WHEN l < {_LDIV_L} THEN g ELSE 0 END) * 1.0
             / sum(g) AS risk_share
    FROM groups
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006 — the
    successor gate to k-anonymity): a quasi-identifier group can be
    large enough for k-anonymity yet still leak its SENSITIVE
    attribute if every member shares one value.  Here the QI pair is
    (source, 100-char size bucket) and the sensitive attribute is
    lang: groups with fewer than l=2 distinct languages reveal their
    members' language outright.  Mirrors k_anonymity_audit's output
    shape (group count, worst l, at-risk rows/share) so the two gates
    read side-by-side.

    Scale shape: one scan into a map-side-combined groupBy on the QI
    pair with a distinct-count of the sensitive attribute (Spark
    plans the count-distinct via Expand — still one shuffle), then a
    second aggregate over the bounded group frame."""
    d = table(spark, sf_dir, "documents")
    groups = d.groupBy(
        "source",
        F.floor(F.col("n_chars") / 100).cast("long").alias("size_bucket"),
    ).agg(F.count("*").alias("g"), F.countDistinct("lang").alias("l"))
    risk = F.when(F.col("l") < _LDIV_L, F.col("g")).otherwise(F.lit(0))
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(F.when(F.col("l") < _LDIV_L, 1).otherwise(0)).alias(
            "n_low_diversity"
        ),
        F.sum(risk).alias("rows_at_risk"),
        (F.sum(risk) * 1.0 / F.sum("g")).alias("risk_share"),
    )


# --- privacy governance: t-closeness audit -------------------------------

# Same QI pair as l_diversity_audit so the three privacy gates
# (k-anonymity -> l-diversity -> t-closeness) read side-by-side.
_TCLOSE_T = 0.30


@query(
    "t_closeness_audit",
    oracle=f"""
    WITH d AS (
      SELECT source, CAST(floor(n_chars / 100) AS BIGINT) AS size_bucket,
             lang
      FROM documents),
    langd AS (SELECT lang, count(*) AS cv FROM d GROUP BY lang),
    tot AS (SELECT count(*) AS n FROM d),
    gl AS (
      SELECT source, size_bucket, lang, count(*) AS cg
      FROM d GROUP BY 1, 2, 3),
    grp AS (SELECT source, size_bucket, sum(cg) AS g FROM gl GROUP BY 1, 2),
    present AS (
      SELECT gl.source, gl.size_bucket,
             sum(abs(gl.cg * tot.n - langd.cv * grp.g)) AS present_numer,
             sum(langd.cv) AS present_cv
      FROM gl JOIN langd USING (lang)
              JOIN grp USING (source, size_bucket)
              CROSS JOIN tot
      GROUP BY 1, 2),
    tpg AS (
      SELECT grp.g,
             present.present_numer
               + grp.g * (tot.n - present.present_cv) AS numer,
             2 * grp.g * tot.n AS denom
      FROM grp JOIN present USING (source, size_bucket) CROSS JOIN tot)
    SELECT count(*) AS n_groups,
           round(max(numer * 1.0 / denom), 9) AS max_t,
           CAST(sum(CASE WHEN numer * 1.0 / denom > {_TCLOSE_T}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
           CAST(sum(CASE WHEN numer * 1.0 / denom > {_TCLOSE_T}
                    THEN g ELSE 0 END) AS BIGINT) AS rows_at_risk,
           sum(CASE WHEN numer * 1.0 / denom > {_TCLOSE_T}
               THEN g ELSE 0 END) * 1.0 / sum(g) AS risk_share
    FROM tpg
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007 —
    the third privacy gate after k-anonymity and l-diversity): a QI
    group can be diverse yet still leak if its SENSITIVE-attribute
    distribution differs sharply from the table-wide one.  For a
    categorical attribute under the equal-distance ground metric the
    earth-mover distance reduces to total variation distance, so per
    (source, 100-char size bucket) group t = 1/2 * sum_v |p_g(v) -
    p(v)| over lang, and groups with t > 0.30 are flagged.

    Float discipline: t's numerator is the exact integer
    sum |cg*n - cv*g| — langs ABSENT from a group contribute
    g*(n - sum_present cv) by algebra, so no group-x-lang spine is
    materialized — and t is formed as ONE division by the exact
    integer 2*g*n, identical operation order in both engines.

    Scale shape: ONE corpus scan feeds the (QI, lang) count, which is
    checkpointed; the lang marginal (bounded by the language domain,
    attached via broadcast), the group marginal (equi-joined on the
    QI key), and the one-row corpus total (broadcast crossJoin,
    CARTESIAN_OK) all derive from that bounded frame rather than
    rescanning the corpus; the final aggregate runs over the bounded
    group lattice."""
    d = table(spark, sf_dir, "documents").select(
        "source",
        F.floor(F.col("n_chars") / 100).cast("long").alias("size_bucket"),
        "lang",
    )
    gl = _ckpt(
        d.groupBy("source", "size_bucket", "lang").agg(
            F.count("*").alias("cg")
        )
    )
    langd = gl.groupBy("lang").agg(F.sum("cg").alias("cv"))
    tot = gl.agg(F.sum("cg").alias("n"))
    grp = gl.groupBy("source", "size_bucket").agg(F.sum("cg").alias("g"))
    present = (
        gl.join(F.broadcast(langd), "lang")
        .join(grp, ["source", "size_bucket"])
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "size_bucket")
        .agg(
            F.sum(
                F.abs(F.col("cg") * F.col("n") - F.col("cv") * F.col("g"))
            ).alias("present_numer"),
            F.sum("cv").alias("present_cv"),
        )
    )
    tpg = (
        grp.join(present, ["source", "size_bucket"])
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            (
                F.col("present_numer")
                + F.col("g") * (F.col("n") - F.col("present_cv"))
            ).alias("numer"),
            (2 * F.col("g") * F.col("n")).alias("denom"),
        )
    )
    t = F.col("numer") * 1.0 / F.col("denom")
    risk = F.when(t > _TCLOSE_T, F.col("g")).otherwise(F.lit(0))
    return tpg.agg(
        F.count("*").alias("n_groups"),
        F.round(F.max(t), 9).alias("max_t"),
        F.sum(F.when(t > _TCLOSE_T, 1).otherwise(0)).alias("n_over"),
        F.sum(risk).alias("rows_at_risk"),
        (F.sum(risk) * 1.0 / F.sum("g")).alias("risk_share"),
    )


# --- Pareto frontier (skyline) -------------------------------------------


@query(
    "pareto_frontier",
    oracle="""
    WITH agg AS (
      SELECT o_custkey AS custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS spend_cents,
             count(*) AS n_orders
      FROM orders GROUP BY 1)
    SELECT custkey, spend_cents, n_orders FROM agg a
    WHERE NOT EXISTS (
      SELECT 1 FROM agg b
      WHERE b.spend_cents >= a.spend_cents AND b.n_orders <= a.n_orders
        AND (b.spend_cents > a.spend_cents OR b.n_orders < a.n_orders))
    ORDER BY n_orders, spend_cents DESC, custkey
    """,
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier operator (Borzsony, Kossmann &
    Stocker, ICDE 2001) over per-customer order stats: the customers
    not dominated on (maximize total spend, minimize order count) —
    the data-selection shape a curation pipeline uses to pick
    best-per-cost examples (maximize quality, minimize tokens).

    The oracle states the quadratic NOT-EXISTS dominance SPEC; the
    Spark plan is the distributed frontier-of-frontiers algorithm:
    the skyline of a union is a subset of the union of skylines, so
    stage 1 prunes each of 16 deterministic custkey shards to its
    LOCAL frontier with two windows (running max-spend over strictly
    fewer orders via a range frame, plus a same-n-orders tie window),
    and stage 2 re-applies the same two windows globally to the
    surviving union.  Per-shard frontiers of randomly-ordered data
    are O(log n) expected, so the stage-2 frame is tiny; the
    single-partition stage-2 sort is over that pruned frame, never
    the corpus.

    Scale shape: one shuffle for the custkey aggregate, one for the
    shard windows, then a bounded-frame global pass — no self-join,
    no cartesian; survives 1000 executors because all corpus-sized
    work is shard-partitioned."""
    agg = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend_cents"),
            F.count("*").alias("n_orders"),
        )
    )

    local = _skyline_pass(
        agg.withColumn("shard", F.pmod(F.col("custkey"), F.lit(16))), "shard"
    ).drop("shard")
    return _skyline_pass(local).orderBy(
        "n_orders", F.desc("spend_cents"), "custkey"
    )


def _skyline_pass(df: DataFrame, *keys: str) -> DataFrame:
    """One skyline pruning pass on (maximize spend_cents, minimize
    n_orders) within each ``keys`` partition: dominated iff a
    strictly-fewer-orders row reaches my spend (range-frame running
    max), or a same-orders row strictly exceeds it (tie window).
    Module-level so the property suite can drive it batched against
    the quadratic dominance spec."""
    w_lt = (
        W.partitionBy(*keys)
        .orderBy("n_orders")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_eq = W.partitionBy(*keys, "n_orders")
    return (
        df.withColumn("m_lt", F.max("spend_cents").over(w_lt))
        .withColumn("m_eq", F.max("spend_cents").over(w_eq))
        .filter(
            (F.col("m_lt").isNull() | (F.col("m_lt") < F.col("spend_cents")))
            & (F.col("m_eq") == F.col("spend_cents"))
        )
        .drop("m_lt", "m_eq")
    )


# --- gazetteer entity tagging ---------------------------------------------

# The dictionary is the SPEC shared by both engines (generated into
# the oracle's VALUES list); in production it would be a reference
# table broadcast the same way.
_GAZETTEER = (
    ("customer", "PARTY"), ("supplier", "PARTY"),
    ("order", "DOC"), ("line", "DOC"),
    ("join", "OP"), ("scan", "OP"), ("merge", "OP"), ("hash", "OP"),
)
_GAZ_VALUES = ", ".join(f"('{t}','{e}')" for t, e in _GAZETTEER)


@query(
    "gazetteer_tagging",
    oracle=f"""
    WITH gz(term, etype) AS (VALUES {_GAZ_VALUES}),
    pos AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             unnest(generate_series(1, len(string_split(text, ' '))))::BIGINT
               AS i
      FROM documents)
    SELECT pos.doc_id, gz.term, gz.etype,
           count(*) AS cnt, CAST(min(pos.i) AS BIGINT) AS first_pos
    FROM pos JOIN gz ON pos.tok = gz.term
    GROUP BY 1, 2, 3
    ORDER BY doc_id, term
    """,
)
def gazetteer_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-based entity tagging (the gazetteer pass of a
    classic NER pipeline, and the canonical 'annotate a corpus with a
    reference list' shape — wordlist toxicity screens, product
    catalogs, ticker symbols): every token matching a typed
    dictionary term yields (doc, term, type, occurrence count, first
    position).  Complements pii_redaction's REGEX channel with the
    JOIN channel: the dictionary is data, not pattern, so it scales
    to millions of terms without recompiling anything.

    Scale shape: posexplode feeds an equi-join against the
    broadcast dictionary (at production dictionary sizes the
    broadcast stays the right plan until the dictionary itself is
    corpus-scale, at which point the same equi-join shuffles — no
    plan rewrite needed), then a map-side-combined (doc, term)
    aggregate; output is hit-sized, never corpus x dictionary."""
    d = table(spark, sf_dir, "documents")
    gz = spark.createDataFrame(
        list(_GAZETTEER), "term string, etype string"
    )
    pos = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("i0", "tok"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    return (
        pos.join(F.broadcast(gz), pos.tok == gz.term)
        .groupBy("doc_id", "term", "etype")
        .agg(
            F.count("*").alias("cnt"),
            F.min("i").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id", "term")
    )


# Reciprocal-rank fusion: 1/(60+ra) + 1/(60+rb) over two per-source
# rankings, computed as ONE exactly-rounded division of exact integers
# ((120+ra+rb) / ((60+ra)*(60+rb))) so both engines produce
# bit-identical doubles — no order-sensitive float sums, no rounding
# slop (DESIGN_NOTES float rules; 60 is the standard RRF constant).
_RRF_C = 60


@query(
    "rrf_fusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(length(text) AS INTEGER) AS n_chars_calc,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars_calc DESC, doc_id) AS rank_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY ws_tokens DESC, doc_id) AS rank_tokens
      FROM scored
    ),
    fused AS (
      SELECT doc_id, source, rank_chars, rank_tokens,
             CAST({2 * _RRF_C} + rank_chars + rank_tokens AS BIGINT) * 1.0
               / (CAST({_RRF_C} + rank_chars AS BIGINT)
                  * CAST({_RRF_C} + rank_tokens AS BIGINT)) AS rrf
      FROM ranked
    )
    SELECT doc_id, source, rank_chars, rank_tokens, rrf FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY rrf DESC, doc_id) AS rn
      FROM fused
    ) t WHERE rn <= 3
    """,
)
def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval/quality signals (the
    standard way to combine heterogeneous rankings without score
    calibration — here the char-length and token-count rankings as
    the two deterministic stand-in signals): per source, rank by each
    signal, fuse with RRF_60, keep the top 3 fused docs per source.

    Float discipline: 1/(60+ra) + 1/(60+rb) is algebraically
    (120+ra+rb)/((60+ra)(60+rb)) — exact int64 numerator/denominator
    and ONE correctly-rounded division, so the fused score (and hence
    the top-3 ordering) is bit-identical across engines; ties break
    on doc_id.

    Scale shape: ONE shuffle partitioned by source feeds all three
    rank windows (quota_sample's justification: per-source windows
    are the shard-parallel shape; a skewed mega-source is AQE
    skew-handling's job), and the final rank <= 3 filter engages
    Spark's WindowGroupLimit pushdown so the fused sort keeps only
    per-partition top-k state."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.length("text").cast("int").alias("n_chars_calc"),
        F.size(F.split("text", " ")).alias("ws_tokens"),
    )
    wa = W.partitionBy("source").orderBy(F.desc("n_chars_calc"), F.asc("doc_id"))
    wb = W.partitionBy("source").orderBy(F.desc("ws_tokens"), F.asc("doc_id"))
    ranked = scored.select(
        "doc_id",
        "source",
        F.row_number().over(wa).alias("rank_chars"),
        F.row_number().over(wb).alias("rank_tokens"),
    )
    num = (F.lit(2 * _RRF_C) + F.col("rank_chars") + F.col("rank_tokens")).cast(
        "long"
    )
    den = (F.col("rank_chars") + _RRF_C).cast("long") * (
        F.col("rank_tokens") + _RRF_C
    ).cast("long")
    fused = ranked.withColumn("rrf", num * F.lit(1.0) / den)
    wtop = W.partitionBy("source").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "source", "rank_chars", "rank_tokens", "rrf")
    )


# --- corpus-decile quantile bands per stratum -------------------------------

_QB_EDGES = list(range(1, 10))  # decile edge ranks k/10, k = 1..9

_QB_EDGES_DUCK = ",\n             ".join(
    f"min(CASE WHEN cum >= ({k} * n + 9) // 10 THEN n_chars END) AS e{k}"
    for k in _QB_EDGES
)
_QB_BAND_DUCK = " + ".join(
    f"(CASE WHEN d.n_chars > e.e{k} THEN 1 ELSE 0 END)" for k in _QB_EDGES
)


@query(
    "stratified_quantile_bands",
    oracle=f"""
    WITH buckets AS (
      SELECT n_chars, count(*) AS cnt FROM documents GROUP BY 1
    ),
    cum AS (
      SELECT n_chars,
             sum(cnt) OVER (ORDER BY n_chars
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(cnt) OVER () AS n
      FROM buckets
    ),
    edges AS (
      SELECT {_QB_EDGES_DUCK}
      FROM cum
    ),
    banded AS (
      SELECT d.lang, 1 + {_QB_BAND_DUCK} AS band
      FROM documents d CROSS JOIN edges e
    )
    SELECT lang, CAST(band AS INTEGER) AS band,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY lang) AS share
    FROM banded GROUP BY lang, band
    """,
)
def stratified_quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-decile band composition per language: exact nearest-rank
    decile edges of document length over the WHOLE corpus, then each
    stratum's share across those shared bands — the distribution-shift
    readout (which languages sit in the short tail?) that a mixture/
    curriculum sampler consumes.  Unlike ntile_deciles (per-frame
    ranks), the bands here are one corpus-wide ruler applied to every
    stratum, so shares are comparable ACROSS strata.

    Exact-quantile discipline: nearest-rank edges via the two-phase
    bucket-prefix pattern — the cumulative window runs over the
    LENGTH-DOMAIN-bounded bucket frame (distinct n_chars values, a
    domain ceiling independent of corpus size; reviewed-global-window
    ratchet entry), ranks are pure integer ceilings (k*n+9)//10, and
    band assignment compares exact integers.  The one division is the
    final share of two exact counts.

    Scale shape: scan -> map-side-combined length histogram -> bounded
    windows -> a ONE-ROW edge frame broadcast-crossJoined back onto
    the corpus (unigram_logprob's constant-append pattern; CARTESIAN_OK
    entry) -> one keyed aggregate to the bounded lang x 10 frame."""
    d = table(spark, sf_dir, "documents")
    buckets = d.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    wc = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = buckets.select(
        "n_chars",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(
            W.orderBy("n_chars").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
    )
    edges = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"({k} * n + 9) div 10"),
                    F.col("n_chars"),
                )
            ).alias(f"e{k}")
            for k in _QB_EDGES
        ]
    )
    band = F.lit(1)
    for k in _QB_EDGES:
        band = band + F.when(F.col("n_chars") > F.col(f"e{k}"), 1).otherwise(0)
    banded = d.crossJoin(F.broadcast(edges)).select(
        "lang", band.alias("band")
    )
    return banded.groupBy("lang", "band").agg(
        F.count("*").cast("long").alias("n_docs")
    ).select(
        "lang",
        F.col("band").cast("int").alias("band"),
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(W.partitionBy("lang"))
        ).alias("share"),
    )


# --- leave-one-out target encoding -------------------------------------------

# Smoothing pseudo-count for the shrunk encoding (a standard CatBoost/
# target-encoder prior weight).
_TE_M = 20


@query(
    "target_encode_loo",
    oracle=f"""
    WITH rows_t AS (
      SELECT o_orderpriority AS category,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS target
      FROM orders
    ),
    cells AS (
      SELECT category, target, CAST(count(*) AS BIGINT) AS n_rows
      FROM rows_t GROUP BY category, target
    ),
    per_cat AS (
      SELECT category, CAST(sum(n_rows) AS BIGINT) AS n,
             CAST(sum(target * n_rows) AS BIGINT) AS s
      FROM cells GROUP BY category
    ),
    gtot AS (
      SELECT CAST(sum(n_rows) AS BIGINT) AS gn,
             CAST(sum(target * n_rows) AS BIGINT) AS gs
      FROM cells
    )
    SELECT c.category, c.target, c.n_rows,
           round(CAST(p.s - c.target AS DOUBLE)
                 / nullif(CAST(p.n - 1 AS DOUBLE), 0), 6) AS loo_encoding,
           round(CAST(CAST(p.s - c.target AS DECIMAL(38,0)) * g.gn
                      + CAST({_TE_M} AS DECIMAL(38,0)) * g.gs AS DOUBLE)
                 / nullif(CAST(CAST(p.n - 1 + {_TE_M} AS DECIMAL(38,0)) * g.gn
                               AS DOUBLE), 0), 6) AS loo_smoothed
    FROM cells c
    JOIN per_cat p USING (category)
    CROSS JOIN gtot g
    ORDER BY category, target
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the order-priority category
    against the 'order finished' target, with an m-estimate shrink
    toward the global prior (the CatBoost-style categorical encoder a
    feature pipeline fits before training).  Within a category every
    row with the same target value shares one LOO encoding
    ((S - t) / (n - 1)), so the per-(category, target) frame IS the
    complete encoder output — bounded by category x {{0,1}}, never by
    corpus size — plus the row count each cell applies to.

    Float discipline: category sums and the global prior stay exact
    int64; the smoothed encoding clears its internal prior division
    by cross-multiplying ((S-t)*GN + m*GS) / ((n-1+m)*GN) in
    DECIMAL(38,0) (zipf_fit_audit's overflow discipline), so each
    output column is ONE division of exact integers (round 6).  A
    singleton category (n=1) yields NULL via the nullif fence —
    corpus-unreachable, fixture-pinned.

    Scale shape: ONE corpus scan feeding one map-side-combined
    (category, target) cell count; the per-category sums and the
    ONE-ROW global prior both RE-AGGREGATE the cell frame (bounded by
    category x {{0,1}}), so the corpus is read once and everything
    downstream is constant-size — the cell frame self-joins equi on
    category and the prior attaches via broadcast crossJoin
    (unigram_logprob's constant-append pattern, plan-guard
    allowlisted).  No windows."""
    rows_t = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("category"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("target"),
    )
    cells = _ckpt(
        rows_t.groupBy("category", "target").agg(
            F.count("*").cast("long").alias("n_rows")
        )
    )
    tgt_rows = F.sum(F.col("target") * F.col("n_rows"))
    per_cat = cells.groupBy("category").agg(
        F.sum("n_rows").cast("long").alias("n"),
        tgt_rows.cast("long").alias("s"),
    )
    glob = cells.agg(
        F.sum("n_rows").cast("long").alias("gn"),
        tgt_rows.cast("long").alias("gs"),
    )
    j = cells.join(per_cat, "category").crossJoin(F.broadcast(glob))
    dec = "DECIMAL(38,0)"
    return j.select(
        "category",
        "target",
        "n_rows",
        F.round(
            (F.col("s") - F.col("target")).cast("double")
            / F.nullif((F.col("n") - 1).cast("double"), F.lit(0.0)),
            6,
        ).alias("loo_encoding"),
        F.round(
            F.expr(
                f"CAST(CAST(s - target AS {dec}) * gn"
                f" + CAST({_TE_M} AS {dec}) * gs AS DOUBLE)"
            )
            / F.nullif(
                F.expr(f"CAST(CAST(n - 1 + {_TE_M} AS {dec}) * gn AS DOUBLE)"),
                F.lit(0.0),
            ),
            6,
        ).alias("loo_smoothed"),
    ).orderBy("category", "target")
