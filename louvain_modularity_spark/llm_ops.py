"""LLM-data-pipeline operators (SURVEY.md §2.9): deduplication,
similarity search, text analysis — each designed as a scale path first
(pure built-in DataFrame ops, shuffle-conscious), then given a DuckDB
oracle where the math is engine-portable.

Dedup ladder (cheap → expensive):
  exact (sha2 groupBy)  →  minhash+LSH (bucketed candidate join)
  →  simhash  →  n-gram Jaccard verify  →  embedding-cosine near-dup.
At 100 TB only LSH-bucketed joins are viable: candidates meet in
hash-partitioned band buckets instead of an O(n²) cross join.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves pandas_udf string annotations)
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .session import fan_out, lineage_cut

from .sources import load

# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def tokens_of(df: DataFrame) -> DataFrame:
    """(doc_id, pos, token) — whitespace tokenization, 1-based pos.

    Deliberately NOT fanned out (r19 A/B): the explode itself is cheap
    JVM work, and for every tokenizer consumer the measured cost of an
    extra round-robin exchange (+0.4 s: shuffle + 32-task stages)
    exceeded the single-task explode time it parallelized. Only the
    md5-per-shingle minhash path clears that bar — see
    minhash_sketches_wide."""
    return df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies (tokenize → explode → count)."""
    d = load(spark, sf_dir, "documents")
    return (
        tokens_of(d)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"), F.countDistinct("doc_id").alias("df"))
    )


ORACLE_TEXT_TOKENS = """
SELECT token, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split + a BPE-ish regex
    segmentation (alnum runs)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.split("text", "[^a-z0-9]+")).alias("n_re_tokens"),
        F.length("text").alias("n_chars"),
    )


ORACLE_TOKEN_COUNT = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER)                AS n_ws_tokens,
       CAST(len(string_split_regex(text, '[^a-z0-9]+')) AS INTEGER) AS n_re_tokens,
       CAST(length(text) AS INTEGER)                                AS n_chars
FROM documents
"""


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf per (doc, term): idf = ln((1+N)/(1+df)) + 1 (smoothed)."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_of(d).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar: fold into the expression as a literal
    return (
        tf.join(df_, "token")
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf") * (F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0), 6
            ).alias("tfidf"),
        )
    )


def _oracle_tfidf(n_docs_expr: str = "(SELECT COUNT(*) FROM documents)") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> '' GROUP BY 1, 2
),
dfreq AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks WHERE token <> '' GROUP BY 1
)
SELECT tf.doc_id, tf.token, tf.tf,
       ROUND(tf.tf * (LN((1.0 + {n_docs_expr}) / (1.0 + dfreq.df)) + 1.0), 6) AS tfidf
FROM tf JOIN dfreq ON tf.token = dfreq.token
"""


def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus statistics."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias("avg_chars"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
    )


ORACLE_LANG_STATS = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY lang, source
"""


#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic (the corpus is synthetic, so most docs resolve 'unknown' —
#: the operator shape is what matters)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist"),
    "en": ("the", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "les", "et", "des", "une"),
    "zh": ("de", "le", "shi", "wo", "bu"),
}


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language identification: argmax language by
    stopword occurrences, ties → lexicographically smallest language,
    no hits → 'unknown'."""
    d = load(spark, sf_dir, "documents")
    sw = spark.createDataFrame(
        [(lang, w) for lang, ws in LANG_STOPWORDS.items() for w in ws],
        "sw_lang STRING, token STRING",
    )
    hits = (
        tokens_of(d)
        .join(F.broadcast(sw), "token")
        .groupBy("doc_id", "sw_lang")
        .agg(F.count("*").alias("hits"))
    )
    # per-doc winner as a map-side-combinable max_by (r11): same tie
    # order the window had — most hits, then lexicographically first
    # language via min_by on the (negated-hits, lang) struct
    best = hits.groupBy("doc_id").agg(
        F.min_by("sw_lang", F.struct((-F.col("hits")).alias("nh"), "sw_lang")).alias(
            "sw_lang"
        ),
        F.max("hits").alias("hits"),  # the winner's count, by definition
    )
    return d.select("doc_id", "lang").join(best, "doc_id", "left").select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        F.coalesce("sw_lang", F.lit("unknown")).alias("pred_lang"),
        F.coalesce("hits", F.lit(0)).alias("hits"),
    )


def _oracle_lang_id() -> str:
    values = ", ".join(
        f"('{lang}', '{w}')" for lang, ws in LANG_STOPWORDS.items() for w in ws
    )
    return f"""
WITH sw(sw_lang, token) AS (VALUES {values}),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
hits AS (
  SELECT doc_id, sw_lang, COUNT(*) AS hits
  FROM toks JOIN sw USING (token) GROUP BY 1, 2
),
best AS (
  SELECT doc_id, sw_lang, hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, sw_lang ASC) AS rn
  FROM hits
)
SELECT d.doc_id, d.lang AS actual_lang,
       COALESCE(b.sw_lang, 'unknown') AS pred_lang,
       COALESCE(b.hits, 0) AS hits
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics: length, lexical diversity, token
    length — combined into a [0,1] score. All integer-derived ratios →
    bit-identical across engines."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks).cast("double")
    n_dist = F.size(F.array_distinct(toks)).cast("double")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        (n_dist / n_tok).alias("distinct_ratio"),
        (F.length("text").cast("double") / n_tok).alias("avg_token_span"),
        F.round(
            0.5 * (n_dist / n_tok)
            + 0.5 * F.least(n_tok / 100.0, F.lit(1.0)),
            6,
        ).alias("quality_score"),
    )


ORACLE_QUALITY_SCORE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER)                   AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)    AS n_distinct,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE)                AS distinct_ratio,
       CAST(length(text) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE)                AS avg_token_span,
       ROUND(0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE))
             + 0.5 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0),
             6)                                                        AS quality_score
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive positional document fingerprint:
    Σ pos·(ascii(token)·256 + len(token)) mod 2³¹−1 — a rolling-hash
    style signature expressible identically in both engines."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_of(d).filter(F.col("token") != "")
    return toks.groupBy("doc_id").agg(
        F.pmod(
            F.sum(
                F.col("pos")
                * (F.ascii("token").cast("long") * 256 + F.length("token"))
            ),
            F.lit(2147483647),
        ).alias("fingerprint")
    )


ORACLE_DOC_FINGERPRINT = """
SELECT doc_id,
       CAST(SUM(ord * (ascii(token) * 256 + length(token))) % 2147483647
            AS BIGINT) AS fingerprint
FROM (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents
)
WHERE token <> ''
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


def q_dedup_doc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: sha2 the text, keep the min doc_id per
    digest (the 100 TB pattern: hash-groupBy, never pairwise compare)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.sha2("text", 256).alias("digest")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


ORACLE_DEDUP_DOC_EXACT = """
SELECT sha256(text) AS digest, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def shingles_of(df: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-token shingles per document.
    Not fanned out for the same measured reason as tokens_of — the
    pure explode+distinct consumers (ngram_jaccard, containment,
    contamination) got SLOWER with the extra exchange; callers whose
    per-shingle work is heavy fan their input out themselves."""
    toks = F.split("text", " ")
    sh = F.expr(
        f"transform(sequence(1, greatest(size(split(text, ' ')) - {k - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(text, ' '), i, {k})))"
    )
    return (
        df.select("doc_id", F.explode(sh).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def ngram_jaccard_pairs(d: DataFrame, max_df: int = 100) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing ≥1 three-token shingle,
    via an inverted-index join — only actually-overlapping pairs ever
    materialize.

    Skew bound: a shingle present in ``df`` documents produces df²
    candidate rows in the self-join, so one boilerplate 3-gram shared by
    1M docs would emit 10¹² rows. Shingles with document frequency >
    ``max_df`` are dropped from the *index* before the join (standard
    prefix-filter practice — pairs whose only overlap is an ultra-common
    shingle are not near-dups), which caps the per-shingle fan-out at
    max_df². Per-doc shingle-set sizes (the Jaccard denominator) are
    computed on the FULL shingle set, so reported similarities stay
    exact for every surviving pair; only n_common excludes the dropped
    hot shingles. On the test corpus max df < max_df, so the output is
    bit-identical to the uncapped join (oracle unchanged); the cap is
    exercised by a synthetic-skew test."""
    sh = lineage_cut(shingles_of(d), eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("shingle")
    )
    # power-law corpora have few ultra-common shingles → broadcast anti-join
    cold = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = cold.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = cold.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return out


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over the documents table (see
    ngram_jaccard_pairs for the skew-capped inverted-index design).
    fan_out (r20): the corpus scan is one parquet split at bench
    scale, so the shingle index build — the pipeline's dominant job —
    ran on ONE task (2.2 s of a 6.5 s profile); q_dup_clusters'
    identical call site got this fix in r19. No-op at real scale
    (gate in fan_out); values are exact aggregates over an unchanged
    row multiset."""
    return ngram_jaccard_pairs(fan_out(load(spark, sf_dir, "documents")))


ORACLE_NGRAM_JACCARD = """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
    FROM (
      SELECT doc_id, string_split(text, ' ') AS toks,
             unnest(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1)) AS i
      FROM documents
    )
  )
  WHERE shingle <> ''
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""

def parity_hash32(col):
    """Engine-parity 32-bit string hash: the first 8 hex chars of md5,
    parsed as an integer — bit-identical in Spark
    (``conv(substring(md5(x),1,8),16,10)``) and DuckDB
    (``('0x' || substr(md5(x),1,8))::BIGINT``), so hash-derived
    SELECTIONS (minhash sketches, simhash fingerprints) are value-exact
    oracle-checkable. md5 costs a few× more than xxhash64 per call but
    stays a JVM codegen expression (no Python worker, same shuffle
    shape); a 100 TB deployment that does not need cross-engine
    reproducibility can swap the hash back in this one helper. Many
    production dedup pipelines keep the verifiable hash: fingerprints
    that reproduce on ANY engine are themselves a durability feature."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


#: DuckDB twin of parity_hash32 (format with c=<column expr>)
PARITY_HASH32_SQL = "('0x' || substr(md5({c}), 1, 8))::BIGINT"

#: minhash configuration: 16 permutations → 4 bands × 4 rows, affine
#: universal-hash family over the Mersenne prime 2^31-1: mh_i =
#: (a_i·h31 + b_i) mod P with h31 the parity hash masked to 31 bits —
#: every product stays < 2^62, so the arithmetic is exact int64 in any
#: engine and the sketch itself is oracle-reproducible
MINHASH_PERMS = 16
MINHASH_BANDS = 4
MINHASH_P = 2147483647


def _minhash_perm_consts() -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) affine coefficients (LCG-derived,
    seedless of wall clock — same discipline as _lsh_planes)."""
    out, state = [], 0x5DEECE66D
    for _ in range(MINHASH_PERMS):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (state >> 16) % (MINHASH_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (state >> 16) % MINHASH_P
        out.append((a, b))
    return out


MINHASH_PERM_CONSTS = _minhash_perm_consts()


def minhash_sketches_wide(df: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, mh0..mh15): k-min sketch, one column per permutation —
    a single map-side-combined groupBy, no 16× row explosion. Each
    permutation is an affine transform of the ONE parity base hash
    (r10: replaced 16 seeded xxhash64 calls; 1 md5 + 16 int64 FMAs per
    shingle, and the sketch becomes engine-reproducible)."""
    # fan the corpus scan out before the shingle explode (r19): the
    # md5 permutation hashing over every shingle otherwise runs on the
    # scan's partitioning — ONE task for a single-file corpus (a
    # measured 4.4 s single-task job in a 6.6 s q_dedup_minhash
    # profile; the A/B'd win is ~1.1 s at sf0.1). No-op at real scale
    # where the corpus has >= cores input splits.
    sh = shingles_of(fan_out(df), k).withColumn(
        "h31", parity_hash32(F.col("shingle")) % F.lit(2147483648)
    )
    return sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h31") + F.lit(b)) % F.lit(MINHASH_P)).alias(
                f"mh{i}"
            )
            for i, (a, b) in enumerate(MINHASH_PERM_CONSTS)
        ]
    )


def minhash_sketches(df: DataFrame, k: int = 3) -> DataFrame:
    """Long-format view (doc_id, perm, minhash) of the wide sketch."""
    wide = minhash_sketches_wide(df, k)
    stack = ", ".join(f"{i}, mh{i}" for i in range(MINHASH_PERMS))
    return wide.selectExpr(
        "doc_id", f"stack({MINHASH_PERMS}, {stack}) AS (perm, minhash)"
    )


def dedup_minhash_pairs(d: DataFrame, max_bucket: int = 100) -> DataFrame:
    """MinHash + LSH near-duplicate candidates: band the 16-perm sketch
    into 4 bands of 4 rows; docs sharing any band bucket are
    candidates; output the estimated Jaccard (fraction of matching
    minhashes).

    Oracle: value-exact SQL (r10 upgrade) — the affine-over-parity-hash
    sketch reproduces in DuckDB, so the oracle recomputes sketches,
    band buckets, AND estimates; the estimate is additionally
    cross-checked against exact q_ngram_jaccard in tests. The oracle
    uses uncapped in-bucket pairing, which equals the capped output
    whenever no bucket exceeds ``max_bucket`` (true at every test
    scale; the cap path is pinned by a synthetic-skew test).

    100 TB shape: sketches are 16 longs/doc; the bucket key is the
    band's raw 4-minhash tuple in fixed perm order (deterministic — no
    collect_list ordering hazards, and no band-hash collisions at all);
    the candidate join happens inside hash-partitioned
    (band, r0..r3) buckets — never O(n²).

    Skew bound: a bucket holding ``s`` docs emits s² pairs, and a giant
    bucket is a giant *duplicate cluster* (e.g. 1M copies of one
    boilerplate page), where all-pairs is pointless. Buckets larger
    than ``max_bucket`` switch to STAR pairing — every member pairs
    with the bucket's min doc_id only — which keeps the cluster
    connected for downstream grouping at O(s) pairs instead of O(s²).
    Test-corpus buckets are far below the cap, so output is identical
    to the uncapped join; the cap is exercised by a synthetic-skew
    test."""
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    # mh is consumed five times (4 band projections + the a/b estimate
    # joins); lineage_cut materializes it once and — unlike a bare
    # .persist(), which pinned executor blocks for the session lifetime
    # in a long-lived service (r10 verdict What's-wrong #2) — its
    # storage is released by the ContextCleaner when the DataFrame is
    # dropped (local mode) or lives as cleanable checkpoint files
    # under spark.graft.checkpointDir (cluster mode). eager=False: the
    # first consumer is the bands EAGER cut below, which materializes
    # mh in the same job — an eager cut here would scan documents twice
    # (measured +1.1 s at sf0.1 in-harness, the one >spread mover of
    # the r11 bench pair).
    mh = lineage_cut(minhash_sketches_wide(d), eager=False)
    band_dfs = []
    for b in range(MINHASH_BANDS):
        cols = [f"mh{b * rows_per_band + j}" for j in range(rows_per_band)]
        band_dfs.append(
            mh.select(
                "doc_id",
                F.lit(b).alias("band"),
                *[F.col(c).alias(f"r{j}") for j, c in enumerate(cols)],
            )
        )
    bands = band_dfs[0]
    for extra in band_dfs[1:]:
        bands = bands.unionByName(extra)
    # bands is consumed three times below (hot-list aggregate, anti-join,
    # star pairs) and is tiny (5 longs/doc) — materialize it once
    bands = bands.transform(lineage_cut)
    key = ["band", "r0", "r1", "r2", "r3"]
    # oversized buckets are rare by construction (they are giant
    # duplicate clusters), so compute ONLY the hot-bucket list (one
    # map-side-combined aggregate) and broadcast it — cheaper than
    # tagging every row with its bucket size via a window sort
    big = (
        bands.groupBy(*key)
        .agg(F.count("*").alias("bucket_sz"), F.min("doc_id").alias("rep"))
        .filter(F.col("bucket_sz") > max_bucket)
    )
    small = bands.join(F.broadcast(big.select(*key)), key, "left_anti")
    pairs_small = (
        small.alias("x")
        .join(small.alias("y"), key)
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    )
    pairs_big = (
        bands.join(F.broadcast(big), key)
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    cand = pairs_small.unionByName(pairs_big).distinct()
    a = mh.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(MINHASH_PERMS)],
    )
    b_ = mh.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(MINHASH_PERMS)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MINHASH_PERMS)
    )
    return (
        cand.join(a, "doc_a")
        .join(b_, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches / float(MINHASH_PERMS)).alias("est_jaccard"),
        )
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates over the documents table (see
    dedup_minhash_pairs for the bucketed, skew-capped design)."""
    return dedup_minhash_pairs(load(spark, sf_dir, "documents"))


def _oracle_dedup_minhash() -> str:
    """DuckDB replica of the full minhash pipeline: shingles → parity
    base hash → 16 affine permutation minima → per-band 4-tuple bucket
    join → distinct candidates → matching-perm estimate. Uncapped
    pairing (== the capped Spark output while no bucket exceeds
    max_bucket, which holds at every test scale)."""
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    mins = ",\n    ".join(
        f"MIN(({a} * h31 + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PERM_CONSTS)
    )
    band_joins = "\n    UNION\n    ".join(
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM mh a JOIN mh b ON "
        + " AND ".join(
            f"a.mh{b * rows_per_band + j} = b.mh{b * rows_per_band + j}"
            for j in range(rows_per_band)
        )
        + " AND a.doc_id < b.doc_id"
        for b in range(MINHASH_BANDS)
    )
    match_sum = "\n         + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)"
        for i in range(MINHASH_PERMS)
    )
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
    FROM (
      SELECT doc_id, string_split(text, ' ') AS toks,
             unnest(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1)) AS i
      FROM documents
    )
  )
  WHERE shingle <> ''
),
hashed AS (
  SELECT doc_id,
         {PARITY_HASH32_SQL.format(c='shingle')} % 2147483648 AS h31
  FROM sh
),
mh AS (
  SELECT doc_id,
    {mins}
  FROM hashed GROUP BY doc_id
),
cand AS (
    {band_joins}
)
SELECT c.doc_a, c.doc_b,
       ({match_sum}) / 16.0 AS est_jaccard
FROM cand c JOIN mh a ON a.doc_id = c.doc_a JOIN mh b ON b.doc_id = c.doc_b
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document from tf-weighted token hashes
    (r10: token hash is parity_hash32, so the fingerprint — not just
    its shape — is oracle-exact). Near-dup candidates = small Hamming
    distance; at scale, bucket by bit-bands like minhash.

    Shuffle shape: the 32 bit-votes are 32 conditional-sum columns in
    ONE map-side-combined groupBy over (doc, token) rows — no 32× bit
    explosion multiplying the shuffle (same wide-aggregate trick as
    minhash_sketches_wide; equality with the exploded formulation
    verified at sf0.001 and sf0.01 before the swap)."""
    d = load(spark, sf_dir, "documents")
    tf = (
        tokens_of(d)
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", parity_hash32(F.col("token")))
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {i}) & 1) = 1"), F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"v{i}")
        for i in range(32)
    ]
    sim = F.expr(
        " + ".join(
            f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
            for i in range(32)
        )
    )
    return tf.groupBy("doc_id").agg(*votes).select("doc_id", sim.alias("simhash"))


def _oracle_simhash() -> str:
    """DuckDB replica of the SimHash fingerprint: tokenize → tf →
    parity token hash → 32 bit-votes → sign-bit reassembly."""
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN tf ELSE -tf END) AS v{i}"
        for i in range(32)
    )
    bits = "\n       + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(32)
    )
    return f"""
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS tf,
         {PARITY_HASH32_SQL.format(c='token')} AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY doc_id, token
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM tf GROUP BY doc_id
)
SELECT doc_id,
       {bits} AS simhash
FROM votes
"""


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------


def _dot(a, b):
    """Sequential-fold double dot product of two float arrays (bit-
    deterministic; matches the oracle's list_sum/list_transform order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_DOT_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query (queries = vec_id % 50 = 0).

    The baseline ANN path: broadcast the small query set against all
    candidates; rank per query; ties broken by candidate id. At scale
    the candidate side stays partitioned, queries broadcast — one pass,
    no shuffle of the big side (see q_ann_ivf for the bucketed path).
    """
    emb = load(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "embedding", norm.alias("n2"))
    qs = base.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    pairs = base.crossJoin(F.broadcast(qs)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / F.sqrt(
        F.col("q_n2") * F.col("n2")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rnk",
            F.round("cos", 6).alias("cosine"),
        )
    )


ORACLE_SIM_TOPK = f"""
WITH base AS (
  SELECT vec_id, embedding,
         {_DOT_SQL.format(a='embedding', b='embedding')} AS n2
  FROM embeddings
),
qs AS (SELECT vec_id AS query_id, embedding AS q_emb, n2 AS q_n2 FROM base WHERE vec_id % 50 = 0),
pairs AS (
  SELECT q.query_id, b.vec_id,
         {_DOT_SQL.format(a='q.q_emb', b='b.embedding')} / SQRT(q.q_n2 * b.n2) AS cos
  FROM base b CROSS JOIN qs q
  WHERE b.vec_id <> q.query_id
)
SELECT query_id, vec_id AS neighbor_id,
       CAST(rnk AS INTEGER) AS rnk, ROUND(cos, 6) AS cosine
FROM (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM pairs
) t WHERE rnk <= 5
"""


def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority label (k=10) over the cosine neighbors; ties →
    smallest label."""
    emb = load(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "label", "embedding", norm.alias("n2"))
    qs = base.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    pairs = base.crossJoin(F.broadcast(qs)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / F.sqrt(
        F.col("q_n2") * F.col("n2")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    knn = (
        pairs.withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
    )
    votes = knn.groupBy("query_id", "label").agg(F.count("*").alias("votes"))
    # majority label as a map-side max_by (r11, argmax-not-window):
    # same tie order the window had — most votes, then smallest label
    return (
        votes.groupBy("query_id")
        .agg(
            F.max_by(
                F.struct(F.col("label").alias("pred_label"), "votes"),
                F.struct(F.col("votes"), (-F.col("label")).alias("nl")),
            ).alias("sel")
        )
        .select("query_id", "sel.pred_label", "sel.votes")
    )


ORACLE_KNN_LABEL = f"""
WITH base AS (
  SELECT vec_id, label, embedding,
         {_DOT_SQL.format(a='embedding', b='embedding')} AS n2
  FROM embeddings
),
qs AS (SELECT vec_id AS query_id, embedding AS q_emb, n2 AS q_n2 FROM base WHERE vec_id % 50 = 0),
knn AS (
  SELECT query_id, vec_id, label,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY {_DOT_SQL.format(a='q_emb', b='embedding')} / SQRT(q_n2 * n2) DESC,
                    vec_id ASC
         ) AS rnk
  FROM base b CROSS JOIN qs q
  WHERE b.vec_id <> q.query_id
),
votes AS (
  SELECT query_id, label, COUNT(*) AS votes
  FROM knn WHERE rnk <= 10 GROUP BY 1, 2
)
SELECT query_id, label AS pred_label, votes
FROM (
  SELECT query_id, label, votes,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rn
  FROM votes
) t WHERE rn = 1
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse centroids (every 100th vector as seed),
    vectors assigned to nearest centroid; a query probes its 2 nearest
    centroid lists only. The scale path: the inverted lists are
    hash-partitioned by centroid, so a query touches 2 partitions
    instead of the whole corpus. Recall vs q_sim_topk is measured in
    tests."""
    emb = load(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = lineage_cut(
        emb.select("vec_id", "embedding", norm.alias("n2")), eager=False
    )
    cent = base.filter(F.pmod("vec_id", F.lit(100)) == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("c_n2"),
    )
    ccos = _dot(F.col("c_emb"), F.col("embedding")) / F.sqrt(
        F.col("c_n2") * F.col("n2")
    )
    # nearest-centroid assignment as a map-side-combinable max_by
    # argmax, NOT a row_number window: the broadcast crossJoin emits
    # each vector's K centroid rows contiguously in its own scan
    # partition, so the partial aggregate collapses N·K rows to N
    # BEFORE any shuffle — the window variant shuffled and sorted the
    # full N·K candidate table by vec_id (measured on the 50k-vector
    # clustered stress corpus: 192 s -> 56 s end-to-end, identical
    # output; scripts/stress_ann.py). Tie order matches the window it
    # replaced and the CTE oracle: highest ccos, then smallest
    # cent_id (via -cent_id in the comparison struct); embedding/n2
    # ride along inside the max_by payload.
    assign = (
        base.crossJoin(F.broadcast(cent))
        .withColumn("ccos", ccos)
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("embedding", "n2", "cent_id"),
                F.struct(F.col("ccos"), (-F.col("cent_id")).alias("nc")),
            ).alias("sel")
        )
        .select("vec_id", "sel.embedding", "sel.n2", "sel.cent_id")
    )
    qs = base.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cent_id"))
    probes = (
        qs.crossJoin(F.broadcast(cent))
        .withColumn(
            "qcos",
            _dot(F.col("q_emb"), F.col("c_emb")) / F.sqrt(F.col("q_n2") * F.col("c_n2")),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= 2)
        .select("query_id", "q_emb", "q_n2", "cent_id")
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / F.sqrt(
        F.col("q_n2") * F.col("n2")
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        probes.join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w_top))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rnk",
            F.round("cos", 6).alias("cosine"),
        )
    )


ORACLE_ANN_IVF = f"""
WITH base AS (
  SELECT vec_id, embedding,
         {_DOT_SQL.format(a='embedding', b='embedding')} AS n2
  FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2
  FROM base WHERE vec_id % 100 = 0
),
assign AS (
  SELECT vec_id, embedding, n2, cent_id FROM (
    SELECT b.vec_id, b.embedding, b.n2, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY {_DOT_SQL.format(a='c.c_emb', b='b.embedding')} / SQRT(c.c_n2 * b.n2) DESC,
                      c.cent_id ASC
           ) AS rn
    FROM base b CROSS JOIN cent c
  ) t WHERE rn = 1
),
qs AS (SELECT vec_id AS query_id, embedding AS q_emb, n2 AS q_n2 FROM base WHERE vec_id % 50 = 0),
probes AS (
  SELECT query_id, q_emb, q_n2, cent_id FROM (
    SELECT q.query_id, q.q_emb, q.q_n2, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_DOT_SQL.format(a='q.q_emb', b='c.c_emb')} / SQRT(q.q_n2 * c.c_n2) DESC,
                      c.cent_id ASC
           ) AS rn
    FROM qs q CROSS JOIN cent c
  ) t WHERE rn <= 2
)
SELECT query_id, vec_id AS neighbor_id, CAST(rnk AS INTEGER) AS rnk,
       ROUND(cos, 6) AS cosine
FROM (
  SELECT p.query_id, a.vec_id,
         {_DOT_SQL.format(a='p.q_emb', b='a.embedding')} / SQRT(p.q_n2 * a.n2) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY p.query_id
           ORDER BY {_DOT_SQL.format(a='p.q_emb', b='a.embedding')} / SQRT(p.q_n2 * a.n2) DESC,
                    a.vec_id ASC
         ) AS rnk
  FROM probes p JOIN assign a USING (cent_id)
  WHERE a.vec_id <> p.query_id
) t WHERE rnk <= 3
"""


def _lsh_planes(n_planes: int = 4, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-derived, seedless of
    wall clock) for sign-bit LSH over embeddings."""
    planes = []
    state = 0x9E3779B97F4A7C15
    for _ in range(n_planes * dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        planes.append(((state >> 16) % 2001 - 1000) / 1000.0)
    return [planes[p * dim : (p + 1) * dim] for p in range(n_planes)]


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit (random-hyperplane) LSH ANN with multi-probe: 4
    hyperplanes → 16 buckets; a query probes its own bucket plus the 4
    buckets at Hamming distance 1 (sign bits near the hyperplane flip
    easily, so adjacent buckets hold most of the missed neighbors).

    Oracle: value-exact SQL (r10 upgrade) — the plane constants are
    exact decimal literals embeddable in the oracle, and both engines
    compute the sign-bit dot products with the same sequential double
    fold (_dot ↔ _DOT_SQL, the pairing q_sim_topk's driver-green hash
    already proves), so bucket assignment, probing, and ranking all
    reproduce. Recall vs brute force additionally asserted in tests.
    Scale path: the corpus is hash-partitioned by bucket; a query
    touches n_planes+1 partitions."""
    emb = load(spark, sf_dir, "embeddings")
    planes = _lsh_planes()
    n_planes = len(planes)
    bucket = None
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = (_dot(plane_col, F.col("embedding")) > 0).cast("long") * (2 ** p)
        bucket = bit if bucket is None else bucket + bit
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = lineage_cut(
        emb.select("vec_id", "embedding", norm.alias("n2"), bucket.alias("bucket")),
        eager=False,
    )
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(2 ** p)).cast("long")
            for p in range(n_planes)
        ],
    )
    qs = (
        base.filter(F.pmod("vec_id", F.lit(50)) == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("n2").alias("q_n2"),
            F.explode(probes).alias("bucket"),
        )
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / F.sqrt(
        F.col("q_n2") * F.col("n2")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        qs.join(base, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rnk",
            F.round("cos", 6).alias("cosine"),
        )
    )


def _oracle_ann_lsh() -> str:
    """DuckDB replica of the multi-probe LSH: the 4 hyperplanes are
    embedded as exact decimal literals, the sign-bit bucket and probe
    set (self + 4 Hamming-1 neighbors via xor) reproduce the Spark
    plan, and cosine ranking reuses the ORACLE_SIM_TOPK fold."""
    planes = _lsh_planes()

    def dot_plane(p):
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        return _DOT_SQL.format(a=lit, b="embedding")

    bucket = "\n         + ".join(
        f"(CASE WHEN {dot_plane(p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding,
         {_DOT_SQL.format(a='embedding', b='embedding')} AS n2,
         {bucket} AS bucket
  FROM embeddings
),
qs AS (
  SELECT vec_id AS query_id, embedding AS q_emb, n2 AS q_n2,
         unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                 xor(bucket, 4), xor(bucket, 8)]) AS probe
  FROM base WHERE vec_id % 50 = 0
),
cand AS (
  SELECT q.query_id, b.vec_id,
         {_DOT_SQL.format(a='q.q_emb', b='b.embedding')} / SQRT(q.q_n2 * b.n2) AS cos
  FROM qs q JOIN base b ON b.bucket = q.probe
  WHERE b.vec_id <> q.query_id
)
SELECT query_id, vec_id AS neighbor_id,
       CAST(rnk AS INTEGER) AS rnk, ROUND(cos, 6) AS cosine
FROM (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM cand
) t WHERE rnk <= 3
"""


#: tiled-GEMM block cap: a block's collect_list row and a tile's numpy
#: sub-matrix both stay ≤ this many vectors regardless of corpus size
#: (NB = ⌈n / cap⌉, floor 8 for tile parallelism on small inputs)
DUP_EMB_BLOCK_VECS = 10_000


def q_dup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.42) — the last
    rung of the dedup ladder, computed EXACTLY as a blocked similarity
    join (a distributed tiled GEMM):

      1. hash-partition vectors into ``NB`` blocks (one groupBy);
      2. enumerate the NB·(NB+1)/2 unordered block pairs from
         ``range → explode(sequence)`` and attach both blocks with two
         hash joins — no CartesianProduct operator anywhere in the plan;
      3. each tile computes its cosine sub-matrix as ONE float64 numpy
         GEMM inside an Arrow batch (mapInPandas) and emits only the
         qualifying pairs.

    Why not LSH candidates: 0.42 is far below the regime where sign-LSH
    candidate generation is complete — measured on this data, qualifying
    pairs span bucket Hamming distance 0–4 under the q_ann_lsh planes,
    so own+Hamming-1 probing would miss ~half of them and break the
    exact oracle. A low-threshold exact cosine join is inherently O(n²)
    *work*; the scale levers are (a) doing that work as BLAS tiles
    instead of per-row interpreted expressions, (b) shuffling O(n·NB)
    block replicas instead of materializing n² join rows, and (c)
    emitting only the hits. NB is data-adaptive (r7): one count pins
    a block at ≤ DUP_EMB_BLOCK_VECS vectors (≈2.5 MB of float32 at
    dim 64), so the per-block collect_list row and the per-tile GEMM
    stay memory-bounded no matter how the corpus grows — the output
    is identical for ANY NB because each unordered pair lands in
    exactly one (bi ≤ bj) tile. The approximate pre-filter
    (q_ann_lsh / q_dedup_minhash) is the rung users reach for first.

    float64 GEMM reproduces the oracle's sequential-fold dot exactly on
    this data; the nearest cosine to the 0.42 threshold is 3.4e-5 away
    and to any round-6 midpoint 2.5e-9 (asserted in tests), so the
    summation-order difference can never flip a row.
    """
    emb = load(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    NB = max(8, -(-n_vecs // DUP_EMB_BLOCK_VECS))
    norm = _dot(F.col("embedding"), F.col("embedding"))
    blocks = (
        emb.select(
            "vec_id",
            "embedding",
            norm.alias("n2"),
            F.pmod(F.xxhash64("vec_id"), F.lit(NB)).cast("int").alias("blk"),
        )
        .groupBy("blk")
        .agg(F.collect_list(F.struct("vec_id", "embedding", "n2")).alias("vecs"))
        .transform(lambda df: lineage_cut(df, eager=False))
    )
    grid = spark.range(NB).select(F.col("id").cast("int").alias("bi")).withColumn(
        "bj", F.explode(F.sequence(F.col("bi"), F.lit(NB - 1)))
    )
    tiles = grid.join(
        blocks.select(F.col("blk").alias("bi"), F.col("vecs").alias("va")), "bi"
    ).join(blocks.select(F.col("blk").alias("bj"), F.col("vecs").alias("vb")), "bj")

    def tile_pairs(batches):
        import numpy as np

        for pdf in batches:
            for bi, bj, va, vb in zip(pdf["bi"], pdf["bj"], pdf["va"], pdf["vb"]):
                ida = np.array([r["vec_id"] for r in va], dtype=np.int64)
                idb = np.array([r["vec_id"] for r in vb], dtype=np.int64)
                A = np.stack([r["embedding"] for r in va]).astype(np.float64)
                B = np.stack([r["embedding"] for r in vb]).astype(np.float64)
                na = np.array([r["n2"] for r in va], dtype=np.float64)
                nb = np.array([r["n2"] for r in vb], dtype=np.float64)
                C = (A @ B.T) / np.sqrt(np.outer(na, nb))
                ii, jj = np.where(C >= 0.42)
                pa, pb, pc = ida[ii], idb[jj], C[ii, jj]
                keep = pa < pb if bi == bj else slice(None)
                yield pd.DataFrame(
                    {
                        "id_a": np.minimum(pa, pb)[keep],
                        "id_b": np.maximum(pa, pb)[keep],
                        "cos": pc[keep],
                    }
                )

    hits = tiles.mapInPandas(tile_pairs, schema="id_a long, id_b long, cos double")
    return hits.select("id_a", "id_b", F.round("cos", 6).alias("cosine"))


ORACLE_DUP_EMBEDDING = f"""
WITH base AS (
  SELECT vec_id, embedding,
         {_DOT_SQL.format(a='embedding', b='embedding')} AS n2
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_DOT_SQL.format(a='a.embedding', b='b.embedding')} / SQRT(a.n2 * b.n2), 6) AS cosine
FROM base a JOIN base b ON a.vec_id < b.vec_id
WHERE {_DOT_SQL.format(a='a.embedding', b='b.embedding')} / SQRT(a.n2 * b.n2) >= 0.42
"""


# ---------------------------------------------------------------------------
# sampling / data mixing (training-data curation)
# ---------------------------------------------------------------------------


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: the 20 lowest-doc_id documents
    per language — reproducible across runs and engines (a random
    sample would not hash-match; hash-ordered sampling is
    q_sample_hash)."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "source", "n_chars")
    )


ORACLE_SAMPLE_STRATIFIED = """
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
) t WHERE rn <= 20
"""


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded hash-Bernoulli sample (~10%): membership depends only on
    (seed, doc_id), so the sample is stable under reprocessing and
    across cluster sizes — the correct way to subsample 100 TB
    reproducibly. The scramble is the q_data_mix Knuth multiplicative
    hash (exact 64-bit integer arithmetic in any engine) with the seed
    folded in additively, so the SELECTION itself is oracle-exact —
    the id is masked to 31 bits before the multiply to stay inside
    int64 ((2^31-1)*2654435761 + seed < 2^63-1)."""
    d = load(spark, sf_dir, "documents")
    scramble = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * F.lit(2654435761)
        + F.lit(42),
        F.lit(4294967296),
    )
    return d.filter(F.pmod(scramble, F.lit(100)) < 10).select(
        "doc_id", "lang", "source"
    )


ORACLE_SAMPLE_HASH = """
SELECT doc_id, lang, source
FROM documents
WHERE (((doc_id % 2147483648) * 2654435761 + 42) % 4294967296) % 100 < 10
"""


def q_data_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: per-language quotas (en-heavy
    training mix), filled in seeded-hash order so the selection is
    reproducible but not biased toward low ids. Output: the mixture
    composition per language."""
    quotas = {"en": 60, "de": 30, "es": 30, "fr": 30, "zh": 15}
    d = load(spark, sf_dir, "documents")
    # Knuth multiplicative hash: exact 64-bit integer arithmetic in
    # both engines, so the *selection* (not just the counts) is
    # oracle-reproducible. The id is masked to 31 bits BEFORE the
    # multiply so the product caps at (2^31-1)*2654435761 ≈ 5.7e18 <
    # 2^63-1 — Spark would silently wrap on int64 overflow while DuckDB
    # raises, so unmasked ids ≳ 3.5e9 would break engine parity
    scramble = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * F.lit(2654435761),
        F.lit(4294967296),
    )
    w = Window.partitionBy("lang").orderBy(scramble, F.col("doc_id"))
    quota_expr = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(q))
            for lang, q in quotas.items()
        ],
        F.lit(0),
    )
    # literal cap FIRST: Catalyst's InsertWindowGroupLimit only fires
    # on a literal rank bound, and it is what makes this per-lang
    # window scale-safe (partial top-k per map partition before the
    # shuffle — verified in the plan); the per-lang quota then
    # tightens the surviving ≤ max-quota rows per lang
    max_quota = max(quotas.values())
    picked = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(max_quota))
        .filter(F.col("rn") <= quota_expr)
    )
    return picked.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


ORACLE_DATA_MIX = """
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id
         ) AS rn
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM ranked
WHERE rn <= CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 30 WHEN 'es' THEN 30
                      WHEN 'fr' THEN 30 WHEN 'zh' THEN 15 ELSE 0 END
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# vectorized UDF surface
# ---------------------------------------------------------------------------


def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF vs built-in cross-check: embedding L2
    norm both ways; rows-only oracle, self-validating via the diff
    column (asserted ≈0 in tests)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2_norm(emb: pd.Series) -> pd.Series:
        import numpy as np

        if len(emb) == 0:
            return pd.Series([], dtype="float64")
        # whole-batch vectorization: one stacked ndarray per Arrow batch,
        # not a Python lambda per row
        m = np.stack(emb.to_numpy()).astype(np.float64)
        return pd.Series(np.sqrt((m * m).sum(axis=1)))

    emb = load(spark, sf_dir, "embeddings")
    builtin = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return emb.select(
        "vec_id",
        F.round(l2_norm("embedding"), 6).alias("norm_udf"),
        F.round(builtin, 6).alias("norm_builtin"),
        F.round(F.abs(l2_norm("embedding") - builtin), 9).alias("diff"),
    )


#: Value-exact oracle for the UDF lane: DuckDB recomputes the L2 norm
#: once (sequential double fold — parity with both the numpy row sum
#: and the _dot fold verified empirically at sf0.001/0.01/0.1) and the
#: constant diff column asserts the Arrow UDF matched the builtin to
#: < 5e-10 on every row — a hash mismatch here means the two Spark-side
#: computations diverged, which is exactly what the query exists to
#: cross-check.
ORACLE_UDF_PANDAS = """
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm_udf,
       ROUND(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm_builtin,
       CAST(0 AS DOUBLE) AS diff
FROM embeddings
"""


# ---------------------------------------------------------------------------
# round-5 second batch (SURVEY §2.19): dataset splitting
# ---------------------------------------------------------------------------

#: split fractions (train / val, remainder = test) and the LCG that
#: assigns them (pure function of doc_id — identical on any engine,
#: any partitioning, any retry; same constants as q_reservoir_group)
SPLIT_TRAIN = 0.8
SPLIT_VAL = 0.9
SPLIT_A = 1_103_515_245
SPLIT_C = 12_345
SPLIT_M = 2_147_483_648


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) — the dataset-
    versioning requirement: membership must be a pure function of the
    example id so the split is identical across engines, reruns, and
    cluster layouts (a ``rand()`` split silently reshuffles on retry).
    One narrow projection assigns the split from an LCG hash; the
    report aggregates per (lang, split) with each split's share of its
    language — the check that stratification holds per slice."""
    d = load(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * SPLIT_A + SPLIT_C) % SPLIT_M) / F.lit(float(SPLIT_M))
    split = (
        F.when(u < SPLIT_TRAIN, "train")
        .when(u < SPLIT_VAL, "val")
        .otherwise("test")
    )
    per = d.select("lang", split.alias("split")).groupBy("lang", "split").agg(
        F.count("*").alias("n_docs")
    )
    wl = Window.partitionBy("lang")
    return per.select(
        "lang",
        "split",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(wl), 6).alias("share"),
    )


ORACLE_TRAIN_SPLIT = f"""
WITH s AS (
  SELECT lang,
         CASE WHEN ((doc_id * {SPLIT_A} + {SPLIT_C}) % {SPLIT_M})
                   / CAST({SPLIT_M} AS DOUBLE) < {SPLIT_TRAIN} THEN 'train'
              WHEN ((doc_id * {SPLIT_A} + {SPLIT_C}) % {SPLIT_M})
                   / CAST({SPLIT_M} AS DOUBLE) < {SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
per AS (SELECT lang, split, COUNT(*) AS n_docs FROM s GROUP BY 1, 2)
SELECT lang, split, n_docs,
       ROUND(n_docs / SUM(n_docs) OVER (PARTITION BY lang), 6) AS share
FROM per
"""


# ---------------------------------------------------------------------------
# round-5 second batch (SURVEY §2.19): asymmetric containment dedup
# ---------------------------------------------------------------------------

#: minimum directed containment to report (quote/subset detection)
CONTAIN_MIN = 0.5


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment C(A→B) = |A∩B|/|A| — the
    asymmetric cousin of Jaccard that catches quotes, excerpts, and
    supersets (a short doc fully embedded in a long one scores
    containment 1.0 but Jaccard ≪ 1, so symmetric dedup misses it;
    Broder 1997 distinguishes exactly these two resemblance measures).
    Same skew-capped inverted-index join as ngram_jaccard_pairs — the
    intersection is computed once per unordered pair, then emitted in
    both directions against each side's own shingle-set size."""
    # fan_out (r20): the single-split corpus scan pinned the shingle-
    # index materialization — this query's dominant job — to ONE task
    # (2.3 s of a 5.2 s profile); same fix as q_ngram_jaccard /
    # q_dup_clusters, no-op at real scale
    d = fan_out(load(spark, sf_dir, "documents"))
    sh = lineage_cut(shingles_of(d), eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
        .join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
    )
    fwd = common.select(
        F.col("doc_a").alias("src_doc"),
        F.col("doc_b").alias("dst_doc"),
        "n_common",
        F.round(F.col("n_common") / F.col("n_a"), 6).alias("containment"),
    )
    rev = common.select(
        F.col("doc_b").alias("src_doc"),
        F.col("doc_a").alias("dst_doc"),
        "n_common",
        F.round(F.col("n_common") / F.col("n_b"), 6).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= CONTAIN_MIN)


ORACLE_CONTAINMENT = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
    FROM (
      SELECT doc_id, string_split(text, ' ') AS toks,
             unnest(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1)) AS i
      FROM documents
    )
  )
  WHERE shingle <> ''
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
both_dirs AS (
  SELECT doc_a AS src_doc, doc_b AS dst_doc, n_common,
         ROUND(CAST(n_common AS DOUBLE) / sa.n_sh, 6) AS containment
  FROM common JOIN sizes sa ON sa.doc_id = doc_a
  UNION ALL
  SELECT doc_b, doc_a, n_common,
         ROUND(CAST(n_common AS DOUBLE) / sb.n_sh, 6)
  FROM common JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT * FROM both_dirs WHERE containment >= {CONTAIN_MIN}
"""


# ---------------------------------------------------------------------------
# round-5 second batch (SURVEY §2.19): label-noise audit
# ---------------------------------------------------------------------------

#: neighbor count and audit-sample stride for the label-noise gate
NOISE_K = 5
NOISE_SAMPLE_MOD = 10


def q_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning-style label-noise audit (Northcutt et al.
    2021, the kNN-disagreement reduction): for an audit sample (every
    10th vector) find the 5 cosine-nearest labeled neighbors and flag
    vectors whose neighborhood majority-disagrees with their own
    label — the standard cheap screen for mislabeled training
    examples. Same broadcast-probe brute-force shape as q_knn_label
    (the exact baseline; the corpus side streams, only the audit
    sample broadcasts). The scale path swaps the exact scan for the
    IVF bucketed lists of q_ann_ivf without changing this plan's
    downstream aggregate. Ties in cosine break on neighbor id, so the
    flag set is deterministic."""
    emb = load(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    # fan_out the PROBE side before the broadcast NLJ (r20): the
    # embeddings scan is one parquet split at bench scale, so the
    # 64-d dot product per (row × query) expansion — this query's
    # whole cost — ran on ONE task (4.1 s of a 5.3 s profile); the
    # same single-task-NLJ fix as q_theilsen's stream side (r19).
    # The tiny query sample derives from the un-fanned scan (its
    # broadcast needs no parallelism); no-op at real scale.
    base = fan_out(emb.select("vec_id", "label", "embedding", norm.alias("n2")))
    qs = emb.select("vec_id", "label", "embedding", norm.alias("n2")).filter(
        F.pmod("vec_id", F.lit(NOISE_SAMPLE_MOD)) == 0
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("own_label"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    pairs = base.crossJoin(F.broadcast(qs)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / F.sqrt(
        F.col("q_n2") * F.col("n2")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    knn = (
        pairs.withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= NOISE_K)
    )
    return (
        knn.groupBy("query_id", "own_label")
        .agg(
            F.sum(
                (F.col("label") != F.col("own_label")).cast("long")
            ).alias("n_disagree")
        )
        .select(
            "query_id",
            "own_label",
            F.col("n_disagree").cast("int").alias("n_disagree"),
            (F.col("n_disagree") > NOISE_K // 2).alias("noisy"),
        )
    )


ORACLE_LABEL_NOISE = f"""
WITH base AS (
  SELECT vec_id, label, embedding,
         {_DOT_SQL.format(a='embedding', b='embedding')} AS n2
  FROM embeddings
),
qs AS (
  SELECT vec_id AS query_id, label AS own_label,
         embedding AS q_emb, n2 AS q_n2
  FROM base WHERE vec_id % {NOISE_SAMPLE_MOD} = 0
),
pairs AS (
  SELECT q.query_id, q.own_label, b.vec_id, b.label,
         {_DOT_SQL.format(a='q.q_emb', b='b.embedding')}
           / SQRT(q.q_n2 * b.n2) AS cos
  FROM base b CROSS JOIN qs q
  WHERE b.vec_id <> q.query_id
),
knn AS (
  SELECT query_id, own_label, label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM pairs
)
SELECT query_id, own_label,
       CAST(SUM(CASE WHEN label <> own_label THEN 1 ELSE 0 END) AS INTEGER)
         AS n_disagree,
       SUM(CASE WHEN label <> own_label THEN 1 ELSE 0 END) > {NOISE_K // 2}
         AS noisy
FROM knn WHERE rnk <= {NOISE_K}
GROUP BY query_id, own_label
"""


#: hashing-trick geometry: 64 buckets, independent sign hash
#: (Weinberger et al. 2009 — feature hashing for large-scale ML)
FH_BUCKETS = 64
FH_A, FH_B = 48271, 104729
FH_SA, FH_SB = 69621, 16807
FH_P = 2_147_483_647


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer audit (Weinberger 2009): every token
    occurrence maps to one of FH_BUCKETS buckets via a portable
    integer token key (the repo's ascii·256+length convention — weak
    on purpose; its collisions are PART of the hash definition and
    identical in both engines) with an independent ±1 sign hash, and
    the corpus-level feature matrix column sums come back with
    collision accounting: per bucket the signed weight, raw
    occurrence count, and number of distinct token keys sharing the
    bucket.

    100 TB shape: explode → ONE map-side-combined groupBy on a
    64-value key; the featurizer itself is stateless per token (no
    vocabulary, no fit step — the hashing trick's point), so the
    feature space never shuffles."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_of(d).filter(F.col("token") != "")
    key = F.ascii("token").cast("long") * 256 + F.length("token")
    bucket = ((key * FH_A + FH_B) % FH_P) % FH_BUCKETS
    sign = ((key * FH_SA + FH_SB) % FH_P) % 2 * 2 - 1
    return (
        toks.select(bucket.alias("bucket"), sign.alias("sign"), key.alias("key"))
        .groupBy("bucket")
        .agg(
            F.sum("sign").alias("signed_weight"),
            F.count("*").alias("n_obs"),
            F.countDistinct("key").alias("n_keys"),
        )
        .orderBy("bucket")
    )


ORACLE_FEATURE_HASH = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
keyed AS (
  SELECT ascii(token) * 256 + length(token) AS key FROM toks
  WHERE token <> ''
)
SELECT ((key * {FH_A} + {FH_B}) % {FH_P}) % {FH_BUCKETS} AS bucket,
       CAST(SUM(((key * {FH_SA} + {FH_SB}) % {FH_P}) % 2 * 2 - 1)
            AS BIGINT) AS signed_weight,
       COUNT(*) AS n_obs,
       CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys
FROM keyed GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "q_text_tokens": q_text_tokens,
    "q_token_count": q_token_count,
    "q_tfidf": q_tfidf,
    "q_feature_hash": q_feature_hash,
    "q_lang_stats": q_lang_stats,
    "q_lang_id": q_lang_id,
    "q_quality_score": q_quality_score,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_dedup_doc_exact": q_dedup_doc_exact,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_dedup_minhash": q_dedup_minhash,
    "q_simhash": q_simhash,
    "q_sim_topk": q_sim_topk,
    "q_knn_label": q_knn_label,
    "q_ann_ivf": q_ann_ivf,
    "q_ann_lsh": q_ann_lsh,
    "q_dup_embedding": q_dup_embedding,
    "q_sample_stratified": q_sample_stratified,
    "q_sample_hash": q_sample_hash,
    "q_data_mix": q_data_mix,
    "q_udf_pandas": q_udf_pandas,
    "q_label_noise": q_label_noise,
    "q_containment": q_containment,
    "q_train_split": q_train_split,
}

ORACLES = {
    "q_text_tokens": ORACLE_TEXT_TOKENS,
    "q_token_count": ORACLE_TOKEN_COUNT,
    "q_tfidf": _oracle_tfidf(),
    "q_feature_hash": ORACLE_FEATURE_HASH,
    "q_lang_stats": ORACLE_LANG_STATS,
    "q_lang_id": _oracle_lang_id(),
    "q_quality_score": ORACLE_QUALITY_SCORE,
    "q_doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "q_dedup_doc_exact": ORACLE_DEDUP_DOC_EXACT,
    "q_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "q_sim_topk": ORACLE_SIM_TOPK,
    "q_knn_label": ORACLE_KNN_LABEL,
    "q_ann_ivf": ORACLE_ANN_IVF,
    "q_dup_embedding": ORACLE_DUP_EMBEDDING,
    "q_label_noise": ORACLE_LABEL_NOISE,
    "q_containment": ORACLE_CONTAINMENT,
    "q_train_split": ORACLE_TRAIN_SPLIT,
    "q_sample_stratified": ORACLE_SAMPLE_STRATIFIED,
    "q_data_mix": ORACLE_DATA_MIX,
    "q_sample_hash": ORACLE_SAMPLE_HASH,
    "q_udf_pandas": ORACLE_UDF_PANDAS,
    "q_dedup_minhash": _oracle_dedup_minhash(),
    "q_simhash": _oracle_simhash(),
    "q_ann_lsh": _oracle_ann_lsh(),
}
