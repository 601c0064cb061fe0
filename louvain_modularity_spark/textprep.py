"""Training-data preparation operators (SURVEY.md §2.14 round-2 pack):
chunking, n-gram statistics, vocabulary building, stopword removal,
log sessionization, quality filtering, PII scrubbing, and embedding
hygiene — the batch text/embedding plumbing of an LLM data pipeline,
each with a DuckDB oracle.

Scale notes: every operator is an explode→groupBy / window / regex
projection — map-side-combined single shuffles or shuffle-free
projections. The only global window (vocabulary ranking) runs on the
token *vocabulary*, orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .session import lineage_cut

from .llm_ops import _DOT_SQL, _dot, tokens_of
from .sources import load

CHUNK_TOKENS = 32
CHUNK_STRIDE = 16
GAP_30M_US = 1_800_000_000

#: function words of the synthetic corpus (FIXTURES.md: lowercase,
#: space-separated vocabulary)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def q_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window prep: split each document into sliding token
    chunks (32 tokens, stride 16; trailing partial chunk kept) — the
    standard pretraining 'pack documents into windows' step. Pure
    array arithmetic, shuffle-free."""
    d = load(spark, sf_dir, "documents")
    starts = (
        f"sequence(1, greatest(size(split(text, ' ')) - {CHUNK_TOKENS}, 0) + 1,"
        f" {CHUNK_STRIDE})"
    )
    return (
        d.select(
            "doc_id",
            F.split("text", " ").alias("toks"),
            F.posexplode(F.expr(starts)).alias("chunk_idx", "start_pos"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(f"slice(toks, start_pos, {CHUNK_TOKENS})").alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").alias("n_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


ORACLE_CHUNK_SLIDING = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks) - {CHUNK_TOKENS}, 0) + 2, {CHUNK_STRIDE})) AS start_pos,
         unnest(range(len(range(1, greatest(len(toks) - {CHUNK_TOKENS}, 0) + 2, {CHUNK_STRIDE})))) AS chunk_idx
  FROM t
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(len(list_slice(toks, start_pos, start_pos + {CHUNK_TOKENS} - 1)) AS INTEGER) AS n_tokens,
       array_to_string(list_slice(toks, start_pos, start_pos + {CHUNK_TOKENS} - 1), ' ') AS chunk_text
FROM s
"""


def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics (language-model n-gram counting):
    adjacent token pairs per document, counted corpus-wide. explode →
    one map-side-combined groupBy."""
    d = load(spark, sf_dir, "documents")
    bigrams = F.expr(
        "CASE WHEN size(split(text, ' ')) < 2 THEN array()"
        " ELSE transform(sequence(1, size(split(text, ' ')) - 1),"
        "  i -> concat(element_at(split(text, ' '), i), ' ',"
        "              element_at(split(text, ' '), i + 1))) END"
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )


ORACLE_NGRAM_COUNTS = """
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
b AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)
)
SELECT bigram, COUNT(*) AS cnt FROM b GROUP BY bigram
"""


def q_token_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with stable ids (the tokenizer-
    training id assignment): rank by (count DESC, token ASC). The
    rank runs over the VOCABULARY (distinct tokens), not the corpus —
    and since a web-scale vocabulary is itself hundreds of millions of
    types (Zipf tail), it uses the distributed-rank kernel (r7) rather
    than a single sorted partition of the vocab."""
    from .kernels import chunked_global_rank

    d = load(spark, sf_dir, "documents")
    counts = (
        tokens_of(d)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return chunked_global_rank(
        counts, [F.desc("cnt"), F.asc("token")], "rn"
    ).select("token", "cnt", F.col("rn").cast("int").alias("vocab_id"))


ORACLE_TOKEN_VOCAB = """
SELECT token, cnt,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS INTEGER) AS vocab_id
FROM (
  SELECT token, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> '' GROUP BY token
)
"""


def q_stopword_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword removal with order-preserving reconstruction: tokens
    are position-tagged, filtered against the broadcast stopword list,
    and re-joined in position order — collect_list order is made
    deterministic by array_sort over (pos, token) structs."""
    d = load(spark, sf_dir, "documents")
    kept = (
        tokens_of(d)
        .filter((F.col("token") != "") & (~F.col("token").isin(*STOPWORDS)))
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, token))), x -> x.token)"),
            " ",
        ).alias("clean_text"),
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

ORACLE_STOPWORD_REMOVE = f"""
SELECT doc_id, COUNT(*) AS n_kept,
       string_agg(token, ' ' ORDER BY pos) AS clean_text
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
)
WHERE token <> '' AND token NOT IN ({_STOP_SQL})
GROUP BY doc_id
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch log sessionization (the training-data view of user event
    history): sessions split on ≥30-minute inactivity via lag + running
    sum — one shuffle on user_id, both window functions share it."""
    ev = load(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_sess = F.when(
        F.col("ts_us") - F.lag("ts_us").over(w_ord) >= GAP_30M_US, 1
    ).otherwise(0)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = ev.select(
        "user_id", "ts_us", "event_id", new_sess.alias("new_sess")
    ).withColumn("session_id", F.sum("new_sess").over(w_run))
    return marked.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


ORACLE_SESSIONIZE = f"""
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   >= {GAP_30M_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts_us,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us
FROM sess GROUP BY user_id, session_id
"""


def q_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data quality gate: length bounds, mean token length,
    and type-token (distinct) ratio as filter flags plus the combined
    keep decision — shuffle-free per-document arithmetic."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    mean_len = (F.length("text") - (n_tok - 1)).cast("double") / n_tok
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(n_distinct.cast("double") / n_tok, 6).alias("distinct_ratio"),
        (
            n_tok.between(20, 80)
            & (mean_len <= 8.0)
            & (n_distinct.cast("double") / n_tok >= 0.3)
        ).alias("keep"),
    )


ORACLE_LENGTH_FILTER = """
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       ROUND(CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks), 6) AS mean_token_len,
       ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS distinct_ratio,
       (len(toks) BETWEEN 20 AND 80
        AND CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks) <= 8.0
        AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3) AS keep
FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
"""

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+"
_NUM_RE = "[0-9]+"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scrubbing of telemetry payloads (the PII-redaction shape):
    count and redact digit runs and email-shaped substrings in
    events.props. Pure projections — no shuffle; regexes are shared
    verbatim with the oracle (Java and RE2 agree on this subset)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.size(F.expr(f"regexp_extract_all(props, '{_NUM_RE}', 0)")).alias("n_digit_runs"),
        F.size(F.expr(f"regexp_extract_all(props, '{_EMAIL_RE}', 0)")).alias("n_emails"),
        F.regexp_replace(
            F.regexp_replace("props", _EMAIL_RE, "<EMAIL>"), _NUM_RE, "<NUM>"
        ).alias("scrubbed"),
    )


ORACLE_PII_SCRUB = f"""
SELECT event_id,
       CAST(len(regexp_extract_all(props, '{_NUM_RE}')) AS INTEGER) AS n_digit_runs,
       CAST(len(regexp_extract_all(props, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
       regexp_replace(regexp_replace(props, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_NUM_RE}', '<NUM>', 'g') AS scrubbed
FROM events
"""


def q_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene: L2 norm plus the first two unit-normalized
    components (the checkable slice of x/|x|) — JVM-side fold, no
    Python, no shuffle."""
    emb = load(spark, sf_dir, "embeddings")
    n2 = _dot(F.col("embedding"), F.col("embedding"))
    return emb.select(
        "vec_id",
        F.round(F.sqrt(n2), 6).alias("l2_norm"),
        F.round(F.expr("CAST(element_at(embedding, 1) AS DOUBLE)") / F.sqrt(n2), 6).alias("u0"),
        F.round(F.expr("CAST(element_at(embedding, 2) AS DOUBLE)") / F.sqrt(n2), 6).alias("u1"),
    )


ORACLE_EMBEDDING_NORMALIZE = f"""
SELECT vec_id,
       ROUND(SQRT({_DOT_SQL.format(a='embedding', b='embedding')}), 6) AS l2_norm,
       ROUND(CAST(embedding[1] AS DOUBLE)
             / SQRT({_DOT_SQL.format(a='embedding', b='embedding')}), 6) AS u0,
       ROUND(CAST(embedding[2] AS DOUBLE)
             / SQRT({_DOT_SQL.format(a='embedding', b='embedding')}), 6) AS u1
FROM embeddings
"""


def q_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in long format (label, dimension, mean) —
    the k-means/IVF training step. posexplode → one map-side-combined
    groupBy on (label, dim); at scale this is the standard
    sum/count-per-dimension partial aggregate."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "x"))
        .groupBy("label", (F.col("pos0") + 1).alias("dim"))
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"))
    )


ORACLE_EMBEDDING_CENTROID = """
SELECT label, CAST(i AS INTEGER) AS dim,
       ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS centroid
FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
GROUP BY label, i
"""


def q_write_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-sink round trip — the lakehouse layout step of a
    training-data pipeline: write per-(lang, source) document stats
    partitioned BY lang to parquet, read them back through the
    partition-discovering reader, and return the read-back rows. The
    oracle recomputes the same stats straight from the table, so the
    round trip must be lossless (including the partition column's
    string→read-back identity). At 100 TB this is `partitionBy` on a
    low-cardinality column: one file set per partition value, enabling
    partition pruning for downstream readers."""
    import hashlib
    import os

    d = load(spark, sf_dir, "documents")
    stats = d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = os.path.join("/root/repo/.tmp", f"part_sink_{tag}")
    stats.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    return back.select(
        "lang", "source", "n_docs", "total_chars"
    )


ORACLE_WRITE_PARTITIONED = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2
"""


#: shard fan-out / file-size cap for the training-shard layout writer
SHARD_N = 8
SHARD_MAX_RECORDS = 100


def q_write_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard layout writer — the step that turns a cleaned
    corpus into the contiguous, size-capped files a sequential trainer
    reads: range-partition by doc_id into SHARD_N contiguous shards,
    sort within each shard, and write parquet with maxRecordsPerFile
    so no file exceeds the loader's chunk size. The returned aggregate
    re-reads the sharded output, so the round trip must be lossless
    (the oracle recomputes from the source table); the LAYOUT contract
    — files are doc_id-sorted and range-disjoint — is asserted
    per-file in tests/test_coverage.py.

    100 TB shape: repartitionByRange samples the key distribution and
    gives equal-sized contiguous shards regardless of skew;
    sortWithinPartitions is a per-shard spillable sort (no global
    sort); maxRecordsPerFile rolls files without extra shuffles."""
    import hashlib
    import os

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars", "text")
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = os.path.join("/root/repo/.tmp", f"shards_{tag}")
    (
        d.repartitionByRange(SHARD_N, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", SHARD_MAX_RECORDS)
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text")).alias("total_text_len"),
    )


ORACLE_WRITE_SHARDS = """
SELECT COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_text_len
FROM documents
"""


def q_entropy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy (bits) — the
    repetitiveness signal complementary to q_repetition_ratio: H = 0
    for a one-token doc, log₂(n_distinct) for a uniform one. Computed
    as log₂(N) − Σc·log₂(c)/N from per-(doc, token) counts — one
    explode→groupBy then a per-doc aggregate, both map-side
    combinable; no window, no driver state. Rounded 6 dp."""
    d = load(spark, sf_dir, "documents")
    tf = (
        tokens_of(d)
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    ln2 = F.log(F.lit(2.0))
    return tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(
            F.log(F.sum("c")) / ln2
            - F.sum(F.col("c") * F.log("c")) / F.sum("c") / ln2,
            6,
        ).alias("entropy_bits"),
    )


ORACLE_ENTROPY_TOKENS = """
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> '' GROUP BY doc_id, token
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_distinct,
       ROUND(ln(SUM(c)) / ln(2.0)
             - SUM(c * ln(c)) / SUM(c) / ln(2.0), 6) AS entropy_bits
FROM tf GROUP BY doc_id
"""


#: PMI vocabulary gate: a token must appear in ≥ this many documents
#: to enter the pair explosion (bounds the per-doc pair fan-out)
PMI_MIN_DF = 50
#: and a pair must co-occur in ≥ this many docs to be reported
PMI_MIN_PAIR = 10


def q_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in a
    document — the classic collocation / phrase-mining statistic:
    PMI(a,b) = log₂( p(a,b) / (p(a)·p(b)) ) over document-level
    presence probabilities.

    100 TB shape: presence sets are deduped per doc FIRST, then gated
    to tokens with df ≥ PMI_MIN_DF via a broadcast semi-join before
    the within-doc self-join — the pair explosion is bounded by the
    (small) frequent vocabulary, the same hot-list capping as
    minhash's max_df. The self-join shuffles once on doc_id; the pair
    count is map-side combinable; df stats are broadcast back."""
    d = load(spark, sf_dir, "documents")
    presence = (
        tokens_of(d)
        .filter(F.col("token") != "")
        .select("doc_id", "token")
        .distinct()
    )
    # corpus size enters the plan as a broadcast 1-row scalar (no
    # separate driver-side count job per call)
    n_docs = F.broadcast(d.agg(F.count("*").alias("n_docs")))
    df_ = (
        presence.groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= PMI_MIN_DF)
    )
    freq = presence.join(F.broadcast(df_.select("token")), "token")
    a = freq.select("doc_id", F.col("token").alias("tok_a"))
    b = freq.select("doc_id", F.col("token").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= PMI_MIN_PAIR)
    )
    return (
        pairs.join(
            F.broadcast(df_.select(F.col("token").alias("tok_a"), F.col("df").alias("df_a"))),
            "tok_a",
        )
        .join(
            F.broadcast(df_.select(F.col("token").alias("tok_b"), F.col("df").alias("df_b"))),
            "tok_b",
        )
        .crossJoin(n_docs)
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("n_docs").cast("double")
                    / (F.col("df_a").cast("double") * F.col("df_b"))
                )
                / F.log(F.lit(2.0)),
                6,
            ).alias("pmi"),
        )
    )


ORACLE_PMI_COOCCUR = f"""
WITH presence AS (
  SELECT DISTINCT doc_id, token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
df AS (
  SELECT token, COUNT(*) AS df FROM presence GROUP BY token
  HAVING COUNT(*) >= {PMI_MIN_DF}
),
freq AS (SELECT p.doc_id, p.token FROM presence p JOIN df USING (token)),
pairs AS (
  SELECT a.token AS tok_a, b.token AS tok_b, COUNT(*) AS n_ab
  FROM freq a JOIN freq b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
  HAVING COUNT(*) >= {PMI_MIN_PAIR}
)
SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
       ROUND(ln(CAST(n_ab AS DOUBLE) * (SELECT COUNT(*) FROM documents)
                / (CAST(da.df AS DOUBLE) * db.df)) / ln(2.0), 6) AS pmi
FROM pairs
JOIN df da ON da.token = tok_a
JOIN df db ON db.token = tok_b
"""


def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust scaling of document lengths within each source:
    (n_chars − median) / IQR — the outlier-insensitive normalization
    for length-based quality features (z-scores break under the
    heavy-tailed lengths real corpora have). Exact interpolated
    percentiles per source (both engines use the same linear
    interpolation); IQR = 0 groups emit NULL rather than ±inf.

    100 TB shape: the per-source medians/IQR come from the
    group-aware bracketing-order-statistic kernel (r7: the builtin
    grouped `percentile` buffered each source's whole length slice
    in one aggregation task — data-proportional at corpus scale);
    the per-source stats (3 doubles each) broadcast back over the
    documents scan."""
    from .kernels import chunked_group_quantiles

    d = load(spark, sf_dir, "documents")
    stats = chunked_group_quantiles(
        d,
        ["source"],
        "n_chars",
        [(0.5, "med"), (0.25, "q1"), (0.75, "q3")],
    )
    return (
        d.join(F.broadcast(stats), "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(
                F.when(
                    F.col("q3") != F.col("q1"),
                    (F.col("n_chars") - F.col("med")) / (F.col("q3") - F.col("q1")),
                ),
                6,
            ).alias("scaled_len"),
        )
    )


ORACLE_ROBUST_SCALE = """
WITH stats AS (
  SELECT source,
         quantile_cont(n_chars, 0.5)  AS med,
         quantile_cont(n_chars, 0.25) AS q1,
         quantile_cont(n_chars, 0.75) AS q3
  FROM documents GROUP BY source
)
SELECT doc_id, d.source, n_chars,
       ROUND(CASE WHEN q3 <> q1
                  THEN (n_chars - med) / (q3 - q1) END, 6) AS scaled_len
FROM documents d JOIN stats USING (source)
"""


#: bucket labels for the per-language quality terciles
_BUCKET_LABELS = ("head", "middle", "tail")


def q_ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    score each document with a cheap quality proxy (mean token length
    here, standing in for the LM-perplexity score), then split EACH
    language's corpus into head/middle/tail terciles — the curation
    quota mechanism used to sample pretraining mixes per language.

    The terciles are deterministic (unique (score desc, doc_id)
    tiebreak) and come from the group-aware distributed-rank kernel +
    the exact-NTILE integer formula (r7): a language is the textbook
    low-cardinality partition key, so Window.partitionBy(lang) would
    put an entire language's corpus — billions of documents for the
    head languages — in ONE sorted partition; chunked_group_rank
    spreads each language across range chunks and stitches ranks with
    a (lang × chunk)-sized offset table. Per-bucket rollups are exact
    integers / order statistics — no accumulation-order-sensitive
    float aggregates."""
    from .kernels import _ntile_expr, chunked_group_rank

    d = load(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " "))
    scored = d.select(
        "doc_id",
        "lang",
        n_toks.alias("n_tokens"),
        F.round((F.length("text") - n_toks + 1) / n_toks, 6).alias("score"),
    )
    ranked = chunked_group_rank(
        scored, ["lang"], [F.desc("score"), F.asc("doc_id")], "rn"
    )
    n_lang = scored.groupBy("lang").agg(F.count("*").alias("n_lang"))
    labels = F.array(*[F.lit(x) for x in _BUCKET_LABELS])
    b = ranked.join(F.broadcast(n_lang), "lang").withColumn(
        "bucket",
        F.element_at(
            labels,
            _ntile_expr(
                F.col("rn"), F.col("n_lang"), len(_BUCKET_LABELS)
            ).cast("int"),
        ),
    )
    return b.groupBy("lang", "bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


ORACLE_CCNET_BUCKET = """
WITH s AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         ROUND((length(text) - len(string_split(text, ' ')) + 1)
               / len(string_split(text, ' ')), 6) AS score
  FROM documents
),
b AS (
  SELECT lang, n_tokens, score,
         ['head', 'middle', 'tail'][
           ntile(3) OVER (PARTITION BY lang ORDER BY score DESC, doc_id)
         ] AS bucket
  FROM s
)
SELECT lang, bucket, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(score) AS min_score, MAX(score) AS max_score
FROM b GROUP BY lang, bucket
"""


# ---------------------------------------------------------------------------
# round-5 second batch (SURVEY §2.19): rule-based quality gating and
# importance resampling
# ---------------------------------------------------------------------------

#: Gopher-rule bounds (Rae et al. 2021 §A1.1, adapted to the synthetic
#: lowercase corpus): token-count window, mean-token-length window,
#: minimum stopword hits, minimum lexical diversity, minimum
#: alphabetic-token fraction
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_TOKLEN = 3.0
GOPHER_MAX_TOKLEN = 10.0
GOPHER_MIN_STOP_HITS = 2
GOPHER_MIN_DISTINCT = 0.2
GOPHER_MIN_ALPHA = 0.8

_STOPLIST_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021): the
    five classic document filters — token-count window, mean token
    length window, stopword evidence, lexical diversity, alphabetic
    fraction — each computed as a JVM-side higher-order-function fold
    over the split token array (``filter``/``aggregate``; no explode,
    no shuffle, no Python). One narrow projection over the corpus
    emits per-doc measures, per-rule booleans, and the conjunction
    keep flag — the shape that curates 100 TB in a single pass."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    n = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_len = sum_len.cast("double") / n
    n_dist = F.size(F.array_distinct(toks))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$")))
    distinct_ratio = n_dist.cast("double") / n
    alpha_frac = n_alpha.cast("double") / n
    ok_len = (n >= GOPHER_MIN_TOKENS) & (n <= GOPHER_MAX_TOKENS)
    ok_tok = (mean_len >= GOPHER_MIN_TOKLEN) & (mean_len <= GOPHER_MAX_TOKLEN)
    ok_stop = stop_hits >= GOPHER_MIN_STOP_HITS
    ok_dist = distinct_ratio >= GOPHER_MIN_DISTINCT
    ok_alpha = alpha_frac >= GOPHER_MIN_ALPHA
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_tok_len"),
        stop_hits.alias("stop_hits"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        ok_len.alias("ok_len"),
        ok_tok.alias("ok_tok"),
        ok_stop.alias("ok_stop"),
        ok_dist.alias("ok_dist"),
        ok_alpha.alias("ok_alpha"),
        (ok_len & ok_tok & ok_stop & ok_dist & ok_alpha).alias("keep"),
    )


ORACLE_GOPHER_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           / len(toks) AS mean_tok_len,
         len(list_filter(toks, x -> x IN ({_STOPLIST_SQL}))) AS stop_hits,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           AS distinct_ratio,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$')))
              AS DOUBLE) / len(toks) AS alpha_frac
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       ROUND(mean_tok_len, 6) AS mean_tok_len,
       CAST(stop_hits AS INTEGER) AS stop_hits,
       ROUND(distinct_ratio, 6) AS distinct_ratio,
       ROUND(alpha_frac, 6) AS alpha_frac,
       n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS} AS ok_len,
       mean_tok_len BETWEEN {GOPHER_MIN_TOKLEN} AND {GOPHER_MAX_TOKLEN}
         AS ok_tok,
       stop_hits >= {GOPHER_MIN_STOP_HITS} AS ok_stop,
       distinct_ratio >= {GOPHER_MIN_DISTINCT} AS ok_dist,
       alpha_frac >= {GOPHER_MIN_ALPHA} AS ok_alpha,
       (n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS})
         AND (mean_tok_len BETWEEN {GOPHER_MIN_TOKLEN} AND {GOPHER_MAX_TOKLEN})
         AND stop_hits >= {GOPHER_MIN_STOP_HITS}
         AND distinct_ratio >= {GOPHER_MIN_DISTINCT}
         AND alpha_frac >= {GOPHER_MIN_ALPHA} AS keep
FROM m
"""


#: DSIR target slice: documents whose language tag is this value
DSIR_TARGET_LANG = "en"


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023): score every
    document by the average log-likelihood ratio of an add-1-smoothed
    target-slice unigram LM (docs tagged ``en``) against the corpus
    LM — the data-selection signal used to resample a web-scale crawl
    toward a target domain. Two map-side-combined token aggregates
    build both LMs; the vocabulary-sized ratio table (with the four
    corpus scalars folded in via a 1-row crossJoin) broadcasts back
    onto the exploded token stream; one per-doc aggregate emits the
    weight. Corpus-sized shuffles: exactly one (the token explode
    groupBys); the vocabulary is orders of magnitude smaller."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    # ONE aggregate builds BOTH language models: the target-slice count
    # is a conditional sum inside the corpus groupBy (a separate
    # filtered aggregate would re-explode the corpus a second time)
    counts = (
        t.groupBy("token")
        .agg(
            F.count("*").alias("cc"),
            F.sum((F.col("lang") == DSIR_TARGET_LANG).cast("long")).alias("ct"),
        )
        # vocabulary-sized; checkpointed so the scalar rollup and the
        # ratio table don't each re-run the corpus explode
        .transform(lineage_cut)
    )
    scalars = counts.agg(
        F.count("*").alias("v"),
        F.sum("cc").alias("nc"),
        F.sum("ct").alias("nt"),
    )
    lm = (
        counts.crossJoin(F.broadcast(scalars))
        .select(
            "token",
            (
                F.log((F.col("ct") + 1.0) / (F.col("nt") + F.col("v")))
                - F.log((F.col("cc") + 1.0) / (F.col("nc") + F.col("v")))
            ).alias("llr"),
        )
    )
    return (
        t.join(F.broadcast(lm), "token")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("llr") / F.count("*"), 6).alias("avg_llr"),
        )
    )


ORACLE_DSIR_WEIGHTS = f"""
WITH t AS (
  SELECT doc_id, lang, x.token
  FROM documents,
       LATERAL (SELECT UNNEST(list_filter(string_split(text, ' '),
                                          s -> s <> '')) AS token) x
),
cc AS (SELECT token, COUNT(*) AS cc FROM t GROUP BY token),
ct AS (SELECT token, COUNT(*) AS ct FROM t
       WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY token),
scalars AS (
  SELECT (SELECT COUNT(*) FROM cc) AS v,
         (SELECT SUM(cc) FROM cc) AS nc,
         (SELECT COUNT(*) FROM t WHERE lang = '{DSIR_TARGET_LANG}') AS nt
),
lm AS (
  SELECT cc.token,
         LN((COALESCE(ct.ct, 0) + 1.0) / (s.nt + s.v))
           - LN((cc.cc + 1.0) / (s.nc + s.v)) AS llr
  FROM cc LEFT JOIN ct USING (token) CROSS JOIN scalars s
)
SELECT t.doc_id, t.lang, COUNT(*) AS n_tokens,
       ROUND(SUM(lm.llr) / COUNT(*), 6) AS avg_llr
FROM t JOIN lm USING (token)
GROUP BY t.doc_id, t.lang
"""


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram cross-entropy (bits/bigram) under an
    add-1-smoothed corpus bigram LM — the next rung above
    q_unigram_surprise on the cheap-perplexity ladder (a bigram model
    penalizes scrambled word salad that unigram statistics cannot
    see): p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V). One keyed lead window
    emits the bigram stream; two map-side-combined aggregates build
    the LM; the conditional-probability table joins back on the bigram
    key (broadcast here, plain shuffle join at corpus scale — the
    plan is otherwise unchanged); one per-doc aggregate scores. All
    engine-portable integer counts until the final log."""
    d = load(spark, sf_dir, "documents")
    # token stream and bigram stream each feed multiple consumers
    # (vocab scalar; LM counts + final scoring join) — checkpoint both
    # so the explode and the lead window run exactly once (the cluster
    # analogue is persist(DISK_ONLY) on the same two tables)
    t = tokens_of(d).filter(F.col("token") != "").transform(lineage_cut)
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        t.withColumn("nxt", F.lead("token").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", "token", "nxt")
        .transform(lineage_cut)
    )
    c12 = bg.groupBy("token", "nxt").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("token").agg(F.count("*").alias("c1"))
    v = t.agg(F.countDistinct("token").alias("v"))
    lm = (
        c12.join(c1, "token")
        .crossJoin(F.broadcast(v))
        .select(
            "token",
            "nxt",
            (
                -F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))
                / F.log(F.lit(2.0))
            ).alias("bits"),
        )
    )
    return (
        bg.join(F.broadcast(lm), ["token", "nxt"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("bits") / F.count("*"), 6).alias("bits_per_bigram"),
        )
    )


ORACLE_BIGRAM_LM = """
WITH t AS (
  SELECT doc_id, pos, token FROM (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
  ) WHERE token <> ''
),
bg AS (
  SELECT doc_id, token, nxt FROM (
    SELECT doc_id, token,
           LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM t
  ) WHERE nxt IS NOT NULL
),
c12 AS (SELECT token, nxt, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT token, COUNT(*) AS c1 FROM bg GROUP BY 1),
v AS (SELECT COUNT(DISTINCT token) AS v FROM t),
lm AS (
  SELECT c12.token, c12.nxt,
         -LN((c12.c12 + 1.0) / (c1.c1 + v.v)) / LN(2.0) AS bits
  FROM c12 JOIN c1 USING (token) CROSS JOIN v
)
SELECT bg.doc_id, COUNT(*) AS n_bigrams,
       ROUND(SUM(lm.bits) / COUNT(*), 6) AS bits_per_bigram
FROM bg JOIN lm ON bg.token = lm.token AND bg.nxt = lm.nxt
GROUP BY bg.doc_id
"""


#: session-path prefix length (events per session kept in the path key)
PATH_PREFIX = 5


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining (the product-analytics 'flow' view): after
    30-minute-gap sessionization, each session's first five event
    types become an ordered path key, counted corpus-wide — the table
    behind every 'where do users go after signup?' sankey. One keyed
    window pair (lag-gap marker + running session id, sharing a single
    user_id shuffle, same as q_sessionize), then one per-session
    aggregate whose order is pinned by array_sort over (ts, id, type)
    structs — collect_list alone is partition-order-nondeterministic,
    the classic silent-corruption bug this formulation avoids."""
    ev = load(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_sess = F.when(
        F.col("ts_us") - F.lag("ts_us").over(w_ord) >= GAP_30M_US, 1
    ).otherwise(0)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = ev.select(
        "user_id", "ts_us", "event_id", "event_type", new_sess.alias("ns")
    ).withColumn("session_id", F.sum("ns").over(w_run))
    paths = (
        marked.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.slice(
                    F.expr(
                        "transform(array_sort(collect_list("
                        "struct(ts_us, event_id, event_type))),"
                        " x -> x.event_type)"
                    ),
                    1,
                    PATH_PREFIX,
                ),
                ">",
            ).alias("path")
        )
    )
    return paths.groupBy("path").agg(F.count("*").alias("n_sessions"))


ORACLE_SESSION_PATHS = f"""
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   >= {GAP_30M_US}
              THEN 1 ELSE 0 END AS ns
  FROM events
),
sess AS (
  SELECT user_id, ts_us, event_id, event_type,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
paths AS (
  SELECT user_id, session_id,
         array_to_string(
           list_slice(list(event_type ORDER BY ts_us, event_id),
                      1, {PATH_PREFIX}), '>') AS path
  FROM sess GROUP BY user_id, session_id
)
SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path
"""


#: number of BPE merge rounds to learn
BPE_MERGES = 8


def _bpe_run(spark: SparkSession, sf_dir: str):
    """Shared BPE machinery: returns (merge list, final encoded
    (word, cnt, syms) vocabulary DataFrame) after BPE_MERGES rounds —
    q_bpe_learn reports the merges, q_bpe_encode the resulting
    subword statistics."""
    return _bpe_loop(spark, sf_dir)


def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary learning (Sennrich et al. 2016):
    learn the first BPE_MERGES merges over the corpus. The scale
    design: the corpus collapses ONCE to a (word, count) table — BPE
    statistics only ever depend on the weighted word VOCABULARY, which
    is orders of magnitude smaller than 100 TB of text — and each
    merge round is (a) one explode→groupBy counting weighted adjacent
    symbol pairs, (b) a 1-row argmax collect (a bounded scalar, the
    k-means-centroid convention), (c) a JVM higher-order fold applying
    the merge left-to-right non-overlapping to every word's symbol
    array. Ties break on (count DESC, left ASC, right ASC) so the
    learned vocabulary is deterministic. Rows-only by contract (each
    round's merge pair becomes a plan literal — data-dependent, not
    SQL-expressible); a pure-Python reference implementation pins the
    exact merge list in tests/test_textprep_extra.py."""
    merges, _ = _bpe_run(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, merged STRING, pair_count LONG"
    )


def _bpe_loop(spark: SparkSession, sf_dir: str):
    d = load(spark, sf_dir, "documents")
    words = (
        tokens_of(d)
        .filter(F.col("token") != "")
        .groupBy(F.col("token").alias("word"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "word",
            "cnt",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("syms"),
        )
        .transform(lineage_cut)
    )
    merges = []
    for rank in range(1, BPE_MERGES + 1):
        pairs = words.select(
            "cnt",
            F.explode(
                F.expr(
                    "IF(size(syms) < 2, cast(array() AS array<struct<l:string,r:string>>),"
                    " transform(sequence(1, size(syms) - 1),"
                    "  i -> struct(element_at(syms, i) AS l,"
                    "              element_at(syms, i + 1) AS r)))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, n = best[0]["l"], best[0]["r"], best[0]["n"]
        merges.append((rank, l, r, l + r, n))
        fold = (
            "aggregate(syms, cast(array() AS array<string>), (acc, s) ->"
            f" IF(size(acc) > 0 AND element_at(acc, -1) = '{l}' AND s = '{r}',"
            f"    concat(slice(acc, 1, size(acc) - 1), array('{l}{r}')),"
            "    concat(acc, array(s))))"
        )
        words = words.select(
            "word", "cnt", F.expr(fold).alias("syms")
        ).transform(lineage_cut)
    return merges, words


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merges and report the top-20 subword
    tokens by weighted corpus count (count DESC, token ASC) — the
    encode half of the tokenizer: learn produces the merge table,
    encode shows what the corpus tokenizes INTO. rows-only (the merge
    list is data-dependent plan state); the pure-Python reference in
    tests/test_llm_ops.py re-derives the exact same top-20.

    100 TB shape: identical to q_bpe_learn — statistics live on the
    weighted word VOCABULARY, never the raw corpus; the final subword
    rollup is one explode→map-side-combined groupBy over vocabulary
    rows, and the real corpus encode would be one broadcast of the
    merge list into a shuffle-free scan."""
    _, words = _bpe_run(spark, sf_dir)
    return (
        words.select("cnt", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


#: fixed activity-interval length attached to each event (5 minutes)
IVL_LEN_US = 300_000_000


def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: each event opens a 5-minute half-open
    activity interval; overlapping/adjacent intervals per (user, type)
    merge into maximal islands (the classic merge-overlapping-
    intervals problem, the coverage dual of q_sessionize's gap
    splitting), rolled up per event type as interval counts, total
    covered time, and the longest stretch — all exact integer
    epoch-micros.

    100 TB shape: the running-max-end window partitions by the
    FINE-GRAINED (user_id, event_type) key — millions of small
    partitions, never 5 type-sized sorts; islands then collapse in
    one map-side-combined rollup. Merge decisions are pure integer
    compares (ts > running max end; touching intervals merge)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    w_ord = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    prev_end = F.max(F.col("ts_us") + IVL_LEN_US).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        F.when(prev_end.isNull() | (F.col("ts_us") > prev_end), 1)
        .otherwise(0)
        .alias("new_ivl"),
    )
    islands = marked.select(
        "user_id",
        "event_type",
        "ts_us",
        F.sum("new_ivl")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    merged = islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts_us").alias("s"),
        (F.max("ts_us") + IVL_LEN_US).alias("e"),
    )
    return (
        merged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(F.col("e") - F.col("s")).alias("covered_us"),
            F.max(F.col("e") - F.col("s")).alias("longest_us"),
        )
        .orderBy("event_type")
    )


ORACLE_INTERVAL_MERGE = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
marked AS (
  SELECT user_id, event_type, ts_us, event_id,
         CASE WHEN MAX(ts_us + {IVL_LEN_US}) OVER (
                PARTITION BY user_id, event_type ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR ts_us > MAX(ts_us + {IVL_LEN_US}) OVER (
                PARTITION BY user_id, event_type ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_ivl
  FROM ev
),
islands AS (
  SELECT user_id, event_type, ts_us,
         SUM(new_ivl) OVER (PARTITION BY user_id, event_type
                            ORDER BY ts_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
),
merged AS (
  SELECT user_id, event_type, island,
         MIN(ts_us) AS s, MAX(ts_us) + {IVL_LEN_US} AS e
  FROM islands GROUP BY 1, 2, 3
)
SELECT event_type, COUNT(*) AS n_intervals,
       CAST(SUM(e - s) AS BIGINT) AS covered_us,
       CAST(MAX(e - s) AS BIGINT) AS longest_us
FROM merged GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "q_chunk_sliding": q_chunk_sliding,
    "q_ngram_counts": q_ngram_counts,
    "q_token_vocab": q_token_vocab,
    "q_stopword_remove": q_stopword_remove,
    "q_sessionize": q_sessionize,
    "q_interval_merge": q_interval_merge,
    "q_length_filter": q_length_filter,
    "q_pii_scrub": q_pii_scrub,
    "q_embedding_normalize": q_embedding_normalize,
    "q_embedding_centroid": q_embedding_centroid,
    "q_write_partitioned": q_write_partitioned,
    "q_entropy_tokens": q_entropy_tokens,
    "q_pmi_cooccur": q_pmi_cooccur,
    "q_robust_scale": q_robust_scale,
    "q_write_shards": q_write_shards,
    "q_ccnet_bucket": q_ccnet_bucket,
    "q_gopher_quality": q_gopher_quality,
    "q_dsir_weights": q_dsir_weights,
    "q_bigram_lm": q_bigram_lm,
    "q_bpe_learn": q_bpe_learn,
    "q_bpe_encode": q_bpe_encode,
    "q_session_paths": q_session_paths,
}

ORACLES = {
    "q_chunk_sliding": ORACLE_CHUNK_SLIDING,
    "q_ngram_counts": ORACLE_NGRAM_COUNTS,
    "q_token_vocab": ORACLE_TOKEN_VOCAB,
    "q_stopword_remove": ORACLE_STOPWORD_REMOVE,
    "q_sessionize": ORACLE_SESSIONIZE,
    "q_interval_merge": ORACLE_INTERVAL_MERGE,
    "q_length_filter": ORACLE_LENGTH_FILTER,
    "q_pii_scrub": ORACLE_PII_SCRUB,
    "q_embedding_normalize": ORACLE_EMBEDDING_NORMALIZE,
    "q_embedding_centroid": ORACLE_EMBEDDING_CENTROID,
    "q_write_partitioned": ORACLE_WRITE_PARTITIONED,
    "q_entropy_tokens": ORACLE_ENTROPY_TOKENS,
    "q_pmi_cooccur": ORACLE_PMI_COOCCUR,
    "q_robust_scale": ORACLE_ROBUST_SCALE,
    "q_write_shards": ORACLE_WRITE_SHARDS,
    "q_ccnet_bucket": ORACLE_CCNET_BUCKET,
    "q_gopher_quality": ORACLE_GOPHER_QUALITY,
    "q_dsir_weights": ORACLE_DSIR_WEIGHTS,
    "q_bigram_lm": ORACLE_BIGRAM_LM,
    "q_session_paths": ORACLE_SESSION_PATHS,
}
