"""DSIR — Data Selection via Importance Resampling over hashed n-gram
features (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023, arXiv:2302.03169).

The standard pretraining-corpus curation step the reference's tooling
leaves downstream (docs/src/guarantees.md:380 disclaims any analytic
operators): given a small TARGET corpus (the distribution you want —
e.g. curated encyclopedic text) and the RAW crawl, estimate per-document
importance weights log(p_target(x)/p_raw(x)) under bag-of-hashed-n-gram
unigram models, then resample the raw corpus proportionally to weight
(Gumbel top-k, i.e. sampling without replacement).

Scale shape (100 TB):
- Feature extraction is map-only: tokenize, emit word unigrams+bigrams
  with multiplicity, hash each into one of B buckets (B = 4096 default,
  10k in the paper). No data beyond (doc_id, bucket, count) ever moves.
- Model fit = two counts-only shuffles (bucket -> count over raw and
  target) producing B-BOUNDED tables, joined into one B-row score table
  plus a 1-row normalizer — broadcast to every executor regardless of
  corpus size.
- Scoring = map-side bucket counts per doc, broadcast-join the score
  table, one doc-keyed counts-only re-aggregate. Linear, one shuffle.
- Selection = Gumbel top-k: priority = log_weight + gumbel(hash(doc)),
  global top-k compiles to TakeOrderedAndProject (per-partition heads +
  driver merge of k rows), never a global sort.

Determinism (oracle hash-match): every per-bucket log-ratio is computed
from exact integer counts and rounded to MICRO-nats (integer) before
any summation — ln() sees identical integer inputs in Spark and DuckDB,
and the per-doc total is an exact integer dot product:

    logw_micro = sum_b count_b * score_micro[b] + n_grams * norm_micro

with add-one smoothing over the B buckets:

    p_target[b] = (c_t[b] + 1) / (N_t + B)
    p_raw[b]    = (c_r[b] + 1) / (N_r + B)
    score[b]    = ln(c_t[b]+1) - ln(c_r[b]+1)      (micro-nat rounded)
    norm        = ln(N_r+B)    - ln(N_t+B)         (micro-nat rounded)

Magnitude: |score_micro| <= ln(N)*1e6 ~ 4e7 at 100 TB; a 1e5-gram
document's dot product stays below ~4e12 << 2^53 — exact in a BIGINT
and in DuckDB's double accumulator alike.

Gumbel keys reuse the engine-portable 48-bit md5 draw from
operators/sampling.py (u = (h+1)/2^48, g = -ln(-ln u)); priorities are
continuous, so cross-engine last-ulp ln() differences cannot reorder
the top-k cut except on measure-zero ties (doc_id breaks exact ties).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import sample_hash

_SPACE = 1 << 48
_MICRO = 1000000.0


def _words(text: Column) -> Column:
    """Whitespace tokens (same split as textanalysis.tokens)."""
    return F.split(F.trim(text), " +")


def _bucketed_grams(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """Map-side (doc_id, bucket) rows WITH multiplicity — the shared
    explode behind both the per-doc features and the corpus model
    counts. Features are word unigrams + bigrams (the paper's feature
    space), each hashed into ``n_buckets`` via the engine-portable
    48-bit md5; no raw text survives past this projection."""
    toks = _words(F.col(text_col))
    # guard: Spark's sequence(1, 0) counts DOWN instead of being empty
    # (same pitfall dedup.word_shingles documents)
    bigram = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigram)
    exploded = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))
        .filter(F.col("g") != "")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col("g"))), 1, 12),
            16,
            10,
        ).cast("long")
        % F.lit(n_buckets)
    )
    return exploded.select("doc_id", bucket.alias("bucket"))


def doc_gram_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """Per-document hashed n-gram bucket counts WITH multiplicity:
    (doc_id, bucket, cnt) — one doc-keyed counts-only aggregate over
    the map-side explode."""
    return (
        _bucketed_grams(
            df, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def corpus_bucket_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """Corpus-total bucket counts (bucket, cnt): the model-fit
    aggregate, keyed directly on bucket. r13 optimization (guide §2.4):
    the fit previously went through the per-doc aggregate and
    re-aggregated — a corpus-cardinality (doc_id, bucket) shuffle
    whose output was immediately collapsed to B rows; aggregating on
    bucket alone lets map-side partial aggregation bound the shuffle
    at B rows per task. Same totals by associativity of count."""
    return (
        _bucketed_grams(
            df, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def dsir_bucket_scores(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: str = "dsir",
) -> tuple[DataFrame, DataFrame]:
    """Fit the two hashed-n-gram unigram models and return
    ``(scores, norm)``:

    - ``scores``: (bucket, score_micro) — micro-nat-rounded
      ln(c_t+1) - ln(c_r+1) per bucket, at most ``n_buckets`` rows
      (B-bounded by construction; broadcastable at any corpus size).
    - ``norm``: 1 row (norm_micro,) — micro-nat-rounded
      ln(N_r+B) - ln(N_t+B), the per-gram normalizer.

    Two counts-only shuffles over the corpora; everything downstream of
    them is bounded by B, not the data.

    EAGER at build: the joined (bucket, c_raw, c_tgt) table — at most
    ``n_buckets`` rows by construction — is collected to the driver and
    re-emitted as a local table. Without that materialization Spark
    re-derives BOTH corpus-sized bucket aggregations once for the score
    table and once more for the normalizer (4 corpus scans + explodes
    instead of 2); with it, scoring embeds a LocalTableScan the
    optimizer broadcasts for free. The collect is O(B) — the same
    bounded-by-construction class as the BPE merge-table and
    partition-offset collects (test_plan_shape). ln() still evaluates
    JVM-side on the local table, preserving cross-engine micro-nat
    parity."""
    raw_b = corpus_bucket_counts(
        raw, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    ).withColumnRenamed("cnt", "c_raw")
    tgt_b = corpus_bucket_counts(
        target, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    ).withColumnRenamed("cnt", "c_tgt")
    joined_rows = (
        raw_b.join(tgt_b, "bucket", "full")
        .select(
            "bucket",
            F.coalesce(F.col("c_raw"), F.lit(0)).alias("c_raw"),
            F.coalesce(F.col("c_tgt"), F.lit(0)).alias("c_tgt"),
        )
        .collect()  # <= n_buckets rows by construction
    )
    joined = raw.sparkSession.createDataFrame(
        joined_rows, schema="bucket long, c_raw long, c_tgt long"
    )
    scores = joined.select(
        "bucket",
        F.round(
            (F.log(F.col("c_tgt") + F.lit(1)) - F.log(F.col("c_raw") + F.lit(1)))
            * F.lit(_MICRO),
            0,
        )
        .cast("long")
        .alias("score_micro"),
    )
    norm = joined.agg(
        F.round(
            (
                F.log(F.sum("c_raw") + F.lit(n_buckets))
                - F.log(F.sum("c_tgt") + F.lit(n_buckets))
            )
            * F.lit(_MICRO),
            0,
        )
        .cast("long")
        .alias("norm_micro")
    )
    return scores, norm


def doc_dsir_weights(
    df: DataFrame,
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """Per-document DSIR log importance weight:
    (doc_id, n_grams, log_weight).

    log_weight = log p_target(x) - log p_raw(x) under the two
    bag-of-hashed-n-gram models — an exact integer micro-nat dot
    product (see module docstring), divided and 6dp-rounded only at the
    very end. Buckets absent from both corpora score exactly 0
    (ln 1 - ln 1), so the left join's null coalesces losslessly."""
    scores, norm = dsir_bucket_scores(
        raw, target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, seed=seed,
    )
    doc_b = doc_gram_buckets(
        df, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    )
    agg = (
        # forced broadcast: the score table is <= n_buckets rows BY
        # CONSTRUCTION (a feature-hashing dimension, 4k-100k), so the
        # doc-side (corpus-scale) never shuffles on bucket — the only
        # shuffle in the scoring job is the final doc_id re-aggregate
        doc_b.join(F.broadcast(scores), "bucket", "left")
        .crossJoin(F.broadcast(norm))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            (
                F.sum(
                    F.col("cnt") * F.coalesce(F.col("score_micro"), F.lit(0))
                ).cast("long")
                + F.sum(F.col("cnt") * F.col("norm_micro")).cast("long")
            ).alias("logw_micro"),
        )
    )
    return agg.select(
        "doc_id",
        "n_grams",
        F.round(F.col("logw_micro").cast("double") / F.lit(_MICRO), 6).alias(
            "log_weight"
        ),
    )


def dsir_select(
    weights: DataFrame,
    *,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    seed: str = "dsirsel",
) -> DataFrame:
    """Gumbel top-k resampling: sample ``k`` documents WITHOUT
    replacement with probability proportional to exp(log_weight) —
    take the k largest (log_weight + Gumbel(hash(doc))) with the doc id
    as tie-break. The Gumbel draw is the deterministic 48-bit md5
    uniform (engine-portable, reshard-stable); the top-k compiles to
    TakeOrderedAndProject, never a global sort."""
    u = (sample_hash(F.col(id_col), seed) + F.lit(1)).cast("double") / F.lit(
        float(_SPACE)
    )
    gumbel = -F.log(-F.log(u))
    return (
        weights.withColumn("_pri", F.col(weight_col) + gumbel)
        .orderBy(F.col("_pri").desc(), F.col(id_col))
        .limit(k)
        .drop("_pri")
    )
