"""Unigram language-model scoring — CCNet-style perplexity filtering,
the standard LLM-training-data quality gate the reference's corpus
tooling leaves to downstream (this engine makes it a first-class
operator): build a smoothed unigram LM over a (reference) corpus, score
every document by average token surprisal, keep documents below a
perplexity threshold.

Scale shape (100 TB):
- LM build = one counts-only shuffle (token → count) + one 2-row
  aggregate for the normalizer (N tokens, V vocab). No row data moves.
- Scoring = explode tokens (map-side), join token counts — the LM side
  is the small one (vocab, not corpus), so Spark broadcasts it or
  shuffle-joins on the token key; either way per-doc work is linear and
  the re-aggregate is a counts-only shuffle keyed by doc_id.
- No Python anywhere: tokenize/ln/aggregate are all JVM expressions.

Determinism (oracle hash-match): per-token surprisal is rounded to
MICRO-units and summed as exact integers — double summation order never
matters, and ln() is evaluated on the same integer inputs in both
engines (see duckdb parity rules). One final division + round yields
the per-doc average; ppl = exp(avg) rounded to 4dp.

Model: add-one smoothing over the LM corpus,
    p(t) = (c_t + 1) / (N + V + 1)
with unseen tokens taking c_t = 0 — so surprisal(t) =
ln(N + V + 1) - ln(c_t + 1), always >= 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textanalysis import tokens


def unigram_lm(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Token → count over the corpus (the LM table). One counts-only
    shuffle; empty tokens dropped (split artifacts)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lm_normalizer(lm: DataFrame) -> DataFrame:
    """One row: N (total tokens), V (vocab size). The add-one
    denominator is N + V + 1 (the +1 is the unseen-token mass)."""
    return lm.agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )


def doc_surprisal(
    df: DataFrame,
    lm: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average token surprisal under the add-one unigram
    LM, plus perplexity: (doc_id, n_tokens, avg_surprisal, ppl).

    avg_surprisal = mean over tokens of ln(N+V+1) - ln(c_t+1), each
    term rounded to micro-units (integer) before the sum, so the
    distributed aggregation is order-independent and cross-engine
    exact.
    """
    norm = lm_normalizer(lm)  # 1 row → broadcast crossJoin (benign)
    toks = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    scored = (
        # no forced broadcast on the LM side: at bench SFs AQE
        # broadcasts the vocab-sized table on its own; at 100 TB a
        # 100M-token vocab must be allowed to shuffle-join on the
        # token key instead of OOMing the driver
        toks.join(lm, "token", "left")
        .crossJoin(F.broadcast(norm))
        .select(
            id_col,
            # micro-unit integer surprisal: round(ln * 1e6) is an exact
            # integral double (< 2^53), safe to cast in either engine
            F.round(
                (
                    F.log(F.col("n_total") + F.col("vocab") + F.lit(1))
                    - F.log(F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1))
                )
                * F.lit(1000000.0),
                0,
            )
            .cast("long")
            .alias("sup_micro"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("sup_micro").cast("long").alias("sum_micro"),
    )
    # half-up integer division to micro-units BEFORE any double math:
    # (2a + b) div (2b) == floor(a/b + 1/2) for the non-negative values
    # here. Dividing doubles first and rounding to 6dp hit rounding-
    # midpoint disagreements at sf1 (sum_micro/n_tokens landing on
    # ...845e-6 exactly: Spark's BigDecimal HALF_UP vs DuckDB's double
    # round differed on 9 of 50000 docs); the integer quotient is
    # ~1e-16 from the 6dp grid, never near a midpoint, so the final
    # round is boundary-free in both engines.
    avg_micro = F.expr(
        "CAST((2 * sum_micro + n_tokens) DIV (2 * n_tokens) AS BIGINT)"
    )
    avg = avg_micro.cast("double") / F.lit(1000000.0)
    return agg.select(
        id_col,
        "n_tokens",
        F.round(avg, 6).alias("avg_surprisal"),
        # exp over the identically-computed double; 4dp absorbs the
        # cross-engine last-ulp of exp
        F.round(F.exp(F.round(avg, 6)), 4).alias("ppl"),
    )


def perplexity_filter(
    df: DataFrame,
    lm: DataFrame,
    *,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The CCNet gate: documents scored against the LM, flagged
    keep = (ppl <= max_ppl). Emitted with the score so the caller can
    bin (CCNet's head/middle/tail tertiles) instead of hard-filtering."""
    scored = doc_surprisal(df, lm, text_col=text_col, id_col=id_col)
    return scored.withColumn("keep", (F.col("ppl") <= F.lit(float(max_ppl))))


def weighted_sample(
    df: DataFrame,
    *,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsmp",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority /
    A-ES sampling): each row draws u = (hash48(key)+1) / 2^48 ∈ (0,1]
    and keeps priority u^(1/w); the global top-k priorities are the
    sample — inclusion probability proportional to weight, reproducible
    across runs and reshards.

    Scale shape: priority is a map-side expression; top-k compiles to
    TakeOrderedAndProject (per-partition heads + driver merge of k
    rows), never a global sort. The deterministic (priority, key)
    order breaks ties identically in any engine.
    """
    from .sampling import _SPACE, sample_hash

    u = (sample_hash(F.col(key_col), seed) + F.lit(1)).cast("double") / F.lit(
        float(_SPACE)
    )
    w = F.col(weight_col).cast("double")
    pri = F.pow(u, F.lit(1.0) / F.greatest(w, F.lit(1e-12)))
    return (
        df.withColumn("_pri", pri)
        .orderBy(F.col("_pri").desc(), F.col(key_col))
        .limit(k)
        .drop("_pri")
    )


# ----------------------------------------------------- bigram + backoff
#
# CCNet-style filtering wants more context than a unigram LM (the
# reference pipeline uses a 5-gram KenLM; VERDICT r8 #6 asked for
# >=bigram with backoff). Model: STUPID BACKOFF (Brants et al. 2007,
# "Large Language Models in Machine Translation" — the standard
# web-scale smoothing precisely because it needs only raw counts):
#
#     score(w2 | w1) = c(w1 w2) / c(w1)          if c(w1 w2) > 0
#                    = alpha * p_add1(w2)         otherwise
#
# with alpha = 0.4 (the paper's constant) and p_add1 the same add-one
# unigram the existing path uses — so the backoff branch reuses
# unigram_lm/lm_normalizer unchanged.
#
# Scale shape (100 TB): the LM build is two counts-only shuffles
# (bigram, unigram — no row data moves); scoring explodes doc bigrams
# map-side (zip-against-tail, no posexplode self-join) and joins three
# COUNT tables by key — Spark broadcasts them while they fit and
# shuffle-joins on the token key beyond that, same policy as
# doc_surprisal. Determinism: per-bigram surprisal rounds to integer
# micro-nats before the sum (order-independent), the per-doc average
# is a half-up integer division — the exact conventions the unigram
# path proved at sf1.


def _doc_bigrams(df: DataFrame, *, text_col: str, id_cols: list[str]) -> DataFrame:
    """(id_cols..., w1, w2): adjacent token pairs, map-side."""
    a = tokens(F.col(text_col))
    n = F.size(a)
    pairs = F.zip_with(
        F.slice(a, 1, n - 1),
        F.slice(a, 2, n - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    return (
        df.select(*id_cols, F.explode(pairs).alias("_p"))
        .select(*id_cols, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )


def bigram_lm(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(w1, w2) -> c12 over the LM corpus. One counts-only shuffle."""
    return _doc_bigrams(df, text_col=text_col, id_cols=[]).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )


def doc_surprisal_backoff(
    df: DataFrame,
    lm_corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ppl: float | None = None,
) -> DataFrame:
    """Score every document of ``df`` under a stupid-backoff bigram LM
    trained on ``lm_corpus``: (doc_id, n_bigrams, avg_surprisal, ppl
    [, keep]). Documents with no valid bigram (<2 tokens) are emitted
    with n_bigrams=0, null scores and keep=false (ADVICE r10: the
    filter surface covers the FULL input, like perplexity_filter).

    Surprisal per bigram, in integer micro-nats:
      seen:    round((ln(c1) - ln(c12)) * 1e6)
      backoff: round((ln(N+V+1) - ln(c2+1) + ln(2.5)) * 1e6)
    (ln(2.5) = -ln(alpha) for alpha = 0.4; unseen w2 takes c2 = 0.)
    """
    uni = unigram_lm(lm_corpus, text_col=text_col)
    big = bigram_lm(lm_corpus, text_col=text_col)
    norm = lm_normalizer(uni)
    toks = _doc_bigrams(df, text_col=text_col, id_cols=[id_col])
    u1 = uni.select(F.col("token").alias("w1"), F.col("cnt").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("cnt").alias("c2"))
    seen = (F.log(F.col("c1").cast("double")) - F.log(F.col("c12").cast("double"))) * F.lit(
        1000000.0
    )
    backoff = (
        F.log((F.col("n_total") + F.col("vocab") + F.lit(1)).cast("double"))
        - F.log((F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double"))
        + F.log(F.lit(2.5))
    ) * F.lit(1000000.0)
    scored = (
        toks.join(big, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(norm))
        .select(
            id_col,
            F.round(F.when(F.col("c12").isNotNull(), seen).otherwise(backoff), 0)
            .cast("long")
            .alias("sup_micro"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("sup_micro").cast("long").alias("sum_micro"),
    )
    avg_micro = F.expr(
        "CAST((2 * sum_micro + n_bigrams) DIV (2 * n_bigrams) AS BIGINT)"
    )
    avg = avg_micro.cast("double") / F.lit(1000000.0)
    scored_docs = agg.select(
        id_col,
        "n_bigrams",
        F.round(avg, 6).alias("avg_surprisal"),
        F.round(F.exp(F.round(avg, 6)), 4).alias("ppl"),
    )
    # ADVICE r10: docs with <2 tokens carry no bigram evidence but must
    # still appear on the filter surface (n_bigrams=0, null score,
    # keep=false) — otherwise a caller switching from the unigram
    # perplexity_filter silently lets empty/one-token docs through.
    base = df.select(id_col).distinct()
    out = base.join(scored_docs, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        "avg_surprisal",
        "ppl",
    )
    if max_ppl is not None:
        out = out.withColumn(
            "keep", F.coalesce(F.col("ppl") <= F.lit(float(max_ppl)), F.lit(False))
        )
    return out


def doc_surprisal_backoff_oracle_sql(
    *,
    table_expr: str = "documents",
    lm_filter: str = "doc_id % 2 = 0",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ppl: float | None = None,
) -> str:
    """DuckDB twin of doc_surprisal_backoff with the LM trained on the
    ``lm_filter`` subset: identical tokenization (PMI-oracle
    zip-against-tail), identical micro-nat rounding, identical half-up
    integer average."""
    keep = (
        f", coalesce(ppl <= {float(max_ppl)}, false) AS keep"
        if max_ppl is not None
        else ""
    )
    return f"""
        WITH lmdocs AS MATERIALIZED (
            SELECT {id_col}, {text_col} FROM {table_expr} WHERE {lm_filter}),
        uni AS MATERIALIZED (
            SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT unnest(string_split_regex(trim({text_col}), ' +')) AS w
                FROM lmdocs
            ) WHERE w <> '' GROUP BY w),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                       CAST(count(*) AS BIGINT) AS vocab FROM uni),
        big AS MATERIALIZED (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
                SELECT z[1] AS w1, z[2] AS w2 FROM (
                    SELECT unnest(list_zip(a[1:-2], a[2:-1])) AS z FROM (
                        SELECT string_split_regex(trim({text_col}), ' +') AS a
                        FROM lmdocs))
            ) WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2),
        db AS (
            SELECT {id_col}, z[1] AS w1, z[2] AS w2 FROM (
                SELECT {id_col}, unnest(list_zip(a[1:-2], a[2:-1])) AS z FROM (
                    SELECT {id_col}, string_split_regex(trim({text_col}), ' +') AS a
                    FROM {table_expr})
            ) WHERE z[1] <> '' AND z[2] <> ''),
        scored AS (
            SELECT {id_col},
                   CAST(round(CASE WHEN b.c12 IS NOT NULL
                       THEN (ln(CAST(u1.c1 AS DOUBLE)) - ln(CAST(b.c12 AS DOUBLE)))
                            * 1000000.0
                       ELSE (ln(CAST(tot.n_total + tot.vocab + 1 AS DOUBLE))
                             - ln(CAST(coalesce(u2.c2, 0) + 1 AS DOUBLE))
                             + ln(2.5)) * 1000000.0
                   END) AS BIGINT) AS sup
            FROM db
            LEFT JOIN big b USING (w1, w2)
            LEFT JOIN (SELECT w AS w1, c AS c1 FROM uni) u1 USING (w1)
            LEFT JOIN (SELECT w AS w2, c AS c2 FROM uni) u2 USING (w2)
            CROSS JOIN tot),
        agg AS (
            SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(sum(sup) AS BIGINT) AS sum_micro
            FROM scored GROUP BY {id_col}),
        avg AS (
            SELECT {id_col}, n_bigrams,
                   CAST((2 * sum_micro + n_bigrams) // (2 * n_bigrams) AS BIGINT)
                       AS avg_micro
            FROM agg)
        SELECT d.{id_col},
               coalesce(n_bigrams, 0) AS n_bigrams,
               round(CAST(avg_micro AS DOUBLE) / 1000000.0, 6) AS avg_surprisal,
               round(exp(round(CAST(avg_micro AS DOUBLE) / 1000000.0, 6)), 4) AS ppl
               {keep}
        FROM (SELECT DISTINCT {id_col} FROM {table_expr}) d
        LEFT JOIN avg USING ({id_col})
    """


# ---------------------------------------------------- trigram + backoff
#
# One order higher than the bigram LM (VERDICT r10 #4 — CCNet-style
# production filtering uses a 5-gram KenLM; each added order is the
# same counts-only shuffle pattern). Stupid backoff chains down:
#
#     score(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)   if the trigram is seen
#                       = 0.4 * score(w3 | w2)      else (bigram rule)
#     score(w3 | w2)    = c(w2 w3) / c(w2)          if the bigram is seen
#                       = 0.4 * p_add1(w3)          else (unigram add-one)
#
# so per-trigram surprisal in integer micro-nats is one of three cases:
#   tri seen:  round((ln c12 - ln c123) * 1e6)
#   big seen:  round((ln 2.5 + ln c2 - ln c23) * 1e6)
#   unigram:   round((2*ln 2.5 + ln(N+V+1) - ln(c3+1)) * 1e6)
# (ln 2.5 = -ln alpha, alpha = 0.4; a corpus trigram implies its
# (w1,w2) bigram and a corpus bigram implies its w2 unigram, so the
# case tests need only c123/c23 null checks.)
#
# Scale shape (100 TB): THREE counts-only LM shuffles (tri/bi/uni —
# no row data moves), doc trigrams explode map-side (double
# zip-against-tail, no posexplode self-join), and scoring is n-gram-
# keyed count joins — Spark broadcasts the LM sides while they fit
# and shuffle-joins on the token key beyond that. The only cartesian
# is the 1-row normalizer broadcast. Determinism: integer micro-nats
# before the sum, half-up integer average — the bigram conventions.


def _doc_trigrams(df: DataFrame, *, text_col: str, id_cols: list[str]) -> DataFrame:
    """(id_cols..., w1, w2, w3): adjacent token triples, map-side."""
    a = tokens(F.col(text_col))
    n = F.greatest(F.size(a) - F.lit(2), F.lit(0))  # <3 tokens -> no triples
    pairs = F.zip_with(
        F.slice(a, 1, n),
        F.slice(a, 2, n),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    trips = F.zip_with(
        pairs,
        F.slice(a, 3, n),
        lambda p, z: F.struct(
            p["w1"].alias("w1"), p["w2"].alias("w2"), z.alias("w3")
        ),
    )
    return (
        df.select(*id_cols, F.explode(trips).alias("_t"))
        .select(
            *id_cols,
            F.col("_t.w1").alias("w1"),
            F.col("_t.w2").alias("w2"),
            F.col("_t.w3").alias("w3"),
        )
        .filter((F.col("w1") != "") & (F.col("w2") != "") & (F.col("w3") != ""))
    )


def trigram_lm(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(w1, w2, w3) -> c123 over the LM corpus. One counts-only shuffle."""
    return (
        _doc_trigrams(df, text_col=text_col, id_cols=[])
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c123"))
    )


def doc_surprisal_backoff_trigram(
    df: DataFrame,
    lm_corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ppl: float | None = None,
) -> DataFrame:
    """Score every document of ``df`` under a stupid-backoff TRIGRAM LM
    trained on ``lm_corpus``: (doc_id, n_trigrams, avg_surprisal, ppl
    [, keep]). Documents with <3 tokens are emitted with n_trigrams=0,
    null scores and keep=false — the full-input filter surface."""
    uni = unigram_lm(lm_corpus, text_col=text_col)
    big = bigram_lm(lm_corpus, text_col=text_col)
    tri = trigram_lm(lm_corpus, text_col=text_col)
    norm = lm_normalizer(uni)
    toks = _doc_trigrams(df, text_col=text_col, id_cols=[id_col])
    b12 = big.select("w1", "w2", "c12")
    b23 = big.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c12").alias("c23")
    )
    u2 = uni.select(F.col("token").alias("w2"), F.col("cnt").alias("c2"))
    u3 = uni.select(F.col("token").alias("w3"), F.col("cnt").alias("c3"))
    tri_seen = (
        F.log(F.col("c12").cast("double")) - F.log(F.col("c123").cast("double"))
    ) * F.lit(1000000.0)
    big_seen = (
        F.log(F.lit(2.5))
        + F.log(F.col("c2").cast("double"))
        - F.log(F.col("c23").cast("double"))
    ) * F.lit(1000000.0)
    uni_back = (
        F.lit(2.0) * F.log(F.lit(2.5))
        + F.log((F.col("n_total") + F.col("vocab") + F.lit(1)).cast("double"))
        - F.log((F.coalesce(F.col("c3"), F.lit(0)) + F.lit(1)).cast("double"))
    ) * F.lit(1000000.0)
    scored = (
        toks.join(tri, ["w1", "w2", "w3"], "left")
        .join(b12, ["w1", "w2"], "left")
        .join(b23, ["w2", "w3"], "left")
        .join(u2, "w2", "left")
        .join(u3, "w3", "left")
        .crossJoin(F.broadcast(norm))
        .select(
            id_col,
            F.round(
                F.when(F.col("c123").isNotNull(), tri_seen)
                .when(F.col("c23").isNotNull(), big_seen)
                .otherwise(uni_back),
                0,
            )
            .cast("long")
            .alias("sup_micro"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum("sup_micro").cast("long").alias("sum_micro"),
    )
    avg_micro = F.expr(
        "CAST((2 * sum_micro + n_trigrams) DIV (2 * n_trigrams) AS BIGINT)"
    )
    avg = avg_micro.cast("double") / F.lit(1000000.0)
    scored_docs = agg.select(
        id_col,
        "n_trigrams",
        F.round(avg, 6).alias("avg_surprisal"),
        F.round(F.exp(F.round(avg, 6)), 4).alias("ppl"),
    )
    base = df.select(id_col).distinct()
    out = base.join(scored_docs, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_trigrams"), F.lit(0)).cast("long").alias("n_trigrams"),
        "avg_surprisal",
        "ppl",
    )
    if max_ppl is not None:
        out = out.withColumn(
            "keep", F.coalesce(F.col("ppl") <= F.lit(float(max_ppl)), F.lit(False))
        )
    return out


def doc_surprisal_backoff_trigram_oracle_sql(
    *,
    table_expr: str = "documents",
    lm_filter: str = "doc_id % 2 = 0",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ppl: float | None = None,
) -> str:
    """DuckDB twin of doc_surprisal_backoff_trigram: identical
    tokenization, identical case order (tri seen → bigram backoff →
    add-one unigram), identical micro-nat rounding and half-up
    integer average."""
    keep = (
        f", coalesce(ppl <= {float(max_ppl)}, false) AS keep"
        if max_ppl is not None
        else ""
    )
    return f"""
        WITH lmdocs AS MATERIALIZED (
            SELECT {id_col}, {text_col} FROM {table_expr} WHERE {lm_filter}),
        uni AS MATERIALIZED (
            SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT unnest(string_split_regex(trim({text_col}), ' +')) AS w
                FROM lmdocs
            ) WHERE w <> '' GROUP BY w),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                       CAST(count(*) AS BIGINT) AS vocab FROM uni),
        big AS MATERIALIZED (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
                SELECT z[1] AS w1, z[2] AS w2 FROM (
                    SELECT unnest(list_zip(a[1:-2], a[2:-1])) AS z FROM (
                        SELECT string_split_regex(trim({text_col}), ' +') AS a
                        FROM lmdocs))
            ) WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2),
        tri AS MATERIALIZED (
            SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c123 FROM (
                SELECT z[1] AS w1, z[2] AS w2, z[3] AS w3 FROM (
                    SELECT unnest(list_zip(a[1:-3], a[2:-2], a[3:-1])) AS z FROM (
                        SELECT string_split_regex(trim({text_col}), ' +') AS a
                        FROM lmdocs))
            ) WHERE w1 <> '' AND w2 <> '' AND w3 <> '' GROUP BY w1, w2, w3),
        db AS (
            SELECT {id_col}, z[1] AS w1, z[2] AS w2, z[3] AS w3 FROM (
                SELECT {id_col}, unnest(list_zip(a[1:-3], a[2:-2], a[3:-1])) AS z FROM (
                    SELECT {id_col}, string_split_regex(trim({text_col}), ' +') AS a
                    FROM {table_expr})
            ) WHERE z[1] <> '' AND z[2] <> '' AND z[3] <> ''),
        scored AS (
            SELECT {id_col},
                   CAST(round(CASE
                       WHEN t.c123 IS NOT NULL
                       THEN (ln(CAST(b12.c12 AS DOUBLE)) - ln(CAST(t.c123 AS DOUBLE)))
                            * 1000000.0
                       WHEN b23.c23 IS NOT NULL
                       THEN (ln(2.5) + ln(CAST(u2.c2 AS DOUBLE))
                             - ln(CAST(b23.c23 AS DOUBLE))) * 1000000.0
                       ELSE (2.0 * ln(2.5)
                             + ln(CAST(tot.n_total + tot.vocab + 1 AS DOUBLE))
                             - ln(CAST(coalesce(u3.c3, 0) + 1 AS DOUBLE))) * 1000000.0
                   END) AS BIGINT) AS sup
            FROM db
            LEFT JOIN tri t USING (w1, w2, w3)
            LEFT JOIN big b12 USING (w1, w2)
            LEFT JOIN (SELECT w1 AS w2, w2 AS w3, c12 AS c23 FROM big) b23
                   USING (w2, w3)
            LEFT JOIN (SELECT w AS w2, c AS c2 FROM uni) u2 USING (w2)
            LEFT JOIN (SELECT w AS w3, c AS c3 FROM uni) u3 USING (w3)
            CROSS JOIN tot),
        agg AS (
            SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_trigrams,
                   CAST(sum(sup) AS BIGINT) AS sum_micro
            FROM scored GROUP BY {id_col}),
        avg AS (
            SELECT {id_col}, n_trigrams,
                   CAST((2 * sum_micro + n_trigrams) // (2 * n_trigrams) AS BIGINT)
                       AS avg_micro
            FROM agg)
        SELECT d.{id_col},
               coalesce(n_trigrams, 0) AS n_trigrams,
               round(CAST(avg_micro AS DOUBLE) / 1000000.0, 6) AS avg_surprisal,
               round(exp(round(CAST(avg_micro AS DOUBLE) / 1000000.0, 6)), 4) AS ppl
               {keep}
        FROM (SELECT DISTINCT {id_col} FROM {table_expr}) d
        LEFT JOIN avg USING ({id_col})
    """


# ------------------------------------------------------- CCNet binning
#
# CCNet (Wenzek et al. 2020) doesn't hard-filter on perplexity — it
# splits the corpus into HEAD / MIDDLE / TAIL tertiles per language
# and samples preferentially from the head. The binning is a global
# NTILE over a fully tie-broken order (ppl, then doc_id), so both
# engines bucket identically. Scale shape: the window input is the
# per-doc SCORED table (one slim row per doc, the corpus is never
# re-sorted); at billions of docs the documented swap is
# percentile-boundary bucketing (compute the two cutoffs, assign by
# comparison — the events_sampled_percentiles discipline), same as
# the customer_value_deciles adjudication in SCALE.md.


def perplexity_bins(
    df: DataFrame,
    lm: DataFrame,
    *,
    n_bins: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, ppl, bin): unigram-LM perplexity with the
    CCNet tertile assignment (bin 1 = head = lowest perplexity).
    Docs the scorer covers (>=1 token) are binned; the caller keeps
    head/middle and downsamples tail, per CCNet."""
    from pyspark.sql import Window

    scored = doc_surprisal(df, lm, text_col=text_col, id_col=id_col)
    w = Window.orderBy(F.col("ppl").asc(), F.col(id_col))
    return scored.select(
        id_col,
        "n_tokens",
        "ppl",
        F.ntile(n_bins).over(w).cast("long").alias("bin"),
    )


def perplexity_bins_oracle_sql(
    *,
    table_expr: str = "documents",
    lm_filter: str = "doc_id % 2 = 0",
    n_bins: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: the unigram scorer's oracle conventions + the same
    tie-broken NTILE."""
    return f"""
        WITH lmdocs AS MATERIALIZED (
            SELECT {id_col}, {text_col} FROM {table_expr} WHERE {lm_filter}),
        uni AS MATERIALIZED (
            SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT unnest(string_split_regex(trim({text_col}), ' +')) AS w
                FROM lmdocs
            ) WHERE w <> '' GROUP BY w),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                       CAST(count(*) AS BIGINT) AS vocab FROM uni),
        dt AS (
            SELECT {id_col}, w FROM (
                SELECT {id_col},
                       unnest(string_split_regex(trim({text_col}), ' +')) AS w
                FROM {table_expr}
            ) WHERE w <> ''),
        scored AS (
            SELECT {id_col},
                   CAST(round((ln(CAST(tot.n_total + tot.vocab + 1 AS DOUBLE))
                               - ln(CAST(coalesce(u.c, 0) + 1 AS DOUBLE)))
                              * 1000000.0) AS BIGINT) AS sup
            FROM dt LEFT JOIN uni u USING (w) CROSS JOIN tot),
        agg AS (
            SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(sup) AS BIGINT) AS sum_micro
            FROM scored GROUP BY {id_col}),
        avg AS (
            SELECT {id_col}, n_tokens,
                   CAST((2 * sum_micro + n_tokens) // (2 * n_tokens) AS BIGINT)
                       AS avg_micro
            FROM agg),
        ppl AS (
            SELECT {id_col}, n_tokens,
                   round(exp(round(CAST(avg_micro AS DOUBLE) / 1000000.0, 6)), 4)
                       AS ppl
            FROM avg)
        SELECT {id_col}, n_tokens, ppl,
               CAST(ntile({n_bins}) OVER (ORDER BY ppl ASC, {id_col}) AS BIGINT)
                   AS bin
        FROM ppl
    """
