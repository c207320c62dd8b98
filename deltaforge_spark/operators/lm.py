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
