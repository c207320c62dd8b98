"""Document chunking — split long documents into fixed-token-budget,
optionally overlapping windows: the context-window preparation step
every training / RAG ingestion pipeline runs between cleaning and
packing (sampling.pack_sequences packs the RESULTING chunks).

Semantics (exact, engine-portable):
- tokens = whitespace split of the trimmed text (textanalysis.tokens),
- chunk k covers token positions [k*stride, k*stride + chunk_tokens),
- n_chunks = 1 if n <= chunk_tokens else
  (n - chunk_tokens + stride - 1) DIV stride + 1  — pure integer math
  (no float ceil), so the window set is bit-identical in any engine;
  the final chunk may be shorter, never empty.

Scale shape (100 TB): map-only — the token array never leaves the row;
chunk fan-out is an explode of a per-row integer sequence (bounded by
doc length / stride), so output partitioning inherits input
partitioning and NOTHING shuffles. Degenerate docs (longer than any
sane token bound) are the caller's quality-filter problem upstream —
the operator's cost is linear in emitted chunks either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textanalysis import tokens


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 256,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk) — one row per window.
    ``stride`` defaults to ``chunk_tokens`` (no overlap); stride <
    chunk_tokens overlaps adjacent chunks by the difference."""
    c = int(chunk_tokens)
    s = int(stride) if stride is not None else c
    if c <= 0 or s <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    a = tokens(F.col(text_col))
    n = F.size(F.col("_a"))
    # integer ceil: (n - c + s - 1) DIV s + 1
    n_chunks = F.when(n <= c, F.lit(1).cast("long")).otherwise(
        F.expr(f"CAST((size(_a) - {c} + {s - 1}) DIV {s} AS BIGINT) + 1")
    )
    piece = F.slice(F.col("_a"), F.col("chunk_idx") * s + 1, c)
    return (
        docs.select(F.col(id_col).alias("doc_id"), a.alias("_a"))
        .select(
            "doc_id",
            "_a",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size(piece).cast("long").alias("n_tokens"),
            F.concat_ws(" ", piece).alias("chunk"),
        )
    )


def chunk_documents_oracle_sql(
    table_expr: str,
    *,
    chunk_tokens: int = 256,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """The identical windowing as DuckDB SQL — same tokenization, same
    integer chunk count, same 1-based inclusive slice bounds."""
    c = int(chunk_tokens)
    s = int(stride) if stride is not None else c
    return f"""
        WITH arr AS (
            SELECT {id_col} AS doc_id,
                   string_split_regex(trim({text_col}), ' +') AS a
            FROM {table_expr}
        ),
        meta AS (
            SELECT doc_id, a,
                   CASE WHEN len(a) <= {c} THEN 1
                        ELSE (len(a) - {c} + {s - 1}) // {s} + 1 END AS n_chunks
            FROM arr
        ),
        idx AS (
            SELECT doc_id, a, unnest(range(0, n_chunks)) AS chunk_idx
            FROM meta
        )
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(len(a[chunk_idx * {s} + 1 : chunk_idx * {s} + {c}]) AS BIGINT)
                   AS n_tokens,
               array_to_string(a[chunk_idx * {s} + 1 : chunk_idx * {s} + {c}], ' ')
                   AS chunk
        FROM idx
    """
