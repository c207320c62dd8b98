"""Unicode text normalization + per-document character statistics for
training-data pipelines.

Corpus cleaning normalizes text before tokenization/dedup so that
byte-different, render-identical strings (decomposed accents, stray
control bytes, run-on whitespace) cannot defeat exact-hash dedup or
inflate token counts. The pipeline here is the standard pre-tokenizer
stack (NFC → control-strip → whitespace-collapse → trim); character
entropy is the classic gibberish / binary-spill signal (low-entropy =
repeated filler, high-entropy = base64/binary spills).

Scale shape: every operator in this module is MAP-ONLY — no shuffle at
any size. NFC has no JVM builtin, so it runs as an Arrow-batched pandas
UDF (`Series.str.normalize`, C-implemented `unicodedata` underneath);
everything else is JVM column algebra. Entropy deliberately avoids the
explode-per-character shape (a (doc_id, char) explode inflates a 100 TB
corpus ~10x into a shuffle); instead each doc's codepoint histogram is
computed with numpy inside one Arrow pass.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# control chars stripped by cleanup: C0 minus \t \n \r, plus DEL.
# Identical regex text on the Spark (Java) and DuckDB (RE2) sides —
# only shared constructs (explicit \xNN classes), no \s shorthand
# (Java's \s includes \x0B, RE2's does not).
CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
WS_CLASS = "[ \\t\\n\\r]+"


def nfc_udf(col: Column) -> Column:
    """Unicode NFC composition, Arrow-batched (no JVM builtin). The
    pandas_udf is built lazily — decorating at import time needs an
    active SparkContext to parse the return-type DDL."""

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return _nfc(col)


def clean_text(col: Column) -> Column:
    """Post-NFC cleanup: strip control chars, collapse whitespace runs
    to single spaces, trim. Pure JVM expressions."""
    out = F.regexp_replace(col, CONTROL_CLASS, "")
    out = F.regexp_replace(out, WS_CLASS, " ")
    return F.trim(out)


def normalize_text(col: Column) -> Column:
    """Full normalization pipeline: NFC -> control strip -> whitespace
    collapse -> trim."""
    return clean_text(nfc_udf(col))


def normalize_documents(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_chars_raw, n_chars_norm, text_norm) per document —
    map-only, one Arrow pass for NFC + JVM regex cleanup."""
    norm = normalize_text(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        norm.alias("text_norm"),
    )


_ENTROPY_SCHEMA = (
    "doc_id long, n_chars long, n_distinct long, char_entropy double"
)


def char_entropy_documents(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document codepoint Shannon entropy (bits/char), distinct
    codepoint count, and length.

    H = log2(n) - sum(c_i * log2(c_i)) / n over the codepoint
    histogram — computed per doc with numpy over the UTF-32 view, one
    Arrow pass, zero shuffle (the explode-per-char formulation would
    shuffle ~10x the corpus bytes). Rounded to 6dp so distributed
    float-add order can't flip the last bit vs the oracle.
    """
    import numpy as np

    id_f, text_f = id_col, text_col

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_f].to_numpy()
            n_chars = np.zeros(len(pdf), dtype=np.int64)
            n_distinct = np.zeros(len(pdf), dtype=np.int64)
            ent = np.zeros(len(pdf), dtype=np.float64)
            for i, s in enumerate(pdf[text_f]):
                if not s:
                    continue
                cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
                counts = np.unique(cps, return_counts=True)[1].astype(np.float64)
                n = float(cps.size)
                n_chars[i] = cps.size
                n_distinct[i] = counts.size
                ent[i] = round(
                    np.log2(n) - float((counts * np.log2(counts)).sum()) / n, 6
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_chars": n_chars,
                    "n_distinct": n_distinct,
                    "char_entropy": ent,
                }
            )

    return df.select(id_f, text_f).mapInPandas(compute, _ENTROPY_SCHEMA)
