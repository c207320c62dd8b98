"""Drift detection: observed data vs declared schema.

Re-expresses the reference's drift detector (reference:
crates/runner/src/drift_detector.rs:17-54, 122-296 — missing values in
declared NOT NULL columns, undeclared columns appearing in payloads,
type mismatches)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def detect_drift(df: DataFrame, payload_col: str, declared: T.StructType) -> DataFrame:
    """Compare a typed payload struct column against a declared schema.

    Returns a report DataFrame (column, issue, detail):
    - ``undeclared_column``: present in data, absent from declaration
    - ``missing_column``:    declared, absent from data
    - ``type_mismatch``:     declared type != observed type
    - ``unexpected_nulls``:  declared non-nullable but nulls observed
    """
    observed = {f.name: f for f in df.schema[payload_col].dataType.fields}
    declared_fields = {f.name: f for f in declared.fields}
    rows: list[tuple[str, str, str]] = []

    for name in sorted(set(observed) - set(declared_fields)):
        rows.append((name, "undeclared_column", observed[name].dataType.simpleString()))
    for name in sorted(set(declared_fields) - set(observed)):
        rows.append((name, "missing_column", declared_fields[name].dataType.simpleString()))
    for name in sorted(set(declared_fields) & set(observed)):
        d, o = declared_fields[name], observed[name]
        if d.dataType.simpleString() != o.dataType.simpleString():
            rows.append(
                (name, "type_mismatch", f"declared={d.dataType.simpleString()} observed={o.dataType.simpleString()}")
            )

    # data-level check: nulls in declared non-nullable columns (one pass)
    notnull = [n for n, f in declared_fields.items() if not f.nullable and n in observed]
    if notnull:
        counts = df.agg(
            *[F.sum(F.col(f"{payload_col}.{n}").isNull().cast("long")).alias(n) for n in notnull]
        ).collect()[0]
        for n in notnull:
            if (counts[n] or 0) > 0:
                rows.append((n, "unexpected_nulls", f"n={counts[n]}"))

    spark = df.sparkSession
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("issue", T.StringType()),
            T.StructField("detail", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
