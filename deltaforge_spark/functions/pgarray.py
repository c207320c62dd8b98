"""PostgreSQL array-literal parsing: ``{a,"b,c",NULL}`` → array<string>.

Re-expresses the reference's pgoutput array decoder (reference:
crates/sources/src/postgres/postgres_object.rs:139, 179-263 — quote and
backslash-escape handling, NULL elements, empty arrays).

Implementation is a pure column expression (JVM regex, no Python):
split on commas outside double quotes via a lookahead regex (Java regex
supports lookahead), then per-element unquote/unescape with
``transform``. Nested arrays are out of scope (the reference flattens
one level too — multidimensional literals stay strings).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# split on commas not inside double quotes; escaped quotes (\") must not
# count toward the quote balance, hence the (?:[^"\\]|\\.)* atoms
_SPLIT_RE = r',(?=(?:(?:[^"\\]|\\.)*"(?:[^"\\]|\\.)*")*(?:[^"\\]|\\.)*$)'


def parse_pg_array(c: Column) -> Column:
    """'{...}' literal → array<string> with NULL elements preserved.

    Rules matched to postgres_object.rs:
    - '{}' → empty array; SQL NULL → null array
    - unquoted NULL (case-insensitive) → null element
    - quoted elements: strip quotes, unescape \\" and \\\\
    - unquoted elements: taken verbatim
    """
    inner = F.regexp_replace(F.trim(c), r"^\{|\}$", "")
    raw = F.split(inner, _SPLIT_RE)

    def clean(el: Column) -> Column:
        t = F.trim(el)
        quoted = t.startswith('"') & t.endswith('"')
        body = t.substr(F.lit(2), F.length(t) - 2)
        # single-pass unescape: any backslash-escaped char → the char
        unq = F.regexp_replace(body, r"\\(.)", "$1")
        return (
            F.when(t.rlike(r"(?i)^NULL$"), F.lit(None).cast("string"))
            .when(quoted, unq)
            .otherwise(t)
        )

    arr = F.transform(raw, clean)
    return (
        F.when(c.isNull(), F.lit(None).cast("array<string>"))
        .when(F.trim(c) == "{}", F.array().cast("array<string>"))
        .otherwise(arr)
    )
