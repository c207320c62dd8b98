"""Table/topic/stream pattern matching: allow-lists + include/exclude.

Re-expresses the reference's pattern utilities
(reference: crates/common/src/patterns.rs:39-163 ``AllowList`` —
``qualifier.name`` exact, bare ``name`` matches any qualifier,
``qualifier.*`` wildcard, ``prefix%``/``prefix*`` prefix matching,
empty list matches everything; :206-285 ``TableFilter`` —
include/exclude with exclude evaluated first and taking priority,
empty include = include all).

Two execution surfaces share ONE semantics:

- driver-side (`AllowList.matches`, `TableFilter.matches`): config
  validation, snapshot table selection, schema sensing scope — exact
  parity with the reference's matcher, including the subtle cases its
  tests pin (an exact pattern must NOT prefix-match; ``is_empty``
  requires both sides empty).
- DataFrame-side (`table_filter_column`): the same filter compiled to
  a Spark ``Column`` over ``source.db``/``source.table`` so per-event
  gating runs JVM-side inside codegen, never per-row Python. The
  compiled predicate is pure column algebra → Catalyst pushes it into
  the scan when the envelope is read from parquet.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _single_match(pattern: str, value: str) -> bool:
    """One path segment (patterns.rs:149-163)."""
    if pattern in ("*", "%"):
        return True
    if pattern.endswith("%") or pattern.endswith("*"):
        return value.startswith(pattern[:-1])
    return pattern == value


class AllowList:
    """Flexible allow-list (patterns.rs:39-163). Empty = match all."""

    def __init__(self, patterns: list[str] | None = None) -> None:
        self.items: list[tuple[str | None, str]] = []
        for s in patterns or []:
            if "." in s:
                qualifier, name = s.split(".", 1)
                self.items.append((qualifier, name))
            else:
                self.items.append((None, s))  # any qualifier

    @classmethod
    def allow_all(cls) -> "AllowList":
        return cls([])

    def matches(self, qualifier: str, name: str) -> bool:
        if not self.items:
            return True
        for q_opt, pattern in self.items:
            q_ok = q_opt is None or _single_match(q_opt, qualifier)
            if q_ok and _single_match(pattern, name):
                return True
        return False

    def matches_name(self, name: str) -> bool:
        """Unqualified contexts (sensing, topic names)."""
        if not self.items:
            return True
        return any(_single_match(p, name) for _, p in self.items)

    def is_empty(self) -> bool:
        return not self.items

    def __len__(self) -> int:
        return len(self.items)

    def __str__(self) -> str:
        if not self.items:
            return "[*]"
        shown = [f"{q}.{n}" if q is not None else n for q, n in self.items]
        return "[" + ", ".join(shown) + "]"


@dataclass
class TableFilter:
    """Include/exclude filter (patterns.rs:206-285).

    ``exclude`` is evaluated first and takes priority; an empty
    ``include`` means include-all.
    """

    include: list[str] = field(default_factory=list)
    exclude: list[str] = field(default_factory=list)

    def matches(self, qualifier: str, name: str) -> bool:
        inc, exc = AllowList(self.include), AllowList(self.exclude)
        if not exc.is_empty() and exc.matches(qualifier, name):
            return False
        return inc.is_empty() or inc.matches(qualifier, name)

    def matches_name(self, name: str) -> bool:
        inc, exc = AllowList(self.include), AllowList(self.exclude)
        if not exc.is_empty() and exc.matches_name(name):
            return False
        return inc.is_empty() or inc.matches_name(name)

    def is_empty(self) -> bool:
        return not self.include and not self.exclude


def _like_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def _pattern_column(pattern: str, col):
    """One segment pattern → Column predicate with AllowList semantics."""
    from pyspark.sql import functions as F

    if pattern in ("*", "%"):
        return F.lit(True)
    if pattern.endswith("%") or pattern.endswith("*"):
        return col.like(_like_escape(pattern[:-1]) + "%")
    return col == pattern


def table_filter_column(tf: TableFilter):
    """Compile a TableFilter to a Spark Column over the envelope's
    ``source.db`` / ``source.table`` — identical decisions to the
    driver-side matcher, executed JVM-side per event."""
    from pyspark.sql import functions as F

    db, table = F.col("source.db"), F.col("source.table")

    def allow_col(patterns: list[str]):
        pred = None
        for s in patterns:
            if "." in s:
                q, n = s.split(".", 1)
                c = _pattern_column(q, db) & _pattern_column(n, table)
            else:
                c = _pattern_column(s, table)  # any qualifier
            pred = c if pred is None else (pred | c)
        return pred

    out = F.lit(True)
    exc = allow_col(tf.exclude)
    if exc is not None:
        out = out & ~exc
    inc = allow_col(tf.include)
    if inc is not None:
        out = out & inc
    return out
