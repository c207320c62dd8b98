"""Dynamic routing templates: ``${source.table}``, ``${after.field}``,
``${op}``, ``${tenant_id}`` … compiled once into column expressions.

Re-expresses the reference's routing template engine
(reference: crates/common/src/routing.rs:94-335; docs/src/routing.md:16-84):
- templates are compiled at plan time (the reference precompiles to a
  segment list; we emit one ``concat`` Catalyst expression — constant
  folding collapses static templates to literals for free).
- **strict** resolution (topics): missing/null field is an error → we
  return null and let the caller route the row to the DLQ.
- **lenient** resolution (keys): missing field → empty string.
- numbers/bools are stringified like the reference (routing.rs:321-338).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import ROUTING_SCHEMA

_VAR = re.compile(r"\$\{([^}]+)\}")


def compile_template(template: str, *, strict: bool = False) -> Column:
    """Compile ``"orders-${source.table}-${op}"`` to a Column.

    strict: any null segment nulls the whole result (caller DLQs).
    lenient: null segments become empty strings.
    """
    parts: list[Column] = []
    pos = 0
    for m in _VAR.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        ref = F.col(m.group(1)).cast("string")
        parts.append(ref if strict else F.coalesce(ref, F.lit("")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)  # concat is null-propagating => strict semantics


def with_routing(
    df: DataFrame,
    *,
    topic_template: str | None = None,
    key_template: str | None = None,
    headers: dict[str, str] | None = None,
    raw_payload: bool = False,
) -> DataFrame:
    """Attach/overwrite the ``routing`` struct column (reference
    EventRouting, deltaforge-core/src/routing.rs:31-57). Topic resolves
    strictly, key leniently, matching resolve_topic/resolve_key."""
    topic = compile_template(topic_template, strict=True) if topic_template else F.lit(None)
    key = compile_template(key_template, strict=False) if key_template else F.lit(None)
    if headers:
        kv: list[Column] = []
        for k, v in headers.items():
            kv.extend([F.lit(k), compile_template(v, strict=False)])
        hdrs = F.create_map(*kv)
    else:
        hdrs = F.lit(None).cast("map<string,string>")
    routing = F.struct(
        topic.cast("string").alias("topic"),
        key.cast("string").alias("key"),
        hdrs.alias("headers"),
        F.lit(raw_payload).alias("raw_payload"),
    ).cast(ROUTING_SCHEMA)
    return df.withColumn("routing", routing)
