"""Audit every declared query's physical plan for UNPARTITIONED Window
operators (the "No Partition Defined for Window" class — a
single-partition sort of the whole input at cluster scale).

A Window detail block in explain("formatted") renders
``Arguments: [funcs], [partitionSpec], [orderSpec]``; the unpartitioned
form drops the middle list. This scanner classifies each query by
whether any Window block has only two top-level lists, and prints the
offender set — the input to tests/test_plan_shape.py's allow-list gate.

Usage: python tools/audit_windows.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")


def split_toplevel_lists(s: str) -> list[str]:
    """Split an Arguments payload into its top-level [...] lists."""
    out, depth, cur, in_list = [], 0, [], False
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                in_list, cur = True, []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0 and in_list:
                out.append("".join(cur))
                in_list = False
                continue
        if in_list:
            cur.append(ch)
    return out


_SORT_ENTRY = re.compile(r"(ASC|DESC) NULLS")


def unpartitioned_windows(plan: str) -> list[str]:
    """Return the Arguments payloads of window operators with an EMPTY
    partition spec.

    ``Window`` renders ``Arguments: [funcs], [partitionSpec],
    [orderSpec]`` but drops empty trailing/middle lists, so two lists
    mean either funcs+order (UNPARTITIONED — the second list is sort
    entries) or funcs+partition (fine). ``WindowGroupLimit`` (the
    per-partition top-k rewrite) renders ``[partitionSpec],
    [orderSpec], func, k, mode`` — unpartitioned iff the first list is
    empty."""
    hits = []
    blocks = re.split(r"\n\(\d+\) ", plan)
    for b in blocks:
        m = re.search(r"Arguments: (.*)", b)
        if not m:
            continue
        args = m.group(1)
        lists = split_toplevel_lists(args)
        if b.startswith("WindowGroupLimit"):
            if lists and lists[0].strip() == "":
                hits.append("WindowGroupLimit " + args[:180])
        elif b.startswith("Window"):
            if len(lists) == 2 and _SORT_ENTRY.search(lists[1]):
                hits.append("Window " + args[:180])
    return hits


def main() -> None:
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    only = set(a for a in args if "/" not in a)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    offenders: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    qs = e.queries()
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            hits = unpartitioned_windows(buf.getvalue())
            if hits:
                offenders[name] = hits
        except Exception as ex:  # noqa: BLE001
            errors[name] = repr(ex)[:200]
    print("== unpartitioned-window queries ==")
    for name, hits in sorted(offenders.items()):
        print(f"{name}: {len(hits)} site(s)")
        for h in hits:
            print(f"    {h[:150]}")
    print(f"== total: {len(offenders)} of {len(qs)} queries ==")
    if errors:
        print("== errors ==")
        for name, ex in sorted(errors.items()):
            print(f"{name}: {ex}")


if __name__ == "__main__":
    main()
