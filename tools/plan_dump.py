"""Dump .explain("formatted") for named declared queries to
plans/<tag>/<query>_<suffix>.txt (judge-auditable plan evidence for the
optimization rounds).

Usage: python tools/plan_dump.py <tag> <suffix> <query> [query ...]
e.g.   python tools/plan_dump.py r13 before doc_perplexity_kn5
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deltaforge_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")

    import __spark_entry__ as entry

    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        if df is None:
            txt = "(action-style kernel: no DataFrame plan)\n"
        else:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
