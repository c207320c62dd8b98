#!/usr/bin/env python
"""Guard: every query name the driver ever verified (any CORRECTNESS_r*.json
row) must still be declared in `queries()`, or explicitly listed in RENAMES.

Why: a silent rename orphans the historical green row — cross-round
accounting then under-counts driver coverage (the stale `dedup_embedding`
row from r2 did exactly this; VERDICT r4 "Next round" #6). Renames are
fine, they just have to be recorded here so the audit trail stays whole.
"""

from __future__ import annotations

import glob
import json
import os
import sys

# old driver-verified name -> current declared name (or None if the
# query was deliberately retired, with the reason)
RENAMES: dict[str, str | None] = {
    # r2: split into dedup_embedding_lsh (bucketed) + dedup_semantic
    # (cluster-scoped SemDeDup); the monolithic all-pairs variant was
    # retired as a scale anti-pattern
    "dedup_embedding": "dedup_embedding_lsh",
}


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __spark_entry__ as entrymod

    declared = set(entrymod.QUERIES)
    failures = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        hist = json.load(open(path))
        for name in hist:
            if name in declared:
                continue
            if name in RENAMES:
                target = RENAMES[name]
                if target is not None and target not in declared:
                    failures.append(
                        f"{os.path.basename(path)}: {name} renamed to {target!r}, "
                        "which is not declared either"
                    )
                continue
            failures.append(
                f"{os.path.basename(path)}: historical driver row {name!r} is no "
                "longer declared and not in RENAMES (tools/guard_names.py)"
            )
    if failures:
        print("NAME GUARD FAILED:")
        for f in failures:
            print(" ", f)
        return 1
    print(f"name guard ok: {len(declared)} declared queries cover all historical rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
