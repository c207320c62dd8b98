#!/usr/bin/env bash
# Full local gate, in escalating cost order. A declared query whose
# oracle fails at any tier blocks the commit — "declared but never
# value-verified" cannot recur (the fast tier catches SQL-side
# regressions in seconds; the --all tier value-checks every query).
#
#   tools/ci.sh fast   # seconds : oracle SQL parses + unit guards
#   tools/ci.sh all    # minutes : pytest + full DuckDB value-check
#   tools/ci.sh sf1    # ~2 h    : 10x scale soak — regenerate sf1,
#                      # time the risky kernels, value-check the FULL
#                      # set at sf1 (the r7 scale-evidence tier)
set -euo pipefail
cd "$(dirname "$0")/.."

tier="${1:-fast}"

python tools/guard_names.py
python -m pytest tests/test_oracle_sql_valid.py -q
# plan-shape sweep in EVERY tier (VERDICT r11 #2: r11 shipped a query
# that failed the repo's own scale-killer gate because the builder only
# ran targeted tests — the cross-cutting plan sweeps must run before
# any snapshot). The end-of-round snapshot commit message must record
# this script's exit code for the tier it ran. Skipped when tier=all:
# the full pytest run below already includes the same file (ADVICE r12
# — the explicit invocation ran the sweep twice in that tier).
if [ "$tier" != "all" ]; then
    python -m pytest tests/test_plan_shape.py -q
fi

if [ "$tier" = "all" ]; then
    python -m pytest tests/ -x -q
    # full-set value check at sf0.1 — the SF the driver and judge verify
    # at, where plan differences (AQE thresholds, broadcast decisions)
    # actually bite; sf0.001 missed them (VERDICT r5 #10). Budget:
    # ~8-10 min on local[32] (pytest dominates the tier at ~17 min).
    python tools/check.py --all /root/testdata/sf0.1
fi

if [ "$tier" = "sf1" ]; then
    # the 10x scale-evidence tier (VERDICT r6 #1): deterministic sf1
    # from sf0.1, kernel soak ratios into SF1_SOAK.json, then the full
    # oracle gate at sf1. Heavy DuckDB oracles (fuzzy contamination,
    # n-gram Jaccard) dominate the wall clock, not Spark.
    sf1_dir="/dev/shm/deltaforge-testdata/sf1"
    [ -d "$sf1_dir" ] || python tools/gen_sf.py /root/testdata/sf0.1 "$sf1_dir" 10
    python tools/soak_sf1.py "$sf1_dir"
    python tools/aqe_diff.py "$sf1_dir"
    python tools/check.py --all "$sf1_dir"
fi
