"""Distinct-count sketching (HyperLogLog) as deterministic column algebra.

The reference estimates per-field cardinality with a HyperLogLog sketch
while classifying map-vs-struct shapes (schema-sensing
high_cardinality.rs:1-50 uses an HLL alongside SpaceSaving); this module
re-expresses the sketch itself as a first-class distributed aggregate:

- hash     = md5 of the value's string form (engine-portable, stable),
- bucket   = first 8 hash bits mod m (m = 2**p registers),
- rho      = leading-zero count + 1 over the next 48 hash bits,
- register = MAX(rho) per (group, bucket) — a partial-aggregatable max,
- estimate = alpha_m * m^2 / sum(2^-M_j) with the standard small-range
  linear-counting correction (Flajolet et al. 2007).

Scale shape: one groupBy on (group, bucket) with map-side combine — the
register table is at most m rows per group regardless of input size —
then one m-row-per-group final agg. No distinct, no sort, no Python.

Determinism: every step is integer math except the final estimate.
The harmonic sum is computed EXACTLY as the integer
``sum(2^(50 - M_j))`` (rho <= 49, so each term >= 2; 2^56 worst case
fits a long), so Spark and an independent SQL engine agree bit-for-bit
until the single final division — which both round to a whole count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Register width: rho is counted over a 48-bit window (12 hex chars) so
# the per-value work stays in exact BIGINT range in any SQL engine.
RHO_BITS = 48
# Exact harmonic-sum scaling: sum(2^(SHIFT - M_j)) is integer for all
# M_j in [1, RHO_BITS + 1].
SHIFT = 50


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 6
) -> DataFrame:
    """(group, bucket, m_j) register table — the mergeable sketch state."""
    if not 2 <= p <= 8:
        raise ValueError("p must be in [2, 8] (bucket comes from 8 hash bits)")
    m = 1 << p
    hx = F.md5(F.col(value_col).cast("string"))
    bucket = (F.conv(F.substring(hx, 1, 2), 16, 10).cast("long") % m).alias("bucket")
    v = F.conv(F.substring(hx, 3, 12), 16, 10).cast("long")
    rho = (
        F.when(v == F.lit(0), F.lit(RHO_BITS + 1))
        .otherwise(F.lit(RHO_BITS + 1) - F.length(F.bin(v)))
        .alias("rho")
    )
    return (
        df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables down to coarser groups: MAX per (group,
    bucket) — the HLL union. Because max is associative/commutative,
    merging hourly sketches into a day IS the day's sketch, bit for
    bit; this is the property that lets 100-TB rollups keep m-row
    state per window instead of user sets."""
    return regs.groupBy(*group_cols, "bucket").agg(F.max("m_j").alias("m_j"))


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 6
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate of ``value_col``.

    Output: group cols + ``used_buckets`` / ``zero_buckets`` /
    ``harmonic_sum_scaled`` (exact integers — the sketch state digest)
    + ``est_distinct`` (the rounded estimate).
    """
    regs = hll_registers(df, group_cols, value_col, p)
    return hll_estimate_from_registers(regs, group_cols, p=p)


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], *, p: int = 6
) -> DataFrame:
    """Finish a (merged) register table into per-group estimates —
    the second half of hll_distinct, separated so rollups can merge
    register state first (hll_merge) and estimate once."""
    m = 1 << p
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("used_buckets"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {SHIFT} - m_j)"))
        .cast("long")
        .alias("sum_used"),
    )
    zeros = (F.lit(m) - F.col("used_buckets")).cast("long")
    s_total = (
        F.col("sum_used") + zeros * F.lit(1 << SHIFT).cast("long")
    ).alias("harmonic_sum_scaled")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = alpha * F.lit(float(m * m)) * F.lit(float(1 << SHIFT)) / s_total.cast("double")
    est: Column = (
        F.when(
            (zeros > 0) & (raw <= F.lit(2.5 * m)),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
        )
        .otherwise(raw)
    )
    return per_group.select(
        *group_cols,
        F.col("used_buckets"),
        zeros.alias("zero_buckets"),
        s_total,
        F.round(est, 0).cast("long").alias("est_distinct"),
    )


def hll_oracle_sql(
    table_expr: str, group_cols: list[str], value_expr: str, p: int = 6
) -> str:
    """The identical algorithm as ANSI SQL (DuckDB dialect) — same hash,
    same integer register math, same single final division."""
    m = 1 << p
    g = ", ".join(group_cols)
    return f"""
        WITH h AS (
            SELECT {g}, md5(CAST({value_expr} AS VARCHAR)) AS hx
            FROM {table_expr}
        ),
        b AS (
            SELECT {g},
                   CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % {m} AS bucket,
                   CAST(('0x' || substr(hx, 3, 12)) AS BIGINT) AS v
            FROM h
        ),
        r AS (
            SELECT {g}, bucket,
                   MAX(CASE WHEN v = 0 THEN {RHO_BITS + 1}
                            ELSE {RHO_BITS + 1} - length(bin(v)) END) AS m_j
            FROM b GROUP BY {g}, bucket
        ),
        pg AS (
            SELECT {g},
                   CAST(count(*) AS BIGINT) AS used_buckets,
                   CAST(sum(CAST(1 AS BIGINT) << ({SHIFT} - m_j)) AS BIGINT) AS sum_used
            FROM r GROUP BY {g}
        ),
        s AS (
            SELECT {g}, used_buckets,
                   CAST({m} - used_buckets AS BIGINT) AS zero_buckets,
                   sum_used + ({m} - used_buckets) * (CAST(1 AS BIGINT) << {SHIFT})
                       AS harmonic_sum_scaled
            FROM pg
        )
        SELECT {g}, used_buckets, zero_buckets, harmonic_sum_scaled,
               CAST(round(
                   CASE WHEN zero_buckets > 0
                             AND (0.7213e0 / (1.0e0 + 1.079e0 / {float(m)}e0))
                                 * {float(m * m)}e0 * {float(1 << SHIFT)!r}
                                 / CAST(harmonic_sum_scaled AS DOUBLE) <= {2.5 * m}e0
                        THEN {float(m)}e0 * ln({float(m)}e0 / CAST(zero_buckets AS DOUBLE))
                        ELSE (0.7213e0 / (1.0e0 + 1.079e0 / {float(m)}e0))
                             * {float(m * m)}e0 * {float(1 << SHIFT)!r}
                             / CAST(harmonic_sum_scaled AS DOUBLE)
                   END, 0) AS BIGINT) AS est_distinct
        FROM s
    """


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """K-Minimum-Values sketch: per group, the k smallest distinct
    48-bit hashes of ``value_col`` as a sorted array column ``kmv``.

    Unlike HLL, KMV composes under set operations — the k smallest of a
    union are computable from two sketches alone — so it answers
    distinct-count AND overlap/Jaccard questions between groups.

    Scale shape: one (group, hash) dedup groupBy (map-side combined),
    one per-group window that keeps k rows, then a bounded
    ``collect_list`` (never more than k elements by construction).
    The dedup exchange is proportional to distinct values; at extreme
    scale pre-filter ``h < k * 2^48 / n_lower_bound`` to shed hashes
    that cannot reach the bottom-k (documented, not applied — it needs
    a cardinality floor the caller must supply).

    Determinism: everything is exact integer selection; the only
    floating math lives in the estimate/Jaccard helpers.
    """
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    from pyspark.sql import Window

    distinct_h = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    topk = distinct_h.select(
        *group_cols, "h", F.row_number().over(w).alias("_r")
    ).where(F.col("_r") <= k)
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("h")).alias("kmv"),
        F.count("*").cast("long").alias("kmv_size"),
    )


def kmv_estimate(kmv_col: Column, k: int = 64) -> Column:
    """Distinct-count estimate from a KMV array: exact when fewer than
    k distinct hashes were seen, else ``(k-1) * 2^48 / h_k``."""
    return (
        F.when(F.size(kmv_col) < k, F.size(kmv_col).cast("long"))
        .otherwise(
            F.round(
                F.lit(float(k - 1))
                * F.lit(float(1 << 48))
                / F.element_at(kmv_col, k).cast("double"),
                0,
            ).cast("long")
        )
    )


def kmv_jaccard(a: Column, b: Column, k: int = 64) -> Column:
    """Estimated Jaccard similarity of the two sketched sets: the
    fraction of the union's bottom-k that lies in both sketches.
    Integer set algebra; one final division."""
    union_k = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    matches = F.size(F.array_intersect(union_k, F.array_intersect(a, b)))
    return F.round(
        matches.cast("double") / F.size(union_k).cast("double"), 6
    )


def kmv_oracle_sql(
    table_expr: str, group_cols: list[str], value_expr: str, k: int = 64
) -> str:
    """DuckDB twin of kmv_sketch: identical hash, identical bottom-k."""
    g = ", ".join(group_cols)
    return f"""
        SELECT {g}, list(h ORDER BY h) AS kmv, CAST(count(*) AS BIGINT) AS kmv_size
        FROM (
            SELECT {g}, h,
                   row_number() OVER (PARTITION BY {g} ORDER BY h) AS _r
            FROM (
                SELECT DISTINCT {g},
                       CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 12)) AS BIGINT) AS h
                FROM {table_expr}
            )
        )
        WHERE _r <= {k}
        GROUP BY {g}
    """


# ------------------------------------------------------------ Bloom filter
#
# Mergeable membership sketch — the pre-filter a 100 TB dedup or
# decontamination pass runs before any join: a Bloom filter of the
# already-seen keys (or the benchmark set) turns "join everything"
# into "join the few candidates the filter claims". Represented as a
# (group, bit_position) relation rather than a packed bitmap: unions
# merge by DISTINCT, membership probes are an equi-join on the
# position key, and an independent SQL engine reproduces every bit —
# the same engine-portable-determinism stance as the HLL above (the
# reference's sketching lives in schema-sensing high_cardinality.rs;
# the membership variant is beyond-reference, like KMV).
#
# Guarantees (the Bloom contract, verified by tests + oracle):
# - NO false negatives: a key that was inserted is always claimed.
# - False positives at the theoretical (1 - e^{-kn/m})^k rate.

BLOOM_M = 4096  # bits per filter
BLOOM_K = 3  # hash functions


def _bloom_pos(value: Column, i: int, m: int) -> Column:
    """Bit position of hash function i: 48 md5 bits mod m — exactly
    reproducible as SQL (same '0x'-prefix conv idiom as the HLL)."""
    hx = F.md5(F.concat(F.lit(f"bf{i}:"), value.cast("string")))
    return F.conv(F.substring(hx, 1, 12), 16, 10).cast("long") % m


def bloom_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """(group..., pos) — the set bits of each group's filter. One
    explode (k rows per input) + one distinct: at most m rows per group
    survive regardless of input size; map-side combine absorbs heavy
    keys. Filters over different groups (or different days) merge by
    plain union + distinct — the mergeability a backfill needs."""
    positions = F.array(*[_bloom_pos(F.col(value_col), i, m) for i in range(k)])
    return (
        df.select(*group_cols, F.explode(positions).alias("pos"))
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    probe_col: str,
    *,
    filter_group_cols: list[str],
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership of each probe value against EVERY filter group:
    returns (filter groups..., <probe_col>, claimed) where claimed ⇔
    all k bit positions are set in that group's filter.

    Scale shape: probes explode to k rows, equi-join ``bits`` on the
    position key (hash-partitioned, no broadcast of the big side), then
    a count-equals-k groupBy keyed on (groups, probe). The only
    non-equi join is (filter-groups × probes) to re-introduce
    claimed=false rows — and that side is one row per FILTER (a
    broadcast dimension), never per filter bit or per input key."""
    ppos = probes.select(
        F.col(probe_col),
        F.posexplode(
            F.array(*[_bloom_pos(F.col(probe_col), i, m) for i in range(k)])
        ).alias("_i", "pos"),
    )
    groups = bits.select(*filter_group_cols).distinct()
    # every (probe, hashfn) pair must find its bit in the group: join on
    # pos hits only set bits; the groups frame (tiny: one row per
    # filter) re-introduces misses so count() counts per group
    hits = ppos.join(bits, "pos").select(*filter_group_cols, probe_col, "_i").distinct()
    per = (
        hits.groupBy(*filter_group_cols, probe_col)
        .agg(F.count(F.lit(1)).alias("_nhit"))
    )
    all_pairs = groups.crossJoin(probes.select(probe_col).distinct())
    return all_pairs.join(per, [*filter_group_cols, probe_col], "left").select(
        *filter_group_cols,
        probe_col,
        (F.coalesce(F.col("_nhit"), F.lit(0)) == k).alias("claimed"),
    )


# --- Count-Min sketch (Cormode & Muthukrishnan 2005) -----------------
#
# The reference's schema-sensing pairs its HLL with a SpaceSaving
# heavy-hitter pass (high_cardinality.rs); Count-Min is the mergeable
# counterpart for FREQUENCY estimation — the sketch every token-level
# corpus report rides at 100 TB, where the true token->count table is
# itself too wide to keep. d independent hash rows x w buckets of
# partial-aggregatable SUMs; point estimate = min over rows.
#
# Engine-portable determinism: row-i hash = 48 bits of md5(i || ':' ||
# value) mod w — same idiom as the HLL/KMV/Bloom tiers above, integer
# end-to-end, so a SQL oracle replays registers AND estimates exactly.

CM_DEPTH = 3
CM_WIDTH = 1024


def _cm_bucket(value: Column, i: int, w: int) -> Column:
    hx = F.md5(F.concat(F.lit(f"{i}:"), value.cast("string")))
    return F.conv(F.substring(hx, 1, 12), 16, 10).cast("long") % w


def countmin_registers(
    df: DataFrame, value_col: str, *, d: int = CM_DEPTH, w: int = CM_WIDTH
) -> DataFrame:
    """(row, bucket, cnt) register table — the mergeable sketch state.
    One groupBy with map-side combine; at most d*w rows out regardless
    of input size (d explode is a map-side constant factor)."""
    pos = F.posexplode(
        F.array(*[_cm_bucket(F.col(value_col), i, w) for i in range(d)])
    )
    return (
        df.select(pos.alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    probes: DataFrame,
    registers: DataFrame,
    probe_col: str,
    *,
    d: int = CM_DEPTH,
    w: int = CM_WIDTH,
) -> DataFrame:
    """Point-query each probe value: (probe_col, cm_est) with
    cm_est = min over rows of that row's bucket counter (0 if the
    bucket is empty — the value was never inserted).

    Scale shape: probes explode to d rows and equi-join the register
    table on (row, bucket) — probe side is small (a report's head),
    register side is bounded at d*w rows, so AQE broadcasts whichever
    is smaller; never a scan of the raw input."""
    ppos = probes.select(
        F.col(probe_col),
        F.posexplode(
            F.array(*[_cm_bucket(F.col(probe_col), i, w) for i in range(d)])
        ).alias("row", "bucket"),
    )
    return (
        ppos.join(registers, ["row", "bucket"], "left")
        .groupBy(probe_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cm_est"))
    )


def countmin_oracle_sql(
    table_expr: str, value_expr: str, *, d: int = CM_DEPTH, w: int = CM_WIDTH
) -> str:
    """Register table as ANSI SQL (DuckDB dialect): same md5 row
    hashes, same bucket math, same counts."""
    rows = " UNION ALL ".join(
        f"""SELECT {i} AS row,
                   CAST(('0x' || substr(md5('{i}:' || CAST({value_expr} AS VARCHAR)), 1, 12))
                        AS BIGINT) % {w} AS bucket
            FROM {table_expr}"""
        for i in range(d)
    )
    return f"SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt FROM ({rows}) GROUP BY row, bucket"
