"""URL canonicalization for web-corpus deduplication.

Web-scale training corpora (C4, RefinedWeb, CommonCrawl derivatives)
dedup first by canonical URL before any content hashing — it removes
the bulk of refetch duplicates for the cost of a string pass. This
module canonicalizes entirely in JVM column algebra (regex + array
ops, no Python, no shuffle) with rules shared by the major pipelines:

- scheme and host lowercased; a leading ``www.`` stripped,
- default ports stripped (``:80`` for http, ``:443`` for https),
- the fragment dropped,
- tracking parameters removed (``utm_*``, ``gclid``, ``fbclid``),
- surviving query parameters sorted for order-insensitivity.

Path case is preserved (paths are case-sensitive); trailing slashes
are preserved (``/a`` and ``/a/`` may be different resources).

Every regex is in the Java∩RE2 common subset (same discipline as
operators/pii.py) so the DuckDB oracle runs the identical patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

TRACKING_RE = "^(utm_[^=]*|gclid|fbclid)="
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATHQ_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` as a single JVM-side expression."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .otherwise(host)
    )
    pathq = F.regexp_extract(url, _PATHQ_RE, 1)
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


def url_host(url: Column) -> Column:
    """Registrable host key (lowercased, www-stripped, port kept off)."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    return F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), ":[0-9]+$", ""
    )


def url_dedup_rank(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """Canonicalize and rank duplicates: ``dup_rank`` = 1 for the
    earliest (by id) fetch of each canonical URL — keep rank 1, drop
    the rest. One hash shuffle on the canonical URL; the per-URL window
    frame is the duplicate group (small by construction)."""
    canon = df.select(
        F.col(id_col).alias("doc_id"),
        canonical_url(F.col(url_col)).alias("canonical_url"),
        url_host(F.col(url_col)).alias("host"),
    )
    w = Window.partitionBy("canonical_url").orderBy("doc_id")
    return canon.select(
        "doc_id",
        "canonical_url",
        "host",
        F.row_number().over(w).cast("int").alias("dup_rank"),
    )


def url_canonical_oracle_sql(table_expr: str, url_sql: str, id_sql: str) -> str:
    """DuckDB twin — identical regexes, identical param filter/sort."""
    return f"""
        WITH src AS (
            SELECT {id_sql} AS doc_id, {url_sql} AS url FROM {table_expr}
        ),
        parts AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url, '{_SCHEME_RE}', 1)) AS scheme,
                   lower(regexp_extract(url, '{_HOSTPORT_RE}', 1)) AS hostport,
                   regexp_extract(url, '{_PATHQ_RE}', 1) AS pathq
            FROM src
        ),
        hosts AS (
            SELECT doc_id, scheme, pathq,
                   CASE WHEN scheme = 'https'
                        THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':443$', '')
                        WHEN scheme = 'http'
                        THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':80$', '')
                        ELSE regexp_replace(hostport, '^www\\.', '')
                   END AS chost,
                   regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':[0-9]+$', '') AS host_key
            FROM parts
        ),
        canon AS (
            SELECT doc_id, host_key AS host,
                   scheme || '://' || chost
                   || regexp_extract(pathq, '^([^?]*)', 1)
                   || CASE WHEN qstr != '' THEN '?' || qstr ELSE '' END AS canonical_url
            FROM (
                SELECT *,
                       array_to_string(
                           list_sort(list_filter(
                               string_split(regexp_extract(pathq, '\\?(.*)$', 1), '&'),
                               x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_RE}'))),
                           '&') AS qstr
                FROM hosts
            )
        )
        SELECT doc_id, canonical_url, host,
               CAST(row_number() OVER (PARTITION BY canonical_url ORDER BY doc_id)
                    AS INT) AS dup_rank
        FROM canon
    """
