"""URL canonicalization — the dedup key of every crawl pipeline.

A crawl sees the same page under many spellings (case-folded hosts,
default ports, duplicate slashes, ``/./`` segments, ``index.html``
suffixes, shuffled query parameters, fragments). Canonicalizing before
the URL<->id dictionary (linkgraph.graph) collapses those aliases so
edges land on one vertex per page — at 10^12 documents an uncollapsed
alias set inflates the vertex table and splits PageRank mass. The
reference's extractor-side normalization (linkgraph/extract.py:60,
mapping ccm's instruction-offset canonicalization) covers scheme/host
case and fragments only; this operator is the full scan-side pass.

Rules (applied to absolute ``scheme://host...`` URLs; pure JVM
expressions, whole-stage codegen — no Python in the hot path; every
regex avoids lookarounds so the exact same patterns run on RE2 engines,
which is how the DuckDB oracle mirrors this):

1. drop the fragment (``#...``);
2. lowercase scheme and host;
3. strip the scheme's default port (``http:80``, ``https:443``);
4. in the path: collapse ``//`` runs, remove ``/./`` segments, rewrite a
   trailing ``/index.html`` or ``/index.htm`` to ``/``, empty path -> ``/``
   (``/../`` is NOT resolved: a crawler treats it as server-defined);
5. sort query parameters byte-wise (``?b=2&a=1`` == ``?a=1&b=2``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def canonicalize(url: Column) -> Column:
    """Column expression: canonical form of an absolute URL string."""
    u = F.regexp_replace(url, "#.*$", "")  # 1. fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    # everything after 'scheme://' (position-based, not substring_index:
    # '://' may legitimately reappear inside the query string)
    rest = u.substr(F.length(scheme) + 4, F.lit(2**30))
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pq = rest.substr(F.length(hostport) + 1, F.lit(2**30))
    host = F.lower(hostport)
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")) \
        .when(scheme == "https", F.regexp_replace(host, ":443$", "")) \
        .otherwise(host)
    path = F.regexp_extract(pq, r"^([^?]*)", 1)
    query = pq.substr(F.length(path) + 2, F.lit(2**30))
    path = F.regexp_replace(path, "/+", "/")
    path = F.regexp_replace(path, r"(/\.)+/", "/")
    path = F.regexp_replace(path, r"(/\.)+$", "/")
    path = F.regexp_replace(path, "/index\\.html?$", "/")
    path = F.when(path == "", "/").otherwise(path)
    query = F.when(
        query == "", F.lit("")
    ).otherwise(
        # sort_array, not array_sort: array_sort is a higher-order function
        # (CodegenFallback) and would knock the whole projection out of
        # whole-stage codegen; sort_array is codegen-capable
        F.concat(F.lit("?"), F.array_join(F.sort_array(F.split(query, "&")), "&"))
    )
    return F.concat(scheme, F.lit("://"), host, path, query)


def canonicalize_urls(df: DataFrame, col: str = "url",
                      out: str = "canon_url") -> DataFrame:
    """Append the canonical form of ``col`` as ``out``."""
    return df.withColumn(out, canonicalize(F.col(col)))


def alias_groups(df: DataFrame, col: str = "url") -> DataFrame:
    """(canon_url, n_aliases, aliases): URL spellings that collapse to the
    same canonical page — the crawl's alias report. One shuffle on the
    canonical key; alias lists are per-page (bounded), never collected."""
    return (
        canonicalize_urls(df, col)
        .groupBy("canon_url")
        .agg(
            F.countDistinct(col).alias("n_aliases"),
            F.sort_array(F.collect_set(col)).alias("aliases"),
        )
    )
