"""URL canonicalization — the crawl-dedup normalizer.

Web-scale corpora (Common Crawl and friends) dedup FIRST by canonical
URL: the same resource is fetched as ``HTTP://EX.COM:80/p/1?b=2&a=1#x``
and ``http://ex.com/p/1?a=1&b=2`` and naive string-equality misses the
match.  The normalizer applies the standard safe transforms (RFC 3986
§6 syntax-based normalization plus the usual tracking-param strip):

1. drop the fragment (``#…`` — never sent to the server);
2. lowercase scheme and host (case-insensitive by spec);
3. drop a default port (``:80`` for http, ``:443`` for https);
4. drop ``utm_*`` tracking parameters, SORT the survivors (param
   order is almost-always insignificant; sorting makes equal param
   SETS compare equal);
5. strip one trailing slash from a non-root path; empty path → ``/``.

Everything is a JVM-side column expression (regexp + array HOFs — no
UDF, stays in whole-stage codegen), with a ``sql_canonical_url`` twin
producing the equivalent DuckDB SQL for the differential oracle.
Intentionally NOT done (they change semantics on real servers):
percent-encoding normalization, ``index.html`` stripping, query-less
``?`` removal asymmetries — the operator is a dedup KEY builder, and a
conservative key only ever under-merges.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url(url: Column) -> Column:
    u = F.regexp_replace(url, "#.*$", "")  # 1. fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, "^([^/?]*)", 1)
    pathq = rest.substr(F.length(hostport) + 1, F.lit(1 << 30))
    host = F.lower(hostport)  # 2. case
    host = F.when(  # 3. default port
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, ":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, ":443$", ""),
    ).otherwise(host)
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.when(
        pathq.contains("?"), F.regexp_replace(pathq, "^[^?]*\\?", "")
    ).otherwise(F.lit(""))
    kept = F.array_sort(  # 4. tracking params out, survivors sorted
        F.filter(
            F.split(query, "&"),
            lambda p: ~((F.substring(p, 1, 4) == "utm_") | (p == "")),
        )
    )
    # coalesce: DuckDB's array_to_string maps the EMPTY list to NULL
    # where Spark yields '' — same trap as the fingerprint oracles
    qs = F.coalesce(F.array_join(kept, "&"), F.lit(""))
    path = F.when(  # 5. trailing slash; empty path -> '/'
        (F.length(path) > 1) & path.endswith("/"),
        F.regexp_replace(path, "/$", ""),
    ).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def sql_canonical_url(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` — identical five steps,
    identical regexes, identical empty/NULL forks."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_replace({u}, '{_SCHEME_RE}', '')"
    hostport = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    pathq = f"substr({rest}, length({hostport}) + 1)"
    host = f"lower({hostport})"
    host = (
        f"CASE WHEN {scheme} = 'http' AND {host} LIKE '%:80' "
        f"THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' AND {host} LIKE '%:443' "
        f"THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    query = (
        f"CASE WHEN contains({pathq}, '?') "
        f"THEN regexp_replace({pathq}, '^[^?]*\\?', '') ELSE '' END"
    )
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> NOT (substr(p, 1, 4) = 'utm_' OR p = '')))"
    )
    qs = f"coalesce(array_to_string({kept}, '&'), '')"
    path = (
        f"CASE WHEN length({path}) > 1 AND {path} LIKE '%/' "
        f"THEN regexp_replace({path}, '/$', '') ELSE {path} END"
    )
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"(CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END)"
    )
