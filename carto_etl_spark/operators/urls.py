"""URL canonicalization and canonical-URL dedup for crawl pipelines.

Not in the reference (its string surface is strip/lower/replace,
/root/reference/etl/etl.py:70-83); a north-star training-data operator — the
first dedup pass over web-crawl corpora is canonical-URL dedup, and the
canonicalizer is a fixed, order-insensitive rewrite: lowercase scheme/host,
strip a leading ``www.``, drop the default port for the scheme, strip
trailing slashes from the path, drop tracking query parameters
(``utm_*``/``ref``/click ids) and sort the survivors.

Everything is built-in string/array expressions (``regexp_extract``,
``filter``, ``array_sort``, ``array_join``) — whole-stage codegen end to
end, zero UDFs, zero shuffles until the caller aggregates.  Pattern dialect
is the Java-regex/RE2 common subset (no lookaround, no backreferences) so a
DuckDB oracle can replay the rewrite value-for-value with an independent
function set (``string_split``/``list_filter``/``list_sort``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


#: query parameters dropped during canonicalization (regex alternatives,
#: matched against the full ``key=value`` token anchored at the key).
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_[^=]*", "ref", "fbclid", "gclid", "msclkid", "mc_eid",
)

#: scheme -> default port, stripped when explicit.
DEFAULT_PORTS: dict[str, str] = {"http": "80", "https": "443", "ftp": "21"}

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_parts_exprs(url: Column | str) -> dict[str, Column]:
    """Raw structural parts (scheme/host/port/path/query) as columns.
    ``scheme`` and ``host`` are lowercased (case-insensitive per RFC 3986);
    path and query keep their case.  Missing parts are empty strings, the
    regexp_extract no-match convention — NULL url stays NULL.

    Authority handling: a userinfo prefix (``user@`` / ``user:pw@``) is
    stripped BEFORE the host/port split — it is not part of the resource
    identity, and without the strip ``user:pw@ex.org`` would yield host
    ``user`` and merge nothing.  Bracketed IPv6 literals parse as one host
    token (brackets kept, hex lowercased by the authority fold) with the
    port taken after the closing bracket; bracketless IPv6 is not legal in
    a URL authority and stays out of scope."""
    u = _col(url)
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    hostport = F.regexp_replace(auth, r"^[^@]*@", "")
    return {
        "scheme": F.lower(F.regexp_extract(u, _SCHEME_RE, 1)),
        "host": F.regexp_extract(hostport, r"^(\[[^\]]*\]|[^:]*)", 1),
        "port": F.regexp_extract(hostport, r":(\d+)$", 1),
        "path": F.regexp_extract(u, _PATH_RE, 1),
        "query": F.regexp_extract(u, _QUERY_RE, 1),
    }


def canonical_host_expr(url: Column | str) -> Column:
    """Lowercased host with one leading ``www.`` stripped."""
    return F.regexp_replace(
        url_parts_exprs(url)["host"], r"^www\.", ""
    )


def domain_expr(url: Column | str) -> Column:
    """Naive registered domain: the last two dot-labels of the canonical
    host (``shop3.example.com`` -> ``example.com``).  A real deployment
    swaps in the public-suffix list; the expression shape is identical."""
    return F.regexp_extract(canonical_host_expr(url), r"([^.]+\.[^.]+)$", 1)


def _kept_query_expr(query: Column, drop_params: tuple[str, ...]) -> Column:
    """Sorted ``&``-joined query params with tracking params removed."""
    pat = "^(?:" + "|".join(drop_params) + ")="
    kept = F.filter(
        F.split(query, "&"),
        lambda x: (~x.rlike(pat)) & (x != F.lit("")),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonical_url_expr(
    url: Column | str,
    drop_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """The canonical form: lowercase scheme + ``://`` + canonical host +
    (non-default port) + path with trailing slashes stripped + ``?`` +
    sorted surviving query params (omitted when none survive)."""
    parts = url_parts_exprs(url)
    scheme, port = parts["scheme"], parts["port"]
    host = F.regexp_replace(parts["host"], r"^www\.", "")
    default_port = F.lit(None).cast("string")
    for sch, dp in DEFAULT_PORTS.items():
        default_port = F.when(scheme == sch, F.lit(dp)).otherwise(default_port)
    portpart = F.when(
        (port == F.lit("")) | port.eqNullSafe(default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(parts["path"], r"/+$", "")
    canonq = _kept_query_expr(parts["query"], drop_params)
    return F.concat(
        scheme, F.lit("://"), host, portpart, path,
        F.when(canonq == F.lit(""), F.lit("")).otherwise(
            F.concat(F.lit("?"), canonq)
        ),
    )


def canonicalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``canonical_url`` / ``host`` / ``domain`` columns.  Pure
    projection — no exchange; at 100 TB this rides the scan."""
    u = F.col(url_col)
    return df.withColumns({
        "canonical_url": canonical_url_expr(u),
        "host": canonical_host_expr(u),
        "domain": domain_expr(u),
    })


def url_dedup(
    df: DataFrame, url_col: str = "url", key_col: str = "doc_id"
) -> DataFrame:
    """Canonical-URL dedup summary: one row per canonical URL with the
    surviving key (minimum — deterministic), the number of raw rows it
    absorbs, and how many DISTINCT raw spellings collapsed into it.

    One hash-aggregate shuffle keyed by canonical URL, partial-aggregated
    map-side; no sort, no join.  Skew-safe: a hot canonical URL partial-aggs
    to one row per map task before the exchange."""
    canon = canonical_url_expr(F.col(url_col)).alias("canonical_url")
    return (
        df.select(canon, F.col(key_col), F.col(url_col))
        .groupBy("canonical_url")
        .agg(
            F.min(key_col).alias("survivor"),
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct(url_col).alias("n_spellings"),
        )
    )
