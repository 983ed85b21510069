"""URL/domain scalar expressions for web-corpus curation (round-10 verdict
item 7): canonicalization (strip tracking params / fragments / default
ports, sort the query string), host + registered-domain extraction, and a
tracking-param predicate — all pure JVM column expressions (regex +
array ops inside whole-stage codegen; no Python in the hot path), because
at 100 TB the URL column is touched once per document per ingest.

Spec (the DuckDB oracle twins in ``catalog/oracles.py`` implement the
identical steps — any change here must change there):

1. drop the fragment (everything from the first ``#``);
2. lowercase the scheme and host; strip a leading ``www.``;
3. drop the port when it is the scheme default (80/http, 443/https) or
   empty; keep any other explicit port;
4. strip trailing ``/`` from the path;
5. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``, ``ref``,
   ``mc_cid``, ``mc_eid``, ``igshid``), sort the survivors
   lexicographically, and drop the ``?`` when none survive.

Registered-domain extraction is the naive eTLD+1 (last two host labels)
plus an explicit multi-part public-suffix subset (``co.uk``-style) — a
full public-suffix list is a data file, not an algorithm change; the
lookup is a literal IN over the suffix of the label array either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking-parameter predicate, shared with the oracle SQL via TRACKING_RE
TRACKING_RE = "^(utm_[a-z0-9]+|gclid|fbclid|ref|mc_cid|mc_eid|igshid)="

# deliberately small, explicit multi-part public-suffix subset (see module
# docstring); ordered for readable diffs
MULTIPART_SUFFIXES = (
    "ac.uk", "co.in", "co.jp", "co.kr", "co.uk", "co.za", "com.ar",
    "com.au", "com.br", "com.cn", "com.mx", "com.tr", "gov.uk", "ne.jp",
    "net.au", "or.jp", "org.au", "org.uk",
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lowercased scheme, '' when the value is not scheme://-shaped."""
    return F.lower(F.regexp_extract(_c(col), _SCHEME_RE, 1))


def is_urlish(col: Column | str) -> Column:
    """True when the value is scheme://-shaped — the predicate every
    consumer that GROUPS or GATES on URL identity must split on first:
    ``canonicalize_url`` maps every non-URL string (bare hosts,
    protocol-relative ``//host/x``, junk) to the same ``'://'``-prefixed
    residue, so treating them as one alias class would silently merge
    distinct documents (round-11 review)."""
    return _c(col).rlike(_SCHEME_RE)


def url_host(col: Column | str) -> Column:
    """Lowercased host with any ``:port`` and a leading ``www.`` removed."""
    hostport = F.regexp_extract(_c(col), _HOSTPORT_RE, 1)
    host = F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))
    return F.regexp_replace(host, "^www\\.", "")


def registered_domain(col: Column | str, *, is_host: bool = False) -> Column:
    """eTLD+1: last two host labels, or last three when the 2-label suffix
    is in ``MULTIPART_SUFFIXES`` (``a.b.co.uk`` → ``b.co.uk``)."""
    host = _c(col) if is_host else url_host(col)
    labels = F.split(host, "\\.")
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    multi = last2.isin(*MULTIPART_SUFFIXES) & (F.size(labels) >= 3)
    return F.when(F.size(labels) <= 2, host).otherwise(
        F.when(multi, last3).otherwise(last2)
    )


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form per the module-docstring spec — one nested JVM
    expression (fragment strip → parse → normalize → reassemble)."""
    u = F.regexp_replace(_c(col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.regexp_extract(u, _HOSTPORT_RE, 1)
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, ":[0-9]+$", "")), "^www\\.", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    default_port = (
        (port == "")
        | ((scheme == F.lit("https")) & (port == "443"))
        | ((scheme == F.lit("http")) & (port == "80"))
    )
    portpart = F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), "/+$", "")
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
