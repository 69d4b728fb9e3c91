"""URL canonicalization — native Spark expressions, no UDF.

Crawl pipelines dedup fetch frontiers and document sets by CANONICAL
URL: the same resource is reachable as ``HTTP://Host:80/p?b=2&a=1#x``
and ``http://host/p?a=1&b=2``, and treating those as distinct inflates
the corpus and re-crawls the web.  The normalization steps implemented
here are the RFC 3986 §6 comparison ladder's safe subset:

- scheme and host lower-cased (case-insensitive by spec);
- default port dropped (``:80`` for http, ``:443`` for https);
- fragment removed (never sent to the server);
- empty path → ``/`` (equivalent request target);
- query parameters sorted (order-insensitive for the dominant
  key-value usage; disclosed: applications that depend on parameter
  ORDER are mis-merged, the standard crawl-side tradeoff).

Deliberately NOT done (disclosed): dot-segment resolution and
percent-encoding normalization (correct implementations need a
stateful pass; a crawl dedup prefers under-merging to corrupting),
IDN/punycode folding.

Everything is built from ``pyspark.sql.functions`` string/array
primitives, so the whole normalization stays inside whole-stage
codegen — at 100 TB this runs at scan speed with zero Python cost.
The reference pipeline has no URLs (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL, as a native
    column expression (see module docstring for the exact ladder)."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    after = F.regexp_replace(no_frag, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))
    host = (
        F.when(
            scheme == "http",
            F.regexp_replace(hostport, ":80$", ""),
        )
        .when(
            scheme == "https",
            F.regexp_replace(hostport, ":443$", ""),
        )
        .otherwise(hostport)
    )
    tail = F.regexp_replace(after, r"^[^/?]*", "")  # path[?query]
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        tail.contains("?"),
        F.regexp_replace(tail, r"^[^?]*\?", ""),
    ).otherwise(F.lit(""))
    sorted_q = F.array_join(
        F.sort_array(F.split(query, "&")), "&"
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )
