"""URL canonicalization — crawl-side dedup signal before any text is read.

Real crawl corpora carry the same page under many URL spellings (scheme case,
``www.`` prefix, default ports, tracking parameters, trailing slash,
fragments). Canonicalizing FIRST collapses those duplicates with pure string
expressions — zero Python, zero shuffle beyond the final group — and shrinks
every downstream text-dedup stage's input. The reference has no URL stage
(its unit is the file path); this is pipeline surface the web-scale input
demands.

All rules are deliberately expressible as a regex pipeline so the DuckDB
oracle (plans/queries.SQL_URL_CANONICAL) can replay them verbatim:

1. drop the fragment (``#...``)
2. lowercase scheme and host; strip a leading ``www.``
3. strip the scheme's default port (``:80`` http / ``:443`` https)
4. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``) and tidy the
   separators they leave behind
5. strip the trailing path slash (also directly before ``?``)
6. empty path+query → ``/``

Spark regexp_replace replaces globally; the DuckDB mirror must pass the 'g'
flag. Spark group refs are ``$1``, DuckDB's are ``\\1`` — syntax differs,
semantics matched by the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_SCHEME = "^([A-Za-z][A-Za-z0-9+.-]*)://"
# anchored to a parameter boundary ([?&]) so substrings never match: without
# it '?sgclid=1' became '?s' and a VALUE containing 'utm_x=' was truncated,
# canonicalizing distinct URLs to one key (false duplicates). The boundary
# char is kept via $1; the separator-tidy passes then collapse leftovers.
_TRACKING = "([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*"


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of a URL column (pure JVM expressions, see module doc)."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME, 1))
    hostport = F.lower(
        F.regexp_extract(u, _SCHEME + "([^/?#]*)", 2))
    host = F.regexp_replace(hostport, "^www\\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host))
    rest = F.regexp_extract(u, _SCHEME + "[^/?#]*([^#]*)", 2)
    rest = F.regexp_replace(rest, _TRACKING, "$1")
    rest = F.regexp_replace(rest, "\\?&+", "?")
    rest = F.regexp_replace(rest, "&&+", "&")
    rest = F.regexp_replace(rest, "[?&]+$", "")
    rest = F.regexp_replace(rest, "/\\?", "?")
    rest = F.regexp_replace(rest, "/$", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(scheme, F.lit("://"), host, rest)
