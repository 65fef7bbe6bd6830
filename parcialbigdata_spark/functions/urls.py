"""URL canonicalization + host extraction — the CommonCrawl-style
pre-dedup step (SURVEY.md §2.10 extension; no reference analog — the
reference's only URL handling is the fixed search-URL f-string,
``/root/reference/download_lambda.py:27-37``).

Web-crawl corpora dedup URLs BEFORE content: the same page is fetched
as ``http://WWW.Example.com/a/?utm_source=x&b=2&a=1#frag`` and
``https://example.com:443/a?a=1&b=2`` — canonicalization collapses the
aliases so the fetch list, the host-level quality stats, and the
robots/politeness buckets all key on one spelling. The rules here are
the widely used subset (they match what SURT/url-normalization
literature calls safe semantic-preserving transforms):

- scheme and host lowercased; scheme-default ports stripped
  (``:80`` http, ``:443`` https); leading ``www.`` stripped;
- fragment dropped; tracking parameters dropped (``utm_*``,
  ``gclid``, ``fbclid``, ``msclkid``, ``ref``); remaining query
  parameters SORTED (param order is non-semantic);
- duplicate path slashes collapsed; trailing slash dropped (except
  root); empty query's ``?`` dropped.

Everything is built from ``regexp_extract`` / ``split`` /
``filter`` / ``array_sort`` / ``concat_ws`` — single narrow
projection, whole-stage codegen, no UDF: at 100 TB canonicalization
runs inline during the scan and the only shuffle anywhere is whatever
aggregation the caller keys on the canonical form. The DuckDB oracle
replays every rule with ``regexp_extract``/``list_sort`` (the shared
SQL lives next to the query registration), which is what makes the
operator hash-checkable.

Siblings: ``functions/text.py`` (document-content canonicalization —
this module is the URL-key analog), ``operators/dedup.py``
``canonical_dedup`` (consumes canonical keys downstream).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters dropped during canonicalization (the common
# cross-site subset; extend per deployment).
TRACKING_PARAM_REGEX = r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref)="


def url_scheme(url: Column) -> Column:
    """Lowercased scheme (empty string when absent)."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column) -> Column:
    """Lowercased host with any port and leading ``www.`` stripped."""
    raw = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    no_port = F.regexp_replace(raw, r":\d+$", "")
    return F.regexp_replace(no_port, r"^www\.", "")


def url_port(url: Column) -> Column:
    """Explicit port as a string ('' when none)."""
    host_port = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    return F.regexp_extract(host_port, r":(\d+)$", 1)


def url_path(url: Column) -> Column:
    """Path with duplicate slashes collapsed and the trailing slash
    dropped ('' for root)."""
    raw = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    collapsed = F.regexp_replace(raw, r"/{2,}", "/")
    return F.regexp_replace(collapsed, r"/$", "")


def url_query_canonical(url: Column) -> Column:
    """Query string with tracking params dropped and the rest sorted
    ('' when nothing survives). Keeps raw ``k=v`` token spelling —
    percent-decoding is NOT semantics-preserving in general."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical form per the module rules. Rows that do not parse as
    ``scheme://host...`` canonicalize to NULL (callers route them to a
    quarantine bucket rather than silently keying on garbage)."""
    scheme = url_scheme(url)
    host = url_host(url)
    path = url_path(url)
    q = url_query_canonical(url)
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        # non-default port survives canonicalization
        F.when(
            (url_port(url) != "")
            & ~((scheme == "http") & (url_port(url) == "80"))
            & ~((scheme == "https") & (url_port(url) == "443")),
            F.concat(F.lit(":"), url_port(url)),
        ).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), out)
