"""Web-corpus normalization: HTML field extraction and URL
canonicalization.

The crawl→corpus step every web-scale training pipeline runs between
the WARC source (sources/warc.py) and the text-quality gates
(operators/text.py): pull title/links/visible text out of markup, and
collapse the many spellings of one URL (scheme/host case, default
port, ``www.``, tracking params, param order, fragments) to a single
canonical key for per-URL dedup.

Everything here is scan-side column expressions — regexp and
higher-order array functions that run inside whole-stage codegen, no
UDFs, no shuffle. At 100 TB the extraction cost is the read cost.

Capability extension beyond the reference surface (the reference
ingests structured files only — modules/auto_loader_steps.py:85-114);
semantics follow the public URL-normalization rules of RFC 3986 §6.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tag-stripping on well-formed markup: drop every <...> run, then
# collapse whitespace. (A full HTML5 parser is out of scope scan-side;
# this is the C4/CommonCrawl-style regex pass.)
_TAG_RE = "<[^>]+>"
_WS_RE = r"\s+"


def html_title(html: Column) -> Column:
    """First ``<title>`` text (empty string when absent)."""
    return F.regexp_extract(html, "<title>([^<]*)</title>", 1)


def html_links(html: Column) -> Column:
    """Every ``href="..."`` target, in document order."""
    return F.regexp_extract_all(html, F.lit('href="([^"]+)"'), F.lit(1))


def html_visible_text(html: Column) -> Column:
    """Markup stripped, whitespace collapsed, ends trimmed."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(html, _TAG_RE, " "), _WS_RE, " ")
    )


def canonicalize_url(url: Column, drop_param_prefix: str = "utm_") -> Column:
    """RFC 3986 §6 normalization + the de-facto crawl rules:

    - scheme and host lowercased; leading ``www.`` dropped; the
      scheme's OWN default port dropped (``:443`` only for https,
      ``:80`` only for http — RFC 3986 §6.2.3), so ``http://h:443/x``
      is NOT collapsed onto the https key and ``http://h:80/x`` joins
      ``http://h/x``
    - fragment dropped
    - query params: tracking params (``utm_*`` by default) removed,
      the rest sorted so param order can't split a dedup group
    - empty path becomes ``/``

    Pure column algebra (regexp + split/filter/array_sort/array_join),
    so canonicalization happens in the scan stage and the downstream
    per-URL dedup groupBy shuffles canonical keys only.
    """
    no_frag = F.regexp_replace(url, "#.*$", "")
    base = F.regexp_extract(no_frag, "^([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    scheme = F.lower(F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, "^([^/]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).otherwise(host)
    path = F.regexp_replace(rest, "^[^/]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith(drop_param_prefix),
        )
    )
    param_str = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(param_str != "", F.concat(F.lit("?"), param_str)).otherwise(
            F.lit("")
        ),
    )
