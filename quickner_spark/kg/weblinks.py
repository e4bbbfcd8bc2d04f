"""Hyperlink-graph construction over crawled pages (web-scale extension).

Common Crawl's own derived datasets (the host- and domain-level webgraphs)
are exactly this job: every page contributes its outgoing anchors, hrefs
resolve against the page url, and the host-level graph is the grouped
count. The reference engine has no link surface (it never sees html —
quickner.rs ingests plain text), so this module is part of the
beyond-inventory crawl operating mode (SURVEY §2.10), feeding
``operators.graph`` (PageRank / k-hop / degree stats run unchanged on the
host graph).

Everything is JVM-side column work — one regexp scan per page, an explode,
and an aggregate — so the operator inherits parquet pushdown and
whole-stage codegen; no Python touches the corpus.

Scale shape: :func:`extract_links` is scan + explode (zero shuffle);
:func:`host_graph` shuffles only (src_host, dst_host) pair counts after a
map-side partial aggregate — output-bounded, independent of corpus size.
Hot hosts (the crawl's head domains) are absorbed by the partial aggregate
the same way the entity index absorbs head surfaces.

Resolution semantics (documented simplifications, all shared by the q45
DuckDB oracle so they are cross-engine pinned):

* hrefs are recognized in ``<a ...>`` tags with quoted values (either
  quote style), tag/attribute names case-insensitive (``<A HREF=...>``
  matches); unquoted hrefs are skipped.
* fragments are stripped before resolution (``page#sec`` == ``page``).
* scheme-relative ``//host/p`` adopts the page's scheme; absolute paths
  ``/p`` adopt the page's authority; anything with a scheme stands as-is.
* :func:`resolve_href` (host-graph resolver): RELATIVE PATHS RESOLVE
  AGAINST THE HOST ROOT, not the page's directory (no RFC 3986
  dot-segment merge). The HOST-level graph — this module's output — is
  invariant to that simplification: either resolution lands on the same
  host. Consumers whose resolved urls become FETCH TARGETS (the crawl
  frontier) must use :func:`resolve_href_full`, the RFC 3986 §5.2
  directory-relative resolver, where a wrong path is a 404.
* non-hierarchical schemes (``mailto:``, ``javascript:``) resolve to
  themselves, yield an empty host, and are dropped by :func:`host_graph`.
* IPv6 literal authorities and userinfo are not parsed (rare in crawl
  data; they yield a truncated host rather than an error).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T

__all__ = ["extract_links", "extract_anchors", "extract_sitemap_urls",
           "resolve_href", "resolve_href_full", "host_of", "host_graph",
           "anchor_dictionary",
           "aliases_from_anchors", "domain_of", "psl_domains",
           "domain_graph", "normalize_url", "surt_key", "TRACKING_PARAMS"]

# one capture group, either quote style, case-insensitive on the tag and
# attribute names (<A HREF=...> is valid html and common in older crawl
# pages). A mismatched-quote href like href="x' matches too — harmless:
# real pages don't survive it either way.
HREF_PATTERN = '(?i)<a\\s[^>]*href\\s*=\\s*["\']([^"\']*)["\']'
# group 1 = href, group 2 = the anchor's inner text. Plain-text anchors
# only: nested markup inside <a> (e.g. <a ...><b>x</b></a>) is skipped —
# the alias-prior use case wants clean surface strings anyway.
ANCHOR_PATTERN = HREF_PATTERN + "[^>]*>([^<]*)</a>"
_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*:"


def decoded_html(pages: DataFrame, html_col: str) -> Column:
    """The html column as a string: binary columns decode as UTF-8
    in-plan, string columns pass through (shared by every html scan)."""
    html: Column = F.col(html_col)
    if isinstance(pages.schema[html_col].dataType, T.BinaryType):
        html = F.decode(html, "UTF-8")
    return html


def extract_links(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html",
                  drop_nofollow: bool = False) -> DataFrame:
    """(url, href) — one row per anchor href occurrence, document order.

    Pure scan work: ``regexp_extract_all`` + ``explode``; binary html
    columns are decoded as UTF-8 in-plan. Repeated identical anchors on a
    page each emit a row (the host graph's edge weight counts anchors).

    ``drop_nofollow=True`` skips anchors whose tag carries a
    ``rel`` value containing ``nofollow`` in any case, quoted or not
    (publisher-disavowed links — authority-graph builds often exclude
    them; Common Crawl's own webgraph keeps them, hence the default).
    That path extracts the whole tag and filters before pulling the
    href — still one scan, one extra in-row rlike."""
    html = decoded_html(pages, html_col)
    if not drop_nofollow:
        hrefs = F.regexp_extract_all(html, F.lit(HREF_PATTERN), F.lit(1))
        return pages.select(F.col(url_col).alias("url"),
                            F.explode(hrefs).alias("href"))
    tag_pat = "(?i)<a\\s[^>]*href\\s*=\\s*[\"'][^\"']*[\"'][^>]*>"
    tags = F.regexp_extract_all(html, F.lit(tag_pat), F.lit(0))
    return (pages.select(F.col(url_col).alias("url"),
                         F.explode(tags).alias("tag"))
            .where(~F.col("tag").rlike(
                "(?i)rel\\s*=\\s*[\"']?[^>\"']*nofollow"))
            .select("url", F.regexp_extract(
                "tag", HREF_PATTERN, 1).alias("href")))


def extract_anchors(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """(url, href, anchor) — one row per plain-text anchor, document
    order. ONE corpus-sized regexp scan (whole-match extraction), then
    two per-anchor extracts for href/text — the two-group
    ``regexp_extract_all`` form would scan the html twice; anchors
    containing child tags are skipped (``ANCHOR_PATTERN``)."""
    html = decoded_html(pages, html_col)
    tags = F.regexp_extract_all(html, F.lit(ANCHOR_PATTERN), F.lit(0))
    return (pages.select(F.col(url_col).alias("url"),
                         F.explode(tags).alias("tag"))
            .select("url",
                    F.regexp_extract("tag", ANCHOR_PATTERN, 1).alias("href"),
                    F.regexp_extract("tag", ANCHOR_PATTERN, 2)
                     .alias("anchor")))


def anchor_dictionary(pages: DataFrame, min_count: int = 1,
                      url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(anchor, dst_host, n_links, rank) — the anchor-text alias-prior
    dictionary (the CrossWikis shape: Spitkovsky & Chang 2012, built from
    web anchor text): how often each normalized (lowercased, trimmed)
    anchor string points at each destination host, ranked per anchor by
    count (rank 1 = the anchor's dominant sense, ties broken by host).
    Anchor text is the web's own high-precision alias signal — rank-1
    rows feed entity linking as alias priors alongside the gazetteer.

    Scale shape: the pair count is output-bounded behind a map-side
    partial aggregate (a head anchor like "home" collapses per-partition
    before the shuffle); the rank window then runs over the AGGREGATED
    table, so its per-anchor partition is bounded by the number of
    distinct destination hosts, not by corpus size. Integer columns only
    — the table is cross-engine exact (q46)."""
    a = extract_anchors(pages, url_col=url_col, html_col=html_col)
    pairs = (a.select(
        F.lower(F.trim("anchor")).alias("anchor"),
        host_of(resolve_href(F.col("url"), F.col("href"))).alias("dst_host"))
        .where((F.col("anchor") != "") & (F.col("dst_host") != "")))
    counts = (pairs.groupBy("anchor", "dst_host")
              .agg(F.count("*").alias("n_links")))
    if min_count > 1:
        counts = counts.where(F.col("n_links") >= min_count)
    w = Window.partitionBy("anchor").orderBy(F.desc("n_links"), "dst_host")
    return counts.withColumn("rank", F.row_number().over(w).cast("long"))


def aliases_from_anchors(anchor_dict: DataFrame, host_entities: DataFrame,
                         min_links: int = 2,
                         max_rank: int = 1) -> DataFrame:
    """(alias, canonical_id, label, prior) — web-discovered alias rows in
    the exact shape :func:`kg.link.link_mentions` consumes (homepage
    seeding): an anchor whose dominant destination (``rank <= max_rank``,
    ``n_links >= min_links``) is a host already attributed to a known
    entity becomes an alias of that entity, with the anchor count as its
    prior. Union with ``alias_table_from_gazetteer`` to extend linking;
    feed the new surfaces back into the next crawl round's gazetteer to
    bootstrap recall (the CrossWikis loop).

    ``host_entities``: a small seed table (host, canonical_id, label) —
    broadcast, so the join adds no shuffle beyond the dictionary's own."""
    seed = F.broadcast(host_entities.select("host", "canonical_id", "label"))
    return (anchor_dict
            .where((F.col("rank") <= max_rank)
                   & (F.col("n_links") >= min_links))
            .join(seed, anchor_dict["dst_host"] == seed["host"])
            .select(F.col("anchor").alias("alias"), "canonical_id", "label",
                    F.col("n_links").cast("int").alias("prior")))


def resolve_href(url: Column, href: Column) -> Column:
    """Absolute form of ``href`` found on page ``url`` (simplified
    RFC 3986 — see module docstring)."""
    h = F.substring_index(href, "#", 1)  # strip fragment
    scheme = F.regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    authority = F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    base = F.concat(scheme, F.lit("://"), authority)
    return (F.when(h.rlike(_SCHEME_RE), h)
             .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
             .when(h.startswith("/"), F.concat(base, h))
             .otherwise(F.concat(base, F.lit("/"), h)))


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over an absolute path (leading ``/``): ``.`` and
    ``..`` segments interpreted, excess ``..`` above the root dropped,
    the trailing-slash convention kept (``/a/b/..`` → ``/a/``). A
    split + one array fold — JVM-side higher-order functions, no UDF.
    The fold's stack is bounded by the path's segment count (dozens),
    not by any data-set dimension."""
    segs = F.split(path, "/")  # leading "/" -> segs[0] == "" (the root)
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, x: (
            F.when(x == ".", acc)
            .when(x == "..",
                  # pop, but never the root marker (excess '..' is a
                  # no-op at the root, per the RFC)
                  F.when(F.size(acc) > 1,
                         F.slice(acc, 1, F.size(acc) - 1)).otherwise(acc))
            .otherwise(F.concat(acc, F.array(x)))))
    joined = F.array_join(stack, "/")
    # '.'/'..' as the LAST segment leave a directory: restore the
    # trailing slash the pop consumed ('/a/b/..' -> '/a/')
    last = F.element_at(segs, -1)
    out = F.when(last.isin(".", ".."),
                 F.concat(joined, F.lit("/"))).otherwise(joined)
    return F.when(out == "", F.lit("/")).otherwise(out)


def resolve_href_full(url: Column, href: Column) -> Column:
    """Crawl-grade absolute form of ``href`` found on page ``url``:
    RFC 3986 §5.2 merge semantics — directory-relative references
    resolve against the PAGE's directory (``page2.html`` on
    ``/dir/index.html`` → ``/dir/page2.html``) and dot segments are
    interpreted exactly (§5.2.4).

    :func:`resolve_href` (host-root rule) stays the host-graph
    resolver — the host-level output is invariant to the simplification
    and the cheap regexp form wins there. THIS resolver is for
    consumers where the resolved url becomes a fetch target
    (:func:`quickner_spark.kg.crawl.discovered_urls`): a wrong path is
    a 404, not a no-op. Still all Column work (regexps + one array fold
    per href, whole-stage codegen) — no Python in the data path.

    Handled per the RFC: scheme-qualified hrefs stand as-is;
    ``//authority/p`` adopts the page scheme; ``/p`` is root-absolute;
    ``?q`` replaces the page's query; the empty (or fragment-only) href
    is the page itself — query KEPT, per §5.2.2's same-document rule;
    anything else merges with the page directory. href queries pass
    through unsplit (a ``/`` inside a query is query text, not a
    segment). Userinfo/IPv6 parsing follows the module-wide
    simplification. Differential-tested against ``urllib.parse.urljoin``
    (CPython's RFC 3986 §5 implementation) over a base×href grid."""
    h = F.substring_index(href, "#", 1)  # fragment never reaches the wire
    scheme = F.regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    authority = F.regexp_extract(
        url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    base = F.concat(scheme, F.lit("://"), authority)
    # page path + query, sans fragment. ppath stays '' for a pathless
    # base in the same-document/query branches (RFC §5.3 recomposition);
    # only the directory MERGE coerces '' to '/' (§5.3 merge rule).
    prest = F.substring_index(F.regexp_replace(
        url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""), "#", 1)
    ppath = F.substring_index(prest, "?", 1)
    pquery = F.regexp_extract(prest, "(\\?.*)$", 1)
    pdir = F.regexp_replace(  # up to the last '/'
        F.when(ppath == "", F.lit("/")).otherwise(ppath), "[^/]*$", "")
    # split the href into its path and query parts; the query is carried
    # through resolution verbatim
    hq = F.regexp_extract(h, "(\\?.*)$", 1)
    hp = F.substring_index(h, "?", 1)
    abs_path = _remove_dot_segments(hp)
    rel_path = _remove_dot_segments(F.concat(pdir, hp))
    return (F.when(h.rlike(_SCHEME_RE), h)
             .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
             .when(hp.startswith("/"),
                   F.concat(base, abs_path, hq))
             .when(h == "",  # same-document reference: query kept
                   F.concat(base, ppath, pquery))
             .when(hp == "",  # '?q' — keep the page path, swap the query
                   F.concat(base, ppath, hq))
             .otherwise(F.concat(base, rel_path, hq)))


def host_of(url: Column) -> Column:
    """Lowercased host of an absolute url, port stripped; '' when the url
    has no ``://`` authority (mailto:, javascript:, malformed)."""
    return F.lower(F.regexp_extract(
        url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))


def host_graph(links: DataFrame, url_col: str = "url",
               href_col: str = "href",
               keep_self: bool = False) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level webgraph.

    ``n_links`` counts anchors (a page linking a host 8 times contributes
    8). Edges whose destination has no host (mailto:, javascript:) are
    dropped; ``keep_self`` controls intra-host edges (default dropped —
    nav/footer chrome otherwise dominates every host's row)."""
    src = host_of(F.col(url_col))
    dst = host_of(resolve_href(F.col(url_col), F.col(href_col)))
    out = (links.select(src.alias("src_host"), dst.alias("dst_host"))
           .where((F.col("dst_host") != "") & (F.col("src_host") != "")))
    if not keep_self:
        out = out.where(F.col("src_host") != F.col("dst_host"))
    return (out.groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n_links")))


# query parameters that never change the resource: analytics attribution
# junk. Prefix match for utm_*; exact match for the click ids.
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "mc_eid", "igshid")


def normalize_url(url: Column) -> Column:
    """Canonical form of a url for crawl-revisit dedup: two captures of
    the same resource that differ only in case of scheme/host, default
    port, fragment, tracking parameters (``utm_*`` + ``TRACKING_PARAMS``),
    or query-parameter ORDER normalize to one string.

    Rules (shared bit-for-bit by the q49 DuckDB oracle):
    scheme+host lowercased (path/query case preserved — they are
    resource-significant); ``:80``/``:443`` dropped under the matching
    scheme; fragment dropped; tracking params dropped; surviving params
    sorted lexicographically; empty path becomes ``/``. Use as the key of
    ``latest_by_key`` (or feed ``sources.warc.latest_by_url`` a
    pre-normalized column) so revisits with attribution junk collapse.

    Simplification: the whole authority is lowercased, so a (rare,
    credential-bearing) userinfo component loses case too — consistent
    with the module-wide "userinfo is not parsed" rule; don't canonical-
    key urls whose userinfo case is significant.

    All column work; the one higher-order function (`filter`+`array_sort`
    over the split query) runs on a per-url params array (a handful of
    elements), not on corpus-sized state."""
    u = F.substring_index(url, "#", 1)                       # drop fragment
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = F.when((scheme == "http") & host.endswith(":80"),
                  F.substring(host, F.lit(1), F.length(host) - 3)) \
            .when((scheme == "https") & host.endswith(":443"),
                  F.substring(host, F.lit(1), F.length(host) - 4)) \
            .otherwise(host)
    path_q = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.substring_index(path_q, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # query = everything after the FIRST '?' — RFC 3986 allows further
    # '?' inside the query, and the oracle splits the same way (a
    # last-'?' split would silently drop 'a=1?' from 'p?a=1?x')
    query = F.when(path_q.contains("?"),
                   path_q.substr(F.locate("?", path_q) + F.lit(1),
                                 F.length(path_q))).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: ~(p.startswith("utm_") | p.rlike(
            "^(" + "|".join(TRACKING_PARAMS) + ")=") | (p == "")))
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(scheme, F.lit("://"), host, path,
                    F.when(qs != "", F.concat(F.lit("?"), qs))
                     .otherwise(F.lit("")))


def surt_key(url: Column) -> Column:
    """SURT-form index key of a url (Sort-friendly URI Reordering
    Transform) — the key Common Crawl's CDX URL index and the Wayback
    family sort and range-scan by: host labels REVERSED and
    comma-joined so one host's captures (and one domain's hosts) are a
    contiguous key range, ``)`` separator, then path and query.
    ``https://www.Example.com/A?b=2&a=1`` →
    ``com,example)/a?a=1&b=2``.

    Canonicalization (each rule restated bit-for-bit by the q56 DuckDB
    oracle): the WHOLE url lowercases (index keys are case-folded,
    unlike :func:`normalize_url` which preserves resource-significant
    path case — the two serve different jobs: SURT keys locate captures,
    normalize_url dedups revisits); fragment dropped; scheme dropped;
    userinfo dropped; a leading ``www`` / ``www{N}`` label dropped;
    ``:80``/``:443`` ports dropped (pragmatic: the scheme is already
    gone, so both default ports strip unconditionally); query params
    sorted lexicographically (order never distinguishes captures);
    empty path becomes ``/``; an empty query's ``?`` drops.

    Pure column work; the only array ops run on per-url label/param
    arrays. Feed ``cdxj_lines(sort=True)`` — range-repartitioned by
    this key — to land a globally ordered shard set without a
    single-reducer sort."""
    u = F.lower(F.substring_index(url, "#", 1))
    rest = F.regexp_replace(u, "^[a-z][a-z0-9+.-]*://", "")
    auth = F.substring_index(F.regexp_extract(rest, "^([^/?]*)", 1),
                             "@", -1)
    auth = F.regexp_replace(auth, ":(80|443)$", "")
    host = F.substring_index(auth, ":", 1)
    host = F.regexp_replace(host, "^www[0-9]*\\.", "")
    # a non-default port survives AFTER the reversed labels (org,h:8080)
    port = F.when(auth.contains(":"),
                  F.concat(F.lit(":"), F.substring_index(auth, ":", -1))
                  ).otherwise(F.lit(""))
    rev = F.concat(F.array_join(F.reverse(F.split(host, "\\.")), ","), port)
    path_q = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.substring_index(path_q, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # everything after the FIRST '?' (same split rule as normalize_url)
    query = F.when(path_q.contains("?"),
                   path_q.substr(F.locate("?", path_q) + F.lit(1),
                                 F.length(path_q))).otherwise(F.lit(""))
    qs = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(rev, F.lit(")"), path,
                    F.when(qs == "", F.lit(""))
                     .otherwise(F.concat(F.lit("?"), qs)))


# second-level labels under which the registered domain spans THREE labels
# (shop.co.uk -> shop.co.uk, not co.uk). A pragmatic stand-in for the full
# Public Suffix List — the handful of generic ccSLD conventions covers the
# overwhelming share of crawl traffic; swap in a broadcast PSL table for
# exact semantics.
CC_SLD = ("co", "com", "net", "org", "ac", "gov", "edu")


def domain_of(host: Column) -> Column:
    """Registered domain of a host: last two labels, or last three when
    the second-to-last is a known ccSLD label (``CC_SLD``). A host with
    no dot passes through unchanged."""
    parts = F.split(host, "\\.")
    n = F.size(parts)
    take3 = (n >= 3) & F.element_at(parts, -2).isin(*CC_SLD)
    return (F.when(n <= 1, host)
             .when(take3, F.concat_ws(".", F.slice(parts, -3, 3)))
             .otherwise(F.concat_ws(".", F.slice(parts, -2, 2))))


def extract_sitemap_urls(sitemaps: DataFrame, url_col: str = "url",
                         body_col: str = "body") -> DataFrame:
    """(sitemap_url, loc, is_index) — the ``<loc>`` entries of fetched
    sitemap XML bodies, the crawl's third discovery channel next to
    anchors and rel=canonical. ``is_index`` is true when the document is
    a ``<sitemapindex>`` (its locs are MORE SITEMAPS to fetch, not
    pages — the caller loops those back into the fetch frontier).

    One regexp scan + explode per body, zero shuffle — the same shape
    as :func:`extract_links`; entity-encoded ampersands (the one XML
    escape that appears in URLs) are decoded. Tag names match
    case-insensitively; CDATA-wrapped locs are unwrapped."""
    body = decoded_html(sitemaps, body_col)
    locs = F.regexp_extract_all(
        body, F.lit("(?is)<loc[^>]*>\\s*(?:<!\\[CDATA\\[)?"
                    "(.*?)(?:\\]\\]>)?\\s*</loc>"), F.lit(1))
    is_index = body.rlike("(?is)<\\s*sitemapindex[\\s>]")
    return (sitemaps.select(F.col(url_col).alias("sitemap_url"),
                            F.explode(locs).alias("raw"),
                            is_index.alias("is_index"))
            .select("sitemap_url",
                    F.replace(F.col("raw"), F.lit("&amp;"),
                              F.lit("&")).alias("loc"),
                    "is_index"))


def psl_domains(hosts: DataFrame, psl: DataFrame,
                host_col: str = "host") -> DataFrame:
    """(host, domain) under full Public Suffix List semantics — the
    exact replacement for :func:`domain_of`'s ccSLD heuristic when a
    PSL snapshot is available.

    ``psl`` is a one-string-column DataFrame of PSL rules in the
    published format: plain suffixes (``com``, ``co.uk``), wildcards
    (``*.ck``), exceptions (``!www.ck``); ``//`` comment lines and
    blanks are ignored. Matching per the PSL algorithm: every label
    suffix of the host is a candidate; exceptions prevail, else the
    matching rule with the most labels; no match falls back to the
    implicit ``*`` rule (top label). Registered domain = public suffix
    plus one label; a host that IS a public suffix passes through.

    Scale shape: the PSL (~10k rules) broadcasts; candidates are two
    HASH equi-joins against it (plain rules key on the candidate,
    wildcard rules on the candidate minus its first label — never an
    OR-condition nested-loop); the winner window partitions per host
    over at most |labels|·|matching rules| rows."""
    rules = (psl.select(F.trim(F.col(psl.columns[0])).alias("r"))
             .where(~F.col("r").rlike("^(//.*)?$"))
             .select(
                 F.when(F.col("r").startswith("!"), F.lit(2))
                  .when(F.col("r").startswith("*."), F.lit(1))
                  .otherwise(F.lit(0)).alias("typ"),
                 F.regexp_replace("r", "^(!|\\*\\.)", "").alias("tail"))
             .withColumn("tail_n", F.size(F.split("tail", "\\."))))
    plain = rules.where(F.col("typ") != 1).select(
        F.col("tail").alias("__k"),
        F.when(F.col("typ") == 2, F.col("tail_n") - 1)
         .otherwise(F.col("tail_n")).alias("ps_n"),
        (F.col("typ") == 2).alias("exc"))
    wild = rules.where(F.col("typ") == 1).select(
        F.col("tail").alias("__k"), (F.col("tail_n") + 1).alias("ps_n"),
        F.lit(False).alias("exc"))
    h = (hosts.select(F.col(host_col).alias("host")).distinct()
         .withColumn("__parts", F.split("host", "\\."))
         .withColumn("__n", F.size("__parts")))
    cands = h.select(
        "host", "__n",
        F.posexplode(F.transform(
            F.sequence(F.lit(1), F.col("__n")),
            lambda i: F.array_join(
                F.slice("__parts", i, F.col("__n") - i + F.lit(1)), ".")
        )).alias("__i", "cand"))
    cands = cands.withColumn(
        "cand_tail",
        F.when(F.col("__n") - F.col("__i") > 1,
               F.regexp_replace("cand", "^[^.]*\\.", "")))
    sel = ["host", "ps_n", "exc"]
    matches = (cands.join(F.broadcast(plain),
                          cands["cand"] == plain["__k"]).select(*sel)
               .unionByName(
                   cands.join(F.broadcast(wild),
                              cands["cand_tail"] == wild["__k"])
                   .select(*sel)))
    rank = Window.partitionBy("host").orderBy(
        F.col("exc").desc(), F.col("ps_n").desc())
    best = (matches.withColumn("__rn", F.row_number().over(rank))
            .where(F.col("__rn") == 1).select("host", "ps_n"))
    out = (h.join(best, "host", "left")
           .withColumn("__ps", F.coalesce("ps_n", F.lit(1))))
    dom_len = F.col("__ps") + F.lit(1)
    return out.select(
        "host",
        F.when(F.col("__n") <= F.col("__ps"), F.col("host"))
         .otherwise(F.concat_ws(".", F.slice("__parts", -dom_len, dom_len)))
         .alias("domain"))


def domain_graph(host_edges: DataFrame, keep_self: bool = False,
                 psl: DataFrame | None = None) -> DataFrame:
    """(src_domain, dst_domain, n_links) — the domain-level webgraph,
    folded from :func:`host_graph` output (the Common-Crawl derivation
    order: page -> host graph -> domain graph). The input is already
    output-bounded, so this re-aggregate touches |hosts²| rows at most,
    never the corpus; intra-domain edges (host A -> host B of the same
    registrant) are dropped unless ``keep_self``. ``psl`` switches the
    label heuristic for exact :func:`psl_domains` folding (two joins
    against the host->domain map, itself |hosts|-bounded)."""
    if psl is not None:
        hset = (host_edges.select(F.col("src_host").alias("host"))
                .union(host_edges.select(F.col("dst_host").alias("host"))))
        dmap = psl_domains(hset, psl)
        out = (host_edges
               .join(dmap.select(F.col("host").alias("src_host"),
                                 F.col("domain").alias("src_domain")),
                     "src_host")
               .join(dmap.select(F.col("host").alias("dst_host"),
                                 F.col("domain").alias("dst_domain")),
                     "dst_host")
               .select("src_domain", "dst_domain", "n_links"))
    else:
        out = (host_edges.select(
            domain_of(F.col("src_host")).alias("src_domain"),
            domain_of(F.col("dst_host")).alias("dst_domain"),
            "n_links"))
    if not keep_self:
        out = out.where(F.col("src_domain") != F.col("dst_domain"))
    return (out.groupBy("src_domain", "dst_domain")
            .agg(F.sum("n_links").alias("n_links")))
