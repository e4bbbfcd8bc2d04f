"""robots.txt parsing and crawl-frontier filtering / scheduling.

A crawl-side KG build reads robots.txt before it reads pages; this
module turns a corpus of fetched robots bodies into rules / delay /
sitemap tables and applies them to a URL frontier — all Column work, no
Python in the data path, every rule below restated by the q52/q57/q58
DuckDB oracles so the parsing semantics themselves are cross-engine
pinned.

Semantics (the practical subset of RFC 9309):

* group structure: consecutive ``User-agent:`` lines open ONE group
  whose Allow/Disallow rules run until the next User-agent line that
  follows a non-User-agent line (RFC 9309 §2.2.1).
* group precedence follows RFC 9309 §2.2.1's most-specific-match rule
  at exact-token granularity: when ANY group on the host names the
  caller's agent token (case-insensitive exact match), exactly those
  groups govern and ``*`` groups are IGNORED; only a host with no
  exactly-matching group falls back to its ``*`` groups. (No
  longest-agent-substring tiebreak — documented simplification; exact
  token + ``*`` covers crawl practice.)
* ``#`` starts a comment; blank/foreign lines are ignored; rules before
  any User-agent line belong to no group and are dropped (per RFC).
* rule paths match as path prefixes, with the RFC 9309 §2.2.3 special
  characters (which the RFC says crawlers MUST support): ``*`` matches
  any octet sequence and a TRAILING ``$`` anchors the rule at the end
  of the url; a ``$`` anywhere else is a literal octet (the
  REP-matcher convention). An empty Disallow imposes nothing and is
  dropped, likewise an empty Allow.
* precedence per URL: the longest matching rule wins — "most octets"
  (RFC 9309 §2.2.2) counted over the raw rule text, ``*``/``$``
  included, the reference REP-matcher's tiebreak; on equal length
  Allow beats Disallow; no governing rule -> allowed.
* ``Crawl-delay`` (de-facto extension, not in RFC 9309): seconds per
  governing group; when several governing groups disagree (several
  groups can name the same token) the MINIMUM survives — deterministic,
  and the choice is made only between values of the governing tier
  (exact-match groups, or the ``*`` groups when no exact group exists,
  per the precedence rule above). Non-numeric values drop.
* ``Sitemap:`` is a GLOBAL directive (outside any group, per the
  sitemaps.org protocol) — scanned without the group machinery.

Scale shape: parsing windows partition by host and are bounded by
lines-per-robots-file (hundreds), never corpus size; the frontier join
keys on host (rules tables are |hosts|-sized — broadcast when small),
and the winner is picked per DISTINCT (host, path) so a frontier that
revisits paths never re-ranks rules per duplicate URL.
:func:`plan_frontier`'s politeness ranking windows partition by host —
a hot host's candidate list serializes through one task (inherent: a
per-host fetch ORDER is a per-host total order); apply
``budget_per_host`` and pre-filter the frontier (seen-set anti-join,
``normalize_url`` dedup) before planning to bound it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["robots_rules", "frontier_allowed", "crawl_delays",
           "robots_sitemaps", "plan_frontier", "allocate_budget"]

# group boundaries are computed over EVERY recognized directive — a
# User-agent line preceded by a Crawl-delay line starts a new group even
# in the rules pass, and Allow/Disallow lines separate groups even in the
# delays pass. Filtering to the pass-specific kinds BEFORE grouping (the
# pre-round-5 behavior) merged groups across invisible directives, so
# 'User-agent: *\nCrawl-delay: 10\nUser-agent: AhrefsBot\nDisallow: /'
# wrongly disallowed every agent.
_ALL_KINDS_RE = "(?i)^(user-agent|allow|disallow|crawl-delay)\\s*:"


def _governed_lines(robots: DataFrame, host_col: str,
                    body_col: str, agent: str) -> DataFrame:
    """(host, pos, kind, value, gid, governs) — robots bodies split into
    directive lines with RFC 9309 group structure attached. One
    posexplode over lines, one lag window (group starts), one running-sum
    window (group ids), two max windows (does any User-agent line of my
    group name me exactly / name ``*``) plus one host-level max (does ANY
    group on this host name the agent exactly — the §2.2.1 precedence
    switch: exact groups govern when one exists, ``*`` groups only
    otherwise) — all partitioned by host. Callers filter to the directive
    kinds they want AFTER the group machinery ran over the full
    sequence. When ``agent == '*'`` the exact and star tiers coincide,
    so the precedence switch is the identity there (the q52/q57/q58
    oracles restate that default-agent form)."""
    lines = (robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"))
        .select("host", "pos",
                F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"))
        .select("host", "pos",
                F.lower(F.regexp_extract(
                    "line", _ALL_KINDS_RE, 1)).alias("kind"),
                F.trim(F.regexp_extract(
                    "line", "^[^:]*:(.*)$", 1)).alias("value"))
        .where(F.col("kind") != ""))
    by_pos = Window.partitionBy("host").orderBy("pos")
    ua = F.col("kind") == "user-agent"
    starts = ua & (F.lag("kind").over(by_pos).isNull()
                   | (F.lag("kind").over(by_pos) != F.lit("user-agent")))
    lines = lines.withColumn(
        "gid", F.sum(starts.cast("int")).over(
            by_pos.rowsBetween(Window.unboundedPreceding, 0)))
    grp = Window.partitionBy("host", "gid")
    exact = ua & (F.lower("value") == agent.lower())
    star = ua & (F.col("value") == "*")
    has_exact = F.max(exact.cast("int")).over(
        Window.partitionBy("host")) == 1
    g_exact = F.max(exact.cast("int")).over(grp) == 1
    g_star = F.max(star.cast("int")).over(grp) == 1
    return lines.withColumn(
        "governs", F.when(has_exact, g_exact).otherwise(g_star))


def robots_rules(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body",
                 agent: str = "*") -> DataFrame:
    """(host, rule, path) — the Allow/Disallow rules governing ``agent``
    extracted from raw robots.txt bodies, one row per kept rule."""
    governed = _governed_lines(robots, host_col, body_col, agent)
    return (governed
            .where(F.col("governs") & (F.col("gid") > 0)
                   & F.col("kind").isin("allow", "disallow")
                   & (F.col("value") != ""))
            .select("host", F.col("kind").alias("rule"),
                    F.col("value").alias("path")))


def crawl_delays(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body", agent: str = "*") -> DataFrame:
    """(host, delay_s) — the Crawl-delay governing ``agent`` per host,
    seconds as double (robots bodies carry integers or decimals like
    ``1.5``; a single decimal-literal→double cast is bit-identical
    cross-engine). Hosts without a governing numeric Crawl-delay are
    absent — the caller supplies its own default politeness interval
    (:func:`plan_frontier` ``default_delay``)."""
    governed = _governed_lines(robots, host_col, body_col, agent)
    return (governed
            .where(F.col("governs") & (F.col("gid") > 0)
                   & (F.col("kind") == "crawl-delay")
                   & F.col("value").rlike("^[0-9]+(\\.[0-9]+)?$"))
            .groupBy("host")
            .agg(F.min(F.col("value").cast("double")).alias("delay_s")))


def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    body_col: str = "body") -> DataFrame:
    """(host, sitemap) — every ``Sitemap:`` directive per host.
    Global directives (sitemaps.org protocol): no group machinery, one
    regexp line scan + explode, zero shuffle. Feed the output urls to
    :func:`quickner_spark.kg.weblinks.extract_sitemap_urls` after
    fetching them — robots.txt → sitemap → page urls is the crawl's
    discovery chain."""
    lines = (robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), "\n")).alias("raw"))
        .select("host",
                F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line")))
    sm = F.trim(F.regexp_extract("line", "(?i)^sitemap\\s*:(.*)$", 1))
    return (lines.select("host", sm.alias("sitemap"))
            .where(F.col("sitemap") != ""))


def _compiled_rules(rules: DataFrame) -> DataFrame:
    """``rules`` + ``(__wild, __rx)`` — the RFC 9309 §2.2.3 rule-path
    matcher compiled ONCE per rule row: ``*`` = any octet sequence,
    TRAILING ``$`` = end anchor, ``$`` elsewhere literal. The regex is
    built Column-side (regex-escape the literal octets, ``*`` → ``.*``,
    re-anchor — no UDF) as a |rules|-sized projection that Catalyst
    keeps BELOW the frontier join, so the escape chain never re-runs
    per candidate (host, path)×rule pair. Wildcard-free rules (the
    overwhelming majority in the wild, and ALL of the oracle corpus —
    which is why the q52/q57/q58 DuckDB restatements can stay
    ``starts_with``) are flagged ``__wild=false`` and take the cheap
    codegen-able prefix test at match time; q66 oracle-pins the
    wildcard dispatch itself."""
    path = F.col("path")
    anchored = path.endswith("$")
    body = F.regexp_replace(path, "\\$$", "")
    esc = F.regexp_replace(body, "([\\\\.\\[\\]{}()+?^$|])", "\\\\$1")
    rx = F.concat(F.lit("^"), F.regexp_replace(esc, "\\*", ".*"),
                  F.when(anchored, F.lit("$")).otherwise(F.lit("")))
    return (rules.withColumn("__wild", path.contains("*") | anchored)
            .withColumn("__rx", rx))


def frontier_allowed(urls: DataFrame, rules: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """The input frontier plus an ``allowed`` boolean per the rules
    table (``robots_rules`` output shape). The matched path is the
    URL's path+query ('/' when empty — RFC matches against the path);
    the decision is computed once per DISTINCT (host, path) and joined
    back, so rule ranking never scales with frontier duplication."""
    from quickner_spark.kg.weblinks import host_of

    u = urls.withColumn("__h", host_of(F.col(url_col))).withColumn(
        "__p", F.regexp_replace(
            F.regexp_replace(
                F.col(url_col), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""),
            "#.*$", ""))
    u = u.withColumn(
        "__p", F.when(F.col("__p") == "", F.lit("/"))
               .otherwise(F.col("__p")))
    keys = u.select(F.col("__h").alias("host"),
                    F.col("__p").alias("upath")).distinct()
    cand = (keys.join(_compiled_rules(rules), "host")
            .where(F.when(F.col("__wild"),
                          F.regexp_like(F.col("upath"), F.col("__rx")))
                   .otherwise(F.col("upath").startswith(F.col("path"))))
            .drop("__wild", "__rx"))
    # longest match wins; Allow beats Disallow at equal length; the
    # trailing (path, rule) keys only break exact-duplicate-rule ties,
    # deterministically on both engines
    rank = Window.partitionBy("host", "upath").orderBy(
        F.length("path").desc(),
        (F.col("rule") == "allow").desc(), F.col("path"), F.col("rule"))
    winner = (cand.withColumn("__rn", F.row_number().over(rank))
              .where(F.col("__rn") == 1)
              .select(F.col("host").alias("__wh"),
                      F.col("upath").alias("__wp"),
                      F.col("rule").alias("__w")))
    return (u.join(winner, (u["__h"] == winner["__wh"])
                   & (u["__p"] == winner["__wp"]), "left")
            .select(*urls.columns,
                    (F.coalesce(F.col("__w"), F.lit("allow"))
                     != "disallow").alias("allowed")))


def plan_frontier(urls: DataFrame, rules: DataFrame,
                  delays: DataFrame | None = None,
                  url_col: str = "url", priority_col: str | None = None,
                  budget_per_host: int | None = None,
                  host_budget: DataFrame | None = None,
                  default_delay: float = 1.0,
                  keep_dropped: bool = False) -> DataFrame:
    """The crawl scheduler's core decision, composed from this module's
    pieces: which frontier URLs may be fetched, in what per-host order,
    and WHEN — ``(…urls columns…, host, fetch_rank, fetch_offset_s)``.

    * robots filtering: :func:`frontier_allowed`; disallowed urls drop.
    * per-host order: ``priority_col`` DESC when given (feed host
      PageRank, anchor in-degree, or sitemap priority), url ASC as the
      deterministic tiebreak.
    * ``budget_per_host``: ranks beyond the budget drop — the crawl's
      per-host page cap. Politeness makes a host's fetches SEQUENTIAL,
      so with delay d the budget also bounds each host's crawl-round
      wall clock at ``budget · d`` seconds.
    * ``host_budget``: a (host, budget) DataFrame giving PER-HOST caps —
      importance-proportional crawl allocation (feed
      :func:`allocate_budget` over the pipeline's ``host_rank`` table).
      A host's row overrides ``budget_per_host``; hosts without a row
      fall back to it (or stay uncapped when it is None). Broadcast —
      the table is |hosts|-bounded.
    * ``fetch_offset_s = (fetch_rank − 1) · delay``: the earliest
      politeness-respecting fetch time relative to the host's first
      fetch. Delay comes from ``delays`` (:func:`crawl_delays` output,
      host-keyed) with ``default_delay`` for hosts that set none.

    * ``keep_dropped=True`` returns the WHOLE frontier instead of just
      the fetchable slice, flagged with two booleans: ``allowed``
      (robots verdict) and ``planned`` (allowed AND within budget).
      ``fetch_rank``/``fetch_offset_s`` are null on rows that are not
      allowed / not planned. :func:`quickner_spark.kg.crawl.crawl` uses
      this to record robots-disallowed urls as permanently seen while
      leaving budget-deferred urls eligible to re-surface — the two
      drop reasons have opposite revisit semantics. The allowed rows'
      ranks equal the default path's (disallowed rows order after every
      allowed row of their host), so ``keep_dropped=True`` filtered to
      ``planned`` is row-identical to the default output.

    Scale notes: the ranking window partitions by host — the frontier
    shuffles once on host and each host ranks independently; a
    degenerate hot host serializes through one task (see module
    docstring). The delays join is |hosts|-bounded."""
    from quickner_spark.kg.weblinks import host_of

    a = frontier_allowed(urls, rules, url_col)
    if not keep_dropped:
        a = a.where(F.col("allowed")).drop("allowed")
    a = a.withColumn("host", host_of(F.col(url_col)))
    order = ([F.col(priority_col).desc()] if priority_col else []) \
        + [F.col(url_col)]
    if keep_dropped:
        order = [F.col("allowed").desc()] + order
    w = Window.partitionBy("host").orderBy(*order)
    a = a.withColumn("fetch_rank", F.row_number().over(w))
    cap = None
    if host_budget is not None:
        c0, c1 = host_budget.columns[:2]
        hb = host_budget.select(F.col(c0).alias("host"),
                                F.col(c1).cast("int").alias("__hb"))
        default_cap = (F.lit(int(budget_per_host))
                       if budget_per_host is not None
                       else F.lit(None).cast("int"))
        a = a.join(F.broadcast(hb), "host", "left")
        cap = F.coalesce(F.col("__hb"), default_cap)
    elif budget_per_host is not None:
        cap = F.lit(int(budget_per_host))
    within = (F.lit(True) if cap is None
              else cap.isNull() | (F.col("fetch_rank") <= cap))
    if keep_dropped:
        a = a.withColumn("planned", F.col("allowed") & within)
    elif cap is not None:
        a = a.where(within)
    if host_budget is not None:
        a = a.drop("__hb")
    if delays is not None:
        a = a.join(delays, "host", "left")
        delay = F.coalesce(F.col("delay_s"), F.lit(float(default_delay)))
    else:
        delay = F.lit(float(default_delay))
    a = (a.withColumn(
        "fetch_offset_s",
        (F.col("fetch_rank") - F.lit(1)).cast("double") * delay)
        .drop("delay_s"))
    if keep_dropped:
        a = (a.withColumn("fetch_rank",
                          F.when(F.col("allowed"), F.col("fetch_rank")))
             .withColumn("fetch_offset_s",
                         F.when(F.col("planned"), F.col("fetch_offset_s"))))
    return a


def allocate_budget(host_rank: DataFrame, total_budget: int,
                    min_budget: int = 1,
                    host_col: str = "host",
                    rank_col: str = "rank") -> DataFrame:
    """Importance-proportional crawl-budget allocation: (host, budget)
    with ``budget = max(min_budget, floor(total_budget · rank/Σrank))``
    — feed the pipeline's ``host_rank`` table in, hand the result to
    :func:`plan_frontier`'s ``host_budget``. This is the loop a harvest
    pipeline closes every round: crawl → host graph → PageRank →
    budgets → next crawl.

    Integer floor allocation means Σbudget <= total_budget + n_hosts ·
    min_budget (the floor under-allocates, min_budget tops up) — the
    cap is per-host scheduling guidance, not a global quota, so the
    slack is intended. One 1-row broadcast (the rank total) + one
    projection; non-positive or NULL ranks get ``min_budget``."""
    if total_budget <= 0:
        raise ValueError(f"total_budget must be positive: {total_budget}")
    hr = host_rank.select(F.col(host_col).alias("host"),
                          F.col(rank_col).cast("double").alias("__r"))
    tot = hr.agg(F.sum(F.when(F.col("__r") > 0, F.col("__r")))
                 .alias("__t"))
    share = F.floor(F.lit(float(total_budget)) * F.col("__r")
                    / F.col("__t")).cast("int")
    return (hr.join(F.broadcast(tot))
            .select("host",
                    F.greatest(
                        F.lit(int(min_budget)),
                        F.when(F.col("__r") > 0, share)
                        .otherwise(F.lit(int(min_budget))))
                    .alias("budget")))
