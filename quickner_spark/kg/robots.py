"""robots.txt parsing and crawl-frontier filtering.

A crawl-side KG build reads robots.txt before it reads pages; this
module turns a corpus of fetched robots bodies into a rules table and
applies it to a URL frontier — all Column work, no Python in the data
path, every rule below restated by the q52 DuckDB oracle so the parsing
semantics themselves are cross-engine pinned.

Semantics (the practical subset of RFC 9309):

* group structure: consecutive ``User-agent:`` lines open ONE group
  whose Allow/Disallow rules run until the next User-agent line that
  follows a non-User-agent line (RFC 9309 §2.2.1).
* a group governs when it names ``*`` or the caller's agent token
  (case-insensitive exact match; no longest-agent-prefix tiebreak —
  documented simplification, ``*`` + exact covers crawl practice).
* ``#`` starts a comment; blank/foreign lines are ignored; rules before
  any User-agent line belong to no group and are dropped (per RFC).
* rule paths match as plain path prefixes (no ``*``/``$`` wildcards —
  documented simplification); an empty Disallow imposes nothing and is
  dropped, likewise an empty Allow.
* precedence per URL: the longest matching path wins; on equal length
  Allow beats Disallow (RFC 9309 §2.2.2); no governing rule -> allowed.

Scale shape: parsing windows partition by host and are bounded by
lines-per-robots-file (hundreds), never corpus size; the frontier join
keys on host (rules tables are |hosts|-sized — broadcast when small),
and the winner is picked per DISTINCT (host, path) so a frontier that
revisits paths never re-ranks rules per duplicate URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["robots_rules", "frontier_allowed"]

_KIND_RE = "(?i)^(user-agent|allow|disallow)\\s*:"


def robots_rules(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body",
                 agent: str = "*") -> DataFrame:
    """(host, rule, path) — the Allow/Disallow rules governing ``agent``
    extracted from raw robots.txt bodies, one row per kept rule.

    One posexplode over lines, one lag window (group starts), one
    running-sum window (group ids), one max window (does any User-agent
    line of my group name me) — all partitioned by host."""
    lines = (robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"))
        .select("host", "pos",
                F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"))
        .select("host", "pos",
                F.lower(F.regexp_extract("line", _KIND_RE, 1)).alias("kind"),
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
    names_me = ua & ((F.col("value") == "*")
                     | (F.lower("value") == agent.lower()))
    governed = lines.withColumn(
        "governs", F.max(names_me.cast("int")).over(grp) == 1)
    return (governed
            .where(F.col("governs") & (F.col("gid") > 0) & ~ua
                   & (F.col("value") != ""))
            .select("host", F.col("kind").alias("rule"),
                    F.col("value").alias("path")))


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
    cand = (keys.join(rules, "host")
            .where(F.col("upath").startswith(F.col("path"))))
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
