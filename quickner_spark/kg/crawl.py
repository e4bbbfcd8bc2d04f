"""BFS crawl-frontier orchestration (web-scale extension).

Composes the crawl surface this round built — robots rules / delays
(:mod:`quickner_spark.kg.robots`), politeness scheduling
(:func:`~quickner_spark.kg.robots.plan_frontier`), link + sitemap
discovery and URL canonicalization (:mod:`quickner_spark.kg.weblinks`)
— into the loop a crawler actually runs:

    frontier_0 = seeds
    repeat: plan (robots + politeness + budget) → fetch → discover new
    urls → canonical-dedup against everything seen → frontier_{i+1}

Fetching is abstracted as a callable ``fetcher(plan) -> pages`` — in
tests and simulations it is a join against a synthetic web table; in a
real deployment it is the fetch fleet's output landing as WARC
(:func:`quickner_spark.sources.warc.read_warc`). The loop itself is
engine work: frontier management, dedup state, politeness — exactly the
parts that must scale.

Scale shape per round: one politeness shuffle (host-keyed window in
``plan_frontier``), the fetcher's own cost, one link scan (zero
shuffle), one normalize+distinct, and ONE anti-join of the candidate
set against the seen table — the crawl-db pattern. The seen table is
the only state that grows; it is url-keyed and ``localCheckpoint``-ed
each round so lineage stays flat (the same contract as
``operators.graph.pagerank``). At 10^12 urls the seen table is the
dominant join side — pre-partition it on the canonical key (bucketed
storage) so the per-round anti-join co-locates; the loop keys every
join on ``normalize_url`` output, so bucketing by that key is stable
across rounds.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from quickner_spark.kg.robots import plan_frontier
from quickner_spark.kg.weblinks import (extract_links, host_of,
                                        normalize_url, resolve_href_full)

__all__ = ["crawl", "CrawlResult", "discovered_urls"]


def discovered_urls(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """(url) — absolute http(s) URLs discovered in fetched pages:
    anchor hrefs resolved against the page url with the RFC 3986 §5.2
    directory-relative resolver (``page2.html`` on ``/dir/index.html``
    fetches ``/dir/page2.html`` — the host-root shortcut that is fine
    for the host graph would 404 here). One regexp scan + explode;
    zero shuffle."""
    links = extract_links(pages, url_col=url_col, html_col=html_col)
    absu = resolve_href_full(F.col(url_col), F.col("href"))
    return (links.select(absu.alias("url"))
            .where(F.col("url").rlike("^https?://")
                   & (host_of(F.col("url")) != "")))


@dataclass
class CrawlResult:
    """Outcome of :func:`crawl`: every fetched page tagged with its
    round, the per-round frontier sizes, and the final seen table."""
    pages: DataFrame            # fetcher columns + crawl_round
    # (url_norm,) — every canonical key ever DECIDED: planned-for-fetch
    # urls and robots-disallowed urls. Disallowed urls stay recorded so
    # they never bounce back into later frontiers; urls dropped by a
    # per-host BUDGET are deliberately absent — deferred, not dead, so
    # a later round's discovery re-surfaces them (see crawl docstring)
    seen: DataFrame
    frontier_sizes: list[int] = field(default_factory=list)
    fetched_counts: list[int] = field(default_factory=list)


def crawl(seeds: DataFrame,
          fetcher: Callable[[DataFrame], DataFrame],
          rules: DataFrame,
          delays: DataFrame | None = None,
          rounds: int = 3,
          budget_per_host: int | None = None,
          host_budget=None,
          priority_col: str | None = None,
          url_col: str = "url") -> CrawlResult:
    """Run ``rounds`` BFS crawl rounds from ``seeds``.

    Each round: ``plan_frontier`` filters and schedules the frontier
    (robots ``rules``/``delays``, per-host ``budget_per_host`` or the
    importance-proportional ``host_budget`` table —
    :func:`~quickner_spark.kg.robots.allocate_budget` over a prior
    round's ``host_rank`` closes the harvest loop,
    ``priority_col`` order); ``fetcher`` maps the plan to fetched pages
    (must return at least (url, html) — extra columns pass through);
    :func:`discovered_urls` extracts candidates;
    :func:`~quickner_spark.kg.weblinks.normalize_url` + distinct +
    anti-join against the seen table yields the next frontier. The
    loop stops early when a frontier is empty. Budget ranks beyond the
    cap are DEFERRED, not dead: they are dropped from this round's plan
    AND left out of the seen table, so the next round's fresh discovery
    re-surfaces anything still linked (the sitemaps.org/crawl
    convention). Robots-DISALLOWED urls by contrast enter seen — their
    verdict is permanent and they must never bounce back.

    Cost shape: the deferral bookkeeping (a flagged full-frontier
    decision + a per-round seen-delta materialization) is paid ONLY when
    a budget is configured. Unbudgeted crawls take the fast path — every
    frontier url is decided (planned or disallowed), so the frontier
    itself IS the seen delta and no second materialization exists
    (measured ~1.5x wall on the 1.28M-page 4-round bench, which is why
    the paths are split).

    Determinism: every step is deterministic given the fetcher, so two
    runs produce identical page sets (test-pinned). The per-round
    count() actions double as the lineage barrier points."""
    spark = seeds.sparkSession
    budgeted = budget_per_host is not None or host_budget is not None
    # seen is kept as a UNION of per-round checkpointed deltas: each
    # round materializes only its OWN increment, never rewriting the
    # accumulated table — at crawl-db scale the seen side is the
    # dominant state and rewriting it per round is O(rounds · |seen|)
    # wasted I/O.
    seen_parts: list[DataFrame] = []
    # canonicalize the seed frontier exactly like discovered candidates
    # (min raw url per canonical key) — the loop's invariant is that
    # EVERY round's frontier is unique per canonical key, and seeds
    # differing only by fragment / tracking params must not be fetched
    # twice nor emit duplicate keys into the seen delta
    seed_keys = (seeds.select(F.col(url_col).alias("url"),
                              normalize_url(F.col(url_col))
                              .alias("url_norm"))
                 .groupBy("url_norm").agg(F.min("url").alias("url"))
                 .localCheckpoint())
    if not budgeted:
        # fast path: with no budget every enqueued url is decided this
        # round (planned or robots-disallowed), so the frontier itself is
        # the seen delta — record it up front and reuse the one per-round
        # localCheckpoint of `fresh` for both the delta and the next
        # frontier (no second materialization).
        seen_parts.append(seed_keys.select("url_norm"))
    frontier = seed_keys.select("url")
    n = frontier.count()
    all_pages: DataFrame | None = None
    page_parts: list[DataFrame] = []
    sizes: list[int] = []
    fetched: list[int] = []
    for rnd in range(rounds):
        sizes.append(n)
        if n == 0:
            break
        if budgeted:
            # the flagged full-frontier decision: one politeness window,
            # reused for the fetch plan AND the seen delta
            dec = plan_frontier(frontier, rules, delays,
                                priority_col=priority_col,
                                budget_per_host=budget_per_host,
                                host_budget=host_budget,
                                keep_dropped=True).cache()
            plan = dec.where(F.col("planned")).drop("allowed", "planned")
            # seen delta: planned urls + robots-disallowed urls. Allowed-
            # but-over-budget urls stay OUT — that is the deferral. No
            # distinct: frontier rows are unique per canonical key by
            # construction (the groupBy below), and duplicate keys in an
            # anti-join right side are harmless anyway.
            delta = (dec.where(F.col("planned") | ~F.col("allowed"))
                     .select(normalize_url(F.col("url")).alias("url_norm"))
                     .localCheckpoint())
            seen_parts.append(delta)
        else:
            dec = None
            plan = plan_frontier(frontier, rules, delays,
                                 priority_col=priority_col)
        pages = fetcher(plan).withColumn("crawl_round", F.lit(rnd))
        # COLUMNAR cache, not localCheckpoint: the checkpoint RDD stores
        # row objects and rescans ~10x slower than the vectorized
        # in-memory cache (measured on the 6.4M-page bench), and pages
        # needs no lineage cut — its inputs are this round's checkpointed
        # frontier (one join away). The caches are tracked on the result;
        # call ``caching.release(result.pages)`` when done.
        pages = pages.cache()
        fetched.append(pages.count())
        if dec is not None:
            dec.unpersist()  # both consumers (plan, delta) materialized
        page_parts.append(pages)
        all_pages = pages if all_pages is None else all_pages.union(pages)
        if rnd == rounds - 1:
            # the final round's discoveries can never be fetched —
            # skip the link scan + anti-join entirely (on a BFS whose
            # last level dominates, that pass is a large fraction of
            # total work). seen keeps its DECIDED-keys contract: no
            # verdict was ever issued for these urls.
            break
        seen = seen_parts[0]
        for part in seen_parts[1:]:
            seen = seen.union(part)
        # min() picks the representative raw url per canonical key —
        # dropDuplicates would keep a partition-order-dependent one
        cand = (discovered_urls(pages)
                .select(F.col("url"),
                        normalize_url(F.col("url")).alias("url_norm"))
                .groupBy("url_norm").agg(F.min("url").alias("url")))
        fresh = cand.join(seen, "url_norm", "left_anti").localCheckpoint()
        n = fresh.count()
        if not budgeted:
            # fast path: next round decides every one of these urls, so
            # the fresh checkpoint doubles as the seen delta
            seen_parts.append(fresh.select("url_norm"))
        frontier = fresh.select("url")
    if all_pages is None:
        all_pages = spark.createDataFrame([], "url string, html binary, "
                                          "crawl_round int")
    if seen_parts:
        seen = seen_parts[0]
        for part in seen_parts[1:]:
            seen = seen.union(part)
    else:
        seen = spark.createDataFrame([], "url_norm string")
    from quickner_spark.operators.caching import track

    return CrawlResult(pages=track(all_pages, *page_parts), seen=seen,
                       frontier_sizes=sizes, fetched_counts=fetched)
