"""BFS crawl orchestration (kg/crawl.py) over a synthetic web."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from quickner_spark.kg.crawl import CrawlResult, crawl, discovered_urls
from quickner_spark.kg.robots import crawl_delays, robots_rules


def _web(spark):
    """Deterministic 3-hop web: seed → a,b; a → c, blocked; b → c, dup
    of a (tracking junk); c → d (depth 3, only reached in round 2);
    d → nothing. blocked is robots-disallowed."""
    def page(links):
        return ("<html><body>" +
                "".join(f'<a href="{h}">x</a>' for h in links) +
                "</body></html>").encode()

    web = {
        "https://h.org/seed": page(["/a", "https://o.org/b"]),
        "https://h.org/a": page(["/c", "/private/blocked"]),
        "https://o.org/b": page(["https://h.org/c",
                                 "https://h.org/a?utm_campaign=z"]),
        "https://h.org/c": page(["/d"]),
        "https://h.org/d": page([]),
        "https://h.org/private/blocked": page(["/never"]),
    }
    return spark.createDataFrame(
        [Row(url=u, html=bytearray(b)) for u, b in web.items()])


def _fetcher(web):
    def fetch(plan):
        return (plan.select("url")
                .join(web, "url")
                .select("url", "html"))
    return fetch


def _robots(spark):
    return spark.createDataFrame([
        Row(host="h.org", body="User-agent: *\nDisallow: /private/\n"
                               "Crawl-delay: 1"),
        Row(host="o.org", body="User-agent: *\nAllow: /")])


def test_crawl_bfs_rounds_and_robots_and_dedup(spark):
    web = _web(spark)
    robots = _robots(spark)
    res = crawl(spark.createDataFrame([Row(url="https://h.org/seed")]),
                _fetcher(web), robots_rules(robots),
                crawl_delays(robots), rounds=4)
    got = {(r["url"], r["crawl_round"]) for r in res.pages.collect()}
    assert got == {
        ("https://h.org/seed", 0),
        ("https://h.org/a", 1), ("https://o.org/b", 1),
        # c discovered by both a and b in round 1 → fetched ONCE;
        # a?utm_campaign=z normalizes to the already-seen a;
        # blocked never fetched (robots)
        ("https://h.org/c", 2),
        ("https://h.org/d", 3),
    }
    # frontier sizes: seed, {a,b}, {c,blocked}, {d} — blocked is
    # DISCOVERED (enters the frontier and seen) but plan_frontier drops
    # it at fetch time, and seen-dedup keeps it from bouncing back
    assert res.frontier_sizes == [1, 2, 2, 1]
    assert res.fetched_counts == [1, 2, 1, 1]
    seen = {r["url_norm"] for r in res.seen.collect()}
    assert "https://h.org/private/blocked" in seen  # enqueued, never fetched
    assert "https://h.org/d" in seen


def test_crawl_seed_canonical_dedup(spark):
    """Seeds sharing a canonical key (fragment / tracking params) are
    fetched ONCE — the frontier's unique-per-canonical-key invariant
    holds for round 0 too, in both the fast and the budgeted path."""
    web = _web(spark)
    robots = _robots(spark)
    seeds = spark.createDataFrame([Row(url=u) for u in [
        "https://h.org/seed", "https://h.org/seed#frag",
        "https://h.org/seed?utm_campaign=z"]])
    for budget in (None, 10):
        res = crawl(seeds, _fetcher(web), robots_rules(robots),
                    rounds=1, budget_per_host=budget)
        # min raw url per key is the deterministic representative
        assert [r["url"] for r in res.pages.collect()] \
            == ["https://h.org/seed"]
        assert res.frontier_sizes == [1]
        assert res.seen.where(
            F.col("url_norm") == "https://h.org/seed").count() == 1


def test_crawl_early_stop_and_determinism(spark):
    web = _web(spark)
    robots = _robots(spark)
    seeds = spark.createDataFrame([Row(url="https://h.org/d")])
    res = crawl(seeds, _fetcher(web), robots_rules(robots), rounds=5)
    # d links nowhere: round 1 frontier is empty, loop stops
    assert res.frontier_sizes == [1, 0]
    assert res.fetched_counts == [1]
    # same crawl twice → identical page sets (pinned determinism)
    res2 = crawl(seeds, _fetcher(web), robots_rules(robots), rounds=5)
    assert sorted(res.pages.collect()) == sorted(res2.pages.collect())


def test_crawl_budget_caps_per_host(spark):
    # one host fanning out to 6 children; budget 2 per round
    def page(links):
        return ("<html><body>" +
                "".join(f'<a href="{h}">x</a>' for h in links) +
                "</body></html>").encode()

    rows = [Row(url="https://h.org/seed",
                html=bytearray(page([f"/k/{i}" for i in range(6)])))]
    rows += [Row(url=f"https://h.org/k/{i}", html=bytearray(page([])))
             for i in range(6)]
    web = spark.createDataFrame(rows)
    robots = spark.createDataFrame([
        Row(host="h.org", body="User-agent: *\nAllow: /")])
    res = crawl(spark.createDataFrame([Row(url="https://h.org/seed")]),
                _fetcher(web), robots_rules(robots),
                rounds=2, budget_per_host=2)
    # round 1 fetches only the 2 url-ascending children
    r1 = sorted(r["url"] for r in
                res.pages.where(F.col("crawl_round") == 1).collect())
    assert r1 == ["https://h.org/k/0", "https://h.org/k/1"]


def test_budget_dropped_urls_defer_and_resurface(spark):
    """Round-4 advice regression: a url dropped by the per-host budget
    is DEFERRED — left out of seen — so a later round's discovery
    re-surfaces it. (Before the fix it entered seen at discovery time
    and was permanently unfetchable.) Robots-disallowed urls keep the
    opposite, permanent-verdict semantics."""
    def page(links):
        return ("<html><body>" +
                "".join(f'<a href="{h}">x</a>' for h in links) +
                "</body></html>").encode()

    # seed → a,b,c (budget 2 plans a,b; c deferred); a re-links c
    web = spark.createDataFrame([
        Row(url="https://h.org/seed",
            html=bytearray(page(["/a", "/b", "/c"]))),
        Row(url="https://h.org/a", html=bytearray(page(["/c"]))),
        Row(url="https://h.org/b", html=bytearray(page([]))),
        Row(url="https://h.org/c", html=bytearray(page([]))),
    ])
    rules = robots_rules(spark.createDataFrame(
        [Row(host="h.org", body="User-agent: *\nAllow: /")]))
    res = crawl(spark.createDataFrame([Row(url="https://h.org/seed")]),
                _fetcher(web), rules, rounds=3, budget_per_host=2)
    got = {(r["url"], r["crawl_round"]) for r in res.pages.collect()}
    assert got == {
        ("https://h.org/seed", 0),
        ("https://h.org/a", 1), ("https://h.org/b", 1),
        ("https://h.org/c", 2),   # deferred in round 1, re-surfaced by a
    }
    seen = {r["url_norm"] for r in res.seen.collect()}
    # every decided url is seen; nothing extra
    assert seen == {"https://h.org/seed", "https://h.org/a",
                    "https://h.org/b", "https://h.org/c"}


def test_plan_frontier_keep_dropped_flags(spark):
    """keep_dropped=True returns the whole frontier flagged; filtered to
    planned it is row-identical to the default output."""
    from quickner_spark.kg.robots import plan_frontier

    rules = robots_rules(spark.createDataFrame(
        [Row(host="h.org", body="User-agent: *\nDisallow: /private/")]))
    urls = spark.createDataFrame(
        [Row(url=f"https://h.org/p{i}") for i in range(4)]
        + [Row(url="https://h.org/private/x")])
    dec = plan_frontier(urls, rules, budget_per_host=2, keep_dropped=True)
    rows = {r["url"]: (r["allowed"], r["planned"], r["fetch_rank"],
                       r["fetch_offset_s"]) for r in dec.collect()}
    assert rows["https://h.org/p0"] == (True, True, 1, 0.0)
    assert rows["https://h.org/p1"] == (True, True, 2, 1.0)
    # over-budget: allowed, ranked, not planned, no offset
    assert rows["https://h.org/p2"] == (True, False, 3, None)
    assert rows["https://h.org/p3"] == (True, False, 4, None)
    # disallowed: no rank at all
    assert rows["https://h.org/private/x"] == (False, False, None, None)
    default = plan_frontier(urls, rules, budget_per_host=2)
    flagged = dec.where(F.col("planned")).drop("allowed", "planned") \
                 .select(*default.columns)
    assert sorted(map(tuple, default.collect())) == \
        sorted(map(tuple, flagged.collect()))


def test_discovered_urls_filters_nonhierarchical(spark):
    html = (b'<html><a href="mailto:x@y.z">m</a>'
            b'<a href="javascript:void(0)">j</a>'
            b'<a href="/ok">k</a></html>')
    df = spark.createDataFrame([Row(url="https://h.org/p", html=bytearray(html))])
    got = [r["url"] for r in discovered_urls(df).collect()]
    assert got == ["https://h.org/ok"]


def test_crawl_to_kg_end_to_end(spark, tmp_path):
    """The crawl operating mode end-to-end: BFS-crawl a chained synthetic
    messy web, feed the fetched pages into build_kg_pipeline with the
    real-web extractor, and get the SAME KG tables as building directly
    over the full corpus — crawl discovery loses nothing and the
    appended (link-dense, classifier-dropped) nav chrome never leaks
    into extraction."""
    from quickner_spark.kg import corpus
    from quickner_spark.kg.crawl import crawl
    from quickner_spark.kg.pipeline import build_kg_pipeline
    from quickner_spark.kg.robots import robots_rules
    from quickner_spark.kg.webextract import extract_text_web

    n = 8
    pages = corpus.synth_pages(spark, n, html_style="messy")
    idx = F.regexp_extract("url", "/doc/([0-9]+)$", 1).cast("long")
    nxt = pages.select((idx - 1).alias("i"), F.col("url").alias("next_url"))
    # chain page i -> page i+1 with a short (classifier-dropped) nav div
    web = (pages.withColumn("i", idx).join(nxt, "i", "left")
           .withColumn("html", F.when(
               F.col("next_url").isNotNull(),
               F.concat(
                   F.regexp_replace(F.decode("html", "UTF-8"),
                                    "</body>", ""),
                   F.lit('<div class="n"><a href="'), F.col("next_url"),
                   F.lit('">next</a></div></body>')).cast("binary"))
            .otherwise(F.col("html")))
           .drop("i", "next_url")).cache()
    hosts = web.select(
        F.regexp_extract("url", "^https://([^/]+)/", 1).alias("host")
    ).distinct()
    rules = robots_rules(hosts.withColumn(
        "body", F.lit("User-agent: *\nAllow: /")))
    seed = web.orderBy(idx.asc()).limit(1).select("url")

    def fetch(plan):
        return plan.select("url").join(web, "url").select(
            "url", "warc_ts", "html", "text", "lang")

    res = crawl(seed, fetch, rules, rounds=n)
    assert res.pages.count() == n  # the whole chain got crawled
    crawled_path = str(tmp_path / "crawled")
    res.pages.drop("crawl_round").write.parquet(crawled_path)
    direct_path = str(tmp_path / "direct")
    web.write.parquet(direct_path)

    gaz = corpus.synth_gazetteer(999, 42)
    kgs = {}
    for name, path in (("crawled", crawled_path), ("direct", direct_path)):
        p = build_kg_pipeline(spark, str(tmp_path / (name + "_kg")),
                              path, gaz, corpus.PREDICATES,
                              extractor=extract_text_web)
        p.run()
        kgs[name] = p
    for table in ("triples", "nodes", "edges"):
        a = kgs["crawled"].table(table)
        b = kgs["direct"].table(table)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, \
            table
    web.unpersist()


def test_crawl_host_budget_closes_harvest_loop(spark):
    """The rank-guided loop end-to-end: crawl once → host graph →
    weighted PageRank → allocate_budget → recrawl under the per-host
    budgets. The heavily-cited host earns a bigger budget; the
    de-prioritized host's round frontier is capped at its budget."""
    from quickner_spark.kg.robots import allocate_budget
    from quickner_spark.kg.weblinks import extract_links, host_graph
    from quickner_spark.operators.graph import pagerank

    def page(links):
        return ("<html><body>" +
                "".join(f'<a href="{h}">x</a>' for h in links) +
                "</body></html>").encode()

    # crawler.org seeds 3 spoke pages + 1 hub page; every spoke page
    # cites all 3 hub pages — hub.org ends up far more cited than
    # spoke.org
    hub = [f"https://hub.org/p{i}" for i in (1, 2, 3)]
    web = {
        "https://crawler.org/seed": page(
            ["https://spoke.org/s1", "https://spoke.org/s2",
             "https://spoke.org/s3", hub[0]]),
        "https://spoke.org/s1": page(hub),
        "https://spoke.org/s2": page(hub),
        "https://spoke.org/s3": page(hub),
        hub[0]: page([]), hub[1]: page([]), hub[2]: page([]),
    }
    web_df = spark.createDataFrame(
        [Row(url=u, html=bytearray(b)) for u, b in web.items()])
    robots = spark.createDataFrame(
        [Row(host="crawler.org", body="User-agent: *\nAllow: /")])
    rules = robots_rules(robots)
    seeds = spark.createDataFrame([Row(url="https://crawler.org/seed")])

    first = crawl(seeds, _fetcher(web_df), rules, rounds=3)
    hg = host_graph(extract_links(first.pages.select("url", "html")))
    hr = pagerank(hg, src="src_host", dst="dst_host", weight="n_links",
                  iters=3).select(F.col("node").alias("host"), "rank")
    budgets = allocate_budget(hr, total_budget=8, min_budget=1)
    b = {r["host"]: r["budget"] for r in budgets.collect()}
    assert b["hub.org"] > b["spoke.org"]  # 9 citations vs 3
    assert b["spoke.org"] == 2  # floor(8 * rank-share) under this graph

    second = crawl(seeds, _fetcher(web_df), rules, rounds=3,
                   host_budget=budgets)
    per_host = {r["host"]: r["count"] for r in
                second.pages.withColumn(
                    "host", F.regexp_extract("url", "https://([^/]+)", 1))
                .groupBy("host").count().collect()}
    # spoke.org's round-1 frontier (3 urls) is capped at its budget;
    # hub.org is never capped (frontier <= its budget each round)
    assert per_host["spoke.org"] == b["spoke.org"]
    assert per_host["hub.org"] == 3
