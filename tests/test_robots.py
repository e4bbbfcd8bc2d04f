"""robots.txt parsing + frontier filtering (kg/robots.py)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from quickner_spark.kg.robots import frontier_allowed, robots_rules

BODY = """# crawl policy
User-agent: gptbot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/public/
Disallow:

User-agent: newsbot
User-agent: *
Allow: /news/
"""


def _rules(spark, body=BODY, agent="*"):
    df = spark.createDataFrame([Row(host="h.org", body=body)])
    return {(r["rule"], r["path"])
            for r in robots_rules(df, agent=agent).collect()}


def test_star_group_rules_extracted(spark):
    assert _rules(spark) == {
        ("disallow", "/private/"), ("disallow", "/tmp"),
        ("allow", "/private/public/"),
        ("allow", "/news/"),  # consecutive-UA group names * too
    }
    # the gptbot-only group is invisible to a * caller; empty Disallow
    # imposes nothing and is dropped


def test_named_agent_sees_only_its_group(spark):
    """RFC 9309 §2.2.1 most-specific-match: gptbot has its own group, so
    the * groups are IGNORED for it (case-insensitive token match)."""
    got = _rules(spark, agent="GPTBot")
    assert got == {("disallow", "/")}


def test_agent_without_exact_group_falls_back_to_star(spark):
    """A named agent with NO exactly-matching group obeys the * groups
    (RFC 9309 §2.2.1 fallback)."""
    got = _rules(spark, agent="SomeOtherBot")
    assert got == _rules(spark)  # identical to the * caller's view
    assert ("disallow", "/") not in got  # gptbot's group stays invisible


def test_rules_before_any_group_are_dropped(spark):
    assert _rules(spark, body="Disallow: /x\nUser-agent: *\nAllow: /y") \
        == {("allow", "/y")}


def test_frontier_precedence(spark):
    rules = robots_rules(
        spark.createDataFrame([Row(host="h.org", body=BODY)]))
    urls = spark.createDataFrame([Row(url=u) for u in [
        "https://h.org/",                       # no matching rule
        "https://h.org/private/a",              # disallowed
        "https://h.org/private/public/a",       # longest match = allow
        "https://h.org/tmp.html",               # plain prefix: /tmp*
        "https://h.org/news/today#frag",        # fragment ignored
        "https://other.org/private/a",          # host without rules
    ]])
    got = {r["url"]: r["allowed"]
           for r in frontier_allowed(urls, rules).collect()}
    assert got == {
        "https://h.org/": True,
        "https://h.org/private/a": False,
        "https://h.org/private/public/a": True,
        "https://h.org/tmp.html": False,
        "https://h.org/news/today#frag": True,
        "https://other.org/private/a": True,
    }


def test_wildcard_star_matches_any_octets(spark):
    """RFC 9309 §2.2.3: ``*`` in a rule path matches any octet
    sequence (crawlers MUST support it)."""
    rules = robots_rules(spark.createDataFrame([Row(
        host="h.org",
        body="User-agent: *\nDisallow: /*/print\nDisallow: /cgi*bin")]))
    urls = spark.createDataFrame([Row(url="https://h.org" + p) for p in [
        "/doc/print",        # * spans 'doc'
        "/a/b/print",        # * spans multiple segments
        "/doc/print/x",      # prefix semantics still apply after match
        "/doc/printable",    # ditto — rule is a prefix, not anchored
        "/print",            # * must still leave the literal tail intact
        "/cgibin/q",         # * matches the EMPTY sequence
        "/cgi-bin/q",        # and a one-octet sequence
    ]])
    got = {r["url"].removeprefix("https://h.org"): r["allowed"]
           for r in frontier_allowed(urls, rules).collect()}
    assert got == {
        "/doc/print": False, "/a/b/print": False, "/doc/print/x": False,
        "/doc/printable": False, "/print": True,
        "/cgibin/q": False, "/cgi-bin/q": False,
    }


def test_wildcard_trailing_dollar_anchors(spark):
    """Trailing ``$`` anchors the rule at the url end; a ``$`` anywhere
    else is a literal octet (REP-matcher convention). The matched
    string is path+query, so a query defeats an anchored rule."""
    rules = robots_rules(spark.createDataFrame([Row(
        host="h.org",
        body="User-agent: *\nDisallow: /*.php$\nDisallow: /a$b")]))
    urls = spark.createDataFrame([Row(url="https://h.org" + p) for p in [
        "/index.php", "/x/y.php", "/index.php?q=1", "/index.phpx",
        "/a$b/c", "/a-b",
    ]])
    got = {r["url"].removeprefix("https://h.org"): r["allowed"]
           for r in frontier_allowed(urls, rules).collect()}
    assert got == {
        "/index.php": False, "/x/y.php": False,
        "/index.php?q=1": True, "/index.phpx": True,
        "/a$b/c": False, "/a-b": True,
    }


def test_wildcard_precedence_counts_raw_rule_octets(spark):
    """Longest-rule precedence counts the RAW rule text, ``*``/``$``
    included (the reference REP-matcher tiebreak): ``Allow: /page``
    (5 octets) beats ``Disallow: /*e`` (3), while ``Disallow: /pag*``
    (5, loses the equal-length tie to Allow) and ``Disallow: /page*``
    (6) beats it."""
    def verdict(body, url="https://h.org/page"):
        rules = robots_rules(spark.createDataFrame(
            [Row(host="h.org", body="User-agent: *\n" + body)]))
        urls = spark.createDataFrame([Row(url=url)])
        return frontier_allowed(urls, rules).head()["allowed"]

    assert verdict("Allow: /page\nDisallow: /*e") is True
    assert verdict("Allow: /page\nDisallow: /pag*") is True
    assert verdict("Allow: /page\nDisallow: /page*") is False


def test_regex_metachars_in_rule_paths_stay_literal(spark):
    """Rule paths carrying regex metacharacters must not leak into the
    compiled pattern: only ``*`` and trailing ``$`` are special."""
    rules = robots_rules(spark.createDataFrame([Row(
        host="h.org",
        body="User-agent: *\nDisallow: /a(b)+c?d.e|f[g]\nDisallow: /x*^y")]))
    urls = spark.createDataFrame([Row(url="https://h.org" + p) for p in [
        "/a(b)+c?d.e|f[g]h",   # literal match of every metachar
        "/abbcde|f[g]",        # would match if (b)+ / ? / . were regex
        "/x123^y",             # ^ literal after the * wildcard
        "/x123y",              # would match if ^ vanished as an anchor
    ]])
    got = {r["url"].removeprefix("https://h.org"): r["allowed"]
           for r in frontier_allowed(urls, rules).collect()}
    assert got == {
        "/a(b)+c?d.e|f[g]h": False, "/abbcde|f[g]": True,
        "/x123^y": False, "/x123y": True,
    }


def test_allow_beats_disallow_at_equal_length(spark):
    rules = robots_rules(spark.createDataFrame([Row(
        host="h.org",
        body="User-agent: *\nDisallow: /a/\nAllow: /b/")]))
    extra = spark.createDataFrame(
        [Row(host="h.org", body="User-agent: *\nAllow: /a/")])
    rules = rules.unionByName(robots_rules(extra))
    urls = spark.createDataFrame([Row(url="https://h.org/a/x")])
    assert frontier_allowed(urls, rules).head()["allowed"] is True


def test_empty_path_is_root(spark):
    rules = robots_rules(spark.createDataFrame(
        [Row(host="h.org", body="User-agent: *\nDisallow: /")]))
    urls = spark.createDataFrame([Row(url="https://h.org")])
    assert frontier_allowed(urls, rules).head()["allowed"] is False


def test_input_columns_preserved(spark):
    rules = robots_rules(spark.createDataFrame(
        [Row(host="h.org", body="User-agent: *\nDisallow: /x")]))
    urls = spark.createDataFrame(
        [Row(url="https://h.org/x", depth=3, src="seed")])
    r = frontier_allowed(urls, rules).head()
    assert (r["depth"], r["src"], r["allowed"]) == (3, "seed", False)


DELAY_BODY = """User-agent: megabot
Crawl-delay: 30

User-agent: *
Crawl-delay: 2.5
Disallow: /private/

User-agent: newsbot
User-agent: *
Crawl-delay: 1
Crawl-delay: junk

Sitemap: https://h.org/sitemap.xml
sitemap: https://h.org/extra.xml  # comment stripped
"""


def test_crawl_delays_min_across_governing_groups(spark):
    from quickner_spark.kg.robots import crawl_delays

    df = spark.createDataFrame([Row(host="h.org", body=DELAY_BODY),
                                Row(host="none.org", body="User-agent: *\nDisallow: /x/")])
    got = {(r["host"], r["delay_s"]) for r in crawl_delays(df).collect()}
    # megabot's 30 is invisible to *, junk drops, min(2.5, 1) = 1.0;
    # a host with no delay directive is absent
    assert got == {("h.org", 1.0)}
    got = crawl_delays(df, agent="megabot").collect()
    # megabot has its own group, so the *-groups' 2.5/1 are ignored
    # (§2.2.1 precedence) and its own 30 governs
    assert {(r["host"], r["delay_s"]) for r in got} == {("h.org", 30.0)}
    # an agent with no exact group falls back to the *-tier min
    got = crawl_delays(df, agent="otherbot").collect()
    assert {(r["host"], r["delay_s"]) for r in got} == {("h.org", 1.0)}


def test_group_boundaries_span_all_directive_kinds(spark):
    """Round-4 advice regression: group boundaries are computed over the
    FULL directive sequence, not the pass-filtered one. A Crawl-delay
    line between two User-agent lines still separates their groups in
    the rules pass, and Allow/Disallow lines still separate groups in
    the delays pass."""
    from quickner_spark.kg.robots import crawl_delays

    # rules pass: before the fix the Crawl-delay line was invisible, the
    # * and ahrefsbot UA lines fused into one group, and EVERY agent
    # inherited 'Disallow: /'
    body = ("User-agent: *\nCrawl-delay: 10\n"
            "User-agent: ahrefsbot\nDisallow: /")
    assert _rules(spark, body=body) == set()          # * group: no rules
    assert _rules(spark, body=body, agent="ahrefsbot") == \
        {("disallow", "/")}
    # delays pass: before the fix the Disallow line was invisible, the
    # two groups fused, and megabot's 30 leaked to the * caller
    body2 = ("User-agent: *\nDisallow: /x\n"
             "User-agent: megabot\nCrawl-delay: 30")
    df = spark.createDataFrame([Row(host="h.org", body=body2)])
    assert crawl_delays(df).collect() == []           # * group: no delay
    assert {(r["host"], r["delay_s"])
            for r in crawl_delays(df, agent="megabot").collect()} == \
        {("h.org", 30.0)}


def test_robots_sitemaps_global_scan(spark):
    from quickner_spark.kg.robots import robots_sitemaps

    df = spark.createDataFrame([Row(host="h.org", body=DELAY_BODY)])
    got = {(r["host"], r["sitemap"]) for r in robots_sitemaps(df).collect()}
    assert got == {("h.org", "https://h.org/sitemap.xml"),
                   ("h.org", "https://h.org/extra.xml")}


def test_plan_frontier_order_budget_offsets(spark):
    from quickner_spark.kg.robots import (crawl_delays, plan_frontier,
                                          robots_rules)

    robots = spark.createDataFrame([
        Row(host="h.org", body=DELAY_BODY),
        Row(host="fast.org", body="User-agent: *\nAllow: /"),
    ])
    rules, delays = robots_rules(robots), crawl_delays(robots)
    urls = spark.createDataFrame(
        [Row(url="https://h.org/private/x", prio=9),   # disallowed
         Row(url="https://h.org/a", prio=1),
         Row(url="https://h.org/b", prio=7),
         Row(url="https://h.org/c", prio=7),           # tie -> url asc
         Row(url="https://fast.org/only", prio=0)])
    got = {r["url"]: (r["fetch_rank"], r["fetch_offset_s"])
           for r in plan_frontier(urls, rules, delays,
                                  priority_col="prio").collect()}
    assert "https://h.org/private/x" not in got
    # h.org delay 1.0; prio desc then url asc
    assert got["https://h.org/b"] == (1, 0.0)
    assert got["https://h.org/c"] == (2, 1.0)
    assert got["https://h.org/a"] == (3, 2.0)
    # fast.org has no Crawl-delay -> default_delay 1.0
    assert got["https://fast.org/only"] == (1, 0.0)
    # budget caps ranks; no priority -> url-ascending order
    got = {r["url"]: r["fetch_rank"]
           for r in plan_frontier(urls, rules, delays,
                                  budget_per_host=2).collect()}
    assert got == {"https://h.org/a": 1, "https://h.org/b": 2,
                   "https://fast.org/only": 1}


def test_plan_frontier_host_budget_overrides_uniform(spark):
    from pyspark.sql import Row

    from quickner_spark.kg.robots import plan_frontier, robots_rules

    rules = robots_rules(spark.createDataFrame(
        [Row(host="a.org", body="User-agent: *\nAllow: /")]))
    urls = spark.createDataFrame(
        [(f"https://{h}/p{i}",) for h in ("a.org", "b.org", "c.org")
         for i in range(5)], "url string")
    hb = spark.createDataFrame([("a.org", 1), ("b.org", 3)],
                               "host string, budget int")
    # host_budget row overrides; b.org capped at 3; c.org falls back to
    # budget_per_host=2
    got = (plan_frontier(urls, rules, budget_per_host=2, host_budget=hb)
           .groupBy("host").count().collect())
    assert {r["host"]: r["count"] for r in got} == \
        {"a.org": 1, "b.org": 3, "c.org": 2}
    # without the uniform fallback, hosts absent from the table are
    # uncapped
    got2 = (plan_frontier(urls, rules, host_budget=hb)
            .groupBy("host").count().collect())
    assert {r["host"]: r["count"] for r in got2} == \
        {"a.org": 1, "b.org": 3, "c.org": 5}


def test_allocate_budget_proportional_with_floor(spark):
    from quickner_spark.kg.robots import allocate_budget

    hr = spark.createDataFrame(
        [("big.org", 600.0), ("mid.org", 300.0), ("tiny.org", 100.0),
         ("zero.org", 0.0), ("neg.org", -5.0)],
        "host string, rank double")
    got = {r["host"]: r["budget"]
           for r in allocate_budget(hr, total_budget=100).collect()}
    # shares over the POSITIVE-rank total (1000): 60/30/10; zero and
    # negative ranks get min_budget
    assert got == {"big.org": 60, "mid.org": 30, "tiny.org": 10,
                   "zero.org": 1, "neg.org": 1}
    got4 = {r["host"]: r["budget"]
            for r in allocate_budget(hr, total_budget=100,
                                     min_budget=4).collect()}
    assert got4["tiny.org"] == 10 and got4["zero.org"] == 4
    import pytest
    with pytest.raises(ValueError, match="must be positive"):
        allocate_budget(hr, total_budget=0)


def test_plan_frontier_keep_dropped_host_budget_table(spark):
    """keep_dropped under the host_budget TABLE path (not just the
    uniform cap): per-host caps flag the right rows as unplanned, hosts
    absent from the table fall back to budget_per_host (or uncapped),
    and filtering to planned is row-identical to the default output."""
    from pyspark.sql import Row

    from quickner_spark.kg.robots import plan_frontier, robots_rules

    rules = robots_rules(spark.createDataFrame(
        [Row(host="a.org", body="User-agent: *\nDisallow: /private/")]))
    urls = spark.createDataFrame(
        [(f"https://{h}/p{i}",) for h in ("a.org", "b.org", "c.org")
         for i in range(4)] + [("https://a.org/private/x",)],
        "url string")
    hb = spark.createDataFrame([("a.org", 1), ("b.org", 3)],
                               "host string, budget int")
    dec = plan_frontier(urls, rules, budget_per_host=2, host_budget=hb,
                        keep_dropped=True)
    rows = {r["url"]: (r["allowed"], r["planned"]) for r in dec.collect()}
    # whole frontier present, flags per host-cap
    assert len(rows) == 13
    assert rows["https://a.org/p0"] == (True, True)
    assert rows["https://a.org/p1"] == (True, False)      # a capped at 1
    assert rows["https://b.org/p2"] == (True, True)       # b capped at 3
    assert rows["https://b.org/p3"] == (True, False)
    assert rows["https://c.org/p1"] == (True, True)       # fallback 2
    assert rows["https://c.org/p2"] == (True, False)
    assert rows["https://a.org/private/x"] == (False, False)
    default = plan_frontier(urls, rules, budget_per_host=2, host_budget=hb)
    flagged = dec.where(F.col("planned")).drop("allowed", "planned") \
                 .select(*default.columns)
    assert sorted(map(tuple, default.collect())) == \
        sorted(map(tuple, flagged.collect()))


def test_plan_frontier_keep_dropped_adds_no_shuffles(spark):
    """The flagged decision path must not add shuffles vs the default
    path: same hash-partitioning Exchange count (the robots longest-match
    sub-pipeline and the one host-keyed politeness window — keep_dropped
    only widens the window input and adds flag columns), and the budget
    join stays a BroadcastExchange in both modes."""
    from pyspark.sql import Row

    from quickner_spark.kg.robots import plan_frontier, robots_rules

    rules = robots_rules(spark.createDataFrame(
        [Row(host="a.org", body="User-agent: *\nAllow: /")]))
    urls = spark.createDataFrame(
        [(f"https://a.org/p{i}",) for i in range(8)], "url string")
    hb = spark.createDataFrame([("a.org", 5)], "host string, budget int")
    counts, plans = {}, {}
    for kd in (False, True):
        df = plan_frontier(urls, rules, budget_per_host=2, host_budget=hb,
                           keep_dropped=kd)
        plan = df._jdf.queryExecution().executedPlan().toString()
        plans[kd] = plan
        counts[kd] = sum(1 for line in plan.splitlines()
                         if "Exchange hashpartitioning" in line)
        assert "BroadcastExchange" in plan  # budget join never shuffles
    assert counts[True] == counts[False], \
        f"{counts}\n--- default ---\n{plans[False]}" \
        f"\n--- keep_dropped ---\n{plans[True]}"
