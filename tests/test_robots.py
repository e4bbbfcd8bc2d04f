"""robots.txt parsing + frontier filtering (kg/robots.py)."""

from __future__ import annotations

from pyspark.sql import Row

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


def test_named_agent_sees_its_group_and_star(spark):
    got = _rules(spark, agent="GPTBot")  # case-insensitive token match
    assert ("disallow", "/") in got
    assert ("disallow", "/private/") in got  # * groups always govern


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
