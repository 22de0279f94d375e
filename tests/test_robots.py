"""robots.txt parsing + RFC 9309 precedence filtering."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark.functions.robots import (
    parse_robots_txt,
    robots_filter,
    robots_rules,
    rule_pattern,
)

ROBOTS = """\
# corpus fixture
User-agent: googlebot
User-agent: lensbot
Disallow: /private/
Allow: /private/ok*
Crawl-delay: 3

User-agent: *
Disallow: /
"""


def test_group_selection_specific_beats_star():
    rules = parse_robots_txt(ROBOTS, "lensbot/1.0")
    assert ("/private/", False) in rules
    assert ("/private/ok*", True) in rules
    assert ("/", False) not in rules
    # unknown agent falls back to *
    assert parse_robots_txt(ROBOTS, "otherbot") == [("/", False)]


def test_stacked_agents_share_group():
    assert parse_robots_txt(ROBOTS, "googlebot") == \
        parse_robots_txt(ROBOTS, "lensbot")


def test_empty_disallow_ignored_and_comments():
    txt = "User-agent: *\nDisallow:\nAllow: /a # trailing\n"
    assert parse_robots_txt(txt, "anybot") == [("/a", True)]


def test_rule_pattern_wildcards():
    assert rule_pattern("/p/*.html$") == r"^/p/.*\.html$"
    assert rule_pattern("/a b") == r"^/a\ b"


def test_filter_precedence(spark):
    robots = spark.createDataFrame(
        [("https://ex.com/robots.txt", ROBOTS.encode("utf-8"))],
        "url string, body binary",
    )
    rules = robots_rules(robots, "url", "body", agent="lensbot")
    got = {(r.rule, r.allow, r.priority) for r in rules.collect()}
    assert got == {("/private/", False, 9), ("/private/ok*", True, 12)}
    urls = spark.createDataFrame(
        [
            (1, "https://ex.com/private/x"),      # disallowed
            (2, "https://ex.com/private/okay"),   # allow wins (longer)
            (3, "https://ex.com/public"),         # no rule -> allowed
            (4, "https://other.com/private/x"),   # no rules -> allowed
            (5, "https://ex.com/"),               # no rule -> allowed
        ],
        "doc_id long, url string",
    )
    kept = sorted(
        r.doc_id
        for r in robots_filter(urls, rules, "url", "doc_id").collect()
    )
    assert kept == [2, 3, 4, 5]


def test_filter_allow_wins_length_tie(spark):
    txt = "User-agent: *\nDisallow: /d/\nAllow: /d/*\n"
    robots = spark.createDataFrame(
        [("https://t.com/robots.txt", txt.encode())],
        "url string, body binary",
    )
    rules = robots_rules(robots, "url", "body")
    urls = spark.createDataFrame(
        [(1, "https://t.com/d/x")], "doc_id long, url string")
    # Allow /d/* (prio 4) beats Disallow /d/ (prio 3)
    assert robots_filter(urls, rules, "url", "doc_id").count() == 1


def test_filter_plan_no_python_no_cartesian(spark):
    robots = spark.createDataFrame(
        [("https://ex.com/robots.txt", b"User-agent: *\nDisallow: /x")],
        "url string, body binary",
    )
    rules = robots_rules(robots, "url", "body")
    urls = spark.createDataFrame(
        [(1, "https://ex.com/a")], "doc_id long, url string")
    plan = robots_filter(
        urls, rules, "url", "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # the rules PARSE is python (tiny slice); the corpus-side match
    # half must stay JVM: the probe/join/verdict subtree carries no
    # Python eval over the urls relation
    assert plan.count("MapInPandas") == 1
