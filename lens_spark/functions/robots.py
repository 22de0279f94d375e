"""robots.txt (RFC 9309) parsing and URL permission filtering.

A crawl-derived corpus is expected to honor robots rules — retroactive
filtering against the robots.txt captures that ship INSIDE the crawl
(CommonCrawl stores them as ordinary response records) is a standard
corpus-hygiene step.  Two halves:

- :func:`robots_rules` — parse robots.txt response bodies (e.g. the
  ``target_uri`` ends in ``/robots.txt`` slice of a
  :func:`~lens_spark.sources.warc.warc_records` table) into a RULES
  table ``(host, rule, allow, priority, pattern)``: RFC 9309 group
  selection (most-specific user-agent token, ``*`` fallback), one row
  per allow/disallow line, ``pattern`` the rule pre-compiled to an
  RE2-portable regex (``*`` → ``.*``, ``$`` end anchor) AT PARSE TIME
  so the match side never runs Python.
- :func:`robots_filter` — keep corpus URLs permitted for the agent:
  join on host (a domain's rule count is tiny and bounded, so the
  explode is O(urls · rules-per-host), never corpus²), match with the
  built-in ``regexp_like`` against the pattern COLUMN, pick the
  winning rule per URL by RFC precedence (longest rule string wins,
  ``allow`` wins length ties), keep URLs with no matching rule or no
  rules at all (robots default-allow).

100 TB shape: parsing is Arrow-batched ``mapInPandas`` over the tiny
robots slice; matching is one equi-join on host + whole-stage-codegen
regexp + one groupBy max(struct) per URL — no window over the corpus,
no Python in the hot path, broadcast of the rules side left to AQE.

The reference has no crawl tier (content arrives by hash, v2.go) —
training-data layer addition; rule semantics follow the public RFC
9309 / Google REP documentation.
"""
from __future__ import annotations

import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "parse_robots_txt",
    "rule_pattern",
    "robots_rules",
    "robots_filter",
]

ROBOTS_RULES = StructType([
    StructField("host", StringType()),
    StructField("rule", StringType()),
    StructField("allow", BooleanType()),
    StructField("priority", IntegerType()),
    StructField("pattern", StringType()),
])


def rule_pattern(rule: str) -> str:
    """Compile one robots path rule to an RE2-portable anchored regex:
    ``*`` matches any char run, a trailing ``$`` anchors the end,
    everything else is literal.  Prefix-match semantics: no trailing
    anchor unless ``$``."""
    out = ["^"]
    body = rule
    anchored = body.endswith("$")
    if anchored:
        body = body[:-1]
    for ch in body:
        out.append(".*" if ch == "*" else re.escape(ch))
    if anchored:
        out.append("$")
    return "".join(out)


def parse_robots_txt(
    text: str, agent: str
) -> list[tuple[str, bool]]:
    """RFC 9309 parse: return the (rule, allow) lines of the group
    that governs ``agent`` — the group(s) whose user-agent token is
    the LONGEST prefix of the agent name, falling back to the ``*``
    group.  Rules with empty paths are ignored (RFC: an empty pattern
    matches nothing).  Line comments (#) stripped; unknown directives
    skipped."""
    agent_l = agent.lower()
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_body:
                current = []
                in_group_body = False
            tok = value.lower()
            current.append(tok)
            groups.setdefault(tok, [])
        elif key in ("allow", "disallow"):
            in_group_body = True
            if not current or not value:
                continue
            for tok in current:
                groups[tok].append((value, key == "allow"))
        else:
            # crawl-delay/sitemap/etc: group body continues
            in_group_body = True
    best: str | None = None
    for tok in groups:
        if tok != "*" and agent_l.startswith(tok):
            if best is None or len(tok) > len(best):
                best = tok
    if best is None and "*" in groups:
        best = "*"
    return [] if best is None else groups[best]


def robots_rules(
    df: DataFrame,
    url_col: str,
    body_col: str,
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt bodies into the rules table (see module
    docstring).  ``url_col`` is the robots.txt capture URL (its host
    scopes the rules); ``body_col`` the response payload (binary or
    string)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict[str, Any]] = []
        for b in it:
            for url, body in zip(b[url_col], b[body_col]):
                if body is None or url is None:
                    continue
                if isinstance(body, (bytes, bytearray, memoryview)):
                    text = bytes(body).decode("latin-1")
                else:
                    text = str(body)
                m = re.match(
                    r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", str(url).lower()
                )
                if not m:
                    continue
                host = m.group(1)
                for rule, allow in parse_robots_txt(text, agent):
                    rows.append({
                        "host": host,
                        "rule": rule,
                        "allow": allow,
                        "priority": len(rule),
                        "pattern": rule_pattern(rule),
                    })
        yield pd.DataFrame(
            rows, columns=[f.name for f in ROBOTS_RULES.fields]
        )

    return df.select(url_col, body_col).mapInPandas(
        batches, ROBOTS_RULES
    ).dropDuplicates(["host", "rule", "allow"])


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str,
    id_col: str,
) -> DataFrame:
    """Keep rows whose URL the rules permit (RFC 9309 precedence:
    longest matching rule wins, allow wins ties; no matching rule or
    no rules for the host → allowed).

    Shape: the corpus never shuffles — an INNER join against the rules
    (AQE broadcasts the small side) restricts work to rule-bearing
    hosts; the winner groupBy runs on that restricted slice; only the
    BLOCKED id set (small: most hosts publish no rules, most rules
    allow) comes back, as an anti-join."""
    from lens_spark.functions.urls import url_parse

    p = url_parse(F.col(url_col))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    affected = urls.select(
        F.col(id_col), p["host"].alias("__host"), path.alias("__path")
    ).join(rules, F.col("__host") == rules["host"], "inner")
    # winner per URL: max (priority, allow) over matching rules —
    # allow=true sorts above allow=false at equal priority
    blocked = (
        affected.withColumn(
            "__hit",
            F.regexp_like(F.col("__path"), F.col("pattern")),
        )
        .groupBy(id_col)
        .agg(
            F.max(
                F.when(
                    F.col("__hit"),
                    F.struct(
                        F.col("priority").alias("p"),
                        F.col("allow").alias("a"),
                    ),
                )
            ).alias("w")
        )
        .filter(F.col("w").isNotNull() & ~F.col("w.a"))
        .select(id_col)
    )
    return urls.join(blocked, on=id_col, how="left_anti")