"""URL parsing and per-domain corpus governance — pure Catalyst.

A web-scale training corpus is keyed by URL: quality filtering,
blocklists, and sampling all operate on the *registered domain* (the
"pay-level domain": example.co.uk, not www.example.co.uk). These
operators parse URLs and cap per-domain document counts without any
Python in the plan:

- `url_parse` — scheme/host/port/path via one regexp over the column;
  map-only, no shuffle, whole-stage-codegen friendly.
- `registered_domain` — public-suffix-LITE heuristic: the last two
  host labels, or the last three when the second-to-last label is a
  generic second-level registrar label (co/com/net/org/gov/ac/edu/mil)
  under a 2-letter ccTLD (the co.uk / com.au / ac.jp family). The full
  public-suffix list is a data file, not an algorithm — production
  swaps in the PSL as a broadcast lookup table; the heuristic covers
  the dominant cases and is what C4/CCNet-style pipelines shipped.
- `domain_caps` — exact-k deterministic cap per registered domain
  (delegates to mixing.stratified_sample: md5-keyed, executor-count
  independent, two-phase so the window never sorts a whole domain —
  the property that matters when one domain holds 10^9 docs).

All string math is regexp/split/slice built-ins so a DuckDB oracle can
mirror it exactly (driver rows `url_parse`, `domain_caps`).

Reference linkage: the reference indexes documents by IPFS hash and
has no URL tier (engine/engine.go Document.Name is an opaque name);
this module is part of the training-data tier the Spark build adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_parse",
    "registered_domain",
    "domain_caps",
    "url_blocklist_filter",
    "GENERIC_SLD",
]

# generic second-level registrar labels under 2-letter ccTLDs
GENERIC_SLD = ("co", "com", "net", "org", "gov", "ac", "edu", "mil")

# scheme://host[:port][/path...]  — query/fragment folded into path's
# terminator set; host = everything up to :/?#
_URL_RE = r"^([a-z][a-z0-9+.-]*)://([^/:?#]+)(?::([0-9]+))?([^?#]*)"


def url_parse(col: Column) -> Column:
    """Struct(scheme, host, port, path) from a URL column. Unparseable
    rows yield empty-string scheme/host/path and port −1 (sentinels,
    not NULL — the nullable-int hash-compare rule). Host is
    lowercased; port −1 also means "no explicit port"."""
    u = F.lower(F.trim(col))
    scheme = F.regexp_extract(u, _URL_RE, 1)
    host = F.regexp_extract(u, _URL_RE, 2)
    port_s = F.regexp_extract(u, _URL_RE, 3)
    path = F.regexp_extract(u, _URL_RE, 4)
    port = F.when(port_s == "", F.lit(-1)).otherwise(
        port_s.cast("int")
    )
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        port.cast("int").alias("port"),
        path.alias("path"),
    )


def registered_domain(host: Column) -> Column:
    """Pay-level domain of a host (public-suffix-lite, see module
    docstring). A host with <2 labels (localhost, an IP would need its
    own branch) returns itself."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    take3 = (
        (n >= 3)
        & second.isin(*GENERIC_SLD)
        & (F.length(tld) == 2)
    )
    return (
        F.when(n < 2, host)
        .when(take3, F.array_join(F.slice(labels, -3, 3), "."))
        .otherwise(F.array_join(F.slice(labels, -2, 2), "."))
    )


def domain_caps(
    df: DataFrame,
    url_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Keep at most k docs per registered domain — the deterministic
    md5-keyed exact-k cap (smallest (md5 bucket, id) keys win), the
    standard anti-boilerplate / anti-SEO-farm corpus governor.

    Adds a ``domain`` column; one map-only parse + the
    stratified_sample two-phase cap (its window sorts only the
    pre-filtered sliver even for a billion-doc domain)."""
    from lens_spark.operators.mixing import stratified_sample

    parsed = df.withColumn(
        "domain", registered_domain(url_parse(F.col(url_col))["host"])
    )
    return stratified_sample(parsed, "domain", id_col, k)


def url_blocklist_filter(
    df: DataFrame,
    url_col: str,
    id_col: str,
    blocklist: DataFrame,
    keep: bool = False,
) -> DataFrame:
    """Domain blocklist filter with HOST-SUFFIX semantics — the
    UT1-style category-blocklist step CCNet/RefinedWeb-class pipelines
    apply before quality filtering: a blocked entry ``example.com``
    removes ``example.com`` AND every subdomain
    (``ads.example.com``), but NOT ``notexample.com``.

    ``blocklist`` is a one-column DataFrame of blocked domains (the
    public UT1 lists are flat domain files; load with
    ``spark.read.text``).  ``keep=True`` inverts the filter into an
    allowlist.  ``id_col`` keys the docs (the domain_caps convention)
    so the filter is an exact semi/anti join even under duplicate
    rows.

    100 TB shape: suffix matching is turned into an EQUI-join — each
    doc's host explodes into its O(#labels) label-suffixes (a host has
    ~2-5, bounded by label count, never corpus size), joined on the
    blocklist's exact domain strings.  The blocklist side (UT1 ≈ 3-4 M
    rows across all categories) is far under the broadcast knee, but
    the hint is left to AQE (ADVICE r4: forced broadcasts fail at
    exactly the advertised scale when a list outgrows the limit); the
    probe side never shuffles.  No regex scan per (host × entry) —
    cost is O(docs · labels + |blocklist|)."""
    bl_col = blocklist.columns[0]
    bl = blocklist.select(
        F.lower(F.trim(F.col(bl_col))).alias("__blocked")
    ).filter(F.col("__blocked") != "").distinct()
    from lens_spark.functions.hof import transform_u

    host = url_parse(F.col(url_col))["host"]
    labels = F.split(host, r"\.")
    # host a.b.c -> [a.b.c, b.c, c]: every suffix that could appear in
    # a domain blocklist (collision-safe lambda — functions/hof.py)
    suffixes = transform_u(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(
            F.slice(labels, i, F.size(labels) - i + 1), "."
        ),
    )
    hit_ids = (
        df.select(
            F.col(id_col), F.explode(suffixes).alias("__suffix")
        )
        .join(bl, F.col("__suffix") == F.col("__blocked"), "left_semi")
        .select(id_col)
        .distinct()
    )
    how = "left_semi" if keep else "left_anti"
    return df.join(hit_ids, on=id_col, how=how)
