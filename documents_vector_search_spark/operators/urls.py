"""URL normalization, domain extraction, and URL-keyed dedup.

Web-scale corpus pipelines (public precedent: CCNet's URL dedup,
RefinedWeb/FineWeb's URL filtering + blocklists, C4's page-level
provenance) canonicalize document URLs before anything else: the same
page arrives under `HTTP://Site.com/a#frag` and
`http://site.com/a?utm_source=feed`, and URL-keyed dedup/blocklists
only work on a normal form. The reference engine carries a `url` per
document (canonical envelope, jira/confluence/files converters) but
never normalizes it; at 100 TB this is the first dedup key a pipeline
reaches for because it needs NO content comparison at all.

Normal form implemented here (conservative, documented, deterministic):
- scheme and host lowercased (path/query case is preserved — it is
  significant on most servers);
- fragment stripped (`#...` never reaches the server);
- default ports stripped scheme-conditionally (`:80` for http,
  `:443` for https — regex lookbehind is NOT used because RE2, the
  oracle dialect, lacks it);
- tracking parameters removed (`utm_*`, `fbclid`, `gclid`, `ref`),
  then separator debris tidied (`?&` → `?`, `&&` → `&`, trailing
  `?`/`&` dropped).

Every transform is a Column expression over RE2-compatible regexes
(shared verbatim by the Spark Java-regex side and the DuckDB oracle),
so a corpus-wide normalize is one map-only codegen'd scan;
``url_dedup_report`` adds the single norm-url-keyed shuffle that makes
it a dedup operator.

Registered domains are PSL-aware: ``with_registered_domain`` joins the
committed public-suffix snapshot (operators/psl_data.py) with two
broadcast probes — ``shop.example.co.uk`` groups as ``example.co.uk``,
each ``*.github.io`` site stays a separate registrant — falling back
to last-two-labels for unlisted TLDs (the PSL default rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# '^([^/?#]+://[^/?#]+)' = scheme://authority prefix; group 1 of
# _PREFIX_RE is the prefix, group 1 of _REST_RE the remainder
_PREFIX_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
_REST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$"
# a tracking param and its value, ANCHORED to the preceding `?`/`&`
# separator (captured and re-emitted so `?href=x`, `?noutm_a=1`, or a
# path segment like `/ref=sr_1` are never mangled); the separator
# debris the re-emit leaves behind (`?&`, `&&`, trailing `?`/`&`) is
# tidied by the follow-up replaces
_TRACKING_RE = "([?&])(utm_[a-zA-Z0-9_]+|fbclid|gclid|ref)=[^&#]*"
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)"


def url_normalize(url: Column) -> Column:
    """Canonical URL form (see module docstring). URLs without a
    ``scheme://`` prefix pass through with only fragment stripping and
    tracking-param removal (prefix regexes simply don't match)."""
    # 1. strip fragment
    u = F.regexp_replace(url, "#.*$", "")
    # 2. lowercase scheme://host prefix, keep the rest as-is
    prefix = F.regexp_extract(u, _PREFIX_RE, 1)
    rest = F.regexp_extract(u, _REST_RE, 1)
    u = F.when(prefix != "", F.concat(F.lower(prefix), rest)).otherwise(u)
    # 3. scheme-conditional default-port strip. No lookaround — RE2
    # (the oracle dialect) supports neither lookahead nor lookbehind,
    # so the tail is captured and re-emitted instead
    u = F.when(
        u.startswith("http://"),
        F.regexp_replace(u, "^(http://[^/?#:]+):80([/?#].*)?$", "$1$2"),
    ).otherwise(u)
    u = F.when(
        u.startswith("https://"),
        F.regexp_replace(u, "^(https://[^/?#:]+):443([/?#].*)?$", "$1$2"),
    ).otherwise(u)
    # 4. drop tracking params (re-emitting the captured separator),
    # then tidy separators
    u = F.regexp_replace(u, _TRACKING_RE, "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, "&&+", "&")
    u = F.regexp_replace(u, "[?&]+$", "")
    return u


def url_host(url: Column) -> Column:
    """Lowercased host (no port) of a URL; '' when there is no
    ``scheme://`` prefix."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_registered_domain(host: Column) -> Column:
    """Last two dot-labels of the host — the FALLBACK registrable
    domain, exactly the public-suffix algorithm's default rule ``*``
    (the TLD itself is the suffix when no listed rule matches).
    :func:`with_registered_domain` layers the PSL snapshot's
    multi-label suffixes on top of this; use it unless the host set is
    known to contain no ``co.uk``-class domains. A single-label host
    (``localhost``) is returned unchanged — the extract regex needs a
    dot, so the no-match '' falls back to the host itself (otherwise a
    domain blocklist could never match such hosts)."""
    ext = F.regexp_extract(host, "([^.]+\\.[^.]+)$", 0)
    return F.when(ext != "", ext).otherwise(host)


def load_public_suffixes(spark) -> DataFrame:
    """The committed PSL snapshot (operators/psl_data.py — 2- and
    3-label plain rules) as a one-column ``suffix`` DataFrame, the
    default suffix table of :func:`with_registered_domain`."""
    from documents_vector_search_spark.operators.psl_data import (
        PUBLIC_SUFFIXES,
    )

    return spark.createDataFrame(
        [(s,) for s in PUBLIC_SUFFIXES], "suffix string"
    )


def with_registered_domain(
    df: DataFrame,
    host_col: str = "host",
    domain_col: str = "domain",
    suffixes: DataFrame | None = None,
) -> DataFrame:
    """Add the PSL-aware registered domain of ``host_col``: the
    longest listed public suffix plus one label (so
    ``shop.example.co.uk`` → ``example.co.uk``), last-two-labels for
    unlisted TLDs (the PSL default rule), and the host itself when the
    host IS a public suffix or single-label.

    ``suffixes``: one ``suffix`` column of 2- and 3-label plain rules;
    defaults to the committed snapshot (psl_data.py) — pass the full,
    current list here to upgrade coverage without code changes. The
    snapshot's wildcard rules (``*.ck``-class: every second-level
    label under the parent is a public suffix) and their ``!name``
    exceptions apply as literal in-lists; exceptions beat wildcards,
    and a longer explicit rule beats a wildcard-derived one (the PSL
    prevailing-rule order).

    Scale shape: the suffix table is kilobytes, so the longest-match is
    TWO map-side broadcast hash left-joins (3-label candidates, then
    2-label) plus two literal in-list checks — no corpus shuffle;
    everything else is Column algebra."""
    from documents_vector_search_spark.operators.psl_data import (
        EXCEPTION_RULES,
        WILDCARD_PARENTS,
    )

    if suffixes is None:
        suffixes = load_public_suffixes(df.sparkSession)
    n_labels = F.size(F.split(F.col("suffix"), "\\."))
    psl2 = suffixes.filter(n_labels == 2).select(
        F.col("suffix").alias("_psl_c2"), F.lit(True).alias("_psl_m2")
    )
    psl3 = suffixes.filter(n_labels == 3).select(
        F.col("suffix").alias("_psl_c3"), F.lit(True).alias("_psl_m3")
    )

    host = F.col(host_col)
    labs = F.split(host, "\\.")
    n = F.size(labs)

    def last_k(k: int) -> Column:
        return F.array_join(F.slice(labs, -k, k), ".")

    staged = df.withColumn(
        "_psl_c2", F.when(n >= 2, last_k(2))
    ).withColumn("_psl_c3", F.when(n >= 3, last_k(3)))
    joined = staged.join(F.broadcast(psl3), "_psl_c3", "left").join(
        F.broadcast(psl2), "_psl_c2", "left"
    )
    # precedence (the PSL prevailing-rule order): exception rules win
    # outright, then the longest matching suffix — explicit 3-label,
    # then explicit-2-label OR wildcard-derived 2-label (same length),
    # then the default last-two-labels rule
    is_exception = F.when(n >= 2, last_k(2)).isin(list(EXCEPTION_RULES))
    wildcard_hit = F.element_at(labs, -1).isin(list(WILDCARD_PARENTS)) & (
        n >= 2
    )
    domain = (
        F.when(is_exception, last_k(2))
        .when(
            F.col("_psl_m3").isNotNull(),
            F.when(n >= 4, last_k(4)).otherwise(host),
        )
        .when(
            F.col("_psl_m2").isNotNull() | wildcard_hit,
            F.when(n >= 3, last_k(3)).otherwise(host),
        )
        .otherwise(url_registered_domain(host))
    )
    return joined.withColumn(domain_col, domain).drop(
        "_psl_c2", "_psl_c3", "_psl_m2", "_psl_m3"
    )


def url_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Map-only per-document URL signals:
    ``(id, norm_url, host, domain)`` — one codegen'd scan (plus the
    PSL broadcast probes of with_registered_domain), the normalize pass
    a blocklist join or URL-keyed dedup builds on."""
    norm = url_normalize(F.col(url_col))
    host = url_host(norm)
    staged = docs.select(
        F.col(id_col),
        norm.alias("norm_url"),
        host.alias("host"),
    )
    return with_registered_domain(staged).select(
        id_col, "norm_url", "host", "domain"
    )


def url_dedup_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """URL-keyed first-wins dedup: ``(id, norm_url, host, domain,
    keep)`` where ``keep`` marks the minimum-id document per normalized
    URL — the zero-content-comparison dedup tier CCNet runs before any
    hashing. ONE shuffle keyed by ``norm_url`` (high-cardinality by
    construction; identical-URL explosions are exactly the duplicates
    being removed)."""
    report = url_report(docs, id_col=id_col, url_col=url_col)
    w = Window.partitionBy("norm_url").orderBy(F.col(id_col).asc())
    return report.withColumn(
        "keep", F.row_number().over(w) == 1
    )


def domain_gate(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    block_col: str = "domain",
) -> DataFrame:
    """Drop documents whose registered domain appears in ``blocklist``
    (one ``domain`` column) — the RefinedWeb/FineWeb URL-blocklist
    gate. Returns the surviving original rows plus ``host``/``domain``.

    Scale shape: the blocklist (even the public multi-million-entry
    ones) is kilobytes-to-megabytes against a 100 TB corpus, so it is
    BROADCAST and the gate is a map-side ``left_anti`` hash join — no
    corpus shuffle, plan-assertable (pytest checks BroadcastHashJoin
    LeftAnti); the PSL probes of with_registered_domain are broadcast
    too, so the whole gate stays shuffle-free."""
    host = url_host(url_normalize(F.col(url_col)))
    staged = with_registered_domain(
        docs.select(*docs.columns, host.alias("host"))
    )
    bl = blocklist.select(F.col(block_col).alias("domain")).distinct()
    return staged.join(F.broadcast(bl), "domain", "left_anti")
