"""Shuffle-key skew diagnostics.

Every groupBy/join in this engine shuffles on a key, and a skewed key
is the classic 100 TB failure mode: one straggler task holds a
mega-key while the rest of the cluster idles. AQE's skew-join handles
the join case at runtime; this operator is the PLANNING view — run it
on a candidate key column before committing a pipeline to that key,
and read off how many salt buckets would level the heavy keys (the
same salting the engine's dedup/cap operators apply internally, e.g.
operators/sampling.py::cap_per_group's two-phase top-k).

Scale shape: ONE aggregation keyed by the key column (map-side
combinable), a broadcast one-row total, and a top-k TakeOrdered — the
report is k rows however large the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Heaviest ``top_k`` keys of ``key_col`` — ``(key, n, share,
    salt_factor)`` by count descending (ties on key):

    - ``share``  = the key's fraction of all rows (a straggler task's
      share of the shuffle);
    - ``salt_factor`` = ceil(n / avg rows per key) — the number of salt
      buckets that splits this key into average-key-sized pieces (1 =
      already average or below).
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("_total"), round_to).alias("share"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("n") * F.col("_n_keys") / F.col("_total")),
            )
            .cast("int")
            .alias("salt_factor"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_k)
    )


def value_percentiles(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    probs: "tuple[float, ...]" = (0.25, 0.5, 0.75, 0.95),
    approx: bool = False,
    accuracy: int = 10000,
    round_to: int = 6,
) -> DataFrame:
    """Per-group value percentiles — ``(group, p25, p50, ..., n)`` —
    with an explicit EXACT-vs-APPROX contract (the RFM pattern:
    rfm_segments vs rfm_segments_approx):

    - ``approx=False`` (default, the oracle-checked registry path):
      Spark's ``percentile()`` — linear interpolation, identical to
      DuckDB's quantile_cont. Scale hatch needed because the exact
      aggregate buffers each group's FULL value multiset in the
      aggregation buffer — at extreme per-group cardinality (billions
      of rows in one group) that buffer, not a shuffle, is the failure
      mode.
    - ``approx=True``: ``approx_percentile()`` — Greenwald-Khanna
      summaries, O(accuracy) memory per group, mergeable map-side, the
      100 TB path. CONTRACT ON WHERE THE TWO DIFFER: the approx result
      is always an ELEMENT of the group (no interpolation), with rank
      error bounded by n/accuracy. The two are numerically IDENTICAL
      exactly when the group's row count is <= accuracy AND the
      requested rank p*(n-1)+1 lands on an integer (tie-free fixture
      pytest pins both the match and a deliberate p95 mismatch).

    One aggregation keyed by ``group_col``, map-side combinable in the
    approx path."""
    # collision-proof names from the full decimal: 0.25 -> p25,
    # 0.125 -> p12_5 (Python round() would banker's-round 0.125 to p12
    # and collapse e.g. 0.245/0.25 both onto p25 — duplicate output
    # columns break any downstream select-by-name)
    names = [
        "p" + (f"{p * 100:.10f}".rstrip("0").rstrip(".").replace(".", "_")
               or "0")
        for p in probs
    ]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentile column names: {names}")
    if approx:
        aggs = [
            F.round(
                F.expr(
                    f"approx_percentile({value_col}, {p}, {accuracy})"
                ),
                round_to,
            ).alias(nm)
            for p, nm in zip(probs, names)
        ]
    else:
        aggs = [
            F.round(F.expr(f"percentile({value_col}, {p})"), round_to).alias(
                nm
            )
            for p, nm in zip(probs, names)
        ]
    return df.groupBy(group_col).agg(
        *aggs, F.count("*").alias("n")
    )


def spend_concentration(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Spend-inequality profile over the per-user value distribution —
    one row: ``(n_users, total_spend, gini, top_decile_share)``.

    The whale-concentration view product and abuse teams ask for
    ("what fraction of revenue is 10% of users?") and the planning
    twin of skew_report: a high gini on the spend key predicts the
    same straggler keys a shuffle on user would suffer.

    - ``gini`` uses the rank formula G = (2·Σ i·xᵢ − (n+1)·Σx)/(n·Σx)
      with xᵢ in integer cents ascending and the USER as tiebreaker —
      a total order, so ranks (and therefore G) are engine-exact. The
      ratio is floored to micros (the deterministic-ratio recipe).
    - ``top_decile_share`` is the spend share of the top ⌈n/10⌉ users
      under the same (spend, user) total order — rank-based rather
      than ntile so small populations still have a non-empty top
      decile (ntile(10) over 8 rows leaves bucket 10 empty).

    Scale shape: ONE user-keyed aggregation over raw events, then a
    TWO-PHASE global rank over the O(users) aggregate — range
    repartition on (spend_c, user), per-partition row_number (window
    PARTITIONED by the physical partition id, so every task sorts its
    own slice), plus a broadcast per-partition-count offset join — no
    single-partition sort anywhere (the r10 verdict's last
    unpartitioned Window; the offset prefix-sum is a broadcast
    triangular join over the O(partitions) count frame, not a window).
    Ranks are identical to the old global row_number by construction
    (RangePartitioner orders partitions by key range), so the output
    hash is unchanged. Σ i·xᵢ needs n_users·total_cents < 2⁶³ —
    beyond ~10⁹ users × large totals, promote the weighted sum to
    decimal(38,0).
    """
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.sum(F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint"))
        .alias("spend_c")
    )
    # phase 1: range-partition the total order; pin the partition ids
    # with a lineage cut so the rank branch and the count branch see
    # the SAME physical layout (RangePartitioner samples its bounds)
    staged = (
        per_user.repartitionByRange(
            F.col("spend_c").asc(), F.col("user").asc()
        )
        .withColumn("_pid", F.spark_partition_id().cast("bigint"))
        .localCheckpoint(eager=False)
    )
    w_loc = Window.partitionBy("_pid").orderBy(
        F.col("spend_c").asc(), F.col("user").asc()
    )
    local = staged.select(
        "spend_c", "_pid", F.row_number().over(w_loc).cast("bigint").alias("_lrn")
    )
    pc = staged.groupBy("_pid").agg(
        F.count(F.lit(1)).cast("bigint").alias("_pc")
    )
    # phase 2: offset(p) = Σ counts of lower partitions — a broadcast
    # triangular join over the tiny per-partition count frame
    lower = pc.select(
        F.col("_pid").alias("_lpid"), F.col("_pc").alias("_lpc")
    )
    offs = (
        pc.join(F.broadcast(lower), F.col("_lpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(
            F.coalesce(F.sum("_lpc"), F.lit(0)).cast("bigint").alias("_off")
        )
    )
    tot = pc.agg(F.sum("_pc").cast("bigint").alias("_n"))
    ranked = (
        local.join(F.broadcast(offs), "_pid")
        .crossJoin(F.broadcast(tot))
        .select(
            "spend_c",
            (F.col("_lrn") + F.col("_off")).alias("i"),
            "_n",
        )
    )
    agg = ranked.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("spend_c").alias("_tot_c"),
        F.sum(F.col("i") * F.col("spend_c")).alias("_iwx"),
        F.sum(
            F.when(
                F.col("i")
                > F.col("_n") - F.floor((F.col("_n") + 9) / 10).cast("bigint"),
                F.col("spend_c"),
            ).otherwise(0)
        ).alias("_top_c"),
    )
    micros = lambda num, den: (  # noqa: E731 — floored-micros ratio
        F.floor(num * 1000000.0 / den + 0.5).cast("bigint") / 1000000.0
    )
    return agg.select(
        "n_users",
        (F.col("_tot_c") / 100.0).alias("total_spend"),
        micros(
            2 * F.col("_iwx") - (F.col("n_users") + 1) * F.col("_tot_c"),
            F.col("n_users") * F.col("_tot_c"),
        ).alias("gini"),
        micros(F.col("_top_c"), F.col("_tot_c")).alias("top_decile_share"),
    )


def host_profile(
    staged: DataFrame,
    salt_hosts: int | None = None,
) -> DataFrame:
    """Per-host corpus profile — ``(host, n_docs, n_langs,
    avg_quality, avg_chars, total_chars)`` over a staged frame with
    columns ``host, lang, n_chars, q_micro`` (quality pre-rounded to
    integer micro-units; see registry.q_domain_profile for the
    derivation). The reporting view a Dolma-style pipeline reads
    before setting mixing weights.

    ``salt_hosts=None`` (default): ONE host-keyed aggregation with
    map-side partials — right for host cardinalities where no single
    host exceeds a task.

    ``salt_hosts=k``: the skew hatch ``skew_report`` sizes (its
    ``salt_factor`` column IS this k) — at web scale a handful of
    mega-hosts (the wikipedia.org problem) funnel into single
    reducers. The decomposable metrics run through
    ``operators/skew.py::salted_aggregate`` (partials on (host, salt),
    finish on host), and ``n_langs`` — not salt-decomposable as an
    algebra — becomes a distinct (host, lang) pair reduction whose
    map-side partial dedup collapses the mega-host to O(langs) rows
    BEFORE its shuffle, then a host-keyed count. Result-identical to
    the unsalted form (pytest-pinned); both joins move O(hosts) rows.
    """
    from documents_vector_search_spark.operators.skew import (
        salted_aggregate,
    )

    mean6 = lambda s, n: F.floor(s / n + 0.5) / F.lit(1e6)  # noqa: E731
    if salt_hosts is None:
        return staged.groupBy("host").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
            mean6(F.sum("q_micro"), F.count("*")).alias("avg_quality"),
            mean6(F.sum("n_chars") * F.lit(1e6), F.count("*")).alias(
                "avg_chars"
            ),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    metrics = salted_aggregate(
        staged,
        ["host"],
        {
            "n_docs": ("count", "*"),
            "_sum_q": ("sum", "q_micro"),
            "total_chars": ("sum", "n_chars"),
        },
        num_salts=salt_hosts,
    )
    langs = (
        staged.select("host", "lang")
        .distinct()
        .groupBy("host")
        .agg(F.count("*").cast("bigint").alias("n_langs"))
    )
    return metrics.join(langs, "host").select(
        "host",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_langs",
        mean6(F.col("_sum_q"), F.col("n_docs")).alias("avg_quality"),
        mean6(F.col("total_chars") * F.lit(1e6), F.col("n_docs")).alias(
            "avg_chars"
        ),
        F.col("total_chars").cast("bigint").alias("total_chars"),
    )


def table_profile(
    df: DataFrame,
    exact_distinct: bool = False,
    round_to: int = 6,
) -> DataFrame:
    """Per-column data-quality profile of ANY DataFrame —
    ``(column, dtype, n_rows, n_nulls, null_frac, n_distinct, min,
    max, avg_len)`` — the first thing a pipeline runs over an
    unfamiliar parquet drop before trusting it (the generic sibling of
    the collection-specific `doctor`).

    ONE aggregation pass computes every column's stats side by side
    (Spark evaluates all aggregate expressions in a single scan with
    map-side partials), then the one-row wide result unpivots
    driver-free via stack(). min/max/avg_len render as strings so the
    schema is column-count-independent. ``n_distinct`` uses
    approx_count_distinct (HLL, one pass, mergeable) by default —
    ``exact_distinct=True`` swaps in countDistinct when the Expand
    cost is acceptable.
    """
    from pyspark.sql.types import NumericType, StringType

    n_rows = F.count(F.lit(1))
    aggs: list = [n_rows.cast("bigint").alias("_n")]
    for f in df.schema.fields:
        c = F.col("`" + f.name.replace("`", "``") + "`")
        nn = F.sum(c.isNull().cast("int")).cast("bigint")
        nd = (
            F.count_distinct(c)
            if exact_distinct
            else F.approx_count_distinct(c)
        ).cast("bigint")
        if isinstance(f.dataType, StringType):
            avg_len = F.round(F.avg(F.length(c)), round_to).cast("string")
        elif isinstance(f.dataType, NumericType):
            avg_len = F.lit(None).cast("string")
        else:
            avg_len = F.lit(None).cast("string")
        try_minmax = isinstance(f.dataType, (NumericType, StringType)) or (
            f.dataType.typeName() in ("timestamp", "date", "timestamp_ntz")
        )
        mn = (
            F.min(c).cast("string")
            if try_minmax
            else F.lit(None).cast("string")
        )
        mx = (
            F.max(c).cast("string")
            if try_minmax
            else F.lit(None).cast("string")
        )
        aggs.extend(
            [
                nn.alias(f"_nn_{f.name}"),
                nd.alias(f"_nd_{f.name}"),
                mn.alias(f"_mn_{f.name}"),
                mx.alias(f"_mx_{f.name}"),
                avg_len.alias(f"_al_{f.name}"),
            ]
        )
    wide = df.agg(*aggs)

    # column names are interpolated into the stack() SQL — escape
    # quotes in literals ('' doubling) and backticks in identifiers
    # (`` doubling) so a name containing either can't break the parse
    def _lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

    def _ident(s: str) -> str:
        return "`" + s.replace("`", "``") + "`"

    stack_parts = []
    for f in df.schema.fields:
        stack_parts.append(
            f"{_lit(f.name)}, {_lit(f.dataType.simpleString())}, "
            f"{_ident('_nn_' + f.name)}, {_ident('_nd_' + f.name)}, "
            f"{_ident('_mn_' + f.name)}, {_ident('_mx_' + f.name)}, "
            f"{_ident('_al_' + f.name)}"
        )
    k = len(df.schema.fields)
    stacked = wide.selectExpr(
        "_n",
        f"stack({k}, {', '.join(stack_parts)}) AS "
        "(column, dtype, n_nulls, n_distinct, min, max, avg_len)",
    )
    return stacked.select(
        "column",
        "dtype",
        F.col("_n").alias("n_rows"),
        "n_nulls",
        F.round(
            F.when(F.col("_n") > 0, F.col("n_nulls") / F.col("_n")).otherwise(
                F.lit(0.0)
            ),
            round_to,
        ).alias("null_frac"),
        "n_distinct",
        "min",
        "max",
        "avg_len",
    ).orderBy("column")


def fk_report(
    child: DataFrame,
    parent: DataFrame,
    keys: "list[tuple[str, str]] | list[str]",
    round_to: int = 6,
) -> DataFrame:
    """Declarative one-row twin of :func:`fk_check` — ``(child_rows,
    orphan_rows, orphan_frac)`` as a DataFrame, no driver-side action:
    ONE left join against the deduplicated parent key set + ONE
    aggregate, so it composes into larger plans and the registry's
    oracle harness can hash it. Same NULL contract as fk_check: plain
    equality, so a NULL child FK is always an orphan (a NULL parent
    key never absorbs it)."""
    pairs = [
        (k, k) if isinstance(k, str) else (k[0], k[1]) for k in keys
    ]
    pk = parent.select(
        *[F.col(p).alias(f"_pk_{c}") for c, p in pairs]
    ).dropDuplicates()
    cond = None
    for c, _p in pairs:
        eq = F.col(c) == F.col(f"_pk_{c}")
        cond = eq if cond is None else (cond & eq)
    first_pk = f"_pk_{pairs[0][0]}"
    joined = child.join(pk, cond, "left")
    n = F.count(F.lit(1)).cast("bigint")
    orphans = F.sum(F.col(first_pk).isNull().cast("int")).cast("bigint")
    return joined.agg(
        n.alias("child_rows"),
        orphans.alias("orphan_rows"),
        F.round(
            F.when(n > 0, orphans / n).otherwise(F.lit(0.0)), round_to
        ).alias("orphan_frac"),
    )


def fk_check(
    child: DataFrame,
    parent: DataFrame,
    keys: "list[tuple[str, str]] | list[str]",
    sample: int = 5,
) -> dict:
    """Referential-integrity check: how many ``child`` rows point at a
    key absent from ``parent`` — the join-quality companion to
    :func:`table_profile` (a fact table whose dimension lookups
    silently null out is the classic quiet corruption after a partial
    load). ``keys``: child→parent column pairs, or bare names shared
    by both sides.

    Returns ``{"child_rows", "orphan_rows", "orphan_frac",
    "sample": [key tuples]}``. ONE left-anti join keyed on the FK (the
    parent side deduplicates to keys first, so the anti-join build
    side is the key set, not the dimension) + one count; the sample is
    a bounded ``limit(sample)`` collect. NULL FKs count as orphans
    UNCONDITIONALLY — the join condition is plain equality, so a NULL
    child key never matches even when the parent key set itself
    contains a NULL (eqNullSafe would silently pair them) — filter
    them upstream if NULL means intentionally-unlinked."""
    pairs = [
        (k, k) if isinstance(k, str) else (k[0], k[1]) for k in keys
    ]
    pk = parent.select(
        *[F.col(p).alias(f"_pk_{c}") for c, p in pairs]
    ).dropDuplicates()
    cond = None
    for c, _p in pairs:
        eq = F.col(c) == F.col(f"_pk_{c}")
        cond = eq if cond is None else (cond & eq)
    orphans = child.join(pk, cond, "left_anti")
    child_rows = child.count()
    orphan_rows = orphans.count()
    sample_rows = [
        tuple(r[c] for c, _p in pairs)
        for r in orphans.select(*[c for c, _p in pairs])
        .limit(sample)
        .collect()
    ]
    return {
        "child_rows": child_rows,
        "orphan_rows": orphan_rows,
        "orphan_frac": (
            round(orphan_rows / child_rows, 6) if child_rows else 0.0
        ),
        "sample": sample_rows,
    }
