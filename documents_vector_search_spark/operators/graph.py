"""Iterative graph algorithms as edge-keyed DataFrame loops.

PageRank is the representative: importance propagation over a weighted
directed graph (Page et al. 1999), the standard quality prior for
web-corpus curation (a CommonCrawl-style host graph) and the "which
state actually matters" view of an event-transition graph.

Spark shape — the canonical iterative-dataflow pattern:
- the EDGE table is the big, partition-stable input; each iteration is
  one ``edges ⋈ ranks`` join (ranks repartition to the edge key) plus
  one ``groupBy(dst)`` aggregate. Nothing is ever collected; node and
  edge counts can be arbitrary.
- lineage is cut every ``checkpoint_every`` iterations with
  ``localCheckpoint`` — without this, 10+ self-referential joins build
  a plan Catalyst re-optimizes from scratch each pass and the DAG
  explodes at scale.
- all rank arithmetic is INTEGER (micro-units with explicit integer
  division), so the fixpoint trajectory is bit-identical in any
  engine — that is what lets a SQL oracle replay the loop unrolled.

Dangling mass: nodes with no out-edges re-inject their damped rank
uniformly (the standard correction) via ONE extra one-row aggregate
per iteration, broadcast into the rank update — so Σrank stays ≈
PR_SCALE (mass conservation, pytest-pinned on a sink-heavy graph)
instead of leaking through sinks.

Weight hygiene: NULL / zero / negative weights are filtered when the
edge frame is built (they would otherwise break engine parity — Spark
DIV truncates toward zero while DuckDB ``//`` floors, and NULLs
silently drop contributions), so the bit-identical-trajectory contract
holds by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "personalized_pagerank", "graph_profile", "PR_SCALE"]

# rank unit: 1.0 of probability mass == PR_SCALE integer units.
# 1e12 keeps six significant digits even for million-node graphs
# (base term PR_SCALE/N stays ≥ 1e6).
PR_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 10,
    damping_pct: int = 85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration weighted PageRank; returns ``(node, rank_micro,
    rank)`` where ``rank_micro`` is the exact int64 trajectory value
    (PR_SCALE-scaled probability) and ``rank`` its float rendering.

    ``PR(v) = (1-d)/N + d · Σ_{u→v} PR(u) · w(u,v) / W_out(u)
    + d · D / N`` with ``d = damping_pct/100`` and ``D`` the summed
    rank of dangling (out-edge-less) nodes, evaluated ``iterations``
    times from the uniform start, entirely in integer units: every
    division is an explicit int64 floor-div, so two engines replaying
    the loop agree bit-for-bit. Unweighted graphs pass ``weight=None``
    (every edge weight 1 — the division is then by out-degree).

    Edges whose weight is NULL or ≤ 0 are dropped up front (see the
    module docstring — parity would break on them); the node set and
    the dangling set are derived from the FILTERED edges, identically
    in :func:`pagerank_unrolled_sql`.

    The node set is ``src ∪ dst`` (sinks participate; sources feed).
    Per-iteration cost: one join shuffled on ``src`` + one aggregate
    shuffled on ``dst`` + one ONE-ROW dangling-mass aggregate
    broadcast into the update — keyed shuffles AQE can coalesce, no
    driver-side state beyond the loop counter.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    w_col = (
        F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    )
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w_col.alias("_w")
    ).filter(F.col("_w").isNotNull() & (F.col("_w") > 0))
    # out-weight per source, carried ON the edge row so the iteration
    # join is single-key
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    e = e.join(out_w, "_src").localCheckpoint(eager=False)

    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # ONE driver action answers both loop-shaping questions — node
    # count and does-any-dangling-node-exist — instead of a count()
    # plus a dangling.head(1): each driver action is a full barrier
    # (plan + schedule + run), so fusing them halves the construct-time
    # sync points of the loop setup. The left-join aggregate
    # additionally materializes the lazy e/nodes checkpoints exactly
    # like count() did; the trajectory inputs are bit-identical.
    src_nodes = e.select(F.col("_src").alias("node")).distinct()
    _stats = (
        nodes.join(src_nodes.withColumn("_has_out", F.lit(1)), "node", "left")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.count("_has_out").alias("_n_out"),
        )
        .first()
    )
    n_nodes = _stats["_n"]
    if n_nodes == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("bigint").alias("rank_micro"),
            F.lit(0.0).alias("rank"),
        )
    base = (PR_SCALE * (100 - damping_pct)) // (100 * n_nodes)
    init = PR_SCALE // n_nodes

    # dangling = nodes with no (positive-weight) out-edge; computed once
    # (lazily — it materializes with the first iteration's action). If
    # the set is EMPTY (every node has an out-edge — common for
    # transition graphs), the per-iteration mass term is identically 0,
    # so skip its aggregate entirely: the trajectory is unchanged and
    # the rank frame is referenced once per iteration instead of twice
    # (measured 2× on the registry's event graph).
    dangling = nodes.join(src_nodes, "node", "left_anti").localCheckpoint(
        eager=False
    )
    has_dangling = _stats["_n_out"] < n_nodes

    ranks = nodes.select("node", F.lit(init).cast("bigint").alias("r"))
    for i in range(iterations):
        contrib = (
            e.join(ranks, e["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                # d/100 · r · w/out_w as an int64 floor-div chain in
                # THIS order: (r·w) DIV out_w ≤ r (w ≤ out_w always),
                # so the later ·damping_pct stays ≤ 100·PR_SCALE and
                # the only large product is r·w — safe while
                # w ≤ ~4·10⁶ at r = PR_SCALE (document bound, not UB:
                # heavier edges should pre-scale their weights)
                F.expr(
                    f"((r * _w) DIV _out_w * {damping_pct}) DIV 100"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        updated = nodes.join(contrib, "node", "left")
        new_r = F.lit(base).cast("bigint") + F.coalesce(
            F.col("in_mass"), F.lit(0)
        ).cast("bigint")
        if has_dangling:
            # dangling mass: ONE-row aggregate (D ≤ PR_SCALE so D·d
            # fits int64 with 6 orders of margin), broadcast and
            # redistributed uniformly
            dmass = ranks.join(dangling, "node", "left_semi").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast("bigint").alias("_dm")
            )
            updated = updated.crossJoin(F.broadcast(dmass))
            new_r = new_r + F.expr(
                f"(_dm * {damping_pct}) DIV (100 * {n_nodes})"
            )
        ranks = updated.select("node", new_r.alias("r"))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        "node",
        F.col("r").alias("rank_micro"),
        (F.col("r") / F.lit(float(PR_SCALE))).alias("rank"),
    )


def pagerank_unrolled_sql(
    edges_cte: str,
    iterations: int = 10,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> str:
    """The oracle twin: the SAME integer trajectory as :func:`pagerank`
    unrolled into chained CTEs (standard SQL forbids aggregates in a
    recursive term, so the loop unrolls — fine for a fixed iteration
    count). ``edges_cte`` must define relation ``edges(src, dst, w)``;
    the same NULL/≤0 weight filter and the same per-iteration
    dangling-mass redistribution are replayed here.
    Returns a full query ending in ``SELECT node, rank_micro, rank``.
    """
    parts = [
        f"WITH {edges_cte}",
        "ew AS (SELECT src, dst, w, sum(w) OVER (PARTITION BY src) AS out_w"
        " FROM edges WHERE w IS NOT NULL AND w > 0)",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT src AS node FROM ew"
        "  UNION SELECT dst AS node FROM ew))",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "dang AS (SELECT n2.node FROM nodes n2 LEFT JOIN"
        " (SELECT DISTINCT src FROM ew) s ON n2.node = s.src"
        " WHERE s.src IS NULL)",
        # MATERIALIZED: each r{i} is referenced TWICE (dangling mass +
        # contribution join); an inlining planner would otherwise
        # re-evaluate the whole chain per reference — 2^iterations
        f"r0 AS MATERIALIZED (SELECT node, CAST({scale} // n AS BIGINT) AS r"
        " FROM nodes CROSS JOIN nn)",
    ]
    for i in range(iterations):
        parts.append(
            f"d{i} AS (SELECT CAST(coalesce(sum(r{i}.r), 0) AS BIGINT)"
            f" AS dm FROM r{i} JOIN dang ON r{i}.node = dang.node)"
        )
        parts.append(
            f"r{i + 1} AS MATERIALIZED ("
            f"SELECT nodes.node, CAST(({scale} * {100 - damping_pct})"
            f" // (100 * nn.n) + coalesce(m.in_mass, 0)"
            f" + (d{i}.dm * {damping_pct}) // (100 * nn.n)"
            " AS BIGINT) AS r"
            f" FROM nodes CROSS JOIN nn CROSS JOIN d{i} LEFT JOIN ("
            "SELECT ew.dst AS node,"
            f" sum((r{i}.r * ew.w) // ew.out_w"
            f" * {damping_pct} // 100) AS in_mass"
            f" FROM ew JOIN r{i} ON ew.src = r{i}.node GROUP BY ew.dst"
            ") m ON m.node = nodes.node)"
        )
    parts.append(
        f"SELECT node, r AS rank_micro, r / {float(scale)} AS rank"
        f" FROM r{iterations}"
    )
    return ",\n".join(parts[:1] + parts[1:-1]) + "\n" + parts[-1]


def personalized_pagerank_unrolled_sql(
    edges_cte: str,
    seeds: "list[str]",
    iterations: int = 10,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> str:
    """Oracle twin of :func:`personalized_pagerank` — the same exact
    int64 trajectory unrolled into chained MATERIALIZED CTEs (the
    :func:`pagerank_unrolled_sql` discipline), with the teleport base
    AND the dangling mass re-injected into the SEED SET only and the
    divisor the count of seeds present in the graph's node set.
    ``seeds`` are string literals (quoted here — keep them free of
    quotes, they name graph nodes)."""
    seed_list = ", ".join("'" + s.replace("'", "''") + "'" for s in seeds)
    parts = [
        f"WITH {edges_cte}",
        "ew AS (SELECT src, dst, w, sum(w) OVER (PARTITION BY src) AS out_w"
        " FROM edges WHERE w IS NOT NULL AND w > 0)",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT src AS node FROM ew"
        "  UNION SELECT dst AS node FROM ew))",
        f"ns AS (SELECT count(*) AS n FROM nodes"
        f" WHERE node IN ({seed_list}))",
        "dang AS (SELECT n2.node FROM nodes n2 LEFT JOIN"
        " (SELECT DISTINCT src FROM ew) s ON n2.node = s.src"
        " WHERE s.src IS NULL)",
        # seed-concentrated uniform start; non-seeds begin at 0
        f"r0 AS MATERIALIZED (SELECT node,"
        f" CAST(CASE WHEN node IN ({seed_list})"
        f" THEN {scale} // n ELSE 0 END AS BIGINT) AS r"
        " FROM nodes CROSS JOIN ns)",
    ]
    for i in range(iterations):
        parts.append(
            f"d{i} AS (SELECT CAST(coalesce(sum(r{i}.r), 0) AS BIGINT)"
            f" AS dm FROM r{i} JOIN dang ON r{i}.node = dang.node)"
        )
        parts.append(
            f"r{i + 1} AS MATERIALIZED ("
            "SELECT nodes.node, CAST("
            f"CASE WHEN nodes.node IN ({seed_list})"
            f" THEN ({scale} * {100 - damping_pct}) // (100 * ns.n)"
            f" + (d{i}.dm * {damping_pct}) // (100 * ns.n)"
            " ELSE 0 END"
            " + coalesce(m.in_mass, 0)"
            " AS BIGINT) AS r"
            f" FROM nodes CROSS JOIN ns CROSS JOIN d{i} LEFT JOIN ("
            "SELECT ew.dst AS node,"
            f" sum((r{i}.r * ew.w) // ew.out_w"
            f" * {damping_pct} // 100) AS in_mass"
            f" FROM ew JOIN r{i} ON ew.src = r{i}.node GROUP BY ew.dst"
            ") m ON m.node = nodes.node)"
        )
    parts.append(
        f"SELECT node, r AS rank_micro, r / {float(scale)} AS rank"
        f" FROM r{iterations}"
    )
    return ",\n".join(parts[:1] + parts[1:-1]) + "\n" + parts[-1]


def personalized_pagerank(
    edges: DataFrame,
    seeds: "list",
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 10,
    damping_pct: int = 85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Personalized PageRank: the teleport distribution concentrates
    on ``seeds`` instead of being uniform — "authority RELATIVE to a
    trusted set", the standard seed-propagation prior a curation
    pipeline computes from a whitelist (TrustRank; Gyöngyi et al.
    2004) or a topic's known-good hosts. Same exact-int64 trajectory
    discipline as :func:`pagerank`:

    ``PPR(v) = (1-d)·r(v) + d · Σ_{u→v} PPR(u)·w/W_out(u) + d·D·r(v)``
    with ``r(v) = 1/|S|`` for seed nodes and 0 otherwise — both the
    base term AND the dangling mass re-inject into the seed set only,
    so rank mass keeps flowing OUT of the seeds through the link
    structure (nodes unreachable from the seeds converge to 0, which
    is the point).

    ``seeds`` is a literal list (broadcast by isin) — right for
    whitelists up to ~10⁵ entries; a seed TABLE would swap the isin
    for a broadcast join, same plan shape. Seeds not present in the
    graph's node set are ignored (documented: the divisor is the
    count of seeds IN the graph, so the teleport mass stays 1).

    Start state is uniform over the seed set (the conventional PPR
    start — it makes iteration-0 mass already respect the teleport
    distribution).
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    if not seeds:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    w_col = (
        F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    )
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w_col.alias("_w")
    ).filter(F.col("_w").isNotNull() & (F.col("_w") > 0))
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    e = e.join(out_w, "_src").localCheckpoint(eager=False)

    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    is_seed = F.col("node").isin(list(seeds))
    # ONE driver action for both loop-shaping facts (seed count in the
    # node set + does-any-dangling-node-exist) — same fused-barrier
    # rationale as :func:`pagerank`; trajectory inputs bit-identical.
    src_nodes = e.select(F.col("_src").alias("node")).distinct()
    _stats = (
        nodes.join(src_nodes.withColumn("_has_out", F.lit(1)), "node", "left")
        .agg(
            F.count(F.when(is_seed, 1)).alias("_n_seeds"),
            F.count(F.lit(1)).alias("_n"),
            F.count("_has_out").alias("_n_out"),
        )
        .first()
    )
    n_seeds = _stats["_n_seeds"]
    if n_seeds == 0:
        raise ValueError("no seed appears in the graph's node set")
    base = (PR_SCALE * (100 - damping_pct)) // (100 * n_seeds)
    init = PR_SCALE // n_seeds

    dangling = nodes.join(src_nodes, "node", "left_anti").localCheckpoint(
        eager=False
    )
    has_dangling = _stats["_n_out"] < _stats["_n"]

    ranks = nodes.select(
        "node",
        F.when(is_seed, F.lit(init)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("r"),
    )
    for i in range(iterations):
        contrib = (
            e.join(ranks, e["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                F.expr(
                    f"((r * _w) DIV _out_w * {damping_pct}) DIV 100"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        updated = nodes.join(contrib, "node", "left")
        new_r = F.when(is_seed, F.lit(base)).otherwise(F.lit(0)).cast(
            "bigint"
        ) + F.coalesce(F.col("in_mass"), F.lit(0)).cast("bigint")
        if has_dangling:
            dmass = ranks.join(dangling, "node", "left_semi").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast("bigint").alias("_dm")
            )
            updated = updated.crossJoin(F.broadcast(dmass))
            new_r = new_r + F.when(
                is_seed,
                F.expr(f"(_dm * {damping_pct}) DIV (100 * {n_seeds})"),
            ).otherwise(F.lit(0))
        ranks = updated.select("node", new_r.alias("r"))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        "node",
        F.col("r").alias("rank_micro"),
        (F.col("r") / F.lit(float(PR_SCALE))).alias("rank"),
    )


def graph_profile(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """One-row structural health check of a directed graph —
    ``(n_nodes, n_edges, n_sources, n_sinks, reciprocity,
    max_out_degree, max_in_degree, avg_degree)`` — the
    look a pipeline takes at a host graph before spending a PageRank
    on it (a reciprocity near 1 means a link farm / mirror cluster; a
    huge max degree names the supernode that needs the salted path).

    Invalid weights filter exactly like :func:`pagerank`, so the
    profiled graph IS the graph the rank loop would see. Self-loops
    ``(a, a)`` are NEVER counted as reciprocal (an edge trivially
    matches its own transpose — event-transition graphs commonly have
    self-loops and counting them would inflate the link-farm signal);
    they do count in ``n_edges`` and the degrees. Cost: the edge scan
    + two degree aggregates + one self-join of the DISTINCT
    edge set against its transpose for reciprocity (keyed shuffle on
    the pair, O(edges))."""
    w_col = (
        F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    )
    e = (
        edges.select(
            F.col(src).alias("_s"), F.col(dst).alias("_d"), w_col.alias("_w")
        )
        .filter(F.col("_w").isNotNull() & (F.col("_w") > 0))
        .select("_s", "_d")
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    out_deg = e.groupBy(F.col("_s").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("out_d")
    )
    in_deg = e.groupBy(F.col("_d").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("in_d")
    )
    nodes = out_deg.join(in_deg, "node", "full_outer").select(
        "node",
        F.coalesce("out_d", F.lit(0)).alias("out_d"),
        F.coalesce("in_d", F.lit(0)).alias("in_d"),
    )
    recip = (
        e.filter(F.col("_s") != F.col("_d"))
        .join(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")),
            ["_s", "_d"],
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n_recip"))
    )
    stats = nodes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum("out_d").cast("bigint").alias("n_edges"),
        F.sum((F.col("in_d") == 0).cast("int")).cast("bigint").alias(
            "n_sources"
        ),
        F.sum((F.col("out_d") == 0).cast("int")).cast("bigint").alias(
            "n_sinks"
        ),
        F.max("out_d").alias("max_out_degree"),
        F.max("in_d").alias("max_in_degree"),
    )
    return (
        stats.crossJoin(F.broadcast(recip))
        .select(
            "n_nodes",
            "n_edges",
            "n_sources",
            "n_sinks",
            F.round(
                F.when(
                    F.col("n_edges") > 0,
                    F.col("_n_recip") / F.col("n_edges"),
                ).otherwise(0.0),
                round_to,
            ).alias("reciprocity"),
            "max_out_degree",
            "max_in_degree",
            F.round(
                F.when(
                    F.col("n_nodes") > 0,
                    F.col("n_edges") / F.col("n_nodes"),
                ).otherwise(0.0),
                round_to,
            ).alias("avg_degree"),
        )
    )
