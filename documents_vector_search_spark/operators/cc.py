"""Connected components: near-dup pairs → transitive dedup clusters.

A pairwise near-dup detector (MinHash-LSH, SimHash, embedding-cosine —
operators/dedup.py) emits EDGES; real dedup needs the transitive
closure: if A~B and B~C, then {A, B, C} is ONE cluster and one
canonical survivor should be kept. The reference has no analog (its
pipeline is search-only); this is the standard corpus-dedup step of a
large-scale training-data pipeline (e.g. the dedup stages described in
public LLM-corpus papers), expressed as iterative DataFrame joins.

Algorithm: minimum-label propagation. Every node starts labeled with
its own id; each round, a node adopts the smallest label in its
neighborhood; at the fixed point every node carries the minimum id of
its component. Convergence is O(component diameter) rounds — for dedup
graphs (small, dense clusters of near-identical docs) that's 2-4
rounds. Each round is one shuffle join + one aggregation, both keyed
on node id (uniform). For general graphs with long chains, the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", public) converges in O(log^2 n) rounds and
is the drop-in upgrade; label propagation is chosen here because dedup
components have tiny diameters and the inner loop is simpler to audit.

Scale notes (100 TB):
- State per round is one (id, label) row per node — O(nodes), not
  O(edges); edges stream through the join unchanged.
- Convergence check: sum(label) is strictly decreasing until the fixed
  point, so one cheap scalar aggregate per round detects it — no
  row-level diff join.
- Each round's labels are ``localCheckpoint``-ed: without lineage
  truncation the nested join plan grows per round and planning itself
  blows the driver (measured: a 9-round chain OOMs). A production
  cluster run would use a reliable ``checkpoint`` dir instead for
  executor-failure tolerance; the algorithm is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """``(id, cluster_id)`` for every node that appears in ``pairs``,
    where ``cluster_id`` is the MINIMUM id in the node's connected
    component — a canonical, deterministic cluster key.

    Raises ``RuntimeError`` if ``max_rounds`` label-propagation rounds
    do not reach the fixed point (diameter > max_rounds — for near-dup
    graphs that indicates pathological input, not a tuning problem).
    """
    # Materialize the pair input ONCE before anything else touches it:
    # pairs is typically an expensive plan (a full MinHash-LSH pipeline),
    # and the symmetric union below reads it twice — two scan branches
    # that a lazy .persist() would race to compute and ReusedExchange is
    # not guaranteed to dedup. The eager localCheckpoint runs the pair
    # plan exactly once; both union branches and every propagation round
    # then read materialized rows. (A production cluster run would use a
    # reliable checkpoint dir, same as the per-round labels below.)
    pairs = pairs.select(src_col, dst_col).localCheckpoint()

    # symmetric edge list: propagation must flow both ways
    fwd = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    edges = fwd.unionByName(
        pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).persist()

    # convergence sums ride the checkpoint materialization job via
    # observe(): the eager localCheckpoint fires QueryExecutionListener
    # metrics, so the per-round scalar aggregate costs ZERO extra jobs
    # (previously each round ran materialize + a separate sum job)
    obs0 = Observation()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .observe(obs0, F.sum("label").alias("s"))
        .localCheckpoint()
    )
    prev_sum = obs0.get["s"]

    try:
        for _ in range(max_rounds):
            nbr_min = (
                edges.join(labels, edges["src"] == labels["id"])
                .groupBy("dst")
                .agg(F.min("label").alias("nbr_label"))
            )
            # localCheckpoint (eager) truncates the lineage: round N's
            # plan starts from materialized rows, not N nested joins
            obs = Observation()
            labels = (
                labels.join(nbr_min, labels["id"] == nbr_min["dst"], "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nbr_label"), F.col("label")),
                    ).alias("label"),
                )
                .observe(obs, F.sum("label").alias("s"))
                .localCheckpoint()
            )
            new_sum = obs.get["s"]
            if new_sum == prev_sum:  # fixed point: no label decreased
                return labels.select("id", F.col("label").alias("cluster_id"))
            prev_sum = new_sum
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    finally:
        edges.unpersist()


def connected_components_star(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Two-phase (large-star / small-star) connected components — same
    ``(id, cluster_id)`` contract as :func:`connected_components`, but
    convergence is O(log^2 n) ROUNDS in the component diameter (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC 2014 —
    public). Use this variant when components may be long chains
    (entity-resolution graphs, citation chains); for near-dup clusters
    (tiny diameters) plain label propagation does fewer shuffles per
    round and wins.

    Each round rewrites the edge set toward a star forest:
    - LARGE-STAR: per node u, connect every strictly-larger neighbor to
      the minimum of the neighborhood (including u).
    - SMALL-STAR: per node u, connect u and every not-larger neighbor
      to that minimum.
    At the fixed point every edge is (node → its component minimum).
    Both steps are one groupBy + one join keyed on node id; rounds are
    ``localCheckpoint``-ed like the label-propagation loop (same
    lineage-blowup reasoning, same reliable-checkpoint upgrade on a
    real cluster).

    Convergence detection: the total over edges of the parent endpoint
    is strictly decreasing until the fixed point (every rewrite repoints
    a node at a smaller parent), so one scalar aggregate per round
    suffices — no row-diff join.
    """
    ids = lambda *cs: [F.col(c) for c in cs]  # noqa: E731

    # undirected input → canonical (big, small) pairs; self-loops drop
    e0 = pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    edges = (
        e0.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest(*ids("a", "b")).alias("u"),
            F.least(*ids("a", "b")).alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )

    def _min_nbr(sym: DataFrame) -> DataFrame:
        # m(u) = min over the neighborhood of u, including u itself
        return sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    prev_sum = None
    for _ in range(max_rounds):
        # LARGE-STAR over the symmetrized edges: (v, m(u)) for v > u
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = _min_nbr(sym)
        edges = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # SMALL-STAR over the (child ≥ parent) edges: every child and
        # not-larger neighbor repoints at the local minimum.
        # The convergence aggregate rides the checkpoint job via
        # observe() — same zero-extra-jobs trick as the label loop.
        m = _min_nbr(edges)
        obs = Observation()
        edges = (
            edges.join(m, "u")
            .select(F.col("u"), F.col("m").alias("v"))
            .unionByName(
                edges.join(m, "u").select(
                    F.col("v").alias("u"), F.col("m").alias("v")
                )
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .observe(
                obs, F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
            )
            .localCheckpoint()
        )
        new_sum = obs.get
        key = (new_sum["s"], new_sum["n"])
        if key == prev_sum:  # fixed point: star forest reached
            roots = edges.select(F.col("v").alias("id")).subtract(
                edges.select(F.col("u").alias("id"))
            )
            return (
                edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
                .unionByName(
                    roots.select("id", F.col("id").alias("cluster_id"))
                )
                .distinct()
            )
        prev_sum = key
    raise RuntimeError(
        f"connected_components_star did not converge in {max_rounds} rounds"
    )


def cluster_canonicalize(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ONE document per near-dup cluster: the cluster_id (minimum
    id) member survives; every other clustered doc is dropped. Docs in
    no cluster pass through. One broadcast-able anti-join — clusters is
    tiny relative to the corpus (only near-dup members appear in it)."""
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
