"""Item co-occurrence from interaction events (recommender prep).

The classic collaborative-filtering preprocessing: from a (user, item)
interaction log, count how often item pairs share a user and normalize
by item popularity (lift) — the input of item-item recommenders,
"related items" panels, and co-click relevance mining over search logs.

Scale design (100 TB of events): the naive per-user pair explosion is
quadratic in a power user's item count. ``max_items_per_user`` caps
each user's contribution FIRST (top-N items per user by interaction
count, deterministic ties) — the standard production trick — so the
user-keyed self-join that forms pairs has bounded multiplicity: at most
N(N−1)/2 pairs per user, however many raw events they have. The cap
itself is a per-user window over the already-aggregated (user, item)
counts, not over raw events.

Everything is exact relational algebra (no sampling, no sketches), so
the DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_item_counts(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """``(user, item, n)`` interaction counts — ONE map-side-combinable
    aggregation over the log."""
    return events.groupBy(
        F.col(user_col).alias("user"), F.col(item_col).alias("item")
    ).agg(F.count("*").cast("bigint").alias("n"))


def item_cooccurrence(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    max_items_per_user: int = 50,
    min_pair_users: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Item-pair co-occurrence — ``(item_a, item_b, n_users, lift)``
    with ``item_a < item_b``:

    - ``n_users`` = users interacting with BOTH items (each user capped
      to their ``max_items_per_user`` most-interacted items, ties by
      item ascending — deterministic);
    - ``lift`` = n_users · U / (u_a · u_b) over the capped sets (U =
      capped users total, u_x = users holding item x): >1 means the
      pair co-occurs more than popularity alone predicts.

    Pairs seen by fewer than ``min_pair_users`` users are dropped (the
    long noise tail — and the filter applies BEFORE lift math, so the
    output is bounded by genuinely shared pairs)."""
    ui = user_item_counts(events, user_col, item_col)
    w = Window.partitionBy("user").orderBy(
        F.col("n").desc(), F.col("item").asc()
    )
    capped = (
        ui.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_items_per_user)
        .select("user", "item")
    )
    # FOUR consumers read `capped` (both join sides, item popularity,
    # the user total); without materialization each re-runs the event
    # scan + cap window — 4 corpus passes. One checkpoint caps it at
    # one pass over a frame already reduced to ≤ users × N rows.
    capped = capped.localCheckpoint()

    left = capped.select("user", F.col("item").alias("item_a"))
    right = capped.select("user", F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "user")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .filter(F.col("n_users") >= min_pair_users)
    )

    item_users = capped.groupBy("item").agg(
        F.count("*").cast("bigint").alias("u")
    )
    totals = capped.select("user").distinct().agg(
        F.count("*").cast("bigint").alias("_total_users")
    )
    # popularity joins are keyed on item and left UNHINTED: AQE
    # broadcasts the catalog when it is bounded (the common case) and
    # falls back to a keyed shuffle for truly huge catalogs — forcing
    # broadcast here would OOM exactly when the catalog is largest
    return (
        pairs.join(
            item_users.select(F.col("item").alias("item_a"),
                              F.col("u").alias("_ua")),
            "item_a",
        )
        .join(
            item_users.select(F.col("item").alias("item_b"),
                              F.col("u").alias("_ub")),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            "n_users",
            F.round(
                F.col("n_users") * F.col("_total_users")
                / (F.col("_ua") * F.col("_ub")),
                round_to,
            ).alias("lift"),
        )
    )


def association_rules(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    max_items_per_user: int = 50,
    min_pair_users: int = 2,
    min_confidence: float = 0.0,
    round_to: int = 6,
) -> DataFrame:
    """Directed association rules over the same capped user-item sets
    as :func:`item_cooccurrence` — ``(antecedent, consequent, n_both,
    n_antecedent, support, confidence, lift)``, one row per DIRECTION
    of each surviving pair (Agrawal & Srikant 1994's measures, minus
    the frequent-itemset recursion: at pair depth the cap + threshold
    already bound the blowup):

    - ``support``   = n_both / U (capped users total);
    - ``confidence``= n_both / n_antecedent — P(consequent | antecedent),
      the "customers who bought A also bought B" number;
    - ``lift``      = confidence / (n_consequent / U), identical for
      both directions.

    Rules below ``min_confidence`` drop AFTER the symmetric pair count
    (so the thresholds compose: min_pair_users bounds the pair table,
    min_confidence prunes the directed view). Same scale shape as
    item_cooccurrence: the cap runs BEFORE the pair self-join, one
    checkpointed pass feeds all consumers, popularity joins stay
    AQE-chosen."""
    ui = user_item_counts(events, user_col, item_col)
    w = Window.partitionBy("user").orderBy(
        F.col("n").desc(), F.col("item").asc()
    )
    capped = (
        ui.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_items_per_user)
        .select("user", "item")
        .localCheckpoint()
    )
    left = capped.select("user", F.col("item").alias("item_a"))
    right = capped.select("user", F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "user")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= min_pair_users)
    )
    item_users = capped.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("u")
    )
    totals = capped.select("user").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("_total_users")
    )
    # directed view: each pair contributes a->b and b->a
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_both",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "n_both",
        )
    )
    return (
        directed.join(
            item_users.select(
                F.col("item").alias("antecedent"), F.col("u").alias("_na")
            ),
            "antecedent",
        )
        .join(
            item_users.select(
                F.col("item").alias("consequent"), F.col("u").alias("_nc")
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            F.col("_na").alias("n_antecedent"),
            F.round(F.col("n_both") / F.col("_total_users"), round_to).alias(
                "support"
            ),
            F.round(F.col("n_both") / F.col("_na"), round_to).alias(
                "confidence"
            ),
            F.round(
                F.col("n_both") * F.col("_total_users")
                / (F.col("_na") * F.col("_nc")),
                round_to,
            ).alias("lift"),
        )
        .filter(F.col("confidence") >= min_confidence)
        .orderBy(
            F.col("confidence").desc(), "antecedent", "consequent"
        )
    )
