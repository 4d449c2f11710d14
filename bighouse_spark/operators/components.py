"""Connected components over near-duplicate pair graphs.

Pair operators (``minhash_lsh_pairs``, ``simhash_pairs``, …) emit
edges; an actual dedup pass needs *clusters* — every document mapped
to one representative so the pipeline can keep exactly one per group.
This is iterative label propagation (large-star/small-star style):

  label(v) ← min(label(v), min over neighbors' labels)

repeated until a fixed point. Each iteration is one join + one
aggregate — all DataFrame ops, distributed; the driver only runs the
convergence loop (iteration count ~ graph diameter, which for
near-dup graphs is tiny — dup clusters are dense cliques-ish, so 2-3
iterations in practice; the cap bounds pathological chains).

At 100 TB scale this is the standard map-reduce CC algorithm; each
round shuffles the edge list once on vertex id. checkpoint/persist
per round keeps lineage from growing unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bighouse_spark.operators.caching import tracked_callback, tracked_persist


def _checkpoint_rdd(df: DataFrame):
    """The persisted RDD behind an eager ``localCheckpoint`` — the
    analyzed plan of a checkpointed Dataset is a ``LogicalRDD`` whose
    ``rdd`` IS the persisted checkpoint (`clearCache()` cannot see it,
    so it must be unpersisted explicitly or it pins executor storage
    until GC)."""
    try:
        return df._jdf.queryExecution().analyzed().rdd()
    except Exception:
        return None


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (id, component) where ``component`` is the minimum
    member id of the connected component — usable directly as the
    "keep the representative" dedup key.

    ``pairs`` is an undirected edge list; isolated vertices (present
    only via self-information) are not required — any id appearing in
    a pair appears in the output.
    """
    edges = tracked_persist(
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
    )
    # Initial label: min neighbor (including self).
    labels = tracked_persist(
        edges.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("id"), "label")
    )
    init_labels = labels
    label_type = dict(labels.dtypes)["label"]
    prev_ckpt = None
    for it in range(max_iterations):
        # Propagate: each vertex takes the min label over itself and
        # its neighbors' current labels. The self rows additionally
        # carry the round-start label (``old``, null on neighbor
        # rows, so max() recovers it per vertex) — labels only ever
        # DECREASE, so convergence below is ``label < old`` over the
        # checkpointed result itself, replacing the old-vs-new
        # shuffle join (and its own action) that r15 profiling
        # measured as ~1/3 of each round's jobs.
        neighbor_labels = (
            edges.join(labels, edges.b == labels.id)
            .select(
                F.col("a").alias("id"), "label",
                F.lit(None).cast(label_type).alias("old"),
            )
        )
        propagated = (
            labels.select("id", "label", F.col("label").alias("old"))
            .union(neighbor_labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
        )
        # Pointer jumping: label ← label(label). Combined with the
        # neighbor step this converges in O(log diameter) rounds
        # instead of O(diameter) — a 10^6-long chain needs ~20 rounds.
        lab_of_lab = propagated.select(
            F.col("id").alias("label"), F.col("label").alias("label2")
        )
        # localCheckpoint truncates lineage — without it the logical
        # plan doubles per iteration and planning itself OOMs long
        # before the data does.
        new_labels = (
            propagated.join(lab_of_lab, "label", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("label2"), F.col("label"))
                ).alias("label"),
                "old",
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.where(F.col("label") < F.col("old"))
            .limit(1)
            .count()
        )
        # The previous round's checkpoint is dead once `changed` has
        # been computed (the last job reading it) — unpersist NOW, or
        # every iteration's label table stays pinned until GC.
        if prev_ckpt is not None:
            try:
                prev_ckpt.unpersist(False)
            except Exception:
                pass
        prev_ckpt = _checkpoint_rdd(new_labels)
        labels = new_labels
        # The initial label table is dead the moment the first
        # checkpointed round replaces it (it was leaking for the
        # session's lifetime before).
        if it == 0:
            init_labels.unpersist()
        if changed == 0:
            break
    edges.unpersist()
    # The FINAL checkpoint backs the returned DataFrame — release it
    # at the request boundary (after the caller's action), same
    # lifecycle as every tracked persist. NOTE: a localCheckpoint
    # cannot recompute after unpersist, so the result must be
    # materialized before release — which is the release_tracked
    # contract (engine/test/bench all release in a post-action
    # ``finally``).
    if prev_ckpt is not None:
        tracked_callback(lambda r=prev_ckpt: r.unpersist(False))
    return labels.select("id", F.col("label").alias("component"))


def dedup_keep_representative(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every row whose id belongs to a near-dup component but is
    not its minimum-id representative. Rows not in any pair survive
    untouched (left-anti on the victims set — one broadcast-able join
    when the dup set is small relative to the corpus, which is the
    realistic regime)."""
    comp = connected_components(pairs, id_a, id_b)
    victims = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(victims, on=id_col, how="left_anti")
