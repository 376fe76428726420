"""Connected components over an edge list: alternating large-star /
small-star rounds (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — the algorithm GraphFrames/GraphX use for the same job).

Why the engine needs it: near-duplicate detection emits PAIRS
(minhash/simhash/embedding-LSH all return (doc_a, doc_b, sim)), but
corpus curation needs CLUSTERS — "keep one representative per group of
mutual near-duplicates" is only well-defined after a transitive closure.
The reference's duplicate grouping (tool/DuplicationDetection.scala:216-321)
sidesteps this by grouping inside one blocking key (a species' records,
one representative per group); across blocking keys — which is what a
corpus-wide near-dup graph is — a component pass is the principled form.

Scale shape: every round is DataFrame ops only — a window-min over the
neighbor list (one shuffle, the window key IS the join key so AQE reuses
the exchange for the distinct) and a union. No driver-side graph, no
collect; the driver sees one (count, checksum) action per round for the
convergence test. Rounds are O(log^2 n) worst case (paper Thm 1) and in
practice 2-4 for near-dup graphs, whose components are small and dense.
Each round localCheckpoints its edge set so neither the lineage nor the
logical plan grows with iterations (the classic iterative-Spark trap —
and persist() alone is NOT enough: it caches data but Catalyst still
re-analyzes the compounding plan every round).

Determinism: the component label is the component's minimum node id —
a pure function of the input edges, so the operator has an exact SQL
oracle (recursive CTE computing min-reachable-id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u}).

    Input/output relation: undirected edge set as (u, v) rows, one row per
    direction not required (symmetrized here).
    """
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    return (
        und.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges to the smaller endpoint, then connect every smaller
    neighbor of u (and u itself) to the minimum of that neighborhood."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    w = Window.partitionBy("u")
    to_min = oriented.withColumn("m", F.min("v").over(w))
    rewired = to_min.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    parent = to_min.select("u", F.col("m").alias("v")).distinct()
    return rewired.union(parent).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every endpoint in `edges`; component is the
    minimum node id reachable from the node.

    Convergence is detected ON the round's own output, without running a
    confirming extra round: a fixed point of the large-star/small-star
    alternation is exactly a star forest rooted at component minima
    (Kiveris et al. §3 — the alternation strictly contracts any other
    edge set), and small_star output always orients v < u, so the star
    test reduces to two properties checkable with one small aggregation
    action per round: every u has out-degree 1, and no u appears as a v
    (roots have no parents). The former fingerprint scheme
    ((count, sum(xxhash64)) equality vs the previous round) needed one
    FULL extra star round purely to confirm stability — one more
    window-shuffle + checkpoint per call at any scale (round-13
    optimization; union-find parity tests pin the equivalence).
    `max_iter` is an honest guard (the paper bounds rounds by
    O(log^2 n); hitting 30 means ~2^30-node pathological chains, i.e. a
    bug), raising instead of silently emitting a half-contracted graph.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .filter(F.col("node").isNotNull())
        .distinct()
    )

    # localCheckpoint per round: persist() alone caches DATA but Catalyst
    # still re-analyzes the full round-over-round logical plan, whose size
    # grows geometrically — measured minutes of driver-side planning (then
    # a JVM stack overflow) by round ~6 on a 40-node path. Checkpointing
    # cuts the plan to a LogicalRDD each round. On a cluster that cares
    # about executor loss mid-computation, swap for reliable checkpoint()
    # with a checkpoint dir — same call shape.
    cur = e.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        cur = nxt
        # star-forest test (see docstring): tag each node occurrence with
        # which side it came from, then one grouped pass — out-degree
        # (sum of u-side tags) and both-sides presence per node, reduced
        # to two scalars. Reads the just-checkpointed edges twice, both
        # reads from block storage (no recompute).
        row = (
            nxt.select(F.col("u").alias("x"), F.lit(1).alias("us"), F.lit(0).alias("vs"))
            .union(nxt.select("v", F.lit(0), F.lit(1)))
            .groupBy("x")
            .agg(F.sum("us").alias("deg"), F.max("vs").alias("isv"))
            .agg(
                F.max(F.col("deg")).alias("maxdeg"),
                F.max(
                    F.when((F.col("deg") > 0) & (F.col("isv") == 1), 1).otherwise(0)
                ).alias("overlap"),
            )
            .collect()[0]
        )
        if (row["maxdeg"] or 0) <= 1 and (row["overlap"] or 0) == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # At the fixed point every edge points at its component root, so the
    # assignment is a plain min-aggregation; roots/isolated endpoints fall
    # through the left join to themselves.
    assign = cur.groupBy("u").agg(F.min("v").alias("component"))
    return nodes.join(
        assign, nodes["node"] == assign["u"], "left"
    ).select("node", F.coalesce("component", F.col("node")).alias("component"))


def component_representatives(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """One representative per component: the member with the highest
    score, ties to the lowest id — as groupBy + max(struct(score, -id,
    id)) so the argmax collapses map-side (no window sort of the hottest
    cluster in one reducer). `components` is connected_components output
    (node, component); `scores` is (id, score). Returns (component,
    rep_{id}, rep_{score}) — shared by the dedup_representative query and
    the corpus-build pipeline."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    joined = components.join(scores, components["node"] == scores[id_col])
    numeric_id = isinstance(
        scores.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    )
    if numeric_id:
        # one shuffle: negation reverses the order inside the max struct
        best = F.max(
            F.struct(
                F.col(score_col).alias("s"),
                (-F.col(id_col)).alias("neg"),
                F.col(id_col).alias("i"),
            )
        )
        return joined.groupBy("component").agg(
            best.alias("__best"), F.count(F.lit(1)).alias("cluster_size")
        ).select(
            "component",
            F.col("__best.i").alias(f"rep_{id_col}"),
            F.col("__best.s").alias(f"rep_{score_col}"),
            "cluster_size",
        )
    # string (or other non-numeric) ids have no order-reversing map, so
    # the lowest-id-on-ties rule takes a second aggregation: max score
    # per component, then min id among the rows holding it — both with
    # map-side partial aggregation, no window
    stats = joined.groupBy("component").agg(
        F.max(score_col).alias("__s"), F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        joined.join(stats, "component")
        # null-SAFE: a component whose members all have NULL scores has
        # __s NULL; plain == would filter every row and silently drop
        # the whole component (the numeric branch keeps it)
        .filter(F.col(score_col).eqNullSafe(F.col("__s")))
        .groupBy("component", "__s", "cluster_size")
        .agg(F.min(id_col).alias(f"rep_{id_col}"))
        .select(
            "component",
            f"rep_{id_col}",
            F.col("__s").alias(f"rep_{score_col}"),
            "cluster_size",
        )
    )
