"""Iterative graph operators: connected components by min-label
propagation — the transitive-closure step that turns pairwise near-dup
CANDIDATES into whole dup-GROUPS (a MinHash pair list says a~b and b~c;
the component {a,b,c} is what dedup actually deletes against).

This is the engine's iterative-algorithm surface: a driver-side loop
over distributed DataFrame steps (the loop count is O(graph diameter),
never O(data)). Each iteration is one join + one aggregate; lineage is
truncated with localCheckpoint every iteration so plans don't grow
unboundedly — the standard Spark pattern for iterative workloads.

Scale notes: min-label propagation is the simple O(diameter) variant;
for 100 TB graphs with long chains, the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond") halves
the diameter per round — same join/aggregate building blocks, different
edge rewiring. Near-dup graphs are overwhelmingly star-shaped (clusters
of copies), where min-label converges in 2-3 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Below this edge count the component graph fits comfortably on the
# driver (~tens of MB) and union-find beats the distributed loop's
# per-iteration job-scheduling floor by ~10x. Near-dup graphs after LSH
# candidate filtering are orders of magnitude smaller than the corpus
# (only docs in some candidate pair appear), so even at 100 TB corpus
# scale the edge list is routinely under this bound; when it isn't, the
# distributed min-label loop below handles it with bounded driver memory.
SMALL_GRAPH_EDGES = 1_000_000


def _unionfind_components(rows) -> list:
    """Driver-side union-find with path compression over a collected
    edge list; labels each node with the min member of its component
    (same contract as the distributed loop)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    min_member: dict = {}
    for x in parent:
        r = find(x)
        m = min_member.get(r)
        if m is None or x < m:
            min_member[r] = x
    return [(x, min_member[find(x)]) for x in parent]


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Label each node with the minimum node id reachable from it
    (= component id). Returns (node, component).

    edges: undirected pair list (each pair once is fine — both
    directions are added internally).

    Scale-adaptive: counts the (already materialized) edge list first;
    small graphs are solved with driver union-find in one collect, large
    graphs fall through to the distributed min-label loop. The count is
    ~free (it reads the checkpointed blocks) and the decision is a
    bounded-memory guard, not a hope — the distributed path stays fully
    tested (see tests/test_operators.py) and kicks in automatically.
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = fwd.union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    # materialize the edge list ONCE: the loop reads it every iteration,
    # and an unmaterialized plan would re-run the (possibly expensive)
    # upstream candidate-generation pipeline per iteration
    und = und.localCheckpoint()
    if und.count() <= small_graph_edges:
        spark = und.sparkSession
        labeled = _unionfind_components([(r.u, r.v) for r in und.collect()])
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("node", und.schema["u"].dataType),
                StructField("component", und.schema["u"].dataType),
            ]
        )
        return spark.createDataFrame(labeled, schema)
    from pyspark.sql import Observation

    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        # each node proposes its current label to every neighbor
        proposals = (
            und.join(labels, und.u == labels.node)
            .select(F.col("v").alias("node"), F.col("component"), F.lit(0).alias("is_old"))
        )
        # union the node's OWN current label (is_old=1) with neighbor
        # proposals; one aggregate yields both the propagated min-label
        # and the node's previous label — the previous label rides along
        # so convergence needs no extra join against the old frame
        propagated = (
            labels.select("node", "component", F.lit(1).alias("is_old"))
            .unionByName(proposals)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("is_old") == 1, F.col("component"))).alias(
                    "old_comp"
                ),
            )
        )
        # pointer jumping: component ids ARE node ids, so shortcut each
        # label to its label's label — O(diameter) becomes O(log diameter)
        new_labels = (
            propagated.alias("a")
            .join(
                propagated.select(
                    F.col("node").alias("_ln"), F.col("component").alias("_lc")
                ).alias("b"),
                F.col("a.component") == F.col("b._ln"),
                "left",
            )
            .select(
                F.col("a.node").alias("node"),
                F.coalesce(F.col("b._lc"), F.col("a.component")).alias("component"),
                F.col("a.old_comp").alias("old_comp"),
            )
            # localCheckpoint is load-bearing, persist() is NOT a
            # substitute: persist only short-circuits execution — the
            # LOGICAL plan still nests the previous iteration's tree
            # (labels appears ~4x per round), so analysis/plan-string
            # work grows 4^N and OOMs the driver around iteration 10.
            # Checkpointing replaces the plan with a LogicalRDD leaf.
            # lazy: materialized by the observed count below, so each
            # iteration costs ONE job. Old checkpoint blocks are freed
            # by the ContextCleaner when the superseded DataFrame is
            # garbage-collected.
            .localCheckpoint(eager=False)
        )
        # convergence piggybacks on the materialization job via observe:
        # the changed-count is computed as a metric of the same action
        # that checkpoints the labels — no second join, no second job.
        # At cluster scale each avoided job is a full scheduler
        # round-trip per iteration.
        obs = Observation()
        observed = new_labels.observe(
            obs,
            # coalesce: sum over an EMPTY frame is null, which would
            # read as "changed" and spin the loop to max_iter
            F.coalesce(
                F.sum((F.col("component") != F.col("old_comp")).cast("long")),
                F.lit(0),
            ).alias("changed"),
        )
        observed.count()
        labels = new_labels.select("node", "component")
        if obs.get["changed"] == 0:
            break
    return labels
