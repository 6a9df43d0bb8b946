"""Distributed connected components over an edge DataFrame.

The fuzzy-dedup pipeline (``operators/dedup.py``) stops at verified
near-duplicate PAIRS; turning pairs into duplicate CLUSTERS — so a
keep-list can retain exactly one canonical document per cluster — is a
connected-components problem on the pair graph.

Scale design:
* Min-label propagation: every round is one hash join (labels onto the
  symmetrized edge list, keyed by node) plus one ``groupBy(node).min``
  (map-side combined) plus one ``least`` merge — all shuffle-keyed on
  node id, all whole-stage codegen. No driver-side graph state ever
  exists; the driver holds only the per-round changed-count.
* Rounds = component diameter. Near-dup clusters produced by
  LSH-band overlap are dense (often cliques), so diameter is small
  (2–4) and the loop converges in a handful of rounds. For adversarial
  long-chain graphs (diameter > ``max_iter``), the loop HANDS OFF to
  alternating large-star/small-star contraction (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14 — the same
  join+min dataflow per round) which converges in O(log n) rounds —
  deep chains degrade to the logarithmic algorithm instead of
  aborting.
* ``localCheckpoint(eager=True)`` after every round truncates lineage:
  iterative DataFrame loops otherwise re-plan (and at 100 TB, re-run)
  the entire history each round and the plan grows without bound.
* Labels only ever decrease, so convergence detection is a cheap
  ``new < old`` count on the joined label tables, one small action per
  round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it (= its component representative).

    Returns columns ``id, component``. Only nodes that appear in at
    least one edge are returned — callers treat absent nodes as
    singletons (their own component).

    Min-label propagation needs one round per unit of component
    diameter; if the graph has not converged after ``max_iter`` rounds
    (a deep-chain component), the remaining work is handed to
    ``star_components`` — O(log n) rounds regardless of diameter — so
    pathological chains converge instead of aborting. Partial labels
    are never returned silently either way.
    """
    # Materialize the edge list BEFORE symmetrizing: the union's two
    # branches each re-run the (possibly expensive — e.g. MinHash+
    # verify) upstream pipeline otherwise, and ReuseExchange can't fire
    # across the differing projections.
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(eager=True)
    # sym/labels checkpoints are LAZY: both still pin their RDDs for
    # the per-round reuse, but materialization folds into round 1's
    # job instead of costing two stand-alone jobs up front (round-11:
    # two fewer actions per CC call; at scale, two fewer full passes
    # over the edge list before the first propagation round)
    #
    # No ``.distinct()`` on sym (round-11): duplicate edges cannot
    # change a min aggregate (labels identical either way — parity
    # pinned), every dedup-pipeline caller feeds id1<id2 pair tables so
    # the union-with-swap creates no symmetric duplicates to begin
    # with, and the distinct cost a full shuffle + aggregate of the
    # 2x-edge table before round 1 (measured on a 3.5M-edge synthetic:
    # whole-CC min 15.2 s -> 8.5 s, p50 18.7 -> 10.2 s).
    sym = e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=False)

    labels = sym.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    labels = labels.localCheckpoint(eager=False)

    for _ in range(max_iter):
        # min label among each node's neighbors, proposed to the node
        proposals = (
            sym.join(labels.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        merged = labels.join(proposals, "id", "left").select(
            "id",
            F.col("label").alias("old"),
            F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
        )
        # lazy: the changed-count job below both materializes the
        # checkpoint AND returns the count — one job per round, not two
        merged = merged.localCheckpoint(eager=False)
        changed = merged.filter(F.col("label") < F.col("old")).count()
        labels = merged.select("id", "label")
        if changed == 0:
            return labels.withColumnRenamed("label", "component")
    # Deep-chain graph: contract every node to its current (partial)
    # label — progress so far is kept — and finish the contracted
    # graph with O(log n) star rounds, then map node -> label ->
    # component.
    la = labels.select(F.col("id").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("id").alias("b"), F.col("label").alias("lb"))
    contracted = (
        sym.join(la, "a")
        .join(lb, "b")
        .filter(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("id1"), F.col("lb").alias("id2"))
        .distinct()
    )
    comp = star_components(contracted).withColumnRenamed("id", "label")
    return labels.join(comp, "label", "left").select(
        "id", F.coalesce("component", "label").alias("component")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping_pct: int = 85,
    iters: int = 5,
    scale: int = 10**12,
) -> DataFrame:
    """Weighted PageRank over an edge DataFrame, in INTEGER fixed-point
    so the result is bit-reproducible at any partition layout (and
    hash-exact against a SQL twin): ranks are BIGINTs out of ``scale``,
    damping is the rational ``damping_pct/100``, and every division is
    floor division — no floating point anywhere, so the usual
    "summation order flips the last ulp" nondeterminism of distributed
    PageRank cannot occur.

    Per-iteration semantics (Brin & Page 1998, weighted variant):

    * ``contrib(u->v) = (rank(u) * w(u,v)) div outw(u)``
    * ``dangling = sum(rank(u))`` over nodes with no out-edge
    * ``rank'(v) = ((100-d)*(scale div n)
                    + d*(in(v) + dangling div n)) div 100``

    Scale shape: each iteration is ONE hash join of the (node-keyed)
    rank table onto the edge list plus one ``groupBy(dst).sum``
    (map-side combined) — the canonical join+aggregate PageRank
    dataflow that runs on any edge count; ``localCheckpoint`` truncates
    lineage per round exactly like ``connected_components``. Only two
    O(1) scalars cross the driver per round (the dangling mass; the
    node count once up front) — the rank vector itself never leaves
    the cluster.

    int64 bound: ``rank * w <= scale * max_weight`` must stay below
    2^63, i.e. ``max_weight < 9.2e6`` at the default scale. Edges are
    pre-aggregated per (src, dst) here; for heavier multigraphs,
    normalize weights upstream or lower ``scale``.

    Returns ``id, rank`` (BIGINT, fixed-point out of ``scale``) for
    every node appearing in an edge.
    """
    w_expr = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), w_expr.alias("w"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outw = e.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("ow"))
    outw = outw.localCheckpoint(eager=True)
    base = scale // n
    d = damping_pct

    ranks = nodes.withColumn("r", F.lit(base).cast("long"))
    for it in range(iters):
        with_out = ranks.join(outw, "id", "left")
        # the dangling mass rides as a broadcast 1-row aggregate inside
        # the SAME round plan instead of a separate collect() action:
        # one job per round (the eager checkpoint), not two — same
        # integer arithmetic (dm and n are nonnegative, SQL `div` ==
        # Python // there), pinned by the unchanged q145 oracle
        dang = with_out.filter(F.col("ow").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm")
        )
        inc = (
            e.join(
                with_out.filter(F.col("ow").isNotNull()).withColumnRenamed("id", "u"),
                "u",
            )
            .select(F.col("v").alias("id"), F.expr("(r * w) div ow").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            nodes.join(inc, "id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                (
                    F.lit((100 - d) * base).cast("long")
                    + F.lit(d)
                    * (F.coalesce("inc", F.lit(0)) + F.expr(f"dm div {n}"))
                )
                .alias("num"),
            )
            .select("id", F.expr("num div 100").cast("long").alias("r"))
        )
        # Materialize every SECOND round (and always the last): one
        # checkpoint job then covers two iterations' joins+aggregates,
        # halving the per-round driver/job overhead and the number of
        # rank-table materializations, while bounding plan depth at two
        # rounds (round-11 A/B on q145, 6 alternating reps: stride-2
        # min 2.45->2.32 s, p50 3.47->3.11 s; stride-5 LOSES — the
        # un-truncated plan re-executes the shared with_out subtree).
        # Checkpoint placement cannot change the integer arithmetic —
        # stride-1 vs stride-2 row parity asserted, q145 oracle pins it.
        if (it + 1) % 2 == 0 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.withColumnRenamed("r", "rank")


def star_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_rounds: int = 60,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., SoCC'14): O(log n) rounds for ANY
    graph shape, vs min-label's O(diameter).

    Each round is two join+groupBy.min passes over the edge list —
    the same shuffle-keyed, map-side-combined dataflow per round as
    min-label, so the 100 TB story is unchanged; only the round count
    improves on deep chains.

    Invariant: edges are kept oriented (child > parent). Large-star
    hangs every bigger neighbor of ``u`` onto ``min(N(u) + [u])``;
    small-star re-hangs each node's smaller neighbors onto its local
    minimum. At the fixpoint the edge list is a star forest rooted at
    each component's minimum id.

    Returns ``id, component`` for every node appearing in an edge.
    Raises RuntimeError only if ``max_rounds`` (default 60 ≫
    log2(any realistic n)) is exhausted.
    """
    e0 = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.greatest(F.col(src), F.col(dst)).alias("c"),
            F.least(F.col(src), F.col(dst)).alias("p"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e0.select(F.col("c").alias("id"))
        .union(e0.select(F.col("p").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = e0
    prev_stats = None
    for _ in range(max_rounds):
        # large-star: neighbors of u from both orientations; hang each
        # strictly-bigger neighbor v onto m = min(N(u) + [u])
        nb = e.select(F.col("c").alias("u"), F.col("p").alias("v")).union(
            e.select(F.col("p").alias("u"), F.col("c").alias("v"))
        )
        mins = (
            nb.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("_mv", "u").alias("m"))
        )
        e = (
            nb.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("c"), F.col("m").alias("p"))
            .distinct()
        )
        # small-star: for each center c, m2 = min over its smaller
        # neighbors; re-hang the center and every smaller neighbor
        # (except m2 itself) onto m2
        mins2 = e.groupBy("c").agg(F.min("p").alias("m2"))
        hang_nbrs = (
            e.join(mins2, "c")
            .filter(F.col("p") != F.col("m2"))
            .select(F.col("p").alias("c"), F.col("m2").alias("p"))
        )
        hang_center = mins2.select("c", F.col("m2").alias("p"))
        e = hang_nbrs.union(hang_center).distinct().localCheckpoint(eager=False)
        stats = e.agg(
            F.count("*").alias("n"), F.sum(F.col("c") + F.col("p")).alias("s")
        ).collect()[0]
        stats = (stats["n"], stats["s"])
        if stats == prev_stats:
            # endpoint sums are non-increasing round over round, so a
            # stable (count, sum) means no edge moved; confirm the
            # star-forest shape (no parent is also a child) before
            # declaring victory
            if e.select("p").distinct().join(
                e.select(F.col("c").alias("p")), "p", "left_semi"
            ).isEmpty():
                comp = e.select(F.col("c").alias("id"), F.col("p").alias("component"))
                return nodes.join(comp, "id", "left").select(
                    "id", F.coalesce("component", F.col("id")).alias("component")
                )
        prev_stats = stats
    raise RuntimeError(f"star_components did not converge in {max_rounds} rounds")
