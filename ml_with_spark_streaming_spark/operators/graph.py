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
  long-chain graphs, alternating large-star/small-star (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14 — the
  same join+min dataflow per round) converges in O(log n) rounds;
  swap it in if a workload ever shows deep chains.
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

    Raises RuntimeError if the graph has not converged after
    ``max_iter`` rounds (diameter larger than ``max_iter``): partial
    labels are never returned silently.
    """
    # Materialize the edge list BEFORE symmetrizing: the union's two
    # branches each re-run the (possibly expensive — e.g. MinHash+
    # verify) upstream pipeline otherwise, and ReuseExchange can't fire
    # across the differing projections.
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(eager=True)
    sym = e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = sym.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    labels = labels.localCheckpoint(eager=True)

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
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
