"""Shared connected-components routine (pointer-doubled hash-min).

ONE implementation serving both duplicate-cluster assignment
(``operators.dedup.dedup_clusters``) and owl:sameAs canonicalization
(``operators.canon.sameas_components``) — the two call sites previously
carried diverging copies, and only the dedup twin had the pointer-doubling
+ raise-on-non-convergence hardening (round-4 verdict item 1). Unconverged
labels under-deduplicate in one caller and under-canonicalize (splitting
one real-world entity into several) in the other; neither may ever be
silent.

Algorithm — hash-min label propagation with pointer doubling:

- every node starts labelled with itself;
- each round a node takes the min label among itself and its neighbours
  (the hash-min step), then replaces its label by its label's label (the
  shortcut / pointer-doubling step of large-star–small-star CC, cf. the
  Connected Components in MapReduce paper family in PAPERS.md);
- fixpoint when no label changes. Pointer doubling makes the round count
  O(log diameter) instead of O(diameter), so a 1M-node chain converges in
  ~20 rounds rather than needing a million.

Scale notes: the edge set is localCheckpoint'ed once so per-round jobs do
not re-run the (typically expensive: LSH banding, triple filters) upstream
lineage; each round is two small-table shuffles (neighbour min + pointer
join) over the EDGE graph, never the corpus; labels only decrease, so
``label[label] <= label`` holds and the pointer join needs no iteration
inside the round.

Reference parity: the reference resolves owl:sameAs/equivalence via
rdflib's in-memory graph traversal (single process); this is the
distributed equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_rounds: int = 20,
                         a_col: str = "a", b_col: str = "b",
                         distinct_edges: bool = False) -> DataFrame:
    """Undirected edge list → (node, label) with label = min node in the
    component.

    ``edges`` may contain duplicates and need not be symmetric (both
    directions are added here); callers that guarantee a distinct edge
    list (e.g. LSH candidate pairs, which end in dropDuplicates) pass
    ``distinct_edges=True`` to skip one full exchange of the edge set —
    the algorithm is insensitive to duplicate edges either way, the dedup
    only bounds the per-round join width. Isolated nodes (no edges) are
    the caller's concern — they simply do not appear and map to
    themselves downstream via ``coalesce``.

    Raises ``RuntimeError`` if labels still change after ``max_rounds``
    (component diameter > 2^max_rounds) — non-convergence must never be
    silent.
    """
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    if not distinct_edges:
        e = e.dropDuplicates()
    # materialize the edge set ONCE: `und` is joined every round, and its
    # upstream is typically the whole LSH-candidate pipeline or a full
    # triple-store filter — without this checkpoint each round's job
    # re-runs that lineage from scratch (O(rounds x upstream) instead of
    # O(upstream + rounds x CC))
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))) \
        .localCheckpoint(eager=False)
    # SEED = the first hash-min + pointer step, join-free (r6): at
    # initialization every label is the node itself, so the minimum
    # neighbour LABEL is simply the minimum neighbour ID — one aggregate
    # over the edge set replaces round 1's und ⋈ labels join, and the
    # pointer shortcut is the usual self-join. Also subsumes the old
    # distinct-nodes labels init (same exchange).
    mb = (und.groupBy(F.col("a").alias("node"))
          .agg(F.min("b").alias("mb")))
    stepped = mb.select("node", F.least(F.col("node"), F.col("mb"))
                        .alias("label"))
    ptr = stepped.select(F.col("node").alias("pnode"),
                         F.col("label").alias("plabel"))
    labels = (stepped.join(ptr, stepped.label == ptr.pnode, "left")
              .select("node", F.coalesce("plabel", "label").alias("label"))
              .localCheckpoint(eager=False))
    def _halfstep(cur: DataFrame) -> DataFrame:
        """One hash-min + pointer-doubling step over (node, old_label,
        label); ``old_label`` rides through untouched."""
        neigh = (und.join(cur.select(F.col("node").alias("bnode"), "label"),
                          und.b == F.col("bnode"))
                 .groupBy(F.col("a").alias("node"))
                 .agg(F.min("label").alias("nbr_label")))
        stepped = (cur.join(neigh, "node", "left")
                   .select("node", "old_label",
                           F.least(F.col("label"),
                                   F.coalesce("nbr_label", F.col("label")))
                           .alias("label")))
        # pointer doubling: replace each label by its label's label
        # (labels only decrease, so label[label] <= label always holds)
        ptr = stepped.select(F.col("node").alias("pnode"),
                             F.col("label").alias("plabel"))
        return (stepped.join(ptr, stepped.label == ptr.pnode, "left")
                .select("node", "old_label",
                        F.coalesce("plabel", "label").alias("label")))

    converged = False
    # TWO half-steps per driver round-trip (the resolver-loop device): the
    # first stays lazy, only the second is checkpointed + counted, so the
    # fixed per-action cost (AQE stage scheduling + count job) is paid
    # half as often. Labels only decrease monotonically, so "no change
    # across two steps" <=> "no change in either step" — the convergence
    # check is exact, and with the join-free seed step above the total
    # half-step budget is 1 + 2*ceil(max_rounds/2) >= max_rounds, so the
    # 2^max_rounds diameter contract is preserved.
    for _ in range((max_rounds + 1) // 2):
        cur = labels.select("node", F.col("label").alias("old_label"),
                            "label")
        merged = _halfstep(_halfstep(cur)).localCheckpoint(eager=False)
        # carry old+new label in one checkpointed frame so the convergence
        # check is a single count on the frame that materializes the round
        changed = merged.where(F.col("label") != F.col("old_label")).count()
        labels = merged.select("node", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"(component diameter > 2^{max_rounds}); raise max_rounds")
    return labels
