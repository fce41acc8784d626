"""Stage B2: OWL class-expression resolution (J3) — iterative DataFrame loop.

Spark mapping of the reference ClassResolver
(reference: src/formats/rdf/class_resolver.py:44-209): resolve domain/range
nodes to concrete class URIs. Direct URIRef → itself; blank node →
owl:unionOf / owl:intersectionOf / owl:complementOf / owl:oneOf whose RDF
list (rdf:first / rdf:rest) is walked, cycle-safe, depth-capped at 10
(class_resolver.py:42).

Scale shape: the *expression subgraph* (triples whose predicate is one of
the six expression predicates) is tiny relative to the corpus — it is
filtered once, cached, and every round joins the (small, broadcast) frontier
against it. ≤10 rounds; per-round dropDuplicates + anti-join against the
visited set is the distributed cycle guard; localCheckpoint truncates
lineage (SURVEY §4 device 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import (OWL_COMPLEMENT_OF, OWL_INTERSECTION_OF, OWL_ONE_OF,
                OWL_UNION_OF, RDF_FIRST, RDF_NIL, RDF_REST)

_EXPR_PREDS = [OWL_UNION_OF, OWL_INTERSECTION_OF, OWL_COMPLEMENT_OF,
               OWL_ONE_OF, RDF_FIRST, RDF_REST]

MAX_DEPTH = 10  # reference ClassResolver.DEFAULT_MAX_DEPTH


def expression_subgraph(triples: DataFrame) -> DataFrame:
    """Materialized slice of the graph used by expression resolution.

    Tiny relative to the corpus (only the six expression predicates);
    localCheckpoint here so every resolver call and loop round joins against
    the materialized slice instead of re-scanning triples.
    """
    return (triples
            .where(F.col("pred").isin(_EXPR_PREDS))
            .select("subj", "pred", "obj", "obj_kind")
            .dropDuplicates(["subj", "pred", "obj"])
            .localCheckpoint(eager=False))


def resolve_class_targets(roots: DataFrame, expr: DataFrame,
                          max_depth: int = MAX_DEPTH) -> DataFrame:
    """roots(root_key, node) → (root_key, class_uri), order-insensitive.

    ``node`` values that are IRIs resolve to themselves; bnodes are expanded
    through the expression subgraph. Multiple roots resolve concurrently in
    one loop (all properties' domains/ranges at once — not per-property).

    Fast path: direct URIRef targets (the overwhelmingly common case) never
    enter the iterative loop — only bnode expression roots do.
    """
    all_roots = roots.select("root_key", "node").dropDuplicates()
    direct = all_roots.where(~F.col("node").startswith("_:")) \
        .select("root_key", F.col("node").alias("class_uri"))
    bnode_roots = all_roots.where(F.col("node").startswith("_:"))

    # single tagged frontier ('n' = class-expression node, 'l' = RDF list
    # node): ONE expr join and ONE driver action (the count materializing
    # the lazy checkpoint) per round, vs the old 2 joins + 5 jobs per round.
    frontier = (bnode_roots
                .select("root_key", F.lit("n").alias("tag"), "node")
                .localCheckpoint(eager=False))
    n_frontier = frontier.count()
    if n_frontier == 0:
        return direct

    # visited is a plain union of checkpointed frontiers: left_anti needs
    # no dedup, and each constituent is already materialized
    visited = frontier
    results_parts = [direct]

    for _ in range(max_depth):
        # IRIs in the node frontier are resolved classes (dedup at the end)
        results_parts.append(
            frontier.where((F.col("tag") == "n") &
                           ~F.col("node").startswith("_:"))
            .select("root_key", F.col("node").alias("class_uri")))

        expandable = frontier.where(
            (F.col("tag") == "l") | F.col("node").startswith("_:"))
        joined = expandable.join(F.broadcast(expr).hint("broadcast"),
                                 expandable.node == expr.subj)
        # routing: node --union/intersection/oneOf--> list head;
        #          node --complementOf--> node;
        #          list --first--> node;  list --rest (≠nil)--> list
        is_head = (F.col("tag") == "n") & F.col("pred").isin(
            [OWL_UNION_OF, OWL_INTERSECTION_OF, OWL_ONE_OF])
        is_comp = (F.col("tag") == "n") & (F.col("pred") == OWL_COMPLEMENT_OF)
        is_first = (F.col("tag") == "l") & (F.col("pred") == RDF_FIRST)
        is_rest = ((F.col("tag") == "l") & (F.col("pred") == RDF_REST) &
                   (F.col("obj") != RDF_NIL))
        frontier = (joined
                    .where(is_head | is_comp | is_first | is_rest)
                    .select("root_key",
                            F.when(is_comp | is_first, F.lit("n"))
                            .otherwise(F.lit("l")).alias("tag"),
                            F.col("obj").alias("node"))
                    .dropDuplicates()
                    .join(visited, ["root_key", "tag", "node"], "left_anti")
                    .localCheckpoint(eager=False))
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        visited = visited.unionByName(frontier)

    out = results_parts[0]
    for part in results_parts[1:]:
        out = out.unionByName(part)
    return out.dropDuplicates()
