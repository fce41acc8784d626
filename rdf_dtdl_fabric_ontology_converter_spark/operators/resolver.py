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
            .localCheckpoint())


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
    if bnode_roots.isEmpty():
        return direct

    nodes = bnode_roots
    lists = nodes.limit(0)
    results = direct
    visited_nodes = nodes.limit(0)
    visited_lists = lists.limit(0)

    for _ in range(max_depth):
        if nodes.isEmpty() and lists.isEmpty():
            break

        # 1) IRIs in the node frontier are resolved classes
        iris = nodes.where(~F.col("node").startswith("_:"))
        results = results.unionByName(
            iris.select("root_key", F.col("node").alias("class_uri")))

        # 2) bnode expansion through union/intersection/oneOf (→ list heads)
        #    and complementOf (→ node frontier)
        bnodes = nodes.where(F.col("node").startswith("_:"))
        expanded = bnodes.join(F.broadcast(expr).hint("broadcast"),
                               bnodes.node == expr.subj)
        new_lists = (expanded
                     .where(F.col("pred").isin([OWL_UNION_OF, OWL_INTERSECTION_OF,
                                                OWL_ONE_OF]))
                     .select("root_key", F.col("obj").alias("node")))
        new_nodes_c = (expanded
                       .where(F.col("pred") == OWL_COMPLEMENT_OF)
                       .select("root_key", F.col("obj").alias("node")))

        # 3) list walk: rdf:first → node frontier; rdf:rest → stay in lists
        walked = lists.join(F.broadcast(expr).hint("broadcast"),
                            lists.node == expr.subj)
        new_nodes_f = (walked.where(F.col("pred") == RDF_FIRST)
                       .select("root_key", F.col("obj").alias("node")))
        new_lists_r = (walked.where((F.col("pred") == RDF_REST) &
                                    (F.col("obj") != RDF_NIL))
                       .select("root_key", F.col("obj").alias("node")))

        visited_nodes = visited_nodes.unionByName(nodes).dropDuplicates()
        visited_lists = visited_lists.unionByName(lists).dropDuplicates()

        nodes = (new_nodes_c.unionByName(new_nodes_f).dropDuplicates()
                 .join(visited_nodes, ["root_key", "node"], "left_anti")
                 .localCheckpoint())
        lists = (new_lists.unionByName(new_lists_r).dropDuplicates()
                 .where(F.col("node") != RDF_NIL)
                 .join(visited_lists, ["root_key", "node"], "left_anti")
                 .localCheckpoint())
        results = results.dropDuplicates().localCheckpoint()

    return results.dropDuplicates()
