"""Evaluate parsed SPARQL text over the triples DataFrame.

``functions/sparql.parse`` turns the query string into a spec dict; this
module binds it to the operator layer: BGP matching with
OPTIONAL/UNION/MINUS/EXISTS/VALUES/GRAPH (``bgp.match_bgp``), §11
aggregates (``bgp.aggregate_solutions``), ASK (``bgp.ask``), DESCRIBE
(``bgp.describe``). The split keeps parsing testable without a
SparkSession and keeps every scale decision in one audited place — the
parser adds NO new plan shapes, it only names the existing ones.

Solution-modifier semantics: a SELECT without DISTINCT returns the
solution MULTISET (SPARQL §18.5); ORDER BY / LIMIT / OFFSET apply last,
and a LIMIT without ORDER BY is still deterministic-per-plan but not
meaningful at 100 TB — callers wanting top-k should order. OFFSET uses
the native DataFrame offset (driver never collects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sparql import SEQ_VAR_PREFIX, SparqlError, parse
from .bgp import aggregate_solutions, ask, describe, match_bgp


def sparql_query(triples: DataFrame, text: str):
    """Run a SPARQL SELECT/ASK/DESCRIBE string over the triples frame.

    Returns a DataFrame for SELECT/DESCRIBE, a bool for ASK. Every
    unsupported construct raises ``SparqlError`` naming it — the engine
    never degrades a query silently.
    """
    spec = parse(text)
    if spec["form"] == "ask":
        pats, kw = spec["group"].bgp_kwargs()
        return ask(triples, pats, **kw)
    if spec["form"] == "construct":
        from .entailment import construct
        pats, kw = spec["group"].bgp_kwargs()
        bindings = match_bgp(triples, pats, distinct=False, **kw)
        if spec["limit"] is not None:
            bindings = bindings.limit(spec["limit"])
        return construct(bindings, spec["template"])
    if spec["form"] == "describe":
        if spec["var"] is not None:
            pats, kw = spec["group"].bgp_kwargs()
            seeds = match_bgp(triples, pats, select=[spec["var"][1:]],
                              distinct=True, **kw)
            return describe(triples, seeds)
        return describe(triples, spec["nodes"])
    return _eval_select(triples, spec)


def _eval_select(triples: DataFrame, spec: dict) -> DataFrame:
    """Evaluate a parsed SELECT spec; recursive for subqueries."""
    pats, kw = spec["group"].bgp_kwargs()
    binds = spec["group"].binds
    subqueries = spec["group"].subqueries
    if binds or subqueries:
        # subqueries JOIN the group's solution on their shared variables
        # (§18.2.2.7 then Join); BIND extends the solution AFTER the
        # joins (parser enforces no pattern consumes a bound var); the
        # group FILTER moves last so it may reference both
        fe = kw.pop("filter_expr", None)
        sol = match_bgp(triples, pats, distinct=False, **kw)
        for sub_spec in subqueries:
            sub = _eval_select(triples, sub_spec)
            shared = sorted(set(sub.columns) & set(sol.columns))
            if not shared:
                raise SparqlError(
                    f"sparql: subquery projects {sub.columns}, sharing no "
                    "variable with the outer group (unbounded product)")
            sol = sol.join(sub, on=shared)
        for v, sql in binds:
            sol = sol.withColumn(v, F.expr(sql))
        if fe:
            sol = sol.where(F.expr(fe))
    else:
        sol = match_bgp(triples, pats, distinct=False, **kw)
    # scalar SELECT expressions (§18.2.4.4 Extend): computed after the
    # group's joins/binds/filters, while term-metadata columns still exist
    for v, sql in spec.get("select_exprs", []):
        sol = sol.withColumn(v, F.expr(sql))
    hidden = [c for c in sol.columns
              if c.startswith(SEQ_VAR_PREFIX) or "$" in c]
    if hidden:
        # SequencePath intermediates: dropped WITHOUT dedup — the §18.2
        # translation keeps one solution per intermediate binding, which
        # is exactly the SPARQL multiset; SELECT DISTINCT collapses below
        sol = sol.drop(*hidden)
    if spec["aggs"]:
        out = aggregate_solutions(sol, spec["group_by"], spec["aggs"],
                                  having=spec["having"])
        # hidden aggregates registered by bare HAVING calls have served
        # their purpose once the having filter ran inside
        hidden_agg = [c for c in out.columns
                      if c.startswith(SEQ_VAR_PREFIX)]
        if hidden_agg:
            out = out.drop(*hidden_agg)
        if spec["distinct"]:
            out = out.dropDuplicates()
    else:
        if spec["select"]:
            missing = [v for v in spec["select"] if v not in sol.columns]
            if missing:
                raise SparqlError(
                    f"sparql: select variables {missing} not bound "
                    f"(have: {sorted(sol.columns)})")
            sol = sol.select(*spec["select"])
        out = sol.dropDuplicates() if spec["distinct"] else sol
    if spec["order"]:
        # a leading NUL marks an ORDER BY expression (SQL over the
        # projected columns); everything else is a plain variable name
        missing = [v for v, _ in spec["order"]
                   if not v.startswith("\x00") and v not in out.columns]
        if missing:
            raise SparqlError(f"sparql: ORDER BY variables {missing} not "
                              f"in the projection {out.columns}")
        keys = [(F.expr(v[1:]) if v.startswith("\x00") else F.col(v))
                for v, _ in spec["order"]]
        out = out.orderBy(*[k.desc() if d else k.asc()
                            for k, (_, d) in zip(keys, spec["order"])])
    if spec["offset"] is not None:
        out = out.offset(spec["offset"])
    if spec["limit"] is not None:
        out = out.limit(spec["limit"])
    return out
