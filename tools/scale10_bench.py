"""10x scale-proof bench for the dedup / curation / embedding / KG
families (round-3 item 7, round-4 items 1/3/6).

Builds an sf1-equivalent corpus (10x the sf0.1 table) whose duplicate
structure scales EXACTLY 10x, then runs a query family at both scales,
interleaved, medians of N reps:

- documents: each copy gets a copy-specific LETTER ROTATION — a character
  bijection, so text length, token counts, and the intra-copy duplicate
  structure are exactly preserved while cross-copy shingles never collide.
- embeddings (family "emb"): each copy multiplies every vector by a
  copy-specific DETERMINISTIC SIGN PATTERN (a diagonal orthogonal matrix),
  so intra-copy cosines — and therefore near-dup pairs and LSH bucket
  structure — are exactly preserved, while cross-copy cosines of the same
  base vector are ~0 (half the signs differ).
- kg (family "kg"): the synthetic ontology pipeline at 10x the document
  count (10k classes -> 100k classes), no table build needed.
- hotunit (family "hotunit"): chunk/line dedup on a corpus where ONE unit
  repeats 10^6 times — the 100-TB boilerplate-skew stress — A/B'd against
  the legacy row_number-window implementation on the same input.

Prints one JSON line:
  {"queries": {name: {"sf01_med": s, "sf1eq_med": s, "ratio": r,
               "exchanges_sf01": n, "exchanges_sf1eq": n}},
   "docs": {"sf01": n, "sf1eq": n}, "reps": N}

A ratio <= ~10 (data grew 10x) with identical exchange counts is the
near-linear evidence; superlinear growth or extra exchanges at 10x would
flag a plan that does not survive scale-up.

Usage: python tools/scale10_bench.py [reps] [out_dir] [family]
       family in {dedup (default), curate, emb, kg, hotunit, linking,
                  graph}

- graph (family "graph"): BGP matching + RDFS entailment over a synthetic
  triples frame whose instance side scales 10x while the schema (closure
  depth, broadcast frames) stays constant — the 100-TB shape for graph
  queries.
"""

from __future__ import annotations

import json
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rdf_dtdl_fabric_ontology_converter_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
QUERIES = ["dedup_exact", "dedup_simhash", "dedup_minhash_lsh",
           "dedup_ngram_jaccard", "dedup_clusters", "dedup_pipeline"]


ROT_SRC = "etaoinshrd"  # 10 frequent letters; copy i rotates them by i


def build_corpus(out_dir: str) -> str:
    """10 letter-rotated copies of the sf0.1 documents table ->
    out_dir/documents.parquet (copy 0 is the original)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    dst = out / "documents.parquet"
    if not dst.exists():
        con = duckdb.connect()
        cases = " ".join(
            f"WHEN t.i = {i} THEN translate(d.text, '{ROT_SRC}', "
            f"'{ROT_SRC[i:] + ROT_SRC[:i]}')"
            for i in range(1, 10))
        con.execute(f"""
        COPY (
          SELECT d.doc_id * 10 + t.i AS doc_id,
                 CASE WHEN t.i = 0 THEN d.text {cases} END AS text,
                 d.lang, d.source, d.n_chars
          FROM read_parquet('{SF01}/documents.parquet') d,
               (SELECT unnest(range(10)) AS i) t
        ) TO '{dst}' (FORMAT PARQUET)
        """)
        con.close()
    return str(out)


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


CURATE_QUERIES = ["chunk_dedup", "substring_dedup", "score_linear",
                  "decontaminate", "sample_stratified",
                  "pack_shards", "pack_shards_greedy", "curate_corpus"]
EMB_QUERIES = ["semantic_dedup", "emb_near_dup", "ann_lsh_buckets",
               "ann_ivf_topk"]


def emb_scaled_queries(big: bool) -> dict:
    """The embedding family with PRODUCTION tuning at each scale: LSH
    bucket count 2**n_planes scales with the corpus (4 planes at sf0.1,
    8 at 10x — constant bucket occupancy, so within-bucket pair cost
    scales linearly), with a second band recovering the recall the extra
    planes cost (the n_bands knob). Timing both scales at the sf0.1
    tuning would measure a mis-configured job: with fixed buckets the
    pair set grows quadratically by construction."""
    from rdf_dtdl_fabric_ontology_converter_spark.operators.curate import semantic_dedup
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dedup import (
        embedding_near_duplicates)
    planes = 8 if big else 4
    dim = 64

    def read(spark, sf_dir):
        return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                .select("vec_id", "embedding"))

    return {
        "semantic_dedup": lambda spark, sf_dir: semantic_dedup(
            read(spark, sf_dir), threshold=0.45, dim=dim, n_planes=planes,
            n_bands=2, max_bucket=5000),
        "emb_near_dup": lambda spark, sf_dir: embedding_near_duplicates(
            read(spark, sf_dir), threshold=0.45, dim=dim, n_planes=planes,
            n_bands=2, max_bucket=5000),
        "ann_lsh_buckets": entrymod.queries()["ann_lsh_buckets"],
        "ann_ivf_topk": entrymod.queries()["ann_ivf_topk"],
    }


def build_emb_corpus(out_dir: str) -> str:
    """10 sign-flipped copies of the sf0.1 embeddings table ->
    out_dir/embeddings.parquet (copy 0 is the original). The sign pattern
    is a diagonal orthogonal transform: intra-copy dot products (and so
    every near-dup pair and LSH bucket) are exactly preserved; cross-copy
    dot products of the same base vector are ~0 because ~half the
    component signs differ between any two copy patterns."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    dst = out / "embeddings.parquet"
    if not dst.exists():
        t = pq.read_table(f"{SF01}/embeddings.parquet")
        emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
        vec_id = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        label = np.array(t["label"].to_pylist(), dtype=np.int32)
        dim = emb.shape[1]
        ids, labels, vecs = [], [], []
        k = np.arange(dim)
        for i in range(10):
            signs = (np.ones(dim) if i == 0 else
                     np.where((k * (2 * i + 1) + i) % 10 < 5, -1.0, 1.0))
            vecs.append(emb * signs.astype(np.float32))
            ids.append(vec_id * 10 + i)
            labels.append(label)
        pq.write_table(pa.table({
            "vec_id": np.concatenate(ids),
            "embedding": pa.array(np.concatenate(vecs).tolist(),
                                  pa.list_(pa.float32())),
            "label": np.concatenate(labels)}), dst)
    return str(out)


def run_kg_family(spark, reps: int) -> dict:
    """kg_full_synth at sf0.1 volume (1k docs / 10k classes) vs 10x
    (10k docs / 100k classes) — the entity pipeline's scale point."""
    from rdf_dtdl_fabric_ontology_converter_spark.plans.pipeline import run_pipeline
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import synth_documents

    def run(n):
        res = run_pipeline(spark, synth_documents(spark, n, partitions=64))
        df = res.entity_types
        df.write.format("noop").mode("overwrite").save()
        return df

    run(100)  # warmup
    times = {"sf01": [], "sf1eq": []}
    for rep in range(reps):
        for name, n in (("sf01", 1000), ("sf1eq", 10000)):
            t0 = time.time()
            run(n)
            times[name].append(round(time.time() - t0, 2))
            print(f"rep{rep} kg_full_synth n={n}: {times[name][-1]}s",
                  file=sys.stderr)
    m01 = statistics.median(times["sf01"])
    m10 = statistics.median(times["sf1eq"])
    return {"queries": {"kg_full_synth": {
        "sf01_med": m01, "sf1eq_med": m10,
        "ratio": round(m10 / m01, 2),
        "sf01_all": times["sf01"], "sf1eq_all": times["sf1eq"],
        "exchanges_sf01": n_exchanges(run(1000)),
        "exchanges_sf1eq": n_exchanges(run(10000))}},
        "docs": {"sf01": 1000, "sf1eq": 10000}, "reps": reps}


def _legacy_dedup_units(documents, delim="\n"):
    """The PRE-round-4 first-occurrence implementation (row_number over a
    window partitioned by the unit hash) — kept here only as the skew A/B
    baseline; a hot unit's every copy sorts in ONE task."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window
    units = documents.select(
        "doc_id", F.posexplode(F.split(F.col("text"), delim))
        .alias("idx", "unit"))
    w = Window.partitionBy(F.md5("unit")).orderBy("doc_id", "idx")
    keep = F.row_number().over(w) == 1
    return (units.withColumn("k", keep.cast("long"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_units"),
                 F.sum("k").alias("n_kept")))


def build_hot_corpus(spark, n_docs: int):
    """n_docs two-line documents where line 1 is the SAME boilerplate
    everywhere (n_docs copies of one unit — web-scale boilerplate skew)
    and line 2 is unique. Generated distributed (spark.range), no collect."""
    import pyspark.sql.functions as F
    hot = "subscribe to our newsletter for updates and offers today"
    return (spark.range(n_docs)
            .select(F.col("id").cast("string").alias("doc_id"),
                    F.concat(F.lit(hot + "\n"),
                             F.lit("unique line number "),
                             F.col("id").cast("string"),
                             F.lit(" with trailing pad tokens"))
                    .alias("text")))


def run_linking_family(spark, reps: int, sf1eq: str) -> dict:
    """Entity linking at sf0.1 vs the 10x letter-rotated corpus: 1-2-gram
    mentions over EVERY doc, linked against the corpus's own top-20-token
    dictionary (exact broadcast tier + fuzzy trigram tier). Mentions
    scale with the corpus; the dictionary stays 20 entities (broadcast),
    so the expected cost is ~linear in documents."""
    import pyspark.sql.functions as F
    from rdf_dtdl_fabric_ontology_converter_spark.operators.linking import (
        extract_mentions, link_mentions)

    def run(sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        spans = docs.select("doc_id", F.array(F.struct(
            F.lit("text").alias("kind"), F.col("text").alias("text"),
            F.lit(None).cast("string").alias("media_ref"))).alias("spans"))
        top = (docs.select(F.explode(
            F.split(F.trim("text"), r"\s+")).alias("tok"))
            .groupBy("tok").count()
            .orderBy(F.desc("count"), "tok").limit(20))
        ents = top.select(
            F.concat(F.lit("E_"), "tok").alias("id"),
            F.col("tok").alias("name"),
            F.concat(F.lit("http://example.org/tok/"), "tok")
            .alias("class_uri"))
        return link_mentions(
            extract_mentions(spans, max_ngram=2, min_len=4), ents)

    run(SF01).write.format("noop").mode("overwrite").save()  # warm
    times = {"sf01": [], "sf1eq": []}
    for rep in range(reps):
        for name, sf_dir in (("sf01", SF01), ("sf1eq", sf1eq)):
            t0 = time.time()
            run(sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 2))
            print(f"rep{rep} linking {name}: {times[name][-1]}s",
                  file=sys.stderr)
    m01 = statistics.median(times["sf01"])
    m10 = statistics.median(times["sf1eq"])
    return {"queries": {"entity_linking_full": {
        "sf01_med": m01, "sf1eq_med": m10,
        "ratio": round(m10 / m01, 2),
        "sf01_all": times["sf01"], "sf1eq_all": times["sf1eq"],
        "exchanges_sf01": n_exchanges(run(SF01)),
        "exchanges_sf1eq": n_exchanges(run(sf1eq))}},
        "reps": reps}


def run_hotunit_family(spark, reps: int) -> dict:
    """line_dedup on 10^5 / 10^6 / 10^7 copies of one hot unit vs the
    legacy window implementation at each scale — the skew A/B with a
    survivor-count-identical semantics check. Expected shape: legacy wins
    on constant factors while its single-task hot-key sort is still
    cheap, the new min-struct plan crosses over by 10^7 copies (and its
    growth stays sublinear because NO stage's task input is proportional
    to the hot-unit multiplicity)."""
    from rdf_dtdl_fabric_ontology_converter_spark.operators.curate import line_dedup
    import pyspark.sql.functions as F

    def bench(fn, label, n):
        runs = []
        for rep in range(n):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 2))
            print(f"rep{rep} {label}: {runs[-1]}s", file=sys.stderr)
        return runs

    sizes = [100_000, 1_000_000, 10_000_000]
    corpora = {}
    result = {"queries": {}, "reps": reps, "hot_copies": sizes}
    for n_docs in sizes:
        d = build_hot_corpus(spark, n_docs).localCheckpoint()
        corpora[n_docs] = d
        if n_docs == sizes[0]:
            line_dedup(d).write.format("noop").mode("overwrite").save()
        n_reps = reps if n_docs < 10_000_000 else max(2, reps - 1)
        t_new = bench(lambda: line_dedup(d).write.format("noop")
                      .mode("overwrite").save(), f"new hot{n_docs}", n_reps)
        t_leg = bench(lambda: _legacy_dedup_units(d).write.format("noop")
                      .mode("overwrite").save(), f"LEGACY hot{n_docs}",
                      n_reps)
        result["queries"][f"line_dedup_hot{n_docs}"] = {
            "new_med": statistics.median(t_new),
            "legacy_med": statistics.median(t_leg),
            "legacy_over_new": round(statistics.median(t_leg) /
                                     statistics.median(t_new), 2),
            "new_all": t_new, "legacy_all": t_leg,
            "exchanges_new": n_exchanges(line_dedup(d)),
        }
    # semantics check at 10^6: survivor counts identical between impls
    d = corpora[1_000_000]
    new_kept = line_dedup(d).agg(F.sum("n_kept")).collect()[0][0]
    old_kept = _legacy_dedup_units(d).agg(F.sum("n_kept")).collect()[0][0]
    assert new_kept == old_kept, (new_kept, old_kept)
    result["kept_units_1e6"] = int(new_kept)
    return result


def build_graph_triples(spark, n_inst: int, depth: int = 50):
    """Synthetic triples frame whose INSTANCE side scales with n_inst while
    the schema stays ontology-bounded (the 100-TB shape): a depth-``depth``
    subClassOf chain C0 ⊑ … ⊑ C{depth}, one property with domain/range +
    a subPropertyOf parent, n_inst typed subjects round-robined over the
    chain classes, and a ring of rel statements. Generated distributed
    (spark.range), no collect."""
    import pyspark.sql.functions as F
    EX = "http://example.org/"
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    inst = spark.range(n_inst).repartition(64)
    subj = F.concat(F.lit(EX + "s"), F.col("id"))
    types = inst.select(
        subj.alias("subj"), F.lit(RDF_TYPE).alias("pred"),
        F.concat(F.lit(EX + "C"), F.col("id") % depth).alias("obj"),
        F.lit("iri").alias("obj_kind"))
    rels = inst.select(
        subj.alias("subj"), F.lit(EX + "rel").alias("pred"),
        F.concat(F.lit(EX + "s"), (F.col("id") + 1) % n_inst).alias("obj"),
        F.lit("iri").alias("obj_kind"))
    chain = spark.range(depth).select(
        F.concat(F.lit(EX + "C"), F.col("id")).alias("subj"),
        F.lit(RDFS + "subClassOf").alias("pred"),
        F.concat(F.lit(EX + "C"), F.col("id") + 1).alias("obj"),
        F.lit("iri").alias("obj_kind"))
    fixed = spark.createDataFrame([
        (EX + "rel", RDFS + "domain", EX + "DomC", "iri"),
        (EX + "rel", RDFS + "range", EX + "RngC", "iri"),
        (EX + "rel", RDFS + "subPropertyOf", EX + "related", "iri"),
    ], ["subj", "pred", "obj", "obj_kind"])
    return types.unionByName(rels).unionByName(chain).unionByName(fixed)


def run_graph_family(spark, reps: int, n01: int = 50_000) -> dict:
    """BGP matching + RDFS entailment at 1x vs 10x instance-triple volume.
    The schema (closures, broadcast frames) is constant; only the
    instance side grows — ratio ~10 with constant exchange counts is the
    plan-survives-scale-up evidence. Entailment OUTPUT grows ~(depth/2)x
    the typed instances (every subject gains its chain ancestors), so its
    cost is linear in rows written, not in joins performed."""
    import pyspark.sql.functions as F  # noqa: F401
    from rdf_dtdl_fabric_ontology_converter_spark.operators.bgp import match_bgp
    from rdf_dtdl_fabric_ontology_converter_spark.operators.entailment import (
        rdfs_entailment)
    EX = "http://example.org/"
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    SUB = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    DEPTH = 20  # entailment output ~ (DEPTH/2 + 3) x typed instances

    def graph(n):
        return build_graph_triples(spark, n, DEPTH).localCheckpoint()

    graphs = {"sf01": graph(n01), "sf1eq": graph(n01 * 10)}
    queries = {
        "bgp_3pattern": lambda t: match_bgp(t, [
            ("?s", RDF_TYPE, "?c"),
            ("?s", EX + "rel", "?o"),
            ("?o", RDF_TYPE, "?c2"),
        ], distinct=False),
        "bgp_path_join": lambda t: match_bgp(t, [
            ("?s", RDF_TYPE, "?c"),
            ("?c", SUB + "+", EX + f"C{DEPTH}"),
        ]),
        "rdfs_entailment": lambda t: rdfs_entailment(t),
        # round-5 additions: UNION outer-union + MINUS anti-join at
        # instance scale (2n solution rows), and SHACL validation whose
        # sh:class check is the instance x instance value join
        "bgp_union_minus": lambda t: match_bgp(
            t, [("?s", RDF_TYPE, "?c")],
            union=[[("?s", EX + "rel", "?o")]],
            minus=[[("?s", EX + "rel", EX + "s0")]], distinct=False),
        "shacl_validate": lambda t: _shacl(t),
        # late round-5 additions: zero-or-more with BOTH endpoints
        # variable — the spec-mandated full-term identity (one distinct
        # over subj ∪ obj, linear in instances) plus the schema-bounded
        # closure — and a negated property set (one pushed-down NOT-IN
        # scan, no join at all)
        "bgp_path_star": lambda t: match_bgp(
            t, [("?s", SUB + "*", "?y")]),
        "bgp_nps": lambda t: match_bgp(
            t, [("?s", "!" + RDF_TYPE, "?o")], distinct=False),
    }

    def _shacl(t):
        from rdf_dtdl_fabric_ontology_converter_spark.operators.shacl import (
            validate_shapes)
        shapes = [{"shape_id": "InstShape", "target_class": EX + "C0",
                   "properties": [{"path": EX + "rel", "min_count": 1,
                                   "max_count": 1, "class": EX + "C1"}]}]
        return validate_shapes(t, shapes)
    queries["bgp_3pattern"](graphs["sf01"]).write.format("noop") \
        .mode("overwrite").save()  # warm
    times = {q: {"sf01": [], "sf1eq": []} for q in queries}
    for rep in range(reps):
        for sf_name in ("sf01", "sf1eq"):
            for q, fn in queries.items():
                t0 = time.time()
                fn(graphs[sf_name]).write.format("noop") \
                    .mode("overwrite").save()
                times[q][sf_name].append(round(time.time() - t0, 2))
                print(f"rep{rep} {sf_name} {q}: {times[q][sf_name][-1]}s",
                      file=sys.stderr)
    result = {"queries": {}, "reps": reps,
              "instances": {"sf01": n01, "sf1eq": n01 * 10},
              "chain_depth": DEPTH}
    for q, fn in queries.items():
        m01 = statistics.median(times[q]["sf01"])
        m10 = statistics.median(times[q]["sf1eq"])
        result["queries"][q] = {
            "sf01_med": m01, "sf1eq_med": m10,
            "ratio": round(m10 / m01, 2) if m01 else None,
            "sf01_all": times[q]["sf01"], "sf1eq_all": times[q]["sf1eq"],
            "exchanges_sf01": n_exchanges(fn(graphs["sf01"])),
            "exchanges_sf1eq": n_exchanges(fn(graphs["sf1eq"])),
        }
    return result


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1eq"
    family = sys.argv[3] if len(sys.argv) > 3 else "dedup"
    global QUERIES
    if family == "curate":
        QUERIES = CURATE_QUERIES
    elif family == "emb":
        QUERIES = EMB_QUERIES
    if family in ("kg", "hotunit", "linking", "graph"):
        spark = build_session(app="scale10", master="local[32]",
                              shuffle_partitions=64,
                              extra={"spark.ui.enabled": "false",
                                     "spark.driver.memory": "16g"})
        if family == "kg":
            result = run_kg_family(spark, reps)
        elif family == "hotunit":
            result = run_hotunit_family(spark, reps)
        elif family == "graph":
            result = run_graph_family(spark, reps)
        else:
            result = run_linking_family(spark, reps, build_corpus(out_dir))
        result["family"] = family
        print(json.dumps(result))
        spark.stop()
        return
    sf1eq = (build_emb_corpus(out_dir) if family == "emb"
             else build_corpus(out_dir))

    spark = build_session(app="scale10", master="local[32]",
                          shuffle_partitions=64,
                          extra={"spark.ui.enabled": "false",
                                 "spark.driver.memory": "16g"})
    qs = entrymod.queries()

    times: dict[str, dict[str, list[float]]] = {
        q: {"sf01": [], "sf1eq": []} for q in QUERIES}
    # warmup: one small run to absorb codegen/python-worker ramp
    qs["dedup_exact"](spark, SF01).write.format("noop") \
        .mode("overwrite").save()

    def fn_for(q, sf_name):
        if family == "emb":
            return emb_scaled_queries(big=(sf_name == "sf1eq"))[q]
        return qs[q]

    for rep in range(reps):
        for sf_name, sf_dir in (("sf01", SF01), ("sf1eq", sf1eq)):
            for q in QUERIES:
                t0 = time.time()
                fn_for(q, sf_name)(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                times[q][sf_name].append(round(time.time() - t0, 2))
                print(f"rep{rep} {sf_name} {q}: {times[q][sf_name][-1]}s",
                      file=sys.stderr)

    result = {"queries": {}, "reps": reps}
    for q in QUERIES:
        m01 = statistics.median(times[q]["sf01"])
        m10 = statistics.median(times[q]["sf1eq"])
        result["queries"][q] = {
            "sf01_med": m01, "sf1eq_med": m10,
            "ratio": round(m10 / m01, 2) if m01 else None,
            "sf01_all": times[q]["sf01"], "sf1eq_all": times[q]["sf1eq"],
            "exchanges_sf01": n_exchanges(fn_for(q, "sf01")(spark, SF01)),
            "exchanges_sf1eq": n_exchanges(fn_for(q, "sf1eq")(spark, sf1eq)),
        }
    table = "embeddings" if family == "emb" else "documents"
    result["family"] = family
    result["docs"] = {
        "sf01": spark.read.parquet(f"{SF01}/{table}.parquet").count(),
        "sf1eq": spark.read.parquet(f"{sf1eq}/{table}.parquet").count(),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
