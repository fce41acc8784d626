"""Corpus-curation operators for large-scale training-data pipelines.

Beyond dedup (operators/dedup.py) a 100-TB pretraining pipeline needs the
curation steps that decide WHAT of the deduplicated corpus is trained on:

- :func:`decontaminate` — flag documents sharing any token n-gram with a
  benchmark/eval set (the classic pretraining decontamination pass).
- :func:`chunk_dedup` / :func:`line_dedup` — C4-style removal of repeated
  text units across the WHOLE corpus, keeping only the globally-first
  occurrence and reassembling the surviving document text.
- :func:`sample_stratified` — deterministic hash-bucket sampling with
  per-stratum rates (reproducible corpus mixing, no RNG state).
- :func:`pack_shards` — assign documents to contiguous output shards by a
  per-stratum cumulative token budget (training-shard sizing).

All pure pyspark.sql built-ins (split / posexplode / md5 / window /
aggregate) — no Python in the hot path; md5-based hashing so DuckDB
oracles reproduce every decision bit-for-bit.

Scale notes:
- decontaminate: the eval side is tiny by construction (benchmarks are
  KBs, the corpus is TBs) — its distinct shingles are broadcast, so the
  corpus side needs NO exchange beyond its own per-doc aggregate.
- chunk/line dedup: first occurrence per unit hash is a
  ``groupBy(unit_hash).agg(min(struct(key, idx, unit)))`` — map-side
  partial aggregation collapses a boilerplate unit repeated 10⁹×
  corpus-wide to ONE row per map partition before the exchange, so no
  reducer ever sees the hot hash's full row set (a ``row_number`` window
  here would sort every copy in a single task). The winning struct
  carries the unit text, so survivors regroup by doc from DISTINCT units
  only — the exploded unit set is shuffled exactly once, never joined
  back; per-doc totals come from a narrow array-size expression.
- sample_stratified: fully narrow — a projection + filter, no shuffle, and
  the decision is a pure function of (seed, doc_id), so re-runs and
  incremental extensions of the corpus keep prior decisions stable.
- pack_shards: per-stratum window; parallelism is bounded by the number of
  strata, so for a stratum that dominates the corpus pass ``sub_strata >
  1`` to salt the stratum into deterministic sub-streams first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import shingle_rows, tokens


def decontaminate(documents: DataFrame, eval_docs: DataFrame, n: int = 5,
                  text_col: str = "text", key_col: str = "doc_id"
                  ) -> DataFrame:
    """→ (key_col, n_overlap, contaminated): per-document count of distinct
    token ``n``-grams shared with ``eval_docs`` (the benchmark set).

    The eval set's distinct shingles are broadcast; the corpus side joins
    them against its own distinct (doc, shingle) rows, so overlap counting
    is set-semantics on both sides. Documents with zero overlap are kept
    (n_overlap = 0, contaminated = false) — the output covers every input
    document so the caller can filter or audit.
    """
    ev = (shingle_rows(eval_docs, text_col, key_col, n)
          .select("sh").dropDuplicates())
    hits = (shingle_rows(documents, text_col, key_col, n)
            .join(F.broadcast(ev), "sh")
            .groupBy(key_col)
            .agg(F.countDistinct("sh").alias("n_overlap")))
    return (documents.select(key_col)
            .join(hits, key_col, "left")
            .select(key_col,
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                    .alias("n_overlap"))
            .withColumn("contaminated", F.col("n_overlap") > 0))


def _dedup_units(documents: DataFrame, units: DataFrame, n_units,
                 key_col: str, sep: str) -> DataFrame:
    """Shared core of chunk/line dedup: ``units`` is (key_col, idx, unit);
    keep each distinct unit text only at its globally-first occurrence
    (smallest (key, idx)) and reassemble per-document text. ``n_units``
    is a Column computing the document's total unit count NARROWLY from
    ``documents`` (no second pass over the exploded rows).

    → (key_col, n_units, n_kept, text_clean) covering EVERY input
    document: docs whose every unit was seen earlier elsewhere survive
    with an empty text_clean, and docs with NULL/empty text (which
    explode to zero units) survive with n_units = 0.

    Skew-safety at 100 TB: the first occurrence is
    ``min(struct(key, idx, unit))`` per unit hash — partial-aggregated
    map-side, so a boilerplate unit repeated 10⁹× corpus-wide reaches
    the exchange as ONE row per map partition (a row_number window here
    would sort every copy in a single task). Because the winning struct
    carries the unit text, the survivors of doc k are exactly the firsts
    rows won by k — the survivor set is re-keyed from DISTINCT units
    only, and the full exploded unit set is never joined back or
    shuffled a second time.
    """
    firsts = (units.groupBy(F.md5("unit").alias("uh"))
              .agg(F.min(F.struct(F.col(key_col).alias("k"),
                                  F.col("idx").alias("i"),
                                  F.col("unit").alias("u"))).alias("first")))
    surv = (firsts
            .select(F.col("first.k").alias(key_col),
                    F.col("first.i").alias("idx"),
                    F.col("first.u").alias("unit"))
            .groupBy(key_col)
            .agg(F.count("*").alias("n_kept"),
                 F.concat_ws(sep, F.transform(
                     F.array_sort(F.collect_list(F.struct("idx", "unit"))),
                     lambda s: s["unit"])).alias("text_clean")))
    return (documents
            .select(key_col,
                    F.coalesce(n_units, F.lit(0)).cast("long")
                    .alias("n_units"))
            .join(surv, key_col, "left")
            .select(key_col, "n_units",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean")))


def chunk_dedup(documents: DataFrame, chunk: int = 10,
                text_col: str = "text", key_col: str = "doc_id"
                ) -> DataFrame:
    """C4-style global text-unit dedup for corpora WITHOUT line structure:
    each document's token stream is cut into consecutive ``chunk``-token
    units; a unit text that already occurred anywhere earlier in the
    corpus (ordered by (key, position)) is removed; survivors are
    reassembled in order. → (key_col, n_units, n_kept, text_clean)."""
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    # NARROW unit construction (r6, the shingle_rows device): the previous
    # posexplode + groupBy(key, idx) + collect_list shape shuffled every
    # (doc, token) row just to glue consecutive tokens back together.
    # Splitting once behind a Generate barrier and slicing the token array
    # per chunk yields identical (key, idx, unit) rows with ZERO exchanges
    # — the only shuffle left in chunk_dedup is the skew-safe
    # first-occurrence aggregate on md5(unit).
    t = F.col("t")
    unit_arr = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(t) / F.lit(chunk)).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(t, i * chunk + 1, chunk)))
    units = (documents
             .select(key_col,
                     F.explode(F.array(tokens(F.col(text_col)))).alias("t"))
             .select(key_col, F.posexplode(unit_arr).alias("idx", "unit")))
    n_units = F.ceil(F.size(tokens(F.col(text_col))) / F.lit(chunk))
    return _dedup_units(documents, units, n_units, key_col, " ")


def line_dedup(documents: DataFrame, delim: str = "\n",
               text_col: str = "text", key_col: str = "doc_id"
               ) -> DataFrame:
    """C4-style global line dedup: every line (split on ``delim``) is kept
    only at its first occurrence corpus-wide; surviving lines are rejoined
    with ``delim``. → (key_col, n_units, n_kept, text_clean)."""
    units = documents.select(
        key_col,
        F.posexplode(F.split(F.col(text_col), delim)).alias("idx", "unit"))
    n_units = F.size(F.split(F.col(text_col), delim))
    return _dedup_units(documents, units, n_units, key_col, delim)


def substring_dedup(documents: DataFrame, k: int = 20,
                    text_col: str = "text", key_col: str = "doc_id"
                    ) -> DataFrame:
    """ExactSubstr-style dedup (the suffix-array technique of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022, re-expressed distributed): every token position covered by
    a ``k``-token window whose text also occurs ANYWHERE else in the
    corpus — except the window's globally-first occurrence — is removed,
    and the surviving tokens are re-joined.

    A duplicated substring of L ≥ k tokens is covered by exactly
    L-k+1 duplicated stride-1 windows, so rolling k-token windows find
    the same covered regions the suffix array finds, with three
    DataFrame-shaped steps instead of a monolithic sorted index:

    1. windows: per doc, ``transform`` over the token array builds the
       stride-1 k-gram structs NARROWLY (no shuffle, no self-join).
    2. duplicated occurrences: ``groupBy(md5(window))`` with
       ``min(struct(key, start))`` + count — the same map-side-combined,
       skew-safe first-occurrence aggregate as chunk/line dedup — then a
       join back RESTRICTED to multi-occurrence windows (in a mostly
       unique corpus the duplicated-window side is a small fraction, and
       it is the only thing re-joined; a boilerplate window repeated
       10⁹× makes that join's probe partition hot, which AQE's
       skew-join splitting handles — the build side is one row per
       distinct window, freely replicated across splits).
    3. mask: the dup window starts of a doc are merged into DISJOINT
       covered intervals first (running-max windows over the small
       dup-starts set only — a fully-duplicated doc collapses to ONE
       interval, so the mask never degenerates to
       O(n_tok × n_dup_windows)), then a narrow ``filter``/``exists``
       over the token array drops covered positions and rebuilds the
       text.

    → (key_col, n_tok, n_kept, text_clean), every input doc covered
    (NULL/short texts pass through whole).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    arr = tokens(F.col(text_col))
    d = documents.select(key_col, arr.alias("t"))
    n_win = F.greatest(F.size("t") - k + 1, F.lit(0))
    wins = (d.where(n_win > 0)
            .select(key_col,
                    F.posexplode(F.transform(
                        F.sequence(F.lit(0), n_win - 1),
                        lambda i: F.concat_ws(
                            " ", F.slice(F.col("t"), i + 1, k))))
                    .alias("start", "wtext")))
    groups = (wins.groupBy(F.md5("wtext").alias("wh"))
              .agg(F.min(F.struct(F.col(key_col).alias("k"),
                                  F.col("start").alias("s"))).alias("first"),
                   F.count("*").alias("cnt"))
              .where(F.col("cnt") > 1))
    dup_starts = (wins.withColumn("wh", F.md5("wtext"))
                  .join(groups, "wh")
                  .where((F.col("first.k") != F.col(key_col)) |
                         (F.col("first.s") != F.col("start")))
                  .select(key_col, "start"))
    # merge overlapping [start, start+k) windows into disjoint intervals:
    # a start opens a new interval iff it lies at/after the running max
    # end of all earlier starts (windows over the dup-starts rows only)
    wk = Window.partitionBy(key_col).orderBy("start")
    hi_before = F.max(F.col("start") + k).over(
        wk.rowsBetween(Window.unboundedPreceding, -1))
    iid = F.sum(F.when(F.col("start") >= F.coalesce(hi_before, F.lit(-1)),
                       1).otherwise(0)).over(
        wk.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    intervals = (dup_starts.withColumn("iid", iid)
                 .groupBy(key_col, "iid")
                 .agg(F.min("start").alias("lo"),
                      (F.max("start") + k).alias("hi"))
                 .groupBy(key_col)
                 .agg(F.collect_list(F.struct("lo", "hi")).alias("ivs")))
    idx = d.join(intervals, key_col, "left")
    pairs = F.transform(F.coalesce("t", F.array().cast("array<string>")),
                        lambda x, i: F.struct(i.alias("i"), x.alias("x")))
    covered = lambda p: F.exists(  # noqa: E731
        F.coalesce("ivs", F.array().cast("array<struct<lo:int,hi:int>>")),
        lambda v: (p["i"] >= v["lo"]) & (p["i"] < v["hi"]))
    kept = F.filter(pairs, lambda p: ~covered(p))
    return idx.select(
        key_col,
        F.coalesce(F.size("t"), F.lit(0)).cast("long").alias("n_tok"),
        F.size(kept).cast("long").alias("n_kept"),
        F.concat_ws(" ", F.transform(kept, lambda p: p["x"]))
        .alias("text_clean"))


def sample_stratified(documents: DataFrame, rates: dict[str, int],
                      default_permille: int = 0, stratum_col: str = "lang",
                      key_col: str = "doc_id", seed: str = "") -> DataFrame:
    """Deterministic stratified sampling: keep a document iff its hash
    bucket (0-999, a pure function of (seed, key)) is below its stratum's
    permille rate. → kept rows (key_col, stratum_col, bucket).

    ``rates`` maps stratum value → permille (500 = 50%); strata absent
    from the map fall back to ``default_permille``. The map ships as a
    literal expression (broadcast-by-construction); for thousand-entry
    rate tables join a broadcast rates DataFrame instead.
    """
    bucket = sample_bucket(key_col, seed)
    return (documents.select(key_col, stratum_col)
            .withColumn("bucket", bucket)
            .where(F.col("bucket") <
                   sample_rate(rates, default_permille, stratum_col)))


def sample_bucket(key_col: str, seed: str):
    """The 0-999 sampling bucket: a pure function of (seed, key)."""
    return F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.lit(seed), F.lit(":"),
                           F.col(key_col).cast("string"))), 1, 6),
            16, 10).cast("long"),
        F.lit(1000))


def sample_rate(rates: dict[str, int], default_permille: int,
                stratum_col: str):
    """Per-stratum permille rate as a literal-map Column expression.

    An empty ``rates`` means every stratum uses the default (a zero-arg
    ``create_map()`` is typed ``map<void,void>`` and fails analysis when
    indexed by a string column, so it never reaches the plan).
    """
    if not rates:
        return F.lit(int(default_permille))
    rate_map = F.create_map(
        *[x for k, v in sorted(rates.items())
          for x in (F.lit(k), F.lit(int(v)))])
    return F.coalesce(rate_map[F.col(stratum_col)],
                      F.lit(int(default_permille)))


def score_linear(documents: DataFrame, weights: dict[str, float],
                 bias: float = 0.0, threshold: float = 0.5,
                 text_col: str = "text", key_col: str = "doc_id",
                 max_literal_vocab: int = 4096) -> DataFrame:
    """Linear text classifier (fastText-style bag of words) — the
    learned-model quality-scoring stage of a CCNet/FineWeb-style
    pipeline: score = sigmoid(bias + Σ w[token]·count(token)/n_tok),
    keep = score ≥ threshold.

    Two physical plans, same result:

    - vocabulary ≤ ``max_literal_vocab``: the weights ship as a literal
      map and the whole scorer is a NARROW projection — ZERO exchanges,
      which also makes it directly usable on a streaming DataFrame
      (no stateful operator at all).
    - larger vocabulary (a full fastText model is MBs against a TB
      corpus): the weight table ships as a broadcast DataFrame joined on
      the token; the corpus side pays only its own per-doc aggregates,
      the same broadcast shape as decontamination.

    Tokens outside the vocabulary contribute 0. → (key_col, n_tok, z,
    score, keep) for EVERY input doc (empty/NULL text scores
    sigmoid(bias)).

    Weight keys are normalized with ``.lower()`` to match ``tokens()``
    output (which lowercases); a mixed-case vocabulary would otherwise
    silently contribute 0 on every doc (round-4 ADVICE). Two keys that
    collide after lowercasing is a caller error and raises.
    """
    lowered: dict[str, float] = {}
    for k, v in weights.items():
        lk = k.lower()
        if lk in lowered and lowered[lk] != float(v):
            raise ValueError(
                f"score_linear weight keys collide after lowercasing: "
                f"{lk!r} maps to both {lowered[lk]} and {float(v)}")
        lowered[lk] = float(v)
    weights = lowered
    if len(weights) <= max_literal_vocab:
        wmap = F.create_map(*[x for k, v in sorted(weights.items())
                              for x in (F.lit(k), F.lit(float(v)))]) \
            if weights else None
        toks = tokens(F.col(text_col))
        n_tok = F.coalesce(F.size(toks), F.lit(0)).cast("long")
        wsum = F.coalesce(F.aggregate(
            toks, F.lit(0.0),
            lambda acc, t: acc + F.coalesce(wmap[t] if wmap is not None
                                            else F.lit(0.0), F.lit(0.0))),
            F.lit(0.0))
        z = (F.lit(float(bias)) +
             wsum / F.greatest(n_tok, F.lit(1)).cast("double"))
        return (documents
                .select(key_col, n_tok.alias("n_tok"), z.alias("z"),
                        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
                        .alias("score"))
                .withColumn("keep",
                            F.col("score") >= F.lit(float(threshold))))

    spark = documents.sparkSession
    w = F.broadcast(spark.createDataFrame(
        sorted(weights.items()), "tok string, wt double"))
    toks = (documents
            .select(key_col, F.explode(tokens(F.col(text_col))).alias("tok"))
            .groupBy(key_col, "tok")
            .agg(F.count("*").alias("c")))
    per_doc = (toks.groupBy(key_col)
               .agg(F.sum("c").alias("n_tok")))
    hits = (toks.join(w, "tok")
            .groupBy(key_col)
            .agg(F.sum(F.col("wt") * F.col("c")).alias("wsum")))
    z = (F.lit(float(bias)) +
         F.coalesce(F.col("wsum"), F.lit(0.0)) /
         F.greatest(F.col("n_tok"), F.lit(1)).cast("double"))
    return (documents.select(key_col)
            .join(per_doc, key_col, "left")
            .join(hits, key_col, "left")
            .select(key_col,
                    F.coalesce("n_tok", F.lit(0)).cast("long")
                    .alias("n_tok"),
                    z.alias("z"),
                    (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"))
            .withColumn("keep", F.col("score") >= F.lit(float(threshold))))


def quality_filter(documents: DataFrame, min_tok: int = 20,
                   rep_factor: int = 8, text_col: str = "text",
                   key_col: str = "doc_id") -> DataFrame:
    """Keep documents with at least ``min_tok`` tokens whose most frequent
    token is at most 1/``rep_factor`` of them (all input columns pass).

    Fully NARROW (r6): the per-document top-token count is the longest
    equal-run over the SORTED token array, computed with one ``aggregate``
    fold per row — the previous (doc, token) explode + two-level groupBy
    + semi-join shuffled every token occurrence twice to produce the same
    two integers per document. Integer run-length arithmetic, so the
    decision is bit-identical.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    run = F.aggregate(
        F.array_sort(toks),
        F.struct(F.lit(None).cast("string").alias("prev"),
                 F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]),
                   acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].isNotNull() & (x == acc["prev"]),
                       acc["run"] + 1).otherwise(F.lit(1))).alias("best")),
        lambda acc: acc["best"])
    return documents.where((n_tok >= min_tok) &
                           (run * rep_factor <= n_tok))


def keep_exact_keepers(documents: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id") -> DataFrame:
    """Exact-dedup stage: keep only the min-key document per md5(text)."""
    keepers = (documents.groupBy(F.md5(text_col).alias("h"))
               .agg(F.min(key_col).alias(key_col)).select(key_col))
    return documents.join(keepers, key_col, "left_semi")


def drop_contaminated(documents: DataFrame, eval_docs: DataFrame,
                      n: int = 4, text_col: str = "text",
                      key_col: str = "doc_id") -> DataFrame:
    """Keep only documents sharing no token ``n``-gram with the eval set."""
    return documents.join(
        decontaminate(documents, eval_docs, n, text_col, key_col)
        .where(~F.col("contaminated")).select(key_col),
        key_col, "left_semi")


def keep_sampled(documents: DataFrame, rates: dict[str, int],
                 default_permille: int = 0, stratum_col: str = "lang",
                 key_col: str = "doc_id", seed: str = "") -> DataFrame:
    """Stratified-sampling stage: full rows of the kept documents."""
    kept = sample_stratified(documents, rates, default_permille,
                             stratum_col, key_col, seed).select(key_col)
    return documents.join(kept, key_col, "left_semi")


def cap_per_source(documents: DataFrame, k: int,
                   source_col: str = "source", key_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Keep at most ``k`` documents per source/domain (the anti-flood cap
    against boilerplate or SEO-farm domains): within each source,
    documents are ranked by token count descending (longest first, ties
    by key ascending for determinism) and ranks > k are dropped. → full
    input rows plus (n_tok, rank).

    One per-source window exchange; a source with millions of rows is
    exactly the hot key this operator removes, and row_number keeps the
    window state O(1) per partition — no collect, no quadratic blowup.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    d = documents.withColumn(
        "n_tok", F.coalesce(F.size(tokens(F.col(text_col))), F.lit(0))
        .cast("long"))
    w = Window.partitionBy(source_col).orderBy(
        F.col("n_tok").desc(), F.col(key_col).asc())
    return (d.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def semantic_dedup(vectors: DataFrame, threshold: float = 0.95,
                   dim: int | None = None, n_planes: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_bands: int = 1, max_bucket: int | None = None
                   ) -> DataFrame:
    """Embedding-level dedup ACTION: near-duplicate cosine pairs
    (hyperplane-LSH bucketed — see
    :func:`..dedup.embedding_near_duplicates`) → connected components →
    every input vector labeled (id_col, cluster_id, is_keeper); vectors
    in no near-dup pair are their own singleton cluster.

    The pair graph is tiny relative to the corpus (it only contains
    near-duplicates), so the label-propagation rounds run on edges, not
    vectors, and the final labeling is one id-keyed left join.
    ``n_bands``/``max_bucket`` are the web-scale LSH knobs (see
    :func:`..dedup.embedding_near_duplicates`).
    """
    from .dedup import dedup_clusters, embedding_near_duplicates
    pairs = embedding_near_duplicates(vectors, threshold, dim, n_planes,
                                      id_col, vec_col, n_bands=n_bands,
                                      max_bucket=max_bucket)
    comps = dedup_clusters(pairs.select("doc_a", "doc_b"))
    return (vectors.select(id_col)
            .join(comps.select(F.col("doc_id").alias(id_col), "cluster_id"),
                  id_col, "left")
            .select(id_col,
                    F.coalesce("cluster_id", F.col(id_col))
                    .alias("cluster_id"))
            .withColumn("is_keeper", F.col(id_col) == F.col("cluster_id")))


def curate_corpus(documents: DataFrame, eval_docs: DataFrame,
                  rates: dict[str, int], default_permille: int,
                  budget: int, min_tok: int = 20, rep_factor: int = 8,
                  ngram: int = 4, seed: str = "",
                  text_col: str = "text", key_col: str = "doc_id",
                  stratum_col: str = "lang"
                  ) -> tuple[DataFrame, DataFrame]:
    """The composed curation ACTION: documents in → training-shard
    assignments out, with a per-stage funnel.

    Stages: (1) quality filter — at least ``min_tok`` tokens and the most
    frequent token at most 1/``rep_factor`` of them (Gopher-style
    repetition cap, integer arithmetic only); (2) exact dedup — keep the
    min-key document per md5(text); (3) decontamination — drop survivors
    sharing any token ``ngram`` with ``eval_docs``; (4) deterministic
    stratified sampling under ``rates``; (5) token-budget shard packing.

    Returns ``(assignments, funnel)``:

    - assignments: (key_col, stratum_col, n_tok, shard_id) for every
      document that survived all five stages.
    - funnel: 1-row counts (n_in, n_quality, n_unique, n_clean,
      n_sampled) — each stage's survivor count, never silent drops.
    """
    # every stage frame feeds BOTH the next stage and the funnel counts
    # (and `unique` feeds decontamination twice) — lazy localCheckpoints
    # materialize each stage once instead of re-running the whole prefix
    # per consumer branch (plan audit: 51 exchanges -> see PLANS.md)
    quality = (quality_filter(documents, min_tok, rep_factor,
                              text_col, key_col)
               .localCheckpoint(eager=False))
    unique = (keep_exact_keepers(quality, text_col, key_col)
              .localCheckpoint(eager=False))
    clean = (drop_contaminated(unique, eval_docs, ngram, text_col, key_col)
             .localCheckpoint(eager=False))
    sampled = (keep_sampled(clean, rates, default_permille, stratum_col,
                            key_col, seed)
               .localCheckpoint(eager=False))
    assignments = pack_shards(sampled, budget, stratum_col, key_col,
                              text_col)
    funnel = (documents.agg(F.count("*").alias("n_in"))
              .crossJoin(quality.agg(F.count("*").alias("n_quality")))
              .crossJoin(unique.agg(F.count("*").alias("n_unique")))
              .crossJoin(clean.agg(F.count("*").alias("n_clean")))
              .crossJoin(sampled.agg(F.count("*").alias("n_sampled"))))
    return assignments, funnel


def pack_shards(documents: DataFrame, budget: int,
                stratum_col: str = "lang", key_col: str = "doc_id",
                text_col: str = "text", sub_strata: int = 1) -> DataFrame:
    """Assign documents to training shards by cumulative token budget
    within each stratum. → (key_col, stratum_col, n_tok, shard_id).

    Boundary-packing semantics (deterministic, prefix-sum expressible):
    documents are laid out in ``key_col`` order and a document's shard is
    ``floor(tokens_before_it / budget)``, re-ranked to contiguous
    0,1,2,… ids per stratum — i.e. shard boundaries sit at fixed
    ``budget``-token offsets in the stream. A document already inside an
    open shard joins it even if the document alone exceeds ``budget``
    (it then straddles one or more boundaries, and the re-rank keeps the
    following ids contiguous); this is NOT strict greedy bin packing
    (which needs a sequential running-total reset and cannot be a
    prefix sum): away from oversized documents every shard's token total
    reaches the budget (only the stratum's last falls short), while a
    shard immediately after an oversized document can be smaller.
    Reproducibility is independent of parallelism. Consumers needing
    exact budget isolation (no shard over budget; an oversized doc sits
    alone) use :func:`pack_shards_greedy`, the sequential
    applyInPandas twin.

    ``sub_strata > 1`` splits each stratum into that many deterministic
    hash sub-streams (shard_id becomes per-(stratum, sub-stream)) so a
    dominant stratum does not serialize into a single window partition.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    d = documents.select(
        key_col, stratum_col,
        F.coalesce(F.size(tokens(F.col(text_col))), F.lit(0))
        .cast("long").alias("n_tok"))
    part = [stratum_col]
    if sub_strata > 1:
        d = d.withColumn("sub", F.pmod(
            F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 6),
                   16, 10).cast("long"),
            F.lit(int(sub_strata))))
        part.append("sub")
    w = Window.partitionBy(*part).orderBy(key_col)
    cum = F.sum("n_tok").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    raw = d.withColumn(
        "raw_shard", F.floor((cum - F.col("n_tok")) / F.lit(int(budget))))
    # a doc larger than the budget straddles boundaries, making raw ids
    # skip; dense_rank over the SAME partitioning (one window exchange,
    # two window specs) restores contiguous 0..N ids per stratum
    out = raw.withColumn(
        "shard_id",
        (F.dense_rank().over(Window.partitionBy(*part).orderBy("raw_shard"))
         - 1).cast("long"))
    return out.select(key_col, stratum_col, "n_tok", "shard_id",
                      *(["sub"] if sub_strata > 1 else []))


def pack_shards_greedy(documents: DataFrame, budget: int,
                       stratum_col: str = "lang", key_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """STRICT greedy bin packing twin of :func:`pack_shards`
    → (key_col, stratum_col, n_tok, shard_id).

    Guarantee the prefix-sum variant cannot give: a shard's token total
    NEVER exceeds ``budget`` unless the shard contains exactly one
    oversized document (which then sits alone — exact budget isolation).
    The running total resets at each boundary, which is inherently
    sequential within a stratum, so this runs as ``applyInPandas`` per
    stratum — parallel ACROSS strata, sequential within (the trade is
    structural: strict greedy is a carried-state recurrence, not a prefix
    sum; use :func:`pack_shards` (+``sub_strata``) when a dominant
    stratum would serialize and boundary-straddling is acceptable).
    Deterministic: documents are packed in ``key_col`` order.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    d = documents.select(
        key_col, stratum_col,
        F.coalesce(F.size(tokens(F.col(text_col))), F.lit(0))
        .cast("long").alias("n_tok"))

    def pack(pdf):
        pdf = pdf.sort_values(key_col, kind="mergesort").copy()
        ids, shard, acc = [], 0, 0
        for t in pdf["n_tok"]:
            if acc > 0 and acc + t > budget:
                shard, acc = shard + 1, 0
            ids.append(shard)
            acc += t
        pdf["shard_id"] = ids
        return pdf

    types = {f.name: f.dataType.simpleString() for f in d.schema.fields}
    schema = (f"{key_col} {types[key_col]}, "
              f"{stratum_col} {types[stratum_col]}, "
              "n_tok long, shard_id long")
    return d.groupBy(stratum_col).applyInPandas(pack, schema=schema)
