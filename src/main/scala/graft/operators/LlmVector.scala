package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.11 (vector half) — embedding-column operators over the `embeddings`
  * fixture (float[64], 10 labels): norms, pairwise cosine, brute-force
  * k-NN, embedding-cosine near-dup, per-label centroids, plus the MLlib
  * approximate paths (MinHash-LSH Jaccard dedup, random-projection LSH
  * k-NN).
  *
  * All exact math is done in DOUBLE with sequential left-to-right
  * higher-order-function folds (same order as DuckDB's list kernels) and
  * rounded to 6dp at the edges, so float32 inputs still hash-match.
  *
  * Scale notes (100 TB posture): brute-force k-NN is blocked — a bounded
  * probe set broadcast against the corpus, so the big side never
  * shuffles; the LSH variants are the real 100 TB path (bucketed join,
  * candidates only), with the exact ops as their verification oracles.
  */
object LlmVector {

  /** float[] → double[] (compute in f64; f32 accumulation drifts). */
  private def dbl(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** The sim-family per-probe ranking discipline in ONE place: rank by
    * (6dp-rounded score, cand_id) and keep the top k — previously
    * copy-pasted at nine probe-broadcast sites, where a tie-break or
    * rounding change applied to one key but not another would silently
    * fork the rankings between keys that share the same oracle shape.
    * `ascending` covers the distance-ranked (L2/ADC) family.
    */
  private def rankPerProbe(scored: DataFrame, scoreCol: String, k: Int,
      ascending: Boolean = false): DataFrame = {
    val ord = if (ascending) col(scoreCol).asc else col(scoreCol).desc
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(ord, col("cand_id"))))
      .filter(col("rnk") <= k)
  }

  private def vecNorm(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("v", dbl(col("embedding")))
      // hoisted: interpreted HOF folds do no loop-invariant elimination,
      // so the three consumers below would each re-run the 64-element
      // norm fold per row (the vecMatryoshka `tot` discipline)
      .withColumn("n", norm2(col("v")))
      .select(col("vec_id"),
        round(col("n"), 6).as("l2_norm"),
        round(array_max(transform(col("v"), x => abs(x))), 6).as("max_abs"),
        // zero-vector guard (class 6): defines the unit component of a
        // zero vector as 0 on both engines. Under ANSI (this harness's
        // Spark 4.1 default) the unguarded divide would THROW
        // DIVIDE_BY_ZERO, not return NULL — the guard is load-bearing
        // for crash-safety, not just NULL-vs-NaN parity
        round(when(col("n") === 0.0, lit(0.0))
          .otherwise(element_at(col("v"), 1) / col("n")), 6)
          .as("first_unit"))
      .orderBy(col("vec_id"))

  /** Cosine between consecutive vec_ids (pairing without a quadratic
    * join).
    */
  private def simCosinePair(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).withColumn("v", dbl(col("embedding")))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = e.select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"),
      col("v").as("vb"))
    a.join(b, "id_a")
      // hoisted norm product: consumed by the guard AND the divide
      .withColumn("nprod", norm2(col("va")) * norm2(col("vb")))
      .select(col("id_a"), col("id_b"),
        // UNROUNDED IEEE quotient (identical chain on both engines; the
        // 6dp edge round is the class-3 midpoint hazard). Zero-norm
        // guard MATCHES the oracle's CASE…NULL — and under ANSI (this
        // harness's Spark 4.1 default) the unguarded divide would THROW
        // on a zero-norm vector rather than NULL-diverge
        when(col("nprod") === 0.0, lit(null).cast("double"))
          .otherwise(dot(col("va"), col("vb")) / col("nprod")).as("cos_sim"))
      .orderBy(col("id_a"))
  }

  /** Brute-force k-NN: bounded probe set (vec_id % 50 = 0) broadcast
    * against all candidates; top-5 by (rounded sim desc, vec_id).
    * Hot path uses the fused native CosineSim expression (single pass,
    * no per-pair array allocation) — float-op-identical to the HOF
    * formulation and the oracle.
    */
  private def simTopk(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val cands = e.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    rankPerProbe(
      cands.crossJoin(broadcast(probes))
        .filter(col("cand_id") =!= col("probe_id"))
        .withColumn("cos_sim", round(expr("cosine_sim_native(pv, cv)"), 6)),
      "cos_sim", 5)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("cos_sim"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Late-interaction retrieval (the ColBERT MaxSim operator): each
    * vector is read as 8 "token" sub-vectors of 8 dims, and the
    * query-document score is Σ over query tokens of the MAX dot product
    * against any document token — the multi-vector relevance model that
    * beats single-vector cosine when queries and documents match on
    * localized features. Every fold (dot product, per-token max, token
    * sum) is a sequential left-to-right HOF on both engines; the score
    * is rounded to 6dp BEFORE ranking (the sim_topk discipline) so a
    * last-ulp engine difference cannot reorder the top-k.
    *
    * Scale notes: probes broadcast (the query set is always the small
    * side), candidates never shuffle; per-pair work is a fused 8×8×8
    * loop in the native whole-stage-codegen'd [[graft.functions.MaxSim]]
    * expression (the earlier nested-HOF formulation was interpreted and
    * re-sliced each side 64× per pair — ~10× slower) — at 100 TB the
    * candidate side would be pre-routed by an IVF/LSH stage
    * (sim_ivf_knn) and MaxSim runs only inside the routed lists,
    * exactly as ColBERT deployments re-rank ANN output.
    */
  private def simMaxsim(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val probes = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val cands = e.filter(col("vec_id") % 100 =!= 0)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    rankPerProbe(
      cands.crossJoin(broadcast(probes))
        .withColumn("score", round(expr("maxsim_native(pv, cv)"), 6)),
      "score", 3)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("score"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** One pooled candidate for the MMR re-rank: relevance to the probe
    * plus this candidate's cosine to every OTHER pool member (the
    * bounded ≤10-entry sim map the greedy step consults).
    */
  private[operators] case class MmrCand(probe_id: Long, cand_id: Long,
    rel: Double, m: Map[Long, Double])

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98) — the diversity-aware top-k every RAG / training-data
    * retrieval stage runs after ANN: greedily pick 5 of the probe's
    * top-10 candidates maximizing λ·rel − (1−λ)·max sim-to-selected
    * (λ = 0.7). Candidate generation is the sim_topk broadcast-probe
    * shape; the greedy loop is genuinely sequential per probe, so it
    * runs as a typed flatMapGroups over the BOUNDED pool (10 rows, a
    * 10×10 sim map per probe) — per-group state is O(k²), never the
    * corpus. Determinism: rel and pairwise sims round to 6dp (the
    * sim_topk discipline), then each step's score is computed in EXACT
    * INTEGER 1e-7 units — mmr_e7 = 7·(rel·1e6) − 3·(pen·1e6) — because
    * rounding the λ-blend at the edge is the confirmed
    * shortest-string-vs-exact-binary midpoint split (Core.scala; it bit
    * this exact key in dev: 0.255122 vs 0.255123). Ties by cand_id;
    * the oracle replays the identical greedy integer arithmetic as
    * five chained argmax CTEs.
    *
    * Scale notes: probes broadcast, corpus never shuffles; the only
    * shuffle after candidate generation carries ≤10 rows per probe.
    * At 100 TB the pool would come from IVF/LSH routing
    * (sim_ivf_knn) — MMR's cost is O(probes·k·pool), independent of
    * corpus size, exactly why production rerankers run it last.
    */
  private def simMmr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val probes = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val wRel = Window.partitionBy(col("probe_id"))
      .orderBy(col("rel").desc, col("cand_id"))
    // score map-side, DROP the vector before the rank window (the
    // shuffle then carries (probe_id, cand_id, rel) only — the file's
    // vectors-never-shuffle discipline) and re-attach cv to the <=10
    // winners per probe via a broadcast of the tiny pool. With cv out
    // of the scored columns, every downstream consumer (a, b, pooled)
    // prunes to the SAME exchange subtree, so ReuseExchange runs the
    // O(corpus x probes) scoring pass once — no checkpoint needed (a
    // checkpoint here would also hide the broadcast-probe plan from
    // PlanShapeSpec's candidate-generation assertion).
    val scored = e.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(probes))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("rel", round(expr("cosine_sim_native(pv, cv)"), 6))
      .select(col("probe_id"), col("cand_id"), col("rel"))
      .withColumn("rnk", row_number().over(wRel))
      .filter(col("rnk") <= 10)
      .select(col("probe_id"), col("cand_id"), col("rel"))
    val pool = e.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .join(broadcast(scored), "cand_id")
      .select(col("probe_id"), col("cand_id"), col("rel"), col("cv"))
    val a = pool.select(col("probe_id"), col("cand_id").as("ca"),
      col("cv").as("va"))
    val b = pool.select(col("probe_id"), col("cand_id").as("cb"),
      col("cv").as("vb"))
    val sims = a.join(b, Seq("probe_id")).filter(col("ca") =!= col("cb"))
      .withColumn("sim", round(expr("cosine_sim_native(va, vb)"), 6))
    val simMap = sims.groupBy(col("probe_id").as("pid2"), col("ca"))
      .agg(map_from_arrays(collect_list(col("cb")),
        collect_list(col("sim"))).as("m"))
    val pooled = pool.select(col("probe_id"), col("cand_id"), col("rel"))
      // LEFT join + empty-map default: a single-candidate pool has no
      // (ca ≠ cb) sim rows, and an inner join would silently drop the
      // candidate while the oracle's step-1 CTE (no sims needed) keeps
      // it — mirroring the greedy loop's getOrElse(_, 0.0)
      .join(simMap,
        col("probe_id") === col("pid2") && col("cand_id") === col("ca"),
        "left")
      .select(col("probe_id"), col("cand_id"), col("rel"),
        coalesce(col("m"), expr(
          "map_from_arrays(cast(array() as array<bigint>), cast(array() as array<double>))"))
          .as("m"))
      .as[MmrCand]
    pooled.groupByKey(_.probe_id).flatMapGroups { (pid, it) =>
      val cs = it.toArray
      var selected = List.empty[Long]
      val out = Array.newBuilder[(Long, Int, Long, Long)]
      var step = 1
      while (step <= 5 && selected.size < cs.length) {
        var bestId = Long.MaxValue; var bestM = Long.MinValue
        cs.foreach { c =>
          if (!selected.contains(c.cand_id)) {
            val pen =
              if (selected.isEmpty) 0.0
              else selected.map(sid => c.m.getOrElse(sid, 0.0)).max
            // exact integer micro-unit arithmetic the oracle replays:
            // the 6dp-rounded doubles ARE integers in 1e-6 units, so
            // the λ-blend is exact in 1e-7 units — no edge rounding
            val mmr = 7L * math.round(c.rel * 1e6) -
              3L * math.round(pen * 1e6)
            if (mmr > bestM || (mmr == bestM && c.cand_id < bestId)) {
              bestM = mmr; bestId = c.cand_id
            }
          }
        }
        out += ((pid, step, bestId, bestM))
        selected ::= bestId
        step += 1
      }
      out.result().iterator
    }.toDF("probe_id", "step", "cand_id", "mmr_score_e7")
      .orderBy(col("probe_id"), col("step"))
  }

  /** k-NN GRAPH construction — the corpus-wide neighbor structure that
    * graph-based semantic dedup (SemDeDup clusters), diversity sampling
    * and label propagation all build on: every vector's top-3 cosine
    * neighbors WITHIN ITS LABEL BLOCK, each edge flagged `mutual` when
    * the source is also among the neighbor's top-3 (the symmetrized
    * k-NN graph ANN pipelines keep). Scores round to 6dp BEFORE ranking
    * (sim_topk discipline) so a last-ulp difference cannot reorder.
    *
    * Scale notes: blocking by the (pre-clustered) label key bounds the
    * pair space to Σ|block|² ≪ n² and makes the only shuffle a
    * co-partition on `label` — at 100 TB the label comes from
    * vec_kmeans_assign and each block's pair join runs independently;
    * per-pair scoring is the fused codegen'd native cosine. The mutual
    * flag is a self-join of the O(3n) edge list on its own (src, nbr)
    * key — never the corpus.
    */
  private def simKnnGraph(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = e.select(col("label"), col("vec_id").as("src"),
      col("embedding").as("va"))
    val b = e.select(col("label"), col("vec_id").as("nbr"),
      col("embedding").as("vb"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos_sim").desc, col("nbr"))
    val edges = a.join(b, Seq("label"))
      .filter(col("src") =!= col("nbr"))
      .withColumn("cos_sim", round(expr("cosine_sim_native(va, vb)"), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("src"), col("rnk"), col("nbr"), col("cos_sim"))
    val rev = edges.select(col("src").as("r_nbr"), col("nbr").as("r_src"))
    edges.join(rev,
        col("src") === col("r_src") && col("nbr") === col("r_nbr"), "left")
      .select(col("src"), col("rnk"), col("nbr"), col("cos_sim"),
        col("r_src").isNotNull.as("mutual"))
      .orderBy(col("src"), col("rnk"))
  }

  /** SEMANTIC decontamination (the paraphrase-robust tier above the
    * exact/n-gram decontam pair: a reworded eval question shares no
    * 3-gram with its source but sits next to it in embedding space):
    * every 97th vector plays the eval benchmark; a train vector is
    * contaminated when its max cosine against ANY eval probe passes the
    * 0.35 threshold. Per-probe contamination counts come back for the
    * eval-integrity report.
    *
    * Scale notes: decontam_exact's posture with vectors — the eval set
    * is O(benchmark) and broadcasts; the 100 TB train side is scored
    * map-side by the fused codegen'd cosine and never shuffles; only
    * the O(eval) count rows reach the final aggregation. At larger eval
    * sets the IVF routing (sim_ivf_knn) bounds probes per train vector.
    */
  private def decontamEmbed(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val eval = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ev"))
    val train = e.filter(col("vec_id") % 97 =!= 0)
      .select(col("vec_id").as("train_id"), col("embedding").as("tv"))
    val hits = train.crossJoin(broadcast(eval))
      .withColumn("cos_sim", round(expr("cosine_sim_native(ev, tv)"), 6))
      .filter(col("cos_sim") >= 0.35)
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n"), max(col("cos_sim")).as("max_sim"))
    eval.select(col("eval_id"))
      .join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n"), lit(0L)).as("n_contaminated"),
        coalesce(col("max_sim"), lit(0.0)).as("max_sim"))
      .orderBy(col("eval_id"))
  }

  /** Maximum-inner-product search (MIPS — the retrieval-training
    * workhorse: dual-encoder scoring is raw dot product, NOT cosine;
    * normalizing first changes the ranking whenever norms carry signal).
    * Same scale shape as sim_topk: bounded probe set broadcasts, the
    * corpus never shuffles, per-pair scoring is the fused whole-stage-
    * codegen [[graft.functions.DotProduct]] expression (elements widened
    * to double BEFORE the multiply, fold order identical to the HOF
    * spelling it replaces — higher-order functions are interpreted and
    * allocate zip arrays per pair).
    */
  private def simMips(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val cands = e.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    rankPerProbe(
      cands.crossJoin(broadcast(probes))
        .filter(col("cand_id") =!= col("probe_id"))
        .withColumn("dot", round(expr("dot_native(pv, cv)"), 6)),
      "dot", 5)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("dot"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Radius search (the fixed-threshold complement of top-k ANN): for
    * each probe (every 50th vec_id), ALL corpus neighbors with rounded
    * cosine ≥ 0.30 — the retrieval primitive behind near-dup expansion
    * and diversity filtering, where the neighbor COUNT is unknown a
    * priori so top-k under-reports. Same scale shape as sim_topk: the
    * bounded probe set broadcasts against the corpus, the big side never
    * shuffles, and the fused native CosineSim expression runs the pair
    * scoring in a single codegen'd pass. The threshold filter is
    * map-side — output volume, not candidate volume, hits the shuffle.
    */
  private def simRangeSearch(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val cands = e.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    cands.crossJoin(broadcast(probes))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("cos_sim", round(expr("cosine_sim_native(pv, cv)"), 6))
      .filter(col("cos_sim") >= 0.30)
      .select(col("probe_id"), col("cand_id"), col("cos_sim"))
      .orderBy(col("probe_id"), col("cand_id"))
  }

  /** Embedding-cosine near-duplicate pairs within label blocks
    * (threshold 0.35 ≈ the fixture's top-0.1% of pair similarity).
    */
  private def dedupEmbed(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("label"), col("vec_id").as("id_a"),
      col("embedding").as("va"))
    val b = e.select(col("label").as("label_b"), col("vec_id").as("id_b"),
      col("embedding").as("vb"))
    a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(expr("cosine_sim_native(va, vb)"), 6))
      .filter(col("cos_sim") >= 0.35)
      .select(col("label"), col("id_a"), col("id_b"), col("cos_sim"))
      .orderBy(col("label"), col("id_a"), col("id_b"))
  }

  /** Exact per-label centroid vectors — THE shared centroid primitive
    * (previously copy-pasted at eight sites): explode positions, exact
    * decimal mean per (label, pos), reassemble position-ordered into a
    * `cvec` array column keyed by `label`. One definition so the
    * decimal-mean discipline every oracle restates cannot drift
    * between keys. Input must carry `label` and a double-array `v`.
    */
  private def labelCentroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(Det.davg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("cvec"))

  /** Per-label mean vector (cluster profile): the shared exact-decimal
    * centroid ([[labelCentroids]]) leaving as a canonical CSV string —
    * each component formatted via DECIMAL(20,6) so Spark and DuckDB
    * print identical fixed-scale text (the driver's comparator hashes
    * scalar cells only).
    */
  private def labelCentroid(s: SparkSession, dir: String): DataFrame =
    labelCentroids(Tables.embeddings(s, dir)
        .withColumn("v", dbl(col("embedding"))))
      .select(col("label"), array_join(expr(
        """transform(cvec,
           x -> cast(cast(round(x, 6) as decimal(20,6)) as string))"""), ",")
        .as("centroid"))
      .orderBy(col("label"))

  /** Inter-class centroid similarity matrix — the label-space structure
    * report a curriculum/mixture designer reads before merging or
    * re-weighting classes (two labels whose centroids sit at cosine
    * ≈ 1 are candidates for merging; near-orthogonal ones are safe
    * negatives for sim_hard_negative). O(labels²) pairs over exact
    * decimal centroids — entirely deterministic, so the matrix carries
    * a full oracle where per-vector ANN variants cannot.
    *
    * Scale notes: centroids are one partial-agg shuffle over
    * (label, dim) (the label_centroid plan); the pair matrix is
    * O(labels²) driver-scale rows from a broadcast self-join — the
    * corpus is never touched twice.
    */
  private def labelCentroidSim(s: SparkSession, dir: String): DataFrame = {
    val cent = labelCentroids(Tables.embeddings(s, dir)
      .withColumn("v", dbl(col("embedding"))))
    val a = cent.select(col("label").as("la"), col("cvec").as("ca"))
    val b = cent.select(col("label").as("lb"), col("cvec").as("cb"))
    def dot(x: String, y: String) =
      expr(s"aggregate(zip_with($x, $y, (p, q) -> p * q), 0D, (acc, v) -> acc + v)")
    a.join(broadcast(b), col("la") < col("lb"))
      // hoisted + zero-guarded: under ANSI (this harness's default) an
      // unguarded divide THROWS on a zero-norm centroid; NULL matches
      // the oracle's CASE guard
      .withColumn("nprod", sqrt(dot("ca", "ca")) * sqrt(dot("cb", "cb")))
      .select(col("la"), col("lb"),
        round(when(col("nprod") === 0.0, lit(null).cast("double"))
          .otherwise(dot("ca", "cb") / col("nprod")), 6)
          .as("cos_sim"))
      .orderBy(col("la"), col("lb"))
  }

  /** IVF-style approximate nearest neighbor — the other 100 TB ANN path:
    * a coarse quantizer (here: exact per-label centroids) routes each
    * probe to its nprobe=2 closest partitions, and only those partitions
    * are searched. Fully deterministic (exact centroids, 6dp-rounded
    * ranking), hence oracle-able — unlike the seeded-random LSH variant.
    * At cluster scale: centroids broadcast; the corpus stays partitioned
    * by list id; probes touch nprobe/nlist of the data.
    */
  private def simIvfKnn(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).withColumn("v", dbl(col("embedding")))
    val cents = labelCentroids(e)
    val probes = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val wSel = Window.partitionBy(col("probe_id"))
      .orderBy(col("csim").desc, col("label"))
    val selected = probes.crossJoin(broadcast(cents))
      .withColumn("csim", round(expr("cosine_sim_native(pv, cvec)"), 6))
      .withColumn("rn", row_number().over(wSel))
      .filter(col("rn") <= 2)
      .select(col("probe_id"), col("pv"), col("label"))
    val cands = e.select(col("vec_id").as("cand_id"), col("label"),
      col("v").as("cv"))
    // selected is the bounded side (probes x nprobe) — pin the
    // broadcast so the corpus never shuffles on a <=10-label key
    rankPerProbe(
      broadcast(selected).join(cands, "label")
        .filter(col("cand_id") =!= col("probe_id"))
        .withColumn("cos_sim", round(expr("cosine_sim_native(pv, cv)"), 6)),
      "cos_sim", 3)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("label"),
        col("cos_sim"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Iterated Lloyd's to CONVERGENCE (the r5 verdict gap: sim_ivf_knn's
    * coarse quantizer was a one-step codebook; real IVF trains its
    * centroids). Driver loop over distributed rounds — the dedup_cluster
    * discipline: per round ONE broadcast of the O(k × dim) codebook, one
    * assign + per-dim mean aggregation, centroids collected back as
    * O(k × dim) control-plane metadata (512 doubles here), never data.
    * Deterministic throughout: seed centroids are the first k vectors,
    * per-dim means are decimal (order-independent), distances are plain
    * IEEE doubles, ties break on list id — so the trained codebook is a
    * pure function of the corpus. SSE (decimal-summed) is monotone
    * non-increasing across rounds (Lloyd's invariant, property-tested);
    * training stops when it stalls (< 0.01% relative improvement, i.e.
    * prev − sse < 1e-4·prev) or at maxRounds.
    *
    * Scale notes: each round is one broadcast-join pass over the corpus
    * + one (k × dim)-group aggregate; rounds are bounded; nothing
    * driver-side is O(rows). Empty lists keep their previous centroid.
    */
  private[graft] def kmeansTrain(s: SparkSession, dir: String, k: Int,
      maxRounds: Int): (Seq[Seq[Double]], Seq[Double]) = {
    import s.implicits._
    val e0 = Tables.embeddings(s, dir)
      .select(col("vec_id"), dbl(col("embedding")).as("v"))
    // parallelize the per-round map work: a small fixture parquet
    // arrives as ONE input split, serializing every round's
    // argmin+explode+partial-agg on a single core (measured 0.5 s/round
    // at sf0.1 — guide §2.5 input skew). Round work should track the
    // session's parallelism; guarded so a real corpus that already has
    // ≥ that many splits never pays a shrink. Results are unaffected:
    // every downstream fold is order-independent (decimal sums).
    val par = s.sparkContext.defaultParallelism
    val e = (if (e0.rdd.getNumPartitions < par) e0.repartition(par) else e0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: IndexedSeq[Seq[Double]] = e.filter(col("vec_id") < k)
      .orderBy(col("vec_id")).select(col("v"))
      .collect().map(_.getSeq[Double](0).toIndexedSeq: Seq[Double]).toIndexedSeq
    val sses = scala.collection.mutable.ArrayBuffer.empty[Double]
    graft.functions.GraftFunctions.register(s)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // ONE job, ONE shuffle per round: the k-way argmin stays a
      // MAP-SIDE expression (array_min over struct(d2, cid) —
      // lexicographic struct order is the tie-break), so no crossJoin
      // row blow-up and no per-vector window shuffle; the only shuffle
      // is the (list, dim) moment aggregation. The codebook rides in as
      // ONE BROADCAST ROW (array<struct<cid, cvec>>) unfolded by a
      // transform lambda, not as per-round literals: the literal
      // spelling changed the generated code every round, so all
      // maxRounds paid a fresh whole-stage-codegen compile (guide §1.2
      // "per-task work" — ~0.4 s/round at any scale); with constant
      // plan text the codegen cache compiles once and every later
      // round reuses it. d2 is bit-identical either way: broadcast
      // doubles arrive exactly and l2_sq_native folds in the same
      // order. New centroids are the decimal means; SSE w.r.t. the
      // centroids the round ASSIGNED AGAINST (the Lloyd's objective)
      // falls out of the same moments driver-side:
      // Σ‖x−c‖² = Σx² − 2c·Σx + n·c² per dim.
      val cdf = broadcast(Seq(
        cents.zipWithIndex.map { case (c, i) => (i, c) }).toDF("cb"))
      val moments = e.crossJoin(cdf)
        .withColumn("cid", array_min(expr(
          "transform(cb, c -> struct(l2_sq_native(v, c._2) AS d2, c._1 AS cid))"))
          .getField("cid"))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("x")).as("sx"),
          Det.dsum(col("x") * col("x")).as("sxx"),
          Det.davg(col("x")).as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1),
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .sortBy(t => (t._1, t._2)) // fixed fold order → deterministic SSE
      var sse = 0.0
      moments.foreach { case (cid, pos, (n, sx, sxx, _)) =>
        val c = cents(cid)(pos)
        sse += sxx - 2.0 * c * sx + n * c * c
      }
      val byCid = moments.groupBy(_._1)
      cents = cents.zipWithIndex.map { case (old, i) =>
        byCid.get(i) match {
          case Some(rows) => rows.sortBy(_._2).map(_._3._4).toIndexedSeq
          case None => old // empty list keeps its centroid
        }
      }
      // relative tolerance (the MLlib convention): a round that improves
      // the objective by <0.01% is converged — absolute thresholds never
      // fire on large corpora where SSE is huge
      done = sses.lastOption.exists(prev => prev - sse < 1e-4 * prev)
      sses += sse
      round += 1
    }
    e.unpersist()
    (cents, sses.toSeq)
  }

  /** Trained codebooks cached per (session, sfDir) — training is shared
    * fixture work, same discipline as the parsed-envelope cache.
    */
  private val kmeansCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (Seq[Seq[Double]], Seq[Double])]()
  private[graft] def kmeansTrained(s: SparkSession,
      dir: String): (Seq[Seq[Double]], Seq[Double]) = {
    // same bounding rule as DedupGraph.edgeCache: evict dead-context
    // entries and cap total size so session churn can't pin sessions
    kmeansCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    if (kmeansCache.size > 16) kmeansCache.clear()
    // fingerprint in the key: an in-JVM testdata swap must retrain,
    // not serve a codebook fitted to the previous drop. The "0"
    // listing-failure sentinel must REFUSE, not cache: a codebook
    // trained mid-swap would be pinned under "$dir@0" and served to
    // any later failure window over different data (the
    // ensureBucketed rule, Joins.scala)
    val fp = graft.Scratch.fixtureFingerprint(dir)
    require(fp != "0",
      s"fixture dir $dir unlistable or mid-swap (fingerprint sentinel): " +
        "refusing to train/cache a codebook on unstable fixtures")
    kmeansCache.computeIfAbsent(
      (s, s"$dir@$fp"),
      _ => kmeansTrain(s, dir, 8, 15))
  }

  /** The training curve itself: per-round SSE. Deterministic but not
    * SQL-expressible (iterated fixpoint) → rows-only; VectorTextSpec
    * asserts the Lloyd's monotone-SSE invariant and convergence.
    */
  private def vecKmeansTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, sses) = kmeansTrained(s, dir)
    sses.zipWithIndex
      .map { case (sse, i) => (i.toLong, BigDecimal(sse)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toDF("round", "sse")
      .orderBy(col("round"))
  }

  /** IVF with the TRAINED coarse quantizer (vs sim_ivf_knn's exact
    * label-centroid routing): corpus assigned once to the k=8 trained
    * lists, each probe routed to its nprobe=2 nearest lists, L2 top-3
    * within the routed lists only. Deterministic (trained codebook is a
    * pure function of the corpus) but iterative → rows-only;
    * VectorTextSpec asserts recall vs exact top-3 IMPROVES over routing
    * with the untrained seed codebook — the point of training.
    *
    * Scale notes: same shape as sim_ivf_knn — codebook broadcast, corpus
    * stays partitioned by list id, probes touch nprobe/nlist of it.
    */
  private def simIvfTrainedKnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val (cents, _) = kmeansTrained(s, dir)
    val cdf = broadcast(cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cid", "cvec"))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), dbl(col("embedding")).as("v"))
    // the fused native expression: same left-to-right fold as the HOF
    // formulation (bit-identical — ExtensionsSpec), minus the per-row
    // zip/transform array allocations
    def d2(a: String, b: String): Column = expr(s"l2_sq_native($a, $b)")
    // argmin as a hash aggregate min(struct(d2, cid, v)) — map-side
    // partial combine collapses the k crossed rows per vector before
    // the shuffle, where the former row_number sort-window shuffled all
    // n x k rows (vecPq measured the same swap at 2.3x)
    val lists = e.crossJoin(cdf)
      .withColumn("d2", d2("v", "cvec"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"), col("v"))).as("m"))
      .select(col("vec_id").as("cand_id"), col("m.cid").as("list_id"),
        col("m.v").as("cv"))
    val probes = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val wSel = Window.partitionBy(col("probe_id"))
      .orderBy(col("d2").asc, col("cid"))
    val routed = probes.crossJoin(cdf)
      .withColumn("d2", d2("pv", "cvec"))
      .withColumn("rn", row_number().over(wSel)).filter(col("rn") <= 2)
      .select(col("probe_id"), col("pv"), col("cid").as("list_id"))
    // routed is the bounded side (probes x nprobe) — pin the broadcast
    // so the corpus-sized lists frame never shuffles on a <=8-value key
    rankPerProbe(
      broadcast(routed).join(lists, "list_id")
        .filter(col("cand_id") =!= col("probe_id"))
        .withColumn("dist", round(d2("pv", "cv"), 6)),
      "dist", 3, ascending = true)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("list_id"),
        col("dist"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Greedy k-center coreset selection (farthest-first traversal — the
    * Gonzalez 2-approximation, the "pick a maximally diverse subset"
    * primitive of data curation): seed = min vec_id, then 7 rounds of
    * "select the corpus point farthest from every already-selected
    * center". Each round's argmax ranks the EXACT-INTEGER
    * floor(min-dist·1e6) (ties by vec_id) — the sim_mmr integer-unit
    * discipline, because round()-then-rank in a CHAINED argmax is the
    * confirmed class-3 midpoint split and one swapped pick diverges
    * every later round; the DuckDB twin replays the identical eight
    * argmax steps as chained CTEs over the same fold-order-pinned L2²
    * (the fn_distance_family parity).
    * VectorTextSpec additionally asserts the selection distances are
    * non-increasing (the Gonzalez invariant) and ids distinct.
    *
    * Scale notes: state is ONE double per corpus row (min-dist-so-far),
    * updated MAP-SIDE each round against the single broadcast newest
    * center — k narrow passes, never a k×n cross join; the per-round
    * argmax is a 1-row collect (the dedup_cluster probe shape). At
    * 100 TB this is k scans with the running min-dist persisted
    * alongside the vectors.
    */
  private def sampleKcenter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val k = 8
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), dbl(col("embedding")).as("v"))
    val first = e.orderBy(col("vec_id")).limit(1).collect()(0)
    var sel = List[(Long, Long, Double)]((1L, first.getLong(0), 0.0))
    var cur = e.withColumn("mind",
      call_function("l2_sq_native", col("v"),
        typedlit(first.getSeq[Double](1)))).localCheckpoint()
    var i = 2
    while (i <= k) {
      // rank on floor(mind·1e6), NOT round(mind, 6): Spark's round on
      // DOUBLE goes through the shortest decimal string (HALF_UP) while
      // DuckDB rounds the exact binary value — the class-3 midpoint
      // split that bit sim_mmr in dev, and poison for a CHAINED argmax
      // where one swapped pick diverges every later round. floor of the
      // identical IEEE product is exact on both engines.
      val far = cur.orderBy(floor(col("mind") * lit(1e6)).desc, col("vec_id"))
        .limit(1)
        .select(col("vec_id"), col("mind"), col("v")).collect()(0)
      sel ::= ((i.toLong, far.getLong(0), far.getDouble(1)))
      cur = cur.withColumn("mind", least(col("mind"),
        call_function("l2_sq_native", col("v"),
          typedlit(far.getSeq[Double](2))))).localCheckpoint()
      i += 1
    }
    sel.reverse
      .map { case (o, id, d) => (o, id, BigDecimal(d)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toDF("sel_order", "vec_id", "dist_sq_at_selection")
      .orderBy(col("sel_order"))
  }

  /** Symmetric int8 quantization of the embedding column (the ANN memory
    * play: 4× smaller vectors, SIMD-able codes): per-vector scale =
    * max|x|/127, code = floor(x/scale + 0.5) ∈ [-127, 127], plus the
    * reconstruction-error stats a quantization job must report. floor(x+½)
    * instead of round(): IEEE-identical on both engines, no
    * HALF_UP-vs-binary midpoint hazard. Pure map-side transform — at
    * 100 TB this runs in the scan projection, no shuffle.
    */
  private def vecQuantize(s: SparkSession, dir: String): DataFrame = {
    val v = dbl(col("embedding"))
    // scale is HOISTED into real columns: embedded in the per-element
    // transform lambdas it would re-run its own 64-element max fold per
    // element per consumer (~200 re-evaluations/row — interpreted HOFs
    // do no loop-invariant elimination; the vecMatryoshka discipline)
    val rawScaleCol = array_max(transform(v, x => abs(x))) / 127.0
    Tables.embeddings(s, dir)
      .withColumn("raw_scale", rawScaleCol)
      // an all-zero vector has scale 0: divide by 1 instead so codes and
      // error are 0 on BOTH engines (under ANSI the 0-divide would
      // THROW; with a non-ANSI session it is the class-6 NULL-vs-NaN
      // divergence); q_scale still reports the true 0
      .withColumn("scale",
        when(col("raw_scale") === 0.0, lit(1.0)).otherwise(col("raw_scale")))
      .select(col("vec_id"),
        round(col("raw_scale"), 6).as("q_scale"),
        array_max(transform(v,
          x => abs(floor(x / col("scale") + 0.5)))).cast("int").as("max_code"),
        round(aggregate(
          transform(v, x =>
            abs(x - floor(x / col("scale") + 0.5) * col("scale"))),
          lit(0.0), (acc, x) => acc + x)
          / size(col("embedding")), 6).as("mean_abs_err"))
      .orderBy(col("vec_id"))
  }

  /** MinHash-LSH fuzzy dedup (the 100 TB dedup path): token sets →
    * binary HashingTF vectors → banded MinHash → approxSimilarityJoin.
    * Seeded, so deterministic; recall vs. the exact-Jaccard twin is
    * asserted in ScalaTest (no SQL oracle for LSH).
    */
  private def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val docs = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .withColumn("tokens", array_distinct(split(col("text"), " ")))
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(1024).setBinary(true)
    // feat feeds lsh.fit AND both approxSimilarityJoin sides — without a
    // persist the tokenize+TF pipeline runs 3×, which tripled bench time in
    // round 2. Materialize once; CacheManager keys on the canonicalized
    // plan, so repeat invocations reuse the same cached copy.
    val feat = tf.transform(docs).select(col("doc_id"), col("features"))
      .persist()
    feat.count()
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(feat)
    // distance threshold 0.6, not 0.5: MinHash Jaccard here is over the
    // 1024-dim hashed vectors, so token hash collisions can push a pair
    // slightly across the exact-token-set 0.5 boundary; the recall-vs-exact
    // gate (VectorTextSpec) needs the slack. The threshold only filters the
    // post-bucket-join candidates, so it does not widen the join itself.
    model.approxSimilarityJoin(feat, feat, 0.6, "jaccard_dist")
      .select(col("datasetA.doc_id").as("id_a"),
        col("datasetB.doc_id").as("id_b"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Banded MinHash built from Spark primitives only — no MLlib model
    * fit, no Vector conversion UDF: per-doc signature = 8 min-hashes,
    * banded 4×2; docs sharing any band bucket become candidates (one
    * self-join on the band key — the banded-LSH join, touching
    * candidates only); candidates are then verified with EXACT
    * token-set Jaccard (array_intersect) so the output has no false
    * positives, only LSH recall loss (bounded by the ScalaTest recall
    * gate, same as the MLlib path).
    *
    * Two shuffle-economy choices that matter at corpus scale:
    * (1) each token's string is xxhash64'd ONCE; the 8 signature
    * functions re-hash the 8-byte base hash with a seed (8 long-input
    * passes instead of 8 string-input passes — the string dominates);
    * (2) the banded self-join carries ONLY (doc_id, band, bucket) —
    * token sets re-attach to the deduped candidate PAIRS by doc_id, so
    * the wide arrays cross the wire O(candidates) times, not
    * O(bands × bucket-collisions). Same 100 TB shape as dedup_minhash
    * at a fraction of its constant factor — Bench shows the difference
    * directly.
    */
  private def dedupMinhashNative(s: SparkSession, dir: String): DataFrame = {
    val nHash = 8
    val bands = 4 // 2 hashes per band
    val docs = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("tokset"))
      // three consumers (signature arm + the two token-set re-attach
      // joins) whose pruned plans differ — checkpoint so the string-
      // dominated tokenize pass runs once (the dedup_minhash
      // feat.persist lesson: it tripled bench time in round 2)
      .localCheckpoint()
    val sig = docs
      .withColumn("base", transform(col("tokset"), t => xxhash64(t)))
      .withColumn("sig", array(
        (0 until nHash).map(i =>
          array_min(transform(col("base"), h => xxhash64(h, lit(i))))): _*))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(element_at(col("sig"), b * 2 + 1),
            element_at(col("sig"), b * 2 + 2)).as("bucket"))): _*))
        .as(Seq("pos", "bb")))
      .select(col("doc_id"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(docs.select(col("doc_id").as("id_a"), col("tokset").as("ts_a")),
        "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("tokset").as("ts_b")),
        "id_b")
      .withColumn("n_inter", size(array_intersect(col("ts_a"), col("ts_b"))))
      .withColumn("jaccard", round(col("n_inter").cast("double")
        / (size(col("ts_a")) + size(col("ts_b")) - col("n_inter")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Random-projection LSH approximate k-NN (the scale path for
    * similarity search). Seeded; recall asserted in ScalaTest.
    */
  private def simLshKnn(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.linalg.Vectors
    val toVec = udf((a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray))
    // feeds lsh.fit + datasetA + the probe filter — persist once (see
    // dedupMinhash note on CacheManager plan-keyed reuse)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), toVec(col("embedding")).as("features"))
      .persist()
    e.count()
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("features").as("pf"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(0.5).setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(e)
    model.approxSimilarityJoin(
        e, probes.withColumnRenamed("pf", "features")
          .withColumnRenamed("probe_id", "vec_id"), 1.2, "dist")
      .select(col("datasetB.vec_id").as("probe_id"),
        col("datasetA.vec_id").as("cand_id"),
        round(col("dist"), 6).as("dist"))
      .filter(col("probe_id") =!= col("cand_id"))
      .orderBy(col("probe_id"), col("dist"), col("cand_id"))
  }

  /** K-means ASSIGNMENT step, relationally: the model is the exact
    * per-label centroid set (same coarse quantizer as sim_ivf_knn);
    * every vector is assigned to its nearest centroid by cosine (6dp,
    * label tiebreak) and the result is the label x assigned confusion
    * matrix. Together with label_centroid (the UPDATE step) this is one
    * full Lloyd's iteration — iterate the pair for k-means proper.
    *
    * Scale notes: centroids are O(k·d) and broadcast; the corpus side is
    * a map-side probe against k rows plus a partial-agg count — the big
    * side never shuffles. The per-vector argmin is a k-row window INSIDE
    * a vec_id partition that exists only in the joined intermediate, so
    * no skew: at 100 TB this is exactly how MLlib's KMeans scores, minus
    * the RDD detour.
    */
  private def vecKmeansAssign(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).withColumn("v", dbl(col("embedding")))
    val cents = labelCentroids(e).withColumnRenamed("label", "clabel")
    // argmax-by-csim as a hash aggregate min(struct(-csim, clabel)):
    // map-side combine collapses the k crossed rows per vector before
    // any shuffle, where a row_number sort-window shuffled all n x k
    // rows (the vecPq-measured 2.3x swap). Negation is IEEE-exact;
    // ties break on the smaller clabel, identical to the old window.
    e.crossJoin(broadcast(cents))
      .withColumn("csim", round(expr("cosine_sim_native(v, cvec)"), 6))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(struct((-col("csim")).as("nc"), col("clabel"))).as("m"))
      .groupBy(col("label"), col("m.clabel").as("assigned_label"))
      .agg(count(lit(1)).as("n"))
      .select(col("label"), col("assigned_label"), col("n"))
      .orderBy(col("label"), col("assigned_label"))
  }

  /** Hard-negative mining (the contrastive-training companion of
    * sim_topk): for each probe, the top-3 most similar vectors with a
    * DIFFERENT label — the near-miss impostors an embedding model
    * trains against (triplet/InfoNCE negatives). Identical scale shape
    * to sim_topk — bounded probe set broadcast, corpus never shuffles,
    * fused native cosine — plus a map-side label-inequality filter that
    * shrinks the ranked set before the window.
    */
  private def simHardNegative(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
        col("embedding").as("pv"))
    val cands = e.select(col("vec_id").as("cand_id"),
      col("label").as("cand_label"), col("embedding").as("cv"))
    rankPerProbe(
      cands.crossJoin(broadcast(probes))
        .filter(col("cand_label") =!= col("probe_label"))
        .withColumn("cos_sim", round(expr("cosine_sim_native(pv, cv)"), 6)),
      "cos_sim", 3)
      .select(col("probe_id"), col("rnk"), col("cand_id"),
        col("cand_label"), col("cos_sim"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication = cluster the
    * embedding space coarsely, then drop all but one member of each
    * near-duplicate pair WITHIN a cluster — never across the corpus.
    * Here the coarse step is the deterministic k-means assignment
    * (exact per-label centroids as the codebook, same as
    * vec_kmeans_assign) and the fine step is the 0.35-cosine pair cut
    * with keep-lowest-id survivorship; a vector is dropped iff an
    * earlier same-cluster member sits above the threshold.
    *
    * Scale notes: centroids broadcast (KB); the corpus shuffles ONCE on
    * assigned cluster; the quadratic pair scan is confined to each
    * cluster's partition (the SemDeDup trick — clusters bound the
    * all-pairs blow-up), and the fused native CosineSim expression
    * scores pairs in a single codegen'd pass.
    */
  private def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).withColumn("v", dbl(col("embedding")))
    val cents = labelCentroids(e).withColumnRenamed("label", "clabel")
    // same min(struct) hash-agg argmin as vec_kmeans_assign (no n x k
    // sort-window), checkpointed: THREE consumers below (a, b, final
    // left join) whose pruned exchanges differ — without it the
    // corpus-wide assignment recomputes per consumer
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("csim", round(expr("cosine_sim_native(v, cvec)"), 6))
      .groupBy(col("vec_id"))
      .agg(min(struct((-col("csim")).as("nc"), col("clabel"),
        col("embedding").as("emb"))).as("m"))
      .select(col("vec_id"), col("m.clabel").as("cluster"),
        col("m.emb").as("embedding"))
      .localCheckpoint()
    val a = assigned.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("va"))
    val b = assigned.select(col("cluster").as("cluster_b"),
      col("vec_id").as("id_b"), col("embedding").as("vb"))
    val dropped = a
      .join(b, col("cluster") === col("cluster_b") && col("id_a") < col("id_b"))
      .withColumn("cs", round(expr("cosine_sim_native(va, vb)"), 6))
      .filter(col("cs") >= 0.35)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("hit", lit(1))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        col("hit").isNull.as("keep"))
      .orderBy(col("vec_id"))
  }

  /** Sign-random-projection (SRP) dimensionality reduction (Charikar'02;
    * Achlioptas'01 database-friendly projections): 64-d float vectors
    * projected onto 8 ±1 hyperplanes whose signs are derived
    * in-expression from a fixed integer mix — the projection matrix is
    * never materialized. The 8 projection signs are the vector's SimHash
    * bucket, i.e. this is the deterministic oracle-able core of what
    * BucketedRandomProjectionLSH (sim_lsh_knn) does with seeded RNG.
    *
    * Scale notes: a pure per-row map — zero shuffle (the edge orderBy is
    * t2 determinism only); accumulation is exact DECIMAL(30,6) inside a
    * sequential HOF fold so the result is bit-identical to DuckDB's
    * group-sum regardless of either engine's evaluation order.
    */
  private def vecRpProject(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("v", dbl(col("embedding")))
      .select(col("vec_id"), posexplode(expr(
        """transform(sequence(0, 7), j ->
             aggregate(
               zip_with(v, sequence(1, size(v)), (x, i) ->
                 x * (case when (cast(i as bigint) * 73856093
                            + cast(j as bigint) * 19349663) % 104729 % 2 = 0
                      then cast(1 as double) else cast(-1 as double) end)),
               cast(0 as decimal(30,6)),
               (acc, t) -> cast(acc + cast(t as decimal(30,6))
                                as decimal(30,6))))"""))
        .as(Seq("dim", "p")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("p").cast("double").as("proj"),
        (col("p") > 0).as("srp_bit"))
      .orderBy(col("vec_id"), col("dim"))

  /** Product quantization (Jégou et al. PAMI'11) — the workhorse ANN
    * compression: the 64-d vector splits into 8 subspaces of 8 dims, each
    * subvector snaps to its nearest sub-codeword, and the vector is
    * stored as 8 codes (64 floats → 8 bytes, 32× compression). The
    * codebook here is the deterministic one this repo already proves
    * correct elsewhere: per-label exact sub-centroids (the
    * vec_kmeans_assign model restricted to each subspace) — a real PQ
    * trains per-subspace k-means, which is this assignment step iterated.
    * Output per vector: its 8-code word and the quantized reconstruction
    * error ‖v − dec(codes)‖², i.e. the sum of per-subspace argmin
    * distances.
    *
    * Determinism across engines: sub-distances fold sequentially over
    * dims (identical IEEE op chain both sides), argmin tiebreaks on
    * (dist, label), and the error is edge-quantized with floor(x·1e6 +
    * 0.5) — never round() (Spark rounds the shortest decimal string,
    * DuckDB the exact binary).
    *
    * Scale notes: the codebook is O(k·d) and broadcast; per-row work is
    * the 8×k distance table — map-side. The argmin window partitions by
    * (vec_id, m), which only exists in the crossed intermediate, so no
    * skew; the final regroup is one shuffle on vec_id. At 100 TB the
    * codes column (8 bytes/row) is what an IVF-PQ index stores — probing
    * it is sim_ivf_knn's routing plus an ADC table lookup over these
    * codes.
    */
  /** The PQ subspace geometry (8 subspaces × 8 dims, 1-based element_at,
    * sequential fold) in ONE place — vec_pq's encoder and
    * sim_ivfpq_knn's shared distance frame both posexplode this
    * expression over columns (v, cvec), and the two DuckDB oracles share
    * [[oSubDist]] the same way. Editing the geometry at one site but not
    * the others would make the stored codes disagree with the codes the
    * ADC search scores against — a silent ranking corruption no
    * single-key oracle catches.
    */
  private val subDistSql: String =
    """transform(sequence(0, 7), m ->
         aggregate(
           transform(sequence(1, 8), i ->
             (element_at(v, m * 8 + i) - element_at(cvec, m * 8 + i))
               * (element_at(v, m * 8 + i)
                  - element_at(cvec, m * 8 + i))),
           cast(0 as double), (acc, x) -> acc + x))"""

  /** Oracle twin of [[subDistSql]] (columns v, cv; subspace alias r.m
    * from `range(0, 8) r(m)`).
    */
  private val oSubDist: String =
    """list_reduce(list_transform(range(1, 9), i ->
         (v[r.m * 8 + i] - cv[r.m * 8 + i])
           * (v[r.m * 8 + i] - cv[r.m * 8 + i])),
       (a, b) -> a + b)"""

  private def vecPq(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).withColumn("v", dbl(col("embedding")))
    val cents = labelCentroids(e).withColumnRenamed("label", "clabel")
    val dists = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("clabel"),
        posexplode(expr(subDistSql)).as(Seq("m", "d")))
    // argmin via hash aggregate (min over struct(d, label) = argmin with
    // label tiebreak) — a sort-based window over the crossed intermediate
    // was 2.3× slower at sf0.1 for the same result
    dists
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d"), col("clabel"))).as("best"))
      .select(col("vec_id"), col("m"),
        col("best.clabel").as("clabel"), col("best.d").as("d"))
      .groupBy(col("vec_id"))
      .agg(
        expr("""array_join(transform(array_sort(collect_list(struct(m, clabel))),
                 s -> s.clabel), ',')""").as("codes"),
        expr("""aggregate(transform(array_sort(collect_list(struct(m, d))),
                 s -> s.d), cast(0 as double), (acc, x) -> acc + x)""")
          .as("recon"))
      .select(col("vec_id"), col("codes"),
        floor(col("recon") * 1e6 + 0.5).cast("long").as("recon_q"))
      .orderBy(col("vec_id"))
  }

  /** IVF-PQ search (Jégou et al. TPAMI'11, the FAISS index shape):
    * coarse quantizer routes each probe to its nprobe=2 nearest lists,
    * and candidates in those lists are scored by ASYMMETRIC DISTANCE —
    * the probe's per-subspace distances to each candidate's PQ
    * CODEWORDS, never to the raw vector. Fully deterministic (exact
    * centroids double as coarse lists AND subspace codebooks; exact
    * decimal term sums), hence oracle-able end to end.
    *
    * Scale notes: this is the ANN serving plan at 100 TB — (1) PQ
    * encode is an index-build pass: broadcast codebook, map-side argmin,
    * 8 single-byte codes per vector stored instead of 64 floats;
    * (2) per query only an O(nlist × m) distance LUT is computed and
    * broadcast; (3) the scan touches nprobe/nlist of the corpus and
    * reads CODES, not vectors — the shuffle carries candidate scores
    * only. The shared (vec × codeword × subspace) distance frame is
    * persisted: encode, routing and LUT all derive from it.
    */
  private def simIvfPqKnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).withColumn("v", dbl(col("embedding")))
    val cents = labelCentroids(e).withColumnRenamed("label", "clabel")
    val sub = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("clabel"),
        posexplode(expr(subDistSql)).as(Seq("m", "d")))
      .persist()
    val codes = sub.groupBy(col("vec_id"), col("label"), col("m"))
      .agg(min(struct(col("d"), col("clabel"))).as("best"))
      .select(col("vec_id").as("cand_id"), col("label").as("cand_label"),
        col("m").as("cm"), col("best.clabel").as("code"))
    val isProbe = col("vec_id") % 100 === 0
    val rfull = Window.partitionBy(col("probe_id"))
      .orderBy(col("fd"), col("clabel"))
    val route = sub.filter(isProbe)
      .groupBy(col("vec_id").as("probe_id"), col("clabel"))
      .agg(graft.Det.dsum(col("d")).as("fd"))
      .withColumn("rn", row_number().over(rfull))
      .filter(col("rn") <= 2)
      .select(col("probe_id"), col("clabel").as("list_label"))
    val lut = sub.filter(isProbe)
      .select(col("vec_id").as("lprobe"), col("m").as("lm"),
        col("clabel").as("lcode"), col("d").as("ld"))
    rankPerProbe(
      route
        .join(codes, col("cand_label") === col("list_label") &&
          col("cand_id") =!= col("probe_id"))
        .join(broadcast(lut), col("lprobe") === col("probe_id") &&
          col("lm") === col("cm") && col("lcode") === col("code"))
        .groupBy(col("probe_id"), col("cand_id"), col("cand_label"))
        .agg(round(graft.Det.dsum(col("ld")), 6).as("adc_dist")),
      "adc_dist", 3, ascending = true)
      .select(col("probe_id"), col("rnk"), col("cand_id"),
        col("cand_label"), col("adc_dist"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Matryoshka truncation analysis (Kusupati et al. NeurIPS'22 MRL):
    * before serving embeddings at a cheaper dimensionality, measure how
    * much of each vector's energy (squared L2 norm) its 8/16/32-dim
    * prefixes capture — the data-driven basis for storage tiering (e.g.
    * keep 16 dims hot, 64 cold). Per-label averages expose whether any
    * class concentrates information in late dimensions and would degrade
    * under truncation.
    *
    * Scale notes: pure per-row HOF folds + one partial-agg shuffle on
    * label. Energies fold sequentially (identical IEEE chain both
    * engines) and the per-label means are exact decimal sums — no
    * rounding anywhere at the edge.
    */
  private def vecMatryoshka(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).withColumn("v", dbl(col("embedding")))
    def energy(k: Int) = expr(
      s"aggregate(slice(v, 1, $k), cast(0 as double), (acc, x) -> acc + x * x)")
    // zero-vector guard (class 6): total energy exactly 0 makes every
    // fraction 0/0 — NULL on Spark (skipped by Det.davg's sum while the
    // count still counts the row) but NaN on DuckDB (errors oAvg's
    // decimal cast). Define the fraction as 0.0 on BOTH engines. The
    // total is hoisted to ONE fold per row (guard + three denominators
    // would otherwise re-run the 64-element lambda four extra times).
    def frac(k: Int) = when(col("tot") === 0, lit(0.0))
      .otherwise(energy(k) / col("tot"))
    e.withColumn("tot", energy(64))
      .select(col("label"),
        frac(8).as("f8"),
        frac(16).as("f16"),
        frac(32).as("f32"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        Det.davg(col("f8")).as("avg_frac_8"),
        Det.davg(col("f16")).as("avg_frac_16"),
        Det.davg(col("f32")).as("avg_frac_32"))
      .orderBy(col("label"))
  }

  // ---- oracles ----

  /** The sample_kcenter oracle: Gonzalez farthest-first replayed as
    * eight chained argmax CTEs — step t ranks every corpus point by the
    * exact-integer floor(1e6·least L2²) to the t−1 already-chosen
    * centers (fold-order pinned to l2_sq_native via the
    * fn_distance_family list_sum form), ties by vec_id, LIMIT 1.
    * Generated programmatically so step count and arithmetic stay in
    * one place.
    */
  private val kcenterOracle: String = {
    def l2(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    val steps = (2 to 8).map { t =>
      val cs = (1 until t).map(j => s"s$j c$j").mkString(", ")
      val dists = (1 until t).map(j => l2("x.v", s"c$j.v"))
      val mind =
        if (dists.size == 1) dists.head
        else s"least(${dists.mkString(", ")})"
      s"""m$t AS (SELECT x.vec_id, x.v, $mind AS mind FROM e x, $cs),
         s$t AS (SELECT vec_id, v, mind FROM m$t
           ORDER BY floor(mind * 1000000) DESC, vec_id LIMIT 1)"""
    }.mkString(",\n")
    val unions = (2 to 8).map(t =>
      s"SELECT $t AS sel_order, vec_id, round(mind, 6) " +
        s"AS dist_sq_at_selection FROM s$t").mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         FROM embeddings),
       s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
       $steps
       SELECT * FROM (
         SELECT 1 AS sel_order, vec_id, CAST(0.0 AS DOUBLE)
           AS dist_sq_at_selection FROM s1
         UNION ALL
         $unions) u ORDER BY sel_order"""
  }

  /** The sim_mmr oracle: the greedy replayed as five chained argmax
    * CTEs (the kcenterOracle discipline — step count, λ-weights, and
    * the integer 1e-7-unit scoring live in ONE place). Step t scores
    * every not-yet-selected pool candidate as 7·rel_µ − 3·pen_µ where
    * pen = greatest sim to the t−1 already-selected, ties by cand_id,
    * LIMIT 1 per probe.
    */
  private def mmrOracle: String = {
    def m(t: Int): String =
      if (t == 1) "7*CAST(round(p.rel*1000000) AS BIGINT)"
      else {
        val pen = s"greatest(${(1 until t).map(j => s"sa$j.sim").mkString(", ")})"
        s"7*CAST(round(p.rel*1000000) AS BIGINT) " +
          s"- 3*CAST(round(($pen)*1000000) AS BIGINT)"
      }
    val steps = (1 to 5).map { t =>
      val joins = (1 until t).map { j =>
        s"""JOIN s$j ON s$j.probe_id = p.probe_id
              AND p.cand_id <> s$j.cand_id
            JOIN sims sa$j ON sa$j.probe_id = p.probe_id
              AND sa$j.ca = p.cand_id AND sa$j.cb = s$j.cand_id"""
      }.mkString("\n")
      s"""s$t AS (SELECT probe_id, cand_id, m FROM (
            SELECT p.probe_id, p.cand_id, ${m(t)} AS m,
              row_number() OVER (PARTITION BY p.probe_id
                ORDER BY ${m(t)} DESC, p.cand_id) AS rn
            FROM pool p
            $joins) t WHERE rn = 1)"""
    }.mkString(",\n")
    val unions = (1 to 5).map(t =>
      s"SELECT probe_id, $t AS step, cand_id, m FROM s$t")
      .mkString("\nUNION ALL\n")
    s"""WITH pool AS (
          SELECT probe_id, cand_id, rel FROM (
            SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
              round(${oDot.format("p.embedding", "c.embedding")}
                / (${oNorm("p.embedding")} * ${oNorm("c.embedding")}),
                6) AS rel,
              row_number() OVER (PARTITION BY p.vec_id
                ORDER BY round(
                  ${oDot.format("p.embedding", "c.embedding")}
                  / (${oNorm("p.embedding")}
                    * ${oNorm("c.embedding")}), 6) DESC,
                  c.vec_id) AS rnk
            FROM embeddings p JOIN embeddings c
              ON p.vec_id % 100 = 0 AND c.vec_id <> p.vec_id) t
          WHERE rnk <= 10),
        sims AS (
          SELECT x.probe_id, x.cand_id AS ca, y.cand_id AS cb,
            round(${oDot.format("ex.embedding", "ey.embedding")}
              / (${oNorm("ex.embedding")} * ${oNorm("ey.embedding")}),
              6) AS sim
          FROM pool x JOIN pool y ON x.probe_id = y.probe_id
            AND x.cand_id <> y.cand_id
          JOIN embeddings ex ON ex.vec_id = x.cand_id
          JOIN embeddings ey ON ey.vec_id = y.cand_id),
        $steps
        SELECT probe_id, CAST(step AS INTEGER) AS step, cand_id,
          m AS mmr_score_e7
        FROM ($unions) u
        ORDER BY probe_id, step"""
  }

  private val oDot =
    "list_dot_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))"

  private def oNorm(v: String): String =
    s"sqrt(list_dot_product(CAST($v AS DOUBLE[]), CAST($v AS DOUBLE[])))"

  /** 1-bit (sign) binary quantization — the most aggressive embedding
    * compression tier (64 dims → one BIGINT, 256× smaller than float32)
    * with Hamming distance as the similarity proxy: probes rank the
    * corpus by popcount(sig_a XOR sig_b). Signatures are sums of
    * distinct powers of two (order-free integer math — deterministic at
    * any parallelism); XOR/bit_count are single codegen'd instructions.
    *
    * Scale notes: the signature table is ~0.8 GB per billion vectors —
    * it BROADCASTS where the float corpus never could, which is why
    * binary pre-ranking + float re-ranking is the standard two-stage
    * retrieval layout. Probe set broadcast; corpus side never shuffles.
    */
  private def vecBinaryQuantize(s: SparkSession, dir: String): DataFrame = {
    // one 32-bit word per 32 dims (the general multi-word layout; also
    // sidesteps engines that refuse a 1<<63 bigint shift)
    val sigs = Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("vec_id"))
      .agg(
        sum(expr("if(x > 0 and i < 32, " +
          "shiftleft(cast(1 as bigint), i), cast(0 as bigint))")).as("lo"),
        sum(expr("if(x > 0 and i >= 32, " +
          "shiftleft(cast(1 as bigint), i - 32), cast(0 as bigint))"))
          .as("hi"))
    val sigsCk = sigs.localCheckpoint() // 3 longs/row; two consumers
    val probes = sigsCk.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("lo").as("plo"),
        col("hi").as("phi"))
    // pin the bounded probe side as the broadcast build: post-agg size
    // estimates must not pick the corpus-wide signature table (or flip
    // build sides between runs) for this non-equi join
    rankPerProbe(
      broadcast(probes).join(sigsCk.select(col("vec_id").as("cand_id"),
          col("lo"), col("hi")), col("cand_id") =!= col("probe_id"))
        .withColumn("hamming",
          expr("bit_count(plo ^ lo) + bit_count(phi ^ hi)")),
      "hamming", 5, ascending = true)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("hamming"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Embedding outlier score — diagonal Mahalanobis z² = Σⱼ(xⱼ−μⱼ)²/σ²ⱼ,
    * the embedding-health check that catches collapsed or corrupted
    * vectors before they poison retrieval. Per-dim moments are exact
    * decimal sums (both engines produce bit-equal μ, σ²); per-row terms
    * run in double with one op order and decimal-sum per vector —
    * nothing anywhere depends on fold or partition order. Top-20
    * outliers by score.
    *
    * Scale notes: moments = one partial-agg shuffle keyed by dimension
    * (64 groups) broadcast back; scoring is map-side; the top-20 is
    * TakeOrdered. Two passes over X, no pairwise anything.
    */
  private def vecOutlier(s: SparkSession, dir: String): DataFrame = {
    val ex = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        posexplode(dbl(col("embedding"))).as(Seq("pos", "x")))
    val st = ex.groupBy(col("pos"))
      .agg(Det.davg(col("x")).as("mu"),
        Det.davg(col("x") * col("x")).as("m2"))
    ex.join(broadcast(st), "pos")
      // dead-dimension guard (class 6/8): a constant dimension makes
      // the variance exactly 0 on both engines (identical mu/m2
      // doubles) and the numerator 0 too — the 0/0 is NULL on Spark
      // (silently skipped by the decimal sum) but NaN on DuckDB (which
      // errors oSum's decimal cast). Contribute exactly 0 on BOTH.
      .select(col("vec_id"), col("label"),
        when(col("m2") - col("mu") * col("mu") === 0, lit(0.0))
          .otherwise((col("x") - col("mu")) * (col("x") - col("mu")) /
            (col("m2") - col("mu") * col("mu"))).as("term"))
      .groupBy(col("vec_id"), col("label"))
      .agg(round(Det.dsum(col("term")), 6).as("z2"))
      .orderBy(col("z2").desc, col("vec_id"))
      .limit(20)
  }

  /** Dedup threshold calibration — the sweep every semantic-dedup rollout
    * runs BEFORE picking its cutoff: one pass over the blocked candidate
    * pairs, each pair counted against every threshold in the grid, giving
    * pairs-flagged and docs-dropped per threshold (the dedup
    * aggressiveness curve). The pair set is computed ONCE (label-blocked,
    * fused native cosine) and fanned out by a 5-element explode — the
    * sweep costs one aggregation more than a single-threshold run.
    */
  private def dedupThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("label"), col("vec_id").as("id_a"),
      col("embedding").as("va"))
    val b = e.select(col("label").as("label_b"), col("vec_id").as("id_b"),
      col("embedding").as("vb"))
    a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(expr("cosine_sim_native(va, vb)"), 6))
      .select(col("id_b"), col("cos_sim"),
        explode(expr("array(0.2D, 0.25D, 0.3D, 0.35D, 0.4D)")).as("thr"))
      .filter(col("cos_sim") >= col("thr"))
      .groupBy(col("thr"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("id_b")).as("n_dropped"))
      .orderBy(col("thr"))
  }

  /** One PCA power-iteration step, v₁ = normalize(XᵀX·v₀), distributed as
    * two aggregations — the building block of spectral embedding analysis
    * (effective dimensionality, whitening) without any eigensolver
    * dependency. v₀ is the uniform direction (0.125 per dim — dyadic, so
    * exact); the per-row score s = v·v₀ is one explicit left fold
    * (identical IEEE op chain on both engines — DuckDB's list_reduce
    * seeds with x₁, Spark's aggregate with 0+x₁, bit-equal); the per-dim
    * back-projection Σ s·xⱼ and the norm are exact decimal sums; only the
    * final normalize divides, rounded at the edge.
    *
    * Scale notes: per step — one map-side fold, one partial-agg shuffle
    * keyed by dimension (64 groups), one broadcast of the 64-double
    * result. X never materializes transposed; iterating is a driver loop
    * with checkpoint, like dedup_cluster's rounds.
    */
  private def vecPcaPowerIter(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val scored = Tables.embeddings(s, dir)
      .withColumn("v", dbl(col("embedding")))
      .withColumn("sc",
        expr("aggregate(v, cast(0 as double), (a, x) -> a + x)") * 0.125)
    val w = scored
      .select(col("sc"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(Det.dsum(col("sc") * col("x")).as("w"))
    val nrm = w.agg(sqrt(sum((col("w") * col("w"))
      .cast(DecimalType(30, 6))).cast("double")).as("nrm"))
    w.crossJoin(broadcast(nrm))
      .select(col("pos"), round(col("w"), 6).as("w_j"),
        // zero-norm guard (degenerate all-zero back-projection): under
        // ANSI the unguarded divide would THROW; define v1 of the zero
        // vector as 0 on both engines (oracle carries the same CASE)
        round(when(col("nrm") === 0.0, lit(0.0))
          .otherwise(col("w") / col("nrm")), 6).as("v1_j"))
      .orderBy(col("pos"))
  }

  /** ANN quality evaluation — recall@10 of the IVF-routed search
    * (sim_ivf_knn's one-step label codebook, nprobe = 2) against the
    * exact brute-force top-10, per probe. This is the eval harness every
    * ANN deployment runs before trusting an index: route, retrieve,
    * intersect with ground truth RELATIONALLY (a join on
    * (probe_id, cand_id) — no list materialization), count hits.
    * Fully deterministic (exact-decimal centroids, 6dp rounding before
    * ranking, id tie-breaks), so unlike the trained/seeded ANN variants
    * it carries a complete DuckDB oracle.
    *
    * Scale notes: ground truth is the expensive arm (brute force), but
    * the probe set is bounded and broadcast, so the corpus is scanned
    * once per arm and never shuffled; the intersection joins two
    * O(probes × k) sets. At 100 TB one evaluates on a sampled probe set
    * exactly like this — recall estimation never needs all-pairs.
    */
  private def simAnnRecall(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).withColumn("v", dbl(col("embedding")))
    val probes = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val cands = e.select(col("vec_id").as("cand_id"), col("label"),
      col("v").as("cv"))
    val exact = rankPerProbe(
      cands.crossJoin(broadcast(probes))
        .filter(col("cand_id") =!= col("probe_id"))
        .withColumn("cos_sim", round(expr("cosine_sim_native(pv, cv)"), 6)),
      "cos_sim", 10)
      .select(col("probe_id"), col("cand_id"))
    val cents = labelCentroids(e)
    val wSel = Window.partitionBy(col("probe_id"))
      .orderBy(col("csim").desc, col("label"))
    val selected = probes.crossJoin(broadcast(cents))
      .withColumn("csim", round(expr("cosine_sim_native(pv, cvec)"), 6))
      .withColumn("rn", row_number().over(wSel))
      .filter(col("rn") <= 2)
      .select(col("probe_id"), col("pv"), col("label"))
    val approx = rankPerProbe(
      selected.join(cands, "label")
        .filter(col("cand_id") =!= col("probe_id"))
        .withColumn("cos_sim", round(expr("cosine_sim_native(pv, cv)"), 6)),
      "cos_sim", 10)
      .select(col("probe_id"), col("cand_id"))
    val hits = exact.join(approx, Seq("probe_id", "cand_id"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("h"))
    exact.groupBy(col("probe_id")).agg(count(lit(1)).as("n_exact"))
      .join(approx.groupBy(col("probe_id")).agg(count(lit(1)).as("n_approx")),
        "probe_id")
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"), col("n_exact"), col("n_approx"),
        coalesce(col("h"), lit(0L)).as("hits"),
        round(coalesce(col("h"), lit(0L)) / 10.0, 6).as("recall_at_10"))
      .orderBy(col("probe_id"))
  }

  /** Triplet mining for contrastive/metric training — per anchor, the
    * HARDEST positive (same label, minimum cosine: the in-class pair
    * the encoder currently separates worst) and the HARDEST negative
    * (different label, maximum cosine: the impostor it confuses most),
    * with the triplet margin pos−neg and a satisfied flag. This is the
    * batch-mining step of every triplet-loss pipeline (FaceNet's
    * hard mining, SBERT's in-batch negatives) expressed relationally.
    *
    * Scale notes: one broadcast of the bounded anchor set over a single
    * corpus scan; both argmin/argmax ride the same (anchor) window
    * shuffle of O(anchors × corpus) SCALAR rows (id, label, sim) —
    * vectors never shuffle. At 100 TB mining runs inside ANN-routed
    * candidate lists (sim_ivf_knn) exactly like the re-rank path.
    */
  private def simTripletMine(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val anchors = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
        col("embedding").as("av"))
    val cands = e.select(col("vec_id").as("cand_id"),
      col("label").as("c_label"), col("embedding").as("cv"))
    val joined = cands.crossJoin(broadcast(anchors))
      .filter(col("cand_id") =!= col("anchor_id"))
      .withColumn("cos_sim", round(expr("cosine_sim_native(av, cv)"), 6))
      .select(col("anchor_id"), col("a_label"), col("c_label"),
        col("cand_id"), col("cos_sim"))
    val wPos = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").asc, col("cand_id"))
    val wNeg = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    val pos = joined.filter(col("c_label") === col("a_label"))
      .withColumn("rn", row_number().over(wPos)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("cand_id").as("pos_id"),
        col("cos_sim").as("pos_sim"))
    val neg = joined.filter(col("c_label") =!= col("a_label"))
      .withColumn("rn", row_number().over(wNeg)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("cand_id").as("neg_id"),
        col("cos_sim").as("neg_sim"))
    pos.join(neg, "anchor_id")
      .select(col("anchor_id"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_sim"),
        round(col("pos_sim") - col("neg_sim"), 6).as("margin"),
        (col("pos_sim") > col("neg_sim")).cast("int").as("satisfied"))
      .orderBy(col("anchor_id"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sim_triplet_mine", simTripletMine,
      Some("""WITH e AS (SELECT vec_id, label,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              a AS (SELECT vec_id AS anchor_id, label AS a_label, v AS av
                 FROM e WHERE vec_id % 50 = 0),
              j AS (SELECT a.anchor_id, a.a_label, e.label AS c_label,
                 e.vec_id AS cand_id,
                 round(list_dot_product(a.av, e.v)
                   / (sqrt(list_dot_product(a.av, a.av))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_sim
                 FROM a CROSS JOIN e WHERE e.vec_id <> a.anchor_id),
              p AS (SELECT anchor_id, cand_id AS pos_id,
                 cos_sim AS pos_sim FROM (
                 SELECT anchor_id, cand_id, cos_sim,
                   row_number() OVER (PARTITION BY anchor_id
                     ORDER BY cos_sim ASC, cand_id) AS rn
                 FROM j WHERE c_label = a_label) t WHERE rn = 1),
              n AS (SELECT anchor_id, cand_id AS neg_id,
                 cos_sim AS neg_sim FROM (
                 SELECT anchor_id, cand_id, cos_sim,
                   row_number() OVER (PARTITION BY anchor_id
                     ORDER BY cos_sim DESC, cand_id) AS rn
                 FROM j WHERE c_label <> a_label) t WHERE rn = 1)
              SELECT p.anchor_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim,
                round(p.pos_sim - n.neg_sim, 6) AS margin,
                CAST(CASE WHEN p.pos_sim > n.neg_sim THEN 1 ELSE 0 END
                  AS INTEGER) AS satisfied
              FROM p JOIN n USING (anchor_id)
              ORDER BY p.anchor_id""")),
    QueryDef("sim_ann_recall", simAnnRecall,
      Some(s"""WITH e AS (SELECT vec_id, label,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              p AS (SELECT vec_id AS probe_id, v AS pv FROM e
                 WHERE vec_id % 100 = 0),
              pair AS (SELECT p.probe_id, e.vec_id AS cand_id,
                 round(list_dot_product(p.pv, e.v)
                   / (sqrt(list_dot_product(p.pv, p.pv))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_sim
                 FROM p CROSS JOIN e WHERE e.vec_id <> p.probe_id),
              exact AS (SELECT probe_id, cand_id FROM (
                 SELECT probe_id, cand_id,
                   row_number() OVER (PARTITION BY probe_id
                     ORDER BY cos_sim DESC, cand_id) AS rnk
                 FROM pair) t WHERE rnk <= 10),
              ex AS (SELECT label, unnest(v) AS x,
                 generate_subscripts(v, 1) AS pos FROM e),
              cm AS (SELECT label, pos, ${Det.oAvg("x")} AS m
                 FROM ex GROUP BY label, pos),
              c AS (SELECT label, list(m ORDER BY pos) AS cv
                 FROM cm GROUP BY label),
              pc AS (SELECT probe_id, pv, label,
                 round(list_dot_product(pv, cv)
                   / (sqrt(list_dot_product(pv, pv))
                      * sqrt(list_dot_product(cv, cv))), 6) AS csim
                 FROM p CROSS JOIN c),
              sel AS (SELECT probe_id, pv, label FROM (
                 SELECT probe_id, pv, label,
                   row_number() OVER (PARTITION BY probe_id
                     ORDER BY csim DESC, label) AS rn
                 FROM pc) t WHERE rn <= 2),
              routed AS (SELECT sel.probe_id, e.vec_id AS cand_id,
                 round(list_dot_product(sel.pv, e.v)
                   / (sqrt(list_dot_product(sel.pv, sel.pv))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_sim
                 FROM sel JOIN e USING (label)
                 WHERE e.vec_id <> sel.probe_id),
              approx AS (SELECT probe_id, cand_id FROM (
                 SELECT probe_id, cand_id,
                   row_number() OVER (PARTITION BY probe_id
                     ORDER BY cos_sim DESC, cand_id) AS rnk
                 FROM routed) t WHERE rnk <= 10),
              h AS (SELECT exact.probe_id, COUNT(*) AS h
                 FROM exact JOIN approx USING (probe_id, cand_id)
                 GROUP BY exact.probe_id),
              ne AS (SELECT probe_id, COUNT(*) AS n_exact FROM exact
                 GROUP BY probe_id),
              na AS (SELECT probe_id, COUNT(*) AS n_approx FROM approx
                 GROUP BY probe_id)
              SELECT ne.probe_id, ne.n_exact, na.n_approx,
                COALESCE(h.h, 0) AS hits,
                round(COALESCE(h.h, 0) / 10.0, 6) AS recall_at_10
              FROM ne JOIN na USING (probe_id)
              LEFT JOIN h USING (probe_id)
              ORDER BY ne.probe_id""")),
    QueryDef("vec_binary_quantize", vecBinaryQuantize,
      Some("""WITH ex AS (SELECT vec_id, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) - 1 AS i
                 FROM embeddings),
               sig AS (SELECT vec_id,
                 CAST(SUM(CASE WHEN x > 0 AND i < 32 THEN 1::BIGINT << i
                   ELSE 0 END) AS BIGINT) AS lo,
                 CAST(SUM(CASE WHEN x > 0 AND i >= 32
                   THEN 1::BIGINT << (i - 32) ELSE 0 END) AS BIGINT) AS hi
                 FROM ex GROUP BY vec_id),
               pr AS (SELECT vec_id AS probe_id, lo AS plo, hi AS phi
                 FROM sig WHERE vec_id % 100 = 0),
               h AS (SELECT probe_id, s.vec_id AS cand_id,
                 CAST(bit_count(xor(plo, s.lo))
                   + bit_count(xor(phi, s.hi)) AS BIGINT) AS hamming,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY bit_count(xor(plo, s.lo))
                     + bit_count(xor(phi, s.hi)), s.vec_id) AS rnk
                 FROM pr, sig s WHERE s.vec_id <> probe_id)
              SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, cand_id, hamming
              FROM h WHERE rnk <= 5 ORDER BY probe_id, rnk""")),
    QueryDef("vec_outlier", vecOutlier,
      Some(s"""WITH ex AS (SELECT vec_id, label,
                 unnest(CAST(embedding AS DOUBLE[])) AS x,
                 generate_subscripts(embedding, 1) AS pos FROM embeddings),
               st AS (SELECT pos, ${Det.oAvg("x")} AS mu,
                 ${Det.oAvg("x * x")} AS m2 FROM ex GROUP BY pos),
               t AS (SELECT vec_id, label,
                 CASE WHEN m2 - mu * mu = 0 THEN 0.0
                   ELSE (x - mu) * (x - mu) / (m2 - mu * mu) END AS term
                 FROM ex JOIN st USING (pos)),
               z AS (SELECT vec_id, label,
                 round(${Det.oSum("term")}, 6) AS z2
                 FROM t GROUP BY vec_id, label)
              SELECT vec_id, label, z2 FROM z
              ORDER BY z2 DESC, vec_id LIMIT 20""")),
    QueryDef("dedup_threshold_sweep", dedupThresholdSweep,
      Some(s"""WITH p AS (SELECT b.vec_id AS id_b,
                 round(${oDot.format("a.embedding", "b.embedding")}
                   / (${oNorm("a.embedding")} * ${oNorm("b.embedding")}), 6)
                   AS cos_sim
                 FROM embeddings a JOIN embeddings b
                   ON a.label = b.label AND a.vec_id < b.vec_id),
               t AS (SELECT unnest(CAST([0.2, 0.25, 0.3, 0.35, 0.4]
                 AS DOUBLE[])) AS thr)
              SELECT thr, COUNT(*) AS n_pairs,
                COUNT(DISTINCT id_b) AS n_dropped
              FROM p, t WHERE cos_sim >= thr
              GROUP BY thr ORDER BY thr""")),
    QueryDef("vec_pca_power_iter", vecPcaPowerIter,
      Some(s"""WITH e AS (SELECT vec_id,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
               sc AS (SELECT vec_id, v,
                 list_reduce(v, (a, x) -> a + x) * 0.125 AS s FROM e),
               ex AS (SELECT s, unnest(v) AS x,
                 generate_subscripts(v, 1) - 1 AS pos FROM sc),
               w AS (SELECT pos, ${Det.oSum("s * x")} AS w
                 FROM ex GROUP BY pos),
               n AS (SELECT sqrt(${Det.oSum("w * w")}) AS nrm FROM w)
              SELECT pos, round(w, 6) AS w_j,
                round(CASE WHEN nrm = 0 THEN 0.0 ELSE w / nrm END, 6)
                  AS v1_j
              FROM w, n ORDER BY pos""")),
    QueryDef("vec_norm", vecNorm,
      Some(s"""SELECT vec_id,
               round(${oNorm("embedding")}, 6) AS l2_norm,
               round(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                 x -> abs(x))), 6) AS max_abs,
               round(CASE WHEN ${oNorm("embedding")} = 0 THEN 0.0
                 ELSE CAST(embedding[1] AS DOUBLE) / ${oNorm("embedding")}
                 END, 6) AS first_unit
              FROM embeddings ORDER BY vec_id""")),
    QueryDef("sim_cosine_pair", simCosinePair,
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               -- zero-norm guard: Spark's Divide on a zero divisor is
               -- NULL, DuckDB's 0/0 is NaN (class 6)
               CASE WHEN ${oNorm("a.embedding")} * ${oNorm("b.embedding")} = 0
                 THEN NULL
                 ELSE ${oDot.format("a.embedding", "b.embedding")}
                   / (${oNorm("a.embedding")} * ${oNorm("b.embedding")})
                 END AS cos_sim
              FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
              ORDER BY id_a""")),
    QueryDef("sim_maxsim", simMaxsim,
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
              p AS (SELECT vec_id AS probe_id, v AS pv FROM e
                WHERE vec_id % 100 = 0),
              c AS (SELECT vec_id AS cand_id, v AS cv FROM e
                WHERE vec_id % 100 <> 0),
              s AS (SELECT probe_id, cand_id,
                round(list_aggregate(list_transform(range(0, 8), t ->
                  list_aggregate(list_transform(range(0, 8), u ->
                    list_dot_product(
                      list_slice(pv, CAST(8 * t + 1 AS INT),
                        CAST(8 * t + 8 AS INT)),
                      list_slice(cv, CAST(8 * u + 1 AS INT),
                        CAST(8 * u + 8 AS INT)))), 'max')), 'sum'), 6)
                  AS score
                FROM p, c),
              r AS (SELECT probe_id, cand_id, score,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY score DESC, cand_id) AS rnk FROM s)
              SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, cand_id, score
              FROM r WHERE rnk <= 3 ORDER BY probe_id, rnk""")),
    QueryDef("sim_topk", simTopk,
      Some(s"""WITH pairs AS (
                SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                  round(${oDot.format("p.embedding", "c.embedding")}
                    / (${oNorm("p.embedding")} * ${oNorm("c.embedding")}), 6)
                    AS cos_sim
                FROM embeddings p JOIN embeddings c
                  ON p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id),
              ranked AS (SELECT probe_id, cand_id, cos_sim,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY cos_sim DESC, cand_id) AS rnk
                FROM pairs)
              SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, cand_id, cos_sim
              FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""")),
    QueryDef("sim_mmr", simMmr, Some(mmrOracle)),
    QueryDef("sim_knn_graph", simKnnGraph,
      Some(s"""WITH p AS (
                SELECT a.vec_id AS src, b.vec_id AS nbr,
                  round(${oDot.format("a.embedding", "b.embedding")}
                    / (${oNorm("a.embedding")} * ${oNorm("b.embedding")}), 6)
                    AS cos_sim
                FROM embeddings a JOIN embeddings b
                  ON a.label = b.label AND a.vec_id <> b.vec_id),
              r AS (SELECT src, nbr, cos_sim,
                row_number() OVER (PARTITION BY src
                  ORDER BY cos_sim DESC, nbr) AS rnk
                FROM p),
              ed AS (SELECT src, CAST(rnk AS INTEGER) AS rnk, nbr, cos_sim
                FROM r WHERE rnk <= 3)
              SELECT ed.src, ed.rnk, ed.nbr, ed.cos_sim,
                (rev.src IS NOT NULL) AS mutual
              FROM ed LEFT JOIN ed rev
                ON rev.src = ed.nbr AND rev.nbr = ed.src
              ORDER BY ed.src, ed.rnk""")),
    QueryDef("decontam_embed", decontamEmbed,
      Some(s"""WITH ev AS (SELECT vec_id AS eval_id, embedding AS e
                FROM embeddings WHERE vec_id % 97 = 0),
              h AS (SELECT eval_id, COUNT(*) AS n,
                MAX(round(${oDot.format("t.embedding", "ev.e")}
                  / (${oNorm("t.embedding")} * ${oNorm("ev.e")}), 6))
                  AS max_sim
                FROM embeddings t JOIN ev
                  ON t.vec_id % 97 <> 0
                 AND round(${oDot.format("t.embedding", "ev.e")}
                   / (${oNorm("t.embedding")} * ${oNorm("ev.e")}), 6) >= 0.35
                GROUP BY eval_id)
              SELECT ev.eval_id, COALESCE(h.n, 0) AS n_contaminated,
                COALESCE(h.max_sim, 0.0) AS max_sim
              FROM ev LEFT JOIN h ON ev.eval_id = h.eval_id
              ORDER BY ev.eval_id""")),
    QueryDef("sim_mips", simMips,
      Some(s"""WITH pairs AS (
                SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                  round(${oDot.format("p.embedding", "c.embedding")}, 6)
                    AS dot
                FROM embeddings p JOIN embeddings c
                  ON p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id),
              ranked AS (SELECT probe_id, cand_id, dot,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY dot DESC, cand_id) AS rnk
                FROM pairs)
              SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, cand_id, dot
              FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""")),
    QueryDef("sim_range_search", simRangeSearch,
      Some(s"""SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                round(${oDot.format("p.embedding", "c.embedding")}
                  / (${oNorm("p.embedding")} * ${oNorm("c.embedding")}), 6)
                  AS cos_sim
              FROM embeddings p JOIN embeddings c
                ON p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id
              WHERE round(${oDot.format("p.embedding", "c.embedding")}
                / (${oNorm("p.embedding")} * ${oNorm("c.embedding")}), 6)
                >= 0.30
              ORDER BY probe_id, cand_id""")),
    QueryDef("dedup_embed", dedupEmbed,
      Some(s"""SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
               round(${oDot.format("a.embedding", "b.embedding")}
                 / (${oNorm("a.embedding")} * ${oNorm("b.embedding")}), 6)
                 AS cos_sim
              FROM embeddings a JOIN embeddings b
                ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE round(${oDot.format("a.embedding", "b.embedding")}
                / (${oNorm("a.embedding")} * ${oNorm("b.embedding")}), 6) >= 0.35
              ORDER BY a.label, id_a, id_b""")),
    QueryDef("label_centroid", labelCentroid,
      Some(s"""WITH e AS (SELECT label,
                 unnest(CAST(embedding AS DOUBLE[])) AS x,
                 generate_subscripts(embedding, 1) AS pos
                FROM embeddings),
              a AS (SELECT label, pos, ${Det.oAvg("x")} AS m
                FROM e GROUP BY label, pos)
              SELECT label,
                array_to_string(list(CAST(round(m, 6) AS DECIMAL(20,6))
                  ORDER BY pos), ',') AS centroid
              FROM a GROUP BY label ORDER BY label""")),
    QueryDef("label_centroid_sim", labelCentroidSim,
      Some(s"""WITH e AS (SELECT label,
                 unnest(CAST(embedding AS DOUBLE[])) AS x,
                 generate_subscripts(embedding, 1) AS pos
                FROM embeddings),
              a AS (SELECT label, pos, ${Det.oAvg("x")} AS m
                FROM e GROUP BY label, pos),
              v AS (SELECT label, list(m ORDER BY pos) AS c
                FROM a GROUP BY label)
              SELECT x.label AS la, y.label AS lb,
                round(CASE WHEN sqrt(list_dot_product(x.c, x.c))
                             * sqrt(list_dot_product(y.c, y.c)) = 0
                      THEN NULL
                      ELSE list_dot_product(x.c, y.c)
                        / (sqrt(list_dot_product(x.c, x.c))
                           * sqrt(list_dot_product(y.c, y.c))) END, 6)
                  AS cos_sim
              FROM v x JOIN v y ON x.label < y.label
              ORDER BY la, lb""")),
    QueryDef("sim_ivf_knn", simIvfKnn,
      Some(s"""WITH e AS (SELECT vec_id, label,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              ex AS (SELECT label, unnest(v) AS x,
                 generate_subscripts(v, 1) AS pos FROM e),
              cm AS (SELECT label, pos, ${Det.oAvg("x")} AS m
                 FROM ex GROUP BY label, pos),
              c AS (SELECT label, list(m ORDER BY pos) AS cv
                 FROM cm GROUP BY label),
              p AS (SELECT vec_id AS probe_id, v AS pv FROM e
                 WHERE vec_id % 100 = 0),
              pc AS (SELECT probe_id, pv, label,
                 round(list_dot_product(pv, cv)
                   / (sqrt(list_dot_product(pv, pv))
                      * sqrt(list_dot_product(cv, cv))), 6) AS csim
                 FROM p CROSS JOIN c),
              sel AS (SELECT probe_id, pv, label FROM (
                 SELECT probe_id, pv, label,
                   row_number() OVER (PARTITION BY probe_id
                     ORDER BY csim DESC, label) AS rn
                 FROM pc) t WHERE rn <= 2),
              knn AS (SELECT sel.probe_id, e.vec_id AS cand_id, e.label,
                 round(list_dot_product(sel.pv, e.v)
                   / (sqrt(list_dot_product(sel.pv, sel.pv))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_sim
                 FROM sel JOIN e USING (label)
                 WHERE e.vec_id <> sel.probe_id),
              ranked AS (SELECT probe_id, cand_id, label, cos_sim,
                 row_number() OVER (PARTITION BY probe_id
                   ORDER BY cos_sim DESC, cand_id) AS rnk
                 FROM knn)
              SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, cand_id, label,
                     cos_sim
              FROM ranked WHERE rnk <= 3 ORDER BY probe_id, rnk""")),
    QueryDef("vec_quantize", vecQuantize,
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
              s0 AS (SELECT vec_id, v,
                list_max(list_transform(v, x -> abs(x))) / 127.0 AS raw
                FROM e),
              s AS (SELECT vec_id, v, raw,
                CASE WHEN raw = 0 THEN 1.0 ELSE raw END AS scale FROM s0)
              SELECT vec_id, round(raw, 6) AS q_scale,
                CAST(list_max(list_transform(v,
                  x -> abs(floor(x/scale + 0.5)))) AS INTEGER) AS max_code,
                round(list_reduce(list_prepend(0.0, list_transform(v,
                    x -> abs(x - floor(x/scale + 0.5)*scale))),
                    (a,b) -> a+b) / len(v), 6) AS mean_abs_err
              FROM s ORDER BY vec_id""")),
    QueryDef("vec_kmeans_assign", vecKmeansAssign,
      Some(s"""WITH e AS (SELECT vec_id, label,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              ex AS (SELECT label, unnest(v) AS x,
                 generate_subscripts(v, 1) AS pos FROM e),
              cm AS (SELECT label AS clabel, pos, ${graft.Det.oAvg("x")} AS m
                 FROM ex GROUP BY label, pos),
              c AS (SELECT clabel, list(m ORDER BY pos) AS cv
                 FROM cm GROUP BY clabel),
              sc AS (SELECT e.vec_id, e.label, c.clabel,
                 round(list_dot_product(e.v, c.cv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS csim
                 FROM e CROSS JOIN c),
              a AS (SELECT vec_id, label, clabel,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, clabel) AS rn
                 FROM sc)
              SELECT label, clabel AS assigned_label, COUNT(*) AS n
              FROM a WHERE rn = 1
              GROUP BY label, clabel ORDER BY label, assigned_label""")),
    QueryDef("sim_hard_negative", simHardNegative,
      Some(s"""WITH pairs AS (
                SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                  c.label AS cand_label,
                  round(${oDot.format("p.embedding", "c.embedding")}
                    / (${oNorm("p.embedding")} * ${oNorm("c.embedding")}), 6)
                    AS cos_sim
                FROM embeddings p JOIN embeddings c
                  ON p.vec_id % 50 = 0 AND c.label <> p.label),
              ranked AS (SELECT probe_id, cand_id, cand_label, cos_sim,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY cos_sim DESC, cand_id) AS rnk
                FROM pairs)
              SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, cand_id,
                cand_label, cos_sim
              FROM ranked WHERE rnk <= 3 ORDER BY probe_id, rnk""")),
    QueryDef("dedup_semantic", dedupSemantic,
      Some(s"""WITH e AS (SELECT vec_id, label,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              ex AS (SELECT label, unnest(v) AS x,
                 generate_subscripts(v, 1) AS pos FROM e),
              cm AS (SELECT label AS clabel, pos, ${graft.Det.oAvg("x")} AS m
                 FROM ex GROUP BY label, pos),
              c AS (SELECT clabel, list(m ORDER BY pos) AS cv
                 FROM cm GROUP BY clabel),
              sc AS (SELECT e.vec_id, c.clabel,
                 round(list_dot_product(e.v, c.cv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS csim
                 FROM e CROSS JOIN c),
              a AS (SELECT vec_id, clabel,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, clabel) AS rn
                 FROM sc),
              asg AS (SELECT a.vec_id, a.clabel AS cluster, e.v
                 FROM a JOIN e USING (vec_id) WHERE rn = 1),
              drp AS (SELECT DISTINCT y.vec_id FROM asg x JOIN asg y
                 ON x.cluster = y.cluster AND x.vec_id < y.vec_id
                 WHERE round(list_dot_product(x.v, y.v)
                   / (sqrt(list_dot_product(x.v, x.v))
                      * sqrt(list_dot_product(y.v, y.v))), 6) >= 0.35)
              SELECT asg.vec_id, asg.cluster,
                (drp.vec_id IS NULL) AS keep
              FROM asg LEFT JOIN drp ON asg.vec_id = drp.vec_id
              ORDER BY asg.vec_id""")),
    QueryDef("vec_rp_project", vecRpProject,
      Some("""WITH e AS (SELECT vec_id,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              ex AS (SELECT vec_id, unnest(v) AS x,
                 generate_subscripts(v, 1) AS i FROM e),
              t AS (SELECT vec_id, j,
                 SUM(CAST(x * (CASE WHEN (i * 73856093
                        + j * 19349663) % 104729 % 2 = 0
                      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
                     AS DECIMAL(30,6))) AS p
                 FROM ex CROSS JOIN range(0, 8) r(j)
                 GROUP BY vec_id, j)
              SELECT vec_id, j AS dim, CAST(p AS DOUBLE) AS proj,
                p > 0 AS srp_bit
              FROM t ORDER BY vec_id, dim""")),
    QueryDef("vec_matryoshka", vecMatryoshka,
      Some(s"""WITH e AS (SELECT vec_id, label,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              et AS (SELECT label, v,
                 list_reduce(list_transform(v, x -> x * x),
                   (a, b) -> a + b) AS tot FROM e),
              f AS (SELECT label,
                 CASE WHEN tot = 0 THEN 0.0
                   ELSE list_reduce(list_transform(v[1:8], x -> x * x),
                     (a, b) -> a + b) / tot END AS f8,
                 CASE WHEN tot = 0 THEN 0.0
                   ELSE list_reduce(list_transform(v[1:16], x -> x * x),
                     (a, b) -> a + b) / tot END AS f16,
                 CASE WHEN tot = 0 THEN 0.0
                   ELSE list_reduce(list_transform(v[1:32], x -> x * x),
                     (a, b) -> a + b) / tot END AS f32
                 FROM et)
              SELECT label, COUNT(*) AS n,
                ${graft.Det.oAvg("f8")} AS avg_frac_8,
                ${graft.Det.oAvg("f16")} AS avg_frac_16,
                ${graft.Det.oAvg("f32")} AS avg_frac_32
              FROM f GROUP BY label ORDER BY label""")),
    QueryDef("vec_pq", vecPq,
      Some(s"""WITH e AS (SELECT vec_id, label,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              ex AS (SELECT label, unnest(v) AS x,
                 generate_subscripts(v, 1) AS pos FROM e),
              cm AS (SELECT label AS clabel, pos, ${graft.Det.oAvg("x")} AS m
                 FROM ex GROUP BY label, pos),
              c AS (SELECT clabel, list(m ORDER BY pos) AS cv
                 FROM cm GROUP BY clabel),
              d AS (SELECT e.vec_id, c.clabel, r.m,
                 $oSubDist AS d
                 FROM e CROSS JOIN c CROSS JOIN range(0, 8) r(m)),
              a AS (SELECT vec_id, m, clabel, d,
                 row_number() OVER (PARTITION BY vec_id, m
                   ORDER BY d, clabel) AS rn
                 FROM d)
              SELECT vec_id,
                string_agg(clabel, ',' ORDER BY m) AS codes,
                CAST(floor(list_reduce(list(d ORDER BY m), (a, b) -> a + b)
                  * 1e6 + 0.5) AS BIGINT) AS recon_q
              FROM a WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""")),
    QueryDef("sim_ivfpq_knn", simIvfPqKnn,
      Some(s"""WITH e AS (SELECT vec_id, label,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              ex AS (SELECT label, unnest(v) AS x,
                 generate_subscripts(v, 1) AS pos FROM e),
              cm AS (SELECT label AS clabel, pos, ${graft.Det.oAvg("x")} AS m
                 FROM ex GROUP BY label, pos),
              c AS (SELECT clabel, list(m ORDER BY pos) AS cv
                 FROM cm GROUP BY clabel),
              sub AS (SELECT e.vec_id, e.label, c.clabel, r.m,
                 $oSubDist AS d
                 FROM e CROSS JOIN c CROSS JOIN range(0, 8) r(m)),
              codes AS (SELECT vec_id AS cand_id, label AS cand_label,
                 m AS cm, clabel AS code FROM (
                 SELECT vec_id, label, m, clabel,
                   row_number() OVER (PARTITION BY vec_id, m
                     ORDER BY d, clabel) AS rn
                 FROM sub) t WHERE rn = 1),
              route AS (SELECT probe_id, clabel AS list_label FROM (
                 SELECT vec_id AS probe_id, clabel,
                   row_number() OVER (PARTITION BY vec_id ORDER BY
                     CAST(SUM(CAST(d AS DECIMAL(30,6))) AS DOUBLE), clabel)
                     AS rn
                 FROM sub WHERE vec_id % 100 = 0
                 GROUP BY vec_id, clabel) t WHERE rn <= 2),
              lut AS (SELECT vec_id AS lprobe, m AS lm, clabel AS lcode, d
                 FROM sub WHERE vec_id % 100 = 0),
              adc AS (SELECT probe_id, cand_id, cand_label,
                 round(CAST(SUM(CAST(lut.d AS DECIMAL(30,6))) AS DOUBLE), 6)
                   AS adc_dist
                 FROM route JOIN codes ON cand_label = list_label
                   AND cand_id <> probe_id
                 JOIN lut ON lprobe = probe_id AND lm = cm AND lcode = code
                 GROUP BY probe_id, cand_id, cand_label),
              ranked AS (SELECT probe_id, cand_id, cand_label, adc_dist,
                 row_number() OVER (PARTITION BY probe_id
                   ORDER BY adc_dist, cand_id) AS rnk
                 FROM adc)
              SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, cand_id,
                cand_label, adc_dist
              FROM ranked WHERE rnk <= 3 ORDER BY probe_id, rnk""")),
    QueryDef("dedup_minhash", dedupMinhash, None),
    QueryDef("dedup_minhash_native", dedupMinhashNative, None),
    QueryDef("sim_lsh_knn", simLshKnn, None),
    QueryDef("vec_kmeans_train", vecKmeansTrain, None),
    QueryDef("sample_kcenter", sampleKcenter, Some(kcenterOracle)),
    QueryDef("sim_ivf_trained_knn", simIvfTrainedKnn, None),
  )
}
