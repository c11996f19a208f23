package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** §2.12 UDF / UDAF / UDTF surface + the native-expression stretch.
  *
  * Order of preference (SURVEY.md §4): built-ins (codegen'd) > native
  * Catalyst Expression > typed Aggregator > scalar UDF. The scalar UDF
  * here exists to cover the surface; real hot paths in this engine use
  * built-ins everywhere else.
  */
object UdfOps {

  /** Scalar Scala UDF: parse the numeric rank out of an order priority
    * ('2-HIGH' → 2) — codegen-opaque, hence only a demonstration.
    */
  private def udfScalar(s: SparkSession, dir: String): DataFrame = {
    val rank = udf((p: String) => p.split("-")(0).toInt)
    Tables.orders(s, dir)
      .withColumn("prio_rank", rank(col("o_orderpriority")))
      .groupBy(col("prio_rank"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prio_rank"))
  }

  /** Typed Aggregator: exact decimal mean (order-independent fold that
    * matches the oracle's DECIMAL(30,6) sum bit-for-bit).
    */
  object ExactMean
      extends Aggregator[Double, (Long, java.math.BigDecimal), Double] {
    def zero: (Long, java.math.BigDecimal) = (0L, java.math.BigDecimal.ZERO)
    def reduce(b: (Long, java.math.BigDecimal), v: Double): (Long, java.math.BigDecimal) =
      (b._1 + 1, b._2.add(new java.math.BigDecimal(v)
        .setScale(6, java.math.RoundingMode.HALF_UP)))
    def merge(a: (Long, java.math.BigDecimal),
        b: (Long, java.math.BigDecimal)): (Long, java.math.BigDecimal) =
      (a._1 + b._1, a._2.add(b._2))
    def finish(b: (Long, java.math.BigDecimal)): Double =
      b._2.doubleValue / b._1
    def bufferEncoder: Encoder[(Long, java.math.BigDecimal)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.DECIMAL)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private def udafTyped(s: SparkSession, dir: String): DataFrame = {
    val exactMean = udaf(ExactMean)
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(exactMean(col("o_totalprice")).as("mean_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** ClickHouse `sumKahan`: compensated (Kahan–Babuška–Neumaier) double
    * summation as a typed Aggregator — state (sum, err) with the true
    * total = sum + err; the compensation term survives partial/final
    * MERGE, so the parallel shuffle-merged result carries the same few-
    * ulp bound as a sequential fold. The float-native alternative to the
    * Det.dsum decimal detour when the measure overflows DECIMAL(30,6)
    * or the consumer wants pure-double state (constant 16 bytes/group).
    */
  object KahanSum extends Aggregator[Double, (Double, Double), Double] {
    private def add(s: Double, c: Double, x: Double): (Double, Double) = {
      val t = s + x
      val comp =
        if (math.abs(s) >= math.abs(x)) (s - t) + x
        else (x - t) + s
      (t, c + comp)
    }
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), v: Double): (Double, Double) =
      add(b._1, b._2, v)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
      val (s, comp) = add(a._1, a._2 + b._2, b._1)
      (s, comp)
    }
    def finish(b: (Double, Double)): Double = b._1 + b._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** agg_sum_kahan: per return flag, the compensated double sum of
    * l_extendedprice rounded to cents. The 2dp-decimal-valued doubles
    * sit within 1e-13 of the exact cent grid and Kahan keeps the total
    * within a few ulps, so the rounded total equals the oracle's exact
    * DECIMAL sum — the property a naive parallel double sum does NOT
    * guarantee at 100 TB row counts (error grows with the reduction
    * tree), which is the whole point of sumKahan.
    */
  private def aggSumKahan(s: SparkSession, dir: String): DataFrame = {
    val kahan = udaf(KahanSum)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(kahan(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Generator (UDTF shape): 1 row → N rows via explode(sequence(...)) —
    * three monthly billing periods per order.
    */
  private def udtfGenerate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(expr(
        """explode(sequence(date_trunc('month', o_orderdate),
                            date_trunc('month', o_orderdate) + interval 2 month,
                            interval 1 month))""").as("bill_month"))
      .groupBy(col("bill_month")).agg(count(lit(1)).as("n"))
      .orderBy(col("bill_month"))

  /** Native Catalyst expression with codegen (see CosineSim): same result
    * as the HOF-based sim_cosine_pair, computed by the fused kernel.
    */
  private def exprCustom(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"),
      col("embedding").as("vb"))
    a.join(b, "id_a")
      // UNROUNDED: both engines compute the identical IEEE chain
      // (left-to-right sums, correctly-rounded sqrt, one divide); a 6dp
      // edge round is the confirmed midpoint-split hazard (class 3)
      .withColumn("cos_sim", expr("cosine_sim_native(va, vb)"))
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .orderBy(col("id_a"))
  }

  /** ClickHouse `topK`: SpaceSaving heavy-hitters sketch as a typed
    * Aggregator over document tokens (bounded state vs unbounded vocab —
    * the scale path where exact top-k would shuffle every distinct term).
    * Sketch results near the eviction boundary are merge-order-dependent,
    * so this key is ScalaTest-verified (guarantees, not hash equality).
    */
  private def udafSketchTopk(s: SparkSession, dir: String): DataFrame = {
    // capacity < vocabulary so eviction + merge truncation really happen
    val topk = udaf(new graft.functions.SpaceSavingTopK(16, 10))
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(topk(col("token")).as("top_tokens"))
      .select(posexplode(col("top_tokens")).as(Seq("rank", "entry")))
      .select(col("rank"), col("entry.item").as("token"),
        col("entry.count").as("est_count"), col("entry.error").as("max_error"))
  }

  /** topKState/-Merge two-phase (the heavy-hitter member of the
    * mergeable -State family, with agg_state_merge for sum/count/min/max
    * and agg_quantile_state for percentiles): phase 1 persists one
    * COMPLETE SpaceSaving sketch per shard to parquet; phase 2 rebuilds
    * and folds them through the same mergeable-summaries combine. The
    * incremental heavy-hitters MV: each new partition appends one state
    * row per shard; history is never rescanned. Estimates depend on
    * eviction order near the boundary → rows-only; SketchSpec asserts
    * the guarantees survive the parquet roundtrip.
    */
  private def aggTopkState(s: SparkSession, dir: String): DataFrame = {
    val statePath = graft.Scratch.dir("topk_state") + "/token_topk"
    // the STATE builder (complete buffer + capacity sentinel) — the
    // merge side rejects states persisted any other way
    val stateAgg = udaf(new graft.functions.SpaceSavingState(16))
    Tables.documents(s, dir)
      .select((col("doc_id") % 8).as("shard"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy(col("shard"))
      .agg(stateAgg(col("token")).as("state"))
      .write.mode("overwrite").parquet(statePath)
    val mergeAgg = udaf(new graft.functions.SpaceSavingMergeState(16, 10))
    s.read.parquet(statePath)
      .agg(mergeAgg(col("state")).as("top_tokens"))
      .select(posexplode(col("top_tokens")).as(Seq("rank", "entry")))
      .select(col("rank"), col("entry.item").as("token"),
        col("entry.count").as("est_count"), col("entry.error").as("max_error"))
  }

  /** ClickHouse `groupBitmap` — exact distinct via bitmap partials (see
    * [[graft.functions.BitmapDistinct]]); exactness means it carries a
    * plain COUNT(DISTINCT) oracle.
    */
  private def udafBitmap(s: SparkSession, dir: String): DataFrame = {
    val bm = udaf(new graft.functions.BitmapDistinct)
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(bm(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** Count-Min frequency sketch over the token stream: the sketch is
    * built distributed (one partial-agg pass, d×w longs of state), then
    * the top-10 exact tokens are point-queried against it — estimates
    * must never undercount (one-sided CM guarantee, asserted per row
    * here and over the whole vocabulary in SketchSpec). The driver-side
    * step touches O(sketch + 10 probes), never the data.
    */
  private def udafCmSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.CountMin(4, 256)
    val cm = udaf(agg)
    // cached: the sketch aggregate and the exact top-10 are two separate
    // jobs — without the cache each re-reads and re-splits every doc
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .cache()
    // unpersist in finally: a failed action would otherwise pin the
    // fully exploded token stream in the CacheManager for the session's
    // lifetime, degrading every later key in the same run
    val (sketch, top) =
      try {
        val sk = toks.agg(cm(col("token")).as("sk"))
          .head().getSeq[Long](0)
        val tp = toks.groupBy("token").count()
          .orderBy(col("count").desc, col("token")).limit(10)
          .as[(String, Long)].collect()
        (sk, tp)
      } finally toks.unpersist()
    top.map { case (tok, exact) =>
      (tok, exact,
        graft.functions.CountMin.estimate(sketch, agg.depth, agg.width, tok))
    }.toSeq.toDF("token", "exact_n", "est_n")
      .withColumn("never_undercounts", col("est_n") >= col("exact_n"))
      .orderBy(col("exact_n").desc, col("token"))
  }

  /** ClickHouse `groupBitmapAnd`/`groupBitmapOr` — segment-audience set
    * algebra: level 1 builds one bitmap per event_type segment
    * (`groupBitmapState`), level 2 combines the SEGMENT BITMAPS (never
    * the fact rows again) into intersection/union cardinalities. At
    * 100 TB the second level moves |segments| compact binaries, which is
    * why ClickHouse ships -State columns rather than re-scanning.
    */
  private def udafBitmapAnd(s: SparkSession, dir: String): DataFrame = {
    val build = udaf(new graft.functions.BitmapBuild)
    val andC = udaf(new graft.functions.BitmapAndCard)
    val orC = udaf(new graft.functions.BitmapOrCard)
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(build(col("user_id")).as("bm"))
      .agg(count(lit(1)).as("n_segments"),
        andC(col("bm")).as("n_intersection"),
        orC(col("bm")).as("n_union"))
  }

  /** ClickHouse `uniqUpTo(N)`: EXACT distinct count while it is ≤ N,
    * the sentinel N+1 once it exceeds — the point is the STATE BOUND:
    * the buffer holds at most N+1 elements and stops growing the moment
    * the bound is proven, so a group with a billion distinct keys costs
    * the same 51 longs as one with 51. The honest contrast to
    * agg_distinct_exact (unbounded state) and agg_distinct_approx
    * (probabilistic): exact answers below the threshold, one bit of
    * information above it, hard memory cap always.
    */
  final class UniqUpTo(cap: Int)
      extends Aggregator[Long, Set[Long], Long] {
    def zero: Set[Long] = Set.empty
    def reduce(b: Set[Long], v: Long): Set[Long] =
      if (b.size > cap) b else b + v
    def merge(a: Set[Long], b: Set[Long]): Set[Long] = {
      // cap the merged set too — union only until the bound is proven
      if (a.size > cap) a
      else if (b.size > cap) b
      else {
        var m = a
        val it = b.iterator
        while (it.hasNext && m.size <= cap) m = m + it.next()
        m
      }
    }
    def finish(b: Set[Long]): Long =
      if (b.size > cap) cap + 1L else b.size.toLong
    def bufferEncoder: Encoder[Set[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** KMV (k-minimum-values) distinct sketch — the theta-sketch family
    * (Beyer et al., SIGMOD'07; Dasgupta et al.'s theta sketches): keep
    * the k smallest 64-bit hashes of the keys seen. Unlike HLL
    * (agg_distinct_approx), KMV states support SET ALGEBRA with error
    * bounds: two segments' sketches filtered to a common θ =
    * min(θ_a, θ_b) form uniform samples of each set, so
    * |A∩B| ≈ |S_a ∩ S_b < θ| / θ — the audience-overlap estimate a
    * bitmap can only answer exactly (at O(distinct) state) and HLL
    * cannot answer at all (inclusion-exclusion explodes the error).
    * State is a sorted ≤k array; merge keeps the k smallest of the
    * union — associative, commutative, bounded.
    */
  final class KmvSketch(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    // splitmix64 — the finalizer used by java.util.SplittableRandom;
    // maps keys to uniform 64-bit hashes (top bit masked → nonneg)
    private def h64(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      (x ^ (x >>> 31)) & Long.MaxValue
    }
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], v: Long): Seq[Long] = insert(b, h64(v))
    // binary-search insert into the already-sorted buffer: the search
    // also answers the duplicate check — O(log k) compares + one copy,
    // vs the previous full re-sort + O(k) contains scan on every
    // qualifying row of the reduce hot path
    private def insert(b: Seq[Long], h: Long): Seq[Long] = {
      if (b.length >= k && h >= b.last) return b
      val pos = {
        var lo = 0; var hi = b.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (b(mid) < h) lo = mid + 1 else hi = mid
        }
        lo
      }
      if (pos < b.length && b(pos) == h) b // duplicate
      else {
        val grown = (b.take(pos) :+ h) ++ b.drop(pos)
        if (grown.length > k) grown.init else grown
      }
    }
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    def finish(b: Seq[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  private[graft] object Kmv {
    val K = 256
    private val SPACE = Long.MaxValue.toDouble
    /** Fraction of the hash space below the sketch's θ (k-th min).
      * `k` is the BUILDER's capacity — every estimator below takes it
      * explicitly: a hardcoded 256 silently treated any sketch built
      * with a different k as "not yet full" (exact-count mode), an
      * estimate that can run orders of magnitude low.
      */
    def theta(s: Seq[Long], k: Int = K): Double =
      if (s.length < k) 1.0 else s.last / SPACE
    def estimate(s: Seq[Long], k: Int = K): Double =
      if (s.length < k) s.length.toDouble else (k - 1) / theta(s, k)
    /** (est_inter, est_union, jaccard) under the common θ. The common
      * threshold is taken directly as the Long min of the two k-th-min
      * hashes — never round-tripped through double, which could land a
      * few ulps below the true k-th min and drop/keep boundary values
      * inconsistently between the two sketches' filters. */
    def setOps(a: Seq[Long], b: Seq[Long], k: Int = K)
        : (Double, Double, Double) = {
      val bound = math.min(
        if (a.length < k) Long.MaxValue else a.last,
        if (b.length < k) Long.MaxValue else b.last)
      val th = bound / SPACE
      // STRICT below the bound — the standard KMV estimator (the k-th
      // min DEFINES θ and is excluded, matching estimate()'s (K-1)/θ):
      // an inclusive filter made est(A ∪ A) = K/θ exceed est(A) =
      // (K-1)/θ for the very same set and biased every intersection
      // high by ~1/θ
      val sa = a.filter(_ < bound).toSet
      val sb = b.filter(_ < bound).toSet
      val inter = sa.intersect(sb).size / th
      val union = sa.union(sb).size / th
      (inter, union, if (union == 0.0) 0.0 else inter / union)
    }
  }

  /** Audience overlap across event segments: one KMV sketch per
    * event_type (distributed, bounded state), then pairwise set algebra
    * on the O(segments·k) collected states — per pair the estimated
    * segment sizes, intersection, union, and Jaccard. SketchSpec pins
    * the error bounds vs exact; rows-only by design (seeded hash
    * estimates have no SQL oracle).
    *
    * Scale notes: the heavy pass is ONE shuffle of 256-long partials
    * per segment; set algebra happens on collected sketches —
    * control-plane sized however many billions of users flowed in.
    */
  private def udafKmvIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sk = udaf(new KmvSketch(Kmv.K))
    val sketches = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(sk(col("user_id")).as("sketch"))
      .as[(String, Seq[Long])].collect().sortBy(_._1)
    val pairs = for {
      i <- sketches.indices; j <- (i + 1) until sketches.length
    } yield {
      val (na, sa) = sketches(i); val (nb, sb) = sketches(j)
      val (inter, union, jac) = Kmv.setOps(sa, sb)
      (na, nb, math.round(Kmv.estimate(sa)), math.round(Kmv.estimate(sb)),
        math.round(inter), math.round(union),
        math.rint(jac * 1e6) / 1e6)
    }
    pairs.toSeq.toDF("seg_a", "seg_b", "est_a", "est_b",
      "est_inter", "est_union", "jaccard")
      .orderBy(col("seg_a"), col("seg_b"))
  }

  /** Per user: distinct active days, exactly up to 5, '6' beyond —
    * bounded at 6 longs of state per user regardless of history length.
    * The oracle restates the cap relationally (LEAST of the true
    * distinct count), which is exactly the operator's contract.
    */
  private def udafUniqUpto(s: SparkSession, dir: String): DataFrame = {
    val upTo = udaf(new UniqUpTo(5))
    Tables.events(s, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
          .as("day"))
      .groupBy(col("user_id"))
      .agg(upTo(col("day")).as("days_upto5"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  private val oDot =
    "list_dot_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))"
  private def oNorm(v: String): String =
    s"sqrt(list_dot_product(CAST($v AS DOUBLE[]), CAST($v AS DOUBLE[])))"

  def defs: Seq[QueryDef] = Seq(
    QueryDef("udf_scalar", udfScalar,
      Some("""SELECT CAST(string_split(o_orderpriority, '-')[1] AS INTEGER)
                 AS prio_rank,
               o_orderpriority, COUNT(*) AS n
              FROM orders GROUP BY prio_rank, o_orderpriority
              ORDER BY prio_rank""")),
    QueryDef("udaf_typed", udafTyped,
      Some("""SELECT o_orderstatus,
               (CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*)) AS mean_price,
               COUNT(*) AS n
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),
    QueryDef("agg_sum_kahan", aggSumKahan,
      Some("""SELECT l_returnflag, COUNT(*) AS n,
               round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
                 AS DOUBLE), 2) AS sum_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    QueryDef("udaf_sketch_topk", udafSketchTopk, None),
    QueryDef("agg_topk_state", aggTopkState, None),
    QueryDef("udaf_cm_sketch", udafCmSketch, None),
    QueryDef("udaf_bitmap", udafBitmap,
      Some("""SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
              FROM events GROUP BY event_type ORDER BY event_type""")),
    QueryDef("udaf_bitmap_and", udafBitmapAnd,
      Some("""SELECT (SELECT COUNT(DISTINCT event_type) FROM events)
                 AS n_segments,
               (SELECT COUNT(*) FROM (
                  SELECT user_id FROM events GROUP BY user_id
                  HAVING COUNT(DISTINCT event_type) =
                    (SELECT COUNT(DISTINCT event_type) FROM events)) t)
                 AS n_intersection,
               (SELECT COUNT(DISTINCT user_id) FROM events) AS n_union""")),
    QueryDef("udaf_kmv_intersect", udafKmvIntersect, None),
    QueryDef("udaf_uniq_upto", udafUniqUpto,
      Some("""SELECT user_id,
               LEAST(COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)), 6)
                 AS days_upto5,
               COUNT(*) AS n_events
              FROM events GROUP BY user_id ORDER BY user_id""")),
    QueryDef("udtf_generate", udtfGenerate,
      Some("""WITH m AS (SELECT unnest(generate_series(
                CAST(date_trunc('month', o_orderdate) AS TIMESTAMP),
                CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                  + INTERVAL 2 MONTH,
                INTERVAL 1 MONTH)) AS bill_month FROM orders)
              SELECT bill_month, COUNT(*) AS n FROM m
              GROUP BY bill_month ORDER BY bill_month""")),
    QueryDef("expr_custom", exprCustom,
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               -- zero-norm guard mirrors the kernel's NULL (class 6:
               -- DuckDB's 0/0 would be NaN)
               CASE WHEN ${oNorm("a.embedding")} * ${oNorm("b.embedding")} = 0
                 THEN NULL
                 ELSE ${oDot.format("a.embedding", "b.embedding")}
                   / (${oNorm("a.embedding")} * ${oNorm("b.embedding")})
                 END AS cos_sim
              FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
              ORDER BY id_a""")),
  )
}
