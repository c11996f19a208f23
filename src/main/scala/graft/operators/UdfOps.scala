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
      .withColumn("cos_sim", round(expr("cosine_sim_native(va, vb)"), 6))
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
    val stateAgg = udaf(new graft.functions.SpaceSavingTopK(16, 16))
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
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    val sketch = toks.agg(cm(col("token")).as("sk"))
      .head.getSeq[Long](0)
    val top = toks.groupBy("token").count()
      .orderBy(col("count").desc, col("token")).limit(10)
      .as[(String, Long)].collect()
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
               round(${oDot.format("a.embedding", "b.embedding")}
                 / (${oNorm("a.embedding")} * ${oNorm("b.embedding")}), 6)
                 AS cos_sim
              FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
              ORDER BY id_a""")),
  )
}
