package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions installer: function injection and the
  * redundant-round optimizer rule. `spark.sql.extensions` is a STATIC
  * conf (bound at the first session created in the JVM), so the shared
  * GraftSpec session is built with the extensions installed and this
  * suite exercises them through it — exactly how a library user enables
  * the module.
  */
class ExtensionsSpec extends AnyFunSuite with GraftSpec {

  test("cosine_sim_native is available as a SQL function via extensions") {
    val r = spark.sql(
      """SELECT cosine_sim_native(
           CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
           CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS s""")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("l2_sq_native: bit-identical to the HOF fold, both element types") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    // real embedding column (float) against its double cast, compared
    // over the whole fixture — same left-to-right accumulation order,
    // so the difference must be exactly zero, not epsilon
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("shifted",
        expr("transform(v, x -> x + 0.25D)"))
    val rows = e.select(
      expr("l2_sq_native(v, shifted)").as("native_dd"),
      expr("l2_sq_native(embedding, shifted)").as("native_fd"),
      expr("""aggregate(zip_with(v, shifted, (x, y) -> (x - y) * (x - y)),
              cast(0.0 as double), (acc, x) -> acc + x)""").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2), "double/double drifted")
      assert(r.getDouble(1) == r.getDouble(2), "float side must cast per element")
    }
    // codegen path actually compiles (no interpreted fallback surprise).
    // The HOF transform() neighbors above are themselves non-codegen and
    // would break the stage, so materialize the inputs first and plan
    // the native expression over plain column references.
    val mat = e.select(col("v"), col("shifted")).localCheckpoint()
    val plan = mat.select(expr("l2_sq_native(v, shifted)"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks whole-stage-codegen'd operators
    assert(plan.contains("*(1) Project [euclidsq"), plan.take(300))
  }

  test("projection routing is gated per session: enable arms, disable disarms") {
    import org.apache.spark.sql.functions._
    // stage both layouts + register in the JVM-global registry, armed
    // on a CLONE only — the binding claim is that registration alone
    // must not route anyone
    val armed = spark.newSession()
    val basePath = graft.operators.MvOps.ensureProjection(armed, sf)
    try {
      def planOf(s: org.apache.spark.sql.SparkSession) =
        s.read.parquet(basePath).filter(col("user_id") === 7L)
          .queryExecution.executedPlan.toString
      assert(planOf(armed).contains("events_byuser"),
        "enabled session must route to the projection")
      // extensions inject the rule into EVERY session of this JVM, but
      // a session that never called enable() must stay inert even with
      // the registration present
      val cold = spark.newSession()
      assert(!planOf(cold).contains("events_byuser"),
        "un-enabled session must not route")
      graft.plans.ProjectionRouting.disable(armed)
      assert(!planOf(armed).contains("events_byuser"),
        "disable() must disarm the session again")
    } finally graft.plans.ProjectionRouting.disable(armed)
  }

  test("vector kernels: zero-norm NULL, null-element NULL, strict shape") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("""SELECT
        cosine_sim_native(array(0D, 0D), array(1D, 2D)) AS zero_norm,
        cosine_sim_native(array(1D, CAST(NULL AS DOUBLE)), array(1D, 1D))
          AS null_elem,
        coalesce(cosine_sim_native(array(0D, 0D), array(0D, 0D)), -1D)
          AS coalesce_fallback""").head()
    assert(r.isNullAt(0), "zero-norm must be NULL, not NaN")
    assert(r.isNullAt(1), "a null element must propagate to NULL")
    // nullable=true matters here: without it NullPropagation would
    // simplify the coalesce away and the fallback would never fire
    assert(r.getDouble(2) == -1.0, "coalesce fallback must survive")
    val ex = intercept[Exception] {
      spark.sql("SELECT dot_native(array(1D), array(1D, 2D))").collect()
    }
    assert(ex.getMessage != null &&
      (ex.getMessage.contains("lengths differ") ||
        String.valueOf(ex.getCause).contains("lengths differ")),
      s"mismatched lengths must throw a named error, got: ${ex.getMessage}")
  }

  test("dot_native: bit-identical to the HOF fold, both element types") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("shifted", expr("transform(v, x -> x + 0.25D)"))
    val rows = e.select(
      expr("dot_native(v, shifted)").as("native_dd"),
      expr("dot_native(embedding, shifted)").as("native_fd"),
      expr("""aggregate(zip_with(v, shifted, (a, b) -> a * b),
              cast(0.0 as double), (acc, x) -> acc + x)""").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2), "double/double drifted")
      assert(r.getDouble(1) == r.getDouble(2), "float side must cast per element")
    }
    val mat = e.select(col("v"), col("shifted")).localCheckpoint()
    val plan = mat.select(expr("dot_native(v, shifted)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dotproduct"), plan.take(300))
  }

  test("maxsim_native: bit-identical to the nested-HOF fold, codegen'd") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> cast(x as double))").as("pv"))
    // pair each vector with a rotated copy of itself so token maxima
    // land off the diagonal (a pure self-pair would always peak at u=t)
    val paired = e.withColumn("cv",
      expr("concat(slice(pv, 9, 56), slice(pv, 1, 8))"))
    val rows = paired.select(
      expr("maxsim_native(pv, cv)").as("native_dd"),
      expr("maxsim_native(embedding, cv)").as("native_fd"),
      expr("""aggregate(sequence(0, 7), cast(0.0 as double), (acc, t) ->
               acc + array_max(transform(sequence(0, 7), u ->
                 aggregate(zip_with(slice(pv, 8 * t + 1, 8),
                                    slice(cv, 8 * u + 1, 8),
                                    (a, b) -> a * b),
                   cast(0.0 as double), (s2, x) -> s2 + x))))""").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2), "double/double drifted")
      assert(r.getDouble(1) == r.getDouble(2), "float side must cast per element")
    }
    val mat = paired.select(col("pv"), col("cv")).localCheckpoint()
    val plan = mat.select(expr("maxsim_native(pv, cv)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [maxsim"), plan.take(300))
  }

  test("jaro_native / jaro_winkler_native: known vectors + codegen") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // (a, b, jaro, jaro_winkler) — the DuckDB-probed contract:
    // integer half-count transpositions, winkler boost only when
    // jaro > 0.7, either side empty → 0
    val cases = Seq(
      ("martha", "marhta", 0.9444444444444445, 0.9611111111111111),
      ("dwayne", "duane", 0.8222222222222223, 0.84),
      // 3 matched chars permute oddly (3 mismatches): t = 3/2 = 1 (int)
      ("abcxyz", "bcaxyz", 0.9444444444444445, 0.9444444444444445),
      // jaro exactly 0.5 ≤ 0.7: NO winkler boost despite 2-char prefix
      ("abcdefgh", "abzzzzzz", 0.5, 0.5),
      ("same", "same", 1.0, 1.0),
      ("", "x", 0.0, 0.0))
    val rows = cases.toDF("a", "b", "ej", "ejw")
      .select(expr("jaro_native(a, b)").as("j"),
        expr("jaro_winkler_native(a, b)").as("jw"),
        col("ej"), col("ejw"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-12,
        s"jaro: got ${r.getDouble(0)} want ${r.getDouble(2)}")
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-12,
        s"jw: got ${r.getDouble(1)} want ${r.getDouble(3)}")
    }
    // the expression plans inside whole-stage codegen over a real column
    val mat = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_name"), col("p_brand")).localCheckpoint()
    val plan = mat.select(expr("jaro_winkler_native(p_name, p_brand)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [jarosim"), plan.take(300))
  }

  test("damerau_native: unrestricted DL known vectors + codegen") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val cases = Seq(
      // the unrestricted-vs-OSA separator: edit inside a transposed block
      ("ca", "abc", 2),
      ("abcdef", "abcfad", 3),
      ("martha", "marhta", 1), // one adjacent transposition
      ("kitten", "sitting", 3), // pure Levenshtein case, no transposition
      ("same", "same", 0),
      ("", "abc", 3), ("abc", "", 3))
    val rows = cases.toDF("a", "b", "want")
      .select(expr("damerau_native(a, b)").as("got"), col("want"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"got ${r.getInt(0)} want ${r.getInt(1)}"))
    val mat = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_name"), col("p_brand")).localCheckpoint()
    val plan = mat.select(expr("damerau_native(p_name, p_brand)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dameraulev"), plan.take(300))
  }

  test("base58_encode/decode_native: published vectors + codegen") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // Bitcoin-alphabet vectors from the draft-msporny-base58 test suite
    val cases = Seq(
      ("Hello World!", "2NEpo7TZRRrLZSi2U"),
      ("The quick brown fox jumps over the lazy dog.",
        "USm3fpXnKG5EUBx2ndxBDMPVciP5hGey2Jh4NDv6gmeo1LkMeiKrLJUUBk6Z"),
      ("", ""))
    val rows = cases.toDF("raw", "want")
      .select(expr("base58_encode_native(cast(raw as binary))").as("got"),
        expr("cast(base58_decode_native(want) as string)").as("back"),
        col("raw"), col("want"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(3),
        s"encode: got ${r.getString(0)} want ${r.getString(3)}")
      assert(r.getString(1) == r.getString(2),
        s"decode: got ${r.getString(1)} want ${r.getString(2)}")
    }
    // leading zero bytes ↔ leading '1's (0x00 0x00 0x28 0x7f 0xb4 0xcd = "11233QC4")
    val z = spark.sql(
      """SELECT base58_encode_native(
           unhex('0000287fb4cd')) AS e,
         hex(base58_decode_native('11233QC4')) AS d""").collect()(0)
    assert(z.getString(0) == "11233QC4", z.getString(0))
    assert(z.getString(1) == "0000287FB4CD", z.getString(1))
    val mat = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_name")).localCheckpoint()
    val plan = mat
      .select(expr("base58_encode_native(cast(c_name as binary))"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [base58encode"), plan.take(300))
  }

  test("nfc/nfd_native: canonical (de)composition + codegen") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT length(nfc_native(cafe)) AS ln_c,
                length(nfd_native(nfc_native(cafe))) AS ln_d,
                nfc_native(cafe) = nfc_native(precomp) AS eq
         FROM (SELECT 'café' AS cafe, 'café' AS precomp)""")
      .collect()(0)
    assert(r.getInt(0) == 4, s"NFC length ${r.getInt(0)}")
    assert(r.getInt(1) == 5, s"NFD length ${r.getInt(1)}")
    assert(r.getBoolean(2), "NFC must unify composed and decomposed forms")
    val mat = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_name")).localCheckpoint()
    val plan = mat.select(expr("nfc_native(c_name)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [unicodenorm"), plan.take(300))
  }

  // literals constant-fold before the optimizer rule is observable, so
  // exercise the rule over a real (non-foldable) parquet column
  private def rounds(sql: String): Int = {
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("li_ext")
    val df = spark.sql(sql)
    "round\\(".r.findAllIn(df.queryExecution.optimizedPlan.toString.toLowerCase)
      .size
  }

  test("IntervalJoinRewrite equals the naive join on random intervals") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // seeded pseudo-random intervals with varied lengths, incl. ties and
    // boundary-touching pairs (strict < must exclude touching)
    def mk(n: Int, salt: Long) = (0 until n).map { i =>
      val s = ((i * 2654435761L + salt) % 10000 + 10000) % 10000
      (i.toLong, s, s + 1 + (i * 7919 + salt) % 300)
    }
    val a = mk(200, 17).toDF("ida", "s1", "e1")
    val b = mk(200, 923).toDF("idb", "s2", "e2")
    val cond = col("s1") < col("e2") && col("s2") < col("e1")
    val naive = a.join(b, cond)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val s2 = spark.newSession()
    graft.plans.IntervalJoinRewrite.install(s2)
    s2.conf.set(graft.plans.IntervalJoinRewrite.WidthConf, "128")
    // rebuild the frames on the clone so the rule session owns the plans
    val aa = s2.createDataFrame(mk(200, 17)).toDF("ida", "s1", "e1")
    val bb = s2.createDataFrame(mk(200, 923)).toDF("idb", "s2", "e2")
    val rewritten = aa.join(bb, col("s1") < col("e2") && col("s2") < col("e1"))
    val rp = rewritten.queryExecution.executedPlan.toString
    assert(!rp.contains("NestedLoopJoin") && !rp.contains("CartesianProduct"),
      s"rule did not fire:\n${rp.take(600)}")
    val got = rewritten.select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive,
      s"mismatch: missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
  }

  test("IntervalJoinRewrite: per-row fan-out past the cap fails loudly") {
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    graft.plans.IntervalJoinRewrite.install(s2)
    s2.conf.set(graft.plans.IntervalJoinRewrite.WidthConf, "1")
    s2.conf.set(graft.plans.IntervalJoinRewrite.MaxBucketsConf, "16")
    // spans of ~100 buckets at W=1 blow the 16-bucket cap: the rewrite
    // must fail with the NAMED knob error, not an opaque multi-GB
    // sequence allocation (the detector is syntactic, so a mis-sized W
    // on a 100 TB join would otherwise OOM a query that used to finish)
    val aa = s2.range(3).select(col("id").as("ida"),
      (col("id") * 10).as("s1"), (col("id") * 10 + 100).as("e1"))
    val bb = s2.range(3).select(col("id").as("idb"),
      (col("id") * 10).as("s2"), (col("id") * 10 + 100).as("e2"))
    val ex = intercept[Exception] {
      aa.join(bb, col("s1") < col("e2") && col("s2") < col("e1")).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("interval-join rewrite")),
      s"expected the named fan-out error, got: ${messages(ex).take(3)}")
  }

  test("IntervalJoinRewrite: unparseable width conf fails loudly") {
    val s2 = spark.newSession()
    graft.plans.IntervalJoinRewrite.install(s2)
    s2.conf.set(graft.plans.IntervalJoinRewrite.WidthConf, "3.6e9")
    val ex = intercept[Exception] {
      // the old behavior coerced to 0 and SILENTLY disabled the rewrite
      // (reverting to the O(|A|·|B|) plan); an explicitly set bad value
      // must name the conf instead
      s2.range(2).selectExpr("id AS s1", "id + 1 AS e1")
        .join(s2.range(2).selectExpr("id AS s2", "id + 1 AS e2"),
          org.apache.spark.sql.functions.col("s1") <
            org.apache.spark.sql.functions.col("e2") &&
          org.apache.spark.sql.functions.col("s2") <
            org.apache.spark.sql.functions.col("e1"))
        .queryExecution.executedPlan
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains(graft.plans.IntervalJoinRewrite.WidthConf))
  }

  test("TopKPerGroup: -0.0 and 0.0 double keys are ONE group") {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    val s2 = spark.newSession()
    graft.plans.TopKPerGroupStrategy.install(s2)
    import s2.implicits._
    val base = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (-0.0, 4L))
      .toDF("g", "v")
    val analyzed = base.queryExecution.analyzed
    def a(n: String) = analyzed.output.find(_.name == n).get
    val node = graft.plans.TopKPerGroup(1, Seq(a("g")),
      Seq(SortOrder(a("v"), Ascending)), analyzed)
    val rows = org.apache.spark.sql.graft.Bridge.ofRows(s2, node).collect()
    // SQL groups -0.0 with 0.0 (NormalizeFloatingNumbers semantics);
    // without key normalization the byte-equality heap map and the hash
    // exchange split them and k=1 emits two rows
    assert(rows.length == 1,
      s"-0.0/0.0 split into ${rows.length} groups: ${rows.toSeq}")
    assert(rows.head.getLong(1) == 1L, "top-1 by v must be the v=1 row")
    // and the construction-time guard for empty grouping names itself
    val err = intercept[IllegalArgumentException] {
      graft.plans.TopKPerGroup(1, Seq.empty,
        Seq(SortOrder(a("v"), Ascending)), analyzed)
    }
    assert(err.getMessage.contains("group column"))
  }

  test("routing registry normalizes file:/ and file:/// path renderings") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val s2 = spark.newSession()
    val scratch = graft.Scratch.dir("pathnorm")
    val basePath = s"$scratch/base"
    val mvPath = s"$scratch/mv"
    spark.range(10)
      .select((col("id") % 2).as("g"), col("id").cast("double").as("v"))
      .write.parquet(basePath)
    spark.read.parquet(basePath).groupBy(col("g"))
      .agg(sum(col("v").cast(DecimalType(30, 6))).as("sv"),
        count(lit(1)).as("n"))
      .write.parquet(mvPath)
    // REGISTER with the file:/// rendering; QUERY with the bare path —
    // the registry must normalize both to one key or routing silently
    // never fires (the full-scan failure mode has no error to notice)
    graft.plans.MvRouting.register(graft.plans.MvRouting.MvDef(
      basePath = s"file://$basePath", mvPath = mvPath,
      groupCols = Set("g"), sumMap = Map("v" -> "sv"), countCol = "n"))
    graft.plans.MvRouting.enable(s2)
    val q = s2.read.parquet(basePath).groupBy(col("g"))
      .agg(sum(col("v").cast(DecimalType(30, 6))).as("sv"))
      .orderBy(col("g"))
    assert(q.queryExecution.executedPlan.toString.contains("/mv"),
      "file:///-registered base not routed for a bare-path query:\n" +
        q.queryExecution.executedPlan.toString.take(500))
    assert(q.collect().map(_.getDecimal(1).doubleValue).toSeq
      == Seq(20.0, 25.0))
    // canonicalization unit cases, incl. the URI-unparseable fallback
    // (spaces) and remote-scheme preservation
    import graft.plans.PathRegistry.canonical
    assert(canonical("file:///tmp/a") == canonical("file:/tmp/a"))
    assert(canonical("file:/tmp/a") == canonical("/tmp/a"))
    assert(canonical("file:/tmp/my dir/t") == canonical("/tmp/my dir/t"),
      "URI-unparseable renderings must still meet on one key")
    assert(canonical("hdfs://hostA/p") != canonical("/p"),
      "remote URIs must keep scheme+authority (no local collision)")
    assert(canonical("/tmp/a/") == canonical("/tmp/a"))
  }

  test("CollapseRedundantRound removes the outer coarser round") {
    assert(rounds(
      "SELECT round(round(l_extendedprice, 2), 4) AS r FROM li_ext") == 1)
  }

  test("the rule does NOT fire when the outer round is finer") {
    assert(rounds(
      "SELECT round(round(l_extendedprice, 4), 2) AS r FROM li_ext") == 2)
  }

  test("KahanSum recovers low bits a naive double sum loses, incl. across merge") {
    val K = graft.operators.UdfOps.KahanSum
    // 1e16 + 1.0 loses the 1.0 in naive double arithmetic
    val xs = Seq(1e16, 1.0, 1.0, 1.0, 1.0, -1e16)
    val naive = xs.foldLeft(0.0)(_ + _)
    val kahan = K.finish(xs.foldLeft(K.zero)(K.reduce))
    assert(naive != 4.0, "fixture no longer demonstrates cancellation")
    assert(kahan == 4.0, s"sequential kahan: $kahan")
    // split at every point and merge: compensation must survive the merge
    (1 until xs.size).foreach { cut =>
      val (a, b) = xs.splitAt(cut)
      val m = K.finish(K.merge(
        a.foldLeft(K.zero)(K.reduce), b.foldLeft(K.zero)(K.reduce)))
      assert(m == 4.0, s"merged kahan at cut $cut: $m")
    }
  }
}
