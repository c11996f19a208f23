package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scorer for [[JaroSim]] — kept as a plain object method so the
  * generated whole-stage code can call it through the static forwarder
  * (the per-row O(|a|·|b|) match scan doesn't inline into an expression
  * tree the way the fused array kernels in [[CosineSim]] do, but the
  * call itself stays inside the codegen'd consume path).
  *
  * Semantics are the textbook Jaro (match window ⌊max/2⌋−1, half-count
  * transpositions) with the standard Winkler boost: common prefix capped
  * at 4, scale 0.1, applied only when jaro > 0.7 — the same contract
  * DuckDB's `jaro_similarity`/`jaro_winkler_similarity` expose
  * (empirically: either side empty → 0.0, boost threshold 0.7).
  */
object JaroHelper {

  def score(a: UTF8String, b: UTF8String, winkler: Boolean): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars, in order, compared pairwise
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (!winkler || jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(4, math.min(l1, l2))
    while (prefix < cap && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** Native Jaro / Jaro-Winkler string similarity over two string columns —
  * the fuzzy-match primitive ClickHouse exposes as `jaroSimilarity` /
  * `jaroWinklerSimilarity` (and DuckDB as the oracle twins). Registered
  * as `jaro_native(a, b)` and `jaro_winkler_native(a, b)`.
  */
case class JaroSim(left: Expression, right: Expression, winkler: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro expects (string, string); got (${left.dataType}, ${right.dataType})")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroHelper.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      winkler)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      s"${ev.value} = graft.functions.JaroHelper.score($c1, $c2, $winkler);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroSim =
    copy(left = newLeft, right = newRight)
}
