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
  * at 4, scale 0.1, applied only when jaro > 0.7 — matching DuckDB's
  * `jaro_similarity`/`jaro_winkler_similarity` constants (empirically:
  * either side empty → 0.0, boost threshold 0.7).
  *
  * UNIT CAVEAT: this scorer compares UTF-16 code units while DuckDB
  * compares bytes — identical on ASCII, divergent beyond (a 2-byte
  * 'é' is one unit here, two there, shifting lengths and the match
  * window). The oracled keys (fn_jaro over p_name, fn_damerau over
  * space-split document tokens) probe ASCII-only fixture columns; a
  * non-ASCII fixture would need a byte-level twin, not this one.
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

/** Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner: true edit
  * distance with adjacent-transposition, where a transposed block may be
  * edited again — 'ca'→'abc' = 2, not the OSA 3). Shared scorer for
  * [[DamerauLev]]; the DP keeps the last-row-per-alphabet-char index
  * (`da`) the full algorithm requires, O(|a|·|b|) time, O(|a|·|b|)
  * table — fine for the short-string columns it targets.
  */
object DamerauHelper {

  def distance(a: UTF8String, b: UTF8String): Int = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    val inf = l1 + l2
    // d is (l1+2) x (l2+2) with the Lowrance-Wagner sentinel border
    val d = Array.ofDim[Int](l1 + 2, l2 + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= l1) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Char, Int]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k = da.getOrDefault(s2.charAt(j - 1), 0)
        val l = db
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) { db = j; 0 }
                   else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(s1.charAt(i - 1), i)
      i += 1
    }
    d(l1 + 1)(l2 + 1)
  }
}

/** Native unrestricted Damerau-Levenshtein over two string columns — the
  * transposition-aware edit distance (ClickHouse
  * `damerauLevenshteinDistance`; DuckDB `damerau_levenshtein` is the
  * oracle twin — both unrestricted, probed on the 'ca'→'abc' = 2
  * separator case). Registered as `damerau_native(a, b)`.
  */
case class DamerauLev(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"damerau expects (string, string); got (${left.dataType}, ${right.dataType})")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauHelper.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      s"${ev.value} = graft.functions.DamerauHelper.distance($c1, $c2);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLev =
    copy(left = newLeft, right = newRight)
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
