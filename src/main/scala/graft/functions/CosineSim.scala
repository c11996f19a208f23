package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** §2.12 `expr_custom` — native Catalyst expression with whole-stage
  * codegen: fused cosine similarity over two float[] columns, single pass,
  * double accumulators, no intermediate arrays (the higher-order-function
  * formulation allocates zip/transform arrays per row; this doesn't).
  *
  * Demonstrates the preferred extension ladder from SURVEY.md §2.12:
  * built-ins < native Expression (this) < UDF. Registered as a temp SQL
  * function `cosine_sim_native(a, b)` via [[GraftFunctions.register]].
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elem(left.dataType).isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_native expects array<float|double>; left is ${left.dataType}")
    else if (elem(right.dataType).isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_native expects array<float|double>; right is ${right.dataType}")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elem(left.dataType).contains(FloatType)
    val rf = elem(right.dataType).contains(FloatType)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      def getter(c: String, side: DataType, i: String): String =
        if (elem(side).contains(FloatType)) s"(double) $c.getFloat($i)"
        else s"$c.getDouble($i)"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $n = java.lang.Math.min($c1.numElements(), $c2.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = ${getter(c1, left.dataType, i)};
          double $y = ${getter(c2, right.dataType, i)};
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Fused squared-L2 distance over two numeric array columns — the
  * k-means/IVF hot-path twin of [[CosineSim]]: single pass, double
  * accumulator, no per-row zip/transform allocations, whole-stage
  * codegen. Element types dispatch independently per side (float or
  * double), so it applies both to raw embedding columns and to the
  * double-cast vectors the vector operators carry. Accumulation order
  * is the same left-to-right fold as the higher-order-function
  * formulation, so results are bit-identical to it (asserted in
  * ExtensionsSpec). Registered as `l2_sq_native(a, b)`.
  */
case class EuclidSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elem(left.dataType).isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_sq_native expects array<float|double>; left is ${left.dataType}")
    else if (elem(right.dataType).isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_sq_native expects array<float|double>; right is ${right.dataType}")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elem(left.dataType).contains(FloatType)
    val rf = elem(right.dataType).contains(FloatType)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      def getter(c: String, side: DataType, i: String): String =
        if (elem(side).contains(FloatType)) s"(double) $c.getFloat($i)"
        else s"$c.getDouble($i)"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($c1.numElements(), $c2.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = ${getter(c1, left.dataType, i)} - ${getter(c2, right.dataType, i)};
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EuclidSq =
    copy(left = newLeft, right = newRight)
}

/** Fused dot product over two numeric array columns — the MIPS hot
  * path: single pass, double accumulator (elements widened to double
  * BEFORE the multiply, exactly like the HOF cast discipline), no
  * per-row zip/transform allocations, whole-stage codegen. Fold order
  * is the left-to-right HOF order, so results are bit-identical to the
  * zip_with/aggregate formulation (asserted in ExtensionsSpec).
  * Registered as `dot_native(a, b)`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elem(left.dataType).isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_native expects array<float|double>; left is ${left.dataType}")
    else if (elem(right.dataType).isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_native expects array<float|double>; right is ${right.dataType}")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elem(left.dataType).contains(FloatType)
    val rf = elem(right.dataType).contains(FloatType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      def getter(c: String, side: DataType, i: String): String =
        if (elem(side).contains(FloatType)) s"(double) $c.getFloat($i)"
        else s"$c.getDouble($i)"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($c1.numElements(), $c2.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ${getter(c1, left.dataType, i)} * ${getter(c2, right.dataType, i)};
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused ColBERT MaxSim over two vector columns read as 8 token
  * sub-vectors: score = Σ over left tokens of the max dot product
  * against any right token. Replaces the interpreted nested-HOF
  * formulation (higher-order functions are NOT whole-stage-codegen'd
  * in Spark; the HOF version also re-sliced each side 8×8 times per
  * pair). Fold order matches the HOF exactly — dot products accumulate
  * left-to-right within a token, token maxima are order-independent,
  * token sums accumulate t = 0..7 — so results are bit-identical
  * (asserted in ExtensionsSpec). Registered as `maxsim_native(a, b)`.
  */
case class MaxSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private val Tokens = 8

  override def dataType: DataType = DoubleType

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elem(left.dataType).isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"maxsim_native expects array<float|double>; left is ${left.dataType}")
    else if (elem(right.dataType).isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"maxsim_native expects array<float|double>; right is ${right.dataType}")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elem(left.dataType).contains(FloatType)
    val rf = elem(right.dataType).contains(FloatType)
    val sub = math.min(x.numElements(), y.numElements()) / Tokens
    var score = 0.0
    var t = 0
    while (t < Tokens) {
      var best = Double.NegativeInfinity
      var u = 0
      while (u < Tokens) {
        var dot = 0.0
        var i = 0
        while (i < sub) {
          val xi = if (lf) x.getFloat(t * sub + i).toDouble
                   else x.getDouble(t * sub + i)
          val yi = if (rf) y.getFloat(u * sub + i).toDouble
                   else y.getDouble(u * sub + i)
          dot += xi * yi
          i += 1
        }
        if (dot > best) best = dot
        u += 1
      }
      score += best
      t += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      def getter(c: String, side: DataType, i: String): String =
        if (elem(side).contains(FloatType)) s"(double) $c.getFloat($i)"
        else s"$c.getDouble($i)"
      val sub = ctx.freshName("sub")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val dot = ctx.freshName("dot")
      val t = ctx.freshName("t")
      val u = ctx.freshName("u")
      val i = ctx.freshName("i")
      s"""
        int $sub = java.lang.Math.min($c1.numElements(), $c2.numElements()) / $Tokens;
        double $score = 0.0;
        for (int $t = 0; $t < $Tokens; $t++) {
          double $best = java.lang.Double.NEGATIVE_INFINITY;
          for (int $u = 0; $u < $Tokens; $u++) {
            double $dot = 0.0;
            for (int $i = 0; $i < $sub; $i++) {
              $dot += ${getter(c1, left.dataType, s"$t * $sub + $i")}
                      * ${getter(c2, right.dataType, s"$u * $sub + $i")};
            }
            if ($dot > $best) $best = $dot;
          }
          $score += $best;
        }
        ${ev.value} = $score;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSim =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register the native functions into the session's function registry. */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim_native", args => CosineSim(args(0), args(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_sq_native", args => EuclidSq(args(0), args(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "maxsim_native", args => MaxSim(args(0), args(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_native", args => DotProduct(args(0), args(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "damerau_native", args => DamerauLev(args(0), args(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_native", args => JaroSim(args(0), args(1), winkler = false),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler_native", args => JaroSim(args(0), args(1), winkler = true),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "base58_encode_native", args => Base58Encode(args(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "base58_decode_native", args => Base58Decode(args(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_native", args => UnicodeNorm(args(0), nfc = true), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfd_native", args => UnicodeNorm(args(0), nfc = false), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ipv4_to_long", args => Ipv4ToLong(args(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_to_ipv4", args => LongToIpv4(args(0)), "built-in")
    // Spark's runtime-filter bloom expressions, exposed for explicit
    // cross-batch filtering (they are registry-hidden upstream because
    // AQE injects them; the expressions themselves are public classes)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      args => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(args(0), args(1), args(2))
        .toAggregateExpression(),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains",
      args => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(args(0), args(1)),
      "built-in")
  }
}
