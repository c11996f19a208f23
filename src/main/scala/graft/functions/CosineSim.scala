package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared machinery for the fused binary vector kernels ([[CosineSim]],
  * [[EuclidSq]], [[DotProduct]], [[MaxSim]]): element-type dispatch,
  * type checking, and the STRICT-SHAPE semantics all four share —
  * previously copy-pasted per kernel, which is how a fix to one would
  * have missed the other three.
  *
  *   - mismatched lengths THROW (ClickHouse's cosineDistance errors
  *     too; the old silent min-truncation scored garbage, and in MaxSim
  *     additionally misaligned token boundaries),
  *   - a NULL element makes the result NULL (the zip_with/aggregate
  *     HOF these kernels are proven bit-identical to propagates null
  *     the same way; the old getDouble-on-null read 0.0).
  */
trait VectorKernel extends BinaryExpression {
  def fnName: String

  // the kernels introduce NULL results of their own (null element,
  // zero norm) beyond child nullability — without this override,
  // non-nullable children would make nullSafeCodeGen pin ev.isNull to
  // a FalseLiteral (the emitted "isNull = true" then fails to compile)
  // AND let NullPropagation reason the result can't be null,
  // simplifying away callers' coalesce fallbacks
  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType

  protected def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$fnName expects array<float|double>; left is ${left.dataType}")
    else if (elem(right.dataType).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$fnName expects array<float|double>; right is ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  /** Equal lengths or throw; returns the common length. */
  protected def checkShape(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements(); val m = y.numElements()
    if (n != m) throw new IllegalArgumentException(
      s"$fnName: vector lengths differ ($n vs $m)")
    n
  }

  // lazy vals, not defs: dataType is fixed after analysis, and the
  // interpreted path reads these PER ELEMENT PER ROW — a def re-ran the
  // pattern match and allocated an Option ~2·dim times per row
  protected lazy val leftIsFloat: Boolean =
    elem(left.dataType).contains(FloatType)
  protected lazy val rightIsFloat: Boolean =
    elem(right.dataType).contains(FloatType)

  protected def readLeft(x: ArrayData, i: Int): Double =
    if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
  protected def readRight(y: ArrayData, i: Int): Double =
    if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)

  // ---- codegen fragments --------------------------------------------
  protected def genGetLeft(c: String, i: String): String =
    if (leftIsFloat) s"(double) $c.getFloat($i)" else s"$c.getDouble($i)"
  protected def genGetRight(c: String, i: String): String =
    if (rightIsFloat) s"(double) $c.getFloat($i)" else s"$c.getDouble($i)"

  protected def genCheckShape(c1: String, c2: String, n: String): String =
    s"""
      int $n = $c1.numElements();
      if ($n != $c2.numElements())
        throw new IllegalArgumentException(
          "$fnName: vector lengths differ (" + $n + " vs "
            + $c2.numElements() + ")");
    """

  /** In-loop null-element guard: sets ev.isNull and breaks. Emitted only
    * when a side's array type can actually hold nulls.
    */
  protected def genNullGuard(ev: ExprCode, c1: String, c2: String,
      i: String): String = {
    def nullable(t: DataType) = t match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
    val checks = Seq(
      if (nullable(left.dataType)) Some(s"$c1.isNullAt($i)") else None,
      if (nullable(right.dataType)) Some(s"$c2.isNullAt($i)") else None,
    ).flatten
    if (checks.isEmpty) ""
    else s"if (${checks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
  }

  /** Eval-side twin of [[genNullGuard]]. */
  protected def anyNull(x: ArrayData, y: ArrayData, i: Int): Boolean =
    x.isNullAt(i) || y.isNullAt(i)
}

/** §2.12 `expr_custom` — native Catalyst expression with whole-stage
  * codegen: fused cosine similarity over two float[] columns, single pass,
  * double accumulators, no intermediate arrays (the higher-order-function
  * formulation allocates zip/transform arrays per row; this doesn't).
  * A zero-norm side yields NULL — the same result the HOF formulation
  * gets from Spark's Divide on a zero divisor.
  *
  * Demonstrates the preferred extension ladder from SURVEY.md §2.12:
  * built-ins < native Expression (this) < UDF. Registered as a temp SQL
  * function `cosine_sim_native(a, b)` via [[GraftFunctions.register]].
  */
case class CosineSim(left: Expression, right: Expression)
    extends VectorKernel {

  override def fnName: String = "cosine_sim_native"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = checkShape(x, y)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (anyNull(x, y, i)) return null
      val xi = readLeft(x, i); val yi = readRight(y, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) null else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val den = ctx.freshName("den")
      s"""
        ${genCheckShape(c1, c2, n)}
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          ${genNullGuard(ev, c1, c2, i)}
          double $x = ${genGetLeft(c1, i)};
          double $y = ${genGetRight(c2, i)};
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        if (!${ev.isNull}) {
          double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
          if ($den == 0.0) { ${ev.isNull} = true; }
          else { ${ev.value} = $dot / $den; }
        }
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
    extends VectorKernel {

  override def fnName: String = "l2_sq_native"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = checkShape(x, y)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (anyNull(x, y, i)) return null
      val d = readLeft(x, i) - readRight(y, i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        ${genCheckShape(c1, c2, n)}
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          ${genNullGuard(ev, c1, c2, i)}
          double $d = ${genGetLeft(c1, i)} - ${genGetRight(c2, i)};
          $acc += $d * $d;
        }
        if (!${ev.isNull}) { ${ev.value} = $acc; }
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
    extends VectorKernel {

  override def fnName: String = "dot_native"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = checkShape(x, y)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (anyNull(x, y, i)) return null
      acc += readLeft(x, i) * readRight(y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        ${genCheckShape(c1, c2, n)}
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          ${genNullGuard(ev, c1, c2, i)}
          $acc += ${genGetLeft(c1, i)} * ${genGetRight(c2, i)};
        }
        if (!${ev.isNull}) { ${ev.value} = $acc; }
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
  * (asserted in ExtensionsSpec). Lengths must be equal AND divisible
  * by the token count: a misaligned slice would silently score
  * garbage. Registered as `maxsim_native(a, b)`.
  */
case class MaxSim(left: Expression, right: Expression)
    extends VectorKernel {

  private val Tokens = 8

  override def fnName: String = "maxsim_native"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = checkShape(x, y)
    if (n % Tokens != 0) throw new IllegalArgumentException(
      s"$fnName: length $n is not a multiple of $Tokens tokens")
    val sub = n / Tokens
    var i = 0
    while (i < n) { // null scan up front: token loops index non-linearly
      if (anyNull(x, y, i)) return null
      i += 1
    }
    var score = 0.0
    var t = 0
    while (t < Tokens) {
      var best = Double.NegativeInfinity
      var u = 0
      while (u < Tokens) {
        var dot = 0.0
        var j = 0
        while (j < sub) {
          dot += readLeft(x, t * sub + j) * readRight(y, u * sub + j)
          j += 1
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
      val sub = ctx.freshName("sub")
      val n = ctx.freshName("n")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val dot = ctx.freshName("dot")
      val t = ctx.freshName("t")
      val u = ctx.freshName("u")
      val i = ctx.freshName("i")
      s"""
        ${genCheckShape(c1, c2, n)}
        if ($n % $Tokens != 0)
          throw new IllegalArgumentException(
            "$fnName: length " + $n + " is not a multiple of $Tokens tokens");
        int $sub = $n / $Tokens;
        for (int $i = 0; $i < $n; $i++) {
          ${genNullGuard(ev, c1, c2, i)}
        }
        if (!${ev.isNull}) {
          double $score = 0.0;
          for (int $t = 0; $t < $Tokens; $t++) {
            double $best = java.lang.Double.NEGATIVE_INFINITY;
            for (int $u = 0; $u < $Tokens; $u++) {
              double $dot = 0.0;
              for (int $i = 0; $i < $sub; $i++) {
                $dot += ${genGetLeft(c1, s"$t * $sub + $i")}
                        * ${genGetRight(c2, s"$u * $sub + $i")};
              }
              if ($dot > $best) $best = $dot;
            }
            $score += $best;
          }
          ${ev.value} = $score;
        }
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
