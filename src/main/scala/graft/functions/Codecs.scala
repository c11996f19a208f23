package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Base58 codec (Bitcoin alphabet — no 0/O/I/l) shared by the
  * [[Base58Encode]]/[[Base58Decode]] expressions. The classic
  * repeated-divmod big-base conversion with the leading-zero-byte ↔
  * leading-'1' convention; O(n²) in the input length, which is fine for
  * the id/key-sized payloads the ClickHouse `base58Encode`/
  * `base58Decode` pair targets.
  */
object Base58Helper {
  private val Alphabet =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz".toCharArray
  private val Indexes: Array[Int] = {
    val idx = Array.fill(128)(-1)
    var i = 0
    while (i < Alphabet.length) { idx(Alphabet(i)) = i; i += 1 }
    idx
  }

  def encode(input: Array[Byte]): UTF8String = {
    if (input.isEmpty) return UTF8String.EMPTY_UTF8
    var zeros = 0
    while (zeros < input.length && input(zeros) == 0) zeros += 1
    val num = java.util.Arrays.copyOf(input, input.length)
    val out = new Array[Char](input.length * 2)
    var outPos = out.length
    var start = zeros
    while (start < num.length) {
      // one divmod of the big-endian byte string by 58
      var rem = 0
      var i = start
      while (i < num.length) {
        val digit = (num(i) & 0xff) + rem * 256
        num(i) = (digit / 58).toByte
        rem = digit % 58
        i += 1
      }
      outPos -= 1
      out(outPos) = Alphabet(rem)
      if (num(start) == 0) start += 1
    }
    // skip extra leading '1's produced during the calculation
    while (outPos < out.length && out(outPos) == '1') outPos += 1
    val sb = new java.lang.StringBuilder(zeros + (out.length - outPos))
    var z = 0
    while (z < zeros) { sb.append('1'); z += 1 }
    sb.append(out, outPos, out.length - outPos)
    UTF8String.fromString(sb.toString)
  }

  def decode(input: UTF8String): Array[Byte] = {
    val s = input.toString
    if (s.isEmpty) return Array.emptyByteArray
    var zeros = 0
    while (zeros < s.length && s.charAt(zeros) == '1') zeros += 1
    val num = new Array[Int](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val v = if (c < 128) Indexes(c) else -1
      if (v < 0)
        throw new IllegalArgumentException(s"invalid base58 char '$c'")
      num(i) = v
      i += 1
    }
    val out = new Array[Byte](s.length)
    var outPos = out.length
    var start = zeros
    while (start < num.length) {
      // one divmod of the base-58 digit string by 256
      var rem = 0
      var j = start
      while (j < num.length) {
        val digit = num(j) + rem * 58
        num(j) = digit / 256
        rem = digit % 256
        j += 1
      }
      outPos -= 1
      out(outPos) = rem.toByte
      if (num(start) == 0) start += 1
    }
    // skip extra leading zero bytes produced during the calculation
    while (outPos < out.length && out(outPos) == 0) outPos += 1
    val res = new Array[Byte](zeros + (out.length - outPos))
    System.arraycopy(out, outPos, res, zeros, out.length - outPos)
    res
  }
}

/** ClickHouse `base58Encode`: binary → Base58 string. Native codegen
  * expression — the divmod loop runs as a static JVM call inside the
  * whole-stage-codegen'd consume path, no UDF serialization boundary.
  */
case class Base58Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"base58_encode expects binary; got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    Base58Helper.encode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Base58Helper.encode($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Base58Encode = copy(child = newChild)
}

/** ClickHouse `base58Decode`: Base58 string → binary (throws on a
  * non-alphabet character, matching ClickHouse's strict decoder).
  */
case class Base58Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"base58_decode expects string; got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    Base58Helper.decode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Base58Helper.decode($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Base58Decode = copy(child = newChild)
}

/** Static forwarder for the codegen'd [[UnicodeNorm]] call. */
object UnicodeHelper {
  def norm(s: UTF8String, nfc: Boolean): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString,
      if (nfc) java.text.Normalizer.Form.NFC
      else java.text.Normalizer.Form.NFD))
}

/** ClickHouse `normalizeUTF8NFC` / `normalizeUTF8NFD`: Unicode
  * canonical (de)composition — the normalization pass a text-dedup
  * pipeline needs before hashing, so "é" (U+00E9) and "e"+U+0301 hash
  * identically. JDK `java.text.Normalizer` does the tables; the
  * expression keeps the call inside whole-stage codegen.
  */
case class UnicodeNorm(child: Expression, nfc: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_norm expects string; got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    UnicodeHelper.norm(v.asInstanceOf[UTF8String], nfc)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeHelper.norm($c, $nfc);")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNorm = copy(child = newChild)
}
