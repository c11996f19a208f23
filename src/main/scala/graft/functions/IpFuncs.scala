package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IPv4 address codec as native codegen'd Catalyst expressions — the
  * ClickHouse `IPv4StringToNum` / `IPv4NumToString` pair, used for
  * subnet grouping and IP-range joins over access-log-shaped data.
  *
  * Same extension ladder as [[CosineSim]]: a native Expression keeps the
  * parse inside whole-stage codegen (one static JVM call on the hot
  * path, no UDF serialization, no row boxing). Malformed input yields
  * NULL, never an exception — at 100 TB a parse throw on one bad log
  * line would kill the stage.
  */
object IpUtil {
  /** "a.b.c.d" → unsigned 32-bit value as long, or -1 if malformed.
    * Single left-to-right byte scan, no allocation. Strict: exactly four
    * dot-separated decimal octets 0..255, no signs/blanks/extra dots.
    */
  def ipv4ToLong(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var octets = 0
    var acc = -1L // -1 = no digit seen yet in current octet
    var out = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b >= '0' && b <= '9') {
        acc = (if (acc < 0) 0L else acc) * 10 + (b - '0')
        if (acc > 255) return -1L
      } else if (b == '.') {
        if (acc < 0 || octets == 3) return -1L
        out = (out << 8) | acc
        octets += 1
        acc = -1L
      } else return -1L
      i += 1
    }
    if (acc < 0 || octets != 3) -1L
    else (out << 8) | acc
  }

  /** Unsigned 32-bit value → "a.b.c.d". Caller guarantees 0..2^32-1. */
  def longToIpv4(v: Long): UTF8String =
    UTF8String.fromString(
      s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}")
}

/** `ipv4_to_long(str)` — NULL on malformed input. */
case class Ipv4ToLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ipv4_to_long expects a string input; got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val v = IpUtil.ipv4ToLong(input.asInstanceOf[UTF8String])
    if (v < 0) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("ipv4")
      s"""
        long $v = graft.functions.IpUtil.ipv4ToLong($c);
        if ($v < 0) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Ipv4ToLong =
    copy(child = newChild)
}

/** `long_to_ipv4(num)` — NULL when the value is outside 0..2^32-1. */
case class LongToIpv4(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_to_ipv4 expects a bigint input; got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    if (v < 0L || v > 0xffffffffL) null else IpUtil.longToIpv4(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
        if ($c < 0L || $c > 4294967295L) { ${ev.isNull} = true; }
        else { ${ev.value} = graft.functions.IpUtil.longToIpv4($c); }
      """)

  override protected def withNewChildInternal(newChild: Expression): LongToIpv4 =
    copy(child = newChild)
}
