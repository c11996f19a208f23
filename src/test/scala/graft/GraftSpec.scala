package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object GraftSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // spark.sql.extensions is a STATIC conf — bound at the first session
    // in the JVM, so the shared test session carries it (ExtensionsSpec
    // exercises the injected surface through this session)
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .appName("graft-test")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"
}

trait GraftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSpec.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def sf: String = GraftSpec.sf

  /** Epoch microseconds of a Timestamp — reference math must compare at
    * the fixture's full µs precision (`getTime` truncates to ms, which
    * silently diverges from operators ordering full timestamps).
    */
  def tsUs(t: java.sql.Timestamp): Long =
    // floorDiv, not /: getTime truncates toward zero, so a pre-epoch
    // timestamp would round the wrong way and sign-flip its fraction
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** The shared reference cosine over float embeddings (floats widened
    * to double — the operators' contract); previously copy-pasted in
    * four tests.
    */
  def refCos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The HALF_UP 6dp rounding contract shared with the operators. */
  def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
