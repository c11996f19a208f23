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
}
