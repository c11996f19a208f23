package graft

/** Dev plan-capture harness (not part of the driver contract): writes
  * `.explain("formatted")` of each named key's final DataFrame to
  * `<outDir>/<key>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/. Usage:
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> key [key ...]"
  *
  * Note: fixture/protocol keys (staged mutations, streaming epochs)
  * build their result eagerly inside the query fn; their dump is the
  * final — often control-plane — frame's plan plus whatever staging the
  * fn executed to produce it. The interesting plans for those keys are
  * asserted in PlanShapeSpec instead; the dump is still captured so the
  * round's plan evidence has one file per touched key.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> key...")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val keys = args.drop(2).toSeq
    val unknown = keys.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown keys: ${unknown.toSeq.sorted}")
    val spark = graft.Sessions.localHarness(defaultCpus = 8, logLevel = "ERROR")
    keys.foreach { k =>
      val txt =
        try SparkEntry.queries(k)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"ERR: ${e.toString.take(2000)}" }
      java.nio.file.Files.writeString(outDir.resolve(s"$k.txt"), txt)
      println(s"dumped $k (${txt.length} chars)")
    }
    spark.stop()
  }
}
