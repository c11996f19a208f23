package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev micro-batch cost probe (not part of the driver contract): runs a
  * representative streaming fixture pipeline and prints each batch's
  * progress JSON (durationMs breakdown: addBatch, getBatch, walCommit,
  * stateOperators commit/total), so streaming-key wall-clock can be
  * attributed to source listing vs state-store commits vs sink work.
  * Usage: sbt "runMain graft.StreamProbe <sfDir>"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s0 = graft.Sessions.localHarness(defaultCpus = 8, logLevel = "WARN")
    val s = s0.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val t0 = System.nanoTime()
    val src = s.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampNTZType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("props",
          org.apache.spark.sql.types.StringType))))
      .parquet(s"${graft.Scratch.streamStageRoot(dir)}/events_src_" +
        new java.io.File(dir).getName)
    val agg = src
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("probe_mem")
      .outputMode("complete")
      .option("checkpointLocation", graft.Scratch.dir("probe_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(600000L)
    val t1 = System.nanoTime()
    println(s"== wall: ${(t1 - t0) / 1e9}s")
    q.recentProgress.foreach(p => println(p.json))
    s0.stop()
  }
}
