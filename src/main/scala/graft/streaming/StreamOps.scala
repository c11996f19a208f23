package graft.streaming

import graft.{Det, QueryDef}
import graft.operators.Cdc
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** §2.10 Structured Streaming + §2.1 streaming sources/sinks.
  *
  * Every registry entry here REALLY runs a streaming query (file/rate
  * source → transforms → memory/parquet sink, `Trigger.AvailableNow`) and
  * then returns the materialized result as a batch DataFrame for the
  * driver's correctness dump. Batch-equivalent oracles exist where the
  * computation is SQL-expressible; watermark/late-data semantics that SQL
  * cannot state are asserted in ScalaTest with MemoryStream instead.
  *
  * Scale notes (100 TB posture): windowed/dedup/join stateful ops
  * keyed by unbounded domains sit behind watermarks (state eviction);
  * dropDuplicatesWithinWatermark bounds dedup state; the idempotent sink
  * overwrites per-batchId partitions so at-least-once replays converge
  * (exactly-once effect without a transactional store). DOCUMENTED
  * EXCEPTIONS: the per-user running-aggregate demos (stream_stateful's
  * fMGWS and the TimeMode.None tws processors) carry NoTimeout/
  * TTLConfig.NONE — their state is the POINT of the key (a running
  * per-user aggregate never expires semantically), the demo feeds are
  * finite AvailableNow runs, and Spark only permits state TTL in
  * processing-time mode; a production deployment of these shapes sets
  * TTLConfig / a GroupStateTimeout to its retention policy.
  */
object StreamOps {

  case class Ev(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value: Double)
  case class UserAgg(n: Long, sum: java.math.BigDecimal)
  case class UserStat(user_id: Long, n_events: Long, sum_value: Double)

  /** events.parquet as an unbounded file source (the Canal feed stand-in;
    * no Kafka jar ships in this image). The fixture's ts encoding
    * differs between testdata drops — TIMESTAMP(NANOS) (readable only
    * as a nanos LONG via a legacy conf that Spark 4.1.2 removed) vs
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read natively as
    * TIMESTAMP_NTZ) — so every streaming read goes through
    * [[eventsStreamUs]], which detects the encoding from the batch
    * footer once and normalizes to a µs LONG `ts_us`.
    */
  private val eventsNanosSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private val eventsMicrosSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** true iff this fixture drop's ts is TIMESTAMP(NANOS) (surfaces as
    * LONG under the legacy conf; on Spark builds without that conf the
    * nanos file would be unreadable anyway, so LONG is the reliable
    * marker). Footer-only check, cached per sfDir.
    */
  private val tsNanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def eventsTsIsNanos(s: SparkSession, dir: String): Boolean =
    // fingerprint in the key: a testdata drop that re-encodes events.ts
    // at the same path (observed round 7, NANOS→MICROS) must re-probe,
    // or a live JVM reads the new encoding with the stale schema choice
    tsNanosCache.computeIfAbsent(
      s"$dir@${graft.Scratch.fixtureFingerprint(dir)}", _ => {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      val isNanos = s.read.parquet(s"$dir/events.parquet")
        .schema("ts").dataType == LongType
      // restore on a micros fixture: the probe must not leak a global
      // decode-behavior change into the caller's session (readers of a
      // nanos fixture re-set the conf themselves)
      if (!isNanos) prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
      isNanos
    })

  /** Streaming source over `srcDir` normalized to
    * (event_id, ts_us, user_id, event_type, value, props); `dir` is the
    * fixture sfDir used for encoding detection.
    */
  private def eventsStreamUs(s: SparkSession, srcDir: String,
      dir: String): DataFrame = {
    val raw =
      if (eventsTsIsNanos(s, dir)) {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.readStream.schema(eventsNanosSchema).parquet(srcDir)
          .withColumn("ts_us", expr("ts div 1000"))
      } else
        s.readStream.schema(eventsMicrosSchema).parquet(srcDir)
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    raw.select(col("event_id"), col("ts_us"), col("user_id"),
      col("event_type"), col("value"), col("props"))
  }

  /** The file source wants a directory; stage one containing a symlink to
    * the fixture parquet (per sfDir, idempotent).
    */
  private def eventsDir(dir: String): String = {
    val sf = new java.io.File(dir).getName
    val d = s"${graft.Scratch.streamStageRoot(dir)}/events_src_$sf"
    // staged(): marker + per-path lock — the bare createSymbolicLink
    // raced two sessions in one JVM (FileAlreadyExistsException) and
    // trusted partial state after a crash. Wipe-first = idempotent.
    graft.Scratch.staged(d) {
      graft.Scratch.deleteRecursively(new java.io.File(d))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$d/events_0.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
    }
  }

  private def eventsStream(s: SparkSession, dir: String): DataFrame =
    eventsStreamUs(s, eventsDir(dir), dir)
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))

  private def fresh(prefix: String): String = {
    graft.Scratch.dir(prefix)
  }

  /** Streaming state sizing: the state-store instance count is pinned to
    * `spark.sql.shuffle.partitions` AT CHECKPOINT CREATION — a
    * first-class production knob that should track expected STATE
    * volume, not the batch-side shuffle width (each instance carries
    * store init, snapshot, and commit overhead per micro-batch). The
    * conf is scoped to a session clone so batch queries keep the
    * bench-wide setting; at 100 TB the same knob is simply set higher.
    */
  private def stateSized(s: SparkSession): SparkSession = {
    val c = s.newSession()
    c.conf.set("spark.sql.shuffle.partitions", "8")
    c
  }

  private val nameCtr = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Bounded await for every AvailableNow/finite query in this file: a
    * wedged micro-batch (hung store init, deadlocked foreachBatch) must
    * fail ONE key loudly instead of hanging the whole verify/bench
    * driver forever on an untimed awaitTermination().
    */
  private def awaitBounded(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    if (!q.awaitTermination(600000L)) {
      q.stop()
      throw new IllegalStateException(
        "streaming query did not terminate within 600s — wedged micro-batch")
    }

  /** Run a streaming DataFrame to completion into an in-memory table. */
  private def runToMemory(s: SparkSession, df: DataFrame, mode: String): DataFrame =
    runToMemoryWithQuery(s, df, mode)._1

  /** [[runToMemory]] also returning the (terminated) query handle — for
    * the one consumer that reads recentProgress; previously a verbatim
    * copy of the writeStream body that could drift from the shared
    * checkpoint/trigger/await discipline.
    */
  private def runToMemoryWithQuery(s: SparkSession, df: DataFrame,
      mode: String): (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    val name = s"graft_mem_${nameCtr.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", fresh(s"${name}_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    awaitBounded(q)
    (s.table(name), q)
  }

  /** One-time staged inputs (feed files, symlinked source dirs) — shared
    * fixture ETL, pre-created by Bench's warm-up so measured queries pay
    * for the pipeline, not the staging.
    */
  def prepareFixtures(s: SparkSession, dir: String): Unit = {
    feedDir(s, dir); eventsDir(dir); outerEventsDir(s, dir)
    Cdc.entryFeedDir(s, dir); Cdc.entryFeedTxnDir(s, dir)
    offsetLogDir(s, dir) // the broker's log exists before a consumer runs
    multiFeedDir(s, dir) // stream_cdc_scd2's two-file feed — without it
    // the first measured rep pays the envelope ETL inside the timing
    backfillTailFeedDir(s, dir) // stream_backfill_tail's tail feed, same rule
    ()
  }

  /** stream_backfill_tail's staged tail feed (updates + deletes only) —
    * derives deterministically from the fixture, staged cross-run and
    * pre-created by [[prepareFixtures]] so the key's first measured rep
    * never pays the envelope ETL inside the timing.
    */
  private def backfillTailFeedDir(s: SparkSession, dir: String): String = {
    val feed = s"${graft.Scratch.streamStageRoot(dir)}/backfill_tail_feed"
    graft.Scratch.staged(feed) {
      Cdc.envelopesTail(s, dir).coalesce(1).write.mode("overwrite").text(feed)
    }
    feed
  }

  // ---- sources ----

  /** CDC envelope JSON dropped as files, consumed as an unbounded stream,
    * routed per (table, type) — the Canal TCP/Kafka feed modeled as a
    * file drop.
    */
  /** The CDC envelope feed as a file-drop directory (written once per
    * JVM / sfDir — deterministic content).
    */
  private def feedDir(s: SparkSession, dir: String): String = {
    val sf = new java.io.File(dir).getName
    val feed = s"${graft.Scratch.streamStageRoot(dir)}/cdc_feed_$sf"
    graft.Scratch.staged(feed) {
      Cdc.envelopes(s, dir).coalesce(1).write.mode("overwrite").text(feed)
    }
  }

  private def srcStreamFile(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val feed = feedDir(s, dir)
    val parsed = s.readStream.schema(Cdc.envelopeSchema).json(feed)
    val agg = parsed.filter(!col("isDdl"))
      .groupBy(col("table").as("tbl"), col("type").as("typ"))
      .agg(count(lit(1)).as("n"))
    runToMemory(s, agg, "complete").orderBy(col("tbl"), col("typ"))
  }

  /** Synthetic load generator (bench harness for streaming ops) — row
    * count is wall-clock-dependent, so rows-only check.
    */
  private def srcRate(s: SparkSession, dir: String): DataFrame = {
    val name = s"graft_rate_${nameCtr.incrementAndGet()}"
    val q = s.readStream.format("rate")
      .option("rowsPerSecond", "5000").option("numPartitions", "2").load()
      .groupBy().agg(count(lit(1)).as("n_rows"), max(col("value")).as("max_v"))
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    // wait until the generator has actually produced rows — 60s bound
    // (10s flaked under documented external host load), and FAIL LOUDLY
    // on timeout instead of returning an empty frame the rows-only gate
    // would report as a bare rowcount failure with no cause
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (s.table(name).isEmpty && System.nanoTime() < deadline)
      Thread.sleep(200)
    q.stop(); awaitBounded(q)
    require(!s.table(name).isEmpty,
      "rate source produced no committed batch within 60s (host wedged?)")
    s.table(name).limit(1)
  }

  // ---- sinks ----

  /** foreachBatch append sink partitioned by event_type (the adapters'
    * buffered INSERT-batch analogue); verified by reading the files back.
    */
  private def sinkParquet(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val out = fresh("sink_parquet")
    val q = eventsStream(s, dir).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("event_type").parquet(out)
      }
      .option("checkpointLocation", fresh("sink_parquet_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    awaitBounded(q)
    s.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Exactly-once-per-batch sink: each micro-batch overwrites its own
    * `batch=<id>` partition, so an at-least-once replay of the same batch
    * converges to the same files. Demonstrated by running the SAME input
    * through TWO independent streams (second = full replay) into one dir.
    */
  private def sinkIdempotent(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val out = fresh("sink_idem")
    def runOnce(): Unit = {
      val q = eventsStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
        }
        .option("checkpointLocation", fresh("sink_idem_ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      awaitBounded(q)
    }
    runOnce(); runOnce() // replay — overwrite keeps the sink idempotent
    s.read.parquet(s"$out/batch=0")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** The reference's whole pipeline end-to-end in streaming form: envelope
    * feed → parse → type-map → foreachBatch ReplacingMergeTree merge into
    * a bucketed parquet "table" (the ClickHouse background-merge analogue).
    *
    * State layout: `state/v=<batchId>/bucket=<pk % N>/`. Each micro-batch
    * merges ONLY the buckets its keys touch — prior versions of untouched
    * buckets stay as-is and are never re-read or rewritten, so per-batch
    * I/O is O(touched buckets), not O(table). Replay-safe by construction:
    * the merge for batch b reads only versions `< b` off disk (never an
    * in-memory "latest" pointer), so an at-least-once re-execution of
    * batch b reads the same inputs and idempotently overwrites `v=b`.
    * Tombstones are kept in state (an out-of-order pre-delete event can
    * never resurrect a key); the final read filters them. Fully-superseded
    * version dirs are GC'd after each merge (see [[gcCdcVersions]]), so
    * live metadata stays O(buckets) over an unbounded batch history.
    */
  private[graft] val cdcStateBuckets = 8

  /** bucket → latest version holding it, considering versions < ltBatch. */
  private[graft] def cdcBucketVersions(state: String, ltBatch: Long): Map[Int, Long] = {
    val root = new java.io.File(state)
    val versions = graft.Scratch.listPartitionDirs(root.getPath, "v=")
      .map(_.getName.drop(2).toLong).filter(_ < ltBatch).sorted
    val latest = scala.collection.mutable.Map[Int, Long]()
    versions.foreach { v =>
      graft.Scratch.listPartitionDirs(
          new java.io.File(root, s"v=$v").getPath, "bucket=")
        .foreach(b => latest(b.getName.drop(7).toInt) = v)
    }
    latest.toMap
  }

  /** bucket → latest state dir, considering only versions < ltBatch. */
  private[graft] def cdcBucketPaths(state: String, ltBatch: Long): Map[Int, String] =
    cdcBucketVersions(state, ltBatch).map { case (b, v) =>
      b -> s"$state/v=$v/bucket=$b"
    }

  /** Version GC: delete every `v=<k>` dir (k < batchId) that is not the
    * latest version of ANY bucket among versions strictly below batchId.
    * Replay-safe by construction: an at-least-once re-execution of batch
    * `batchId` reads exactly `cdcBucketPaths(state, batchId)` — the live
    * set this GC preserves — so versions superseded only by the
    * just-written v=batchId survive one more batch (the replay margin)
    * and are collected on the next merge. Steady state is therefore
    * bounded at ≤ cdcStateBuckets + 2 version dirs regardless of how many
    * micro-batches have run — the listing in cdcBucketVersions stays
    * O(buckets), not O(history). Returns the deleted version ids.
    */
  private[graft] def gcCdcVersions(state: String, batchId: Long): Seq[Long] = {
    val root = new java.io.File(state)
    val live = cdcBucketVersions(state, batchId).values.toSet
    // the newest _offsets carrier below batchId is the committed
    // position — it survives GC even when bucketless (an empty-batch
    // txn publication), else the position would roll back to an older
    // version's stale _offsets
    val offsetsCarrier = graft.Scratch.listPartitionDirs(root.getPath, "v=")
      .filter(f => new java.io.File(f, "_offsets").exists())
      .map(_.getName.drop(2).toLong).filter(_ < batchId)
      .sorted.lastOption
    val dead = graft.Scratch.listPartitionDirs(root.getPath, "v=")
      .map(_.getName.drop(2).toLong)
      .filter(v => v < batchId && !live.contains(v) &&
        !offsetsCarrier.contains(v)).sorted.toSeq
    dead.foreach { v =>
      graft.Scratch.deleteRecursively(new java.io.File(root, s"v=$v"))
    }
    dead
  }

  /** Merge one typed change batch into the bucketed state (unit-tested
    * directly in StreamSemanticsSpec for the incremental + replay
    * properties). `typed` columns: o_orderkey, o_totalprice, es, ts, type.
    *
    * REWRITE-AMPLIFICATION BOUND (the LSM-style merge cost, stated
    * explicitly): each micro-batch rewrites the FULL contents of every
    * touched bucket — O(|state| / buckets) rows per touched bucket per
    * batch, so a batch touching t buckets writes O(t · |state|/buckets)
    * + O(batch) rows regardless of how small the batch is. Untouched
    * buckets are never rewritten (asserted in StateMaintenanceSpec), and
    * the bucket count is the operational knob: size it so |state|/buckets
    * matches the tolerable per-batch write (at 100 TB state, thousands
    * of buckets — the merge is per-bucket parallel). Version GC keeps
    * disk metadata O(buckets): ≤ cdcStateBuckets + 2 version dirs in
    * steady state regardless of batch history (loop-asserted in
    * StateMaintenanceSpec).
    */
  private[graft] def mergeCdcTyped(typed: DataFrame, batchId: Long,
      state: String,
      cols: Seq[String] = Seq("o_orderkey", "o_totalprice", "es", "ts",
        "type")): Set[Int] =
    mergeCdcTypedTxn(typed, batchId, state, None, cols)

  /** The merge, optionally with EXACTLY-ONCE offset semantics: when
    * `offsets` is given, the consumer's position is written INSIDE the
    * staged version dir and the whole version — state AND position —
    * becomes visible through one atomic rename. There is then no crash
    * window between "state merged" and "position committed" at all:
    * recovery reads the position out of the latest visible version
    * ([[txnCommittedOffsets]]), a crash mid-staging leaves an invisible
    * `.txn_` dir that the replay sweeps away. This is the
    * offsets-in-the-checkpoint pattern (what Structured Streaming's
    * commit log does) expressed on the versioned bucket store.
    */
  private[graft] def mergeCdcTypedTxn(typed0: DataFrame, batchId: Long,
      state: String, offsets: Option[Map[Int, Long]],
      // the state row schema (generalized r15 for stream_mv_maintain,
      // which carries o_custkey through the same store); the default is
      // the original upsert-store contract
      cols: Seq[String] = Seq("o_orderkey", "o_totalprice", "es", "ts",
        "type")): Set[Int] = {
    // the batch is consumed by TWO actions (the touched-bucket probe and
    // the merge write); without a persist each one re-reads the log and
    // re-parses the envelope JSON — at 100 TB that is the difference
    // between reading the micro-batch once and twice per merge
    val typed = typed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val ss = typed.sparkSession
    val withBucket = typed
      .withColumn("bucket", pmod(col("o_orderkey"), lit(cdcStateBuckets)).cast("int"))
    // O(buckets) metadata, not data — bounded by cdcStateBuckets
    val touched = withBucket.select("bucket").distinct().collect()
      .map(_.getInt(0)).toSet
    if (touched.nonEmpty) {
      val prevPaths = cdcBucketPaths(state, batchId)
        .collect { case (b, p) if touched(b) => p }.toSeq
      val prev =
        if (prevPaths.isEmpty) typed.select(cols.map(col): _*).limit(0)
        else ss.read.parquet(prevPaths: _*)
          .select(cols.map(col): _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderkey"))
        .orderBy(col("es").desc, col("ts").desc)
      val merged = prev
        .unionByName(typed.select(cols.map(col): _*))
        .withColumn("bucket", pmod(col("o_orderkey"), lit(cdcStateBuckets)).cast("int"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        // one task → one file per bucket dir: without this the
        // partitionBy write fans out (shuffle partitions × buckets)
        // files, and the commit's per-file staging renames dominate
        // micro-batch latency (measured ~2× on the merge phase)
        .repartition(col("bucket"))
      val target = s"$state/v=$batchId"
      offsets match {
        case None =>
          merged.write.mode("overwrite").partitionBy("bucket").parquet(target)
        case Some(ofs) =>
          // leftovers from a crash mid-staging are invisible to readers
          // (cdcBucketVersions lists only v=*); the replay sweeps them
          val staging = new java.io.File(s"$state/.txn_v=$batchId")
          graft.Scratch.deleteRecursively(staging)
          merged.write.mode("overwrite").partitionBy("bucket")
            .parquet(staging.getPath)
          graft.Scratch.writeDurable(
            staging.toPath.resolve("_offsets"),
            ofs.toSeq.sorted.map { case (p, o) => s"$p $o" }.mkString("\n"))
          graft.Scratch.deleteRecursively(new java.io.File(target)) // idempotent at-least-once replay
          java.nio.file.Files.move(staging.toPath,
            java.nio.file.Paths.get(target),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          graft.Scratch.fsyncDir(java.nio.file.Paths.get(state))
      }
      gcCdcVersions(state, batchId)
      ()
    } else offsets.foreach { ofs =>
      // (empty range, exactly-once position publication below)
      // EMPTY consumed range: the exactly-once position must STILL
      // advance — an empty tail is a legal log state, and skipping the
      // publication would leave the state's committed position stale so
      // a restarted consumer re-reads a range it already processed
      // (degrading to at-least-once). Publish a bucketless version
      // carrying only _offsets through the same atomic rename.
      val target = s"$state/v=$batchId"
      val staging = new java.io.File(s"$state/.txn_v=$batchId")
      graft.Scratch.deleteRecursively(staging)
      staging.mkdirs()
      graft.Scratch.writeDurable(staging.toPath.resolve("_offsets"),
        ofs.toSeq.sorted.map { case (p, o) => s"$p $o" }.mkString("\n"))
      graft.Scratch.deleteRecursively(new java.io.File(target))
      java.nio.file.Files.move(staging.toPath,
        java.nio.file.Paths.get(target),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      graft.Scratch.fsyncDir(java.nio.file.Paths.get(state))
      gcCdcVersions(state, batchId)
      ()
    }
    touched
    } finally { typed.unpersist(false); () }
  }

  /** Recover the consumer position from the latest visible state
    * version — the exactly-once read side: whatever version is visible
    * IS the committed position; there is no separate commit file to
    * disagree with the state.
    */
  private[graft] def txnCommittedOffsets(state: String): Map[Int, Long] = {
    val versions = graft.Scratch.listPartitionDirs(state, "v=")
      .map(_.getName.drop(2).toLong).sorted.reverse
    import scala.jdk.CollectionConverters._
    versions.iterator.map { v =>
      new java.io.File(s"$state/v=$v/_offsets")
    }.collectFirst { case f if f.exists() =>
      java.nio.file.Files.readAllLines(f.toPath).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(p, o) = l.split(' '); p.toInt -> o.toLong
        }.toMap
    }.getOrElse(Map.empty)
  }

  /** Read the merge-on-disk view: latest version of every bucket. */
  private[graft] def readCdcState(s: SparkSession, state: String): DataFrame = {
    val paths = cdcBucketPaths(state, Long.MaxValue).values.toSeq
    // zero versions (empty/DDL-only feed wrote no DML micro-batch) is a
    // legal state — the streamSummingMv rule: an empty typed frame, not
    // an AnalysisException from a zero-path parquet read
    if (paths.isEmpty)
      return s.range(0).select(col("id").as("o_orderkey"),
        lit(0.0).as("o_totalprice"), lit(0L).as("es"), lit(0L).as("ts"),
        lit("").as("type"))
    s.read.parquet(paths: _*)
      .select("o_orderkey", "o_totalprice", "es", "ts", "type")
  }

  /** Streaming aggregate-state MV maintenance (AggregatingMergeTree as a
    * continuously-maintained view): each micro-batch folds its typed
    * changes into per-customer aggregate state — INSERT adds price,
    * UPDATE adds its delta (new − old image), DELETE subtracts — and
    * merges with the prior state by SUMMING, never replaying history.
    * State is O(customers) regardless of how many change events have
    * flowed; versioned `v=<batchId>` dirs give replay-idempotence and
    * version GC exactly like the upsert store. Exact decimal state, so
    * the result equals the batch recompute bit-for-bit (same oracle as
    * cdc_summing_mv).
    */
  /** State version dirs strictly below batchId — the replay-safe read
    * set (a merge must never read its own half-written output).
    */
  private def stateVersionsBelow(state: String, batchId: Long): Array[Long] =
    graft.Scratch.listPartitionDirs(state, "v=")
      .map(_.getName.drop(2).toLong).filter(_ < batchId)

  /** Version GC with a one-version replay margin: keep only the LATEST
    * version in `prevDirs` (plus the version being written, which is
    * never in it). ONE copy of the replay-safety rule — it was
    * duplicated inline per consumer and the copies had already grown a
    * dead `if (prevDirs.isEmpty)` arm (unreachable inside a filter over
    * prevDirs itself).
    */
  private def gcStateVersions(state: String, prevDirs: Array[Long]): Unit =
    if (prevDirs.nonEmpty)
      prevDirs.filter(_ < prevDirs.max).foreach { v =>
        graft.Scratch.deleteRecursively(new java.io.File(state, s"v=$v"))
      }

  /** The versioned replay-margin fold in ONE place (it had grown four
    * inline copies — the gcStateVersions history lesson): read the
    * latest version strictly below `batchId` (empty-shaped `deltas`
    * when none), let `fold` combine prev ∪ deltas, overwrite
    * `v=batchId`, and GC superseded versions with the one-version
    * replay margin. A replayed batch re-reads the same `< batchId`
    * version and rewrites identical content — the at-least-once rule
    * every consumer relies on. `prevMap` re-shapes the stored prev
    * version to the delta schema (the quantile MV explodes its sketch
    * state before re-folding).
    */
  private[graft] def foldVersionedState(deltas: DataFrame, batchId: Long,
      state: String, fold: DataFrame => DataFrame,
      prevMap: DataFrame => DataFrame = identity): Unit = {
    val ss = deltas.sparkSession
    val prevDirs = stateVersionsBelow(state, batchId)
    val prev =
      if (prevDirs.isEmpty) deltas.limit(0)
      else prevMap(ss.read.parquet(s"$state/v=${prevDirs.max}"))
    fold(prev.unionByName(deltas))
      .write.mode("overwrite").parquet(s"$state/v=$batchId")
    gcStateVersions(state, prevDirs)
  }

  private[graft] def mergeSummingState(deltas: DataFrame, batchId: Long,
      state: String): Unit =
    foldVersionedState(deltas, batchId, state,
      _.groupBy(col("o_custkey"))
        .agg(sum(col("spend_state")).as("spend_state"),
          sum(col("orders_state")).as("orders_state")))

  private def streamSummingMv(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val feed = feedDir(s, dir)
    val state = fresh("summing_state")
    // per-row paired old image (typeMapOrders' old_img): element_at(old,
    // 1) corrupted rows 2+ of a multi-row UPDATE envelope
    val oldPrice = element_at(col("old_img"), "o_totalprice")
      .cast("double")
    val q = s.readStream.schema(Cdc.envelopeSchema).json(feed)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t = Cdc.typeMapOrders(batch)
        val contrib = when(col("type") === "INSERT", col("o_totalprice"))
          .when(col("type") === "UPDATE", col("o_totalprice") - oldPrice)
          .otherwise(-col("o_totalprice"))
        val deltas = t.groupBy(col("o_custkey"))
          .agg(sum(contrib.cast(org.apache.spark.sql.types.DecimalType(30, 6)))
            .as("spend_state"),
            sum(when(col("type") === "INSERT", 1L)
              .when(col("type") === "DELETE", -1L).otherwise(0L))
              .as("orders_state"))
        mergeSummingState(deltas, batchId, state)
      }
      .option("checkpointLocation", fresh("summing_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    awaitBounded(q)
    val versions = graft.Scratch.listPartitionDirs(state, "v=")
      .map(_.getName.drop(2).toLong)
    // zero micro-batches (an empty feed is a legal fixture state):
    // an empty MV, not UnsupportedOperationException: empty.max
    if (versions.isEmpty)
      return s.range(0).select(col("id").as("o_custkey"),
        lit(0.0).as("live_spend"), lit(0L).as("live_orders"))
    s.read.parquet(s"$state/v=${versions.max}")
      .select(col("o_custkey"),
        col("spend_state").cast("double").as("live_spend"),
        col("orders_state").cast("bigint").as("live_orders"))
      .orderBy(col("o_custkey"))
  }

  private def streamCdcUpsert(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val feed = feedDir(s, dir)
    val state = fresh("cdc_state")
    val q = s.readStream.schema(Cdc.envelopeSchema).json(feed)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeCdcTyped(
          Cdc.typeMapOrders(batch)
            .select(col("o_orderkey"), col("o_totalprice"), col("es"),
              col("ts"), col("type")),
          batchId, state)
        ()
      }
      .option("checkpointLocation", fresh("cdc_upsert_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    awaitBounded(q)
    readCdcState(s, state)
      .filter(col("type") =!= "DELETE")
      .select(col("o_orderkey"), col("o_totalprice"), col("es").as("version_es"))
      .orderBy(col("o_orderkey"))
  }

  /** STREAMING MV MAINTENANCE (r14 — VERDICT r13 task 5, ClickHouse's
    * actual MV trigger point): the foreachBatch CDC merge that maintains
    * the BASE table also folds each micro-batch's SIGNED delta into the
    * registered aggregate MV and re-registers it against the new base
    * version — so a routed dashboard query stays served from O(groups)
    * partials at every epoch, with zero window where routing could read
    * stale state (each registration carries the new base's build-time
    * fingerprint; the sentinel unroutes anything else).
    *
    * Two-epoch protocol (deterministic batch boundaries — one stream
    * RUN per epoch, the checkpoint resumes): epoch 1 delivers the
    * INSERT snapshot; epoch 2 the UPDATE/DELETE tail. Per micro-batch
    * the work is [[mvMaintainBatch]] (r15 rebase): a BUCKETED
    * tombstone merge (mergeCdcTyped carrying o_custkey), a per-touched-
    * bucket live publish into the stable `smm_base/bucket=N` layout
    * (untouched buckets' files byte-identical across the batch —
    * StateMaintenanceSpec asserts it), the signed O(groups+δ) MV fold,
    * and re-registration fingerprinted from the new base listing.
    * After each epoch a PLAIN aggregate over the published base is
    * probed: a require proves it scanned `smm_mv` and not `smm_base`
    * (the snap discipline), and the values — epoch 1 = the insert
    * snapshot, epoch 2 = the fully-applied live set — hash against the
    * DuckDB oracle. History never replays: each epoch shuffles only its
    * deltas plus O(touched-buckets) state rows.
    *
    * Scale notes: this is the freshness story mvRouteStale's
    * invalidate-then-refresh lacks for streams — the O(δ) fold rides
    * the SAME micro-batch that changed the base, so the MV is never
    * stale and never rebuilt; per-batch base I/O is O(touched ·
    * |state|/buckets + δ) (the stream_cdc_upsert rewrite-amplification
    * bound, bucket count the knob), and the probe's routed scan is
    * O(groups) regardless of stream length.
    */
  /** One micro-batch of streaming MV maintenance (r15 rebase — VERDICT
    * r14 task 2): the O(state)-per-batch publish is gone. Per batch:
    *   1. BUCKETED tombstone merge via [[mergeCdcTypedTxn]] (carrying
    *      o_custkey through the store): only the buckets this batch's
    *      keys hash to are re-read and rewritten — O(touched ·
    *      |state|/buckets + δ), the stream_cdc_upsert cost class.
    *   2. live-rows publish PER TOUCHED BUCKET: the merged state of
    *      exactly those buckets, tombstones dropped, written into the
    *      STABLE `baseDir/bucket=N` layout through a dynamic-partition
    *      overwrite — untouched buckets' files are never opened or
    *      replaced (byte-identical across the batch, spec-asserted).
    *   3. the signed O(groups+δ) MV fold (unchanged algebra): INSERT
    *      +price/+1, UPDATE +(new−old)/0, DELETE −price/−1, folded into
    *      the prior MV version, groups at 0 live orders dropped.
    *   4. re-registration of baseDir → the new MV version, fingerprinted
    *      from baseDir's CURRENT O(buckets) listing — the registry is
    *      the batch's last write, so a routed probe is never stale.
    * Replay-safe end to end: the merge reads versions < batchId only,
    * the live publish is recomputed from that same merged state
    * (content-idempotent dynamic overwrite), and the MV fold reads MV
    * versions < batchId — an at-least-once re-execution rewrites
    * identical content and re-registers the same mapping.
    * Driven directly (no stream) by StateMaintenanceSpec's crash/
    * byte-identity tests and by streamMvMaintain's foreachBatch.
    */
  private[graft] def mvMaintainBatch(batch: DataFrame, batchId: Long,
      stateDir: String, baseDir: String, mvDir: String): Unit = {
    import graft.plans.MvRouting
    val ss = batch.sparkSession
    val t = graft.operators.Cdc.typeMapOrders(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 1. bucketed merge (es, ts desc — stream_cdc_upsert's rule),
      // tombstones kept in the versioned bucket store
      val typed = t.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("es"), col("ts"), col("type"))
      val touched = mergeCdcTyped(typed, batchId, stateDir,
        cols = Seq("o_orderkey", "o_custkey", "o_totalprice", "es", "ts",
          "type"))
      // 2. per-bucket live publish: read ONLY the touched buckets'
      // merged state (including the version just written) and replace
      // exactly those bucket dirs under the stable base root
      if (touched.nonEmpty) {
        val paths = cdcBucketPaths(stateDir, batchId + 1)
          .collect { case (b, p) if touched(b) => p }.toSeq
        ss.read.parquet(paths: _*)
          .filter(col("type") =!= "DELETE")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .withColumn("bucket",
            pmod(col("o_orderkey"), lit(cdcStateBuckets)).cast("int"))
          // one task → one file per touched bucket: the publish is
          // O(touched · |state|/buckets) rows, and the dynamic
          // overwrite's per-file staging commit is the cost driver at
          // micro-batch cadence
          .repartition(col("bucket"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket").parquet(baseDir)
      }
      // 3. the signed MV delta (streamSummingMv's exact algebra)
      val oldPrice = element_at(col("old_img"), "o_totalprice")
        .cast("double")
      val contrib = when(col("type") === "INSERT", col("o_totalprice"))
        .when(col("type") === "UPDATE", col("o_totalprice") - oldPrice)
        .otherwise(-col("o_totalprice"))
      val deltas = t.groupBy(col("o_custkey"))
        .agg(sum(contrib.cast(org.apache.spark.sql.types
            .DecimalType(30, 6))).cast(org.apache.spark.sql.types
            .DecimalType(38, 6)).as("spend_state"),
          sum(when(col("type") === "INSERT", 1L)
            .when(col("type") === "DELETE", -1L).otherwise(0L))
            .as("n_live"))
      val mvV = s"$mvDir/v=$batchId"
      foldVersionedState(deltas, batchId, mvDir,
        _.groupBy(col("o_custkey"))
          .agg(sum(col("spend_state")).cast(org.apache.spark.sql.types
              .DecimalType(38, 6)).as("spend_state"),
            sum(col("n_live")).as("n_live"))
          .filter(col("n_live") > 0))
      // 4. re-register the STABLE base root against the new MV version,
      // fingerprinted from the files just published — the routing
      // registry is the micro-batch's last write, so there is no stale
      // window at all (same-name registration replaces atomically)
      if (new java.io.File(baseDir).exists())
        MvRouting.register(MvRouting.MvDef(
          basePath = baseDir, mvPath = mvV, groupCols = Set("o_custkey"),
          sumMap = Map("o_totalprice" -> "spend_state"),
          countCol = "n_live",
          baseFingerprint = Some(graft.plans.PathRegistry.fileFingerprint(
            ss.read.parquet(baseDir).inputFiles.toSeq))),
          countRows = false) // single-def base — the cost hint is unused
    } finally { t.unpersist(false); () }
  }

  /** STREAMING SCAN-INDEX MAINTENANCE (r15 — VERDICT r14 task 4): the
    * ingest path that keeps token probes INDEX-SERVED across epochs.
    * Each micro-batch of arriving documents is appended as new parquet
    * files, the durable `_TEXTIDX` manifest is folded forward by
    * [[graft.operators.Scans.appendTextIndex]] — O(new files) only, the
    * scan_text_index_append algebra riding the CDC batch instead of a
    * manual refresh — and the routing def is re-registered from the
    * fresh manifest, so a plain `has_token`-shaped filter keeps pruning
    * at every epoch with no window where a new file is missing from the
    * index (a file present but unindexed would merely be admitted —
    * sound — but the per-batch fold keeps pruning from decaying at
    * all).
    *
    * The feed salts rare marker tokens into a ~30-word corpus whose
    * base vocabulary lands in every file (TESTDATA note): epoch 1
    * delivers even doc_ids (every 7th carries ` alpha7`), epoch 2 odd
    * doc_ids (every 7th carries ` omega9`). Each batch lands as ONE
    * file, so after epoch 2 the probes PROVE maintenance: `alpha7`
    * admits only the epoch-1 file (1 of 2 — require-proven via the
    * pruned scan's inputFiles), `omega9` only the epoch-2 file, `zzz9`
    * nothing (zero files opened). Counts and doc_id checksums hash
    * against the DuckDB oracle's recomputation from the documents
    * table.
    *
    * Scale notes: the log-ingest table this models appends files
    * continuously; per-batch index cost is O(batch files × blooms) and
    * probe cost stays O(admitted files) forever — without the fold,
    * pruning decays monotonically as unindexed files accumulate.
    */
  private def streamIndexMaintain(s0: SparkSession, dir: String)
      : DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val s = stateSized(s0)
    val root0 = fresh("stream_idx")
    val feed = s"$root0/feed"
    new java.io.File(feed).mkdirs()
    val table = s"$root0/sidx_docs" // greppable in plan text
    val salted = graft.Tables.documents(s0, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"),
            when(col("doc_id") % 2 === 0, lit(" alpha7"))
              .otherwise(lit(" omega9"))))
          .otherwise(col("text")).as("text"))
    def publishEpoch(parity: Int): Unit =
      salted.filter(col("doc_id") % 2 === parity)
        .select(to_json(struct(col("doc_id"), col("text"))).as("value"))
        .coalesce(1).write.mode("append").text(feed)

    def runEpoch(): Unit = {
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType)))
      val q = s.readStream.schema(schema).json(feed)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val ss = batch.sparkSession
          // 1. the batch's documents land as ONE new file (the ingest
          // append — idempotent enough for AvailableNow's exactly-once
          // file-source semantics; a crashed batch re-runs whole)
          batch.select(col("doc_id"), col("text"))
            .coalesce(1).write.mode("append").parquet(table)
          // 2. O(new files) index fold: only files absent from the
          // manifest are read and bloomed
          val n = graft.operators.Scans.appendTextIndex(ss, table)
          require(n >= 1, "batch appended a file the index fold missed")
          // 3. re-registration from the fresh manifest — the routing
          // def is the batch's last write (the mvMaintainBatch rule)
          graft.plans.TextIndexRouting.register(
            graft.plans.TextIndexRouting.TextIndexDef(table, "text",
              graft.operators.Scans.TextIndexBits,
              graft.operators.Scans.parseIndex(table)))
          ()
        }
        .option("checkpointLocation", s"$root0/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      awaitBounded(q)
    }

    graft.plans.TextIndexRouting.enable(s)
    // eager routed probe: the PLAIN token-filter spelling; requires
    // prove the index served it — admitted strictly fewer files than
    // the table holds (or zero for an absent token)
    def probe(epoch: String, tok: String, admitted: Int): Seq[Row] = {
      val total = s.read.parquet(table).inputFiles.length
      val filtered = s.read.parquet(table)
        .filter(array_contains(split(col("text"), " "), tok))
      // admitted-file count read off the UN-aggregated filter plan (no
      // exchange → no AQE wrapper hiding the scan node)
      val files = filtered.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.relation.location.inputFiles.length).sum
      require(files == admitted && admitted < total,
        s"$epoch/$tok must admit $admitted of $total files, opened $files")
      filtered
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_matched"),
          coalesce(sum(col("doc_id")), lit(0L)).as("sum_doc_id"))
        .collect().toIndexedSeq
        .map(r => Row(epoch, tok, r.getLong(0), r.getLong(1)))
    }
    try {
      publishEpoch(0)
      runEpoch()
      // epoch 1: one file total; the absent marker opens NOTHING
      val e1 = probe("epoch1", "omega9", 0)
      publishEpoch(1)
      runEpoch()
      // epoch 2: two files; each marker admits exactly its epoch's file
      val e2 = probe("epoch2", "alpha7", 1) ++
        probe("epoch2", "omega9", 1) ++ probe("epoch2", "zzz9", 0)
      val schema = StructType(Seq(
        StructField("epoch", StringType), StructField("tok", StringType),
        StructField("n_matched", LongType),
        StructField("sum_doc_id", LongType)))
      s.createDataFrame(
        s.sparkContext.parallelize((e1 ++ e2).toList, 1), schema)
        .orderBy(col("epoch"), col("tok"))
    } finally {
      // nanoTime-fresh table root per invocation: drop the registration
      // or the JVM-global registry grows one entry per bench rep (the
      // scanTextIndexAppend sweep rule)
      graft.plans.TextIndexRouting.invalidate(table)
    }
  }

  private def streamMvMaintain(s0: SparkSession, dir: String): DataFrame = {
    import graft.plans.MvRouting
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
    val s = stateSized(s0)
    val root = fresh("stream_mv")
    val feed = s"$root/feed"
    new java.io.File(feed).mkdirs()
    val stateDir = s"$root/merge_state" // tombstone-bearing merge state
    val baseDir = s"$root/smm_base"     // live-rows base, versioned
    val mvDir = s"$root/smm_mv"         // folded MV, versioned
    // epoch feeds re-serialized from the parsed envelopes (the
    // offsetLogDir to_json discipline): epoch 1 = the INSERT snapshot
    val recs = graft.operators.Cdc.parsed(s0, dir)
      .filter(col("table") === "orders" && !col("isDdl"))
      .withColumn("value", to_json(struct(col("id"), col("database"),
        col("table"), col("pkNames"), col("isDdl"), col("type"),
        col("es"), col("ts"), col("sql"), col("mysqlType"), col("data"),
        col("old"))))
    recs.filter(col("type") === "INSERT").select("value")
      .coalesce(1).write.mode("append").text(feed)

    def applyBatch(batch: DataFrame, batchId: Long): Unit =
      mvMaintainBatch(batch, batchId, stateDir, baseDir, mvDir)

    def runEpoch(): Unit = {
      val q = s.readStream.schema(graft.operators.Cdc.envelopeSchema)
        .json(feed)
        .writeStream
        .foreachBatch(applyBatch _)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      awaitBounded(q)
    }

    MvRouting.enable(s)
    // routed probe over the CURRENT base version: plan-asserted to read
    // the MV (the mvRouteStale snap discipline), values snapshotted
    // eagerly — O(customers) driver rows
    def probe(epoch: String): Seq[Row] = {
      require(new java.io.File(baseDir).exists(),
        s"$epoch: no base published")
      val df = s.read.parquet(baseDir)
        .groupBy(col("o_custkey"))
        .agg(graft.Det.dsum(col("o_totalprice")).as("spend"),
          count(lit(1)).as("n_orders"))
      val p = df.queryExecution.executedPlan.toString
      require(p.contains("smm_mv") && !p.contains("smm_base"),
        s"$epoch probe must be served from the maintained MV, " +
          s"not the base:\n${p.take(500)}")
      df.collect().toIndexedSeq
        .map(r => Row(epoch, r.getLong(0), r.getDouble(1), r.getLong(2)))
    }

    try {
      runEpoch()
      val e1 = probe("epoch1")
      // epoch 2: the UPDATE/DELETE tail lands as new feed files; the
      // resumed stream processes ONLY them (checkpointed position)
      recs.filter(col("type") =!= "INSERT").select("value")
        .coalesce(1).write.mode("append").text(feed)
      runEpoch()
      val e2 = probe("epoch2")
      val schema = StructType(Seq(
        StructField("probe", StringType),
        StructField("o_custkey", LongType),
        StructField("spend", DoubleType),
        StructField("n_orders", LongType)))
      s.createDataFrame(
        s.sparkContext.parallelize((e1 ++ e2).toList, 1), schema)
        .orderBy(col("probe"), col("o_custkey"))
    } finally {
      // the base path is nanoTime-fresh per invocation: without this
      // the JVM-global registry grows one entry per bench rep forever
      // (the scanTextIndexAppend sweep rule)
      MvRouting.invalidate(baseDir)
    }
  }

  /** One micro-batch of streaming JOIN-VIEW maintenance (r15 — closing
    * the loop for V = γ(fact ⋈ dim) the way [[mvMaintainBatch]] closed
    * it for the single-table MV): the ingest stream appends fact rows
    * while a registered join view serves γ(fact ⋈ dim) probes
    * join-free, so every batch must land the rows AND fold
    * ΔV = γ(Δbatch ⋈ dim) — mv_join_incremental's insert term, the
    * same delta mvRefreshJoinView folds for out-of-band appends, here
    * riding the micro-batch itself so the view is never stale. Steps:
    *   1. the batch's rows land under `factDir/batch=<id>` via an
    *      OVERWRITE of that one partition dir — an at-least-once
    *      replay rewrites identical content instead of duplicating
    *      rows (the reason a bare append-mode write would break the
    *      V = γ(fact ⋈ dim) equation on replay).
    *   2. ΔV joins ONLY the in-flight batch rows against the dim —
    *      the standing fact history is never re-joined or re-read.
    *   3. the versioned fold: MV versions < batchId union ΔV,
    *      re-aggregated into `v=batchId` (sum/count/min — all monoids
    *      under insert-only deltas), GC with the one-version replay
    *      margin. A replayed batch re-reads the same `< batchId`
    *      version and overwrites `v=batchId` with identical content.
    *   4. re-registration of the joinSpec def against the CURRENT fact
    *      listing (the dim fingerprint rides along unchanged) — the
    *      registry is the batch's last write, so a routed probe is
    *      never stale and a torn batch merely unroutes (fingerprint
    *      mismatch → the probe falls back to the real join, correct
    *      values either way).
    * Driven directly (no stream) by StateMaintenanceSpec's replay test
    * and by [[streamJoinViewMaintain]]'s foreachBatch.
    *
    * Scale notes: per-batch cost is O(Δbatch ⋈ dim) + O(groups) — the
    * arrivals-times-dim join every streaming ingest already pays —
    * and the probe's routed scan stays O(groups) regardless of stream
    * length; the 100 TB fact history participates in neither.
    */
  private[graft] def joinViewMaintainBatch(batch: DataFrame,
      batchId: Long, factDir: String, dimPath: String, mvDir: String,
      dimFp: Option[(Long, Long)]): Unit = {
    import graft.plans.MvRouting
    import org.apache.spark.sql.types.DecimalType
    val ss = batch.sparkSession
    val rows = batch.select(col("l_suppkey"), col("l_extendedprice"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 1. content-idempotent landing of this batch's fact rows
      rows.coalesce(1).write.mode("overwrite")
        .parquet(s"$factDir/batch=$batchId")
      // 2. ΔV = γ(Δbatch ⋈ dim) — batch rows only, never the history
      def partials(df: DataFrame): DataFrame = df
        .join(ss.read.parquet(dimPath)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(30, 6)))
            .cast(DecimalType(38, 6)).as("sum_price_state"),
          count(lit(1)).as("n_rows"),
          min(col("l_extendedprice")).as("min_price_state"))
      val dV = partials(rows)
      // 3. versioned fold with the replay margin
      foldVersionedState(dV, batchId, mvDir,
        _.groupBy(col("s_nationkey"))
          .agg(sum(col("sum_price_state")).cast(DecimalType(38, 6))
              .as("sum_price_state"),
            sum(col("n_rows")).as("n_rows"),
            min(col("min_price_state")).as("min_price_state")))
      // 4. the registry is the batch's last write
      MvRouting.register(MvRouting.MvDef(
        basePath = factDir, mvPath = s"$mvDir/v=$batchId",
        groupCols = Set("s_nationkey"),
        sumMap = Map("l_extendedprice" -> "sum_price_state"),
        countCol = "n_rows",
        minMap = Map("l_extendedprice" -> "min_price_state"),
        baseFingerprint = Some(graft.plans.PathRegistry.fileFingerprint(
          ss.read.parquet(factDir).inputFiles.toSeq)),
        name = "sjv_view",
        joinSpecs = Seq(MvRouting.JoinViewSpec(
          dimPath = dimPath, factKeys = Seq("l_suppkey"),
          dimKeys = Seq("s_suppkey"), dimCols = Set("s_nationkey"),
          dimFingerprint = dimFp))),
        countRows = false) // per-batch throwaway version — no cost tax
    } finally { rows.unpersist(false); () }
  }

  /** STREAMING JOIN-VIEW MAINTENANCE (r15): the ingest stream keeps a
    * γ(fact ⋈ dim) join view fresh per micro-batch — each batch lands
    * its fact rows, folds ΔV = γ(Δbatch ⋈ dim) via
    * [[joinViewMaintainBatch]], and re-registers, so an
    * Aggregate-over-Join probe is served JOIN-FREE from the view at
    * every epoch (plan-required: the view scanned, the fact dir not,
    * no Join node in the routed plan). Two epochs of lineitem arrivals
    * (the mod-3 split mvRefreshJoinView uses); after each, the probe's
    * values hash against DuckDB recomputing the join-aggregate over
    * exactly the rows delivered so far. This is the ClickHouse
    * MV-over-JOIN insert semantics with the CORRECT delta term (new
    * rows joined against the whole dim), riding Structured Streaming's
    * foreachBatch with versioned replay-safe folds.
    */
  private def streamJoinViewMaintain(s0: SparkSession, dir: String)
      : DataFrame = {
    import graft.plans.MvRouting
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}
    val s = stateSized(s0)
    val root = fresh("stream_jv")
    val feed = s"$root/feed"
    new java.io.File(feed).mkdirs()
    val factDir = s"$root/sjv_fact_t" // greppable in plan text
    val mvDir = s"$root/sjv_mv"
    val dimPath = s"$dir/supplier.parquet"
    val dimFp = scala.util.Try(graft.plans.PathRegistry.fileFingerprint(
      graft.Tables.supplier(s0, dir).inputFiles.toSeq)).toOption
    def publishEpoch(m: Int): Unit =
      graft.Tables.lineitem(s0, dir).filter(col("l_orderkey") % 3 === m)
        .select(to_json(struct(col("l_suppkey"), col("l_extendedprice")))
          .as("value"))
        .coalesce(1).write.mode("append").text(feed)
    def runEpoch(): Unit = {
      val schema = StructType(Seq(
        StructField("l_suppkey", LongType),
        StructField("l_extendedprice", DoubleType)))
      val q = s.readStream.schema(schema).json(feed)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          joinViewMaintainBatch(batch, batchId, factDir, dimPath, mvDir,
            dimFp)
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      awaitBounded(q)
    }
    MvRouting.enable(s)
    def probe(epoch: String): Seq[Row] = {
      val df = s.read.parquet(factDir)
        .join(graft.Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(graft.Det.dsum(col("l_extendedprice")).as("sum_price"),
          min(col("l_extendedprice")).as("min_price"),
          count(lit(1)).as("n"))
      val p = df.queryExecution.executedPlan.toString
      require(p.contains("sjv_mv") && !p.contains("sjv_fact_t"),
        s"$epoch probe must be served from the maintained join view, " +
          s"not the fact:\n${p.take(500)}")
      require(!p.contains("Join"),
        s"$epoch routed probe must be join-free:\n${p.take(400)}")
      df.collect().toIndexedSeq.map(r => Row(epoch, r.getInt(0),
        r.getDouble(1), r.getDouble(2), r.getLong(3)))
    }
    try {
      publishEpoch(0)
      runEpoch()
      val e1 = probe("epoch1")
      publishEpoch(1)
      runEpoch()
      val e2 = probe("epoch2")
      val schema = StructType(Seq(
        StructField("probe", StringType),
        StructField("s_nationkey", IntegerType),
        StructField("sum_price", DoubleType),
        StructField("min_price", DoubleType),
        StructField("n", LongType)))
      s.createDataFrame(
        s.sparkContext.parallelize((e1 ++ e2).toList, 1), schema)
        .orderBy(col("probe"), col("s_nationkey"))
    } finally {
      // nanoTime-fresh fact root per invocation — drop the
      // registration or the JVM-global registry grows per bench rep
      MvRouting.invalidate(factDir)
    }
  }

  /** The CDC feed as a partitioned OFFSET LOG ([[OffsetLog]]), staged
    * once per (JVM, sfDir): epoch 0 = the INSERT snapshot, epoch 1 = the
    * UPDATE/DELETE tail — partition = pk % 4 (the Canal→Kafka pk-hash
    * routing), payload = the raw envelope JSON, per-partition send order
    * by (es, id).
    */
  private[graft] val offsetLogParts = 4
  private[graft] def offsetLogDir(s: SparkSession, dir: String): String = {
    val sf = new java.io.File(dir).getName
    val root = s"${graft.Scratch.streamStageRoot(dir)}/offset_log_$sf"
    // Scratch.staged, NOT an _ENDS guard: the first of the two appends
    // already writes _ENDS, so a crash between them (or two sessions
    // racing) would leave a permanently half-staged log — the marker
    // commits only after BOTH epochs land, under the per-path lock
    graft.Scratch.staged(root) {
      // staged() promises an IDEMPOTENT build, but append-mode writes
      // are not: a crash after epoch 0 committed _ENDS (before the
      // marker) would otherwise replay both appends ON TOP of the
      // committed data, double-assigning offsets — wipe first. The
      // mkdirs keeps the marker writable even if both appends no-op
      // on an empty feed.
      graft.Scratch.deleteRecursively(new java.io.File(root))
      new java.io.File(root).mkdirs()
      val recs = Cdc.parsed(s, dir)
        .filter(col("table") === "orders" && !col("isDdl"))
        .withColumn("pk",
          element_at(element_at(col("data"), 1), "o_orderkey").cast("long"))
        .withColumn("p", pmod(col("pk"), lit(offsetLogParts.toLong)).cast("int"))
        .withColumn("value", to_json(struct(col("id"), col("database"),
          col("table"), col("pkNames"), col("isDdl"), col("type"),
          col("es"), col("ts"), col("sql"), col("mysqlType"), col("data"),
          col("old"))))
      OffsetLog.append(root, 0L,
        recs.filter(col("type") === "INSERT").select(col("p"), col("value"),
          col("es"), col("id")), struct(col("es"), col("id")))
      OffsetLog.append(root, 1L,
        recs.filter(col("type") =!= "INSERT").select(col("p"), col("value"),
          col("es"), col("id")), struct(col("es"), col("id")))
    }
  }

  /** Replayable partitioned-log source with offset semantics (the
    * deployment-shape gap VERDICT r5 named: Canal→Kafka without the
    * Kafka jar): a consumer group processes the log in two sessions —
    * session 1 consumes what existed at snapshot time (the epoch-0
    * high-water mark), merges into the bucketed upsert store, and
    * commits its per-partition offsets; the process then "restarts"
    * (a fresh position read from the durable _COMMIT manifest — nothing
    * carried in memory) and session 2 resumes FROM THE COMMITTED
    * OFFSETS, consuming only the tail. Commit-after-merge gives
    * at-least-once delivery; the merge is idempotent per range
    * (StreamSemanticsSpec kills between merge and commit and proves
    * replay convergence). End state equals the uninterrupted full-feed
    * upsert (stream_cdc_upsert's algebra) and the committed offsets are
    * IN the result row, oracled against the envelope counts.
    *
    * Scale notes: consumption is a distributed scan of segment dirs
    * pruned by the O(epochs × parts) _ENDS index; the position filter
    * is a broadcast of the O(parts) offset map; commit is O(parts)
    * manifest metadata. Nothing driver-side touches record data.
    */
  /** Log records (value = envelope JSON) → the typed change rows the
    * bucketed merge consumes; shared by every offset-log consumer.
    */
  private def logToTyped(recs: DataFrame): DataFrame =
    Cdc.typeMapOrders(recs
        .select(from_json(col("value"), Cdc.envelopeSchema).as("m"))
        .select(col("m.*")))
      .select(col("o_orderkey"), col("o_totalprice"), col("es"),
        col("ts"), col("type"))

  private def srcOffsetLog(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = offsetLogDir(s, dir)
    val state = fresh("offlog_state")
    val group = s"c${nameCtr.incrementAndGet()}_${System.nanoTime()}"
    // session 1: consume up to the high-water mark the consumer saw
    // drop in finally: a failure between the first commit and the drop
    // previously leaked one dead _COMMIT manifest per aborted run into
    // the cross-run staged log root (which must stay immutable)
    val offs =
      try {
        val hwm0 = OffsetLog.endOffsetsAt(root, 0L)
        mergeCdcTyped(logToTyped(
          OffsetLog.read(s, root, OffsetLog.committed(root, group), hwm0)),
          0L, state)
        OffsetLog.commit(root, group, hwm0)
        // process restart: position re-read from the durable commit
        // manifest
        val resumed = OffsetLog.committed(root, group)
        mergeCdcTyped(logToTyped(OffsetLog.read(s, root, resumed)), 1L, state)
        OffsetLog.commit(root, group, OffsetLog.endOffsets(root))
        // the one-shot group's manifest is consumed into a local Seq
        // before the finally deletes it
        OffsetLog.committed(root, group).toSeq
          .map { case (p, o) => (p.toLong, o) }
          .toDF("partition", "committed_offset")
      } finally OffsetLog.dropGroup(root, group)
    readCdcState(s, state)
      .filter(col("type") =!= "DELETE")
      .groupBy(pmod(col("o_orderkey"), lit(offsetLogParts.toLong)).as("partition"))
      .agg(count(lit(1)).as("n_keys"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .join(broadcast(offs), Seq("partition"))
      .select(col("partition"), col("committed_offset"), col("n_keys"),
        col("sum_price"))
      .orderBy(col("partition"))
  }

  /** EXACTLY-ONCE consumption of the offset log: where [[srcOffsetLog]]
    * is commit-after-merge (at-least-once + idempotent replay — two
    * commit points, a crash between them replays), this variant stores
    * the consumer position INSIDE the state version and publishes both
    * through ONE atomic rename ([[mergeCdcTypedTxn]]): the crash window
    * between "state merged" and "offsets committed" does not exist.
    * Recovery reads the position out of the latest visible version —
    * there is no separate commit file to disagree with the state. End
    * state and offsets are identical to the at-least-once variant by
    * construction, so it shares src_offset_log's oracle verbatim.
    */
  private def srcOffsetLogTxn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = offsetLogDir(s, dir)
    val state = fresh("offlog_txn_state")
    // session 1: position from state (empty), consume to the epoch-0
    // high-water mark, state + position land in ONE commit
    val hwm0 = OffsetLog.endOffsetsAt(root, 0L)
    mergeCdcTypedTxn(logToTyped(
      OffsetLog.read(s, root, txnCommittedOffsets(state), hwm0)),
      0L, state, Some(hwm0))
    // process restart: position recovered FROM THE STATE ITSELF
    val resumed = txnCommittedOffsets(state)
    mergeCdcTypedTxn(logToTyped(OffsetLog.read(s, root, resumed)),
      1L, state, Some(OffsetLog.endOffsets(root)))
    val offs = txnCommittedOffsets(state).toSeq
      .map { case (p, o) => (p.toLong, o) }
      .toDF("partition", "committed_offset")
    readCdcState(s, state)
      .filter(col("type") =!= "DELETE")
      .groupBy(pmod(col("o_orderkey"), lit(offsetLogParts.toLong)).as("partition"))
      .agg(count(lit(1)).as("n_keys"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .join(broadcast(offs), Seq("partition"))
      .select(col("partition"), col("committed_offset"), col("n_keys"),
        col("sum_price"))
      .orderBy(col("partition"))
  }

  /** The offset log consumed through its DataSource V2 CONNECTOR
    * (`format("graftlog")`, sources/OffsetLogSource.scala) — the log as
    * a first-class Spark format: segment pruning and resume position
    * are resolved at PLAN time inside the connector from the log's own
    * `_ENDS` index (one task per live segment), not by directory
    * listing. Per-partition record counts and end offsets come back
    * through the connector and are oracled against the envelope script —
    * proving the connector reads exactly the log's contents.
    */
  private def srcOffsetLogDsv2(s: SparkSession, dir: String): DataFrame = {
    val root = offsetLogDir(s, dir)
    s.read.format("graftlog").option("path", root).load()
      .groupBy(col("p").cast("long").as("partition"))
      .agg(count(lit(1)).as("n_records"),
        (max(col("offset")) + 1).as("end_offset"),
        countDistinct(col("offset")).as("n_distinct_offsets"))
      .orderBy(col("partition"))
  }

  /** The log consumed as a CUSTOM STRUCTURED STREAMING SOURCE
    * (`readStream.format("graftlog")` — MicroBatchStream with
    * checkpointed per-partition offsets, the Kafka-connector shape):
    * Trigger.AvailableNow snapshots the high-water mark and drains the
    * log through the usual idempotent bucketed merge; Spark's commit
    * log IS the position of record (exactly-once with the idempotent
    * sink — the source's commit() is deliberately a no-op). End state
    * equals the file-drop streaming upsert, proven by sharing
    * stream_cdc_upsert's oracle verbatim.
    */
  private def streamOffsetLogDsv2(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val root = offsetLogDir(s, dir)
    val state = fresh("offlog_stream_state")
    val q = s.readStream.format("graftlog").option("path", root).load()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeCdcTyped(logToTyped(batch), batchId, state)
        ()
      }
      .option("checkpointLocation", fresh("offlog_stream_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    awaitBounded(q)
    readCdcState(s, state)
      .filter(col("type") =!= "DELETE")
      .select(col("o_orderkey"), col("o_totalprice"), col("es").as("version_es"))
      .orderBy(col("o_orderkey"))
  }

  /** Continuously-maintained PERCENTILE materialized view — the
    * composition `stream_summing_mv` (additive states) cannot express:
    * each micro-batch folds its events into per-event_type quantile
    * sketch states ([[graft.functions.QuantileState]]) and MERGES them
    * with the prior state rows through the same weighted-point
    * Aggregator — ClickHouse's `quantileTDigestState` MV + `-Merge`
    * read, maintained incrementally. State is O(types × δ) centroids
    * regardless of event volume; versioned `v=<batchId>` dirs give
    * replay idempotence like the other streaming stores. Estimates are
    * order-sensitive at the margin (bounded summary) → rows-only;
    * SketchSpec bounds the rank error against the exact percentiles.
    */
  private def streamQuantileMv(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val state = fresh("q_mv_state")
    val delta = 100
    val qagg = udaf(new graft.functions.QuantileState(delta))
    val q = eventsStream(s, dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val deltas = batch
          .select(col("event_type"), col("value").cast("double").as("m"),
            lit(1L).as("w"))
        foldVersionedState(deltas, batchId, state,
          _.groupBy(col("event_type"))
            .agg(qagg(col("m"), col("w")).as("state")),
          prevMap = _.select(col("event_type"),
              explode(col("state")).as("c"))
            .select(col("event_type"), col("c._1").as("m"),
              col("c._2").as("w")))
        ()
      }
      .option("checkpointLocation", fresh("q_mv_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    awaitBounded(q)
    import s.implicits._
    val vs = graft.Scratch.listPartitionDirs(state, "v=")
      .map(_.getName.drop(2).toLong)
    val merged =
      if (vs.isEmpty) Array.empty[(String, Seq[(Double, Long)])]
      else s.read.parquet(s"$state/v=${vs.max}")
        .as[(String, Seq[(Double, Long)])]
        .collect() // O(types × δ) state rows — driver-side by design
    merged.toSeq.map { case (et, st) =>
      val Seq(p50, p90, p99) = graft.functions.QuantileState
        .quantileOf(st, delta, Seq(0.5, 0.9, 0.99))
      (et, st.map(_._2).sum, p50, p90, p99)
    }.toDF("event_type", "n_events", "p50", "p90", "p99")
      .orderBy(col("event_type"))
  }

  /** The evolving-sink micro-batch body (shared verbatim by the
    * stream_ddl_evolve operator and StreamSemanticsSpec's in-run
    * MemoryStream test): the destination schema is re-resolved EVERY
    * batch from the envelope's own mysqlType metadata via
    * [[Cdc.typeMapGeneric]] — no pinned StructType — so a mid-stream
    * ALTER's new column lands in the state the moment post-DDL DML
    * carries it, and pre-DDL state files simply lack the column
    * (null-backfilled by mergeSchema on read). Appending typed parquet
    * + merge-on-read latest-per-key is the ReplacingMergeTree pattern
    * the batch path proves; here it also absorbs schema drift.
    */
  private[graft] def mergeEvolving(batch: DataFrame, state: String): Unit = {
    val dml = batch.filter(col("table") === "orders" && !col("isDdl"))
    if (!dml.isEmpty)
      Cdc.typeMapGeneric(batch, "orders")
        .write.mode("append").parquet(state)
  }

  /** Streaming-side schema evolution (the VERDICT r4 gap: the streaming
    * path pinned a fixed envelope projection, silently dropping a
    * mid-stream ALTER's new column). Two-epoch run: epoch 1 consumes the
    * pre-DDL INSERT script; the ALTER + post-DDL UPDATEs (images and
    * mysqlType now carrying `o_note`) land next, and the SAME checkpoint
    * resumes — the adapter-roll-on-DDL operational pattern. State
    * written before the DDL survives; the new column appears on every
    * post-DDL version and reads as NULL on pre-DDL-only keys.
    *
    * Scale notes: per-batch schema re-resolution is the union-of-
    * declarations aggregate from [[Cdc.typeMapGeneric]] — an O(batch)
    * map-side explode of mysqlType metadata folded to an O(distinct
    * columns) collect (latest-es declaration wins per column; see the
    * DDL-straddling-batch rationale there). The data path stays a
    * narrow cast projection + append, and the merge-on-read window is
    * the same single pk-clustered shuffle as every Replacing read.
    */
  private def streamDdlEvolve(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val root = fresh("ddl_evolve")
    val feed = s"$root/feed"
    val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    def run(): Unit = {
      val q = s.readStream.schema(Cdc.envelopeSchema).json(feed)
        .writeStream
        .foreachBatch((batch: DataFrame, _: Long) =>
          mergeEvolving(batch, state))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      awaitBounded(q)
    }
    Cdc.envelopesPreDdl(s, dir).coalesce(1).write.mode("append").text(feed)
    run()
    Cdc.envelopesPostDdl(s, dir).coalesce(1).write.mode("append").text(feed)
    run()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderkey")).orderBy(col("es").desc)
    s.read.option("mergeSchema", "true").parquet(state)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_note"))
      .orderBy(col("o_orderkey"))
  }

  /** The canonical CDC ONBOARDING shape — batch snapshot bootstrap, then
    * the streaming tail resumes into the same store: the snapshot's
    * INSERT image is published as state version 0 (the batch backfill a
    * new consumer loads), and only the UPDATE/DELETE tail streams
    * through foreachBatch into versions > 0. End state must equal the
    * full-feed streaming upsert — proven by sharing stream_cdc_upsert's
    * oracle. The batch twin is cdc_backfill_merge; this is its streaming
    * composition (snapshot seam + live tail + bucketed state store).
    *
    * Scale notes: the bootstrap is one distributed write of O(keys)
    * state; the tail path rewrites only touched buckets per micro-batch
    * (same store discipline as stream_cdc_upsert, kill-and-recover
    * tested there). No event is processed twice and no history replays.
    */
  private def streamBackfillTail(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val root = fresh("backfill_tail")
    val state = s"$root/state"
    // ordersTyped through s0, not the throwaway clone: Cdc's DfCache is
    // keyed by (session, key), so a fresh clone per rep guaranteed a
    // cache miss and a full envelope re-parse inside the measured path
    // (plus orphaned persisted copies until LRU overflow)
    mergeCdcTyped(
      Cdc.ordersTyped(s0, dir).filter(col("type") === "INSERT")
        .select("o_orderkey", "o_totalprice", "es", "ts", "type"),
      0L, state)
    val feed = backfillTailFeedDir(s0, dir)
    val q = s.readStream.schema(Cdc.envelopeSchema).json(feed)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeCdcTyped(
          Cdc.typeMapOrders(batch)
            .select(col("o_orderkey"), col("o_totalprice"), col("es"),
              col("ts"), col("type")),
          batchId + 1, state)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    awaitBounded(q)
    readCdcState(s, state)
      .filter(col("type") =!= "DELETE")
      .select(col("o_orderkey"), col("o_totalprice"), col("es").as("version_es"))
      .orderBy(col("o_orderkey"))
  }

  /** The adapter's physical fan-out: ONE pass over the mixed-table
    * envelope stream writes every destination table's rows under its own
    * `table=` directory (partitionBy on the routing key) — no per-table
    * re-scan of the feed. Read back per destination for verification.
    */
  private def streamFanoutSink(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val feed = feedDir(s, dir)
    val out = fresh("fanout_sink")
    val q = s.readStream.schema(Cdc.envelopeSchema).json(feed)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.filter(!col("isDdl"))
          .select(col("table"), col("type"), col("es"),
            element_at(col("pkNames"), 1).as("pk_name"),
            explode(col("data")).as("img"))
          .withColumn("pk",
            element_at(col("img"), col("pk_name")).cast("long"))
          .drop("img", "pk_name")
          .write.mode("append").partitionBy("table").parquet(out)
      }
      .option("checkpointLocation", fresh("fanout_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    awaitBounded(q)
    s.read.parquet(out)
      .groupBy(col("table").as("tbl"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("pk")).as("n_keys"),
        max(col("es")).as("max_es"))
      .orderBy(col("tbl"))
  }

  // ---- windowed aggregations ----

  private def streamTumbling(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val agg = eventsStream(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
    runToMemory(s, agg, "complete")
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  private def streamSliding(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val agg = eventsStream(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
    runToMemory(s, agg, "complete")
      .select(col("window.start").as("window_start"), col("n"))
      .orderBy(col("window_start"))
  }

  private def streamSession(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val agg = eventsStream(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    runToMemory(s, agg, "complete")
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Watermarked windowed agg in APPEND mode: only windows finalized below
    * the terminal watermark (max event time − 2h) are emitted — the state
    * eviction contract. Late-data drop semantics are ScalaTest territory
    * (MemoryStream injection); here the driver checks rows>0.
    */
  private def streamWatermark(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    runToMemory(s, agg, "append")
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** At-least-once feed (input unioned with itself = full duplication)
    * → dropDuplicatesWithinWatermark → effectively-once store.
    */
  private def streamDedup(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val e = eventsStream(s, dir)
    val dup = e.unionByName(e) // simulated replay of the whole feed
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    runToMemory(s, dup, "append")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Arbitrary stateful processing: per-user running (count, exact decimal
    * sum) via flatMapGroupsWithState. Values are scaled to 6dp decimals in
    * state so the fold is order-independent and equals the oracle's
    * DECIMAL(30,6) sum exactly.
    */
  private def streamStateful(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    import s.implicits._
    val ds: Dataset[Ev] =
      eventsStreamUs(s, eventsDir(dir), dir)
        .select(col("event_id"), col("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .as[Ev]
    val updated = ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserStat](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(0L, java.math.BigDecimal.ZERO))
          var n = prev.n
          var sum = prev.sum
          rows.foreach { e =>
            n += 1
            sum = sum.add(new java.math.BigDecimal(e.value)
              .setScale(6, java.math.RoundingMode.HALF_UP))
          }
          state.update(UserAgg(n, sum))
          Iterator(UserStat(uid, n, sum.doubleValue))
      }
    // n is monotone per user, so the final state is the max-n emission.
    runToMemory(s, updated.toDF(), "update")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max_by(col("sum_value"), col("n_events")).as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** Same per-user running aggregate on the Spark 4.x transformWithState
    * API (typed ValueState, RocksDB state store) — the successor to
    * flatMapGroupsWithState; both are kept since SURVEY.md §2.10 names
    * transformWithState with fMGWS as the fallback.
    */
  private class UserAggProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserStat] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserAgg] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[UserAgg]("agg",
        org.apache.spark.sql.Encoders.product[UserAgg],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStat] = {
      val prev = Option(state.get()).getOrElse(UserAgg(0L, java.math.BigDecimal.ZERO))
      var n = prev.n
      var sum = prev.sum
      rows.foreach { e =>
        n += 1
        sum = sum.add(new java.math.BigDecimal(e.value)
          .setScale(6, java.math.RoundingMode.HALF_UP))
      }
      state.update(UserAgg(n, sum))
      Iterator(UserStat(uid, n, sum.doubleValue))
    }
  }

  private def streamStatefulTws(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    import s.implicits._
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ds: Dataset[Ev] =
      eventsStreamUs(s, eventsDir(dir), dir)
        .select(col("event_id"), col("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .as[Ev]
    val updated = ds.groupByKey(_.user_id)
      .transformWithState(new UserAggProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
    val out = runToMemory(s, updated.toDF(), "update")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max_by(col("sum_value"), col("n_events")).as("sum_value"))
      .orderBy(col("user_id"))
    // no conf restore needed: s is a stateSized() clone that dies with
    // this call; the returned frame reads a memory table, not the store
    out
  }

  case class EvT(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
  case class SessAgg(startUs: Long, endUs: Long, n: Long)
  case class SessOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Event-time TIMERS on the transformWithState API: sessionization
    * where the CLOSE of the trailing session is driven by a registered
    * timer firing when the watermark passes sessionEnd + 30 min — the
    * mechanism a production processor uses to emit "this session is
    * over" without waiting for the user's next event. Sessions closed by
    * a later event emit inline; only the open tail holds state + one
    * timer. Stale timers (session extended or already closed) are
    * detected by expiry mismatch and ignored. The far-future sentinel
    * advances the watermark past every real timer before the finite feed
    * ends (the never-ending-stream stand-in, as in stream_outer_join).
    * Oracle: identical to batch sessionization — timer-driven closing
    * must change WHEN sessions emit, never WHAT they contain.
    */
  private[graft] class SessionTimerProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvT, SessOut] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[SessAgg] = _
    private val gapMs = 30L * 60 * 1000
    private def tUs(t: java.sql.Timestamp): Long =
      (t.getTime / 1000) * 1000000L + t.getNanos / 1000
    // round the µs deadline UP to the next ms: floor(endUs/1000)+gapMs
    // could fire up to 0.999 ms before the inclusive merge window
    // (t - endUs <= gap) has elapsed, closing a session an in-gap event
    // would still extend — splitting one oracle session into two
    private def expiryOf(a: SessAgg): Long =
      (a.endUs + gapMs * 1000) / 1000 + 1
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[SessAgg]("sess",
        org.apache.spark.sql.Encoders.product[SessAgg],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[EvT],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[SessOut] = {
      val evs = rows.toArray.sortBy(e => (tUs(e.ts), e.event_id))
      var out = List.empty[SessOut]
      var open = Option(st.get())
      val priorExpiry = open.map(expiryOf)
      evs.foreach { e =>
        val t = tUs(e.ts)
        open match {
          case Some(a) if t - a.endUs <= gapMs * 1000 =>
            open = Some(SessAgg(a.startUs, math.max(a.endUs, t), a.n + 1))
          case Some(a) => // closed inline by a later event
            out ::= SessOut(uid, a.startUs, a.endUs, a.n)
            open = Some(SessAgg(t, t, 1))
          case None =>
            open = Some(SessAgg(t, t, 1))
        }
      }
      open.foreach { a =>
        st.update(a)
        val exp = expiryOf(a)
        // drop the superseded timer: without this a k-event open
        // session holds k live timers in the store (stale ones were
        // ignored via expiry mismatch, but each cost a column-family
        // entry and a wasted handleExpiredTimer call)
        priorExpiry.filter(_ != exp).foreach(getHandle.deleteTimer)
        getHandle.registerTimer(exp)
      }
      out.reverseIterator
    }
    override def handleExpiredTimer(uid: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessOut] =
      Option(st.get()) match {
        case Some(a) if expiryOf(a) == info.getExpiryTimeInMs() =>
          st.clear()
          Iterator.single(SessOut(uid, a.startUs, a.endUs, a.n))
        case _ => Iterator.empty
      }
  }

  private def streamTwsTimers(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    import s.implicits._
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ds = eventsStreamUs(s, outerEventsDir(s, dir), dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
      .select(col("event_id"), col("user_id"), col("ts"))
      .as[EvT]
    val sessions = ds.groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
    val byStart = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("start_us"))
    val out = runToMemory(s, sessions.toDF(), "append")
      .filter(col("user_id") >= 0) // drop the sentinel's session
      .withColumn("session_idx", row_number().over(byStart).cast("long"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"))
      .orderBy(col("user_id"), col("session_idx"))
    // no conf restore needed: s is a stateSized() clone that dies with
    // this call; the returned frame reads a memory table, not the store
    out
  }

  /** Streaming SCD-2 maintenance: the history table is APPEND-ONLY —
    * each micro-batch lands its typed INSERT/UPDATE rows under a
    * `v=<batchId>` dir (idempotent per-batch overwrite, the
    * sink_idempotent discipline), and version intervals are derived ON
    * READ by the same lead() window as the batch operator. This is the
    * production layout: writes never touch existing history (no
    * read-modify-write race, replay converges), and interval closing is
    * either read-time (here) or folded in by the periodic compaction job
    * (cdc_compact). Multi-file feed + maxFilesPerTrigger=1 forces
    * genuine cross-batch accumulation.
    */
  private def multiFeedDir(s: SparkSession, dir: String): String = {
    val sf = new java.io.File(dir).getName
    val feed = s"${graft.Scratch.streamStageRoot(dir)}/cdc_feed2_$sf"
    graft.Scratch.staged(feed) {
      // two files: the minimum that still forces cross-batch accumulation
      // under maxFilesPerTrigger=1 (each extra micro-batch is pure
      // fixed-cost machinery at bench time)
      Cdc.envelopes(s, dir).repartition(2).write.mode("overwrite").text(feed)
    }
  }

  private def streamCdcScd2(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val feed = multiFeedDir(s, dir)
    val hist = fresh("scd2_hist")
    val q = s.readStream.schema(Cdc.envelopeSchema)
      .option("maxFilesPerTrigger", "1").json(feed)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Cdc.typeMapOrders(batch)
          .filter(col("type") =!= "DELETE")
          .select(col("o_orderkey"), col("o_totalprice"), col("es"))
          .write.mode("overwrite").parquet(s"$hist/v=$batchId")
      }
      .option("checkpointLocation", fresh("scd2_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    awaitBounded(q)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderkey")).orderBy(col("es"))
    s.read.parquet(hist)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("es").as("valid_from"),
        lead(col("es"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("o_orderkey"), col("valid_from"))
  }

  /** State-store observability (the `system.metrics` / streaming-UI
    * surface as a QUERY): run the watermarked dedup pipeline and report
    * each stateful operator's retained row count from the engine's own
    * progress telemetry. For a deterministic finite feed the state
    * census is itself deterministic — dedup retains exactly one row per
    * distinct event id — so the observability path gets a DuckDB oracle
    * like any data query: monitoring that can be WRONG is worse than no
    * monitoring.
    */
  private def streamStateMetrics(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    import s.implicits._
    val dup = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val (_, q) = runToMemoryWithQuery(s, dup, "append")
    val stateRows = q.recentProgress
      .flatMap(p => p.stateOperators.map(o =>
        (o.operatorName, o.numRowsTotal)))
      .groupBy(_._1).map { case (op, xs) => (op, xs.map(_._2).max) }.toSeq
    stateRows.toDF("operator", "state_rows")
      .orderBy(col("operator"))
  }

  case class Recent(ts_us: Long, event_id: Long, value: Double)
  case class RecentOut(user_id: Long, n_recent: Long, recent_ids: String)

  /** ListState on transformWithState — a bounded per-user "recent
    * purchases" buffer (the feature-store primitive behind last-N
    * features and session context windows). Each batch appends the new
    * purchases and trims the list to the 3 latest by (ts, event_id);
    * emission is the current buffer, so the final update per user is the
    * converged window. ListState appends without rewriting existing
    * entries — O(arrivals) per batch, the reason it beats a
    * ValueState[Seq] blob at scale. Completes the typed-state API
    * surface: ValueState (stream_stateful_tws), MapState
    * (stream_tws_map_state), timers (stream_tws_timers), ListState here.
    */
  private class RecentBufferProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, RecentOut] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[Recent] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      buf = getHandle.getListState[Recent]("recent",
        org.apache.spark.sql.Encoders.product[Recent],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[RecentOut] = {
      rows.foreach(e => buf.appendValue(Recent(e.ts_us, e.event_id, e.value)))
      val kept = buf.get().toArray
        .sortBy(r => (-r.ts_us, -r.event_id)).take(3)
      buf.put(kept.reverse) // stored oldest-first, bounded at 3
      Iterator.single(RecentOut(uid, kept.length,
        kept.map(_.event_id).mkString(",")))
    }
  }

  private def streamTwsListState(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    import s.implicits._
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ds: Dataset[Ev] =
      eventsStreamUs(s, eventsDir(dir), dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .as[Ev]
    val recent = ds.groupByKey(_.user_id)
      .transformWithState(new RecentBufferProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
    // single-file feed → exactly one emission per user, so max() is a
    // deterministic pass-through (a multi-batch feed would need a
    // monotone emission version to pick the final buffer; the oracled
    // key deliberately uses the one-batch feed)
    val out = runToMemory(s, recent.toDF(), "update")
      .groupBy(col("user_id"))
      .agg(max(col("n_recent")).as("n_recent"),
        max(col("recent_ids")).as("recent_ids"))
      .select(col("user_id"), col("n_recent"), col("recent_ids"))
      .orderBy(col("user_id"))
    // no conf restore needed: s is a stateSized() clone that dies with
    // this call; the returned frame reads a memory table, not the store
    out
  }

  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** MapState on transformWithState — per-user per-event-type running
    * counts held as keyed sub-state (the streaming twin of agg_sum_map's
    * SummingMergeTree map column). MapState stores each (type → count)
    * entry as its OWN state-store key, so updating one event type never
    * rewrites the user's other entries — the point of MapState over a
    * ValueState[Map] blob, and exactly how per-key running maps stay
    * O(touched entries) per batch at 100 TB. Update-mode emission:
    * latest count per (user, type) wins downstream (max fold — counts
    * are monotone).
    */
  private class TypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, TypeCount] {
    @transient private var m: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      m = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.Set[String]()
      rows.foreach { e =>
        val cur = if (m.containsKey(e.event_type)) m.getValue(e.event_type)
                  else 0L
        m.updateValue(e.event_type, cur + 1)
        touched += e.event_type
      }
      touched.iterator.map(t => TypeCount(uid, t, m.getValue(t)))
    }
  }

  private def streamTwsMapState(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    import s.implicits._
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ds: Dataset[Ev] =
      eventsStreamUs(s, eventsDir(dir), dir)
        .select(col("event_id"), col("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .as[Ev]
    val counts = ds.groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
    val out = runToMemory(s, counts.toDF(), "update")
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("n")).as("n")) // counts are monotone; latest = max
      .orderBy(col("user_id"), col("event_type"))
    // no conf restore needed: s is a stateSized() clone that dies with
    // this call; the returned frame reads a memory table, not the store
    out
  }

  // ---- joins ----

  /** Stream–static dimension enrichment (events ⋈ customer). */
  private def streamJoin(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val cust = graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = eventsStream(s, dir)
      .join(cust, col("c_custkey") === col("user_id") + 1)
    runToMemory(s, joined, "append")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** Stream–stream join: each purchase joined to same-user clicks in the
    * preceding hour; both sides watermarked so join state is bounded.
    */
  private def streamStreamJoin(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val e = eventsStream(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_uid"))
      .withWatermark("p_ts", "2 hours")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
        col("user_id").as("c_uid"))
      .withWatermark("c_ts", "2 hours")
    val joined = purchases.join(clicks,
      col("p_uid") === col("c_uid") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
    runToMemory(s, joined, "append")
      .groupBy(col("p_uid").as("user_id")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** Stream–stream LEFT OUTER join: unmatched purchases must surface as
    * null-padded rows — but an outer result can only be emitted once the
    * watermark proves no matching click can still arrive. A finite file
    * feed would end before that proof for its tail rows, so the staged
    * source appends a far-future SENTINEL event pair (user −1, filtered
    * out of the result): in production the next real event plays exactly
    * this role — streams don't end, and the sentinel models that. After
    * the data batch, the watermark sits past every real row and the
    * engine's no-data batch flushes all remaining outer state.
    *
    * Scale notes: same bounded-state shape as stream_stream_join (both
    * sides watermarked, time-range condition ⇒ state eviction); the
    * outer variant adds no state, only the eviction-time null emission.
    */
  private def outerEventsDir(s: SparkSession, dir: String): String = {
    val sf = new java.io.File(dir).getName
    val d = s"${graft.Scratch.streamStageRoot(dir)}/events_outer_$sf"
    // staged(): the old guard was the non-atomically-copied data file
    // itself — a crash mid-copy left a truncated events_1.parquet that
    // every later run trusted (the exact class Scratch.staged exists
    // for), and two sessions could race the link/copy. Wipe-first.
    graft.Scratch.staged(d) {
      graft.Scratch.deleteRecursively(new java.io.File(d))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$d/events_0.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      // sentinel rows (+30 days past max ts) in the SAME physical ts
      // encoding as the fixture drop, so both files stream as one schema
      val (rows, schema) =
        if (eventsTsIsNanos(s, dir)) {
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          val mxNs = s.read.schema(eventsNanosSchema)
            .parquet(s"$dir/events.parquet")
            .agg(max(col("ts"))).head().getLong(0)
          val sentNs = mxNs + 30L * 86400 * 1000 * 1000 * 1000
          (java.util.Arrays.asList(
            org.apache.spark.sql.Row(-1L, sentNs, -1L, "purchase", 0.0, "{}"),
            org.apache.spark.sql.Row(-2L, sentNs, -1L, "click", 0.0, "{}")),
            eventsNanosSchema)
        } else {
          val mx = s.read.parquet(s"$dir/events.parquet")
            .agg(max(col("ts"))).head()
            .getAs[java.time.LocalDateTime](0)
          val sent = mx.plusDays(30)
          (java.util.Arrays.asList(
            org.apache.spark.sql.Row(-1L, sent, -1L, "purchase", 0.0, "{}"),
            org.apache.spark.sql.Row(-2L, sent, -1L, "click", 0.0, "{}")),
            eventsMicrosSchema)
        }
      val stage = fresh("outer_sentinel")
      s.createDataFrame(rows, schema).coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$d/events_1.parquet"))
    }
    d
  }

  private def streamOuterJoin(s0: SparkSession, dir: String): DataFrame = {
    val s = stateSized(s0)
    val e = eventsStreamUs(s, outerEventsDir(s, dir), dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_uid"))
      .withWatermark("p_ts", "2 hours")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
        col("user_id").as("c_uid"))
      .withWatermark("c_ts", "2 hours")
    val joined = purchases.join(clicks,
      col("p_uid") === col("c_uid") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "leftOuter")
    runToMemory(s, joined, "append")
      .filter(col("p_uid") >= 0) // drop the sentinel's own outer row
      .groupBy(col("p_uid").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("c_id")).as("n_matched"),
        count(when(col("c_id").isNull, 1)).as("n_unmatched"))
      .orderBy(col("user_id"))
  }

  // ---- oracles ----

  /** The CDC-upsert END-STATE oracle (the change script's survivor set):
    * shared verbatim by stream_cdc_upsert, stream_offset_log_dsv2 and
    * stream_backfill_tail — three ingestion paths that must converge to
    * the identical state by construction, previously three copies that
    * could silently diverge on an algebra fix.
    */
  private val cdcUpsertEndStateOracle: String =
    """SELECT o_orderkey,
        CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice END AS o_totalprice,
        CAST(CASE WHEN o_orderkey % 3 = 0
             THEN epoch_ms(o_orderdate) + 86400000
             ELSE epoch_ms(o_orderdate) END AS BIGINT) AS version_es
       FROM orders WHERE o_orderkey % 7 <> 0
       ORDER BY o_orderkey"""

  private val offsetLogOracle: String =
    s"""WITH f AS (SELECT o_orderkey AS pk, o_totalprice FROM orders),
        ofs AS (SELECT pk % 4 AS partition,
          COUNT(*) + COUNT(CASE WHEN pk % 3 = 0 THEN 1 END)
                   + COUNT(CASE WHEN pk % 7 = 0 THEN 1 END)
            AS committed_offset
          FROM f GROUP BY 1),
        st AS (SELECT pk % 4 AS partition, COUNT(*) AS n_keys,
          ${Det.oSum("CASE WHEN pk % 3 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END")}
            AS sum_price
          FROM f WHERE pk % 7 <> 0 GROUP BY 1)
       SELECT ofs.partition, ofs.committed_offset, st.n_keys,
         st.sum_price
       FROM ofs JOIN st ON ofs.partition = st.partition
       ORDER BY ofs.partition"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef("src_stream_file", srcStreamFile,
      Some("""WITH ev AS (
                SELECT 'orders' AS tbl, 'INSERT' AS typ FROM orders
                UNION ALL
                SELECT 'orders', 'UPDATE' FROM orders WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT 'orders', 'DELETE' FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT 'customer', 'INSERT' FROM customer)
              SELECT tbl, typ, COUNT(*) AS n FROM ev
              GROUP BY tbl, typ ORDER BY tbl, typ""")),
    QueryDef("src_rate", srcRate, None),
    // o_totalprice rides the generic mysqlType path (DECIMAL(15,2)), so
    // the oracle applies the same decimal rounding before the double edge
    QueryDef("stream_ddl_evolve", streamDdlEvolve,
      Some("""SELECT o_orderkey,
               CAST(CAST(CASE WHEN o_orderkey % 3 = 0
                      THEN o_totalprice + 1000.0
                      ELSE o_totalprice END AS DECIMAL(15,2)) AS DOUBLE)
                 AS o_totalprice,
               CASE WHEN o_orderkey % 3 = 0
                    THEN 'n-' || CAST(o_orderkey AS VARCHAR) END AS o_note
              FROM orders ORDER BY o_orderkey""")),
    QueryDef("stream_cdc_upsert", streamCdcUpsert,
      Some(cdcUpsertEndStateOracle)),
    // epoch 1 = the INSERT snapshot (all orders at original price);
    // epoch 2 = the fully-applied live set — the stream_cdc_upsert
    // end-state algebra rolled up by customer. Both probes are served
    // from the per-batch-maintained MV (require-proven in the key).
    QueryDef("stream_mv_maintain", streamMvMaintain,
      Some(s"""WITH e2 AS (SELECT o_custkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                      ELSE o_totalprice END AS price
               FROM orders WHERE o_orderkey % 7 <> 0)
              SELECT 'epoch1' AS probe, o_custkey,
                ${graft.Det.oSum("o_totalprice")} AS spend,
                COUNT(*) AS n_orders
              FROM orders GROUP BY o_custkey
              UNION ALL
              SELECT 'epoch2', o_custkey, ${graft.Det.oSum("price")},
                COUNT(*)
              FROM e2 GROUP BY o_custkey
              ORDER BY probe, o_custkey""")),
    // probe counts/checksums recomputed from the documents table: the
    // salt-token membership is a pure function of doc_id parity/mod-7
    QueryDef("stream_index_maintain", streamIndexMaintain,
      Some("""SELECT 'epoch1' AS epoch, 'omega9' AS tok,
                CAST(0 AS BIGINT) AS n_matched,
                CAST(0 AS BIGINT) AS sum_doc_id
              UNION ALL
              SELECT 'epoch2', 'alpha7', COUNT(*),
                CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
              FROM documents WHERE doc_id % 2 = 0 AND doc_id % 7 = 0
              UNION ALL
              SELECT 'epoch2', 'omega9', COUNT(*),
                CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
              FROM documents WHERE doc_id % 2 = 1 AND doc_id % 7 = 0
              UNION ALL
              SELECT 'epoch2', 'zzz9', CAST(0 AS BIGINT),
                CAST(0 AS BIGINT)
              ORDER BY epoch, tok""")),
    // per-epoch join-aggregate over exactly the rows delivered so far
    // (mod-3 split) — the probe is MV-routed in Spark; the oracle
    // recomputes the real join from the raw tables
    QueryDef("stream_join_view_maintain", streamJoinViewMaintain,
      Some(s"""WITH f0 AS (SELECT l_suppkey, l_extendedprice
                 FROM lineitem WHERE l_orderkey % 3 = 0),
               f01 AS (SELECT l_suppkey, l_extendedprice
                 FROM lineitem WHERE l_orderkey % 3 <> 2)
              SELECT 'epoch1' AS probe, s_nationkey,
                ${graft.Det.oSum("l_extendedprice")} AS sum_price,
                MIN(l_extendedprice) AS min_price, COUNT(*) AS n
              FROM f0 JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY s_nationkey
              UNION ALL
              SELECT 'epoch2', s_nationkey,
                ${graft.Det.oSum("l_extendedprice")},
                MIN(l_extendedprice), COUNT(*)
              FROM f01 JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY s_nationkey
              ORDER BY probe, s_nationkey""")),
    // offsets = per-partition envelope counts (insert + update + delete
    // script membership); state = the stream_cdc_upsert end-state algebra
    // grouped by the log partition. The exactly-once variant converges
    // to the identical end state + offsets by construction → shares the
    // oracle verbatim.
    QueryDef("src_offset_log", srcOffsetLog, Some(offsetLogOracle)),
    QueryDef("src_offset_log_txn", srcOffsetLogTxn, Some(offsetLogOracle)),
    // the connector reads the raw log: counts + end offsets per
    // partition equal the envelope script's membership; offsets are
    // dense (distinct count == record count per partition)
    QueryDef("src_offset_log_dsv2", srcOffsetLogDsv2,
      Some("""WITH f AS (SELECT o_orderkey AS pk FROM orders),
              c AS (SELECT pk % 4 AS partition,
                COUNT(*) + COUNT(CASE WHEN pk % 3 = 0 THEN 1 END)
                         + COUNT(CASE WHEN pk % 7 = 0 THEN 1 END) AS n
                FROM f GROUP BY 1)
              SELECT partition, n AS n_records, n AS end_offset,
                n AS n_distinct_offsets
              FROM c ORDER BY partition""")),
    // custom streaming source drains to the same end state as the
    // file-drop streaming upsert → shares its oracle verbatim
    QueryDef("stream_offset_log_dsv2", streamOffsetLogDsv2,
      Some(cdcUpsertEndStateOracle)),
    QueryDef("stream_quantile_mv", streamQuantileMv, None),
    // snapshot bootstrap + streamed tail must converge to the same end
    // state as the full-feed upsert (same oracle by construction)
    QueryDef("stream_backfill_tail", streamBackfillTail,
      Some(cdcUpsertEndStateOracle)),
    // same end-state algebra as the batch cdc_summing_mv — the oracle
    // restates the fold relationally with identical per-row decimal casts
    QueryDef("stream_summing_mv", streamSummingMv,
      Some("""SELECT o_custkey,
               CAST(SUM(
                 CAST(o_totalprice AS DECIMAL(30,6))
                 + CASE WHEN o_orderkey % 3 = 0
                     THEN CAST((o_totalprice + 1000.0) - o_totalprice
                       AS DECIMAL(30,6))
                     ELSE 0 END
                 - CASE WHEN o_orderkey % 7 = 0
                     THEN CAST(CASE WHEN o_orderkey % 3 = 0
                         THEN o_totalprice + 1000.0
                         ELSE o_totalprice END AS DECIMAL(30,6))
                     ELSE 0 END) AS DOUBLE) AS live_spend,
               CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 0 ELSE 1 END)
                 AS BIGINT) AS live_orders
              FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),
    QueryDef("sink_parquet", sinkParquet,
      Some(s"""SELECT event_type, COUNT(*) AS n,
               ${Det.oSum("value")} AS sum_value
              FROM events GROUP BY event_type ORDER BY event_type""")),
    QueryDef("sink_idempotent", sinkIdempotent,
      Some(s"""SELECT event_type, COUNT(*) AS n,
               ${Det.oSum("value")} AS sum_value
              FROM events GROUP BY event_type ORDER BY event_type""")),
    QueryDef("stream_fanout_sink", streamFanoutSink,
      Some("""WITH ev AS (
                SELECT 'orders' AS tbl, o_orderkey AS pk,
                       epoch_ms(o_orderdate) AS es FROM orders
                UNION ALL
                SELECT 'orders', o_orderkey, epoch_ms(o_orderdate) + 86400000
                FROM orders WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT 'orders', o_orderkey, epoch_ms(o_orderdate) + 172800000
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT 'customer', c_custkey, 1000000000000 + c_custkey
                FROM customer)
              SELECT tbl, COUNT(*) AS n_rows,
                     COUNT(DISTINCT pk) AS n_keys,
                     CAST(MAX(es) AS BIGINT) AS max_es
              FROM ev GROUP BY tbl ORDER BY tbl""")),
    QueryDef("stream_tumbling", streamTumbling,
      Some(s"""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                 AS hour_start, event_type, COUNT(*) AS n,
               ${Det.oSum("value")} AS sum_value
              FROM events GROUP BY hour_start, event_type
              ORDER BY hour_start, event_type""")),
    QueryDef("stream_sliding", streamSliding,
      Some("""WITH slides AS (
                SELECT make_timestamp(
                  ((epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) - k.k)
                    * 900000000) AS window_start
                FROM events, (VALUES (0),(1),(2),(3)) k(k))
              SELECT window_start, COUNT(*) AS n
              FROM slides GROUP BY window_start ORDER BY window_start""")),
    QueryDef("stream_session", streamSession,
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
              m AS (SELECT user_id, ts,
                -- >= not >: Spark session_window intervals are HALF-OPEN
                -- [start, last+gap) — an event exactly gap after the
                -- previous one opens a NEW session, so the oracle must
                -- split at the boundary too or an exactly-30:00 pair in
                -- a future drop diverges the engines
                CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              sess AS (SELECT user_id, ts,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS sid
                FROM m)
              SELECT user_id, MIN(ts) AS session_start,
                     MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                     COUNT(*) AS n
              FROM sess GROUP BY user_id, sid
              ORDER BY user_id, session_start""")),
    // append-mode emission is deterministic here: one data batch (single
    // file) + the flush batch emit exactly the windows whose end ≤
    // final watermark (max event time − 2h)
    QueryDef("stream_watermark", streamWatermark,
      Some("""WITH m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events),
              agg AS (SELECT
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                  AS hour_start,
                event_type, COUNT(*) AS n
                FROM events GROUP BY hour_start, event_type)
              SELECT hour_start, event_type, n FROM agg, m
              WHERE hour_start + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
              ORDER BY hour_start, event_type""")),
    QueryDef("stream_dedup", streamDedup,
      Some("""SELECT event_type, COUNT(*) AS n FROM events
              GROUP BY event_type ORDER BY event_type""")),
    QueryDef("stream_stateful", streamStateful,
      Some(s"""SELECT user_id, COUNT(*) AS n_events,
               ${Det.oSum("value")} AS sum_value
              FROM events GROUP BY user_id ORDER BY user_id""")),
    QueryDef("stream_stateful_tws", streamStatefulTws,
      Some(s"""SELECT user_id, COUNT(*) AS n_events,
               ${Det.oSum("value")} AS sum_value
              FROM events GROUP BY user_id ORDER BY user_id""")),
    QueryDef("stream_join", streamJoin,
      Some("""SELECT c_mktsegment, COUNT(*) AS n
              FROM events JOIN customer ON c_custkey = user_id + 1
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),
    QueryDef("stream_state_metrics", streamStateMetrics,
      Some("""SELECT 'dedupeWithinWatermark' AS operator,
               COUNT(DISTINCT event_id) AS state_rows
              FROM events""")),
    QueryDef("stream_cdc_scd2", streamCdcScd2,
      Some("""WITH v AS (
                SELECT o_orderkey, o_totalprice,
                       epoch_ms(o_orderdate) AS valid_from,
                       CASE WHEN o_orderkey % 3 = 0
                            THEN epoch_ms(o_orderdate) + 86400000 END AS valid_to
                FROM orders
                UNION ALL
                SELECT o_orderkey, o_totalprice + 1000.0,
                       epoch_ms(o_orderdate) + 86400000, NULL
                FROM orders WHERE o_orderkey % 3 = 0)
              SELECT o_orderkey, o_totalprice,
                     CAST(valid_from AS BIGINT) AS valid_from,
                     CAST(valid_to AS BIGINT) AS valid_to,
                     valid_to IS NULL AS is_current
              FROM v ORDER BY o_orderkey, valid_from""")),
    QueryDef("stream_tws_list_state", streamTwsListState,
      Some("""WITH p AS (SELECT user_id, event_id,
                 CAST(ts AS TIMESTAMP) AS ts FROM events
                 WHERE event_type = 'purchase'),
               r AS (SELECT user_id, event_id, ROW_NUMBER() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
                 AS rn FROM p)
              SELECT user_id, COUNT(*) AS n_recent,
                string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY rn)
                  AS recent_ids
              FROM r WHERE rn <= 3 GROUP BY user_id ORDER BY user_id""")),
    QueryDef("stream_tws_map_state", streamTwsMapState,
      Some("""SELECT user_id, event_type, COUNT(*) AS n
              FROM events GROUP BY user_id, event_type
              ORDER BY user_id, event_type""")),
    QueryDef("stream_tws_timers", streamTwsTimers,
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
              f AS (SELECT user_id, event_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              g AS (SELECT user_id, ts,
                CAST(SUM(new_sess) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_idx
                FROM f)
              SELECT user_id, session_idx, COUNT(*) AS n_events,
                MIN(ts) AS session_start, MAX(ts) AS session_end
              FROM g GROUP BY user_id, session_idx
              ORDER BY user_id, session_idx""")),
    QueryDef("stream_outer_join", streamOuterJoin,
      Some("""WITH p AS (SELECT event_id AS p_id, user_id,
                 CAST(ts AS TIMESTAMP) AS ts FROM events
                 WHERE event_type = 'purchase'),
               c AS (SELECT event_id AS c_id, user_id,
                 CAST(ts AS TIMESTAMP) AS ts FROM events
                 WHERE event_type = 'click'),
               j AS (SELECT p.user_id, c.c_id FROM p LEFT JOIN c
                 ON p.user_id = c.user_id
                AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
              SELECT user_id, COUNT(*) AS n_rows,
                COUNT(c_id) AS n_matched,
                COUNT(CASE WHEN c_id IS NULL THEN 1 END) AS n_unmatched
              FROM j GROUP BY user_id ORDER BY user_id""")),
    QueryDef("stream_stream_join", streamStreamJoin,
      Some("""SELECT p.user_id AS user_id, COUNT(*) AS n_pairs
              FROM events p JOIN events c
                ON p.user_id = c.user_id
               AND p.event_type = 'purchase' AND c.event_type = 'click'
               AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
               AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
              GROUP BY p.user_id ORDER BY user_id""")),
  )
}
