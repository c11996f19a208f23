package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A replayable PARTITIONED LOG with explicit offset semantics, file-
  * backed — the deployment shape of the Canal→Kafka→consumer topology
  * with the broker modeled on shared storage (no Kafka jar exists in
  * this environment, a documented constraint; the SEMANTICS are the
  * point: per-partition append sequencing, consumer-group committed
  * offsets, resume-from-offset, at-least-once replay).
  *
  * Layout:
  * {{{
  *   root/seg=<epoch>/p=<k>/ (json)  records {offset, value}; offsets are
  *                                   assigned AT APPEND TIME, contiguous
  *                                   per partition across epochs
  *   root/_ENDS                      append history: "epoch p start end"
  *                                   per (epoch, partition) — the segment
  *                                   index that prunes reads
  *   root/_COMMIT_<group>            consumer group's committed offsets:
  *                                   "p offset" lines, atomic manifest
  * }}}
  *
  * Scale notes: appending assigns offsets with ONE window shuffle over
  * the new records only, partitioned by p — exactly Kafka's
  * per-partition sequencer, never a global sort and never O(log). Reads
  * prune whole segment dirs via the _ENDS index (O(epochs × parts)
  * metadata) before any data is opened, then keep only offsets ≥ the
  * consumer's position with a broadcast of the O(parts) offset map.
  * Commits are O(parts) manifest writes through the fsync + atomic-
  * rename discipline shared with the table publish paths.
  */
object OffsetLog {

  private def endsFile(root: String) = s"$root/_ENDS"
  private def commitFile(root: String, group: String) = s"$root/_COMMIT_$group"

  /** (epoch, p, start, end) append history — Nil before the first append. */
  private def endsHistory(root: String): Seq[(Long, Int, Long, Long)] = {
    val f = new java.io.File(endsFile(root))
    if (!f.exists()) Nil
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(f.toPath).asScala.toSeq
        .filter(_.nonEmpty).map { l =>
          val Array(e, p, a, b) = l.split(' ')
          (e.toLong, p.toInt, a.toLong, b.toLong)
        }
    }
  }

  /** Next offset to be assigned per partition (0 before any append). */
  def endOffsets(root: String): Map[Int, Long] =
    endsHistory(root).groupBy(_._2).map { case (p, hs) => p -> hs.map(_._4).max }

  /** Log end as it stood after `epoch` — what a consumer polling at that
    * point in time would have seen as the high-water mark.
    */
  def endOffsetsAt(root: String, epoch: Long): Map[Int, Long] =
    endsHistory(root).filter(_._1 <= epoch).groupBy(_._2)
      .map { case (p, hs) => p -> hs.map(_._4).max }

  /** Append one epoch of records. `records` must carry `p` (partition
    * id) and `value` (payload string); `seq` orders records WITHIN a
    * partition deterministically (the producer's send order) and must
    * be UNIQUE per partition — a tie would make the offset assignment
    * depend on shuffle arrival order. Offsets continue from the
    * previous epoch's end per partition. An empty epoch is a no-op
    * (no segment dir, no _ENDS entry).
    */
  def append(root: String, epoch: Long, records: DataFrame,
      seq: org.apache.spark.sql.Column): Unit = {
    // SINGLE PRODUCER per log root, like commit()'s per-group contract:
    // the offset assignment + _ENDS rewrite is a read-modify-write, so
    // two concurrent appends would assign duplicate offsets and the
    // last _ENDS publish would silently drop the other epoch's ranges.
    val s = records.sparkSession
    import s.implicits._
    // monotonic-epoch contract, ENFORCED (r12 ADVICE): an epoch that
    // already published _ENDS ranges must never be re-appended — the
    // seg-dir overwrite would orphan those ranges (empty source: the
    // dir is deleted under them, and read()'s epoch list still includes
    // the epoch; non-empty: offsets would re-base on the epoch's OWN
    // published ends, double-counting every record). A crash-retry
    // BETWEEN seg write and _ENDS publish remains legal: such an epoch
    // has no _ENDS entry yet, which is exactly what this checks.
    require(!endsHistory(root).exists(_._1 == epoch),
      s"offset-log epoch $epoch at $root already published _ENDS " +
        "ranges — re-appending a committed epoch would corrupt the log")
    val ends = endOffsets(root)
    val base = ends.toSeq.toDF("p", "base")
    val w = Window.partitionBy(col("p")).orderBy(seq)
    // persist the assigned frame: the write and the range aggregate
    // both consume it — without the cache each would replay the source
    // lineage, and a read-back of the written epoch (the previous
    // formulation) costs a full extra data pass
    val assigned = records
      .join(broadcast(base), Seq("p"), "left")
      .withColumn("offset",
        coalesce(col("base"), lit(0L)) + row_number().over(w) - 1)
      .select(col("p"), col("offset"), col("value"))
      .persist()
    // OVERWRITE, not append: each epoch owns its seg dir, so the only
    // way data pre-exists here is a RETRY after a crash between this
    // write and the _ENDS publish — append would then duplicate every
    // record at identical offsets; overwrite replays idempotently (the
    // recomputed offsets are identical because _ENDS has no epoch entry)
    assigned.write.partitionBy("p").mode("overwrite").json(s"$root/seg=$epoch")
    // O(parts) metadata: the new per-partition [start, end) ranges
    val ranges = assigned
      .groupBy(col("p").cast("int").as("p"))
      .agg(min(col("offset")).as("a"), (max(col("offset")) + 1).as("b"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assigned.unpersist()
    // empty-epoch no-op decided from the CACHED frame's ranges, not a
    // records.isEmpty pre-pass (which re-ran the source lineage once
    // more before the persist): remove the just-written empty seg dir
    // and publish nothing
    if (ranges.isEmpty) {
      graft.Scratch.deleteRecursively(new java.io.File(s"$root/seg=$epoch"))
      return
    }
    val lines = endsHistory(root).map { case (e, p, a, b) => s"$e $p $a $b" } ++
      ranges.map { case (p, a, b) => s"$epoch $p $a $b" }
    atomicWrite(endsFile(root), lines.mkString("\n"))
  }

  /** Records with offset ≥ the group's position, segment-pruned via the
    * _ENDS index: an epoch dir is opened only if SOME partition's range
    * extends past the consumer's committed offset for it.
    */
  def read(s: SparkSession, root: String, from: Map[Int, Long],
      until: Map[Int, Long] = Map.empty): DataFrame = {
    import s.implicits._
    val hist = endsHistory(root)
    // an until SNAPSHOT that omits a partition means the consumer's
    // poll saw NOTHING for it — bound it at 0 (no rows), not MaxValue:
    // the unbounded default is only for the until-less "read everything"
    // call. The DSv2 connector patched this at its own call site; the
    // shared primitive must agree or an as-of read leaks
    // post-snapshot partitions (degrading exactly-once to
    // at-least-once where the merge happens to be idempotent).
    def untilOf(p: Int): Long =
      if (until.isEmpty) Long.MaxValue else until.getOrElse(p, 0L)
    val epochs = hist.filter { case (_, p, a, b) =>
      b > from.getOrElse(p, 0L) && a < untilOf(p)
    }.map(_._1).distinct.sorted
      // retention guard (the liveSegments rule): _ENDS remembers
      // truncated epochs by design, so a consumer positioned below the
      // retention floor must SKIP them (Kafka's jump-to-earliest), not
      // crash the json read on a deleted seg dir
      .filter(e => new java.io.File(s"$root/seg=$e").exists())
    if (epochs.isEmpty)
      return s.emptyDataFrame
        .select(lit(0).as("p"), lit(0L).as("offset"), lit("").as("value"))
        .limit(0)
    val parts = hist.map(_._2).distinct
    val boundsDf = parts.map(p => (p, from.getOrElse(p, 0L),
      untilOf(p))).toDF("p", "from", "until")
    // explicit schema: json inference would cost a second full pass
    val recSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("offset",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType)))
    // basePath anchors partition discovery: without it, a read spanning
    // MULTIPLE epoch dirs makes Spark infer conflicting structures
    // (seg= itself looks like a partition level) — a latent bug the
    // retention spec's two-epoch tail read exposed
    s.read.schema(recSchema).option("basePath", root)
      .json(epochs.map(e => s"$root/seg=$e"): _*)
      .withColumn("p", col("p").cast("int"))
      .join(broadcast(boundsDf), Seq("p"))
      .filter(col("offset") >= col("from") && col("offset") < col("until"))
      .select(col("p"), col("offset"), col("value"))
  }

  /** The group's committed offsets (0 per partition before any commit). */
  def committed(root: String, group: String): Map[Int, Long] = {
    val f = new java.io.File(commitFile(root, group))
    if (!f.exists()) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(f.toPath).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(p, o) = l.split(' '); p.toInt -> o.toLong
        }.toMap
    }
  }

  /** Commit the group's position — fsync'd bytes, atomic rename, fsync'd
    * dirent: the same torn-manifest discipline as the table publishes.
    * Committing AFTER the downstream merge gives at-least-once delivery;
    * the merge must be (and is) idempotent per consumed range.
    *
    * Commits MERGE per partition (a commit only advances the partitions
    * it names, Kafka's semantics): consumers in one group that split the
    * partition set commit independently without clobbering each other's
    * positions — the rebalance shape, spec-tested. Positions never move
    * backwards (max with the existing commit). The merge is a
    * read-modify-write of the group manifest: like Kafka's group
    * coordinator, commits for one group are assumed serialized (one
    * committer at a time); partition OWNERSHIP may be split, concurrent
    * commit RACES for the same group are not arbitrated here.
    */
  def commit(root: String, group: String, offsets: Map[Int, Long]): Unit = {
    val prior = committed(root, group)
    val merged = prior ++ offsets.map { case (p, o) =>
      p -> math.max(o, prior.getOrElse(p, 0L))
    }
    atomicWrite(commitFile(root, group),
      merged.toSeq.sorted.map { case (p, o) => s"$p $o" }.mkString("\n"))
  }

  /** Live (epoch, partition) segments intersecting (from, until) — the
    * DSv2 connector's plan-time unit: one Spark task per entry. Both
    * bounds prune from the _ENDS ranges (a segment wholly at/above
    * `until` — e.g. appended after an AvailableNow run snapshotted its
    * cap — plans NO task instead of a parse-and-drop-everything task).
    * Truncated dirs are excluded even though _ENDS remembers them.
    */
  def liveSegments(root: String, from: Map[Int, Long],
      until: Map[Int, Long] = Map.empty): Seq[(Long, Int)] =
    endsHistory(root).collect {
      // same absent-partition snapshot rule as read(): a non-empty
      // until that omits p bounds it at 0
      case (e, p, a, b) if b > from.getOrElse(p, 0L) &&
          a < (if (until.isEmpty) Long.MaxValue
               else until.getOrElse(p, 0L)) &&
          new java.io.File(s"$root/seg=$e/p=$p").exists() => (e, p)
    }.sorted

  /** Offset ranges a consumer positioned at `from` can NEVER read
    * because retention already deleted their segment dirs — Kafka's
    * data-loss detection (r15 DSv2 review): a truncated segment whose
    * end is above the consumer's position means records in
    * [max(start, from), end) are gone. Empty iff the truncate contract
    * (floor ≤ every consumer's committed position) was respected.
    * Returns (partition, lostFrom, lostUntil) triples.
    */
  def lostRanges(root: String, from: Map[Int, Long])
      : Seq[(Int, Long, Long)] =
    endsHistory(root).collect {
      case (e, p, a, b) if b > from.getOrElse(p, 0L) &&
          !new java.io.File(s"$root/seg=$e/p=$p").exists() =>
        (p, math.max(a, from.getOrElse(p, 0L)), b)
    }.sorted

  /** Log RETENTION (Kafka's segment deletion): drop every segment epoch
    * whose ranges lie wholly below `floor` on every partition — the
    * low-water mark, normally min over all consumer groups' committed
    * offsets. The _ENDS index keeps the dropped epochs' entries (offset
    * continuity and end-offset accounting never change; the index is
    * O(epochs × parts) metadata), and reads are safe by contract: a
    * consumer's `from` is ≥ its committed position ≥ the floor, so a
    * truncated epoch can never be selected by the segment pruning.
    * Returns the dropped epoch ids.
    */
  def truncate(root: String, floor: Map[Int, Long]): Seq[Long] = {
    val hist = endsHistory(root)
    val dead = hist.groupBy(_._1).collect {
      case (e, rs) if rs.forall { case (_, p, _, b) =>
        b <= floor.getOrElse(p, 0L) } => e
    }.toSeq.sorted
      // _ENDS keeps dropped epochs' entries by design (offset
      // accounting) — report only dirs that actually exist
      .filter(e => new java.io.File(s"$root/seg=$e").exists())
    dead.foreach { e =>
      graft.Scratch.deleteRecursively(new java.io.File(s"$root/seg=$e"))
    }
    dead
  }

  /** Remove a consumer group's commit manifest — for one-shot groups
    * whose position has been fully consumed, so a shared cross-run log
    * root does not accumulate dead manifests.
    */
  def dropGroup(root: String, group: String): Unit = {
    new java.io.File(commitFile(root, group)).delete(); ()
  }

  private def atomicWrite(path: String, content: String): Unit =
    graft.Scratch.atomicPublish(java.nio.file.Paths.get(path), content)
}
