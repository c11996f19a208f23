package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property tests for the CDC fold laws (SURVEY.md
  * §5.3): MergeTree emulations must be insensitive to event arrival order
  * and idempotent — the exact properties that make an at-least-once
  * binlog feed safe. Samples are drawn with fixed seeds (no
  * scalatestplus bridge in the offline cache), so runs are reproducible.
  */
class CdcPropertySpec extends GraftSpec {

  private case class Ev(key: Long, es: Long, seq: Long, isDelete: Boolean)

  private val evGen: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 25)
    evs <- Gen.listOfN(n, for {
      key <- Gen.choose(1L, 5L)
      es <- Gen.choose(1L, 50L)
      del <- Gen.oneOf(true, false)
    } yield (key, es, del))
  } yield evs.zipWithIndex.map { case ((k, es, d), i) => Ev(k, es, i.toLong, d) }

  private def samples: Seq[List[Ev]] =
    (1 to 8).map(i => evGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def upsert(evs: Seq[Ev]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val df = evs.map(e => (e.key, e.es, e.seq, e.isDelete))
      .toDF("key", "es", "seq", "isDelete")
    val w = Window.partitionBy(col("key"))
      .orderBy(col("es").desc, col("seq").desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("key", "es", "seq").as[(Long, Long, Long)]
      .collect().map { case (k, es, sq) => k -> (es, sq) }.toMap
  }

  test("upsert result is invariant under event arrival order") {
    samples.foreach { evs =>
      val shuffled = new scala.util.Random(7).shuffle(evs)
      val a = upsert(evs)
      assert(a == upsert(shuffled) && a == upsert(evs.reverse))
    }
  }

  test("upsert is idempotent under full replay (at-least-once feed)") {
    samples.foreach { evs =>
      assert(upsert(evs) == upsert(evs ++ evs))
    }
  }

  test("collapsing fold is order-free through the REAL operator") {
    import spark.implicits._
    // drives Cdc.deleteFoldOf itself (the old version summed signs with
    // its own groupBy — both sides of that assert went through stock
    // Spark sum, covering no graft code at all)
    samples.foreach { evs =>
      def fold(es: Seq[Ev]): Set[(Long, Double)] = {
        val df = es.map(e => (e.key, e.es, e.seq,
            if (e.isDelete) "DELETE" else "INSERT", e.es.toDouble))
          .toDF("o_orderkey", "es", "ts", "type", "o_totalprice")
          .withColumn("old_img", lit(null).cast("map<string,string>"))
        graft.operators.Cdc.deleteFoldOf(df)
          .as[(Long, Double)].collect().toSet
      }
      assert(fold(evs) == fold(evs.reverse),
        "collapsing fold must not depend on arrival order")
    }
  }

  test("backfill merge: snapshot-only keys survive, logged keys fold") {
    import spark.implicits._
    samples.foreach { evs =>
      // snapshot covers keys 1..8; the log only the generated keys (1..5)
      val snapKeys = (1L to 8L)
      val snapshot = snapKeys.map(k => (k, Long.MinValue, Long.MinValue, false))
      val log = evs.map(e => (e.key, e.es, e.seq, e.isDelete))
      val merged = {
        val df = (snapshot ++ log).toDF("key", "es", "seq", "isDelete")
        val w = Window.partitionBy(col("key"))
          .orderBy(col("es").desc, col("seq").desc)
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .filter(!col("isDelete")).select("key").as[Long].collect().toSet
      }
      val expected = snapKeys.toSet.filter { k =>
        evs.filter(_.key == k).sortBy(e => (e.es, e.seq)).lastOption
          .forall(!_.isDelete) // no log → snapshot survives; else latest wins
      }
      assert(merged == expected, s"merged=$merged expected=$expected")
    }
  }

  test("versioned collapse: merge is invariant under signed-row order") {
    import spark.implicits._
    // generate (key, version, payload, sign) multisets where cancels copy
    // a prior state row — then the merge must give the same survivors for
    // ANY permutation, the VersionedCollapsingMergeTree contract
    def collapse(rows: Seq[(Long, Long, Double, Int)]): Map[Long, (Long, Double)] = {
      val df = rows.toDF("key", "version", "payload", "sign")
      val w = Window.partitionBy(col("key")).orderBy(col("version").desc)
      df.groupBy(col("key"), col("version"), col("payload"))
        .agg(sum(col("sign")).as("net")).filter(col("net") > 0)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("key", "version", "payload").as[(Long, Long, Double)]
        .collect().map { case (k, v, p) => k -> ((v, p)) }.toMap
    }
    samples.foreach { evs =>
      // build a versioned state/cancel script from the generated events:
      // per key, sorted by (es, seq): each event adds state (v=2*seq) and
      // cancels the prior state row exactly (same version AND payload)
      val rows = evs.groupBy(_.key).toSeq.flatMap { case (k, es) =>
        val ordered = es.sortBy(e => (e.es, e.seq))
        ordered.zipWithIndex.flatMap { case (e, i) =>
          val st = (k, 2L * e.seq, e.es.toDouble, 1)
          val cancel = if (i == 0) Nil else {
            val p = ordered(i - 1)
            Seq((k, 2L * p.seq, p.es.toDouble, -1))
          }
          cancel :+ st
        }
      }
      val base = collapse(rows)
      val rnd = new scala.util.Random(11)
      assert(base == collapse(rnd.shuffle(rows)))
      assert(base == collapse(rows.reverse))
      // survivors are exactly each key's LAST state row
      val want = evs.groupBy(_.key).map { case (k, es) =>
        val last = es.maxBy(e => (e.es, e.seq))
        k -> ((2L * last.seq, last.es.toDouble))
      }
      assert(base == want)
    }
  }

  test("scd2 intervals partition each key's timeline") {
    import spark.implicits._
    samples.foreach { evs =>
      val versions = evs.filterNot(_.isDelete)
      if (versions.nonEmpty) {
        val df = versions.map(e => (e.key, e.es, e.seq))
          .toDF("key", "es", "seq")
        val w = Window.partitionBy(col("key")).orderBy(col("es"), col("seq"))
        val scd = df
          .withColumn("valid_to", lead(col("es"), 1).over(w))
          .select("key", "es", "valid_to")
          .as[(Long, Long, Option[Long])].collect()
        val open = scd.filter(_._3.isEmpty)
        assert(open.map(_._1).distinct.length ==
          versions.map(_.key).distinct.length)
        assert(scd.forall { case (_, from, to) => to.forall(from <= _) })
      }
    }
  }
}
