package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CanalEntry
import graft.operators.CanalEntry.Env

/** Wire-format roundtrip laws for the hand-rolled protobuf Entry codec:
  * every envelope shape the Canal protocol produces (insert/update/
  * delete images, DDL, nulls, unicode, empty strings, multi-row
  * changes) must decode back to the same typed envelope — the property
  * that makes the binary ingest path share cdc_parse's oracle.
  */
class CanalEntrySpec extends AnyFunSuite {

  private def rt(e: Env): Env = CanalEntry.decode(CanalEntry.encode(e))

  private val mt = Map("k" -> "bigint(20)", "v" -> "varchar(64)")

  test("INSERT roundtrip: data in afterColumns, no old") {
    val e = Env(10L, "demo", "orders", Seq("k"), isDdl = false, "INSERT",
      1234567890123L, "", mt, Seq(Map("k" -> "1", "v" -> "café ✓")), null)
    val d = rt(e)
    assert(d == e)
  }

  test("UPDATE roundtrip: old fields ride beforeColumns, aligned per row") {
    val e = Env(11L, "demo", "orders", Seq("k"), isDdl = false, "UPDATE",
      5L, "", mt,
      Seq(Map("k" -> "1", "v" -> "new1"), Map("k" -> "2", "v" -> "new2")),
      Seq(Map("v" -> "old1"), Map("v" -> "old2")))
    val d = rt(e)
    assert(d == e)
  }

  test("DELETE roundtrip: image rides beforeColumns and comes back as data") {
    val e = Env(12L, "demo", "orders", Seq("k"), isDdl = false, "DELETE",
      7L, "", mt, Seq(Map("k" -> "3", "v" -> "gone")), null)
    val d = rt(e)
    assert(d == e)
  }

  test("DDL roundtrip: isDdl + sql survive, no row images") {
    val e = Env(-1L, "demo", "orders", Seq.empty, isDdl = true, "ALTER",
      0L, "ALTER TABLE orders ADD COLUMN o_note VARCHAR(64)",
      Map.empty, Seq.empty, null)
    val d = rt(e)
    assert(d.isDdl && d.typ == "ALTER" && d.sql == e.sql)
    assert(d.data.isEmpty && d.old == null)
  }

  test("null column values carry the isNull flag, not an empty string") {
    val e = Env(13L, "demo", "orders", Seq("k"), isDdl = false, "INSERT",
      9L, "", mt, Seq(Map("k" -> "4", "v" -> null)), null)
    val d = rt(e)
    assert(d.data.head("v") == null)
    assert(d.data.head("k") == "4")
  }

  test("empty string value is distinct from null") {
    val e = Env(14L, "demo", "orders", Seq("k"), isDdl = false, "INSERT",
      9L, "", mt, Seq(Map("k" -> "5", "v" -> "")), null)
    val d = rt(e)
    assert(d.data.head("v") == "")
  }

  test("mixed UPDATE rows: rows without old fields decode to null entries") {
    val e = Env(15L, "demo", "orders", Seq("k"), isDdl = false, "UPDATE",
      5L, "", mt,
      Seq(Map("k" -> "1", "v" -> "n1"), Map("k" -> "2", "v" -> "n2")),
      Seq(Map("v" -> "o1"), null))
    val d = rt(e)
    assert(d.data == e.data)
    assert(d.old == Seq(Map("v" -> "o1"), null))
  }

  test("multi-key tables recover all pkNames from isKey flags") {
    val e = Env(16L, "demo", "link", Seq("a", "b"), isDdl = false, "INSERT",
      5L, "", Map("a" -> "int(11)", "b" -> "int(11)", "x" -> "text"),
      Seq(Map("a" -> "1", "b" -> "2", "x" -> "payload")), null)
    val d = rt(e)
    assert(d.pkNames.toSet == Set("a", "b"))
    assert(d.mysqlType == e.mysqlType)
  }

  test("transaction boundary entries: framed entryType, no RowChange") {
    val begin = Env(5L * 1000000000000L, "demo", "", Seq.empty,
      isDdl = false, "", 5L, "", Map.empty, Seq.empty, null,
      CanalEntry.TxnBegin)
    val d = rt(begin)
    assert(d.entryType == CanalEntry.TxnBegin)
    assert(d.data.isEmpty && d.old == null && d.pkNames.isEmpty)
    assert(d.id == begin.id && d.es == 5L && d.database == "demo")
    val end = rt(begin.copy(entryType = CanalEntry.TxnEnd))
    assert(end.entryType == CanalEntry.TxnEnd && end.data.isEmpty)
    // row entries carry ROWDATA explicitly
    val row = rt(Env(10L, "demo", "orders", Seq("k"), isDdl = false,
      "INSERT", 1L, "", mt, Seq(Map("k" -> "1")), null))
    assert(row.entryType == CanalEntry.RowData)
  }

  test("varint 64-bit boundaries: large es/offset survive") {
    val e = Env(Long.MaxValue - 3, "demo", "orders", Seq("k"),
      isDdl = false, "INSERT", Long.MaxValue / 2, "", mt,
      Seq(Map("k" -> "1")), null)
    val d = rt(e)
    assert(d.id == e.id && d.es == e.es)
  }

  test("fuzz: random envelopes roundtrip bit-faithfully") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genStr = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      Gen.const(""),
      Gen.const("späßig-日本語-"),
      Gen.listOfN(5, Gen.choose(Char.MinValue, '퟿')).map(_.mkString))
    val genVal = Gen.oneOf(genStr, Gen.const(null: String))
    val genImg = for {
      n <- Gen.choose(1, 5)
      ks <- Gen.listOfN(n, Gen.identifier.map(_.take(8)))
      vs <- Gen.listOfN(n, genVal)
    } yield ks.distinct.zip(vs).toMap
    val genEnv = for {
      id <- Gen.choose(0L, Long.MaxValue)
      es <- Gen.choose(0L, Long.MaxValue)
      typ <- Gen.oneOf("INSERT", "UPDATE", "DELETE")
      nRows <- Gen.choose(1, 4)
      imgs <- Gen.listOfN(nRows, genImg)
      withOld <- Gen.oneOf(true, false)
      olds <- Gen.listOfN(nRows, genImg)
      db <- genStr.map(s => if (s.isEmpty) "d" else s)
      tbl <- genStr.map(s => if (s.isEmpty) "t" else s)
    } yield {
      val pk = imgs.head.keys.take(1).toSeq
      val mtm = imgs.flatMap(_.keys).distinct.map(_ -> "varchar(64)").toMap
      Env(id, db, tbl, pk, isDdl = false, typ, es, "", mtm, imgs,
        if (withOld && typ == "UPDATE")
          olds.zip(imgs).map { case (o, img) =>
            o.filter { case (k, _) => img.contains(k) } }
          .map(m => if (m.isEmpty) null else m)
        else null)
    }
    (1 to 40).foreach { seed =>
      val e = genEnv.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val d = rt(e)
      // old alignment: an all-null old array decodes as null (proto3
      // cannot distinguish "absent" from "present and empty")
      val eNorm =
        if (e.old != null && e.old.forall(_ == null)) e.copy(old = null)
        else e
      assert(d == eNorm, s"seed=$seed\n e=$eNorm\n d=$d")
    }
  }

  test("negative-length varint cannot loop decode forever") {
    // tag 0x22 (field 4, wire 2) followed by a 5-byte varint whose low
    // 32 bits are negative: an unchecked `pos += len.toInt` would move
    // the reader BACKWARDS to the same tag — net-zero progress, infinite
    // loop inside the DLQ seam. Must return Left promptly instead.
    // bound the call EXTERNALLY: if the unchecked-advance bug returns,
    // decodeSafe never comes back, and an elapsed-time assert placed
    // after it would hang the suite instead of failing the test
    // dedicated DAEMON thread, not the global ExecutionContext: on
    // regression the spinning decode would otherwise pin a shared EC
    // worker for the rest of the suite
    def bounded(bytes: Array[Byte]) = {
      val task = new java.util.concurrent.FutureTask(
        () => CanalEntry.decodeSafe(bytes))
      val t = new Thread(task, "decode-bound")
      t.setDaemon(true)
      t.start()
      task.get(10, java.util.concurrent.TimeUnit.SECONDS)
    }
    val crafted = Array[Byte](0x22, 0xFA.toByte, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0x7F)
    val out = bounded(crafted)
    assert(out.isLeft, s"crafted blob decoded as $out")
    // same guard through the length-delimited submessage path (field 1)
    val crafted2 = Array[Byte](0x0a, 0xFA.toByte, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0x7F)
    assert(bounded(crafted2).isLeft)
  }

  test("real-proto Column layout: props (field 7) skipped, value read from 8") {
    // A canal-server blob populates Column.props (repeated Pair, field
    // 7) with attribute pairs this pipeline never emits. Hand-assemble
    // one such Column to prove the decoder frames past props and reads
    // value/mysqlType from their true public-proto numbers (8/10) — the
    // r5 codec had value=7 and would have decoded the Pair bytes as the
    // value string here.
    val pair = new CanalEntry.Writer
    pair.str(1, "charset"); pair.str(2, "utf8mb4")
    val colW = new CanalEntry.Writer
    colW.int(1, 0L); colW.str(3, "k"); colW.bool(4, v = true)
    colW.bytes(7, pair.toArray)  // props — must be skipped
    colW.str(8, "77")            // value
    colW.int(9, 20L)             // length — ignored
    colW.str(10, "bigint(20)")   // mysqlType
    val rd = new CanalEntry.Writer; rd.bytes(2, colW.toArray)
    val rc = new CanalEntry.Writer
    rc.int(2, 1L); rc.bytes(12, rd.toArray)
    val h = new CanalEntry.Writer
    h.int(6, 42L); h.str(8, "demo"); h.str(9, "orders")
    val entry = new CanalEntry.Writer
    entry.bytes(1, h.toArray); entry.int(2, 2L); entry.bytes(3, rc.toArray)
    val env = CanalEntry.decode(entry.toArray)
    assert(env.data == Seq(Map("k" -> "77")))
    assert(env.mysqlType == Map("k" -> "bigint(20)"))
    assert(env.pkNames == Seq("k"))
    assert(env.typ == "INSERT" && env.database == "demo")
  }

  test("length varint in [2^32, 2^63) rejected before Int narrowing") {
    // 2^32+5 has benign low 32 bits (.toInt = 5): an Int-narrowed check
    // would pass n<0 and bounds (5 bytes of padding follow), silently
    // mis-framing the parse. Must be IllegalArgumentException from the
    // unsafe path, not an AIOOBE or a plausible-but-wrong envelope.
    val crafted = Array[Byte](0x0a, 0x85.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x10, 1, 2, 3, 4, 5)
    intercept[IllegalArgumentException](CanalEntry.decode(crafted))
    assert(CanalEntry.decodeSafe(crafted).isLeft)
  }

  test("fuzz: corrupted bytes never throw from decodeSafe") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val base = CanalEntry.encode(Env(10L, "demo", "orders", Seq("k"),
      isDdl = false, "INSERT", 99L, "", mt,
      Seq(Map("k" -> "1", "v" -> "payload")), null))
    val genCorrupt = for {
      mode <- Gen.choose(0, 2)
      pos <- Gen.choose(0, base.length - 1)
      b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
      len <- Gen.choose(0, base.length)
    } yield mode match {
      case 0 => base.take(len)                        // truncation
      case 1 => val a = base.clone(); a(pos) = b; a   // bit flip
      case _ => Array.fill(len)(b)                    // garbage
    }
    (1 to 200).foreach { seed =>
      val bytes = genCorrupt.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      CanalEntry.decodeSafe(bytes) match {
        case Right(env) =>
          // a survivor must be SELF-CONSISTENT, not merely headered
          // (the old disjunction restated decodeSafe's own Right-gate,
          // so it could never fail): its re-encoding must decode back
          // to the identical envelope
          val rt = CanalEntry.decodeSafe(CanalEntry.encode(env))
          assert(rt == Right(env),
            s"seed $seed: survivor not roundtrip-stable: $rt vs $env")
        case Left(reason) => assert(reason.nonEmpty)
      }
    }
  }
}
