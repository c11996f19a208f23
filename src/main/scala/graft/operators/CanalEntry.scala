package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** Canal's NATIVE binary wire envelope: protobuf `Entry`/`RowChange` (the
  * canal-server TCP protocol — what a client sees before any adapter
  * reshapes it into FlatMessage JSON). No protobuf codegen is available
  * offline, so the protobuf WIRE FORMAT itself (public spec: varint
  * tags, length-delimited submessages) is implemented directly for the
  * message subset Canal uses. Field numbers follow the public
  * EntryProtocol.proto layout:
  *
  *   Entry     { Header header = 1; EntryType entryType = 2;
  *               bytes storeValue = 3  // serialized RowChange }
  *   EntryType { TRANSACTIONBEGIN = 1; ROWDATA = 2; TRANSACTIONEND = 3;
  *               HEARTBEAT = 4 } — boundary entries carry no RowChange
  *   Header    { string logfileName = 2; int64 logfileOffset = 3;
  *               int64 serverId = 4; int64 executeTime = 6;
  *               string schemaName = 8; string tableName = 9;
  *               EventType eventType = 11 }
  *   RowChange { EventType eventType = 2; bool isDdl = 10;
  *               string sql = 11; repeated RowData rowDatas = 12 }
  *   RowData   { repeated Column beforeColumns = 1;
  *               repeated Column afterColumns = 2 }
  *   Column    { int32 index = 1; int32 sqlType = 2; string name = 3;
  *               bool isKey = 4; bool updated = 5; bool isNull = 6;
  *               repeated Pair props = 7; string value = 8;
  *               int32 length = 9; string mysqlType = 10 }
  *               — props (field 7) is an extension-attribute bag this
  *               pipeline never emits; the decoder skips it as a
  *               length-delimited submessage so real canal-server blobs
  *               (which do populate it) frame correctly. length (9) is
  *               the declared MySQL column length, ignored on decode.
  *
  * EventType: INSERT=1 UPDATE=2 DELETE=3 CREATE=4 ALTER=5 ERASE=6
  * QUERY=7 TRUNCATE=8 RENAME=9.
  *
  * Canal column-image semantics (the translation canal-adapter performs
  * into FlatMessage's data[]/old[], inverted by [[decode]]):
  * INSERT → afterColumns only; UPDATE → afterColumns = new image (with
  * `updated` flags) + beforeColumns = changed old fields; DELETE →
  * beforeColumns = deleted image, no afterColumns. Proto3 presence
  * rules apply: zero/false/empty fields are omitted on the wire and
  * read back as defaults.
  *
  * Scale notes: encode/decode are narrow per-row byte transforms (no
  * shuffle); the binary column is opaque to the optimizer exactly like
  * the multimodal blobs, and all relational work happens after decode
  * on the typed envelope.
  */
object CanalEntry {

  // ---- protobuf wire primitives ----

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0L) {
        out.write(((v & 0x7F) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt & 0x7F)
    }
    private def tag(field: Int, wire: Int): Unit =
      varint((field.toLong << 3) | wire)
    def int(field: Int, v: Long): Unit =
      if (v != 0L) { tag(field, 0); varint(v) }
    def bool(field: Int, v: Boolean): Unit = if (v) int(field, 1L)
    def str(field: Int, s: String): Unit =
      if (s != null && s.nonEmpty) bytes(field, s.getBytes(UTF_8))
    def bytes(field: Int, a: Array[Byte]): Unit = {
      tag(field, 2); varint(a.length.toLong); out.write(a, 0, a.length)
    }
    def toArray: Array[Byte] = out.toByteArray
  }

  final class Reader(buf: Array[Byte], var pos: Int, end: Int) {
    def hasNext: Boolean = pos < end
    /** Bounds-checked varint: a sub-reader must never consume its
      * PARENT's bytes past its own `end` (a truncated submessage would
      * otherwise decode to silently-wrong values instead of an error),
      * and a >10-byte varint must error rather than alias bits once the
      * shift wraps past 63.
      */
    def varint(): Long = {
      var shift = 0
      var r = 0L
      while (true) {
        if (pos >= end)
          throw new IllegalArgumentException(s"varint past end $end")
        if (shift > 63)
          throw new IllegalArgumentException("varint longer than 10 bytes")
        val b = buf(pos); pos += 1
        r |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return r
        shift += 7
      }
      r
    }
    /** Length prefix for a delimited field — REJECTS negative or
      * out-of-bounds lengths: a crafted varint whose low 32 bits are
      * negative would otherwise move `pos` BACKWARDS and loop decode
      * forever (net-zero progress), hanging the very micro-batch the
      * decodeSafe DLQ seam exists to protect. Validation happens on the
      * FULL 64-bit varint BEFORE narrowing: a crafted length in
      * [2^32, 2^63) with benign low 32 bits (e.g. 2^32+5 → 5 after
      * .toInt) would otherwise pass the sign check and silently
      * mis-frame the parse into structurally-plausible wrong envelopes.
      */
    private def lenPrefix(): Int = {
      val n64 = varint()
      if (n64 < 0L || n64 > (end - pos).toLong)
        throw new IllegalArgumentException(s"bad length $n64 at $pos")
      n64.toInt
    }
    def lenDelim(): Reader = {
      val n = lenPrefix()
      val r = new Reader(buf, pos, pos + n)
      pos += n
      r
    }
    def strVal(): String = {
      val n = lenPrefix()
      val s = new String(buf, pos, n, UTF_8)
      pos += n
      s
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 =>
        if (pos + 8 > end)
          throw new IllegalArgumentException("fixed64 past end")
        pos += 8
      case 2 =>
        // NOT `pos += varint()`: += reads the old pos BEFORE varint()
        // advances past the length byte, landing one byte short
        val n = lenPrefix()
        pos += n
      case 5 =>
        if (pos + 4 > end)
          throw new IllegalArgumentException("fixed32 past end")
        pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  /** The typed envelope both directions translate through — field-for-
    * field the FlatMessage content [[Cdc.envelopeSchema]] carries (minus
    * the adapter-side `ts`), so Entry-fed operators produce the same
    * downstream results as the JSON-fed ones.
    */
  case class Env(
      id: Long,
      database: String,
      table: String,
      pkNames: Seq[String],
      isDdl: Boolean,
      typ: String,
      es: Long,
      sql: String,
      mysqlType: Map[String, String],
      data: Seq[Map[String, String]],
      old: Seq[Map[String, String]],
      entryType: Int = RowData)

  /** EntryType constants (public EntryProtocol.proto). */
  final val TxnBegin = 1
  final val RowData = 2
  final val TxnEnd = 3

  private val evCode = Map("INSERT" -> 1L, "UPDATE" -> 2L, "DELETE" -> 3L,
    "CREATE" -> 4L, "ALTER" -> 5L, "ERASE" -> 6L, "QUERY" -> 7L,
    "TRUNCATE" -> 8L, "RENAME" -> 9L)
  private val evName = evCode.map { case (k, v) => v -> k }

  def encode(e: Env): Array[Byte] = {
    val mt = if (e.mysqlType == null) Map.empty[String, String] else e.mysqlType
    def colBytes(name: String, value: String, idx: Int,
        updated: Boolean): Array[Byte] = {
      val w = new Writer
      w.int(1, idx.toLong)
      w.str(3, name)
      w.bool(4, e.pkNames != null && e.pkNames.contains(name))
      w.bool(5, updated)
      w.bool(6, value == null)
      w.str(8, value)
      w.str(10, mt.getOrElse(name, ""))
      w.toArray
    }
    val rc = new Writer
    rc.int(2, evCode.getOrElse(e.typ, 7L))
    rc.bool(10, e.isDdl)
    rc.str(11, e.sql)
    if (!e.isDdl && e.data != null) {
      // pk columns FIRST, in pkNames order, then the rest name-sorted:
      // the decoder reconstructs pkNames from isKey flags in WIRE
      // order, so a name-sorted emit silently reordered composite keys
      // ("b","a" round-tripped as "a","b") — and Cdc.pkProjection
      // extracts element_at(pkNames, 1)
      def ordered(keys: Iterable[String]): Seq[String] = {
        val ks = keys.toSet
        val pks =
          if (e.pkNames == null) Seq.empty else e.pkNames.filter(ks)
        pks ++ (ks -- pks).toSeq.sorted
      }
      e.data.zipWithIndex.foreach { case (img, i) =>
        val rd = new Writer
        val names = ordered(img.keys)
        val oldImg: Map[String, String] =
          if (e.old != null && i < e.old.length && e.old(i) != null) e.old(i)
          else Map.empty
        if (e.typ == "DELETE") {
          // deleted image rides beforeColumns; no afterColumns
          names.zipWithIndex.foreach { case (n, ci) =>
            rd.bytes(1, colBytes(n, img(n), ci, updated = false))
          }
        } else {
          ordered(oldImg.keys).zipWithIndex.foreach { case (n, ci) =>
            rd.bytes(1, colBytes(n, oldImg(n), ci, updated = false))
          }
          names.zipWithIndex.foreach { case (n, ci) =>
            rd.bytes(2, colBytes(n, img(n), ci, updated = oldImg.contains(n)))
          }
        }
        rc.bytes(12, rd.toArray)
      }
    }
    val h = new Writer
    h.str(2, "mysql-bin.000001")
    h.int(3, e.id)
    h.int(4, 1L) // serverId
    h.int(6, e.es)
    h.str(8, e.database)
    h.str(9, e.table)
    h.int(11, evCode.getOrElse(e.typ, 7L))
    val entry = new Writer
    entry.bytes(1, h.toArray)
    entry.int(2, e.entryType.toLong)
    // boundary entries (TRANSACTIONBEGIN/END) carry no RowChange
    if (e.entryType == RowData) entry.bytes(3, rc.toArray)
    entry.toArray
  }

  /** Total decode for untrusted bytes — the dead-letter-queue seam: a
    * truncated/bit-flipped blob returns Left(reason) instead of
    * throwing, so one poisoned entry can't kill the micro-batch (the
    * binary twin of the PERMISSIVE-mode corrupt-record column).
    */
  def decodeSafe(a: Array[Byte]): Either[String, Env] =
    try {
      // structural sanity: a real Entry always carries a header FIELD.
      // Checked by wire presence, not content: a heartbeat/txn-boundary
      // entry legitimately has empty schema/table and executeTime 0 —
      // the old content heuristic quarantined those as corrupt.
      val (e, sawHeader) = decodeWithMeta(a)
      if (!sawHeader) Left("missing header")
      else Right(e)
    } catch {
      case ex: Exception =>
        Left(s"${ex.getClass.getSimpleName}: ${String.valueOf(ex.getMessage).take(60)}")
    }

  /** A known field arriving with the WRONG wire type is framing
    * corruption: "skipping" it by the claimed type (or worse, reading
    * it) would realign the parse mid-message and produce a plausible
    * but wrong envelope — throw instead, so decodeSafe quarantines the
    * blob in the DLQ (the mis-framing class the lenPrefix doc
    * describes).
    */
  private def badWire(field: Int, wire: Int): Nothing =
    throw new IllegalArgumentException(
      s"wire-type mismatch: field $field with wire $wire")

  def decode(a: Array[Byte]): Env = decodeWithMeta(a)._1

  /** decode + wire-level header presence (decodeSafe's sanity bit). */
  private def decodeWithMeta(a: Array[Byte]): (Env, Boolean) = {
    var db = ""; var tbl = ""; var es = 0L; var offset = 0L
    var entryType = RowData
    var sawHeader = false
    var rcr: Reader = null
    val er = new Reader(a, 0, a.length)
    while (er.hasNext) {
      val t = er.varint()
      ((t >>> 3).toInt, (t & 7).toInt) match {
        case (1, 2) =>
          sawHeader = true
          val hr = er.lenDelim()
          while (hr.hasNext) {
            val ht = hr.varint()
            ((ht >>> 3).toInt, (ht & 7).toInt) match {
              case (3, 0) => offset = hr.varint()
              case (6, 0) => es = hr.varint()
              case (8, 2) => db = hr.strVal()
              case (9, 2) => tbl = hr.strVal()
              case (f @ (3 | 6 | 8 | 9), hw) => badWire(f, hw)
              case (_, hw) => hr.skip(hw)
            }
          }
        case (2, 0) => entryType = er.varint().toInt
        case (3, 2) => rcr = er.lenDelim()
        case (f @ (1 | 2 | 3), w) => badWire(f, w)
        case (_, w) => er.skip(w)
      }
    }
    var typ = "QUERY"; var isDdl = false; var sql = ""
    // (before, after) image pairs; the DELETE column-image mapping is
    // applied AFTER the scan — protobuf permits any field order, so
    // eventType may follow the rowDatas on the wire
    val pairs =
      mutable.ArrayBuffer.empty[(Map[String, String], Map[String, String])]
    val mysqlType = mutable.LinkedHashMap.empty[String, String]
    val pk = mutable.LinkedHashSet.empty[String]
    def readCols(rd: Reader): (Map[String, String], Map[String, String]) = {
      val before = mutable.LinkedHashMap.empty[String, String]
      val after = mutable.LinkedHashMap.empty[String, String]
      while (rd.hasNext) {
        val rt = rd.varint()
        val side = (rt >>> 3).toInt
        if ((side == 1 || side == 2) && (rt & 7).toInt != 2)
          badWire(side, (rt & 7).toInt)
        if (side == 1 || side == 2) {
          val cr = rd.lenDelim()
          var name = ""; var value: String = null; var isNull = false
          var isKey = false; var mt = ""
          while (cr.hasNext) {
            val ct = cr.varint()
            ((ct >>> 3).toInt, (ct & 7).toInt) match {
              case (3, 2) => name = cr.strVal()
              case (4, 0) => isKey = cr.varint() != 0L
              case (6, 0) => isNull = cr.varint() != 0L
              // field 7 (repeated Pair props) falls through to skip —
              // a length-delimited submessage, framed past correctly
              case (8, 2) => value = cr.strVal()
              case (10, 2) => mt = cr.strVal()
              case (f @ (3 | 4 | 6 | 8 | 10), cw) => badWire(f, cw)
              case (_, cw) => cr.skip(cw)
            }
          }
          val v = if (isNull) null else if (value == null) "" else value
          if (side == 1) before.put(name, v) else after.put(name, v)
          if (isKey) pk.add(name)
          if (mt.nonEmpty) mysqlType.put(name, mt)
        } else rd.skip((rt & 7).toInt)
      }
      (before.toMap, after.toMap)
    }
    if (rcr != null) while (rcr.hasNext) {
      val rt = rcr.varint()
      ((rt >>> 3).toInt, (rt & 7).toInt) match {
        case (2, 0) => typ = evName.getOrElse(rcr.varint(), "QUERY")
        case (10, 0) => isDdl = rcr.varint() != 0L
        case (11, 2) => sql = rcr.strVal()
        case (12, 2) => pairs += readCols(rcr.lenDelim())
        case (f @ (2 | 10 | 11 | 12), w) => badWire(f, w)
        case (_, w) => rcr.skip(w)
      }
    }
    val data = pairs.map { case (before, after) =>
      if (typ == "DELETE") before else after
    }
    val old = pairs.map { case (before, _) =>
      if (typ == "DELETE" || before.isEmpty) null else before
    }
    (Env(offset, db, tbl, pk.toSeq, isDdl, typ, es, sql, mysqlType.toMap,
      data.toSeq,
      if (old.exists(_ != null)) old.toSeq else null,
      entryType), sawHeader)
  }
}
