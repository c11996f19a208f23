package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.2 CDC core — the reference system class's identity: Alibaba-Canal
  * FlatMessage envelopes (JSON row-change events from a MySQL binlog) loaded
  * with ClickHouse MergeTree-family semantics (Replacing = latest-per-key,
  * Collapsing = signed fold), re-expressed Spark-first.
  *
  * The driver fixtures carry no CDC feed, so [[envelopes]] synthesizes a
  * deterministic FlatMessage stream FROM the orders/customer tables —
  * full JSON serialize→parse roundtrip included — and every operator's
  * oracle states the equivalent end state relationally over the same
  * parquet. Change script (pure functions of the key, so both engines can
  * derive it):
  *   - INSERT for every order      at es = epoch_ms(o_orderdate)
  *   - UPDATE (price + 1000)       at es + 1 day,  for o_orderkey % 3 == 0
  *   - DELETE                      at es + 2 days, for o_orderkey % 7 == 0
  *   - INSERT for every customer   at es = 10^12 + c_custkey
  *   - one DDL event (isDdl=true, empty data[])
  *   - ts = es + 500 ms everywhere (constant replication lag)
  *
  * Scale notes (100 TB posture): every operator below is a single shuffle
  * on the primary key (window or groupBy over pk); parse/explode/cast are
  * narrow map-side transforms. The upsert window is the ReplacingMergeTree
  * merge; at cluster scale the same plan fragment runs inside
  * foreachBatch over bucketed state partitioned by pk.
  */
object Cdc {

  /** Canal FlatMessage envelope schema (public Canal wire format). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("pkNames", ArrayType(StringType)),
    StructField("isDdl", BooleanType),
    StructField("type", StringType),
    StructField("es", LongType),
    StructField("ts", LongType),
    StructField("sql", StringType),
    StructField("mysqlType", MapType(StringType, StringType)),
    StructField("data", ArrayType(MapType(StringType, StringType))),
    StructField("old", ArrayType(MapType(StringType, StringType))),
  ))

  val ddlSql = "ALTER TABLE orders ADD COLUMN o_note VARCHAR(64)"

  private def ordersImage(price: Column): Column = map(
    lit("o_orderkey"), col("o_orderkey").cast("string"),
    lit("o_custkey"), col("o_custkey").cast("string"),
    lit("o_orderstatus"), col("o_orderstatus"),
    lit("o_totalprice"), price.cast("string"),
    lit("o_orderdate"), col("o_orderdate").cast("string"),
    lit("o_orderpriority"), col("o_orderpriority"))

  private val ordersMysqlType: Column = map(
    lit("o_orderkey"), lit("bigint(20)"),
    lit("o_custkey"), lit("bigint(20)"),
    lit("o_orderstatus"), lit("char(1)"),
    lit("o_totalprice"), lit("decimal(15,2)"),
    lit("o_orderdate"), lit("datetime"),
    lit("o_orderpriority"), lit("varchar(15)"))

  private def envelope(id: Column, table: String, pk: String, typ: Column,
      es: Column, isDdl: Column, sql: Column, mysqlType: Column,
      data: Column, old: Column): Column =
    to_json(struct(
      id.as("id"), lit("demo").as("database"), lit(table).as("table"),
      array(lit(pk)).as("pkNames"), isDdl.as("isDdl"), typ.as("type"),
      es.as("es"), (es + 500).as("ts"), sql.as("sql"),
      mysqlType.as("mysqlType"), data.as("data"), old.as("old")))

  // price + 1000.0, not price*1.1-rounded: Spark's round(double) goes via
  // the shortest decimal string (BigDecimal.valueOf) while DuckDB rounds
  // the exact binary value, so rounded products diverge at midpoints; an
  // IEEE add is bit-identical in both engines.
  private val updatedPrice: Column = col("o_totalprice") + 1000.0

  // o_orderdate is TIMESTAMP_NTZ; cast to LTZ under the pinned UTC session
  // so unix_millis equals DuckDB's epoch_ms over the naive value.
  private def esBase: Column = unix_millis(col("o_orderdate").cast("timestamp"))
  private def noOld: Column =
    lit(null).cast(ArrayType(MapType(StringType, StringType)))

  private def updateEnvelopes(o: DataFrame): DataFrame =
    o.filter(col("o_orderkey") % 3 === 0)
      .select(envelope(col("o_orderkey") * 10 + 1, "orders", "o_orderkey",
        lit("UPDATE"), esBase + 86400000L, lit(false), lit(""), ordersMysqlType,
        array(ordersImage(updatedPrice)),
        array(map(lit("o_totalprice"), col("o_totalprice").cast("string"))))
        .as("value"))

  private def deleteEnvelopes(o: DataFrame): DataFrame =
    o.filter(col("o_orderkey") % 7 === 0)
      .select(envelope(col("o_orderkey") * 10 + 2, "orders", "o_orderkey",
        lit("DELETE"), esBase + 172800000L, lit(false), lit(""), ordersMysqlType,
        array(ordersImage(when(col("o_orderkey") % 3 === 0, updatedPrice)
          .otherwise(col("o_totalprice")))), noOld)
        .as("value"))

  /** The binlog TAIL only (updates + deletes, no initial inserts) — what
    * a consumer that bootstrapped from a snapshot still has to read.
    */
  def envelopesTail(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    updateEnvelopes(o).unionByName(deleteEnvelopes(o))
  }

  /** The synthesized FlatMessage feed: one JSON string per change event. */
  def envelopes(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val base = esBase
    val inserts = o.select(envelope(col("o_orderkey") * 10, "orders",
      "o_orderkey", lit("INSERT"), base, lit(false), lit(""),
      ordersMysqlType, array(ordersImage(col("o_totalprice"))), noOld)
      .as("value"))
    val updates = updateEnvelopes(o)
    val deletes = deleteEnvelopes(o)
    val c = Tables.customer(s, dir)
    val custImage = map(
      lit("c_custkey"), col("c_custkey").cast("string"),
      lit("c_name"), col("c_name"),
      lit("c_nationkey"), col("c_nationkey").cast("string"),
      lit("c_acctbal"), col("c_acctbal").cast("string"),
      lit("c_mktsegment"), col("c_mktsegment"))
    val custInserts = c.select(envelope(col("c_custkey") * 10, "customer",
      "c_custkey", lit("INSERT"), lit(1000000000000L) + col("c_custkey"),
      lit(false), lit(""),
      map(lit("c_custkey"), lit("bigint(20)"), lit("c_name"), lit("varchar(25)"),
        lit("c_nationkey"), lit("int(11)"), lit("c_acctbal"), lit("decimal(15,2)"),
        lit("c_mktsegment"), lit("char(10)")),
      array(custImage), noOld).as("value"))
    val ddl = s.range(1).select(envelope(lit(-1L), "orders", "o_orderkey",
      lit("ALTER"), lit(0L), lit(true), lit(ddlSql), ordersMysqlType,
      array().cast(ArrayType(MapType(StringType, StringType))), noOld)
      .as("value"))
    inserts.unionByName(updates).unionByName(deletes)
      .unionByName(custInserts).unionByName(ddl)
  }

  /** Parsed envelopes are persisted once per (session, sfDir): eight
    * operators consume the same feed, and without materialization each
    * field projection behind the explode re-runs the from_json parse
    * (no common-subexpression elimination across a Generate boundary).
    */
  private val parsedCache = new graft.DfCache()
  private val typedCache = new graft.DfCache()
  // the fingerprint in the key makes an in-JVM testdata swap at the
  // same dir path re-derive instead of replaying the stale parse
  private def feedKey(dir: String): String =
    s"$dir@${graft.Scratch.fixtureFingerprint(dir)}"

  /** Envelope JSON → typed envelope rows (the Canal-adapter parse step). */
  def parsed(s: SparkSession, dir: String): DataFrame =
    parsedCache.get(s, feedKey(dir)) {
      val df = envelopes(s, dir)
        .select(from_json(col("value"), envelopeSchema).as("m"))
        .select(col("m.*"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize so every operator reuses the parse
      df
    }

  /** Parsed orders-table DML with destination schema applied: stringly
    * row image → typed columns (the adapter's type-map step).
    */
  def ordersTyped(s: SparkSession, dir: String): DataFrame =
    typedCache.get(s, feedKey(dir)) { ordersTypedUncached(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) }

  private def ordersTypedUncached(s: SparkSession, dir: String): DataFrame =
    typeMapOrders(parsed(s, dir))

  /** The old image PAIRED with exploded row `pos` — `old[pos+1]` (a
    * multi-row Canal UPDATE envelope carries data[i] ↔ old[i]), guarded
    * for the malformed-envelope case (r12 ADVICE): under the harness's
    * ANSI-on Spark 4 default a bare `element_at(old, pos + 1)` throws a
    * task-level INVALID_ARRAY_INDEX when an envelope carries fewer old
    * images than data rows. A null `old` (INSERT/DELETE envelopes)
    * stays a null image; a short NON-null old[] raises a NAMED error
    * (the loud-parser discipline) carrying both lengths instead of an
    * undiagnosable ANSI exception three operators downstream. Requires
    * `old` and the posexplode alias `pos` in scope.
    */
  private def oldImgAt: Column =
    when(col("old").isNull, lit(null))
      .when(size(col("old")) > col("pos"),
        element_at(col("old"), col("pos") + 1))
      .otherwise(raise_error(concat(
        lit("malformed canal envelope: old[] carries "),
        size(col("old")).cast("string"),
        lit(" images but data[] row index is "),
        col("pos").cast("string"))))

  /** The type-map transform itself, applicable to any envelope-schema
    * DataFrame — shared by the batch operators and the streaming
    * foreachBatch pipeline (same plan fragment both ways, which is what
    * makes the streaming path verifiable).
    */
  def typeMapOrders(envelopes: DataFrame): DataFrame =
    envelopes
      .filter(col("table") === "orders" && !col("isDdl"))
      .select(col("type"), col("es"), col("ts"), col("old"),
        posexplode(col("data")).as(Seq("pos", "img")))
      .select(
        col("type"), col("es"), col("ts"),
        // the old image PAIRED with THIS row: a multi-row Canal UPDATE
        // envelope carries data[i] ↔ old[i] (the cdcOldDiff pos rule) —
        // consumers that read element_at(old, 1) computed wrong deltas
        // for every exploded row after the first
        oldImgAt.as("old_img"),
        col("img")("o_orderkey").cast("long").as("o_orderkey"),
        col("img")("o_custkey").cast("long").as("o_custkey"),
        col("img")("o_orderstatus").as("o_orderstatus"),
        col("img")("o_totalprice").cast("double").as("o_totalprice"),
        col("img")("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
        col("img")("o_orderpriority").as("o_orderpriority"))

  /** Two-epoch evolving feed for the streaming DDL path, split around the
    * ALTER: epoch 1 is the plain INSERT script (schema v1); epoch 2 is
    * the DDL envelope followed by the UPDATE script whose images AND
    * mysqlType metadata carry the new `o_note` column — the shape a real
    * binlog takes when an ALTER lands mid-replication.
    */
  def envelopesPreDdl(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(envelope(col("o_orderkey") * 10, "orders",
      "o_orderkey", lit("INSERT"), esBase, lit(false), lit(""),
      ordersMysqlType, array(ordersImage(col("o_totalprice"))), noOld)
      .as("value"))

  def envelopesPostDdl(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val evolvedType = map_concat(ordersMysqlType,
      map(lit("o_note"), lit("varchar(64)")))
    val evolvedImage = map_concat(ordersImage(updatedPrice),
      map(lit("o_note"), concat(lit("n-"), col("o_orderkey").cast("string"))))
    val ddl = s.range(1).select(envelope(lit(-1L), "orders", "o_orderkey",
      lit("ALTER"), lit(0L), lit(true), lit(ddlSql), evolvedType,
      array().cast(ArrayType(MapType(StringType, StringType))), noOld)
      .as("value"))
    val updates = o.filter(col("o_orderkey") % 3 === 0)
      .select(envelope(col("o_orderkey") * 10 + 1, "orders", "o_orderkey",
        lit("UPDATE"), esBase + 86400000L, lit(false), lit(""), evolvedType,
        array(evolvedImage),
        array(map(lit("o_totalprice"), col("o_totalprice").cast("string"))))
        .as("value"))
    ddl.unionByName(updates)
  }

  /** The same change script as [[envelopes]], shipped in canal-server's
    * NATIVE binary form: one protobuf `Entry` blob per event (see
    * [[CanalEntry]] for the wire layout). Encode is a narrow
    * mapPartitions over the typed envelope — no shuffle, blobs born
    * where the rows live.
    */
  def entryFeed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    parsed(s, dir)
      .select(col("id"), col("database"), col("table"), col("pkNames"),
        col("isDdl"), col("type").as("typ"), col("es"), col("sql"),
        col("mysqlType"), col("data"), col("old"),
        lit(CanalEntry.RowData).as("entryType"))
      .as[CanalEntry.Env]
      .mapPartitions(_.map(CanalEntry.encode))
      .toDF("value")
  }

  /** The Entry feed with real transaction framing: each binlog
    * transaction's row entries sit between a TRANSACTIONBEGIN and a
    * TRANSACTIONEND entry, and membership is carried by the header's
    * logfileOffset (txn = offset div 10^12) — exactly how a canal
    * client reassembles transactions from the entry stream. Txn id is a
    * pure function of the primary key (o_orderkey % 100) so the oracle
    * can restate membership relationally.
    */
  def entryFeedTxn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val txnSpan = 1000000000000L
    val members = parsed(s, dir)
      .filter(col("table") === "orders" && !col("isDdl"))
      .withColumn("pk",
        element_at(element_at(col("data"), 1), "o_orderkey").cast("long"))
      .withColumn("txn", pmod(col("pk"), lit(100L)))
    val bounds = members.select(col("txn")).distinct()
    def boundary(off: Column, et: Int) = bounds.select(
      off.as("id"), lit("demo").as("database"), lit("").as("table"),
      array().cast(ArrayType(StringType)).as("pkNames"),
      lit(false).as("isDdl"), lit("").as("typ"), col("txn").as("es"),
      lit("").as("sql"),
      map().cast(MapType(StringType, StringType)).as("mysqlType"),
      array().cast(ArrayType(MapType(StringType, StringType))).as("data"),
      lit(null).cast(ArrayType(MapType(StringType, StringType))).as("old"),
      lit(et).as("entryType"))
    members
      .select((col("txn") * txnSpan + col("id")).as("id"), col("database"),
        col("table"), col("pkNames"), col("isDdl"), col("type").as("typ"),
        col("es"), col("sql"), col("mysqlType"), col("data"), col("old"),
        lit(CanalEntry.RowData).as("entryType"))
      .unionByName(boundary(col("txn") * txnSpan, CanalEntry.TxnBegin))
      .unionByName(boundary((col("txn") + 1) * txnSpan - 1, CanalEntry.TxnEnd))
      .as[CanalEntry.Env]
      .mapPartitions(_.map(CanalEntry.encode))
      .toDF("value")
  }

  // ---- operator queries ----

  /** The shared post-envelope projection of BOTH ingest paths (JSON
    * FlatMessage → cdc_parse, binary Entry → cdc_parse_entry): filter
    * DML, explode row images, extract the pk via the envelope's own
    * pkNames. One implementation — the two paths share cdc_parse's
    * oracle verbatim, so a copy-paste edit to one would surface as a
    * confusing single-sided gate failure. Expects a `typ` column.
    */
  private def pkProjection(envelopes: DataFrame): DataFrame =
    envelopes
      .filter(!col("isDdl"))
      .select(col("database").as("db"), col("table").as("tbl"),
        col("typ"), col("es"), col("pkNames"),
        explode(col("data")).as("img"))
      .select(col("db"), col("tbl"), col("typ"), col("es"),
        element_at(col("img"), element_at(col("pkNames"), 1)).cast("long")
          .as("pk"))
      .orderBy(col("tbl"), col("typ"), col("pk"))

  /** Parse + explode every row image; pk extracted via the envelope's own
    * pkNames metadata (generic across destination tables).
    */
  private def cdcParse(s: SparkSession, dir: String): DataFrame =
    pkProjection(parsed(s, dir).withColumn("typ", col("type")))

  /** The Entry binary feed staged at rest, once per (JVM, sfDir) — the
    * same fixture-staging discipline as the JSON feed dir (StreamOps
    * `feedDir`): the feed a canal-server deployment would have produced
    * already exists before any query runs, so measured queries pay for
    * the INGEST pipeline, not for synthesizing the fixture.
    */
  private[graft] def entryFeedDir(s: SparkSession, dir: String): String = {
    val sf = new java.io.File(dir).getName
    // _v2: wire layout changed (Column value=8/mysqlType=10 per the
    // public proto) — a stale fixture staged by an older JVM would
    // mis-frame under the corrected decoder, so the dir name is
    // versioned with the codec
    val root = s"${graft.Scratch.streamStageRoot(dir)}/entry_feed_v2_$sf"
    graft.Scratch.staged(root) {
      entryFeed(s, dir).write.mode("overwrite").parquet(root)
    }
  }

  /** Canal-server NATIVE protocol ingest: the binary protobuf `Entry`
    * feed (at rest — the fixture a wire tap or store-and-forward stage
    * produces) is read, decoded, and parsed into the SAME typed rows as
    * the FlatMessage path — proven by sharing cdc_parse's oracle
    * verbatim. A user pointing the library at a default canal-server
    * deployment (no adapter, no JSON) lands here.
    *
    * Scale notes: decode is a narrow per-row byte transform behind the
    * scan; everything relational (explode, pk extraction, ordering)
    * happens on the decoded envelope exactly like cdc_parse, so the two
    * ingest paths share one downstream plan shape.
    */
  private def cdcParseEntry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val binRoot = entryFeedDir(s, dir)
    pkProjection(
      s.read.parquet(binRoot).select(col("value")).as[Array[Byte]]
        .mapPartitions(_.map(CanalEntry.decode))
        .toDF())
  }

  /** Binary dead-letter queue (the Entry twin of cdc_parse_corrupt's
    * PERMISSIVE JSON mode): three poisoned blobs — a truncation, a
    * mangled leading tag, and plain garbage — ride the clean staged
    * feed; [[CanalEntry.decodeSafe]] quarantines each with a reason
    * instead of throwing, so one bad entry cannot kill the micro-batch.
    * Counts are oracled against the change script.
    */
  private def cdcParseEntryCorrupt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feed = s.read.parquet(entryFeedDir(s, dir))
      .select(col("value")).as[Array[Byte]]
    val probe = CanalEntry.encode(CanalEntry.Env(1L, "demo", "orders",
      Seq("k"), isDdl = false, "INSERT", 9L, "",
      Map("k" -> "bigint(20)"), Seq(Map("k" -> "1")), null))
    val mangled = probe.clone()
    mangled(0) = 0x7f.toByte // field 15 / wire 7: invalid wire type
    val bad: Seq[Array[Byte]] = Seq(
      probe.take(7),                // truncated mid-header
      mangled,
      Array[Byte](1, 2, 3, 4, 5))  // plain garbage
    feed.union(s.createDataset(bad))
      .map(b => CanalEntry.decodeSafe(b) match {
        case Right(_) => (1L, 0L)
        case Left(_)  => (0L, 1L)
      })
      .toDF("ok", "dlq")
      .agg(count(lit(1)).as("n_total"),
        sum(col("ok")).cast("long").as("n_good"),
        sum(col("dlq")).cast("long").as("n_quarantined"))
  }

  /** Transaction reassembly from the framed Entry stream — the client-
    * side contract the binlog's BEGIN/END framing exists for: group row
    * entries by their transaction (logfileOffset span), count changes
    * and row images per txn, and assert each group is COMPLETE (exactly
    * one BEGIN and one END observed). A consumer that applies a
    * transaction missing its END risks a torn apply — this is the check
    * that gates it (the publish-side twin is cdc_multi_table_txn).
    *
    * Scale notes: one groupBy shuffle on the txn id over decoded
    * entries; framing entries are O(txns) rows riding the same shuffle.
    */
  /** Txn-framed Entry feed staged at rest, once per (JVM, sfDir) — same
    * fixture discipline as [[entryFeedDir]].
    */
  private[graft] def entryFeedTxnDir(s: SparkSession, dir: String): String = {
    val sf = new java.io.File(dir).getName
    // _v2: versioned with the Column wire layout, same as entryFeedDir
    val root = s"${graft.Scratch.streamStageRoot(dir)}/entry_txn_feed_v2_$sf"
    graft.Scratch.staged(root) {
      entryFeedTxn(s, dir).write.mode("overwrite").parquet(root)
    }
  }

  private def cdcTxnBoundary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val binRoot = entryFeedTxnDir(s, dir)
    s.read.parquet(binRoot).select(col("value")).as[Array[Byte]]
      .mapPartitions(_.map(CanalEntry.decode))
      .toDF()
      .withColumn("txn", expr("id div 1000000000000"))
      .groupBy(col("txn"))
      .agg(
        sum(when(col("entryType") === CanalEntry.RowData, 1L).otherwise(0L))
          .as("n_changes"),
        sum(when(col("entryType") === CanalEntry.RowData,
          size(col("data")).cast("long")).otherwise(0L)).as("n_rows"),
        (sum(when(col("entryType") === CanalEntry.TxnBegin, 1L)
          .otherwise(0L)) === 1L &&
          sum(when(col("entryType") === CanalEntry.TxnEnd, 1L)
            .otherwise(0L)) === 1L).as("complete"))
      .orderBy(col("txn"))
  }

  private def cdcRoute(s: SparkSession, dir: String): DataFrame =
    parsed(s, dir)
      .filter(!col("isDdl"))
      .groupBy(col("database").as("db"), col("table").as("tbl"),
        col("type").as("typ"))
      .agg(count(lit(1)).as("n"), min(col("es")).as("min_es"),
        max(col("es")).as("max_es"))
      .orderBy(col("tbl"), col("typ"))

  /** Destination-schema application proved lossless: INSERT images cast
    * back to typed columns must equal the source table bit-for-bit.
    */
  private def cdcTypeMap(s: SparkSession, dir: String): DataFrame =
    ordersTyped(s, dir)
      .filter(col("type") === "INSERT")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  /** ReplacingMergeTree: latest row image per PK wins (version = es,
    * tiebreak ts) — DELETEs are not folded here (that's Collapsing).
    */
  /** The Replacing fold as a frame transform — exposed so the spec can
    * replay a doubled feed through the REAL fold (idempotence must be a
    * property of this code, not of the test's own dedup).
    */
  private[graft] def upsertLatestOf(typed: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("es").desc, col("ts").desc, col("type").desc, col("o_totalprice").desc)
    typed
      .filter(col("type") =!= "DELETE")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("es").as("version_es"))
  }

  private def cdcUpsertLatest(s: SparkSession, dir: String): DataFrame =
    upsertLatestOf(ordersTyped(s, dir)).orderBy(col("o_orderkey"))

  /** CollapsingMergeTree: INSERT → +1; UPDATE → (-1 old, +1 new);
    * DELETE → -1. A key is live iff sum(sign) > 0; the collapsed table
    * holds the latest +1 row of each live key. Single shuffle on pk:
    * balance via window sum, survivor via window row_number.
    */
  /** The Collapsing fold as a frame transform — exposed so the spec can
    * prove ORDER-INVARIANCE of the real fold under shuffled arrival
    * orders (sign balance is commutative by construction; the survivor
    * pick orders by (es, ts), not arrival).
    */
  private[graft] def deleteFoldOf(t: DataFrame): DataFrame = {
    val plus = t.filter(col("type") =!= "DELETE")
      .select(col("o_orderkey"), col("es"), col("ts"),
        col("o_totalprice"), lit(1).as("sign"))
    val minusUpd = t.filter(col("type") === "UPDATE")
      .select(col("o_orderkey"), col("es"), col("ts"),
        element_at(col("old_img"), "o_totalprice").cast("double")
          .as("o_totalprice"),
        lit(-1).as("sign"))
    val minusDel = t.filter(col("type") === "DELETE")
      .select(col("o_orderkey"), col("es"), col("ts"),
        col("o_totalprice"), lit(-1).as("sign"))
    val signed = plus.unionByName(minusUpd).unionByName(minusDel)
    val wAll = Window.partitionBy(col("o_orderkey"))
    val wLatest = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("es").desc, col("ts").desc, col("o_totalprice").desc)
    signed
      .withColumn("balance", sum(col("sign")).over(wAll))
      .filter(col("sign") === 1 && col("balance") > 0)
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  private def cdcDeleteFold(s: SparkSession, dir: String): DataFrame =
    deleteFoldOf(ordersTyped(s, dir)).orderBy(col("o_orderkey"))

  /** Before/after images → SCD-2 history: version valid [es, next es). */
  private def cdcScd2(s: SparkSession, dir: String): DataFrame = {
    // (ts, price) tiebreak: es ties (same-millisecond binlog changes
    // under replay/merge — ts = es + 500 degenerates with es) must not
    // leave the version chain's lead() pairing to shuffle arrival order
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("es"), col("ts"), col("o_totalprice"))
    ordersTyped(s, dir)
      .filter(col("type") =!= "DELETE")
      .select(col("o_orderkey"), col("o_totalprice"), col("es").as("valid_from"),
        lead(col("es"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("o_orderkey"), col("valid_from"))
  }

  private def cdcDdlFilter(s: SparkSession, dir: String): DataFrame =
    parsed(s, dir)
      .filter(col("isDdl"))
      .select(col("database").as("db"), col("table").as("tbl"),
        col("sql").as("sql_text"), col("es"))
      .orderBy(col("es"))

  /** MySQL column type (as Canal reports it) → Spark destination type —
    * the public Canal adapter type map for the DDL-evolution path.
    */
  private[graft] def mysqlToSpark(t: String): DataType = {
    val lower = t.toLowerCase
    val decimalRe = raw"decimal\((\d+)\s*,\s*(\d+)\).*".r
    lower match {
      case decimalRe(p, sc) => DecimalType(p.toInt, sc.toInt)
      case _ => lower.takeWhile(_.isLetter) match {
        case "varchar" | "char" | "text" | "longtext" | "enum" => StringType
        case "bigint"                                          => LongType
        case "int" | "mediumint" | "smallint" | "tinyint"      => IntegerType
        case "decimal"                                         => DecimalType(38, 10)
        case "datetime" | "timestamp"                          => TimestampNTZType
        case "date"                                            => DateType
        case "double" | "float"                                => DoubleType
        case _                                                 => StringType
      }
    }
  }

  /** Table-GENERIC type-map: the destination schema is derived from the
    * envelope's own `mysqlType` metadata via [[mysqlToSpark]] — no
    * hard-coded column list, exactly how a real Canal adapter creates and
    * populates a destination table it has never seen.
    *
    * The metadata is the UNION of mysqlType entries across the batch
    * (per column, the declaration from the LATEST es wins): a batch that
    * straddles a DDL contains both pre- and post-ALTER envelopes, and
    * resolving from an arbitrary single envelope would nondeterministically
    * drop the new column for the whole batch. The aggregate is
    * O(distinct columns) control-plane metadata (same class as the
    * DDL-apply collect), never O(data); the cast projection itself is a
    * narrow map-side transform.
    */
  def typeMapGeneric(envelopes: DataFrame, table: String): DataFrame = {
    val meta = envelopes
      .filter(col("table") === table && !col("isDdl"))
      .select(col("es"), explode(col("mysqlType")).as(Seq("k", "v")))
      // struct key breaks a tying max-es between CONFLICTING
      // declarations deterministically (lexicographically-max v wins)
      // instead of by shuffle arrival — the docstring's "latest es
      // wins" plus a fixed tie rule
      .groupBy(col("k"))
      .agg(max_by(col("v"), struct(col("es"), col("v"))).as("v"))
      .orderBy(col("k"))
      .collect()
    require(meta.nonEmpty, s"no DML envelopes for table $table")
    val typedCols = meta.toSeq.map { r =>
      val (c, t) = (r.getString(0), r.getString(1))
      element_at(col("img"), c).cast(mysqlToSpark(t)).as(c)
    }
    envelopes
      .filter(col("table") === table && !col("isDdl"))
      .select(col("type"), col("es"), col("ts"), col("old"),
        posexplode(col("data")).as(Seq("pos", "img")))
      .select(Seq(col("type"), col("es"), col("ts")) ++ typedCols: _*)
  }

  /** The generic map applied to the customer feed (whose images were
    * previously parsed but never schema-applied): INSERT images must
    * reproduce the customer table, with c_acctbal landing as the
    * DECIMAL(15,2) its mysqlType declares. At the comparison edge the
    * decimal is re-cast to double (values are exact 2dp, so the decimal
    * → double conversion is lossless and bit-identical in both engines);
    * a raw wide decimal column hash-mismatched the driver comparator in
    * r03 despite exact value equality — same representational hazard the
    * label_centroid CSV edge guards against. The decimal typing itself
    * is still exercised (and oracle-proven) by cdc_type_map_decimal.
    */
  private def cdcTypeMapGeneric(s: SparkSession, dir: String): DataFrame =
    typeMapGeneric(parsed(s, dir), "customer")
      .filter(col("type") === "INSERT")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal").cast("double").as("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** DDL schema evolution applied, not just filtered: `ALTER TABLE ...
    * ADD COLUMN` events from the feed evolve the destination schema —
    * new columns appear null-backfilled on every existing row, exactly
    * what a Canal→ClickHouse adapter does on a DDL envelope. DDL events
    * are control-plane metadata: collecting them is O(#DDL statements),
    * never O(data).
    */
  private def cdcDdlApply(s: SparkSession, dir: String): DataFrame = {
    val addCol =
      raw"(?i)ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w0-9(),]+).*".r
    val added: Seq[(String, DataType)] = parsed(s, dir)
      .filter(col("isDdl"))
      .select(col("table"), col("sql"), col("es"))
      .collect().sortBy(_.getAs[Long]("es")).toSeq
      .flatMap { r =>
        r.getAs[String]("sql") match {
          case addCol(tbl, name, typ) if tbl.equalsIgnoreCase("orders") =>
            Some(name -> mysqlToSpark(typ))
          case _ => None
        }
      }
    val snapshot = ordersTyped(s, dir)
      .filter(col("type") === "INSERT")
      .select(col("o_orderkey"), col("o_totalprice"))
    added.foldLeft(snapshot) { case (df, (name, dt)) =>
        df.withColumn(name, lit(null).cast(dt))
      }
      .orderBy(col("o_orderkey"))
  }

  /** Replication-lag / watermark monitoring — the first dashboard every
    * Canal deployment builds: per (table, type) segment of the change
    * stream, event counts, the es (source-time) watermark span, how far
    * the segment's head trails the GLOBAL head (lag_behind_head — the
    * "is this table's replication stuck" signal), and the max
    * processing lag ts−es (adapter pipeline latency).
    *
    * Scale notes: one hash-agg onto the O(tables × types) domain with
    * map-side partials; the global head is a broadcast of that tiny
    * aggregate — the monitoring query never re-reads the stream.
    */
  private def cdcReplicationLag(s: SparkSession, dir: String): DataFrame = {
    val seg = parsed(s, dir).filter(!col("isDdl"))
      .groupBy(col("table").as("table_name"), col("type"))
      .agg(count(lit(1)).as("n"),
        min(col("es")).as("min_es"), max(col("es")).as("max_es"),
        max(col("ts") - col("es")).as("proc_lag_ms"))
    seg.crossJoin(broadcast(seg.agg(max(col("max_es")).as("h"))))
      .select(col("table_name"), col("type"), col("n"), col("min_es"),
        col("max_es"), (col("h") - col("max_es")).as("lag_behind_head"),
        col("proc_lag_ms"))
      .orderBy(col("table_name"), col("type"))
  }

  /** Schema REGISTRY materialized from the change stream itself (the
    * Confluent-registry role as a query): every DML envelope carries the
    * table's LIVE column→type map, so the distinct schema signatures
    * ordered by first-seen `es` ARE the registry — version id, validity
    * start, records served under each version, and the column diff vs
    * the previous version (the ALTER audit; version 1's diff is the
    * initial column set). Runs over the two-epoch evolving feed
    * (stream_ddl_evolve's input), where the mid-stream ALTER adds
    * `o_note`.
    *
    * Scale notes: the signature is a map-side projection of metadata
    * the record already carries; the registry is one hash-agg onto the
    * (table, signature) domain — O(versions), control-plane sized — and
    * the numbering/diff window rides that domain, never the stream.
    */
  private def cdcSchemaRegistry(s: SparkSession, dir: String): DataFrame = {
    // consumer-side PROJECTION PUSHDOWN into the deserializer: the
    // registry reads only control-plane fields, so it parses the wire
    // envelope with a narrowed schema (Jackson skips the data/old image
    // arrays instead of materializing them — measured ~2x on this key;
    // a real registry consumer does exactly this)
    val registrySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("table", StringType),
      org.apache.spark.sql.types.StructField("isDdl",
        org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("es", LongType),
      org.apache.spark.sql.types.StructField("mysqlType",
        MapType(StringType, StringType))))
    val feed = envelopesPreDdl(s, dir).unionByName(envelopesPostDdl(s, dir))
      .select(from_json(col("value"), registrySchema).as("m"))
      .select(col("m.*"))
    val sigs = feed.filter(!col("isDdl"))
      .select(col("table"), col("es"),
        // ';'-joined: mysql type strings contain commas (decimal(15,2))
        expr("""array_join(array_sort(transform(map_entries(mysqlType),
               e -> concat(e.key, ':', e.value))), ';')""").as("sig"),
        size(map_keys(col("mysqlType"))).as("n_cols"))
    val byTable = Window.partitionBy(col("table"))
      .orderBy(col("valid_from_es"))
    sigs.groupBy(col("table"), col("sig"), col("n_cols"))
      .agg(min(col("es")).as("valid_from_es"), count(lit(1)).as("n_records"))
      .withColumn("version", row_number().over(byTable))
      .withColumn("prev_sig", lag(col("sig"), 1).over(byTable))
      .withColumn("added_cols", expr(
        """array_join(array_sort(array_except(
             transform(split(sig, ';'), x -> split_part(x, ':', 1)),
             transform(split(coalesce(prev_sig, ''), ';'),
               x -> split_part(x, ':', 1)))), ',')"""))
      .select(col("table").as("table_name"), col("version"),
        col("valid_from_es"), col("n_records"), col("n_cols"),
        col("added_cols"))
      .orderBy(col("table_name"), col("version"))
  }

  /** `old`-image diff — the standard CDC audit consumer: per UPDATE, the
    * envelope's `old` array carries the prior value of each changed
    * column; diffing it against the new row image yields changed-column
    * stats (which columns churn, and how the values moved).
    */
  private def cdcOldDiff(s: SparkSession, dir: String): DataFrame =
    parsed(s, dir)
      .filter(col("table") === "orders" && !col("isDdl") &&
        col("type") === "UPDATE")
      .select(posexplode(col("data")).as(Seq("pos", "img")), col("old"))
      .select(col("img"),
        explode(oldImgAt).as(Seq("col_name", "old_str")))
      .withColumn("new_str", element_at(col("img"), col("col_name")))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_changes"),
        Det.davg(col("old_str").cast("double")).as("avg_old"),
        Det.davg(col("new_str").cast("double")).as("avg_new"))
      .orderBy(col("col_name"))

  /** Decimal fidelity end-to-end: the FlatMessage price string (MySQL
    * DECIMAL(15,2) per mysqlType) is parsed straight into
    * DecimalType(15,2) and aggregated in decimal — the value never
    * passes through a double, so there is no binary-rounding hazard at
    * any scale. The #1 real-world Canal type trap (SURVEY §1.2).
    */
  private def cdcTypeMapDecimal(s: SparkSession, dir: String): DataFrame =
    parsed(s, dir)
      .filter(col("table") === "orders" && !col("isDdl") &&
        col("type") === "INSERT")
      .select(explode(col("data")).as("img"))
      .select(
        col("img")("o_orderpriority").as("o_orderpriority"),
        col("img")("o_totalprice").cast(DecimalType(15, 2)).as("price_dec"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("price_dec")).cast(DecimalType(38, 2)).as("sum_price"),
        max(col("price_dec")).as("max_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Summing/AggregatingMergeTree analogue — the remaining MergeTree
    * family member (Replacing = cdc_upsert_latest, Collapsing =
    * cdc_delete_fold): the change stream folds DIRECTLY into per-customer
    * aggregate state, no per-PK window and no row state. INSERT
    * contributes +price, UPDATE contributes its delta (new − old image —
    * the second consumer of the envelope's `old` field), DELETE −(last
    * image). One shuffle on the group key; at 100 TB the state is
    * O(customers), not O(orders) — the point of ClickHouse aggregate-state
    * materialized views.
    */
  private def cdcSummingMv(s: SparkSession, dir: String): DataFrame = {
    val oldPrice = element_at(col("old_img"), "o_totalprice")
      .cast("double")
    val contrib = when(col("type") === "INSERT", col("o_totalprice"))
      .when(col("type") === "UPDATE", col("o_totalprice") - oldPrice)
      .otherwise(-col("o_totalprice"))
    ordersTyped(s, dir)
      .groupBy(col("o_custkey"))
      .agg(Det.dsum(contrib).as("live_spend"),
        sum(when(col("type") === "INSERT", 1)
          .when(col("type") === "DELETE", -1).otherwise(0)).as("live_orders"))
      .orderBy(col("o_custkey"))
  }

  /** Incremental compaction — the ClickHouse background-merge mechanic
    * for a merge-on-read store: base snapshot bucketed by pk + delta log
    * of changes. Compaction rewrites ONLY buckets that have deltas
    * (merging latest-per-key, dropping tombstones); untouched base
    * buckets are left byte-identical and served as-is. Returns the ids
    * of the buckets it compacted (unit-tested for the untouched-bucket
    * property in CdcSpec).
    */
  private[graft] val compactBucketCount = 8

  private[graft] def compactBuckets(s: SparkSession, base: String,
      delta: String, out: String): Seq[Int] = {
    val touched = graft.Scratch.listPartitionDirs(delta, "bucket=")
      .map(_.getName.drop(7).toInt).toSeq.sorted
    if (touched.nonEmpty) {
      val basePaths = touched
        .filter(b => new java.io.File(s"$base/bucket=$b").isDirectory)
        .map(b => s"$base/bucket=$b")
      val cols = Seq("o_orderkey", "o_totalprice", "es", "ts", "type")
      val baseDf =
        if (basePaths.isEmpty) s.read.parquet(s"$delta/bucket=${touched.head}")
          .select(cols.map(col): _*).limit(0)
        else s.read.parquet(basePaths: _*).select(cols.map(col): _*)
      val deltaDf = s.read.parquet(touched.map(b => s"$delta/bucket=$b"): _*)
        .select(cols.map(col): _*)
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("es").desc, col("ts").desc, col("type").desc, col("o_totalprice").desc)
      baseDf.unionByName(deltaDf)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("type") =!= "DELETE").drop("rn")
        .withColumn("bucket",
          pmod(col("o_orderkey"), lit(compactBucketCount)).cast("int"))
        .write.mode("overwrite").partitionBy("bucket").parquet(out)
    }
    touched
  }

  /** Post-compaction view: compacted buckets + untouched base buckets. */
  private[graft] def compactedView(s: SparkSession, base: String,
      out: String, touched: Seq[Int]): DataFrame = {
    val untouched = graft.Scratch.listPartitionDirs(base, "bucket=")
      .map(_.getName.drop(7).toInt).filterNot(touched.contains)
      .map(b => s"$base/bucket=$b")
    val paths = untouched ++ touched
      .filter(b => new java.io.File(s"$out/bucket=$b").isDirectory)
      .map(b => s"$out/bucket=$b")
    s.read.parquet(paths.toSeq: _*)
      .select("o_orderkey", "o_totalprice", "es", "ts", "type")
  }

  private def cdcCompact(s: SparkSession, dir: String): DataFrame = {
    val root = graft.Scratch.dir("compact")
    val t = ordersTyped(s, dir)
      .select("o_orderkey", "o_totalprice", "es", "ts", "type")
      .withColumn("bucket",
        pmod(col("o_orderkey"), lit(compactBucketCount)).cast("int"))
    t.filter(col("type") === "INSERT")
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$root/base")
    t.filter(col("type") =!= "INSERT")
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$root/delta")
    val touched = compactBuckets(s, s"$root/base", s"$root/delta", s"$root/compacted")
    compactedView(s, s"$root/base", s"$root/compacted", touched)
      .filter(col("type") =!= "DELETE") // untouched buckets may hold none anyway
      .select(col("o_orderkey"), col("o_totalprice"), col("es").as("version_es"))
      .orderBy(col("o_orderkey"))
  }

  /** Malformed-envelope handling (the adapter's dead-letter queue): the
    * feed is salted with broken JSON lines; PERMISSIVE parsing with a
    * corrupt-record column routes good rows onward and quarantines bad
    * ones — the pipeline neither crashes (FAILFAST) nor silently drops
    * (DROPMALFORMED). Counts + a digest of the quarantined lines prove
    * the routing. Map-side only.
    */
  private def cdcParseCorrupt(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField}
    val bad = {
      import s.implicits._
      Seq("{not json", "{\"id\": 1, \"table\":", "plain garbage").toDF("value")
    }
    val feed = envelopes(s, dir).unionByName(bad)
    val schemaWithCorrupt = StructType(
      envelopeSchema.fields :+ StructField("_corrupt", StringType))
    val parsed = feed.select(from_json(col("value"), schemaWithCorrupt,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))
      .as("m")).select(col("m.*"))
    parsed.agg(
      count(lit(1)).as("n_total"),
      count(when(col("_corrupt").isNull, 1)).as("n_good"),
      count(col("_corrupt")).as("n_quarantined"),
      sum(length(col("_corrupt"))).as("dlq_bytes"))
  }

  /** Binlog continuity monitoring: envelope ids are sequenced per
    * (table, type) stream by construction (orderkey·10 + kind), so a
    * missing id = a lost change event — the gap detector every CDC
    * deployment runs against GTID/offset sequences. One window pass per
    * stream (lag over id), emitting gap count + widest gap. The fixture
    * feed drops keys that fail the %3/%7 predicates, so the "gaps" are
    * known exactly and the oracle states them relationally.
    */
  private def cdcGapDetect(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("typ")).orderBy(col("id"))
    parsed(s, dir)
      .filter(col("table") === "orders" && !col("isDdl"))
      .select(col("type").as("typ"), col("id"))
      .withColumn("prev_id", lag(col("id"), 1).over(w))
      .withColumn("gap", (col("id") - col("prev_id")) / 10 - 1)
      .groupBy(col("typ"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("gap") > 0, col("gap")).otherwise(0)).cast("long")
          .as("missing_seqs"),
        max(when(col("gap") > 0, col("gap")).otherwise(0)).cast("long")
          .as("widest_gap"))
      .orderBy(col("typ"))
  }

  /** Schema DRIFT quarantine (valid JSON, wrong value type — the other
    * dirty-feed failure mode next to cdc_parse_corrupt's malformed
    * lines): envelopes whose price image no longer casts to the declared
    * decimal are detected by `cast yields null while the raw image is
    * non-null` and counted into quarantine instead of silently becoming
    * null columns downstream. Map-side detection, no extra pass.
    */
  private def cdcTypeDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bad = Seq(-100L, -101L, -102L).map(k =>
      s"""{"id":$k,"database":"demo","table":"orders","pkNames":["o_orderkey"],"isDdl":false,"type":"INSERT","es":1,"ts":501,"sql":"","mysqlType":{"o_orderkey":"bigint(20)","o_totalprice":"decimal(15,2)"},"data":[{"o_orderkey":"$k","o_totalprice":"CORRUPT"}],"old":null}""")
      .toDF("value")
    // the clean feed comes from the shared parse cache (one parse per
    // session/feed); only the 3 injected drift lines are parsed here
    def project(envs: DataFrame): DataFrame = envs
      .filter(col("table") === "orders" && !col("isDdl"))
      .select(posexplode(col("data")).as(Seq("pos", "img")))
      .select(col("img")("o_orderkey").cast("long").as("pk"),
        col("img")("o_totalprice").as("price_raw"),
        // try_cast, not cast: under ANSI semantics a malformed value must
        // quarantine as null, not kill the pipeline
        col("img")("o_totalprice").try_cast(DecimalType(15, 2)).as("price"))
    val typed = project(parsed(s, dir)).unionByName(project(
      bad.select(from_json(col("value"), envelopeSchema).as("m"))
        .select(col("m.*"))))
    val drifted = col("price").isNull && col("price_raw").isNotNull
    typed.agg(count(lit(1)).as("n_total"),
      count(when(drifted, 1)).as("n_drifted"),
      min(when(drifted, col("pk"))).as("first_drift_pk"))
  }

  /** Bootstrap-then-stream (the standard adapter deployment): an initial
    * snapshot of the destination table plus a change log that OVERLAPS
    * the snapshot (full replay). The merge is the same latest-per-key
    * window with the snapshot injected at es = −∞ — overlapping events
    * reduce to their latest version, pre-snapshot duplicates are
    * harmless, and no key is double-counted. Proves the bootstrap path
    * composes with the incremental path without a seam.
    */
  private def cdcBackfillMerge(s: SparkSession, dir: String): DataFrame = {
    val snapshot = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        lit(Long.MinValue).as("es"), lit(Long.MinValue).as("ts"),
        lit("SNAPSHOT").as("type"))
    // CDC began mid-life: the log only covers half the keyspace — the
    // snapshot must carry the untouched keys through the merge
    val changes = ordersTyped(s, dir)
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("es"), col("ts"),
        col("type"))
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("es").desc, col("ts").desc, col("type").desc, col("o_totalprice").desc)
    snapshot.unionByName(changes)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("type") =!= "DELETE")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Point-in-time restore (time travel) from the change log: the table
    * state AS OF es ≤ T is the latest surviving event per key at T —
    * exactly the ReplacingMergeTree merge with the version domain
    * truncated. One shuffle on pk; at 100 TB the es ≤ T predicate prunes
    * the log scan (es-partitioned log → partition pruning) before the
    * window runs. T is pinned to 1998-07-01T00:00Z, mid-range of the
    * fixture's orderdates (1995..2001), so all three event kinds straddle
    * the cut.
    */
  private val travelT = 899251200000L // 1998-07-01 00:00:00 UTC, epoch ms

  private def cdcTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("es").desc, col("ts").desc, col("type").desc, col("o_totalprice").desc)
    ordersTyped(s, dir)
      .filter(col("es") <= travelT)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("type") =!= "DELETE")
      .select(col("o_orderkey"), col("o_totalprice"), col("es").as("version_es"))
      .orderBy(col("o_orderkey"))
  }

  /** VersionedCollapsingMergeTree: every state row carries (sign, version);
    * a cancel row (−1) annihilates exactly the +1 row with the SAME
    * version, so the fold is correct under ARBITRARY arrival order —
    * unlike plain Collapsing, which trusts stream order. The adapter side
    * materializes cancel rows by copying the prior state (version AND
    * payload) via one lag() pass per key — exactly the bookkeeping a real
    * Canal consumer does from its own last-applied state. The merge itself
    * is a pure groupBy over (pk, version, payload): net = Σsign, survivors
    * net > 0, final state = max surviving version — no window over input
    * order anywhere downstream of the cancel-row derivation, which is the
    * out-of-order-safety claim made concrete.
    *
    * Scale notes: one shuffle on pk for the lag pass, one partial-agg
    * shuffle on (pk, version) for the merge — both key-clustered; at
    * cluster scale the merge runs incrementally inside foreachBatch
    * against bucketed state, same as stream_cdc_upsert.
    */
  private def cdcVersionedCollapse(s: SparkSession, dir: String): DataFrame = {
    // full tiebreak on the lag window too: the cancel-row derivation
    // (prev_es/prev_price) must pair deterministically under same-es
    // duplicates, or the survivor fix downstream repairs nothing
    val byVersion = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("es"), col("ts"), col("type"), col("o_totalprice"))
    val t = ordersTyped(s, dir)
      .select(col("type"), col("es"), col("ts"), col("o_orderkey"),
        col("o_totalprice"))
      .withColumn("prev_es", lag(col("es"), 1).over(byVersion))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(byVersion))
    val plus = t.filter(col("type") =!= "DELETE")
      .select(col("o_orderkey"), col("es").as("version"),
        col("o_totalprice"), lit(1).as("sign"))
    val minus = t.filter(col("type").isin("UPDATE", "DELETE"))
      .select(col("o_orderkey"), col("prev_es").as("version"),
        col("prev_price").as("o_totalprice"), lit(-1).as("sign"))
    // price tiebreak: two surviving groups tying on version (same-es
    // re-insert after delete) must pick ONE survivor deterministically
    val wLatest = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("version").desc, col("o_totalprice").desc)
    plus.unionByName(minus)
      .groupBy(col("o_orderkey"), col("version"), col("o_totalprice"))
      .agg(sum(col("sign")).as("net"))
      .filter(col("net") > 0)
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("version").as("version_es"))
      .orderBy(col("o_orderkey"))
  }

  /** Partial-column update (ClickHouse `ALTER TABLE ... UPDATE` mutation /
    * partial_update semantics): Canal UPDATE envelopes name the changed
    * columns in `old`, so the patch stream is (pk, column, new value,
    * version) — NOT a full row image. The operator applies the latest
    * patch per (pk, column) onto the base snapshot at read time: rows
    * never rewritten, untouched columns never moved. This is the
    * column-granular complement of cdc_upsert_latest (which replaces whole
    * rows).
    *
    * Scale notes: the patch stream is O(changed cells), usually orders of
    * magnitude smaller than the table; it aggregates to one map per
    * patched pk (partial-agg shuffle on pk) and joins the base on pk —
    * AQE broadcasts it when small. The base table is scanned once, never
    * shuffled (join key = its layout key at cluster scale).
    */
  private def cdcPartialUpdate(s: SparkSession, dir: String): DataFrame = {
    val wPatch = Window.partitionBy(col("o_orderkey"), col("col_name"))
      .orderBy(col("es").desc, col("ts").desc, col("new_val").desc)
    val patches = parsed(s, dir)
      .filter(col("table") === "orders" && col("type") === "UPDATE")
      .select(col("es"), col("ts"), col("old"),
        posexplode(col("data")).as(Seq("pos", "img")))
      // pair old[pos+1] with data[pos]: the old data[1]/old[1] spelling
      // silently DROPPED rows 2+ of a multi-row UPDATE envelope
      .select(col("es"), col("ts"),
        element_at(col("img"), "o_orderkey").cast("long").as("o_orderkey"),
        col("img"),
        explode(map_keys(oldImgAt)).as("col_name"))
      .select(col("o_orderkey"), col("col_name"), col("es"), col("ts"),
        element_at(col("img"), col("col_name")).as("new_val"))
      .withColumn("rn", row_number().over(wPatch))
      .filter(col("rn") === 1)
      .groupBy(col("o_orderkey"))
      .agg(map_from_entries(collect_list(struct(col("col_name"),
        col("new_val")))).as("patch"))
    Tables.orders(s, dir)
      .join(patches, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(element_at(col("patch"), "o_totalprice").cast("double"),
          col("o_totalprice")).as("o_totalprice"),
        col("patch").isNotNull.as("patched"))
      .orderBy(col("o_orderkey"))
  }

  /** Snapshot diff — reconcile a STALE REPLICA against the live state:
    * s1 is the initial-load image of a replica that stopped replicating
    * at [[travelT]] (INSERT rows up to T, never updated since); s2 is
    * today's ReplacingMergeTree state from the full changelog. Every key
    * classifies added / removed / changed / unchanged with the net price
    * delta per class — the audit a backfill or replica-repair job runs
    * BEFORE it writes anything, and the number it reports afterwards to
    * prove convergence.
    *
    * Scale notes: both sides share the changelog scan and its pk-window
    * shuffle; the diff join is pk-on-pk co-partitioned. Output is
    * O(classes).
    */
  private def cdcSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("es").desc, col("ts").desc, col("type").desc, col("o_totalprice").desc)
    val s1 = ordersTyped(s, dir)
      .filter(col("type") === "INSERT" && col("es") <= travelT)
      .select(col("o_orderkey"), col("o_totalprice").as("p1"))
    val s2 = ordersTyped(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("type") =!= "DELETE")
      .select(col("o_orderkey"), col("o_totalprice").as("p2"))
    s1.join(s2, Seq("o_orderkey"), "full_outer")
      .withColumn("class",
        when(col("p1").isNull, "added")
          .when(col("p2").isNull, "removed")
          .when(col("p1") =!= col("p2"), "changed")
          .otherwise("unchanged"))
      .groupBy(col("class"))
      .agg(count(lit(1)).as("n"),
        Det.dsum(coalesce(col("p2"), lit(0.0))
          - coalesce(col("p1"), lit(0.0))).as("price_delta"))
      .orderBy(col("class"))
  }

  /** Tombstone lifecycle (Kafka log-compaction `delete.retention.ms` /
    * ClickHouse `is_deleted` + `clean_deleted_rows` semantics): a
    * DELETE must survive as a TOMBSTONE long enough for late-arriving
    * duplicates of the deleted key to still collapse against it, then
    * get garbage-collected. Retention anchor: the stream's max es (the
    * compaction horizon); tombstones younger than 500 days stay, older
    * ones vanish with their key. Output = live rows plus retained
    * tombstones, each tagged — the exact state a compacted changelog
    * topic materializes to.
    *
    * Scale notes: same single pk-window pass as the upsert; the GC
    * predicate is a map-side filter against the broadcast horizon. No
    * extra shuffle for the lifecycle.
    */
  private def cdcTombstoneGc(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("es").desc, col("ts").desc, col("type").desc, col("o_totalprice").desc)
    val typed = ordersTyped(s, dir)
    val latest = typed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    // horizon from the RAW frame: the globally max-es event is always
    // rn=1 within its own key, so max(es) is identical — and aggregating
    // `latest` would re-evaluate the whole window subtree a second time
    // under the crossJoin
    val horizon = typed.agg(max(col("es")).as("h_es"))
    latest.crossJoin(broadcast(horizon))
      .filter(col("type") =!= "DELETE" ||
        col("es") > col("h_es") - lit(500L * 86400000L))
      .select(col("o_orderkey"),
        when(col("type") === "DELETE", lit(null).cast("double"))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        (col("type") === "DELETE").as("is_tombstone"),
        col("es").as("version_es"))
      .orderBy(col("o_orderkey"))
  }

  /** Transaction-consistent multi-table apply: a binlog transaction can
    * touch several tables, and consumers must never observe table A at
    * txn N with table B at txn N−1. Every publish writes COMPLETE new
    * states for ALL tables under one `v=N/` prefix, then flips a single
    * shared `_CURRENT` manifest via atomic rename — the commit point for
    * the whole set. A crash after some table writes but before the flip
    * leaves readers on the previous consistent PAIR (asserted in
    * StateMaintenanceSpec with a deliberately torn publish).
    *
    * Scale notes: data writes are ordinary distributed sinks, per-table
    * in parallel; the commit is one O(1) control-plane rename regardless
    * of table count — the same primitive every lakehouse table format
    * reduces to, here spanning tables.
    */
  private[graft] def txnPublish(root: String, n: Int,
      tables: Map[String, DataFrame]): Unit = {
    tables.foreach { case (t, df) => df.write.parquet(s"$root/v=$n/$t") }
    graft.Scratch.atomicPublish(
      new java.io.File(s"$root/_CURRENT").toPath, n.toString)
  }

  private[graft] def txnCurrent(root: String): Int =
    graft.Scratch.readManifest(s"$root/_CURRENT").trim.toInt

  private def cdcMultiTableTxn(s: SparkSession, dir: String): DataFrame = {
    val root = graft.Scratch.dir("mttxn")
    val cust = typeMapGeneric(parsed(s, dir), "customer")
    val v1Orders = ordersTyped(s, dir)
      .filter(col("type") === "INSERT")
      .select(col("o_orderkey"), col("o_totalprice"))
    txnPublish(root, 1, Map("orders" -> v1Orders, "customer" -> cust))
    txnPublish(root, 2,
      Map("orders" -> cdcDeleteFold(s, dir), "customer" -> cust))
    val n = txnCurrent(root)
    val o = s.read.parquet(s"$root/v=$n/orders")
      .agg(count(lit(1)).as("n_rows"),
        Det.dsum(col("o_totalprice")).as("sum_val"))
      .select(lit("orders").as("tbl"), col("n_rows"), col("sum_val"))
    val c = s.read.parquet(s"$root/v=$n/customer")
      .agg(count(lit(1)).as("n_rows"),
        Det.dsum(col("c_acctbal")).as("sum_val"))
      .select(lit("customer").as("tbl"), col("n_rows"), col("sum_val"))
    o.unionByName(c).orderBy(col("tbl"))
  }

  /** Ops/table/type counters + replication lag — the adapters' monitoring
    * surface (lag is ts − es, constant 500 ms by construction).
    */
  private def cdcChangelogStats(s: SparkSession, dir: String): DataFrame =
    parsed(s, dir)
      .filter(!col("isDdl"))
      .groupBy(col("table").as("tbl"), col("type").as("typ"))
      .agg(count(lit(1)).as("n"), Det.davg(col("ts") - col("es")).as("avg_lag_ms"))
      .orderBy(col("tbl"), col("typ"))

  // ---- oracles (relational restatement of the change script) ----

  private val parseOracle = """
    WITH ev AS (
      SELECT 'demo' AS db, 'orders' AS tbl, 'INSERT' AS typ,
             epoch_ms(o_orderdate) AS es, o_orderkey AS pk FROM orders
      UNION ALL
      SELECT 'demo', 'orders', 'UPDATE', epoch_ms(o_orderdate) + 86400000,
             o_orderkey FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT 'demo', 'orders', 'DELETE', epoch_ms(o_orderdate) + 172800000,
             o_orderkey FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT 'demo', 'customer', 'INSERT', 1000000000000 + c_custkey,
             c_custkey FROM customer)
    SELECT db, tbl, typ, CAST(es AS BIGINT) AS es, pk FROM ev
    ORDER BY tbl, typ, pk"""

  private val routeOracle = """
    WITH ev AS (
      SELECT 'demo' AS db, 'orders' AS tbl, 'INSERT' AS typ,
             epoch_ms(o_orderdate) AS es FROM orders
      UNION ALL
      SELECT 'demo', 'orders', 'UPDATE', epoch_ms(o_orderdate) + 86400000
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT 'demo', 'orders', 'DELETE', epoch_ms(o_orderdate) + 172800000
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT 'demo', 'customer', 'INSERT', 1000000000000 + c_custkey
      FROM customer)
    SELECT db, tbl, typ, COUNT(*) AS n, CAST(MIN(es) AS BIGINT) AS min_es,
           CAST(MAX(es) AS BIGINT) AS max_es
    FROM ev GROUP BY db, tbl, typ ORDER BY tbl, typ"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef("cdc_parse", cdcParse, Some(parseOracle)),
    QueryDef("cdc_parse_entry", cdcParseEntry, Some(parseOracle)),
    QueryDef("cdc_parse_entry_corrupt", cdcParseEntryCorrupt,
      Some("""WITH n AS (SELECT
                (SELECT COUNT(*) FROM orders)
                + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
                + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 0)
                + (SELECT COUNT(*) FROM customer) + 1 AS n_events)
              SELECT n_events + 3 AS n_total, n_events AS n_good,
                CAST(3 AS BIGINT) AS n_quarantined FROM n""")),
    QueryDef("cdc_txn_boundary", cdcTxnBoundary,
      Some("""WITH m AS (
                SELECT o_orderkey % 100 AS txn FROM orders
                UNION ALL
                SELECT o_orderkey % 100 FROM orders WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT o_orderkey % 100 FROM orders WHERE o_orderkey % 7 = 0)
              SELECT txn, COUNT(*) AS n_changes, COUNT(*) AS n_rows,
                TRUE AS complete
              FROM m GROUP BY txn ORDER BY txn""")),
    QueryDef("cdc_replication_lag", cdcReplicationLag,
      Some("""WITH seg AS (
                SELECT 'orders' AS table_name, 'INSERT' AS type,
                  COUNT(*) AS n,
                  MIN(epoch_ms(o_orderdate)) AS min_es,
                  MAX(epoch_ms(o_orderdate)) AS max_es FROM orders
                UNION ALL
                SELECT 'orders', 'UPDATE', COUNT(*),
                  MIN(epoch_ms(o_orderdate)) + 86400000,
                  MAX(epoch_ms(o_orderdate)) + 86400000
                FROM orders WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT 'orders', 'DELETE', COUNT(*),
                  MIN(epoch_ms(o_orderdate)) + 172800000,
                  MAX(epoch_ms(o_orderdate)) + 172800000
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT 'customer', 'INSERT', COUNT(*),
                  1000000000000 + MIN(c_custkey),
                  1000000000000 + MAX(c_custkey) FROM customer),
              head AS (SELECT MAX(max_es) AS h FROM seg)
              SELECT table_name, type, n, min_es, max_es,
                h - max_es AS lag_behind_head,
                CAST(500 AS BIGINT) AS proc_lag_ms
              FROM seg, head ORDER BY table_name, type""")),
    QueryDef("cdc_schema_registry", cdcSchemaRegistry,
      Some("""WITH v1 AS (SELECT 'orders' AS table_name, 1 AS version,
                (SELECT MIN(epoch_ms(o_orderdate)) FROM orders)
                  AS valid_from_es,
                (SELECT COUNT(*) FROM orders) AS n_records, 6 AS n_cols,
                'o_custkey,o_orderdate,o_orderkey,o_orderpriority,o_orderstatus,o_totalprice'
                  AS added_cols),
              v2 AS (SELECT 'orders', 2,
                (SELECT MIN(epoch_ms(o_orderdate)) + 86400000 FROM orders
                  WHERE o_orderkey % 3 = 0),
                (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0),
                7, 'o_note')
              SELECT * FROM v1 UNION ALL SELECT * FROM v2
              ORDER BY version""")),
    QueryDef("cdc_route", cdcRoute, Some(routeOracle)),
    QueryDef("cdc_type_map", cdcTypeMap,
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
              FROM orders ORDER BY o_orderkey""")),
    QueryDef("cdc_upsert_latest", cdcUpsertLatest,
      Some("""SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice,
               CAST(CASE WHEN o_orderkey % 3 = 0
                    THEN epoch_ms(o_orderdate) + 86400000
                    ELSE epoch_ms(o_orderdate) END AS BIGINT) AS version_es
              FROM orders ORDER BY o_orderkey""")),
    QueryDef("cdc_delete_fold", cdcDeleteFold,
      Some("""SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice
              FROM orders WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey""")),
    QueryDef("cdc_versioned_collapse", cdcVersionedCollapse,
      Some("""SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice,
               CAST(CASE WHEN o_orderkey % 3 = 0
                    THEN epoch_ms(o_orderdate) + 86400000
                    ELSE epoch_ms(o_orderdate) END AS BIGINT) AS version_es
              FROM orders WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey""")),
    QueryDef("cdc_tombstone_gc", cdcTombstoneGc,
      Some("""WITH lat AS (SELECT o_orderkey, o_totalprice,
                 epoch_ms(o_orderdate) + CASE
                   WHEN o_orderkey % 7 = 0 THEN 172800000
                   WHEN o_orderkey % 3 = 0 THEN 86400000
                   ELSE 0 END AS es,
                 o_orderkey % 7 = 0 AS del,
                 CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                      ELSE o_totalprice END AS price
                 FROM orders),
               h AS (SELECT MAX(es) AS h_es FROM lat)
              SELECT o_orderkey,
                CASE WHEN del THEN NULL ELSE price END AS o_totalprice,
                del AS is_tombstone,
                CAST(es AS BIGINT) AS version_es
              FROM lat, h
              WHERE NOT del OR es > h_es - 43200000000
              ORDER BY o_orderkey""")),
    QueryDef("cdc_multi_table_txn", cdcMultiTableTxn,
      Some(s"""WITH o AS (SELECT CASE WHEN o_orderkey % 3 = 0
                 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS p
                 FROM orders WHERE o_orderkey % 7 <> 0),
               c AS (SELECT CAST(CAST(c_acctbal AS DECIMAL(15,2)) AS DOUBLE)
                 AS b FROM customer)
              SELECT 'customer' AS tbl, (SELECT COUNT(*) FROM c) AS n_rows,
                (SELECT ${Det.oSum("b")} FROM c) AS sum_val
              UNION ALL
              SELECT 'orders', (SELECT COUNT(*) FROM o),
                (SELECT ${Det.oSum("p")} FROM o)
              ORDER BY tbl""")),
    QueryDef("cdc_snapshot_diff", cdcSnapshotDiff,
      Some(s"""WITH s1 AS (SELECT o_orderkey, o_totalprice AS p1
                 FROM orders WHERE epoch_ms(o_orderdate) <= $travelT),
               s2 AS (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                      ELSE o_totalprice END AS p2
                 FROM orders WHERE o_orderkey % 7 <> 0),
               j AS (SELECT
                 CASE WHEN p1 IS NULL THEN 'added'
                      WHEN p2 IS NULL THEN 'removed'
                      WHEN p1 <> p2 THEN 'changed'
                      ELSE 'unchanged' END AS class,
                 COALESCE(p2, 0) - COALESCE(p1, 0) AS delta
                 FROM s1 FULL JOIN s2 USING (o_orderkey))
              SELECT class, COUNT(*) AS n,
                ${Det.oSum("delta")} AS price_delta
              FROM j GROUP BY class ORDER BY class""")),
    QueryDef("cdc_partial_update", cdcPartialUpdate,
      Some("""SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice,
               (o_orderkey % 3 = 0) AS patched
              FROM orders ORDER BY o_orderkey""")),
    QueryDef("cdc_scd2", cdcScd2,
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
    QueryDef("cdc_ddl_filter", cdcDdlFilter,
      Some(s"""SELECT 'demo' AS db, 'orders' AS tbl,
               '$ddlSql' AS sql_text, CAST(0 AS BIGINT) AS es""")),
    QueryDef("cdc_type_map_generic", cdcTypeMapGeneric,
      Some("""SELECT c_custkey, c_name, c_nationkey,
               CAST(CAST(c_acctbal AS DECIMAL(15,2)) AS DOUBLE) AS c_acctbal,
               c_mktsegment
              FROM customer ORDER BY c_custkey""")),
    QueryDef("cdc_ddl_apply", cdcDdlApply,
      Some("""SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_note
              FROM orders ORDER BY o_orderkey""")),
    QueryDef("cdc_old_diff", cdcOldDiff,
      Some(s"""SELECT 'o_totalprice' AS col_name, COUNT(*) AS n_changes,
               ${Det.oAvg("o_totalprice")} AS avg_old,
               ${Det.oAvg("o_totalprice + 1000.0")} AS avg_new
              FROM orders WHERE o_orderkey % 3 = 0""")),
    QueryDef("cdc_type_map_decimal", cdcTypeMapDecimal,
      Some("""SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DECIMAL(38,2))
                 AS sum_price,
               MAX(CAST(o_totalprice AS DECIMAL(15,2))) AS max_price,
               COUNT(*) AS n
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),
    QueryDef("cdc_compact", cdcCompact,
      Some("""SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice,
               CAST(CASE WHEN o_orderkey % 3 = 0
                    THEN epoch_ms(o_orderdate) + 86400000
                    ELSE epoch_ms(o_orderdate) END AS BIGINT) AS version_es
              FROM orders WHERE o_orderkey % 7 <> 0
              ORDER BY o_orderkey""")),
    // oracle restates the fold per source order with the SAME IEEE double
    // expressions the envelopes carry ((p + 1000.0) - p, not a literal
    // 1000), each term decimal-cast exactly as Det.dsum does per row
    QueryDef("cdc_summing_mv", cdcSummingMv,
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
    QueryDef("cdc_parse_corrupt", cdcParseCorrupt,
      Some("""WITH n AS (
                SELECT (SELECT COUNT(*) FROM orders)
                  + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
                  + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 0)
                  + (SELECT COUNT(*) FROM customer) + 1 AS good)
              SELECT good + 3 AS n_total, good AS n_good,
                CAST(3 AS BIGINT) AS n_quarantined,
                CAST(40 AS BIGINT) AS dlq_bytes
              FROM n""")),
    QueryDef("cdc_gap_detect", cdcGapDetect,
      Some("""WITH ev AS (
                SELECT 'INSERT' AS typ, o_orderkey*10 AS id FROM orders
                UNION ALL
                SELECT 'UPDATE', o_orderkey*10+1 FROM orders
                WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT 'DELETE', o_orderkey*10+2 FROM orders
                WHERE o_orderkey % 7 = 0),
              g AS (SELECT typ, id,
                (id - lag(id) OVER (PARTITION BY typ ORDER BY id)) // 10 - 1
                  AS gap FROM ev)
              SELECT typ, COUNT(*) AS n_events,
                CAST(SUM(CASE WHEN gap > 0 THEN gap ELSE 0 END) AS BIGINT)
                  AS missing_seqs,
                CAST(MAX(CASE WHEN gap > 0 THEN gap ELSE 0 END) AS BIGINT)
                  AS widest_gap
              FROM g GROUP BY typ ORDER BY typ""")),
    QueryDef("cdc_type_drift", cdcTypeDrift,
      Some("""SELECT (SELECT COUNT(*) FROM orders)
                + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
                + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 0)
                + 3 AS n_total,
               CAST(3 AS BIGINT) AS n_drifted,
               CAST(-102 AS BIGINT) AS first_drift_pk""")),
    QueryDef("cdc_backfill_merge", cdcBackfillMerge,
      Some("""SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 3 = 0
                    THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice
              FROM orders
              WHERE NOT (o_orderkey % 2 = 0 AND o_orderkey % 7 = 0)
              ORDER BY o_orderkey""")),
    QueryDef("cdc_time_travel", cdcTimeTravel,
      Some("""WITH ev AS (
                SELECT o_orderkey, o_totalprice AS price,
                       epoch_ms(o_orderdate) AS es, 1 AS keep FROM orders
                UNION ALL
                SELECT o_orderkey, o_totalprice + 1000.0,
                       epoch_ms(o_orderdate) + 86400000, 1
                FROM orders WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT o_orderkey, NULL,
                       epoch_ms(o_orderdate) + 172800000, 0
                FROM orders WHERE o_orderkey % 7 = 0),
              f AS (SELECT * FROM ev WHERE es <= 899251200000),
              r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                      ORDER BY es DESC) AS rn FROM f)
              SELECT o_orderkey, price AS o_totalprice,
                     CAST(es AS BIGINT) AS version_es
              FROM r WHERE rn = 1 AND keep = 1
              ORDER BY o_orderkey""")),
    QueryDef("cdc_changelog_stats", cdcChangelogStats,
      Some("""WITH ev AS (
                SELECT 'orders' AS tbl, 'INSERT' AS typ FROM orders
                UNION ALL
                SELECT 'orders', 'UPDATE' FROM orders WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT 'orders', 'DELETE' FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT 'customer', 'INSERT' FROM customer)
              SELECT tbl, typ, COUNT(*) AS n, CAST(500.0 AS DOUBLE) AS avg_lag_ms
              FROM ev GROUP BY tbl, typ ORDER BY tbl, typ""")),
  )
}
