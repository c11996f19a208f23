package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.9 Scalar function families — one umbrella query per family, all
  * codegen'd built-ins (functions._), no UDFs.
  *
  * Cross-engine notes baked into the oracles: DuckDB dayofweek is
  * 0=Sunday vs Spark 1=Sunday; DuckDB floor(double)→double vs Spark
  * →bigint; DuckDB epoch()→double vs Spark unix_timestamp→bigint;
  * transcendentals (ln/log10) are rounded to 6dp since libm
  * implementations may differ in the last ulp.
  */
object Fns {

  /** ClickHouse `bar(x, min, max, width)` — the ops-dashboard ASCII
    * sparkline: daily purchase volume rendered as a '#' bar scaled to
    * the day-range maximum. Pure integer/string math (floor of a
    * width-scaled ratio + repeat), so the rendered strings hash-match
    * cross-engine; the whole render rides the daily rollup (O(days)),
    * raw events contribute map-side partial counts only.
    */
  private def fnBar(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("mx", max(col("n")).over(all))
      .select(col("day"), col("n"),
        repeat(lit("#"),
          floor(col("n") * lit(40) / col("mx")).cast("int")).as("bar"))
      .orderBy(col("day"))
  }

  private def fnString(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        length(col("c_name")).as("name_len"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"),
        regexp_replace(col("c_name"), "^Customer#0*", "").as("id_str"),
        regexp_extract(col("c_name"), "([1-9][0-9]*)$", 1).as("id_tail"),
        lpad(col("c_mktsegment"), 12, ".").as("seg_pad"),
        trim(lit("  x  ")).as("trimmed"),
        col("c_name").like("%42%").as("has42"),
        size(split(col("c_name"), "#")).as("n_parts"))
      .orderBy(col("c_custkey"))

  private def fnDate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .as("days_since_95"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  /** ClickHouse `age('unit', start, end)` — COMPLETE units elapsed, the
    * semantics that differ from dateDiff's boundary-crossing count: a
    * month is counted only once the end day-of-month reaches the start
    * day-of-month (1998-01-31 → 1998-11-15 is 9 complete months, not
    * the 10 month-boundaries crossed). Spelled as exact integer
    * calendar arithmetic — year·12+month difference minus the
    * incomplete-month correction — identically on both engines; years
    * derive from complete months by integer division.
    *
    * Scale notes: pure map-side codegen'd projection, no shuffle.
    */
  private def fnAge(s: SparkSession, dir: String): DataFrame = {
    val ref = lit("1998-11-15").cast("date")
    val d = to_date(col("o_orderdate"))
    val ageMonths = ((year(ref) * 12 + month(ref))
      - (year(d) * 12 + month(d))
      - when(dayofmonth(ref) < dayofmonth(d), 1).otherwise(0)).cast("long")
    Tables.orders(s, dir)
      // start ≤ ref: "complete units ELAPSED" is defined forward in
      // time, and the synthetic order dates extend past the reference —
      // a signed variant would also hit the floor-vs-truncate integer
      // division split on negatives (DuckDB -1//12 = 0, floor = -1)
      .filter(d <= ref)
      .select(
        col("o_orderkey"),
        d.as("start_day"),
        datediff(ref, d).cast("long").as("age_days"),
        ageMonths.as("age_months"),
        floor(ageMonths / 12).cast("long").as("age_years"))
      .orderBy(col("o_orderkey"))
  }

  private def fnMath(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        // exact-cents 1dp HALF_UP: cents are exact integers (2dp fixture
        // invariant), so (cents + 5) div 10 rounds without any
        // double-round — round(double, 1) was the class-3 midpoint
        // split (Spark rounds the shortest decimal string, DuckDB the
        // exact binary value; every price ending in .x5 sits on it).
        // Sign-explicit (r12 ADVICE): round |cents| and reapply the
        // sign, so negatives get HALF_UP away-from-zero on BOTH engines
        // — a bare (cents + 5) div 10 rounded negatives toward
        // +infinity, and the two spellings even disagreed with each
        // other there (Spark div truncates toward zero, DuckDB //
        // floors); non-negative operands make the two divisions equal
        (expr("""((case when l_extendedprice < 0 then -1 else 1 end) *
             ((abs(cast(cast(l_extendedprice as decimal(30,2)) * 100
               as bigint)) + 5) div 10))""").cast("double") / 10.0)
          .as("price_r1"),
        floor(col("l_extendedprice")).as("price_floor"),
        // round to 6dp BEFORE ceil: 0.07*100 is 7.000000000000001 in
        // IEEE double, so a bare ceil reports 8 for a 7% discount on
        // BOTH engines — consistent but semantically wrong
        ceil(round(col("l_discount") * 100, 6)).as("disc_pct_ceil"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        round(log(col("l_extendedprice") + 1), 6).as("price_ln"),
        round(log10(col("l_extendedprice") + 1), 6).as("price_log10"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        signum(col("l_quantity") - 25).cast("int").as("qty_sign"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_quantity"), col("l_discount") * 100).as("l"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // lineitem, and lossy tie-breakers (1dp round, |q-25|) leave
      // distinct rows tied at the LIMIT boundary — sort by EVERY
      // output column so ties are bit-identical rows and the 5000-row
      // cut cannot diverge cross-engine
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_r1"),
        col("qty_dev"), col("qty_sq"), col("disc_pct_ceil"),
        col("price_floor"), col("price_sqrt"), col("price_ln"),
        col("price_log10"), col("key_mod7"), col("qty_sign"),
        col("g"), col("l"))
      .limit(5000)

  private def fnArray(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("arr", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("arr")).as("n_tokens"),
        element_at(col("arr"), 1).as("first_token"),
        size(array_distinct(col("arr"))).as("n_distinct"),
        array_contains(col("arr"), "spark").as("has_spark"),
        // arrays leave as canonical CSV strings (comparator hashes scalars)
        array_join(slice(sort_array(array_distinct(col("arr"))), 1, 3), ",")
          .as("top3_alpha"),
        aggregate(transform(col("arr"), x => length(x)), lit(0), _ + _)
          .as("sum_token_len"),
        size(filter(col("arr"), x => length(x) > 4)).as("n_long_tokens"))
      .orderBy(col("doc_id"))

  private def fnMap(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("m", map(lit("seg"), col("c_mktsegment"),
        lit("name"), col("c_name")))
      .select(
        col("c_custkey"),
        size(col("m")).as("m_size"),
        element_at(col("m"), "seg").as("seg"),
        concat_ws(",", sort_array(map_keys(col("m")))).as("keys_sorted"),
        map_contains_key(col("m"), "name").as("has_name"))
      .orderBy(col("c_custkey"))

  private def fnJson(s: SparkSession, dir: String): DataFrame = {
    val parsed = from_json(col("props"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType))))
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        parsed.getField("k").as("k_int"),
        (parsed.getField("k") % 10).as("k_mod10"))
      .orderBy(col("event_id"))
  }

  private def fnCond(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
          .as("seg_or_other"),
        nvl(nullif(col("c_name"), col("c_name")), lit("anon")).as("anon"))
      .groupBy(col("tier"), col("seg_or_other"), col("anon"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("tier"), col("seg_or_other"), col("anon"))

  /** Bit manipulation family (ClickHouse bitAnd/bitOr/bitXor/bitShift*). */
  private def fnBitwise(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(255)).as("low_byte"),
        (col("o_orderkey").bitwiseOR(col("o_custkey"))).as("k_or"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("k_xor"),
        shiftleft(col("o_orderkey"), 2).as("shl2"),
        shiftright(col("o_orderkey"), 3).as("shr3"),
        bitwise_not(col("o_orderkey")).as("k_not"),
        bit_count(col("o_orderkey")).as("popcount"))
      .orderBy(col("o_orderkey"))

  /** Encoding family: base64 / hex roundtrips (ClickHouse
    * base64Encode/hex) — binary-safe transport of blobs in text formats.
    */
  private def fnEncode(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        base64(col("c_name").cast("binary")).as("name_b64"),
        unbase64(base64(col("c_name").cast("binary"))).cast("string")
          .as("name_roundtrip"),
        lower(hex(col("c_mktsegment").cast("binary"))).as("seg_hex"),
        unhex(hex(col("c_mktsegment").cast("binary"))).cast("string")
          .as("seg_roundtrip"))
      .orderBy(col("c_custkey"))

  /** Hash family (ClickHouse MD5/SHA256/sipHash-class surface): the
    * digests every dedup/bucketing path keys on, as codegen'd built-ins
    * over customer names — md5 hex, sha256 hex, and the first 4 digest
    * BYTES (8 hex chars — 16 would overflow conv's signed-long parse)
    * reinterpreted as an unsigned-ish bucket id (the content-addressed
    * shard key pattern). Map-side only.
    */
  private def fnHash(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        md5(col("c_name").cast("binary")).as("name_md5"),
        sha2(col("c_name").cast("binary"), 256).as("name_sha256"),
        (conv(substring(md5(col("c_name").cast("binary")), 1, 8), 16, 10)
          .cast("long") % 1024).as("md5_bucket"))
      .orderBy(col("c_custkey"))

  /** URL family (ClickHouse URL functions: domain/path/
    * extractURLParameter/cutQueryStringAndFragment): parse a URL built
    * deterministically from fixture columns, extract components with
    * Spark's codegen'd `parse_url`, and produce the canonical form a
    * crawl-dedup pipeline keys on (lowercased host, tracking params
    * stripped, fragment cut). Map-side only — no shuffle except the
    * presentation sort; at corpus scale canonicalization feeds
    * dedup_exact_hash unchanged.
    */
  /** ONE definition of the synthetic URL both URL operators parse —
    * twinned spellings drift (the syntheticIp rule). fn_url takes the
    * fragment suffix (it exercises QUERY/fragment cutting);
    * fn_url_hierarchy takes the bare form.
    */
  private def syntheticUrl(withFragment: Boolean): Column = {
    val base = concat(lit("https://WWW.Example"), col("doc_id") % 7,
      lit(".COM/"), col("source"), lit("/a"), col("doc_id"),
      lit("?utm_source=feed&id="), col("doc_id"))
    if (withFragment) concat(base, lit("&ref=x#s"), col("doc_id") % 3)
    else base
  }

  private def fnUrl(s: SparkSession, dir: String): DataFrame = {
    val url = syntheticUrl(withFragment = true)
    Tables.documents(s, dir)
      .select(col("doc_id"), url.as("url"))
      .select(
        col("doc_id"),
        col("url"),
        parse_url(col("url"), lit("PROTOCOL")).as("proto"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query_str"),
        parse_url(col("url"), lit("QUERY"), lit("id")).as("id_param"))
      .withColumn("canonical",
        concat(lit("https://"), lower(col("host")), col("path"),
          lit("?id="), col("id_param")))
      .orderBy(col("doc_id"))
  }

  /** ClickHouse `URLHierarchy`: a URL expands to its progressively
    * deeper prefixes (site, site/section, site/section/page) — the
    * aggregation key family behind per-section traffic rollups, where
    * grouping by each hierarchy level turns one scan into every depth's
    * report. Map-side generate (sequence + slice over path segments),
    * output O(rows × depth), no shuffle before the consumer's groupBy.
    */
  private def fnUrlHierarchy(s: SparkSession, dir: String): DataFrame = {
    val url = syntheticUrl(withFragment = false)
    Tables.documents(s, dir)
      .select(col("doc_id"), url.as("url"))
      .withColumn("host", parse_url(col("url"), lit("HOST")))
      .withColumn("segs",
        expr("filter(split(parse_url(url, 'PATH'), '/'), x -> x != '')"))
      .select(col("doc_id"),
        posexplode(expr(
          """transform(sequence(0, size(segs)), i ->
               if(i = 0, concat('https://', host),
                  concat('https://', host, '/',
                    array_join(slice(segs, 1, i), '/'))))""")))
      .select(col("doc_id"), col("pos").as("depth"), col("col").as("prefix"))
      .orderBy(col("doc_id"), col("depth"))
  }

  /** IPv4 family (ClickHouse IPv4StringToNum/IPv4NumToString/toIPv4):
    * string↔numeric codec via the native codegen'd [[graft.functions
    * .Ipv4ToLong]]/[[graft.functions.LongToIpv4]] expressions, plus /16
    * subnet extraction — the grouping key of every access-log rollup.
    * The oracle recomputes the packing arithmetically from the octets,
    * so the expression pair is proven against first principles, not
    * against itself (roundtrip asserts decode∘encode = id).
    */
  /** The synthetic per-user IPv4 shared by fn_ip and fn_cidr (and
    * re-derived octet-by-octet in both oracles): one definition so the
    * two operators and their oracles cannot drift apart.
    */
  private def syntheticIp: Column = concat_ws(".",
    ((col("user_id") % 223) + 1).cast("string"),
    ((col("user_id") * 7) % 256).cast("string"),
    ((col("user_id") * 13) % 256).cast("string"),
    (col("user_id") % 256).cast("string"))

  private def fnIp(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val ip = syntheticIp
    Tables.events(s, dir)
      .select(col("user_id")).distinct()
      .select(col("user_id"), ip.as("ip"))
      .select(
        col("user_id"), col("ip"),
        expr("ipv4_to_long(ip)").as("ip_num"),
        expr("long_to_ipv4(ipv4_to_long(ip))").as("ip_roundtrip"),
        expr("long_to_ipv4((ipv4_to_long(ip) div 65536) * 65536)")
          .as("subnet16"),
        expr("ipv4_to_long('999.1.2.3')").as("bad_is_null"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse `isIPAddressInRange` — CIDR membership over the native
    * ipv4 codec: ip ∈ net/p ⇔ the two addresses agree on the top p bits
    * (one shift-compare, codegen'd). The oracle re-derives the packed
    * address from the octets arithmetically, proving codec AND range
    * check against first principles.
    */
  private def fnCidr(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val ip = syntheticIp
    Tables.events(s, dir)
      .select(col("user_id")).distinct()
      .select(col("user_id"), ip.as("ip"))
      .select(col("user_id"), col("ip"),
        expr("ipv4_to_long(ip) div 16777216 = ipv4_to_long('10.0.0.0') div 16777216")
          .as("in_10_8"),
        expr("ipv4_to_long(ip) div 1048576 = ipv4_to_long('172.16.0.0') div 1048576")
          .as("in_172_16_12"),
        expr("ipv4_to_long(ip) div 65536 = ipv4_to_long('192.168.0.0') div 65536")
          .as("in_192_168_16"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse array-fold family — `arrayCumSum`, `arrayDifference`,
    * `arrayZip` — as Catalyst higher-order functions over each order's
    * line-quantity array (assembled once, sorted on (l_linenumber,
    * l_quantity) — l_linenumber is NOT unique per order in the
    * synthetic fixture, so the quantity tiebreak is load-bearing).
    * Quantities are integral fixture doubles, so the bigint
    * casts agree across engines and every fold is exact integer math.
    * Arrays leave as canonical CSV strings (comparator hashes scalars).
    *
    * Scale notes: one partial-agg shuffle to assemble per-key arrays
    * (bounded: ≤17 lines/order measured at sf0.1 — the synthetic
    * lineitem packs more lines per order than real TPC-H's 7); the
    * folds are map-side HOFs inside whole-stage codegen — no UDF, no
    * reshuffles.
    */
  private def fnArrayFold(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(expr("array_sort(collect_list(struct(l_linenumber, l_quantity)))")
        .as("xs"))
      .select(col("l_orderkey"),
        // floor, not a bare cast: Spark's double→bigint cast truncates
        // while DuckDB's rounds (the agg_sum_map rule) — latent until a
        // testdata drop ships non-integral quantities
        expr("transform(xs, x -> cast(floor(x.l_quantity) as bigint))")
          .as("q"),
        expr("transform(xs, x -> x.l_linenumber)").as("ln"))
      .select(col("l_orderkey"), size(col("q")).as("n_lines"),
        // one accumulate pass (the fnArrayDelta cum_arr form), not a
        // per-index slice re-aggregation: n additions instead of
        // n(n+1)/2 for bit-identical exact-integer prefix sums
        expr("""array_join(transform(
               slice(aggregate(q, array(cast(0 as bigint)),
                 (acc, x) -> concat(acc, array(element_at(acc, -1) + x))),
                 2, size(q)),
               x -> cast(x as string)), ',')""").as("cum_qty"),
        expr("""array_join(transform(sequence(1, size(q)),
               i -> if(i = 1, cast(0 as bigint),
                 element_at(q, i) - element_at(q, i - 1))), ',')""")
          .as("diff_qty"),
        expr("""array_join(zip_with(ln, q,
               (a, b) -> concat(cast(a as string), ':',
                 cast(b as string))), ',')""").as("zip_ln_qty"))
      .orderBy(col("l_orderkey"))

  /** Regex scalar family (ClickHouse `countMatches` /
    * `extractAll` / `replaceRegexpAll` / `match`) over the customer-name
    * pattern domain. Patterns stay in the basic class ([0-9]+, literal
    * substrings) that Java regex (Spark) and RE2 (DuckDB) interpret
    * identically — dialect-divergent features (\\b, lookaround) are
    * deliberately excluded from the oracle surface.
    *
    * Scale notes: pure map-side codegen'd projection, no shuffle.
    */
  private def fnRegex(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        regexp_count(col("c_name"), lit("[0-9]+")).as("n_num_runs"),
        array_join(regexp_extract_all(col("c_name"), lit("[0-9]+"), lit(0)),
          ",").as("nums_csv"),
        regexp_extract(col("c_name"), "([1-9][0-9]*)", 1).as("first_nonzero"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        col("c_name").rlike("42").cast("int").as("has_42"),
        regexp_count(lower(col("c_mktsegment")), lit("[aeiou]"))
          .as("n_vowels"))
      .orderBy(col("c_custkey"))

  /** ClickHouse `normalizeQuery` / `normalizedQueryHash` — query-log
    * fingerprinting: string literals and numeric literals collapse to
    * `?` and literal LISTS to `?..`, so structurally-identical queries
    * group under one fingerprint regardless of their parameter values
    * (the system.query_log analysis workflow). Two deterministic query
    * shapes are rendered per order row (a SELECT with an IN-list and an
    * UPDATE — INTEGER parameters only: integer→string rendering is
    * identical across engines, double formatting is not), then the
    * normalization chain runs: quoted strings → `?`, numbers → `?`
    * (leading-context alternation, since RE2 lacks lookbehind),
    * `?, ?, …` lists → `?..`. Fingerprint = md5 of the normalized text.
    *
    * Scale notes: pure map-side codegen'd projection + one hash
    * aggregate over O(distinct shapes) groups — the 100 TB query log
    * reduces to its fingerprint dictionary in a single pass.
    */
  private def fnNormalizeQuery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val raw = o.select(
      concat(lit("SELECT * FROM t WHERE k = "), col("o_orderkey"),
        lit(" AND p = '"), col("o_orderpriority"),
        lit("' AND id IN ("), col("o_orderkey"), lit(", "),
        (col("o_orderkey") + 1), lit(", "), (col("o_orderkey") + 2),
        lit(")")).as("q"))
      .unionByName(o.select(
        concat(lit("UPDATE t SET v = "), (col("o_orderkey") + 7),
          lit(" WHERE k = "), col("o_orderkey")).as("q")))
    val nq = regexp_replace(
      regexp_replace(
        regexp_replace(col("q"), "'[^']*'", "?"),
        "(^|[^a-zA-Z0-9_])[0-9]+(\\.[0-9]+)?", "$1?"),
      "\\?(\\s*,\\s*\\?)+", "?..")
    raw.select(nq.as("normalized"))
      .groupBy(col("normalized"))
      .agg(count(lit(1)).as("n"))
      .select(col("normalized"), md5(col("normalized")).as("fingerprint"),
        col("n"))
      .orderBy(col("normalized"))
  }

  /** ClickHouse `mortonEncode` / `mortonDecode` — the bit-interleaved
    * space-filling curve underlying z-order clustered layouts, made
    * user-visible as scalars: two 16-bit coordinates interleave into
    * one 32-bit code whose lexicographic order preserves 2-D locality,
    * and decode de-interleaves exactly. Encode REUSES sink_zorder's
    * [[Scans.zSpread16]] mask-shift rounds and decode its new inverse
    * [[Scans.zCompact16]] — plain bitwise column ops inside
    * whole-stage codegen (an aggregate() HOF fold would compute the
    * same integers but is CodegenFallback and ~10× the per-row ops).
    * The roundtrip identity rides in the result columns; the oracle
    * recomputes both directions as per-bit sums (disjoint bit
    * positions, so sum IS or — mathematically identical integers).
    *
    * Scale notes: map-side projection, no shuffle; this is the exact
    * key computation a 100 TB z-order write performs per row.
    */
  private def fnMorton(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scans.{zCompact16, zSpread16}
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        (col("c_custkey").bitwiseAND(lit(65535L))).cast("long").as("x"),
        ((col("c_custkey") * 7919).bitwiseAND(lit(65535L))).cast("long")
          .as("y"))
      .withColumn("morton",
        zSpread16(col("x")).bitwiseOR(shiftleft(zSpread16(col("y")), 1)))
      .withColumn("x_rt", zCompact16(col("morton")))
      .withColumn("y_rt", zCompact16(shiftright(col("morton"), 1)))
      .orderBy(col("c_custkey"))
  }

  /** ClickHouse `arrayRotateLeft/Right` / `arrayShiftLeft/Right` — the
    * array-manipulation quartet: rotation is modular (elements wrap),
    * shift drops and back/front-fills with a filler. Fixed n = 8
    * window (rows with ≥ 8 tokens), so every variant is two slices —
    * a concat of array slices on both engines, no per-element lambda.
    * Arrays leave as joined strings (comparator rule).
    */
  private def fnArrayRotate(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("a", expr("slice(split(text, ' '), 1, 8)"))
      .filter(size(col("a")) === 8)
      .select(col("doc_id"),
        expr("array_join(a, ',')").as("tokens"),
        expr("array_join(concat(slice(a, 3, 6), slice(a, 1, 2)), ',')")
          .as("rot_left2"),
        expr("array_join(concat(slice(a, 7, 2), slice(a, 1, 6)), ',')")
          .as("rot_right2"),
        expr("""array_join(concat(slice(a, 3, 6), array('_', '_')), ',')""")
          .as("shift_left2"),
        expr("""array_join(concat(array('_', '_'), slice(a, 1, 6)), ',')""")
          .as("shift_right2"))
      .orderBy(col("doc_id"))

  /** ClickHouse `arrayEnumerateUniq` / `arrayEnumerateDense` — per-token
    * occurrence numbering (1st/2nd/… appearance of each value) and
    * first-appearance dense rank, emitted as canonical CSV strings. Both
    * are prefix-window HOFs over the (capped) token array: occ(i) =
    * 1 + |equal values before i|, dense(i) = |distinct prefix up to the
    * value's FIRST occurrence| — the latter formulated via
    * array_position so neither engine's distinct-ordering matters.
    *
    * Scale notes: pure map-side projection; the 40-token cap bounds the
    * per-row O(n²) prefix scans the way text_pmi_cooccur's vocab cap
    * bounds its pair domain (real corpora would window the same way).
    */
  private def fnArrayEnumerate(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("arr", expr("slice(split(text, ' '), 1, 40)"))
      .filter(size(col("arr")) >= 1)
      .select(col("doc_id"), size(col("arr")).as("n_tokens"),
        expr("""array_join(transform(sequence(1, size(arr)),
               i -> cast(1 + size(filter(slice(arr, 1, i - 1),
                 x -> x = element_at(arr, i))) as string)), ',')""")
          .as("occ_idx"),
        expr("""array_join(transform(sequence(1, size(arr)),
               i -> cast(size(array_distinct(slice(arr, 1,
                 array_position(arr, element_at(arr, i)))))
                 as string)), ',')""")
          .as("dense_idx"))
      .orderBy(col("doc_id"))

  /** ClickHouse `multiSearchAny` / `multiSearchAllPositions` — probe each
    * document against a needle set in one map-side pass: per-needle
    * 1-based positions (0 = absent) plus the any-hit flag. No shuffle,
    * no UDF — the multi-needle scan every content-filter pipeline runs
    * before the expensive classifiers.
    */
  private def fnMultiSearch(s: SparkSession, dir: String): DataFrame = {
    val needles = Seq("the", "fast", "zebra")
    val posCols = needles.map(n => locate(n, col("text")).as(s"pos_$n"))
    Tables.documents(s, dir)
      .select(col("doc_id") +: posCols: _*)
      .withColumn("any_hit",
        needles.map(n => col(s"pos_$n") > 0).reduce(_ || _))
      .orderBy(col("doc_id"))
  }

  /** String-distance family (ClickHouse `editDistance`): Levenshtein
    * between each document's first two tokens (an intra-doc word-shape
    * signal) and between its language tag and 'en' — both engines ship
    * the same DP kernel as a built-in, so the surface is purely
    * map-side codegen'd projection.
    */
  private def fnEditDistance(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("arr", split(col("text"), " "))
      .select(col("doc_id"),
        element_at(col("arr"), 1).as("tok1"),
        element_at(col("arr"), 2).as("tok2"),
        levenshtein(element_at(col("arr"), 1), element_at(col("arr"), 2))
          .as("tok_dist"),
        levenshtein(col("lang"), lit("en")).as("lang_dist"))
      .orderBy(col("doc_id"))

  /** ClickHouse `ngramDistance` — trigram-set distance between two
    * strings (each document's first two tokens, the same probe pair as
    * fn_edit_distance): 1 − |A∩B|/|A∪B| over distinct 3-grams, emitted
    * in integer MICRO-units via integer division (all counts
    * non-negative, so floor = truncate on both engines — no double ever
    * enters the pipeline). Empty-∪ pairs (both strings shorter than 3)
    * score 0 by convention.
    *
    * Scale notes: pure map-side codegen'd projection — the gram sets
    * are per-row HOFs over bounded token prefixes, no shuffle, no UDF.
    */
  private def fnNgramDistance(s: SparkSession, dir: String): DataFrame = {
    // the <3 guard, not greatest(…,0): Spark's sequence(1, 0) counts
    // DOWN ([1,0]) instead of returning empty, which would hand short
    // strings a phantom gram set (DuckDB's range(1,1) is empty)
    def grams(c: String): String =
      s"""array_distinct(if(length($c) < 3,
         |  cast(array() as array<string>),
         |  transform(sequence(1, length($c) - 2),
         |    i -> substr($c, i, 3))))""".stripMargin.replace("\n", " ")
    Tables.documents(s, dir)
      .withColumn("arr", split(col("text"), " "))
      .select(col("doc_id"),
        coalesce(element_at(col("arr"), 1), lit("")).as("t1"),
        coalesce(element_at(col("arr"), 2), lit("")).as("t2"))
      .withColumn("ga", expr(grams("t1")))
      .withColumn("gb", expr(grams("t2")))
      .select(col("doc_id"), col("t1"), col("t2"),
        size(col("ga")).as("n_a"), size(col("gb")).as("n_b"),
        expr("size(array_intersect(ga, gb))").as("n_common"),
        expr("""CASE WHEN size(array_union(ga, gb)) = 0 THEN 0
                ELSE 1000000 - size(array_intersect(ga, gb)) * 1000000
                  div size(array_union(ga, gb)) END""")
          .cast("long").as("dist_micro"))
      .orderBy(col("doc_id"))
  }

  /** ClickHouse `LEFT ARRAY JOIN` — the outer flavor of ARRAY JOIN that
    * KEEPS rows whose array is empty (one row with NULL element), where
    * the plain form drops them: each document's long tokens (length ≥ 8)
    * explode per-element, and all-short documents survive as a null row.
    * Spark's `explode_outer` is the exact primitive; the DuckDB twin is
    * LEFT JOIN LATERAL unnest. Elements order by value in the output so
    * no per-element ordinality is needed for the cross-engine hash.
    *
    * Scale notes: map-side generate (codegen'd Generate operator), no
    * shuffle before the output sort; row count is O(matched tokens),
    * bounded by the filter before the explode — push the predicate
    * INSIDE the array before generating, never explode-then-filter.
    */
  private def fnArrayJoinLeft(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("longs",
        expr("filter(split(text, ' '), x -> length(x) >= 8)"))
      .select(col("doc_id"), explode_outer(col("longs")).as("tok"))
      .orderBy(col("doc_id"), col("tok"))

  /** ClickHouse `damerauLevenshteinDistance` — the transposition-aware
    * edit distance, UNRESTRICTED (Lowrance-Wagner: a transposed block
    * may be edited again, so 'ca'→'abc' = 2 where the simpler OSA
    * recurrence says 3 — DuckDB's `damerau_levenshtein` twin is probed
    * to be the unrestricted variant too). Computed by the native
    * codegen'd [[graft.functions.DamerauLev]] expression on the same
    * token probe pair as fn_edit_distance, contrasted against plain
    * Levenshtein with a flag for rows where the transposition credit
    * bites.
    *
    * Scale notes: pure map-side native-expression projection — no UDF,
    * no shuffle; per-row cost O(|a|·|b|) on short tokens.
    */
  private def fnDamerau(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("arr", split(col("text"), " "))
      .select(col("doc_id"),
        element_at(col("arr"), 1).as("tok1"),
        element_at(col("arr"), 2).as("tok2"))
      .withColumn("dl_dist", expr("damerau_native(tok1, tok2)"))
      .withColumn("lev_dist", levenshtein(col("tok1"), col("tok2")))
      .withColumn("transposition_win", col("dl_dist") < col("lev_dist"))
      .orderBy(col("doc_id"))
  }

  /** ClickHouse `jaroSimilarity` / `jaroWinklerSimilarity` — fuzzy
    * string similarity between each part name and its brand-successor's
    * name (lead pairing inside p_brand partitions — linear, no quadratic
    * self-join), scored by the native codegen'd
    * [[graft.functions.JaroSim]] expression: textbook Jaro (match window
    * ⌊max/2⌋−1, integer half-count transpositions) plus the standard
    * Winkler prefix boost (cap 4, scale 0.1, applied only when
    * jaro > 0.7) — the exact contract DuckDB's jaro twins expose
    * (edge/threshold behavior probed empirically, incl. the integer
    * transposition division on odd mismatch counts). 6dp rounding at
    * the edge absorbs last-ulp libm-free arithmetic differences.
    *
    * Scale notes: one bounded-partition window pass (lead within brand)
    * then pure map-side native-expression scoring — no UDF, no extra
    * shuffle; per-pair cost is O(|a|·|b|) on short name strings.
    */
  private def fnJaro(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_partkey"))
    Tables.part(s, dir)
      .withColumn("nxt", lead(col("p_name"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("p_partkey"), col("p_brand"),
        round(expr("jaro_native(p_name, nxt)"), 6).as("jaro"),
        round(expr("jaro_winkler_native(p_name, nxt)"), 6).as("jw"))
      .orderBy(col("p_partkey"))
  }

  /** ClickHouse `geohashEncode` — 6-character geohash of each
    * customer's synthetic half-degree coordinate, decided ENTIRELY in
    * integers: the 15-bit lat/lon quantizations come from one
    * floor-divide of exactly-representable small products, every
    * interleaved bit is a `% / CASE` term (no engine-specific shift
    * operators), and the base32 characters index the alphabet via exact
    * power-of-two group extraction. The bit-interleave and char-extract
    * SQL is generated ONCE ([[geohashCodeSql]]/[[geohashCharsSql]]) and
    * the same strings run on both Spark and DuckDB — the formula cannot
    * drift (the fn_geo_polygon crossTerms pattern). GeohashSpec checks
    * the SQL path bit-for-bit against an independent Scala
    * reimplementation, itself pinned to the canonical
    * (57.64911, 10.40744) → "u4pruy" test vector.
    *
    * Scale notes: pure map-side projection; geo bucketing at 100 TB is
    * exactly this — a codegen'd prefix key for partitioning/joins.
    */
  private def fnGeohash(s: SparkSession, dir: String): DataFrame = {
    def quant(k: String, span: Int): String =
      s"CAST(floor(((2 * ($k) + 1) * 16384.0) / $span) AS BIGINT)"
    Tables.customer(s, dir)
      .withColumn("latk", expr("c_custkey % 180"))
      .withColumn("lonk", expr("(c_custkey * 7) % 360"))
      .withColumn("latq", expr(quant("latk", 180)))
      .withColumn("lonq", expr(quant("lonk", 360)))
      .withColumn("code", expr(geohashCodeSql("lonq", "latq")))
      .select(col("c_custkey"),
        (col("latk").cast("double") - 89.5).as("lat"),
        (col("lonk").cast("double") - 179.5).as("lon"),
        expr(geohashCharsSql("code")).as("gh6"))
      .orderBy(col("c_custkey"))
  }

  /** 30-bit interleaved geohash cell id — bit (2i+1) = lon bit i, bit
    * (2i) = lat bit i; each bit is extracted portably as
    * `x % 2^(i+1) >= 2^i`. Valid in both Spark SQL and DuckDB.
    */
  private[operators] def geohashCodeSql(lonq: String, latq: String): String =
    (0 to 14).map { i =>
      val pi = 1L << i; val pi1 = 1L << (i + 1)
      s"(CASE WHEN ($lonq) % $pi1 >= $pi THEN ${1L << (2 * i + 1)}" +
        s" ELSE 0 END) + (CASE WHEN ($latq) % $pi1 >= $pi" +
        s" THEN ${1L << (2 * i)} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Six 5-bit groups of `code`, MSB first, each indexing the geohash
    * base32 alphabet. The `/` is exact (numerator is a multiple of the
    * power-of-two divisor, far below 2^53), so the double division both
    * engines produce is integral and casts identically.
    */
  private[operators] def geohashCharsSql(code: String): String =
    (0 until 6).map { j =>
      val p0 = 1L << (25 - 5 * j); val p1 = p0 * 32
      s"substr('0123456789bcdefghjkmnpqrstuvwxyz', " +
        s"CAST((($code) % $p1 - ($code) % $p0) / $p0 AS INT) + 1, 1)"
    }.mkString("(", " || ", ")")

  /** ClickHouse `geohashDecode` — the inverse of [[fnGeohash]], and its
    * proof: re-derive the 30-bit cell id from the 6 base32 characters
    * (pure integer Horner fold over alphabet positions), de-interleave
    * the lat/lon quantizations with the same %/CASE bit extraction
    * ([[geohashDeinterleaveSql]], generated once, fed to both engines),
    * and emit the cell CENTER. All center arithmetic is exact in double
    * (cell sizes 180/2¹⁵ and 360/2¹⁵ are dyadic), so `contains_src` —
    * the original point lies inside the decoded cell — is decided
    * identically on both engines and must be 1 everywhere.
    *
    * Scale notes: map-side projection over fn_geohash's own output
    * pipeline; the encode→decode→containment chain is one codegen'd
    * stage, no shuffle beyond the presentation sort.
    */
  // 180/2^15, its half-cell, 360/2^15, its half-cell — ONE definition
  // interpolated into the Spark exprs and the oracle alike (the
  // geohashCodeSql generated-once rule: 8 hand-copies of an 11-digit
  // literal is a transcription hazard masquerading as engine divergence)
  private val GhLatCell = "0.0054931640625"
  private val GhLatHalf = "0.00274658203125"
  private val GhLonCell = "0.010986328125"
  private val GhLonHalf = "0.0054931640625"

  private def fnGeohashDecode(s: SparkSession, dir: String): DataFrame = {
    val ab = "'0123456789bcdefghjkmnpqrstuvwxyz'"
    val idx = (1 to 6).map(j => s"(instr($ab, substr(gh6, $j, 1)) - 1)")
    val code = idx.reduce((a, b) => s"(($a) * 32 + $b)")
    fnGeohash(s, dir)
      .withColumn("code", expr(code))
      .withColumn("latq", expr(geohashDeinterleaveSql("code", 0)))
      .withColumn("lonq", expr(geohashDeinterleaveSql("code", 1)))
      .select(col("c_custkey"), col("gh6"),
        expr(s"CAST(latq * $GhLatCell + $GhLatHalf - 90.0 AS DOUBLE)")
          .as("dec_lat"),
        expr(s"CAST(lonq * $GhLonCell + $GhLonHalf - 180.0 AS DOUBLE)")
          .as("dec_lon"),
        expr(s"""CAST(abs(lat - latq * $GhLatCell
                - $GhLatHalf + 90.0) <= $GhLatHalf AS INT)""")
          .as("lat_in_cell"),
        expr(s"""CAST(abs(lon - lonq * $GhLonCell
                - $GhLonHalf + 180.0) <= $GhLonHalf AS INT)""")
          .as("lon_in_cell"))
      .orderBy(col("c_custkey"))
  }

  /** De-interleave one 15-bit coordinate out of the 30-bit cell id:
    * `parity` 0 extracts the even (lat) bits, 1 the odd (lon) bits.
    * Same portable %/CASE dialect as [[geohashCodeSql]].
    */
  private[operators] def geohashDeinterleaveSql(code: String,
      parity: Int): String =
    (0 to 14).map { i =>
      val bit = 2 * i + parity
      val p = 1L << bit; val p1 = 1L << (bit + 1)
      s"(CASE WHEN ($code) % $p1 >= $p THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** ClickHouse `formatDateTime` — date rendering parity over the
    * locale-safe token set (numeric fields + English month name, which
    * Spark formats with Locale.US regardless of JVM locale and DuckDB's
    * %B renders identically).
    */
  private def fnFormatDatetime(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy/MM/dd").as("ymd"),
        date_format(col("o_orderdate"), "yyyyMM").as("yyyymm"),
        date_format(col("o_orderdate"), "DDD").as("day_of_year"),
        date_format(col("o_orderdate"), "MMMM").as("month_name"),
        date_format(col("o_orderdate"), "HH:mm:ss").as("hms"))
      .orderBy(col("o_orderkey"))

  /** ClickHouse geo functions (`greatCircleDistance`): haversine distance
    * from a synthetic per-customer coordinate (pure integer function of
    * the key, so both engines derive identical inputs) to a fixed anchor.
    * The trig chain runs in double with ONE operation order on both
    * engines and the result rounds to whole meters — at 1e7 m magnitude
    * a last-ulp libm difference is 1e-9 m, eleven orders below the
    * rounding step. Map-side only: geo scoring is a projection, the
    * 100 TB shape is simply "no shuffle anywhere".
    */
  private def fnGeo(s: SparkSession, dir: String): DataFrame = {
    val lat = (col("c_custkey") % 180).cast("double") - 90.0 + 0.5
    val lon = ((col("c_custkey") * 7) % 360).cast("double") - 180.0 + 0.5
    val aLat = lit(48.8566); val aLon = lit(2.3522) // anchor: Paris
    val a = pow(sin(radians(aLat - lat) / 2), 2) +
      cos(radians(lat)) * cos(radians(aLat)) *
        pow(sin(radians(aLon - lon) / 2), 2)
    Tables.customer(s, dir)
      .select(col("c_custkey"), lat.as("lat"), lon.as("lon"),
        round(lit(2) * lit(6371000.0) * asin(sqrt(a)), 0).cast("long")
          .as("dist_m"))
      .orderBy(col("c_custkey"))
  }

  /** ClickHouse `pointInPolygon` — even-odd ray casting against a fixed
    * 6-vertex integer-lattice polygon, decided ENTIRELY in integers:
    * the "ray crosses edge" test px < x1 + (py−y1)(x2−x1)/(y2−y1) is
    * cross-multiplied by dy (sign-split on the two admitting cases), so
    * no division ever happens and both engines run the identical int64
    * arithmetic. The per-edge CASE terms are generated ONCE from the
    * vertex list ([[crossTerms]]) and the same string is handed to both
    * Spark and the DuckDB oracle — the formula cannot drift.
    *
    * Scale notes: pure map-side codegen'd projection; a real polygon
    * dictionary would broadcast the vertex arrays and run the same HOF
    * per (point, polygon) candidate after a bounding-box prefilter.
    */
  private val poly: Seq[(Long, Long)] =
    Seq((10L, 10L), (90L, 20L), (50L, 50L), (80L, 90L), (20L, 80L), (40L, 40L))

  /** Sum of per-edge crossing indicators for point (`px`,`py`) — a SQL
    * fragment valid in both Spark SQL and DuckDB.
    */
  private def crossTerms(px: String, py: String): String =
    (poly :+ poly.head).sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      s"""(CASE WHEN ($y1 <= $py AND $y2 > $py
         |  AND ($px - $x1) * ${y2 - y1} < ($py - $y1) * ${x2 - x1})
         | OR ($y2 <= $py AND $y1 > $py
         |  AND ($px - $x1) * ${y2 - y1} > ($py - $y1) * ${x2 - x1})
         | THEN 1 ELSE 0 END)""".stripMargin.replace("\n", " ")
    }.mkString(" + ")

  private def fnGeoPolygon(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        (col("c_custkey") % 100).as("px"),
        ((col("c_custkey") * 37) % 100).as("py"))
      .withColumn("crossings", expr(crossTerms("px", "py")))
      .select(col("c_custkey"), col("px"), col("py"), col("crossings"),
        (col("crossings") % 2 === 1).cast("int").as("inside"))
      .orderBy(col("c_custkey"))
  }

  private val fnGeoPolygonOracle: String =
    s"""WITH p AS (SELECT c_custkey, c_custkey % 100 AS px,
       |  (c_custkey * 37) % 100 AS py FROM customer)
       |SELECT c_custkey, px, py,
       |  ${crossTerms("px", "py")} AS crossings,
       |  CAST((${crossTerms("px", "py")}) % 2 = 1 AS INTEGER) AS inside
       |FROM p ORDER BY c_custkey""".stripMargin

  /** Snowflake-style time-sortable ID codec (ClickHouse
    * `generateSnowflakeID` / `snowflakeIDToDateTime`): 41 bits of millis
    * since a 2020-01-01 custom epoch, 10 bits of shard (user_id % 1024),
    * 12 bits of per-(ms, shard) sequence — encode and decode are
    * shift/mask only, so IDs sort by time and decode without any lookup.
    * Every operation is integer-exact; the oracle replays the identical
    * bit layout.
    *
    * Scale notes: encode/decode are pure map-side projections (no
    * shuffle at 100 TB). The sequence number is a per-(ms, shard) window
    * here only to make the FIXTURE deterministic — a production
    * generator holds it as a per-shard local counter, which is exactly
    * what the 12-bit field models.
    */
  private val sfEpochMs = 1577836800000L // 2020-01-01T00:00:00Z
  private def fnId(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 1000").as("ms"))
      .withColumn("shard", pmod(col("user_id"), lit(1024L)))
    val seqW = Window.partitionBy(col("ms"), col("shard"))
      .orderBy(col("event_id"))
    val msDec = shiftright(col("sfid"), 22) + lit(sfEpochMs)
    base
      .withColumn("seq",
        pmod(row_number().over(seqW) - 1, lit(4096)).cast("long"))
      .withColumn("sfid",
        shiftleft(col("ms") - sfEpochMs, 22)
          .bitwiseOR(shiftleft(col("shard"), 12)).bitwiseOR(col("seq")))
      .select(col("event_id"), col("sfid"),
        msDec.as("ms_dec"),
        shiftright(col("sfid"), 12).bitwiseAND(lit(1023L)).as("shard_dec"),
        col("sfid").bitwiseAND(lit(4095L)).as("seq_dec"),
        timestamp_millis(msDec).as("ts_dec"),
        (msDec === col("ms") &&
          shiftright(col("sfid"), 12).bitwiseAND(lit(1023L)) === col("shard"))
          .as("ok"))
      .orderBy(col("event_id"))
  }

  /** Nested-JSON flatten (ClickHouse `JSONExtractArrayRaw` + ARRAY
    * JOIN; Snowflake LATERAL FLATTEN): a document per order carrying an
    * ARRAY of line-item structs is parsed with an explicit nested
    * schema and exploded back to relational rows. The JSON is built and
    * re-parsed in-engine (to_json → from_json → explode), so the
    * operator proves the full round trip — schema'd nested parse, array
    * explode, struct field access — while the oracle checks the
    * flatten is LOSSLESS by recomputing the rows relationally from
    * lineitem (no cross-engine JSON-text comparison, which would hang
    * on formatting).
    *
    * Scale notes: parse and explode are narrow per-row transforms
    * inside whole-stage codegen; only the array elements multiply rows.
    * The pre-group is one shuffle on l_orderkey — the same shuffle any
    * order-grain nesting already paid.
    */
  private def fnJsonFlatten(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val itemT = StructType(Seq(StructField("l", IntegerType),
      StructField("q", LongType)))
    val docT = StructType(Seq(StructField("o", LongType),
      StructField("items", ArrayType(itemT))))
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 97 === 0)
      .groupBy(col("l_orderkey"))
      .agg(to_json(struct(col("l_orderkey").as("o"),
        array_sort(collect_list(struct(col("l_linenumber").as("l"),
          // floor() before the long cast: Spark's bare cast truncates
          // while DuckDB's rounds — the agg_sum_map rule
          floor(col("l_quantity")).cast("long").as("q")))).as("items"))).as("js"))
      .select(from_json(col("js"), docT).as("p"))
      .select(col("p.o").as("o_orderkey"), explode(col("p.items")).as("it"))
      .select(col("o_orderkey"), col("it.l").as("l_linenumber"),
        col("it.q").as("qty"))
      // the synthetic lineitem does NOT keep l_linenumber unique per
      // order — qty joins the sort key to make the order total
      .orderBy(col("o_orderkey"), col("l_linenumber"), col("qty"))
  }

  /** ClickHouse `formatReadableSize` / `formatReadableQuantity`: scale a
    * byte/row count to its human unit. The scaled value is emitted in
    * integer HUNDREDTHS (`*_cents`) beside the unit string, NOT as a
    * formatted double: rounding `n/1000` at 2dp in double is the exact
    * midpoint trap Core.scala documents (n ending in 5 puts the
    * shortest repr ON a 2dp midpoint while the binary sits a half-ulp
    * off — engines disagree), and double→string formatting differs
    * cross-engine anyway. Integer HALF_UP — `(n·100 + d/2) div d` — is
    * exact and identical everywhere. Map-side only, no shuffle.
    */
  private def fnFormatReadable(s: SparkSession, dir: String): DataFrame = {
    def cents(d: Long): org.apache.spark.sql.Column =
      expr(s"(bytes * 100 + ${d / 2}) div $d")
    val b = col("bytes")
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("""shiftleft(cast(o_totalprice as bigint) + 1,
                cast((o_orderkey % 4) * 8 as int))""").as("bytes"))
      .select(col("o_orderkey"), b,
        when(b < (1L << 10), b * 100L)
          .when(b < (1L << 20), cents(1L << 10))
          .when(b < (1L << 30), cents(1L << 20))
          .otherwise(cents(1L << 30)).as("size_cents"),
        when(b < (1L << 10), "B").when(b < (1L << 20), "KiB")
          .when(b < (1L << 30), "MiB").otherwise("GiB").as("size_unit"),
        when(b < 1000L, b * 100L)
          .when(b < 1000000L, cents(1000L))
          .when(b < 1000000000L, cents(1000000L))
          .otherwise(cents(1000000000L)).as("qty_cents"),
        when(b < 1000L, "").when(b < 1000000L, "thousand")
          .when(b < 1000000000L, "million").otherwise("billion")
          .as("qty_unit"))
      .orderBy(col("o_orderkey"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("fn_geo_polygon", fnGeoPolygon, Some(fnGeoPolygonOracle)),
    QueryDef("fn_json_flatten", fnJsonFlatten,
      Some("""SELECT l_orderkey AS o_orderkey, l_linenumber,
                CAST(floor(l_quantity) AS BIGINT) AS qty
              FROM lineitem WHERE l_orderkey % 97 = 0
              ORDER BY o_orderkey, l_linenumber, qty""")),
    QueryDef("fn_format_readable", fnFormatReadable,
      Some("""WITH b AS (SELECT o_orderkey,
                (CAST(floor(o_totalprice) AS BIGINT) + 1)
                  << CAST((o_orderkey % 4) * 8 AS INTEGER) AS bytes
                FROM orders)
              SELECT o_orderkey, bytes,
                CASE WHEN bytes < 1024 THEN bytes * 100
                  WHEN bytes < 1048576 THEN (bytes * 100 + 512) // 1024
                  WHEN bytes < 1073741824
                    THEN (bytes * 100 + 524288) // 1048576
                  ELSE (bytes * 100 + 536870912) // 1073741824
                  END AS size_cents,
                CASE WHEN bytes < 1024 THEN 'B'
                  WHEN bytes < 1048576 THEN 'KiB'
                  WHEN bytes < 1073741824 THEN 'MiB'
                  ELSE 'GiB' END AS size_unit,
                CASE WHEN bytes < 1000 THEN bytes * 100
                  WHEN bytes < 1000000 THEN (bytes * 100 + 500) // 1000
                  WHEN bytes < 1000000000
                    THEN (bytes * 100 + 500000) // 1000000
                  ELSE (bytes * 100 + 500000000) // 1000000000
                  END AS qty_cents,
                CASE WHEN bytes < 1000 THEN ''
                  WHEN bytes < 1000000 THEN 'thousand'
                  WHEN bytes < 1000000000 THEN 'million'
                  ELSE 'billion' END AS qty_unit
              FROM b ORDER BY o_orderkey""")),
    QueryDef("fn_id", fnId,
      Some("""WITH e AS (SELECT event_id, user_id,
                epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
              -- ((x % m) + m) % m compensates DuckDB's truncated % to
              -- match Spark's pmod for negative user_ids (the fn_math
              -- key_mod7 rule)
              b AS (SELECT event_id, ms,
                ((user_id % 1024) + 1024) % 1024 AS shard,
                CAST((ROW_NUMBER() OVER (PARTITION BY ms,
                  ((user_id % 1024) + 1024) % 1024
                  ORDER BY event_id) - 1) % 4096 AS BIGINT) AS seq
                FROM e),
              i AS (SELECT event_id, ms, shard, seq,
                ((ms - 1577836800000) << 22) | (shard << 12) | seq AS sfid
                FROM b)
              SELECT event_id, sfid,
                (sfid >> 22) + 1577836800000 AS ms_dec,
                (sfid >> 12) & 1023 AS shard_dec,
                sfid & 4095 AS seq_dec,
                make_timestamp(((sfid >> 22) + 1577836800000) * 1000)
                  AS ts_dec,
                ((sfid >> 22) + 1577836800000 = ms
                  AND ((sfid >> 12) & 1023) = shard) AS ok
              FROM i ORDER BY event_id""")),
    QueryDef("fn_array_fold", fnArrayFold,
      Some("""WITH g AS (SELECT l_orderkey,
                 list(CAST(floor(l_quantity) AS BIGINT)
                   ORDER BY l_linenumber, l_quantity) AS q,
                 list(l_linenumber
                   ORDER BY l_linenumber, l_quantity) AS ln
                 FROM lineitem GROUP BY l_orderkey)
              SELECT l_orderkey, CAST(len(q) AS INTEGER) AS n_lines,
                array_to_string(list_transform(
                  generate_series(1, len(q)),
                  i -> list_aggregate(q[1:i], 'sum')), ',') AS cum_qty,
                array_to_string(list_transform(
                  generate_series(1, len(q)),
                  i -> CASE WHEN i = 1 THEN 0
                       ELSE q[i] - q[i-1] END), ',') AS diff_qty,
                array_to_string(list_transform(
                  generate_series(1, len(q)),
                  i -> ln[i] || ':' || q[i]), ',') AS zip_ln_qty
              FROM g ORDER BY l_orderkey""")),
    QueryDef("fn_multi_search", fnMultiSearch,
      Some("""SELECT doc_id,
               CAST(strpos(text, 'the') AS INTEGER) AS pos_the,
               CAST(strpos(text, 'fast') AS INTEGER) AS pos_fast,
               CAST(strpos(text, 'zebra') AS INTEGER) AS pos_zebra,
               (strpos(text, 'the') > 0 OR strpos(text, 'fast') > 0
                 OR strpos(text, 'zebra') > 0) AS any_hit
              FROM documents ORDER BY doc_id""")),
    QueryDef("fn_cidr", fnCidr,
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
               ips AS (SELECT user_id,
                 (user_id % 223) + 1 AS o1, (user_id * 7) % 256 AS o2,
                 (user_id * 13) % 256 AS o3, user_id % 256 AS o4
                 FROM u),
               n AS (SELECT user_id,
                 o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip,
                 o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS num
                 FROM ips)
              SELECT user_id, ip,
                num // 16777216 = 167772160 // 16777216 AS in_10_8,
                num // 1048576 = 2886729728 // 1048576 AS in_172_16_12,
                num // 65536 = 3232235520 // 65536 AS in_192_168_16
              FROM n ORDER BY user_id""")),
    QueryDef("fn_regex", fnRegex,
      Some("""SELECT c_custkey,
                len(regexp_extract_all(c_name, '[0-9]+')) AS n_num_runs,
                array_to_string(regexp_extract_all(c_name, '[0-9]+'), ',')
                  AS nums_csv,
                COALESCE(regexp_extract(c_name, '([1-9][0-9]*)', 1), '')
                  AS first_nonzero,
                regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
                CAST(regexp_matches(c_name, '42') AS INTEGER) AS has_42,
                len(regexp_extract_all(lower(c_mktsegment), '[aeiou]'))
                  AS n_vowels
              FROM customer ORDER BY c_custkey""")),
    QueryDef("fn_normalize_query", fnNormalizeQuery,
      Some("""WITH raw AS (
                SELECT 'SELECT * FROM t WHERE k = ' || o_orderkey ||
                  ' AND p = ''' || o_orderpriority ||
                  ''' AND id IN (' || o_orderkey || ', ' ||
                  (o_orderkey + 1) || ', ' || (o_orderkey + 2) || ')' AS q
                FROM orders
                UNION ALL
                SELECT 'UPDATE t SET v = ' || (o_orderkey + 7) ||
                  ' WHERE k = ' || o_orderkey
                FROM orders
              ),
              norm AS (
                SELECT regexp_replace(
                  regexp_replace(
                    regexp_replace(q, '''[^'']*''', '?', 'g'),
                    '(^|[^a-zA-Z0-9_])[0-9]+(\.[0-9]+)?', '\1?', 'g'),
                  '\?(\s*,\s*\?)+', '?..', 'g') AS normalized
                FROM raw
              )
              SELECT normalized, md5(normalized) AS fingerprint,
                COUNT(*) AS n
              FROM norm GROUP BY normalized ORDER BY normalized""")),
    QueryDef("fn_morton", fnMorton,
      Some("""WITH t AS (SELECT c_custkey,
                 CAST(c_custkey & 65535 AS BIGINT) AS x,
                 CAST((c_custkey * 7919) & 65535 AS BIGINT) AS y
                FROM customer),
              m AS (SELECT c_custkey, x, y,
                 CAST(list_aggregate(list_transform(range(0, 16),
                   i -> (((x >> i) & 1) << (2*i))
                      + (((y >> i) & 1) << (2*i + 1))),
                   'sum') AS BIGINT) AS morton
                FROM t)
              SELECT c_custkey, x, y, morton,
                CAST(list_aggregate(list_transform(range(0, 16),
                  i -> ((morton >> (2*i)) & 1) << i), 'sum') AS BIGINT)
                  AS x_rt,
                CAST(list_aggregate(list_transform(range(0, 16),
                  i -> ((morton >> (2*i + 1)) & 1) << i), 'sum') AS BIGINT)
                  AS y_rt
              FROM m ORDER BY c_custkey""")),
    QueryDef("fn_array_rotate", fnArrayRotate,
      Some("""WITH t AS (SELECT doc_id,
                 list_slice(string_split(text, ' '), 1, 8) AS a
                FROM documents)
              SELECT doc_id,
                array_to_string(a, ',') AS tokens,
                array_to_string(list_concat(list_slice(a, 3, 8),
                  list_slice(a, 1, 2)), ',') AS rot_left2,
                array_to_string(list_concat(list_slice(a, 7, 8),
                  list_slice(a, 1, 6)), ',') AS rot_right2,
                array_to_string(list_concat(list_slice(a, 3, 8),
                  ['_', '_']), ',') AS shift_left2,
                array_to_string(list_concat(['_', '_'],
                  list_slice(a, 1, 6)), ',') AS shift_right2
              FROM t WHERE len(a) = 8 ORDER BY doc_id""")),
    QueryDef("fn_array_enumerate", fnArrayEnumerate,
      Some("""WITH t AS (SELECT doc_id,
                 list_slice(string_split(text, ' '), 1, 40) AS arr
                 FROM documents)
              SELECT doc_id, len(arr) AS n_tokens,
                array_to_string(list_transform(range(1, len(arr) + 1),
                  i -> CAST(1 + len(list_filter(
                    list_slice(arr, 1, CAST(i - 1 AS INT)),
                    x -> x = arr[CAST(i AS INT)])) AS VARCHAR)), ',')
                  AS occ_idx,
                array_to_string(list_transform(range(1, len(arr) + 1),
                  i -> CAST(len(list_distinct(list_slice(arr, 1,
                    CAST(list_position(arr, arr[CAST(i AS INT)]) AS INT))))
                    AS VARCHAR)), ',') AS dense_idx
              FROM t WHERE len(arr) >= 1 ORDER BY doc_id""")),
    QueryDef("fn_array_join_left", fnArrayJoinLeft,
      Some("""WITH t AS (SELECT doc_id,
                 list_filter(string_split(text, ' '),
                   x -> length(x) >= 8) AS longs
                 FROM documents)
              SELECT doc_id, u.tok FROM t
              LEFT JOIN LATERAL (SELECT unnest(longs) AS tok) u ON true
              ORDER BY doc_id, tok""")),
    QueryDef("fn_damerau", fnDamerau,
      Some("""WITH p AS (SELECT doc_id,
                 string_split(text, ' ')[1] AS tok1,
                 string_split(text, ' ')[2] AS tok2
                 FROM documents)
              SELECT doc_id, tok1, tok2,
                CAST(damerau_levenshtein(tok1, tok2) AS INTEGER) AS dl_dist,
                CAST(levenshtein(tok1, tok2) AS INTEGER) AS lev_dist,
                damerau_levenshtein(tok1, tok2) < levenshtein(tok1, tok2)
                  AS transposition_win
              FROM p ORDER BY doc_id""")),
    QueryDef("fn_jaro", fnJaro,
      Some("""WITH p AS (SELECT p_partkey, p_brand, p_name,
                 lead(p_name) OVER (PARTITION BY p_brand
                   ORDER BY p_partkey) AS nxt
                 FROM part)
              SELECT p_partkey, p_brand,
                round(jaro_similarity(p_name, nxt), 6) AS jaro,
                round(jaro_winkler_similarity(p_name, nxt), 6) AS jw
              FROM p WHERE nxt IS NOT NULL ORDER BY p_partkey""")),
    QueryDef("fn_ngram_distance", fnNgramDistance,
      Some("""WITH p AS (SELECT doc_id,
                 COALESCE(string_split(text, ' ')[1], '') AS t1,
                 COALESCE(string_split(text, ' ')[2], '') AS t2
                 FROM documents),
               g AS (SELECT doc_id, t1, t2,
                 list_distinct(list_transform(
                   range(1, greatest(length(t1) - 2, 0) + 1),
                   i -> substr(t1, CAST(i AS INT), 3))) AS ga,
                 list_distinct(list_transform(
                   range(1, greatest(length(t2) - 2, 0) + 1),
                   i -> substr(t2, CAST(i AS INT), 3))) AS gb
                 FROM p)
              SELECT doc_id, t1, t2,
                len(ga) AS n_a, len(gb) AS n_b,
                len(list_intersect(ga, gb)) AS n_common,
                CAST(CASE WHEN len(list_distinct(list_concat(ga, gb))) = 0
                  THEN 0
                  ELSE 1000000 - len(list_intersect(ga, gb)) * 1000000
                    // len(list_distinct(list_concat(ga, gb))) END
                  AS BIGINT) AS dist_micro
              FROM g ORDER BY doc_id""")),
    QueryDef("fn_geohash", fnGeohash,
      Some(s"""WITH q AS (SELECT c_custkey,
                 c_custkey % 180 AS latk, (c_custkey * 7) % 360 AS lonk,
                 CAST(floor(((2 * (c_custkey % 180) + 1) * 16384.0)
                   / 180) AS BIGINT) AS latq,
                 CAST(floor(((2 * ((c_custkey * 7) % 360) + 1) * 16384.0)
                   / 360) AS BIGINT) AS lonq
                 FROM customer),
               c AS (SELECT c_custkey, latk, lonk,
                 ${geohashCodeSql("lonq", "latq")} AS code FROM q)
              SELECT c_custkey,
                CAST(latk AS DOUBLE) - 89.5 AS lat,
                CAST(lonk AS DOUBLE) - 179.5 AS lon,
                ${geohashCharsSql("code")} AS gh6
              FROM c ORDER BY c_custkey""")),
    QueryDef("fn_geohash_decode", fnGeohashDecode, {
      val idx = (1 to 6).map(j =>
        s"(strpos('0123456789bcdefghjkmnpqrstuvwxyz', substr(gh6, $j, 1)) - 1)")
      val code = idx.reduce((a, b) => s"(($a) * 32 + $b)")
      Some(s"""WITH q AS (SELECT c_custkey,
                 c_custkey % 180 AS latk, (c_custkey * 7) % 360 AS lonk,
                 CAST(floor(((2 * (c_custkey % 180) + 1) * 16384.0)
                   / 180) AS BIGINT) AS latq0,
                 CAST(floor(((2 * ((c_custkey * 7) % 360) + 1) * 16384.0)
                   / 360) AS BIGINT) AS lonq0
                 FROM customer),
               c AS (SELECT c_custkey,
                 CAST(latk AS DOUBLE) - 89.5 AS lat,
                 CAST(lonk AS DOUBLE) - 179.5 AS lon,
                 ${geohashCodeSql("lonq0", "latq0")} AS code0 FROM q),
               g AS (SELECT c_custkey, lat, lon,
                 ${geohashCharsSql("code0")} AS gh6 FROM c),
               d AS (SELECT c_custkey, lat, lon, gh6, $code AS code FROM g),
               z AS (SELECT c_custkey, lat, lon, gh6,
                 ${geohashDeinterleaveSql("code", 0)} AS latq,
                 ${geohashDeinterleaveSql("code", 1)} AS lonq FROM d)
              SELECT c_custkey, gh6,
                CAST(latq * $GhLatCell + $GhLatHalf - 90.0
                  AS DOUBLE) AS dec_lat,
                CAST(lonq * $GhLonCell + $GhLonHalf - 180.0
                  AS DOUBLE) AS dec_lon,
                CAST(abs(lat - latq * $GhLatCell
                  - $GhLatHalf + 90.0) <= $GhLatHalf AS INTEGER)
                  AS lat_in_cell,
                CAST(abs(lon - lonq * $GhLonCell
                  - $GhLonHalf + 180.0) <= $GhLonHalf AS INTEGER)
                  AS lon_in_cell
              FROM z ORDER BY c_custkey""")
    }),
    QueryDef("fn_format_datetime", fnFormatDatetime,
      Some("""SELECT o_orderkey,
                strftime(o_orderdate, '%Y/%m/%d') AS ymd,
                strftime(o_orderdate, '%Y%m') AS yyyymm,
                strftime(o_orderdate, '%j') AS day_of_year,
                strftime(o_orderdate, '%B') AS month_name,
                strftime(o_orderdate, '%H:%M:%S') AS hms
              FROM orders ORDER BY o_orderkey""")),
    QueryDef("fn_edit_distance", fnEditDistance,
      Some("""WITH t AS (SELECT doc_id, lang,
                 string_split(text, ' ') AS arr FROM documents)
              SELECT doc_id, arr[1] AS tok1, arr[2] AS tok2,
                CAST(levenshtein(arr[1], arr[2]) AS INTEGER) AS tok_dist,
                CAST(levenshtein(lang, 'en') AS INTEGER) AS lang_dist
              FROM t ORDER BY doc_id""")),
    QueryDef("fn_geo", fnGeo,
      Some("""SELECT c_custkey,
               CAST(c_custkey % 180 AS DOUBLE) - 90.0 + 0.5 AS lat,
               CAST((c_custkey * 7) % 360 AS DOUBLE) - 180.0 + 0.5 AS lon,
               CAST(round(2 * 6371000.0 * asin(sqrt(
                 pow(sin(radians(48.8566
                   - (CAST(c_custkey % 180 AS DOUBLE) - 90.0 + 0.5)) / 2), 2)
                 + cos(radians(CAST(c_custkey % 180 AS DOUBLE) - 90.0 + 0.5))
                 * cos(radians(48.8566))
                 * pow(sin(radians(2.3522
                   - (CAST((c_custkey * 7) % 360 AS DOUBLE) - 180.0 + 0.5))
                   / 2), 2))), 0) AS BIGINT) AS dist_m
              FROM customer ORDER BY c_custkey""")),
    QueryDef("fn_url_hierarchy", fnUrlHierarchy,
      Some("""WITH u AS (SELECT doc_id,
                'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
                  AS host,
                [source, 'a' || CAST(doc_id AS VARCHAR)] AS segs
                FROM documents)
              SELECT doc_id, CAST(i AS INTEGER) AS depth,
                CASE WHEN i = 0 THEN 'https://' || host
                     ELSE 'https://' || host || '/'
                       || array_to_string(segs[1:i], '/') END AS prefix
              FROM u, unnest(range(0, 3)) AS t(i)
              ORDER BY doc_id, depth""")),
    QueryDef("fn_url", fnUrl,
      Some("""WITH u AS (SELECT doc_id,
               'https://WWW.Example' || (doc_id % 7) || '.COM/' || source
                 || '/a' || doc_id || '?utm_source=feed&id=' || doc_id
                 || '&ref=x#s' || (doc_id % 3) AS url
              FROM documents)
              SELECT doc_id, url,
               regexp_extract(url, '^([a-zA-Z]+)://', 1) AS proto,
               regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1) AS host,
               regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '\?([^#]*)', 1) AS query_str,
               regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param,
               'https://' || lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1))
                 || regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1)
                 || '?id=' || regexp_extract(url, '[?&]id=([^&#]*)', 1) AS canonical
              FROM u ORDER BY doc_id""")),
    QueryDef("fn_ip", fnIp,
      Some("""WITH ids AS (SELECT DISTINCT user_id FROM events),
              ips AS (SELECT user_id,
               ((user_id % 223) + 1) || '.' || ((user_id * 7) % 256) || '.'
                 || ((user_id * 13) % 256) || '.' || (user_id % 256) AS ip
              FROM ids),
              num AS (SELECT user_id, ip,
               CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
                 + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
                 + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
                 + CAST(split_part(ip, '.', 4) AS BIGINT) AS ip_num
              FROM ips)
              SELECT user_id, ip, ip_num, ip AS ip_roundtrip,
               split_part(ip, '.', 1) || '.' || split_part(ip, '.', 2)
                 || '.0.0' AS subnet16,
               CAST(NULL AS BIGINT) AS bad_is_null
              FROM num ORDER BY user_id""")),
    QueryDef("fn_hash", fnHash,
      Some("""SELECT c_custkey,
                md5(c_name) AS name_md5,
                lower(sha256(c_name)) AS name_sha256,
                CAST(CAST('0x' || substr(md5(c_name), 1, 8) AS BIGINT) % 1024
                  AS BIGINT) AS md5_bucket
              FROM customer ORDER BY c_custkey""")),
    QueryDef("fn_encode", fnEncode,
      Some("""SELECT c_custkey,
               to_base64(ENCODE(c_name)) AS name_b64,
               c_name AS name_roundtrip,
               lower(hex(c_mktsegment)) AS seg_hex,
               c_mktsegment AS seg_roundtrip
              FROM customer ORDER BY c_custkey""")),
    QueryDef("fn_bitwise", fnBitwise,
      Some("""SELECT o_orderkey,
               o_orderkey & 255 AS low_byte,
               o_orderkey | o_custkey AS k_or,
               xor(o_orderkey, o_custkey) AS k_xor,
               o_orderkey << 2 AS shl2,
               o_orderkey >> 3 AS shr3,
               ~o_orderkey AS k_not,
               CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
              FROM orders ORDER BY o_orderkey""")),
    QueryDef("fn_bar", fnBar,
      Some("""WITH d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                 COUNT(*) AS n FROM events
                 WHERE event_type = 'purchase' GROUP BY day),
              m AS (SELECT day, n, MAX(n) OVER () AS mx FROM d)
              SELECT day, n,
                repeat('#', CAST(FLOOR(n * 40 / mx) AS INTEGER)) AS bar
              FROM m ORDER BY day""")),
    QueryDef("fn_string", fnString,
      Some("""SELECT c_custkey,
               substr(c_name, 1, 8) AS name_prefix,
               upper(c_mktsegment) AS seg_upper,
               lower(c_name) AS name_lower,
               length(c_name) AS name_len,
               concat_ws('-', c_mktsegment, c_name) AS seg_name,
               regexp_replace(c_name, '^Customer#0*', '') AS id_str,
               regexp_extract(c_name, '([1-9][0-9]*)$', 1) AS id_tail,
               lpad(c_mktsegment, 12, '.') AS seg_pad,
               trim('  x  ') AS trimmed,
               c_name LIKE '%42%' AS has42,
               len(string_split(c_name, '#')) AS n_parts
              FROM customer ORDER BY c_custkey""")),
    QueryDef("fn_date", fnDate,
      Some("""SELECT o_orderkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                 AS days_since_95,
               o_orderdate + INTERVAL 30 DAY AS due_date,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
              FROM orders ORDER BY o_orderkey""")),
    QueryDef("fn_age", fnAge,
      Some("""WITH t AS (SELECT o_orderkey,
                 CAST(o_orderdate AS DATE) AS d FROM orders
                WHERE CAST(o_orderdate AS DATE) <= DATE '1998-11-15'),
              a AS (SELECT o_orderkey, d,
                 date_diff('day', d, DATE '1998-11-15') AS age_days,
                 (1998 * 12 + 11)
                   - (EXTRACT(year FROM d) * 12 + EXTRACT(month FROM d))
                   - CASE WHEN 15 < EXTRACT(day FROM d) THEN 1 ELSE 0 END
                   AS age_months
                FROM t)
              SELECT o_orderkey, d AS start_day,
                CAST(age_days AS BIGINT) AS age_days,
                CAST(age_months AS BIGINT) AS age_months,
                -- floor, not //: DuckDB's // truncates toward zero,
                -- Spark's floor rounds down — they split on negatives
                CAST(floor(age_months / 12.0) AS BIGINT) AS age_years
              FROM a ORDER BY o_orderkey""")),
    QueryDef("fn_math", fnMath,
      Some("""SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25) AS qty_dev,
               -- sign-explicit HALF_UP over |cents| (mirrors the Spark
               -- side: // on non-negative operands == Spark's div)
               CAST((CASE WHEN l_extendedprice < 0 THEN -1 ELSE 1 END) *
                 ((abs(CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
                   AS BIGINT)) + 5) // 10) AS DOUBLE) / 10.0 AS price_r1,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(ceil(round(l_discount * 100, 6)) AS BIGINT)
                 AS disc_pct_ceil,
               l_quantity * l_quantity AS qty_sq,
               round(sqrt(l_extendedprice), 6) AS price_sqrt,
               round(ln(l_extendedprice + 1), 6) AS price_ln,
               round(log10(l_extendedprice + 1), 6) AS price_log10,
               ((l_orderkey % 7) + 7) % 7 AS key_mod7,
               CAST(sign(l_quantity - 25) AS INTEGER) AS qty_sign,
               greatest(l_quantity, l_discount * 100) AS g,
               least(l_quantity, l_discount * 100) AS l
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, price_r1, qty_dev,
                qty_sq, disc_pct_ceil, price_floor, price_sqrt,
                price_ln, price_log10, key_mod7, qty_sign, g, l
              LIMIT 5000""")),
    QueryDef("fn_array", fnArray,
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr
                FROM documents)
              SELECT doc_id,
               len(arr) AS n_tokens,
               arr[1] AS first_token,
               len(list_distinct(arr)) AS n_distinct,
               list_contains(arr, 'spark') AS has_spark,
               array_to_string(list_slice(list_sort(list_distinct(arr)), 1, 3),
                 ',') AS top3_alpha,
               CAST(list_aggregate(list_transform(arr, x -> length(x)), 'sum')
                 AS INTEGER) AS sum_token_len,
               len(list_filter(arr, x -> length(x) > 4)) AS n_long_tokens
              FROM t ORDER BY doc_id""")),
    QueryDef("fn_map", fnMap,
      Some("""WITH t AS (SELECT c_custkey,
                map(['seg','name'], [c_mktsegment, c_name]) AS m
                FROM customer)
              SELECT c_custkey,
               CAST(cardinality(m) AS INTEGER) AS m_size,
               m['seg'][1] AS seg,
               array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
               list_contains(map_keys(m), 'name') AS has_name
              FROM t ORDER BY c_custkey""")),
    QueryDef("fn_json", fnJson,
      Some("""SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod10
              FROM events ORDER BY event_id""")),
    QueryDef("fn_cond", fnCond,
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                     WHEN c_acctbal < 3000 THEN 'low'
                     WHEN c_acctbal < 7000 THEN 'mid'
                     ELSE 'high' END AS tier,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
               COALESCE(NULLIF(c_name, c_name), 'anon') AS anon,
               COUNT(*) AS n
              FROM customer
              GROUP BY tier, seg_or_other, anon
              ORDER BY tier, seg_or_other, anon""")),
    QueryDef("fn_round_special", fnRoundSpecial, Some(fnRoundSpecialOracle)),
    QueryDef("fn_format_timedelta", fnFormatTimedelta,
      Some(fnFormatTimedeltaOracle)),
    QueryDef("fn_transform", fnTransform, Some(fnTransformOracle)),
    QueryDef("fn_base58", fnBase58, Some(fnBase58Oracle)),
    QueryDef("fn_distance_family", fnDistanceFamily,
      Some(fnDistanceFamilyOracle)),
    QueryDef("fn_tuple", fnTuple, Some(fnTupleOracle)),
    QueryDef("fn_array_shingles", fnArrayShingles,
      Some(fnArrayShinglesOracle)),
    QueryDef("fn_unicode_normalize", fnUnicodeNormalize,
      Some(fnUnicodeNormalizeOracle)),
    QueryDef("fn_array_delta", fnArrayDelta,
      Some("""WITH o AS (SELECT o_custkey, o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders),
              g AS (SELECT o_custkey, list(cents ORDER BY o_orderkey) AS arr
                 FROM o GROUP BY o_custkey),
              d AS (SELECT o_custkey, arr,
                 list_transform(generate_series(1, len(arr)),
                   i -> CASE WHEN i = 1 THEN 0
                        ELSE arr[i] - arr[i-1] END) AS delta_arr,
                 list_transform(generate_series(1, len(arr)),
                   i -> list_aggregate(arr[1:i], 'sum')) AS cum_arr
                 FROM g),
              sg AS (SELECT o_custkey, arr, delta_arr, cum_arr,
                 list_transform(delta_arr,
                   x -> CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1
                        ELSE 0 END) AS sign_arr
                 FROM d)
              SELECT o_custkey, CAST(len(arr) AS INTEGER) AS n_orders,
                array_to_string(delta_arr, ',') AS delta,
                array_to_string(cum_arr, ',') AS cumsum,
                array_to_string(list_filter(sign_arr,
                  (x, i) -> i = 1 OR x != sign_arr[i-1]), ',') AS trend
              FROM sg ORDER BY o_custkey""")),
  )

  /** ClickHouse array-calculus trio `arrayDifference` / `arrayCumSum` /
    * `arrayCompact`: per customer, the order-amount series (in exact
    * integer cents, ordered by order key) with its first-difference,
    * running-sum, and consecutive-dedup'd trend-sign arrays — the
    * spend-trajectory feature block a churn model consumes.
    *
    * Arrays are emitted as comma-joined strings so the compare is over
    * digit strings (DuckDB's list_aggregate('sum') yields HUGEINT —
    * type-invisible once stringified; the sample_curriculum lesson).
    *
    * Scale notes: ONE shuffle (groupBy customer, map-side partial
    * collect of bounded per-customer order lists); every array op is a
    * HOF over the in-row array — interpreted, but O(orders-per-customer)
    * and shuffle-free. Order inside the array is explicit
    * (array_sort by unique key), never the engine's incidental order.
    */
  private def fnArrayDelta(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .groupBy(col("o_custkey"))
      .agg(expr("""transform(
          array_sort(collect_list(struct(o_orderkey, cents))),
          r -> r.cents)""").as("arr"))
      .withColumn("delta_arr", expr(
        """transform(arr, (x, i) ->
             IF(i = 0, CAST(0 AS BIGINT), x - element_at(arr, i)))"""))
      .withColumn("cum_arr", expr(
        """slice(aggregate(arr, array(CAST(0 AS BIGINT)),
             (acc, x) -> concat(acc, array(element_at(acc, -1) + x))),
           2, size(arr))"""))
      .withColumn("sign_arr", expr(
        """transform(delta_arr, x ->
             CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END)"""))
      .select(col("o_custkey"), size(col("arr")).as("n_orders"),
        expr("array_join(transform(delta_arr, x -> CAST(x AS STRING)), ',')")
          .as("delta"),
        expr("array_join(transform(cum_arr, x -> CAST(x AS STRING)), ',')")
          .as("cumsum"),
        expr("""array_join(transform(
            filter(sign_arr, (x, i) -> i = 0 OR x != element_at(sign_arr, i)),
            x -> CAST(x AS STRING)), ',')""").as("trend"))
      .orderBy(col("o_custkey"))

  /** Largest boundary ≤ x, as a CASE ladder in descending boundary order
    * (below the smallest boundary → the smallest boundary, ClickHouse
    * `roundDown` semantics). ONE SQL string generated here and fed
    * verbatim to BOTH engines — pure integer/double comparisons, so the
    * engines cannot diverge (the fn_geohash shared-SQL discipline).
    */
  private def ladderSql(x: String, bounds: Seq[Long]): String = {
    val whens = bounds.sorted.reverse.dropRight(1)
      .map(b => s"WHEN $x >= $b THEN $b").mkString(" ")
    s"CAST(CASE $whens ELSE ${bounds.min} END AS INTEGER)"
  }

  private val exp2Sql =
    ladderSql("o_totalprice", (0 to 19).map(1L << _))
  private val downSql =
    ladderSql("o_totalprice",
      Seq(1000L, 5000L, 20000L, 50000L, 100000L, 200000L, 400000L))
  // ClickHouse roundAge brackets: 0, 17, 18, 25, 35, 45, 55.
  private val ageSql =
    "CAST(CASE WHEN age = 0 THEN 0 WHEN age < 18 THEN 17" +
      " WHEN age < 25 THEN 18 WHEN age < 35 THEN 25 WHEN age < 45 THEN 35" +
      " WHEN age < 55 THEN 45 ELSE 55 END AS INTEGER)"
  // ClickHouse roundDuration brackets (seconds).
  private val durSql =
    ladderSql("dur", Seq(0L, 1L, 10L, 30L, 60L, 120L, 180L, 240L, 300L,
      600L, 1200L, 1800L, 3600L, 7200L, 18000L, 36000L))

  /** ClickHouse rounding family `roundToExp2` / `roundDown` / `roundAge`
    * / `roundDuration`: bucket a measure onto the fixed human-scale
    * grids the reporting layer groups by (power-of-two price bands, an
    * explicit boundary set, the canonical age and session-duration
    * brackets).
    *
    * Scale notes: pure codegen'd CASE projections — each ladder is a
    * branch tree over one column, no shuffle beyond the presentation
    * sort; identical ladder SQL on both engines (no float log2 near a
    * power-of-two boundary can flip a bucket).
    */
  private def fnRoundSpecial(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("age", (col("o_custkey") % 120).cast("int"))
      .withColumn("dur", (col("o_orderkey") % 40000).cast("int"))
      .select(col("o_orderkey"),
        expr(exp2Sql).as("price_exp2"),
        expr(downSql).as("price_down"),
        expr(ageSql).as("age_bracket"),
        expr(durSql).as("duration_bracket"))
      .orderBy(col("o_orderkey"))

  /** ClickHouse `formatReadableTimeDelta`: seconds → "2 days, 3 hours,
    * 25 minutes, 1 second" with unit pluralization and zero-unit
    * elision. ONE shared SQL expression (floor-division decomposition +
    * concat_ws, which skips NULL parts on both engines) — the
    * fn_geohash discipline, so the string can't diverge.
    *
    * Scale notes: pure codegen'd projection, no shuffle beyond the
    * presentation sort.
    */
  private val timedeltaSql: String = {
    def fd(x: String, q: Long) = s"CAST(floor(($x) / $q.0) AS BIGINT)"
    val d = fd("sec", 86400)
    val h = fd("sec % 86400", 3600)
    val m = fd("sec % 3600", 60)
    val sU = "sec % 60"
    def part(e: String, unit: String) =
      s"CASE WHEN $e = 0 THEN NULL WHEN $e = 1 THEN '1 $unit' " +
        s"ELSE CAST($e AS STRING) || ' ${unit}s' END"
    s"CASE WHEN sec = 0 THEN '0 seconds' ELSE concat_ws(', ', " +
      s"${part(d, "day")}, ${part(h, "hour")}, ${part(m, "minute")}, " +
      s"${part(sU, "second")}) END"
  }

  private def fnFormatTimedelta(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("sec", col("o_orderkey") % 500000)
      .select(col("o_orderkey"), col("sec"),
        expr(timedeltaSql).as("human"))
      .orderBy(col("o_orderkey"))

  private val fnFormatTimedeltaOracle: String =
    s"""WITH t AS (SELECT o_orderkey, o_orderkey % 500000 AS sec
          FROM orders)
        SELECT o_orderkey, sec, $timedeltaSql AS human
        FROM t ORDER BY o_orderkey"""

  /** ClickHouse `transform(x, from, to, default)` — the dictionary-array
    * recode that shows up in every ClickHouse ETL script. Spark-first
    * this is a MAP LITERAL lookup (`element_at` on a foldable
    * `map(...)`), not a when-chain: Catalyst constant-folds the map
    * once and the probe is a codegen'd hash lookup, O(1) per row
    * however many mapping pairs there are (a when-chain is O(pairs)
    * branches per row).
    *
    * Scale notes: pure narrow projection; the map literal ships in the
    * plan, nothing is broadcast or shuffled.
    */
  private def fnTransform(s: SparkSession, dir: String): DataFrame = {
    val prio = map(
      lit("1-URGENT"), lit("urgent"), lit("2-HIGH"), lit("high"),
      lit("3-MEDIUM"), lit("medium"))
    val status = map(lit("O"), lit(1), lit("F"), lit(2))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderstatus"),
        coalesce(element_at(prio, col("o_orderpriority")), lit("other"))
          .as("prio_class"),
        coalesce(element_at(status, col("o_orderstatus")), lit(0))
          .as("status_code"))
      .orderBy(col("o_orderkey"))
  }

  /** ClickHouse `arrayShingles(arr, k)` (23.8) — consecutive length-k
    * windows of an array, the array-level twin of text shingling (the
    * MinHash preprocessing primitive). Pure HOF projection:
    * `transform(sequence(1, n-k+1), i -> slice(arr, i, k))`; shingles
    * leave as canonical joined strings (the agg_collect representation
    * guard) plus the count and a distinct-count — the dedup-relevant
    * statistics.
    *
    * Scale notes: map-side only; output is O(tokens) per row and never
    * shuffles (the presentation sort is the only exchange).
    */
  private def fnArrayShingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        slice(split(col("text"), " "), 1, 12).as("arr"))
      .select(col("doc_id"), size(col("arr")).as("n_tokens"),
        // NOT sequence(1, greatest(n-2, 0)): Spark's sequence DESCENDS
        // when start > stop (sequence(1,0) = [1,0]), so short docs must
        // short-circuit to an empty shingle list explicitly
        expr("""CASE WHEN size(arr) < 3 THEN array()
                ELSE transform(sequence(1, size(arr) - 2),
                  i -> array_join(slice(arr, i, 3), ' ')) END""").as("sh"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("sh")).as("n_shingles"),
        size(array_distinct(col("sh"))).as("n_distinct"),
        array_join(slice(col("sh"), 1, 2), "|").as("first2"))
      .orderBy(col("doc_id"))

  private val fnArrayShinglesOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ')[1:12] AS arr
         FROM documents),
       s AS (SELECT doc_id, len(arr) AS n_tokens,
         list_transform(generate_series(1, GREATEST(len(arr) - 2, 0)),
           i -> array_to_string(arr[i:i+2], ' ')) AS sh
         FROM t)
       SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
         CAST(len(sh) AS INTEGER) AS n_shingles,
         CAST(len(list_distinct(sh)) AS INTEGER) AS n_distinct,
         array_to_string(sh[1:2], '|') AS first2
       FROM s ORDER BY doc_id"""

  /** ClickHouse `base58Encode`/`base58Decode` via the native codegen
    * [[graft.functions.Base58Encode]]/[[graft.functions.Base58Decode]]
    * pair. The oracle checks the ROUNDTRIP identity (decode∘encode =
    * id) — DuckDB has no base58, so the encoding itself is pinned by
    * CodecSpec's published test vectors ("Hello World!" →
    * "2NEpo7TZRRrLZSi2U", leading zero bytes → leading '1's).
    *
    * Scale notes: two narrow codegen'd projections, no shuffle beyond
    * the presentation sort.
    */
  private def fnBase58(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.customer(s, dir)
      .withColumn("b58",
        expr("base58_encode_native(cast(c_name as binary))"))
      .select(col("c_custkey"),
        expr("cast(base58_decode_native(b58) as string)").as("decoded"),
        (length(col("b58")) >= length(col("c_name"))).cast("int")
          .as("expands"))
      .orderBy(col("c_custkey"))
  }

  private val fnBase58Oracle: String =
    """SELECT c_custkey, c_name AS decoded, 1 AS expands
       FROM customer ORDER BY c_custkey"""

  /** ClickHouse `normalizeUTF8NFC`/`normalizeUTF8NFD` via the native
    * [[graft.functions.UnicodeNorm]] expression (JDK Normalizer tables).
    * The probe string appends a DECOMPOSED "café" (e + U+0301) to each
    * ASCII customer name: NFC fuses it to one codepoint (len drops by
    * 1), NFD of the NFC form restores the decomposed length — both
    * engines count codepoints, and DuckDB's `nfc_normalize` is the
    * oracle twin for the NFC arm (len_nfd relies on the names being
    * ASCII, which TPC-H c_name is by construction).
    */
  private def fnUnicodeNormalize(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.customer(s, dir)
      .withColumn("raw", concat(col("c_name"), lit(" cafe\u0301")))
      .select(col("c_custkey"),
        expr("nfc_native(raw)").as("nfc"),
        length(col("raw")).as("len_raw"),
        length(expr("nfc_native(raw)")).as("len_nfc"),
        length(expr("nfd_native(nfc_native(raw))")).as("len_nfd"))
      .orderBy(col("c_custkey"))
  }

  private val fnUnicodeNormalizeOracle: String =
    """WITH t AS (SELECT c_custkey,
         c_name || ' cafe' || chr(769) AS raw FROM customer)
       SELECT c_custkey, nfc_normalize(raw) AS nfc,
         length(raw) AS len_raw,
         length(nfc_normalize(raw)) AS len_nfc,
         length(raw) AS len_nfd
       FROM t ORDER BY c_custkey"""

  /** ClickHouse vector-distance family (`L1Distance`, `L2Distance`,
    * `LinfDistance`, `cosineDistance`) over consecutive embedding pairs
    * (vec_id joined to vec_id+1 — an equi join, no cross product). The
    * L1/L∞ folds are left-to-right HOFs mirroring DuckDB's ordered
    * `list_sum`/`list_max`; L2 and cosine ride the native codegen
    * kernels ([[graft.functions.EuclidSq]]/CosineSim).
    *
    * Scale notes: one shuffle on the join key; per-pair work is O(dim)
    * inside codegen. The HOF lane exists to pin fold-order parity — a
    * throughput path would use the native kernels for all four.
    */
  private def fnDistanceFamily(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val dblV = (c: org.apache.spark.sql.Column) =>
      transform(c, x => x.cast("double"))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), dblV(col("embedding")).as("v"))
    val nxt = e.select((col("vec_id") - 1).as("vec_id"), col("v").as("w"))
    e.join(nxt, "vec_id")
      .select(col("vec_id"),
        round(expr(
          "aggregate(zip_with(v, w, (x, y) -> abs(x - y)), 0d, " +
            "(acc, d) -> acc + d)"), 6).as("l1"),
        round(expr(
          "array_max(zip_with(v, w, (x, y) -> abs(x - y)))"), 6).as("linf"),
        round(sqrt(expr("l2_sq_native(v, w)")), 6).as("l2"),
        round(lit(1.0) - expr("cosine_sim_native(v, w)"), 6).as("cos_dist"))
      .orderBy(col("vec_id"))
  }

  private val fnDistanceFamilyOracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         FROM embeddings),
       p AS (SELECT a.vec_id, a.v, b.v AS w
         FROM e a JOIN e b ON b.vec_id = a.vec_id + 1)
       SELECT vec_id,
         round(list_sum(list_transform(generate_series(1, len(v)),
           i -> abs(v[i] - w[i]))), 6) AS l1,
         round(list_max(list_transform(generate_series(1, len(v)),
           i -> abs(v[i] - w[i]))), 6) AS linf,
         round(sqrt(list_sum(list_transform(generate_series(1, len(v)),
           i -> (v[i] - w[i]) * (v[i] - w[i])))), 6) AS l2,
         round(1.0 - list_dot_product(v, w)
           / (sqrt(list_dot_product(v, v))
              * sqrt(list_dot_product(w, w))), 6) AS cos_dist
       FROM p ORDER BY vec_id"""

  /** ClickHouse tuple ordering (`tuple()`, `tupleElement`, argMin/argMax
    * via tuple comparison): Spark structs ORDER lexicographically, so
    * `min(struct(bal, key))` IS argmin — one partial-aggregated scan, no
    * window shuffle. The oracle recomputes both ends with explicit
    * row_number windows, proving the struct-ordering semantics.
    */
  private def fnTuple(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        min(struct(col("c_acctbal"), col("c_custkey"))).as("lo"),
        max(struct(col("c_acctbal"), col("c_custkey"))).as("hi"),
        count(lit(1)).as("n"))
      .select(col("c_mktsegment"),
        col("lo.c_acctbal").as("lo_bal"), col("lo.c_custkey").as("lo_key"),
        col("hi.c_acctbal").as("hi_bal"), col("hi.c_custkey").as("hi_key"),
        col("n"))
      .orderBy(col("c_mktsegment"))

  private val fnTupleOracle: String =
    """WITH lo AS (SELECT c_mktsegment, c_acctbal AS lo_bal,
         c_custkey AS lo_key FROM (
         SELECT c_mktsegment, c_acctbal, c_custkey,
           row_number() OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal ASC, c_custkey ASC) AS rn
         FROM customer) t WHERE rn = 1),
       hi AS (SELECT c_mktsegment, c_acctbal AS hi_bal,
         c_custkey AS hi_key FROM (
         SELECT c_mktsegment, c_acctbal, c_custkey,
           row_number() OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
         FROM customer) t WHERE rn = 1),
       n AS (SELECT c_mktsegment, COUNT(*) AS n FROM customer
         GROUP BY c_mktsegment)
       SELECT c_mktsegment, lo_bal, lo_key, hi_bal, hi_key, n
       FROM lo JOIN hi USING (c_mktsegment) JOIN n USING (c_mktsegment)
       ORDER BY c_mktsegment"""

  private val fnTransformOracle: String =
    """SELECT o_orderkey, o_orderpriority, o_orderstatus,
         CASE o_orderpriority
           WHEN '1-URGENT' THEN 'urgent' WHEN '2-HIGH' THEN 'high'
           WHEN '3-MEDIUM' THEN 'medium' ELSE 'other' END AS prio_class,
         CAST(CASE o_orderstatus
           WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 0 END AS INTEGER)
           AS status_code
       FROM orders ORDER BY o_orderkey"""

  private val fnRoundSpecialOracle: String =
    s"""WITH t AS (SELECT o_orderkey, o_totalprice,
          CAST(o_custkey % 120 AS INTEGER) AS age,
          CAST(o_orderkey % 40000 AS INTEGER) AS dur FROM orders)
        SELECT o_orderkey,
          $exp2Sql AS price_exp2,
          $downSql AS price_down,
          $ageSql AS age_bracket,
          $durSql AS duration_bracket
        FROM t ORDER BY o_orderkey"""
}
