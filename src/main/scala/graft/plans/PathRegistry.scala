package graft.plans

/** Path-keyed routing registry shared by the transparent-routing rules
  * (MvRouting, ProjectionRouting): one normalization of scan root paths
  * (scheme stripped, trailing slashes trimmed) so a future change —
  * URI-encoding, hdfs:// handling — lands in exactly one place.
  */
private[plans] final class PathRegistry[T] {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, T]()
  def put(basePath: String, d: T): Unit =
    { m.put(PathRegistry.canonical(basePath), d); () }
  def forPath(p: String): Option[T] =
    Option(m.get(PathRegistry.canonical(p)))
  def remove(basePath: String): Unit =
    { m.remove(PathRegistry.canonical(basePath)); () }
}

/** Freshness hub for the transparent-routing registries: a mutation on a
  * base table must never let a routed query serve PRE-mutation data. The
  * mutation machinery (Scans.applyIssued — the one choke point every
  * ALTER flows through) calls [[invalidateBase]] after the staged swap;
  * each registry drops its entry for that base, so routing falls through
  * to the (now mutated) base scan — always correct, merely unrouted —
  * until the owner rebuilds the derived artifact and re-registers. This
  * is the ClickHouse contract (MVs/projections maintained on write)
  * expressed as invalidate-then-refresh rather than write-through.
  */
private[graft] object Routing {
  def invalidateBase(basePath: String): Unit = {
    MvRouting.invalidate(basePath)
    ProjectionRouting.invalidate(basePath)
    TextIndexRouting.invalidate(basePath)
  }
}

private[graft] object PathRegistry {
  /** Staleness guard for routing targets: the registries are JVM-global
    * but the staged roots they point at are versioned and GC'd by
    * Scratch.versionedRoot on testdata supersession — between the GC
    * sweep and the re-stage/re-register, a registry entry can dangle.
    * Routing must then fall through (unrouted is always correct);
    * rewriting to a deleted path crashes the query inside the optimizer.
    */
  /** ONE canonical registry key per path, whatever rendering it
    * arrives in. file:/p, file:///p and /p all meet on /p
    * (DataFrameReader vs Hadoop Path render file URIs differently — a
    * miss here means routing silently never fires, with no error to
    * notice). A remote URI KEEPS its scheme+authority: hdfs://hostA/p
    * must never collide with a local /p. URI-unparseable strings
    * (spaces, brackets) fall back to the legacy scheme-strip +
    * leading-slash collapse so both renderings still meet on one key.
    */
  private[graft] def canonical(p: String): String = {
    val noTrail = p.replaceAll("/+$", "")
    try {
      val u = new java.net.URI(noTrail)
      val path = u.getPath
      if (path == null || path.isEmpty || u.getScheme == null)
        // ABSOLUTIZE scheme-less paths: a registration keyed by a
        // relative path could otherwise never meet the absolute file:/
        // rendering HadoopFsRelation.rootPaths produces, and routing
        // would silently never fire for it
        new java.io.File(noTrail).getAbsolutePath
      else if (u.getScheme == "file") path
      else u.getScheme + "://" + Option(u.getAuthority).getOrElse("") + path
    } catch {
      case _: java.net.URISyntaxException =>
        noTrail.stripPrefix("file:").replaceAll("^/+", "/")
    }
  }

  /** Order-independent fingerprint of a scan's FILE LIST — (count, sum
    * of per-name FNV hashes over canonicalized paths). The staleness
    * sentinel behind registration-time snapshots: parquet writers emit
    * fresh UUID part names on every append/overwrite, so any
    * out-of-band change to a base's visible files changes this value.
    * O(files) driver arithmetic over a listing the scan has already
    * materialized — no extra I/O at rule time.
    */
  def fileFingerprint(files: Iterable[String]): (Long, Long) = {
    var n = 0L
    var h = 0L
    files.foreach { f =>
      var th = 0xcbf29ce484222325L
      canonical(f).foreach { c => th ^= c.toLong; th *= 0x100000001b3L }
      n += 1
      h += th // commutative sum — listing order is irrelevant
    }
    (n, h)
  }

  // ---- per-FileIndex fingerprint memo (r13 ADVICE finding 4) ----
  // The routing rules live in a FixedPoint optimizer batch, so each rule
  // re-runs over the same plan until quiescence — recomputing the O(files)
  // fingerprint per iteration (and per registered def) is pure waste at
  // the 10^6-file scale the docs target. Keyed by the FileIndex INSTANCE
  // under IDENTITY, never equals(): InMemoryFileIndex.equals compares
  // rootPaths only, so an equals-keyed memo would serve the PRE-append
  // fingerprint for a fresh post-append listing of the same root and
  // blind the out-of-band-change sentinel. Sound because a FileIndex's
  // listing is materialized at construction and immutable thereafter
  // (nothing in this library calls FileIndex.refresh()). CAVEAT (r14
  // ADVICE finding 5): Spark ITSELF can refresh a CACHED/CATALOG-TABLE
  // FileIndex in place (REFRESH TABLE, insert-triggered refreshByPath),
  // after which an identity-keyed memo would serve the pre-change
  // fingerprint. That shape cannot reach this cache today — every
  // routing def is registered against a PATH-based read
  // (spark.read.parquet), whose InMemoryFileIndex is built fresh per
  // DataFrame and is never the CatalogFileIndex the refresh machinery
  // mutates. If catalog-table routing is ever added, key this memo on
  // (identity, listing epoch) instead. Bounded FIFO so per-query
  // FileIndex instances cannot accumulate.
  private val fpCache = new java.util.IdentityHashMap[AnyRef, AnyRef]()
  private val fpOrder = new java.util.ArrayDeque[AnyRef]()
  private val fpCacheMax = 64

  /** Per-root file fingerprints of a scan, memoized on the FileIndex
    * instance: single-root scans map their one root to the fingerprint
    * of the whole listing; multi-root scans split the listing per root
    * (a root can BE a single parquet file — the fixture tables are
    * one-file "directories" — so exact match, not just dir prefix).
    */
  def fingerprintsByRoot(
      loc: org.apache.spark.sql.execution.datasources.FileIndex)
      : Map[String, (Long, Long)] = fpCache.synchronized {
    val hit = fpCache.get(loc)
    if (hit != null) return hit.asInstanceOf[Map[String, (Long, Long)]]
    val roots = loc.rootPaths.map(_.toString)
    val files = loc.inputFiles.toSeq
    val v: Map[String, (Long, Long)] =
      if (roots.lengthCompare(1) == 0)
        Map(roots.head -> fileFingerprint(files))
      else roots.map { r =>
        val cr = canonical(r)
        val crSlash = cr + "/"
        r -> fileFingerprint(files.filter { f =>
          val cf = canonical(f)
          cf == cr || cf.startsWith(crSlash)
        })
      }.toMap
    fpCache.put(loc, v)
    fpOrder.addLast(loc)
    while (fpCache.size > fpCacheMax) fpCache.remove(fpOrder.pollFirst())
    v
  }

  def targetExists(p: String): Boolean = {
    val c = canonical(p)
    // a remote scheme+authority key cannot be probed with java.io.File
    // (always false — routing would silently never fire for hdfs/s3
    // targets). The existence check exists to catch LOCALLY GC'd
    // scratch roots, so non-local targets are assumed live.
    if (c.contains("://")) true else new java.io.File(c).exists()
  }
}
