package graft.plans

/** Path-keyed routing registry shared by the transparent-routing rules
  * (MvRouting, ProjectionRouting): one normalization of scan root paths
  * (scheme stripped, trailing slashes trimmed) so a future change —
  * URI-encoding, hdfs:// handling — lands in exactly one place.
  */
private[plans] final class PathRegistry[T] {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, T]()
  // URI-aware (TextIndexRouting.normFile): a bare stripPrefix("file:")
  // maps file:///p to ///p but file:/p to /p — registration and lookup
  // arrive in DIFFERENT renderings (DataFrameReader vs Hadoop Path), so
  // the registry would silently miss and routing would never fire
  private def norm(p: String): String =
    TextIndexRouting.normFile(p).replaceAll("/+$", "")
  def put(basePath: String, d: T): Unit = { m.put(norm(basePath), d); () }
  def forPath(p: String): Option[T] = Option(m.get(norm(p)))
}

private[plans] object PathRegistry {
  /** Staleness guard for routing targets: the registries are JVM-global
    * but the staged roots they point at are versioned and GC'd by
    * Scratch.versionedRoot on testdata supersession — between the GC
    * sweep and the re-stage/re-register, a registry entry can dangle.
    * Routing must then fall through (unrouted is always correct);
    * rewriting to a deleted path crashes the query inside the optimizer.
    */
  def targetExists(p: String): Boolean =
    new java.io.File(TextIndexRouting.normFile(p)).exists()
}
