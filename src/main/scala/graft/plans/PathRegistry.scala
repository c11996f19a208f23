package graft.plans

/** Path-keyed routing registry shared by the transparent-routing rules
  * (MvRouting, ProjectionRouting): one normalization of scan root paths
  * (scheme stripped, trailing slashes trimmed) so a future change —
  * URI-encoding, hdfs:// handling — lands in exactly one place.
  */
private[plans] final class PathRegistry[T] {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, T]()
  private def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")
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
    new java.io.File(p.stripPrefix("file:")).exists()
}
