package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Transitive near-duplicate clustering — the step every pairwise dedup
  * (minhash/simhash/jaccard) needs before it can DROP anything: near-dup
  * is not transitive, so pairs (a,b),(b,c) must collapse into one cluster
  * {a,b,c} with a single canonical survivor. This is connected components
  * over the candidate-pair graph.
  *
  * Spark-first shape: iterative min-label propagation as a driver loop of
  * DataFrame joins — each round every node adopts the smallest component
  * id among itself and its neighbours; fixpoint = components found. The
  * loop body is declarative (Catalyst plans each round; AQE sizes the
  * shuffles), `localCheckpoint()` cuts the lineage each round so plan
  * depth stays O(1), and convergence needs O(graph diameter) rounds —
  * near-dup clusters are short chains (bounded by the blocking window),
  * so diameter is small by construction. For adversarial long-chain
  * graphs the same loop upgrades to large-star/small-star (Kiveris et al.
  * 2014) at O(log n) rounds; the fixture graph converges in 2-3 either
  * way, so the simpler alternating form is the one shipped.
  *
  * Scale notes: state per round is one (id, comp) row per node — O(docs),
  * never O(pairs); edges persist once (MEMORY_AND_DISK) and re-join each
  * round; the convergence probe is `isEmpty` on the changed-set (driver
  * reads one boolean, not data). 100 TB corpora have ~10^10 nodes: each
  * round is one shuffled join + partial-agg min — the same plan GraphX'
  * connectedComponents lowers to, without the RDD detour.
  */
object DedupGraph {

  /** Near-dup edges: exact-Jaccard ≥ 0.8 inside the deterministic
    * candidate block (doc_id % 10 == 0) — same inverted-index-in-block
    * shape as dedup_jaccard (LlmText.scala), which documents why that
    * form is the verification oracle while banded MinHash is the scale
    * path for candidate generation.
    */
  private[graft] def edges(s: SparkSession, dir: String): DataFrame = {
    val cand = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("tokset"))
    val sizes = cand.select(col("doc_id"), size(col("tokset")).as("sz"))
    val inv = cand.select(col("doc_id"), explode(col("tokset")).as("token"))
    inv.as("a")
      .join(inv.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("sz", "sz_b"), "id_b")
      .filter(col("n_inter").cast("double")
        / (col("sz_a") + col("sz_b") - col("n_inter")) >= 0.8)
      .select(col("id_a"), col("id_b"))
  }

  /** The propagation loop itself, shared by dedup_cluster (reports the
    * components) and dedup_canonical (uses them to pick survivors).
    */
  private[graft] def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir)
    // undirected: propagate labels both ways
    val und = e.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("id"))
    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < 30) {
      val nbrMin = und.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("nbr_min"))
      // the changed flag rides along into the checkpoint, so convergence
      // is a filter on materialized data — not a third join per round
      val next = labels.as("l")
        .join(nbrMin, col("l.id") === col("src"), "left")
        .select(col("l.id").as("id"),
          least(col("l.comp"), coalesce(col("nbr_min"), col("l.comp")))
            .as("comp"),
          coalesce(col("nbr_min") < col("l.comp"), lit(false)).as("changed"))
        .localCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      labels = next.drop("changed")
      rounds += 1
    }
    und.unpersist()
    labels.select(col("id").as("doc_id"), col("comp").as("cluster_id"))
  }

  private def dedupCluster(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir)
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .orderBy(col("doc_id"))

  /** Quality-based survivor selection — the decision step a production
    * dedup actually runs: within each near-dup cluster keep the HIGHEST
    * QUALITY member (text_quality's score), not the smallest id. Min-id
    * canonicalization (dedup_cluster) is the bookkeeping answer; a
    * training pipeline wants the best copy of each duplicated document to
    * survive. Tiebreak doc_id for determinism.
    *
    * Scale notes: labels are O(docs in blocks); the quality score is the
    * map-side text_quality expression computed only for clustered docs;
    * survivor choice is one window over clusters (bounded groups — a
    * cluster is a near-dup set, not the corpus).
    */
  private def dedupCanonical(s: SparkSession, dir: String): DataFrame = {
    val en = Seq("the", "a", "of", "and", "to", "in")
    val quality = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .withColumn("arr", split(col("text"), " "))
      .select(col("doc_id"),
        round(
          (size(filter(col("arr"), x => x.isin(en.map(lit): _*))).cast("double")
            / size(col("arr"))) * 0.5 +
            (size(array_distinct(col("arr"))).cast("double") / size(col("arr")))
              * 0.5, 6).as("quality"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    clusterLabels(s, dir)
      .join(quality, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("quality"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** One PageRank iteration over the customer→supplier purchase graph
    * (who supplies the important buyers?), in FIXED-POINT micro-units so
    * the damped contribution `0.85/outdeg` is integer division — exact
    * and identical on both engines, no double summation anywhere. From a
    * uniform prior (1.0 per node): pr_micro(s) = 150000 +
    * Σ_{c→s} 850000 div outdeg(c). One iteration is THE production step —
    * at 100 TB you checkpoint between iterations (dedup_cluster's loop
    * pattern), you don't fuse them.
    *
    * Scale notes: distinct edges = one shuffle on (cust, supp); outdeg =
    * partial count on cust broadcast back onto edges (dim-sized); the
    * contribution sum is one partial-agg shuffle on supp. Linear in
    * |edges|, the textbook distributed PR step.
    */
  private def graphPagerankStep(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // no broadcast hint: AQE broadcasts while outdeg is dimension-sized
    // and falls back to a src-co-partitioned shuffle join when the node
    // set outgrows the threshold — the right call at both scales
    edges.join(outdeg, "src")
      .groupBy(col("dst").as("s_suppkey"))
      .agg((lit(150000L) + sum(expr("850000 div outdeg"))).as("pr_micro"),
        count(lit(1)).as("n_in"))
      .orderBy(col("s_suppkey"))
  }

  /** Distributed triangle counting over the part co-purchase graph
    * (parts appearing in the same order are connected): the ORDERED-
    * WEDGE formulation — undirected edges oriented low→high key, wedges
    * (a<b<c) built by joining edges on the shared low endpoint, each
    * wedge closed by probing the edge set for (a, c). Every triangle is
    * counted exactly once, and orientation caps the wedge fan-out by
    * each node's LOW-degree, the standard skew bound (a hub's wedges
    * spread across the low-keyed neighbors instead of squaring on the
    * hub). Integer counts only — exact on both engines.
    *
    * Scale notes: two shuffle joins on the distinct edge set, the
    * canonical MapReduce triangle algorithm (Suri & Vassilvitskii,
    * WWW'11 — node-iterator++). Edge dedup is one shuffle. Orientation
    * here is by KEY (uniform-ish co-purchase degrees); on a power-law
    * graph swap the comparator to (degree, key) — degree-ordered
    * orientation bounds per-node wedge work by arboricity instead of
    * max degree, same plan shape, one extra degree broadcast.
    */
  private def graphTriangleCount(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = li.as("a").join(li.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
    val wedges = edges.as("e1").join(edges.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val tris = wedges.join(edges,
      col("b") === col("u") && col("c") === col("v"))
    tris.agg(count(lit(1)).as("n_triangles"),
        count_distinct(col("a")).as("n_apex_nodes"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("graph_triangle_count", graphTriangleCount,
      Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem),
              edges AS (SELECT DISTINCT a.pk AS u, b.pk AS v
                FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
              wedges AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM edges e1 JOIN edges e2
                ON e1.u = e2.u AND e1.v < e2.v),
              tris AS (SELECT w.a FROM wedges w
                JOIN edges e ON w.b = e.u AND w.c = e.v)
              SELECT COUNT(*) AS n_triangles,
                COUNT(DISTINCT a) AS n_apex_nodes
              FROM tris""")),
    QueryDef("graph_pagerank_step", graphPagerankStep,
      Some("""WITH edges AS (SELECT DISTINCT o_custkey AS src,
                 l_suppkey AS dst
                 FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
               deg AS (SELECT src, COUNT(*) AS outdeg
                 FROM edges GROUP BY src)
              SELECT dst AS s_suppkey,
                CAST(150000 + SUM(850000 // outdeg) AS BIGINT) AS pr_micro,
                COUNT(*) AS n_in
              FROM edges JOIN deg USING (src)
              GROUP BY dst ORDER BY s_suppkey""")),
    QueryDef("dedup_cluster", dedupCluster,
      // oracle: transitive closure by recursive CTE — exact fixpoint
      // semantics, feasible because blocking bounds component size
      Some("""WITH RECURSIVE
              cand AS (SELECT doc_id,
                list_distinct(string_split(text, ' ')) AS tokset
                FROM documents WHERE doc_id % 10 = 0),
              sizes AS (SELECT doc_id, len(tokset) AS sz FROM cand),
              inv AS (SELECT doc_id, unnest(tokset) AS token FROM cand),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                COUNT(*) AS n_inter
                FROM inv a JOIN inv b
                  ON a.token = b.token AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id),
              pairs AS (SELECT id_a, id_b FROM inter
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
                WHERE CAST(n_inter AS DOUBLE)
                  / (sa.sz + sb.sz - n_inter) >= 0.8),
              edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
              reach(src, dst) AS (
                SELECT doc_id, doc_id FROM cand
                UNION
                SELECT r.src, e.dst FROM reach r
                JOIN edges e ON r.dst = e.src)
              SELECT src AS doc_id, MIN(dst) AS cluster_id,
                src = MIN(dst) AS is_canonical
              FROM reach GROUP BY src ORDER BY doc_id""")),
    QueryDef("dedup_canonical", dedupCanonical,
      Some("""WITH RECURSIVE
              cand AS (SELECT doc_id,
                list_distinct(string_split(text, ' ')) AS tokset
                FROM documents WHERE doc_id % 10 = 0),
              sizes AS (SELECT doc_id, len(tokset) AS sz FROM cand),
              inv AS (SELECT doc_id, unnest(tokset) AS token FROM cand),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                COUNT(*) AS n_inter
                FROM inv a JOIN inv b
                  ON a.token = b.token AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id),
              pairs AS (SELECT id_a, id_b FROM inter
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
                WHERE CAST(n_inter AS DOUBLE)
                  / (sa.sz + sb.sz - n_inter) >= 0.8),
              edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
              reach(src, dst) AS (
                SELECT doc_id, doc_id FROM cand
                UNION
                SELECT r.src, e.dst FROM reach r
                JOIN edges e ON r.dst = e.src),
              labels AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
                FROM reach GROUP BY src),
              q AS (SELECT doc_id,
                round(CAST(len(list_filter(arr,
                    x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
                    / len(arr) * 0.5
                  + CAST(len(list_distinct(arr)) AS DOUBLE) / len(arr) * 0.5,
                  6) AS quality
                FROM (SELECT doc_id, string_split(text, ' ') AS arr
                      FROM documents WHERE doc_id % 10 = 0) t),
              j AS (SELECT l.doc_id, l.cluster_id, q.quality,
                row_number() OVER (PARTITION BY l.cluster_id
                  ORDER BY q.quality DESC, l.doc_id) AS rn
                FROM labels l JOIN q ON l.doc_id = q.doc_id)
              SELECT doc_id, cluster_id, quality, rn = 1 AS keep
              FROM j ORDER BY doc_id""")),
  )
}
