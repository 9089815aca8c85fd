package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over a candidate-pair edge list —
  * the step that turns near-duplicate PAIRS into dedup CLUSTERS (pick
  * one canonical doc per component, drop the rest).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard O(log² n)-round scheme. Each half-round is expressed as a
  * window-min over the edge list itself (`min(v) OVER (PARTITION BY u)`)
  * so adjacency lists are NEVER materialized: a component hub with 10⁸
  * members costs a sort partition, not a 10⁸-element `collect_list`.
  *
  * 100 TB design notes:
  *  - per round: one shuffle for the window + one for `distinct` —
  *    both on (long, long) edge rows only;
  *  - lineage is truncated every round (`localCheckpoint`; swap for
  *    `checkpoint` + a checkpoint dir on a real cluster) so the plan
  *    does not grow exponentially across iterations;
  *  - convergence is detected from a one-row aggregate checksum of the
  *    edge multiset, not by collecting edges.
  */
object ConnectedComponents {

  /** Component assignment for every node appearing in `pairs`:
    * (id, component) where component = smallest node id reachable.
    * Node ids must be non-null and are compared as longs.
    */
  def assign(pairs: DataFrame, srcCol: String, dstCol: String,
             maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    var edges = pairs
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter($"u" =!= $"v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .distinct()
      .localCheckpoint()

    def checksum(e: DataFrame): (Long, Long) = {
      // XOR-fold is order-independent and cannot overflow under ANSI
      // mode (edges are distinct, so XOR is a faithful multiset hash)
      e.agg(count(lit(1)), coalesce(bit_xor(xxhash64($"u", $"v")), lit(0L)))
        .as[(Long, Long)].first()
    }

    // large-star: connect every neighbor larger than u to u's minimum
    // neighborhood label; keeps large components shrinking in parallel.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
      val m = least(min($"v").over(Window.partitionBy($"u")), $"u")
      sym.select($"u", $"v", m.as("m"))
        .filter($"v" > $"u")
        .select($"v".as("a"), $"m".as("b"))
        .filter($"a" =!= $"b")
        .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
        .distinct()
    }

    // small-star: edges are normalized (u=small, v=big); around each big
    // endpoint v, point every small neighbor and v itself at the minimum
    // small neighbor.
    def smallStar(e: DataFrame): DataFrame = {
      val withMin = e.select($"u", $"v",
        min($"u").over(Window.partitionBy($"v")).as("m"))
      val reattached = withMin.filter($"u" =!= $"m").select($"u".as("a"), $"m".as("b"))
      val center     = withMin.select($"v".as("a"), $"m".as("b"))
      reattached.union(center)
        .filter($"a" =!= $"b")
        .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
        .distinct()
    }

    var prev = checksum(edges)
    var iter = 0
    var converged = edges.isEmpty
    // each round's localCheckpoint persists its blocks; once the NEXT
    // checkpoint is materialized (by checksum), the previous round's
    // blocks are dead — free them, or an n-round run holds n copies of
    // the edge set in the block manager (a leak at 100 TB, GC pressure
    // even at bench scale)
    val sc = edges.sparkSession.sparkContext
    var prevCkptIds: Set[Int] = Set.empty
    while (!converged && iter < maxIter) {
      val before = sc.getPersistentRDDs.keySet
      edges = smallStar(largeStar(edges)).localCheckpoint()
      val cur = checksum(edges)
      val created = sc.getPersistentRDDs.keySet.toSet -- before
      prevCkptIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevCkptIds = created.toSet
      converged = cur == prev
      prev = cur
      iter += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connected components did not converge in $maxIter iterations; " +
          "component labels may be split — raise maxIter")

    // converged edge set is a union of stars (v, componentMin): label
    // every node with the min over itself and its neighbors.
    val sym = edges.union(edges.select($"v".as("u"), $"u".as("v")))
    sym.groupBy($"u")
      .agg(min($"v").as("mn"))
      .select($"u".as("id"), least($"u", $"mn").as("component"))
  }

  /** Dedup-cluster assignment over a full document set: every id in
    * `docs` gets a cluster (the component min over `pairs`, or itself
    * when it collides with nothing) and a canonical flag. Keeping only
    * `is_canonical` rows is the dedup.
    */
  def clusters(docs: DataFrame, idCol: String, pairs: DataFrame,
               srcCol: String, dstCol: String): DataFrame = {
    val comp = assign(pairs, srcCol, dstCol)
      .withColumnRenamed("id", "__cc_id")
    docs.select(col(idCol).cast("long").as(idCol))
      .join(comp, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
      .withColumn("is_canonical", col(idCol) === col("cluster_id"))
  }
}
