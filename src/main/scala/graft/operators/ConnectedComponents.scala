package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over a candidate-pair edge list —
  * the step that turns near-duplicate PAIRS into dedup CLUSTERS (pick
  * one canonical doc per component, drop the rest).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard O(log² n)-round scheme. Each half-round computes the
  * per-node neighborhood minimum with a `groupBy(key).agg(min(...))`
  * that is joined back onto the edge list. The aggregate combines
  * map-side (partial min before the shuffle), so a zipf hub with 10⁸
  * neighbors ships ~one row per upstream partition — NOT 10⁸ rows into
  * a single sort task, which is what the previous window-based
  * (`min(v) OVER (PARTITION BY u)`) formulation cost: window aggregates
  * cannot partial-aggregate, and AQE skew splitting does not apply to
  * window partitions. The join back is hot-key salted
  * (`Skew.saltedJoinHotOnly`): only keys above a neighbor-count
  * threshold pay the salt, so a hub's edge rows fan out across
  * `ccSalts` reducer keys while a uniform graph joins plain with zero
  * replication.
  *
  * 100 TB design notes:
  *  - per half-round: one map-side-combined shuffle for the min, one
  *    shuffle for the join-back, one for `distinct` — all on
  *    (long, long) rows only; adjacency lists are never materialized;
  *  - lineage is truncated every round via an INJECTABLE
  *    [[CheckpointStrategy]]: `localCheckpoint` by default (fast, not
  *    fault-tolerant), a reliable checkpoint dir on clusters (set
  *    `spark.graft.cc.checkpointDir` or pass the strategy explicitly);
  *    the previous round's blocks/files are freed by walking the
  *    checkpointed RDD handle directly (never by diffing the global
  *    persistent-RDD registry, which would race with concurrent jobs
  *    on a shared SparkContext);
  *  - convergence is detected from a one-row aggregate checksum of the
  *    edge multiset, not by collecting edges.
  */
object ConnectedComponents {

  /** Salt fan-out for the min join-back: a hub key's edge rows spread
    * across this many reducer keys instead of one. Deterministic (does
    * not depend on AQE detecting the skew at runtime — AQE's skew-join
    * rewrite only matches a shuffle stage DIRECTLY under the join, and
    * the mins side here sits behind a final HashAggregate, so it would
    * never fire). Salting is hot-key-only ([[Skew.saltedJoinHotOnly]]):
    * keys with ≥ `defaultHotThreshold` neighbors — by pigeonhole at
    * most |E|/threshold keys, a broadcastable set — pay the salt; on a
    * uniform graph the join degenerates to a plain shuffle join with
    * zero replication.
    */
  private val ccSalts = 16

  /** Neighbor count at which a key counts as a hub. 100k rows ≈ 1.6 MB
    * of edge data per reducer before salting even starts to matter;
    * tests pass a low value to exercise the hub path at toy scale.
    */
  val defaultHotThreshold = 100000L

  /** Join the per-key mins (carrying `__cnt`) back onto `big`. When
    * `mayHaveHot` is false — the caller PROVED no key can reach the hot
    * threshold (total row count < threshold, known for free from the
    * convergence checksum) — this is a plain shuffle join with no
    * broadcast job and no duplicate aggregate evaluation; otherwise the
    * hot-key-salted join fans hub rows across `ccSalts` reducer keys.
    * Either way: no window, map-side-combined min, identical results.
    */
  private def minJoinBack(big: DataFrame, mins: DataFrame, key: String,
                          hotThreshold: Long, mayHaveHot: Boolean): DataFrame =
    if (mayHaveHot)
      Skew.saltedJoinHotOnly(big, mins, key, "__cnt", ccSalts, hotThreshold)
    else
      big.join(mins.drop("__cnt"), Seq(key))

  /** large-star half-round: connect every neighbor larger than u to u's
    * minimum neighborhood label; keeps large components shrinking in
    * parallel. Exposed for plan-shape tests (no WindowExec).
    */
  private[graft] def largeStar(e: DataFrame,
                               hotThreshold: Long = defaultHotThreshold,
                               mayHaveHot: Boolean = true): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
    // per-node min over the full symmetric neighborhood; partial-aggregates
    // map-side, so a hub key arrives at the reducer pre-combined — and the
    // same aggregate yields the neighbor count that drives hot-key salting
    val mins = sym.groupBy($"u").agg(min($"v").as("mn"), count(lit(1)).as("__cnt"))
      .select($"u", least($"u", $"mn").as("m"), $"__cnt")
    minJoinBack(sym.filter($"v" > $"u"), mins, "u", hotThreshold, mayHaveHot)
      .select($"v".as("a"), $"m".as("b"))
      .filter($"a" =!= $"b")
      .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
      .distinct()
  }

  /** small-star half-round: edges are normalized (u=small, v=big);
    * around each big endpoint v, point every small neighbor and v
    * itself at the minimum small neighbor.
    */
  private[graft] def smallStar(e: DataFrame,
                               hotThreshold: Long = defaultHotThreshold,
                               mayHaveHot: Boolean = true): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val mins = e.groupBy($"v").agg(min($"u").as("m"), count(lit(1)).as("__cnt"))
    val reattached = minJoinBack(e, mins, "v", hotThreshold, mayHaveHot)
      .filter($"u" =!= $"m").select($"u".as("a"), $"m".as("b"))
    // one center row per distinct v suffices (the trailing distinct
    // would collapse the per-edge duplicates anyway)
    val center = mins.select($"v".as("a"), $"m".as("b"))
    reattached.union(center)
      .filter($"a" =!= $"b")
      .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
      .distinct()
  }

  /** The RDDs actually holding a checkpointed Dataset's blocks: walk the
    * physical RDD's dependency chain down to the first persisted
    * ancestors. Public RDD API only; deterministic (no global-registry
    * snapshot diffing).
    */
  private def persistedAncestors(rdd: RDD[_]): Seq[RDD[_]] =
    if (rdd.getStorageLevel != StorageLevel.NONE) Seq(rdd)
    else rdd.dependencies.flatMap(d => persistedAncestors(d.rdd)).toSeq

  /** How a round truncates lineage. `localCheckpoint` keeps blocks on
    * executors only — fast, but NOT fault-tolerant: losing an executor
    * mid-run loses blocks whose lineage was just truncated, failing the
    * job (fine for tests/single-node). A reliable checkpoint writes
    * rounds to a fault-tolerant directory — the cluster setting, at the
    * price of one FS write per round.
    */
  sealed trait CheckpointStrategy
  case object LocalCheckpoint extends CheckpointStrategy
  final case class ReliableCheckpoint(dir: String) extends CheckpointStrategy

  /** Session-conf key selecting the reliable strategy: set it to a
    * fault-tolerant path (HDFS/object store) on clusters; unset = local.
    */
  val checkpointDirConf = "spark.graft.cc.checkpointDir"

  private def strategyFor(spark: org.apache.spark.sql.SparkSession): CheckpointStrategy =
    spark.conf.getOption(checkpointDirConf)
      .map(ReliableCheckpoint.apply).getOrElse(LocalCheckpoint)

  private def truncate(df: DataFrame, strategy: CheckpointStrategy): DataFrame =
    strategy match {
      case LocalCheckpoint => df.localCheckpoint()
      case ReliableCheckpoint(dir) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.exists(_.startsWith(dir))) sc.setCheckpointDir(dir)
        df.checkpoint()
    }

  /** Reliable-checkpoint files reachable from `rdd` (post-truncation the
    * checkpointed ancestor reports its file); dead rounds delete these
    * so an n-round run holds ≤2 rounds on disk, not n.
    */
  private def checkpointFiles(rdd: RDD[_]): Seq[String] =
    if (rdd.getCheckpointFile.isDefined) rdd.getCheckpointFile.toSeq
    else rdd.dependencies.flatMap(d => checkpointFiles(d.rdd)).toSeq

  /** Free everything a dead round holds: executor blocks (local path)
    * and checkpoint files (reliable path).
    */
  private def freeRound(spark: org.apache.spark.sql.SparkSession,
                        persisted: Seq[RDD[_]], files: Seq[String]): Unit = {
    persisted.foreach(_.unpersist(blocking = false))
    files.foreach { f =>
      val path = new org.apache.hadoop.fs.Path(f)
      try path.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(path, true)
      catch { case scala.util.control.NonFatal(_) => () } // best-effort
    }
  }

  /** Component assignment for every node appearing in `pairs`:
    * (id, component) where component = smallest node id reachable.
    * Node ids must be non-null and are compared as longs.
    */
  def assign(pairs: DataFrame, srcCol: String, dstCol: String,
             maxIter: Int = 50,
             hotThreshold: Long = defaultHotThreshold,
             checkpoint: Option[CheckpointStrategy] = None): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // strategy: explicit argument, else the session conf
    // (spark.graft.cc.checkpointDir ⇒ reliable), else localCheckpoint
    val strategy = checkpoint.getOrElse(strategyFor(spark))

    var edges = truncate(pairs
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter($"u" =!= $"v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .distinct(), strategy)

    def checksum(e: DataFrame): (Long, Long) = {
      // XOR-fold is order-independent and cannot overflow under ANSI
      // mode (edges are distinct, so XOR is a faithful multiset hash)
      e.agg(count(lit(1)), coalesce(bit_xor(xxhash64($"u", $"v")), lit(0L)))
        .as[(Long, Long)].first()
    }

    var prev = checksum(edges)
    var iter = 0
    var converged = edges.isEmpty
    // each round's checkpoint holds resources (executor blocks for the
    // local strategy, FS files for the reliable one); once the NEXT
    // round is materialized, the previous round is dead — free it, or
    // an n-round run holds n copies of the edge set (a leak at 100 TB,
    // GC/disk pressure even at bench scale). We hold the prior round's
    // RDD handles / checkpoint files directly.
    var prevPersisted: Seq[RDD[_]] = persistedAncestors(edges.queryExecution.toRdd)
    var prevFiles: Seq[String] = checkpointFiles(edges.queryExecution.toRdd)
    while (!converged && iter < maxIter) {
      // the checksum already hands us the exact edge count: a key's
      // multiplicity is bounded by 2x the edge rows, so below the
      // threshold NO key can be hot and the half-rounds skip the
      // hot-key machinery (no broadcast job, no salt) outright
      val mayHaveHot = 2 * prev._1 >= hotThreshold
      edges = truncate(smallStar(largeStar(edges, hotThreshold, mayHaveHot),
        hotThreshold, mayHaveHot), strategy)
      val cur = checksum(edges)
      val curPersisted = persistedAncestors(edges.queryExecution.toRdd)
      val curFiles = checkpointFiles(edges.queryExecution.toRdd)
      freeRound(spark, prevPersisted, prevFiles)
      prevPersisted = curPersisted
      prevFiles = curFiles
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
               srcCol: String, dstCol: String,
               hotThreshold: Long = defaultHotThreshold,
               checkpoint: Option[CheckpointStrategy] = None): DataFrame = {
    val comp = assign(pairs, srcCol, dstCol, hotThreshold = hotThreshold,
        checkpoint = checkpoint)
      .withColumnRenamed("id", "__cc_id")
    docs.select(col(idCol).cast("long").as(idCol))
      .join(comp, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
      .withColumn("is_canonical", col(idCol) === col("cluster_id"))
  }
}
