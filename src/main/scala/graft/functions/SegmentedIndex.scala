package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lucene-style segment + tombstone machinery shared by every persisted
  * index in the engine (BM25 postings, IVF cells, PQ codes, the dedup
  * band/winnow/digest indexes).
  *
  * Layout: `$path/segments/NNNNN/<subtable>` parquet trees, NNNNN a
  * zero-padded ascending segment number. Each segment carries its delta
  * rows per subtable plus a `tombstones` table of REPLACED ids: a row of
  * segment i is dead iff a LATER segment re-ingested (or retracted) its
  * id. Readers list only `\d{5}` names, so an in-flight `__tmp_*` write
  * is invisible until its atomic rename; a crashed writer's orphan tmp
  * tree is ignored by readers and swept before the next write.
  *
  * Scale contract: a refresh writes |delta|-sized files and never
  * rewrites existing segments; the tombstone mask is an id-keyed
  * anti-join whose right side is replacement-sized; compaction folds
  * live rows back to one segment and swaps the tree in two renames.
  * Single-writer per index path (see [[commitSegment]]); readers are
  * unrestricted and always see a committed tree.
  */
object SegmentedIndex {

  def hfs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  def segName(n: Int): String = f"$n%05d"

  /** Committed (segNumber, absoluteDir) pairs under `$path/segments`,
    * ascending. `__tmp_*` trees never match the `\d{5}` filter.
    */
  def segmentDirs(spark: SparkSession, path: String): Seq[(Int, String)] = {
    val (fs, root) = hfs(spark, s"$path/segments")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("\\d{5}"))
      .map(s => (s.getPath.getName.toInt, s.getPath.toString))
      .sortBy(_._1)
  }

  def exists(spark: SparkSession, path: String): Boolean =
    segmentDirs(spark, path).nonEmpty

  /** Delete orphan `__tmp_*` trees left by a crashed writer. Safe under
    * the single-writer contract: no live writer owns a tmp dir when a
    * new write starts.
    */
  def sweepOrphanTmp(fs: FileSystem, segRoot: Path): Unit =
    if (fs.exists(segRoot))
      fs.listStatus(segRoot).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("__tmp_"))
        .foreach(s => fs.delete(s.getPath, true))

  /** Write segment `n`: `write(tmpDir)` materializes every subtable
    * under `$root/__tmp_NNNNN`, then one rename commits it. The
    * exists-guard turns the corruption mode of a concurrent-writer race
    * (rename onto an existing directory nests the source inside it and
    * returns true on local/HDFS filesystems) into a loud failure —
    * writers are single-writer per index path by contract.
    */
  def commitSegment(spark: SparkSession, root: String, n: Int)
                   (write: String => Unit): Unit = {
    val tmp = s"$root/__tmp_${segName(n)}"
    val (fs, tmpP) = hfs(spark, tmp)
    sweepOrphanTmp(fs, tmpP.getParent)
    write(tmp)
    val dest = new Path(s"$root/${segName(n)}")
    if (fs.exists(dest))
      throw new IllegalStateException(
        s"segment $dest already exists — concurrent writer on $root? " +
          "(single-writer contract)")
    if (!fs.rename(tmpP, dest))
      throw new IllegalStateException(s"segment commit failed: $tmp -> $dest")
  }

  /** Union one subtable across segments with dead versions masked: a
    * row from segment i is dead iff a LATER segment tombstoned its id.
    * When parquet footer row counts (no job) show zero tombstones
    * anywhere, the mask is skipped and this is a plain union of
    * segment scans. Every masked subtable must carry an `id` column.
    */
  def liveRows(spark: SparkSession, path: String, sub: String): DataFrame = {
    val segs = segmentDirs(spark, path)
    require(segs.nonEmpty, s"no segmented index at $path")
    val all = segs.map { case (i, d) =>
      spark.read.parquet(s"$d/$sub").withColumn("__seg", lit(i)) }
      .reduce(_ unionByName _)
    val tombSegs = segs.filter { case (_, d) =>
      graft.sources.ParquetMeta.rowCount(spark, s"$d/tombstones") > 0 }
    if (tombSegs.isEmpty) all.drop("__seg")
    else {
      val tombs = tombSegs.map { case (i, d) =>
        spark.read.parquet(s"$d/tombstones")
          .select(col("id").as("__tid"), lit(i).as("__tseg")) }
        .reduce(_ unionByName _)
      all.join(tombs,
          all("id") === col("__tid") && col("__tseg") > col("__seg"),
          "left_anti")
        .drop("__seg")
    }
  }

  /** RETRACT ids from a segmented index: append a tombstone-only
    * segment (empty delta subtables, schemas cloned from the newest
    * segment) whose tombstones are `ids ∩ live` — the GDPR-style purge
    * path shared by the IVF/PQ/band/winnow/digest indexes. Retracting
    * an id that is not live is a no-op. O(|ids| + live-id semi-join);
    * no data segment is rewritten. `subs` lists the delta subtables of
    * this index (everything except `tombstones`).
    */
  def retract(spark: SparkSession, path: String, ids: DataFrame,
              subs: Seq[String]): Unit = {
    val segs = segmentDirs(spark, path)
    require(segs.nonEmpty, s"no segmented index at $path")
    val n = segs.map(_._1).max + 1
    val live = liveRows(spark, path, subs.head).select("id").distinct()
    val dead = live.join(ids.select(col(ids.columns.head).as("id")),
      Seq("id"), "left_semi")
    commitSegment(spark, s"$path/segments", n) { tmp =>
      subs.foreach { sub =>
        spark.read.parquet(s"${segs.last._2}/$sub").limit(0)
          .write.mode("overwrite").parquet(s"$tmp/$sub")
      }
      dead.write.mode("overwrite").parquet(s"$tmp/tombstones")
    }
  }
}
