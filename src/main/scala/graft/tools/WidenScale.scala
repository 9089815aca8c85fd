// Scaling probe for the Fan.widen technique (r12 verdict item 5):
// time ONE quadratic path — the brute kNN-graph scoring pass — on a
// mult×-scaled corpus with the widen pin ON vs OFF, at the core count
// given by SPARK_GRAFT_CPUS. Run it at 8 and at 32 cores and the
// on/off ratio demonstrates (or refutes) that widen converts the
// single-split straggler into core-scaling work. Not part of any gate;
// numbers land in SCALING.md.
//
//   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.WidenScale /root/testdata/sf0.1 10"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

object WidenScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_smoke_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val emb = (0 until mult)
      .map(i => emb0.withColumn("vec_id", col("vec_id") + i * 10000000L))
      .reduce(_ unionByName _)
    // materialize the scaled corpus to parquet so BOTH arms read the
    // same byte-small scan shape the engine sees (stats from footers,
    // not an in-memory union), then drop the staging frame
    val staged = s"${sys.props("java.io.tmpdir")}/graft_widen_scale_${mult}x"
    emb.write.mode("overwrite").parquet(staged)
    val corpus = spark.read.parquet(staged)
    val n = corpus.count()

    def once(widenOff: Boolean): Double = {
      spark.conf.set("graft.fan.widen.off", widenOff.toString)
      val t0 = System.nanoTime()
      V.knnGraph(corpus, "vec_id", "embedding", k = 3)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup on the widened plan (same codegen either way), min-of-2 on
    // the on-arm; the off-arm runs ONCE — at mult×10 it is a 100×-pairs
    // single-split scoring pass whose runtime is compute-bound and
    // stable, and a second several-hundred-second sample buys nothing
    once(widenOff = false)
    val on = Seq(once(widenOff = false), once(widenOff = false)).min
    val off = once(widenOff = true)
    spark.conf.set("graft.fan.widen.off", "false")
    println(f"WIDENSCALE cpus=$cpus%s mult=$mult%d n=$n%d widen_on=$on%.2f s widen_off=$off%.2f s off/on=${off / on}%.2f")
    spark.stop()
  }
}
