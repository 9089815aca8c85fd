package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
object TextSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = (0 until 10).map(i => d0.withColumn("doc_id", col("doc_id")+i*1000000L)).reduce(_ unionByName _).persist()
    val n = docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0=System.nanoTime(); val r=f
      println(f"TEXTSMOKE $name%-16s n=$n out=$r ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    time("langid")(docs.select(T.langId(col("text")).as("l")).filter(col("l").isNotNull).count())
    time("quality")(docs.select(T.qualityScore(col("text")).as("q")).filter(col("q")>=0).count())
    time("fingerprint")(docs.select(T.fingerprint(col("text")).as("f")).filter(length(col("f"))===32).count())
    time("bpe_tokens")(docs.select(T.bpeishTokenCount(col("text")).as("n")).agg(sum("n")).count())
    spark.stop()
  }
}
