package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Driver-side parquet metadata, read from file footers only.
  *
  * The 100 TB substitute for `df.count()` when a query needs a corpus
  * size to SIZE something (a shortlist, a sample rate): footers are
  * O(#files) metadata reads — the same numbers a table catalog (Delta,
  * Iceberg, HMS stats) would hand over for free — not a full-scan Spark
  * job. Used by `sim_pq_recall` to size the ADC shortlist without an
  * extra action over the corpus.
  */
object ParquetMeta {

  /** Exact row count of a parquet file or directory of part files,
    * summed from footer block metadata. No Spark job is launched.
    */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    def files(p: Path): Seq[Path] = {
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq(p)
      else fs.listStatus(p).toSeq
        .filterNot { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .flatMap(c => files(c.getPath))
    }
    files(root)
      .map { p =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try r.getRecordCount finally r.close()
      }.sum
  }
}
