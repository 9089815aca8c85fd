package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout: pruning + pushdown visible in the scan") {
    val dir = tmpDir("layout")
    val df = (1L to 3000L).map { i =>
      (i, s"t${i % 3}", i * 10L, s"payload$i")
    }.toDF("id", "kind", "ts", "payload")
    Layout.writePartitioned(df, dir, Seq("kind"), Seq("ts"))

    // one directory per kind, files sorted by ts inside
    val kinds = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("kind=")).sorted
    assert(kinds.toSeq == Seq("kind=t0", "kind=t1", "kind=t2"))

    val back = Layout.read(spark, dir)
      .filter(col("kind") === "t1" && col("ts") > 20000L)
    // correctness first
    assert(back.count() == df.filter(col("kind") === "t1" && col("ts") > 20000L).count())

    // the scan must prune partitions (kind filter never reaches data)
    // and push the ts range down to parquet
    val scanDesc = back.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PartitionFilters: [isnotnull(kind"),
      s"no partition filter in:\n$scanDesc")
    assert(scanDesc.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,20000)"),
      s"no pushed ts filter in:\n$scanDesc")
    // kind is a partition column — not part of the data read schema
    assert(scanDesc.contains("ReadSchema: struct<id:bigint,ts:bigint,payload:string>"))
  }

  test("filesPerPartition subdivides skewed partition values") {
    val dir = tmpDir("layout-skew")
    val df = (1L to 2000L).map(i => (i, "hot", i)).toDF("id", "kind", "ts")
    // at this toy size AQE rightly coalesces the bucketed shuffle back
    // to one partition; disable coalescing to observe the subdivision
    // a genuinely hot partition value would get
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      Layout.writePartitioned(df, dir, Seq("kind"), Seq("ts"), filesPerPartition = 4)
    } finally spark.conf.set(key, prior)
    val files = new java.io.File(s"$dir/kind=hot").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files >= 2, s"expected multiple files for the hot partition, got $files")
    assert(Layout.read(spark, dir).count() == 2000L)
  }

  test("zorderKey2 matches a scalar Morton reference") {
    def morton(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((x & 0xFFFFL) >> i) & 1L) << (2 * i) | (((y & 0xFFFFL) >> i) & 1L) << (2 * i + 1)
      z
    }
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (-3L, 7L), (70000L, 2L))
    val got = rows.toDF("x", "y")
      .select(Layout.zorderKey2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) => morton(x, y) })
    // interleave property: z-order of (x,y) and (x,y+1) differ only in y bits
    assert(morton(5, 2) != morton(2, 5), "key must not be symmetric in x/y")
  }

  test("z-ordered layout: 2-D range predicate skips row groups on both axes") {
    val dir = tmpDir("layout-z") + "/t"
    // 256×256 grid — a 2-D range over it touches a small tile
    val df = (0 until 256).flatMap(x => (0 until 256).map(y =>
      (x.toLong * 1000 + y, x.toLong, y.toLong))).toDF("id", "x", "y")
    Layout.writeZOrdered(df, dir, "x", "y", nFiles = 16)

    val q = Layout.read(spark, dir)
      .filter(col("x").between(10, 20) && col("y").between(200, 210))
    // execute THIS queryExecution so its scan metrics populate
    assert(graft.tools.PlanMetrics.runAndCount(q) == 11L * 11L)

    // with Z-clustering the 11×11 tile intersects few files; a scan
    // must read well under the full 65536 rows after row-group/file
    // min-max skipping on BOTH x and y
    val scanned = graft.tools.PlanMetrics.scanOutputRows(q)
    assert(scanned < 65536L / 4,
      s"scan read $scanned rows — Z-layout should skip most row groups")

    // contrast on the axis a single-column sort CANNOT help: filter on
    // y alone. The x-sorted layout has y spread uniformly through every
    // row group (no skipping possible); the Z-layout clusters y, so
    // whole files fall outside the y range
    val flatDir = tmpDir("layout-flat") + "/t"
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(flatDir)
    val yOnly = col("y").between(200, 210)
    val zy = Layout.read(spark, dir).filter(yOnly)
    val fy = spark.read.parquet(flatDir).filter(yOnly)
    assert(graft.tools.PlanMetrics.runAndCount(zy) == 256L * 11L)
    assert(graft.tools.PlanMetrics.runAndCount(fy) == 256L * 11L)
    val scannedZ = graft.tools.PlanMetrics.scanOutputRows(zy)
    val scannedFlat = graft.tools.PlanMetrics.scanOutputRows(fy)
    assert(scannedZ < scannedFlat,
      s"z-order ($scannedZ rows) should scan less than x-sort ($scannedFlat) on a y-only range")
  }

  test("optimizeZOrdered: small unsorted files → few z-clustered files, contents identical") {
    val dir = tmpDir("layout-zopt") + "/t"
    val df = (0 until 128).flatMap(x => (0 until 128).map(y =>
      (x.toLong * 1000 + y, x.toLong, y.toLong))).toDF("id", "x", "y")
    df.orderBy(rand(7)).repartition(30).write.parquet(dir) // messy layout
    def files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 30)

    val n = Layout.optimizeZOrdered(spark, dir, "x", "y", targetBytes = 24L * 1024)
    assert(files == n && n < 30, s"expected few compacted files, got $n")
    val back = spark.read.parquet(dir)
    assert(back.count() == 128L * 128L)

    // clustering took effect: a 2-D tile reads a fraction of the rows
    val q = back.filter(col("x").between(5, 12) && col("y").between(100, 108))
    assert(graft.tools.PlanMetrics.runAndCount(q) == 8L * 9L)
    val scanned = graft.tools.PlanMetrics.scanOutputRows(q)
    assert(scanned < 128L * 128L / 2,
      s"scan read $scanned of ${128 * 128} rows — z-optimize should cluster")
  }

  test("bloom-filter layout: point lookup skips row groups min/max cannot prune") {
    val dir = tmpDir("layout-bloom") + "/t"
    // high-cardinality ids scattered so every row group spans the full
    // range — min/max stats are useless for equality predicates here
    val n = 200000
    val df = (0 until n).map { i =>
      val id = (i.toLong * 2654435761L) % 1000003L // scatter
      (id, s"payload$i")
    }.toDF("uid", "payload")
    // small row groups so there are several to skip
    df.repartition(1).write
      .option("parquet.block.size", (256 * 1024).toString)
      .option("parquet.bloom.filter.enabled#uid", "true")
      .option("parquet.bloom.filter.expected.ndv#uid", "200000")
      .mode("overwrite").parquet(dir)

    val probe = spark.read.parquet(dir).filter(col("uid") === 2654435761L % 1000003L)
    assert(graft.tools.PlanMetrics.runAndCount(probe) >= 1L)
    val scanned = graft.tools.PlanMetrics.scanOutputRows(probe)

    // control: same layout without blooms reads everything (min/max
    // can't prune scattered ids)
    val dir2 = tmpDir("layout-nobloom") + "/t"
    df.repartition(1).write
      .option("parquet.block.size", (256 * 1024).toString)
      .mode("overwrite").parquet(dir2)
    val probe2 = spark.read.parquet(dir2).filter(col("uid") === 2654435761L % 1000003L)
    assert(graft.tools.PlanMetrics.runAndCount(probe2) >= 1L)
    val scannedControl = graft.tools.PlanMetrics.scanOutputRows(probe2)

    assert(scanned < scannedControl,
      s"bloom scan read $scanned rows vs control $scannedControl — blooms should skip row groups")

    // the Layout API round-trips (default row-group size: one group —
    // the skipping mechanism itself is proven above)
    val dir3 = tmpDir("layout-bloom-api") + "/t"
    Layout.writeWithBloom(df, dir3, Seq("uid"), expectedDistinct = 200000L)
    assert(spark.read.parquet(dir3).count() == n.toLong)
  }

  test("compact: many small files rewritten to the target count, contents identical") {
    val dir = tmpDir("layout-compact") + "/t"
    val df = (1L to 5000L).map(i => (i, s"p$i")).toDF("id", "payload")
    df.repartition(40).write.parquet(dir) // 40 deliberately tiny files
    def parts = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts == 40)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    val n = Layout.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(n == 1 && parts == 1, s"expected 1 compacted file, got $parts")
    val after = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(after == before)
  }

  test("parquet footer row count matches a real count, no Spark job launched") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val dir = tmpDir("pqmeta") + "/t"
    val df = (1L to 4321L).map(i => (i, s"p$i")).toDF("id", "payload")
    df.repartition(7).write.parquet(dir)
    assert(spark.read.parquet(dir).count() == 4321L)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    val n =
      try {
        val n0 = ParquetMeta.rowCount(spark, dir)
        Thread.sleep(300) // listener bus is async
        n0
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(n == 4321L)
    assert(jobs.get() == 0, s"footer read launched ${jobs.get()} Spark jobs")

    // single-file form too (the harness tables are single parquet files)
    val one = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(ParquetMeta.rowCount(spark, one.getAbsolutePath) > 0L)
  }

  test("swap rollback: failed second rename restores the original directory") {
    val base = tmpDir("layout-swap")
    val dir = base + "/t"
    (1L to 100L).map(i => (i, i * 2)).toDF("x", "y")
      .write.parquet(dir)
    // sabotage: compact writes its temp dir, then we yank it away before
    // the second rename by pre-deleting via a filesystem race — instead,
    // simulate directly: call the swap with a tmp path that doesn't exist
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val missingTmp = new org.apache.hadoop.fs.Path(base + "/missing_tmp")
    val bak = new org.apache.hadoop.fs.Path(base + "/t__bak")
    val ex = intercept[IllegalStateException] {
      Layout.swapDirs(fs, new org.apache.hadoop.fs.Path(dir), missingTmp, bak, "test")
    }
    assert(ex.getMessage.contains("original restored"))
    // the table is back at its path with its contents intact
    assert(spark.read.parquet(dir).count() == 100L)
    assert(!fs.exists(bak))
  }

  test("schema diff: added/removed/type/nullability changes reported") {
    import graft.operators.SchemaDiff
    val old = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val next = old.select(col("id").cast("int").as("id"), col("name"),
      lit("x").as("tag"))
    val changes = SchemaDiff.diff(old, next)
    assert(changes.contains(SchemaDiff.Change("tag", "added", None, Some("string"))))
    assert(changes.contains(SchemaDiff.Change("score", "removed", Some("double"), None)))
    assert(changes.exists(c => c.column == "id" && c.kind == "type_changed" &&
      c.before.contains("bigint") && c.after.contains("int")))
    assert(SchemaDiff.diff(old, old).isEmpty)
  }
}
