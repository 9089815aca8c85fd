package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def assignOf(pairs: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.assign(pairs.toSeq.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain, clique and separate components all label to the min id") {
    // chain 1-2-3-4 plus clique {10,11,12} plus isolated pair {20,21}
    val got = assignOf((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges (worst case for naive propagation)") {
    val path = (0L until 63L).map(i => (i, i + 1))
    val got = assignOf(path: _*)
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("matches a driver-side union-find on a pseudorandom graph") {
    // deterministic LCG edges over 200 nodes
    var s = 12345L
    def next(mod: Long): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s % mod }
    val edges = (1 to 150).map(_ => (next(200), next(200))).filter(e => e._1 != e._2)

    val parent = Array.tabulate(200)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n.toInt).toLong).toMap

    assert(assignOf(edges: _*) == expected)
  }

  test("clusters: singletons keep their own id, canonical flag marks minima") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.clusters(docs, "doc_id", pairs, "id_a", "id_b")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true), (3L, 3L, true),
      (4L, 2L, false), (5L, 2L, false)))
  }

  test("reliable-checkpoint strategy: identical labels, rounds written and pruned on disk") {
    val edges = ((0L until 40L).map(i => (i, i + 1)) ++ Seq((100L, 101L), (101L, 102L)))
      .toDF("a", "b")
    val local = ConnectedComponents.assign(edges, "a", "b",
      checkpoint = Some(ConnectedComponents.LocalCheckpoint))
      .as[(Long, Long)].collect().toMap

    // explicit strategy argument
    val dir = tmpDir("cc-ckpt")
    val reliable = ConnectedComponents.assign(edges, "a", "b",
      checkpoint = Some(ConnectedComponents.ReliableCheckpoint(dir)))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local)
    def rddDirs(root: String): Seq[java.io.File] =
      Option(new java.io.File(root).listFiles()).toSeq.flatten // sc uuid dirs
        .flatMap(d => Option(d.listFiles()).toSeq.flatten)     // rdd-N dirs
    // rounds were actually written to the reliable dir, and dead rounds
    // were pruned: a multi-round path graph must not hold one rdd-N dir
    // per round at the end (≤ 2: the converged round + its predecessor
    // freed lazily after the loop exits)
    val left = rddDirs(dir)
    assert(left.nonEmpty, "no reliable checkpoint was written")
    assert(left.size <= 2, s"dead checkpoint rounds not pruned: ${left.map(_.getName)}")

    // session-conf driven selection (spark.graft.cc.checkpointDir)
    val dir2 = tmpDir("cc-ckpt-conf")
    spark.conf.set(ConnectedComponents.checkpointDirConf, dir2)
    try {
      val viaConf = ConnectedComponents.assign(edges, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(viaConf == local)
      assert(rddDirs(dir2).nonEmpty, "conf-selected reliable dir unused")
    } finally spark.conf.unset(ConnectedComponents.checkpointDirConf)
  }

  test("empty pair set yields all-singleton clusters") {
    val docs = Seq(7L, 8L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = ConnectedComponents.clusters(docs, "doc_id", pairs, "id_a", "id_b")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((7L, 7L, true), (8L, 8L, true)))
  }
}
