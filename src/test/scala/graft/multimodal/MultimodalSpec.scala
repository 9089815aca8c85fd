package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "some fake image payload bytes"),
    (2L, "a much longer fake video payload with many more bytes in it"),
    (3L, "")
  ).toDF("id", "payload_str").withColumn("payload", col("payload_str").cast("binary"))

  test("decodeMeta: stable schema + deterministic stub decode") {
    val meta = Multimodal.decodeMeta(docs, "id", "payload")
    assert(meta.schema.fieldNames.toSeq ==
      Seq("id", "n_bytes", "width", "height", "n_frames", "format"))
    val rows = meta.collect().map(m => m.id -> m).toMap
    assert(rows(1L).n_bytes == 29)
    assert(rows(3L).n_bytes == 0)
    // deterministic: same input → same meta on re-run
    assert(Multimodal.decodeMeta(docs, "id", "payload").collect().toSet == meta.collect().toSet)
  }

  test("extractFeatures: fixed-dim L1-normalized feature vectors") {
    val feats = Multimodal.extractFeatures(docs, "id", "payload", dim = 16).collect()
    assert(feats.forall(_.feature.length == 16))
    val f1 = feats.find(_.id == 1L).get
    assert(math.abs(f1.feature.sum - 1f) < 1e-5)
    val f3 = feats.find(_.id == 3L).get
    assert(f3.feature.sum == 0f) // empty payload → zero vector, no NaN
  }

  test("frameSamplePlan: explodes frame indices with stride") {
    val meta = Multimodal.decodeMeta(docs, "id", "payload")
    val plan = Multimodal.frameSamplePlan(meta, stride = 2)
    val byId = plan.groupBy("id").count().as[(Long, Long)].collect().toMap
    val metaById = meta.collect().map(m => m.id -> m.n_frames).toMap
    metaById.foreach { case (id, nf) =>
      assert(byId(id) == (nf + 1) / 2, s"id=$id frames=$nf")
    }
  }
}
