package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaFromDocuments(
    spark, Tables(spark, sf0001).documents)

  test("media schema: opaque binary + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
  }

  test("decodeFeatures: deterministic, fixed dim, repartitioned for decode") {
    val f1 = Multimodal.decodeFeatures(media, dim = 16, parallelism = Some(8))
    assert(f1.rdd.getNumPartitions === 8)
    val rows = f1.orderBy("media_id").collect()
    assert(rows.forall(_.features.length === 16))
    assert(rows.forall(_.decode_ok))
    val rows2 = Multimodal.decodeFeatures(media, dim = 16, parallelism = Some(8))
      .orderBy("media_id").collect()
    assert(rows.map(_.features.toSeq).toSeq === rows2.map(_.features.toSeq).toSeq)
  }

  test("sampleFrames explodes one row per frame with increasing offsets") {
    val frames = Multimodal.sampleFrames(media.limit(5), everyMs = 500)
    val byId = frames.collect().groupBy(_.media_id)
    byId.values.foreach { fs =>
      val idx = fs.map(_.frame_idx).sorted
      assert(idx.toSeq === (0 until fs.length))
      assert(fs.forall(f => f.offset_ms === f.frame_idx * 500L))
    }
  }

  test("feature profile query is deterministic across runs") {
    val a = Multimodal.featureProfile(spark, sf0001).collect().map(_.toSeq).toSeq
    val b = Multimodal.featureProfile(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
