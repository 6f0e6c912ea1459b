package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Multimodal plumbing: schema, batch shape, deterministic stub decode
  * (the real codec is environment-absent by design — see Multimodal
  * scaladoc).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf() = {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), Row(640, 480, null, null)),
      Row(2L, "audio", Array[Byte](10, 20, 30), Row(null, null, 44100, 2000L)),
      Row(3L, "image", null, Row(1920, 1080, null, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => r: Row)),
      Multimodal.mediaSchema)
  }

  test("feature extraction: fixed width, deterministic, null-safe") {
    val feats = Multimodal.extractFeatures(spark, mediaDf()).collect()
      .sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats.forall(_.features.length == 8))
    assert(feats(0).n_bytes == 8)
    assert(feats(0).features sameElements Multimodal.decodeStub("image",
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
    assert(feats(2).n_bytes == 0) // null payload handled
    // determinism: same bytes → same features
    assert(Multimodal.decodeStub("image", Array[Byte](9, 9)).toSeq ==
      Multimodal.decodeStub("image", Array[Byte](9, 9)).toSeq)
  }

  test("frame sampling yields every k-th chunk with ordinals") {
    val out = Multimodal.sampleFrames(spark, mediaDf(), every = 2, chunk = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    // media 1: 8 bytes → chunks 3,3,2 → frames 0,2 kept → sizes 3,2
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq == Seq((0L, 3L), (2L, 2L)))
    // media 2: 3 bytes → one chunk, frame 0
    assert(out.filter(_._1 == 2L).map(t => (t._2, t._3)).toSeq == Seq((0L, 3L)))
  }

  test("featuresQuery keeps empty-payload rows with a zero frame rollup") {
    // an empty payload yields NO sampled frames; the catalog query must
    // left-join + coalesce so the row survives with (0, 0) — matching
    // the oracle, which always emits the row
    val dir = tmpDir("mm-empty").toString
    Seq((1L, ""), (2L, "hello world")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.featuresQuery(spark, dir)
      .select("media_id", "n_bytes", "n_frames", "frames_bytes")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(1L, 2L), "empty-payload row dropped")
    assert(out(1L) == ((0L, 0L, 0L)))
    assert(out(2L)._2 > 0)
  }

  test("scaled metadata clamps the long side") {
    val out = Multimodal.withScaledMeta(mediaDf(), maxSide = 320)
      .select("media_id", "scaled_width", "scaled_height")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).sortBy(_._1)
    assert(out(0) == ((1L, 320, 240)))
    assert(out(2) == ((3L, 320, 180)))
  }
}
