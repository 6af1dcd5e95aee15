package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media() = {
    val docs = Seq(
      (1L, "aaaa", "en", "s1", 4L),
      (2L, "zzzzzzzz", "en", "s1", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Multimodal.mediaFromDocuments(docs)
  }

  test("media table: opaque binary payload + typed metadata survive") {
    val m = media()
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.orderBy("media_id").head
    assert(new String(row.getAs[Array[Byte]]("payload")) == "aaaa")
    assert(row.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("lang") == "en")
  }

  test("feature extraction: deterministic stub histogram, one row per item") {
    val f = Multimodal.extractFeatures(media(), dims = 4)
      .orderBy("media_id").collect()
    assert(f.length == 2)
    val h1 = f(0).getAs[scala.collection.Seq[Float]]("features")
    assert(h1.sum == 1.0f) // normalized histogram
    assert(f(0).getAs[Int]("n_bytes") == 4)
    // 'a' = 97 → bucket (97*4)/256 = 1
    assert(h1(1) == 1.0f)
  }

  test("frame sampling and resize plumbing") {
    val frames = Multimodal.sampleFrames(media(), frameBytes = 2, stride = 2)
      .filter(col("media_id") === 2L).orderBy("frame_no").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2)) // 4 chunks, stride 2
    val resized = Multimodal.resizePayload(media(), targetBytes = 6)
      .orderBy("media_id").collect()
    assert(resized.forall(_.getAs[Array[Byte]]("payload").length == 6))
  }
}
