package graft.media

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class MediaOpsSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("assets: 16-byte binary payloads with modality tags") {
    val a = MediaOps.assets(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.forall(_.payload.length == 16))
    assert(a.map(_.modality).toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("batch decode is deterministic and bounded") {
    val f1 = MediaOps.mediaFeatures(spark, sfDir).orderBy("doc_id").collect()
    val f2 = MediaOps.mediaFeatures(spark, sfDir).orderBy("doc_id").collect()
    assert(f1.toSeq == f2.toSeq)
    f1.foreach { r =>
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 256)
      assert(r.getAs[Int]("n_frames") >= 1 && r.getAs[Int]("n_frames") <= 8)
      assert(r.getAs[Int]("n_sampled") >= 1 &&
        r.getAs[Int]("n_sampled") <= 4)
    }
  }

  test("frame sampling = ceil(frames / step) with step = ceil(frames/4)") {
    import spark.implicits._
    val assets = Seq(MediaAsset(1L, "video",
      Array.fill[Byte](16)(0x42))).toDS()
    val f = MediaOps.extractFeatures(assets).head()
    val expectStep = math.max(1, math.ceil(f.n_frames / 4.0).toInt)
    assert(f.sample_frames == (0 until f.n_frames by expectStep).toSeq)
  }

  test("frameSamples: one row per sampled frame, binary slice, resize fits 64-box") {
    val frames = MediaOps.frameSamples(spark, sfDir)
    val feats = MediaOps.mediaFeatures(spark, sfDir)
    // row count = sum of per-asset sampled-frame counts
    val expected = feats.agg(org.apache.spark.sql.functions.sum("n_sampled"))
      .head().getLong(0)
    assert(frames.count() == expected)
    frames.collect().foreach { r =>
      assert(r.getAs[String]("frame_hex").length == 8) // 4 bytes → 8 hex
      val (w, h) = (r.getAs[Int]("resized_w"), r.getAs[Int]("resized_h"))
      assert(w >= 1 && w <= 64 && h >= 1 && h <= 64)
      assert(w == 64 || h == 64) // aspect-fit: long edge pinned to 64
    }
  }
}
