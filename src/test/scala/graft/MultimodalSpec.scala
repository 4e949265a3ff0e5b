package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs = Tables(spark, TestSpark.sfDir).documents

  test("binary + typed metadata schema is what downstream codecs expect") {
    implicit val s = spark
    val rec = Multimodal.records(docs)
    val schema = rec.schema.map(f => (f.name, f.dataType.typeName)).toMap
    assert(schema("content") == "binary")
    assert(schema("format") == "string")
    assert(schema("width") == "integer" && schema("height") == "integer")
    assert(rec.count() == docs.count())
  }

  test("batched decode emits deterministic stub features, one row per record") {
    implicit val s = spark
    val rec = Multimodal.records(docs.limit(100))
    val feats = Multimodal.decodeFeatures(rec, batchSize = 16).collect()
    assert(feats.length == 100)
    feats.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.sum - 1.0) < 1e-9) // L1 normalized
    }
    // determinism: same input → identical features
    val again = Multimodal.decodeFeatures(rec, batchSize = 7).collect()
    assert(feats.sortBy(_.doc_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.doc_id).map(_.features.toSeq).toSeq)
  }

  test("frame sampling explodes every 30th frame for video rows only") {
    implicit val s = spark
    val out = Multimodal.frameSample(Multimodal.records(docs)).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (docId, frames) =>
      assert(docId % 4 == 2) // only mp4 rows
      val idxs = frames.map(_.getInt(2)).sorted
      assert(idxs.head == 0 && idxs.forall(_ % 30 == 0))
    }
  }

  test("resize metadata fits the box aspect-preserving with integer math") {
    implicit val s = spark
    import spark.implicits._
    // doc_id 704 → width 128, height 272: TALL image, width must
    // shrink proportionally (128*256 div 272 = 120), not pass through
    val tall = Seq((704L, "x" * 20, "en", "src0", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.resizeMeta(Multimodal.records(docs union tall),
      maxDim = 256).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    out.foreach { case (_, (w, h, ow, oh)) =>
      assert(ow <= 256 && oh <= 256)
      if (math.max(w, h) <= 256) assert(ow == w && oh == h) // pass-through
      else {
        assert(math.max(ow, oh) == 256) // longest side hits the box
        assert(ow == w * 256 / math.max(w, h) && oh == h * 256 / math.max(w, h))
      }
    }
    assert(out(704L) == (128, 272, 120, 256))
  }
}
