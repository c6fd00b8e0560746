package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("decodeStub: hand-computed histogram, mean and embedding shape") {
    val (hist, mean, emb) = Multimodal.decodeStub("abc".getBytes("UTF-8"))
    // 'a'=97 'b'=98 'c'=99 all land in bin 97*16/256 = 6.
    assert(hist(6) == 3L && hist.sum == 3L)
    assert(mean == 98.0)
    assert(emb.length == 8)
    assert(emb.forall(x => x > -1f && x < 1f))
    // Deterministic: same payload, same features.
    val (h2, m2, e2) = Multimodal.decodeStub("abc".getBytes("UTF-8"))
    assert(h2.sameElements(hist) && m2 == mean && e2.sameElements(emb))
  }

  test("codec seam: a custom MediaCodec flows through every operator unchanged") {
    import spark.implicits._
    import Multimodal.{MediaCodec, MediaMeta, MediaRecord}
    // A trivial real-codec stand-in: constant embedding, constant-byte
    // resize, single whole-payload frame — shapes only a plugged codec
    // would produce, proving the operators call the seam, not the stub.
    object FixedCodec extends MediaCodec {
      def decode(p: Array[Byte], m: MediaMeta): (Array[Long], Double, Array[Float]) =
        (Array.fill(Multimodal.HistogramBins)(7L), 42.0, Array.fill(4)(0.5f))
      def resize(p: Array[Byte], m: MediaMeta, w: Int, h: Int): Array[Byte] =
        Array.fill(w * h)(9.toByte)
      def sampleFrames(p: Array[Byte], m: MediaMeta, n: Int): Iterator[(Int, Int, Array[Byte])] =
        Iterator((0, 0, p))
    }
    val rec = MediaRecord(1L, MediaMeta("image", "fake/raw", 4, 2),
      Array.tabulate(8)(_.toByte))
    val f = Multimodal.extractFeatures(Seq(rec).toDS(), FixedCodec).collect().head
    assert(f.mean_byte == 42.0 && f.embedding.length == 4 && f.histogram.forall(_ == 7L))
    val rz = Multimodal.resize(Seq(rec).toDS(), 3, 3, FixedCodec).collect().head
    assert(rz.payload.length == 9 && rz.payload.forall(_ == 9.toByte))
    val fr = Multimodal.frameSample(Seq(rec).toDS(), 5, FixedCodec).collect()
    assert(fr.length == 1 && fr.head.payload.length == 8)
  }

  test("media plumbing: schema, payload round-trip, partition-batched features") {
    val media = Multimodal.asMedia(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val features = Multimodal.extractFeatures(media).collect()
    assert(features.length == 500)
    features.foreach { f =>
      assert(f.histogram.length == Multimodal.HistogramBins)
      assert(f.histogram.sum == f.n_bytes, "histogram must cover every byte")
      assert(f.embedding.length == 8)
      assert(f.kind == "image")
    }
    // Feature values tie back to the document text deterministically.
    val doc0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("doc_id = 0").head.getAs[String]("text")
    val f0 = features.find(_.doc_id == 0L).get
    assert(f0.n_bytes == doc0.getBytes("UTF-8").length)
    val (h0, m0, e0) = Multimodal.decodeStub(doc0.getBytes("UTF-8"))
    assert(f0.histogram.sameElements(h0) && f0.mean_byte == m0 &&
      f0.embedding.sameElements(e0))
  }

  test("resize: nearest-neighbor grid subsample, meta rewritten, deterministic") {
    import spark.implicits._
    import Multimodal.{MediaMeta, MediaRecord}
    // 4×4 grid of bytes 0..15 → 2×2 picks rows {0,2} × cols {0,2}.
    val grid = Array.tabulate(16)(_.toByte)
    val rec = MediaRecord(1L, MediaMeta("image", "fake/raw", 4, 4), grid)
    val out = Multimodal.resize(Seq(rec).toDS(), 2, 2).collect().head
    assert(out.meta.width == 2 && out.meta.height == 2)
    assert(out.payload.toSeq == Seq[Byte](0, 2, 8, 10))
    // Upscale repeats source pixels, never reads out of bounds.
    val up = Multimodal.resize(Seq(rec).toDS(), 8, 8).collect().head
    assert(up.payload.length == 64)
    assert(up.payload.toSet.subsetOf(grid.toSet))
  }

  test("frame sample: evenly-spaced rows, bounded fan-out, width-sized payloads") {
    import spark.implicits._
    import Multimodal.{MediaMeta, MediaRecord}
    // "Video": 6 frames of 3 bytes each.
    val payload = Array.tabulate(18)(_.toByte)
    val rec = MediaRecord(7L, MediaMeta("video", "fake/raw", 3, 6), payload)
    val frames = Multimodal.frameSample(Seq(rec).toDS(), 3).collect()
      .sortBy(_.frame_idx)
    assert(frames.length == 3)
    assert(frames.map(_.src_row).toSeq == Seq(0, 2, 4))
    assert(frames.forall(f => f.payload.length == 3 && f.meta.height == 1))
    assert(frames(1).payload.toSeq == Seq[Byte](6, 7, 8))
    // n beyond the frame count: every frame once, none invented.
    assert(Multimodal.frameSample(Seq(rec).toDS(), 100).collect().length == 6)
  }
}
