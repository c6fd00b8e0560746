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
      def lumaGrid(p: Array[Byte], m: MediaMeta, w: Int, h: Int): Array[Int] =
        Array.tabulate(w * h)(i => i % 7)
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

  // --- ImageIoCodec: the real JDK decoder against hand-computed pixels ---

  private def png(pixels: Array[Array[Int]]): Array[Byte] = {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    val h = pixels.length; val w = pixels(0).length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val Black = 0x000000; private val White = 0xffffff
  private val Red = 0xff0000; private val Blue = 0x0000ff

  test("ImageIoCodec.decode: real PNG, hand-computed luminance stats") {
    // Luminance (299R+587G+114B)/1000: black 0, white 255, red 76, blue 29.
    val payload = png(Array(Array(Black, White), Array(Red, Blue)))
    val meta = Multimodal.MediaMeta("image", "image/png", 2, 2)
    val (hist, mean, emb) = Multimodal.ImageIoCodec.decode(payload, meta)
    assert(mean == (0 + 255 + 76 + 29) / 4.0)
    // Bins lum*16/256: 0→0, 255→15, 76→4, 29→1.
    assert(hist(0) == 1L && hist(15) == 1L && hist(4) == 1L && hist(1) == 1L)
    assert(hist.sum == 4L)
    // 2×4 pooling grid on a 2×2 image: x=0→cell col 0, x=1→col 2.
    assert(emb(0) == 0f / 255f)          // black
    assert(emb(2) == 1f)                 // white (255/255)
    assert(emb(4) == (76.0 / 255.0).toFloat)  // red
    assert(emb(6) == (29.0 / 255.0).toFloat)  // blue
    assert(emb(1) == 0f && emb(3) == 0f && emb(5) == 0f && emb(7) == 0f)
  }

  test("ImageIoCodec flows through featurize unchanged (real PNG payloads)") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.MediaRecord(1L,
        Multimodal.MediaMeta("image", "image/png", 2, 2),
        png(Array(Array(White, White), Array(White, White)))),
      Multimodal.MediaRecord(2L,
        Multimodal.MediaMeta("image", "image/png", 2, 1),
        png(Array(Array(Black, Black)))))
    val out = Multimodal.extractFeatures(recs.toDS(), Multimodal.ImageIoCodec)
      .collect().sortBy(_.doc_id)
    assert(out(0).mean_byte == 255.0 && out(0).histogram(15) == 4L)
    assert(out(1).mean_byte == 0.0 && out(1).histogram(0) == 2L)
  }

  test("ImageIoCodec.resize: nearest-neighbor, PNG round-trip, pixel-exact") {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    // 4×4 quadrant image → 2×2: each output pixel samples one quadrant.
    val q = Array(
      Array(Black, Black, White, White),
      Array(Black, Black, White, White),
      Array(Red, Red, Blue, Blue),
      Array(Red, Red, Blue, Blue))
    val meta = Multimodal.MediaMeta("image", "image/png", 4, 4)
    val resized = Multimodal.ImageIoCodec.resize(png(q), meta, 2, 2)
    val img = ImageIO.read(new ByteArrayInputStream(resized))
    assert(img.getWidth == 2 && img.getHeight == 2)
    val rgb = (x: Int, y: Int) => img.getRGB(x, y) & 0xffffff
    assert(rgb(0, 0) == Black && rgb(1, 0) == White)
    assert(rgb(0, 1) == Red && rgb(1, 1) == Blue)
  }

  test("ImageIoCodec.sampleFrames: decoded luminance rows, evenly spaced") {
    val payload = png(Array(
      Array(Black, Black), Array(White, White),
      Array(Red, Red), Array(Blue, Blue)))
    val meta = Multimodal.MediaMeta("image", "image/png", 2, 4)
    val frames = Multimodal.ImageIoCodec.sampleFrames(payload, meta, 2).toSeq
    assert(frames.map(f => (f._1, f._2)) == Seq((0, 0), (1, 2)))
    assert(frames(0)._3.toSeq == Seq[Byte](0, 0))
    assert(frames(1)._3.toSeq == Seq[Byte](76, 76))
  }

  test("ImageIoCodec rejects an undecodable payload loudly") {
    val meta = Multimodal.MediaMeta("image", "image/png", 1, 1)
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode(Array[Byte](1, 2, 3), meta)
    }
  }

  // --- WavCodec: the real JDK WAV/PCM decoder against known samples ---

  private def wav(samples: Array[Int], channels: Int = 1,
                  rate: Float = 8000f): Array[Byte] = {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, channels, channels * 2, rate, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      samples.length.toLong / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val wavMeta = Multimodal.MediaMeta("audio", "audio/wav", 2, 1)

  test("WavCodec.decode: square wave, hand-computed amplitude stats") {
    // 8 samples: +16384 ×4 then −16384 ×4.
    val payload = wav(Array.fill(4)(16384) ++ Array.fill(4)(-16384))
    val (hist, mean, emb) = Multimodal.WavCodec.decode(payload, wavMeta)
    assert(mean == 0.5)                       // |16384| / 32768
    // Bins (s+32768)*16/65536: +16384 → 12, −16384 → 4.
    assert(hist(12) == 4L && hist(4) == 4L && hist.sum == 8L)
    // Every eighth-window holds one sample of magnitude 16384 → RMS 0.5.
    assert(emb.length == 8)
    assert(emb.forall(_ == 0.5f))
  }

  test("WavCodec downmixes stereo to mono by channel average") {
    // One stereo frame: L=100, R=200 → mono 150.
    val payload = wav(Array(100, 200), channels = 2)
    val (pcm, rate) = Multimodal.WavCodec.readPcm(payload, wavMeta)
    assert(pcm.toSeq == Seq(150) && rate == 8000f)
  }

  test("WavCodec.resize: linear resample, WAV round-trip, sample-exact") {
    val payload = wav(Array(0, 100, 200, 300))
    val resized = Multimodal.WavCodec.resize(payload, wavMeta, 7, 1)
    val (pcm, _) = Multimodal.WavCodec.readPcm(resized, wavMeta)
    assert(pcm.toSeq == Seq(0, 50, 100, 150, 200, 250, 300))
  }

  test("WavCodec.sampleFrames: evenly-spaced PCM windows of meta.width samples") {
    val payload = wav(Array(1, 2, 3, 4, 5, 6, 7, 8))
    // meta.width = 2 → 4 windows; n=2 → windows 0 and 2.
    val frames = Multimodal.WavCodec.sampleFrames(payload, wavMeta, 2).toSeq
    assert(frames.map(f => (f._1, f._2)) == Seq((0, 0), (1, 2)))
    def le(b: Array[Byte]) = b.grouped(2).map(p =>
      ((p(0) & 0xff) | (p(1) << 8)).toShort.toInt).toSeq
    assert(le(frames(0)._3) == Seq(1, 2))
    assert(le(frames(1)._3) == Seq(5, 6))
  }

  test("WavCodec flows through featurize on the shared seam") {
    import spark.implicits._
    val rec = Multimodal.MediaRecord(9L, wavMeta,
      wav(Array.fill(8)(16384)))
    val out = Multimodal.extractFeatures(Seq(rec).toDS(), Multimodal.WavCodec)
      .collect().head
    assert(out.mean_byte == 0.5 && out.histogram(12) == 8L)
  }

  test("WavCodec rejects an undecodable payload loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode(Array[Byte](1, 2, 3, 4), wavMeta)
    }
  }

  // --- Perceptual dedup (r11): dHash + lumaGrid + mediaNearDup ---

  test("dHashChunks: hand-computed bits — ascending, flat and single-gradient grids") {
    // Strictly ascending grid: every right neighbor wins → all 64 bits.
    val asc = Array.tabulate(72)(identity)
    assert(Multimodal.dHashChunks(asc).toSeq == Seq(0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF))
    // Flat grid: strict > never fires → all zero.
    assert(Multimodal.dHashChunks(Array.fill(72)(5)).toSeq == Seq(0, 0, 0, 0))
    // One gradient at (row 0, x 0): only bit 0 → k0 = 1.
    val one = Array.fill(72)(0); one(1) = 9
    // grid[1] > grid[0] sets bit 0; grid[2] > grid[1] is 0 > 9 → unset.
    assert(Multimodal.dHashChunks(one).toSeq == Seq(1, 0, 0, 0))
    intercept[IllegalArgumentException](Multimodal.dHashChunks(Array.fill(64)(0)))
  }

  test("StubCodec.lumaGrid is the resizeStub byte grid, unsigned") {
    val meta = Multimodal.MediaMeta("image", "fake/raw", 4, 4)
    val payload = Array.tabulate(16)(i => (i * 17 - 128).toByte)
    val g = Multimodal.StubCodec.lumaGrid(payload, meta, 2, 2)
    val expected = Multimodal.resizeStub(payload, meta, 2, 2).map(_ & 0xff)
    assert(g.toSeq == expected.toSeq)
    assert(g.forall(v => v >= 0 && v <= 255))
  }

  test("ImageIoCodec.lumaGrid + dHash: hand-computed on a 2x2 PNG") {
    // Luminance: black 0, white 255, red 76, blue 29. 9×8 grid samples
    // srcY = y·2/8 (rows 0–3 → 0, 4–7 → 1), srcX = x·2/9 (x 0–4 → 0,
    // 5–8 → 1): top rows [0×5, 255×4], bottom rows [76×5, 29×4].
    val payload = png(Array(Array(Black, White), Array(Red, Blue)))
    val meta = Multimodal.MediaMeta("image", "image/png", 2, 2)
    val g = Multimodal.ImageIoCodec.lumaGrid(payload, meta, 9, 8)
    assert(g.length == 72)
    assert(g.slice(0, 9).toSeq == Seq(0, 0, 0, 0, 0, 255, 255, 255, 255))
    assert(g.slice(63, 72).toSeq == Seq(76, 76, 76, 76, 76, 29, 29, 29, 29))
    // dHash: rows 0–3 fire only at x=4 (255 > 0) → bits 4, 12, 20, 28;
    // rows 4–7: 29 > 76 false everywhere → k2 = k3 = 0.
    val ks = Multimodal.dHashChunks(g)
    assert(ks.toSeq == Seq((1 << 4) | (1 << 12), (1 << 4) | (1 << 12), 0, 0))
  }

  test("WavCodec.lumaGrid: amplitude grid over evenly-spaced mono samples") {
    // 8 samples alternating -32768 / +32512 → grid values 0 / 255
    // ((32512 + 32768) / 256 = 255).
    val payload = wav(Array.tabulate(8)(i => if (i % 2 == 0) -32768 else 32512))
    val g = Multimodal.WavCodec.lumaGrid(payload, wavMeta, 4, 2)
    // 8 positions over 8 samples: identity sampling.
    assert(g.toSeq == Seq(0, 255, 0, 255, 0, 255, 0, 255))
  }

  test("mediaNearDup: twins pair at hamming 0; banding equals brute force at <= 3") {
    import spark.implicits._
    val textA = ("the quick brown fox jumps over the lazy dog " * 6).trim
    val docs = Seq(
      (1L, textA),
      (2L, textA),                              // exact twin → hamming 0
      (3L, "Z" + textA.substring(1)),           // leading-byte perturbation
      (4L, ("entirely different content words here with other bytes " * 5).trim))
      .toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    val pairs = Multimodal.mediaNearDup(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)), pairs.toString)
    assert(pairs.forall(_._3 <= 3))
    // Pigeonhole proof on the fixture: the banded set equals the
    // brute-force all-pairs set at maxHamming 3.
    val sigs = Multimodal.perceptualSig(media).collect()
      .map(s => s.doc_id -> Seq(s.k0, s.k1, s.k2, s.k3)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = (sigs(a) zip sigs(b)).map { case (x, y) =>
        Integer.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (a, b, h)).toSet
    assert(pairs == brute, s"banded $pairs vs brute $brute")
    // The cluster resolution composes on the pairs (the #50d row):
    // exact twins 1 and 2 share cluster 1; canonical = min member id.
    val cl = graft.operators.Components.dedupClusters(
      Multimodal.mediaNearDup(media)
        .select(org.apache.spark.sql.functions.col("id1"),
          org.apache.spark.sql.functions.col("id2")), "id1", "id2")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(3))).toMap
    assert(cl(1L) == ((1L, 1)) && cl(2L)._1 == 1L && cl(2L)._2 == 0, cl.toString)
    assert(cl.forall { case (id, (cid, canon)) => (canon == 1) == (id == cid) })
    // The real image codec rides the same seam: two identical PNGs
    // pair at hamming 0, and near-identical (one-pixel) variants stay
    // within reach while a different image does not pair at 0.
    val imgA = png(Array(Array(Black, White), Array(Red, Blue)))
    val imgB = png(Array(Array(White, Black), Array(Blue, Red)))
    val recs = Seq(
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("image", "image/png", 2, 2), imgA),
      Multimodal.MediaRecord(2L, Multimodal.MediaMeta("image", "image/png", 2, 2), imgA),
      Multimodal.MediaRecord(3L, Multimodal.MediaMeta("image", "image/png", 2, 2), imgB))
    val ip = Multimodal.mediaNearDup(Seq(recs: _*).toDS(), Multimodal.ImageIoCodec)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ip.contains((1L, 2L, 0)), ip.toString)
    assert(!ip.contains((1L, 3L, 0)) && !ip.contains((2L, 3L, 0)))
  }

  test("mediaNearDupWide: 128-bit banding equals brute force at hamming <= 7") {
    import spark.implicits._
    val textA = ("the quick brown fox jumps over the lazy dog " * 6).trim
    val docs = Seq(
      (1L, textA),
      (2L, textA),                      // exact twin → 0
      (3L, "Z" + textA.substring(1)),   // perturbed
      (4L, ("entirely different content words here with other bytes " * 5).trim),
      (5L, "a" * 120), (6L, "b" * 240)) // flat payloads → all-zero sigs → 0
      .toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    val pairs = Multimodal.mediaNearDupWide(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)) && pairs.contains((5L, 6L, 0)), pairs.toString)
    assert(pairs.forall(_._3 <= 7))
    // brute force over the wide signatures — pigeonhole at 8 chunks
    val sigs = docs.collect().map { r =>
      val text = r.getString(1)
      val meta = Multimodal.MediaMeta("image", "fake/raw",
        text.length % 64 + 1, text.length / 64 + 1)
      r.getLong(0) -> Multimodal.dHashChunksN(
        Multimodal.StubCodec.lumaGrid(text.getBytes("UTF-8"), meta,
          Multimodal.DHashW, Multimodal.DHashWideH), Multimodal.DHashWideH).toSeq
    }.toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = (sigs(a) zip sigs(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if h <= 7
    } yield (a, b, h)).toSet
    assert(pairs == brute, s"banded $pairs vs brute $brute")
    // wide is a superset of the 64-bit operator's reach on this data:
    // every narrow pair's doc pair appears wide (the radius only grows
    // in bits, but 128-bit distance of a 64-bit-near pair stays small
    // for stacked grids: rows interleave, gradients persist)
    intercept[IllegalArgumentException](
      Multimodal.dHashChunksN(Array.fill(72)(0), 7))
  }

  test("withMediaSeen: stateless gate row-equal to mediaIncrementalNew; runs under readStream") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val textA = ("the quick brown fox jumps over the lazy dog " * 6).trim
    val textB = ("entirely different content words with other letters " * 6).trim
    val docs = Seq(
      (1L, textA), (2L, textB),                       // seen
      (11L, textA),                                   // twin of 1
      (12L, textB.replace("content", "payload")),     // perturbed B
      (13L, "a" * 130))                               // flat, unrelated
      .toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    val batch = Multimodal.mediaIncrementalNew(media, col("doc_id") < 10L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val seen = Multimodal.mediaSeenArtifact(media.filter(col("doc_id") < 10L))
    val newSide = media.filter(col("doc_id") >= 10L)
    val gate = Multimodal.withMediaSeen(newSide, seen)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // row-for-row equality with the oracle-checked batch operator —
    // the #49g transitive-oracle discipline
    assert(gate == batch, s"gate $gate\nvs batch $batch")
    // the identical operator runs under Structured Streaming in append
    // mode (stateless projection: no join, no aggregation, no state)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sink = "media_gate_sink"
    spark.catalog.dropTempView(sink)
    val input = MemoryStream[Multimodal.MediaRecord]
    val q = Multimodal.withMediaSeen(input.toDS(), seen)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try { input.addData(newSide.collect().toIndexedSeq); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table(sink).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch, s"streamed $streamed\nvs batch $batch")
    // artifact budget raises loudly past the stated bound
    intercept[IllegalArgumentException](
      Multimodal.withMediaSeen(newSide,
        Array.fill(Multimodal.MaxSeenSigs + 1)(Array(0, 0, 0, 0))))
  }

  test("mediaKeepBest keeps the largest payload per cluster (tie -> lowest id)") {
    import spark.implicits._
    // Gradient-free (constant-byte) payloads share the all-zero dHash
    // regardless of length — the documented flat-image blind spot,
    // used here to build a cluster whose members DIFFER in size.
    val textA = ("the quick brown fox jumps over the lazy dog " * 6).trim
    val docs = Seq(
      (1L, textA),
      (2L, textA),        // byte-identical twin: tie → keep 1
      (5L, "a" * 100),
      (6L, "a" * 200),    // largest constant payload → the keeper
      (7L, "b" * 50))
      .toDF("doc_id", "text")
    val out = Multimodal.mediaKeepBest(Multimodal.asMedia(docs))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getInt(5))).toMap
    // cluster {1,2}: equal bytes, keep min id = 1
    assert(out(1L)._3 == 1L && out(1L)._4 == 1)
    assert(out(2L)._3 == 1L && out(2L)._4 == 0)
    // cluster {5,6,7}: all-zero signatures cluster together; 6 is
    // biggest (200 bytes) and wins despite not being the lowest id
    assert(Set(5L, 6L, 7L).map(out(_)._1).size == 1, out.toString)
    assert(out(6L)._4 == 1 && out(5L)._4 == 0 && out(7L)._4 == 0)
    assert(out(5L)._3 == 6L && out(7L)._3 == 6L)
  }

  test("mediaIncrementalNew: new-vs-seen only, exact twins flagged, bucket guard raises") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val textA = ("the quick brown fox jumps over the lazy dog " * 6).trim
    val textB = ("entirely different content words with other letters " * 6).trim
    val docs = Seq(
      (1L, textA), (2L, textB),          // seen corpus
      (11L, textA),                      // new: exact twin of 1
      (12L, textB.replace("content", "payload"))) // new: perturbed B
      .toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    val out = Multimodal.mediaIncrementalNew(media, col("doc_id") < 10L)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)), r.getLong(4))).toMap
    // only NEW rows come back; the twin matches at distance 0
    assert(out.keySet == Set(11L, 12L), out.toString)
    assert(out(11L)._1 == 1 && out(11L)._3.contains(0) && out(11L)._4 >= 1L)
    // is_dup and is_new are complements; unmatched rows carry null/0
    out.values.foreach { case (dup, nw, best, n) =>
      assert(dup + nw == 1)
      assert((dup == 1) == best.isDefined)
      assert((dup == 1) == (n > 0))
    }
    // never pairs seen x seen or new x new: a seen twin of doc 1 must
    // not surface anywhere in the output
    val withSeenTwin = Seq((1L, textA), (3L, textA), (11L, textB))
      .toDF("doc_id", "text")
    val o2 = Multimodal.mediaIncrementalNew(
      Multimodal.asMedia(withSeenTwin), col("doc_id") < 10L)
      .collect().map(_.getLong(0)).toSet
    assert(o2 == Set(11L))
    // degenerate-bucket guard: three constant seen payloads share the
    // all-zero signature; a constant NEW payload probes that bucket
    // and a maxSeenBucket of 2 raises loudly. An UNPROBED hot bucket
    // costs nothing and passes — the guard bounds actual expansion.
    val hot = Seq((1L, "a" * 80), (2L, "b" * 90), (3L, "c" * 70),
      (11L, "d" * 60)).toDF("doc_id", "text")
    intercept[Exception] {
      Multimodal.mediaIncrementalNew(Multimodal.asMedia(hot),
        col("doc_id") < 10L, maxSeenBucket = 2).collect()
    }
    // same hot bucket, never probed (the new doc has gradients): passes
    val cold = Seq((1L, "a" * 80), (2L, "b" * 90), (3L, "c" * 70),
      (11L, textA)).toDF("doc_id", "text")
    assert(Multimodal.mediaIncrementalNew(Multimodal.asMedia(cold),
      col("doc_id") < 10L, maxSeenBucket = 2).count() == 1L)
  }
}
