package graft

import graft.functions.TextFunctions
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("repetition metrics on a degenerate all-repeats document") {
    // "a a a a a": every token identical -> top word/bigram share 1.0;
    // 3 trigram occurrences, 1 distinct -> dup fraction 2/3
    val r = graft.operators.Corpus.repetitionMetrics(one("a a a a a")).head()
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Double]("top_word_frac") === 1.0)
    assert(r.getAs[Double]("top_bigram_frac") === 1.0)
    assert(math.abs(r.getAs[Double]("dup_trigram_frac") - 2.0 / 3.0) < 1e-12)
  }

  test("repetition metrics on an all-distinct document are minimal") {
    val r = graft.operators.Corpus.repetitionMetrics(one("v w x y z")).head()
    assert(r.getAs[Double]("top_word_frac") === 0.2)
    assert(math.abs(r.getAs[Double]("top_bigram_frac") - 0.25) < 1e-12)
    assert(r.getAs[Double]("dup_trigram_frac") === 0.0)
  }

  test("langId predicts en on stopword-rich text, unknown otherwise") {
    val out = one("the cat sat on the mat in a hat")
      .select(TextFunctions.langId(col("text"))).head.getString(0)
    assert(out === "en")
    val out2 = one("lorem ipsum dolor sit amet")
      .select(TextFunctions.langId(col("text"))).head.getString(0)
    assert(out2 === "unknown")
  }

  test("token counts: whitespace, bpe-ish, subword estimate") {
    val df = one("hello world42 x!")
    val r = df.select(
      TextFunctions.tokenCount(col("text")),
      TextFunctions.bpeTokenCount(col("text")),
      TextFunctions.subwordEstimate(col("text"))).head
    assert(r.getInt(0) === 3)          // hello | world42 | x!
    assert(r.getInt(1) === 5)          // hello, world, 42, x, !
    assert(r.getLong(2) === 4L)        // ceil(16/4)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = one("Hello   World").select(TextFunctions.fingerprint(col("text"))).head.getString(0)
    val b = one("  hello world ").select(TextFunctions.fingerprint(col("text"))).head.getString(0)
    assert(a === b)
  }

  test("quality score stays in [0,1]") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val bad = docs.select(TextFunctions.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1).count()
    assert(bad === 0)
  }

  test("multimodal metadata and stub features are deterministic and shaped") {
    val docs = one("abcd" * 100) // 400 bytes
    val meta = Multimodal.metadata(docs).head
    assert(meta.getAs[Int]("byte_len") === 400)
    assert(meta.getAs[Long]("n_chunks") === 2L)
    val feats = Multimodal.features(spark, docs).collect()
    assert(feats.length === 1)
    assert(feats.head.features.length === 16)
    assert(math.abs(feats.head.features.sum - 1.0) < 1e-5) // L1-normalized
    val again = Multimodal.features(spark, docs).collect()
    assert(feats.head.features.toSeq === again.head.features.toSeq)
  }

  test("decode parses real BMP and PPM headers; unknown payloads fall back to raw") {
    import spark.implicits._
    // crafted BMP: 'BM' magic, width=2 / height=3 as little-endian int32s
    // at offsets 18/22 (BITMAPINFOHEADER), plus a 0xFF pixel byte
    val bmp = new Array[Byte](27)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 2; bmp(22) = 3
    bmp(26) = 0xff.toByte
    // crafted top-down BMP: height stored negative (two's complement)
    val bmpNeg = bmp.clone()
    bmpNeg(22) = 0xfd.toByte; bmpNeg(23) = 0xff.toByte
    bmpNeg(24) = 0xff.toByte; bmpNeg(25) = 0xff.toByte
    // crafted PPM: ASCII P6 header, 640x480
    val ppm = "P6\n640 480\n255\n".getBytes("UTF-8") ++ Array[Byte](1, 2, 3)
    val raw = "just some text payload".getBytes("UTF-8")
    val out = Multimodal.featuresBinary(spark,
      Seq((1L, bmp), (2L, ppm), (3L, raw), (4L, bmpNeg)).toDF("doc_id", "payload"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).format === "bmp")
    assert((out(1L).width, out(1L).height) === (2, 3))
    assert(out(2L).format === "ppm")
    assert((out(2L).width, out(2L).height) === (640, 480))
    assert(out(3L).format === "raw")
    assert((out(3L).width, out(3L).height) === (raw.length % 640, raw.length % 480))
    assert(out(4L).height === -3) // signed little-endian, as BMP stores top-down
    // histogram is over the real bytes: bin 15 counts the single 0xFF
    assert(out(1L).features(15) === 1f / 27f)
    assert(math.abs(out(2L).features.sum - 1.0) < 1e-5)
  }

  test("decode parses canonical WAV headers and PCM peak; non-canonical stays raw") {
    import spark.implicits._
    def wav(rate: Int, channels: Int, bits: Int, samples: Seq[Int]): Array[Byte] = {
      val data = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
      val b = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(channels.toShort).putInt(rate)
      b.putInt(rate * channels * bits / 8).putShort((channels * bits / 8).toShort)
      b.putShort(bits.toShort)
      b.put("data".getBytes("US-ASCII")).putInt(data.length)
      data.foreach(b.put)
      b.array()
    }
    val stereo = wav(44100, 2, 16, Seq(100, -32768, 5, 7))
    val silent = wav(8000, 1, 16, Seq.empty) // header only: peak must be 0
    val deep = wav(48000, 1, 24, Seq(1, 2)) // non-16-bit: no peak computed
    // RIFF magic but a non-canonical chunk layout must NOT mis-parse
    val nonCanonical = "RIFFxxxxWAVEJUNKdata".getBytes("US-ASCII") ++ new Array[Byte](24)
    val out = Multimodal.featuresBinary(spark,
      Seq((1L, stereo), (2L, silent), (3L, deep), (4L, nonCanonical))
        .toDF("doc_id", "payload"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).format === "wav")
    assert((out(1L).sample_rate, out(1L).n_channels, out(1L).bit_depth) === ((44100, 2, 16)))
    assert(out(1L).pcm_peak === 32768) // |−32768| dominates the window
    assert((out(1L).width, out(1L).height) === ((0, 0)))
    assert(out(2L).format === "wav" && out(2L).pcm_peak === 0)
    assert(out(3L).format === "wav" && out(3L).bit_depth === 24 && out(3L).pcm_peak === 0)
    assert(out(4L).format === "raw")
    // image branches carry zeroed audio fields
    val bmp = new Array[Byte](27); bmp(0) = 'B'; bmp(1) = 'M'
    val img = Multimodal.featuresBinary(spark, Seq((9L, bmp)).toDF("doc_id", "payload")).head()
    assert((img.sample_rate, img.n_channels, img.bit_depth, img.pcm_peak) === ((0, 0, 0, 0)))
  }

  test("perceptual aHash: brightness-shifted BMP matches its original through " +
    "the banded near-dup join; header bytes don't contaminate the hash") {
    import spark.implicits._
    import graft.functions.AHashImpl
    // BMP with ASCII-safe bytes (< 0x80) so the payload round-trips
    // through the string column the documents table carries
    def bmp(pixels: Array[Byte], headerTweak: Int = 0): Array[Byte] = {
      val b = new Array[Byte](54 + pixels.length)
      b(0) = 'B'; b(1) = 'M'
      b(10) = 54 // pixel-array offset field (le32 @10)
      b(18) = 8; b(22) = 8
      b(30) = headerTweak.toByte
      pixels.copyToArray(b, 54)
      b
    }
    val rnd = new scala.util.Random(7)
    val base = Array.fill[Byte](256)((40 + rnd.nextInt(60)).toByte) // 40..99
    val bright = base.map(v => (v + 5).toByte) // uniform brightness shift
    val other = Array.fill[Byte](256)((40 + rnd.nextInt(60)).toByte)
    // the integer cell-vs-global-mean compare is EXACTLY invariant under
    // a uniform shift: +d adds d*cnt_c*n to both sides
    assert(AHashImpl.ahash64(bmp(base)) === AHashImpl.ahash64(bmp(bright)))
    // ...while the bytes differ everywhere, so every cryptographic frame
    // fingerprint (C17's md5) changes — the gap this operator closes
    assert(!java.util.Arrays.equals(bmp(base), bmp(bright)))
    val docs = Seq(
      (1L, new String(bmp(base), "UTF-8")),
      (2L, new String(bmp(bright), "UTF-8")),
      (3L, new String(bmp(other), "UTF-8")),
      // same pixels as doc 1 but a different HEADER byte: the body
      // offset must keep the header out of the hash entirely
      (4L, new String(bmp(base, headerTweak = 99), "UTF-8")),
      (5L, "tiny")) // body under 64 bytes: not an image, excluded
      .toDF("doc_id", "text")
    assert(!Multimodal.aHashes(docs).collect().map(_.getLong(0)).contains(5L))
    val pairs = Multimodal.imageNearDup(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
    assert(pairs.toSeq === Seq((1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0)),
      s"expected the brightness pair + header-tweak clones, got ${pairs.mkString(",")}")
  }

  test("perceptual dHash: clamped contrast scale that aHash provably misses " +
    "is caught by the gradient hash through the banded near-dup join") {
    import spark.implicits._
    import graft.functions.{AHashImpl, DHashImpl}
    def bmp(pixels: Array[Byte]): Array[Byte] = {
      val b = new Array[Byte](54 + pixels.length)
      b(0) = 'B'; b(1) = 'M'; b(10) = 54
      pixels.copyToArray(b, 54)
      b
    }
    // Three constant regions over a 4160-byte body (64·65, so both the
    // 64-cell aHash and 65-cell dHash grids tile it): 16 aHash-cells of
    // dark (2), 16 of bright (68), 32 of mid (30). Global mean 32.5 sits
    // ABOVE the mid level, so every mid cell's aHash bit is 0.
    val base = (Array.fill(16 * 65)(2.toByte) ++ Array.fill(16 * 65)(68.toByte)
      ++ Array.fill(32 * 65)(30.toByte))
    // Clamped contrast scale v' = min(127, 3v): dark→6, mid→90, bright
    // SATURATES 204→127. The saturation eats the bright region's excess,
    // dragging the global mean (78.25) BELOW the scaled mid level (90):
    // all 32 mid cells flip 0→1 in aHash. Every ADJACENT-cell gradient
    // keeps its sign (regions stay ordered dark < mid < bright,
    // within-region diffs stay zero), so the dHash is bit-identical.
    val contrast = base.map(v => math.min(127, 3 * v).toByte)
    val aBase = AHashImpl.ahash64(bmp(base)).longValue()
    val aCon = AHashImpl.ahash64(bmp(contrast)).longValue()
    assert(java.lang.Long.bitCount(aBase ^ aCon) > 3,
      s"aHash must MISS this pair (got hamming ${java.lang.Long.bitCount(aBase ^ aCon)})")
    assert(DHashImpl.dhash64(bmp(base)) === DHashImpl.dhash64(bmp(contrast)))
    val docs = Seq(
      (1L, new String(bmp(base), "UTF-8")),
      (2L, new String(bmp(contrast), "UTF-8")),
      (3L, "tiny")) // body under 65 bytes: not an image, excluded
      .toDF("doc_id", "text")
    assert(!Multimodal.dHashes(docs).collect().map(_.getLong(0)).contains(3L))
    // non-vacuity both ways: the dHash join finds the pair, aHash's doesn't
    val dPairs = Multimodal.dHashNearDup(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
    assert(dPairs.toSeq === Seq((1L, 2L, 0)), s"got ${dPairs.mkString(",")}")
    assert(Multimodal.imageNearDup(docs).count() === 0L,
      "the aHash path must provably miss the contrast pair")
  }

  test("textEntropy: analytic entropies for uniform and degenerate alphabets") {
    val d = Seq((1L, "aaaa"), (2L, "ab"), (3L, "abcd")).toDF("doc_id", "text")
    val out = graft.operators.Corpus.textEntropy(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars_counted"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Double]("entropy_bits"))).toMap
    assert(out(1L)._1 === 4L && out(1L)._2 === 1L)
    assert(math.abs(out(1L)._3) < 1e-12, s"constant text must have 0 entropy: ${out(1L)}")
    assert(math.abs(out(2L)._3 - 1.0) < 1e-12, s"2 uniform symbols = 1 bit: ${out(2L)}")
    assert(math.abs(out(3L)._3 - 2.0) < 1e-12, s"4 uniform symbols = 2 bits: ${out(3L)}")
    // order-independence: same multiset, different order → identical bits
    val perm = graft.operators.Corpus.textEntropy(Seq((9L, "dcba")).toDF("doc_id", "text"))
      .head().getAs[Double]("entropy_bits")
    assert(perm === out(3L)._3)
  }
}
