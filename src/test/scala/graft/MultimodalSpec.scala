package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Real-codec path (q35d): the PNG encode/decode round trip must reproduce
  * the generator's arithmetic exactly — PNG is lossless, so any drift means
  * the decode (not the fixture) is broken. */
class MultimodalSpec extends SparkSpec {

  test("encodePng produces a real PNG that ImageIO decodes to the exact gradient") {
    for (id <- Seq(0L, 1L, 123L, 499L, 100003L)) {
      val bytes = Multimodal.encodePng(id)
      // PNG magic — this is a genuine image container, not a fake payload
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = ((id % 48 + 8).toInt, ((id * 7) % 40 + 8).toInt)
      assert(img.getWidth == w && img.getHeight == h, s"dims for doc $id")
      // every pixel, not just corners: lossless decode reproduces the gradient
      for (y <- 0 until h; x <- 0 until w) {
        val g = ((x * 31 + y * 17 + id) % 256).toInt
        assert((img.getRGB(x, y) & 0xffffff) == ((g << 16) | (g << 8) | g),
          s"pixel ($x,$y) of doc $id")
      }
    }
  }

  test("encodeWav produces a real WAV that AudioSystem decodes to the exact PCM stream") {
    for (id <- Seq(0L, 1L, 123L, 499L)) {
      val bytes = Multimodal.encodeWav(id)
      // RIFF/WAVE magic — a genuine audio container from the JDK writer
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
      assert(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val n = (id % 500 + 100).toInt
      assert(ais.getFrameLength == n, s"frame count for doc $id")
      assert(ais.getFormat.getSampleRate == 8000f && ais.getFormat.getChannels == 1)
      val pcm = ais.readAllBytes()
      // every sample: PCM is lossless, decode must reproduce the generator
      for (j <- 0 until n) {
        val got = ((pcm(2 * j) & 0xff) | (pcm(2 * j + 1) << 8)).toShort.toLong
        assert(got == (id * 131 + j.toLong * 97) % 65536 - 32768,
          s"sample $j of doc $id")
      }
      ais.close()
    }
  }

  test("encodeGif stores every frame losslessly; decodeGifFrames reads them all") {
    for (id <- Seq(0L, 3L, 123L, 499L)) {
      val bytes = Multimodal.encodeGif(id)
      // GIF magic — a genuine animation container
      assert(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis)
      val (w, h, nf) = ((id % 48 + 8).toInt, ((id * 7) % 40 + 8).toInt, (id % 5 + 2).toInt)
      assert(reader.getNumImages(true) == nf, s"frame count for doc $id")
      for (f <- 0 until nf) {
        val img = reader.read(f)
        assert(img.getWidth == w && img.getHeight == h, s"dims for doc $id frame $f")
        // every pixel of every frame: the palette encode is lossless
        for (y <- 0 until h; x <- 0 until w) {
          val g = ((x * 31 + y * 17 + id + f * 11) % 256).toInt
          assert((img.getRGB(x, y) & 0xffffff) == ((g << 16) | (g << 8) | g),
            s"pixel ($x,$y) of doc $id frame $f")
        }
      }
      iis.close()
    }
  }

  test("decodeGifFrames samples every 2nd frame distributively at sf0.001") {
    val out = Multimodal.decodeGifFrames(Multimodal.gifTable(spark, sf), 2).collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.doc_id)
    byDoc.foreach { case (id, frames) =>
      val nf = (id % 5 + 2).toInt
      assert(frames.map(_.frame_id).sorted.toSeq == (0 until nf by 2).toSeq,
        s"sampled frame ids for doc $id")
      frames.foreach { fr =>
        assert(fr.width == (id % 48 + 8).toInt && fr.height == ((id * 7) % 40 + 8).toInt)
        assert(fr.px00 == ((id + fr.frame_id * 11) % 256) * 65793L, s"doc $id frame ${fr.frame_id}")
      }
    }
  }

  test("probeHeaders reads dims + frame count from real GIF headers at sf0.001") {
    val out = Multimodal.probeHeaders(Multimodal.gifTable(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { p =>
      assert(p.width == (p.doc_id % 48 + 8).toInt, s"doc ${p.doc_id} width")
      assert(p.height == ((p.doc_id * 7) % 40 + 8).toInt, s"doc ${p.doc_id} height")
      assert(p.n_frames == (p.doc_id % 5 + 2).toInt, s"doc ${p.doc_id} frames")
      // the probe carries the container size for downstream batch sizing;
      // a GIF header + palette + frames is never smaller than the 13-byte
      // logical screen descriptor block
      assert(p.n_bytes > 13)
    }
  }

  test("decodeGifFrames under limit(1) disposes the reader via task completion") {
    // Early-terminating consumer: only one row is taken, so the output
    // iterator is never drained — the TaskCompletionListener, not an
    // iterator epilogue, must release the reader. The assertion here is
    // behavioral (no hang/leak-crash and correct first row); the listener
    // registration is exercised by construction.
    val one = Multimodal.decodeGifFrames(Multimodal.gifTable(spark, sf), 2).limit(1).collect()
    assert(one.length == 1)
    val fr = one.head
    assert(fr.width == (fr.doc_id % 48 + 8).toInt)
  }

  test("q90 dHash near-dup: pair validity, subquadratic volume, known plants") {
    val out = SparkEntry.queries("q90_image_neardup")(spark, sf).collect()
    val n = Tables.table(spark, sf, "documents").count()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not canonically ordered")
      assert(r.getLong(2) <= 6, "pair beyond the hamming threshold")
    }
    // Banding admits ~1.5% of all pairs as candidates; hamming-confirmed
    // pairs are far fewer still — the subquadratic economics that make the
    // operator usable at corpus scale.
    assert(out.length.toLong < n * (n - 1) / 100,
      s"${out.length} pairs is not subquadratic for n=$n")
    // doc_ids ≡ (mod 240) share dimensions and differ by a constant
    // brightness offset — representatives of that planted family must be
    // found (the dHash gradient signs survive the offset away from wraps).
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 240L)) && pairs.contains((1L, 241L)),
      "planted same-dimension near-dups missing")
  }

  test("dhashImages matches the generator arithmetic on decoded pixels") {
    // Independent of the oracle: recompute the 56-bit dHash from the
    // encodePng formula for a few docs and compare against the
    // decoded-raster hash — pins the exact grid geometry (9×7, integer
    // division) that the q90 oracle states in SQL.
    val got = Multimodal.dhashImages(Multimodal.pngTable(spark, sf))
      .filter(col("doc_id") < 8).collect().map(h => h.doc_id -> h.dhash).toMap
    (0L until 8L).foreach { id =>
      val w = (id % 48 + 8).toInt; val h = ((id * 7) % 40 + 8).toInt
      def p(x: Int, y: Int) = ((x * 31 + y * 17 + id) % 256).toInt
      var want = 0L
      for (j <- 0 until 7; i <- 0 until 8) {
        val yj = j * (h - 1) / 6
        if (p((i + 1) * (w - 1) / 8, yj) > p(i * (w - 1) / 8, yj))
          want |= 1L << (j * 8 + i)
      }
      assert(got(id) == want, s"doc $id dhash ${got(id)} != $want")
    }
  }

  test("decodeImages extracts decoded features distributively at sf0.001") {
    val out = Multimodal.decodeImages(Multimodal.pngTable(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { f =>
      assert(f.width == (f.doc_id % 48 + 8).toInt, s"doc ${f.doc_id} width")
      assert(f.height == ((f.doc_id * 7) % 40 + 8).toInt, s"doc ${f.doc_id} height")
      assert(f.n_bands == 3)
      assert(f.px00 == (f.doc_id % 256) * 65793L)
    }
  }

  test("encodeMp4 box layouts parse back exactly: versions, largesize, track mix") {
    // id 10: mvhd/tkhd version 0, largesize mdat (10%5==0), 2 tracks, mp4a
    // id 11: version 1 (64-bit duration fields), 3 tracks, opus audio
    // id 12: version 0, 1 track (no audio → None), av01 video
    for (id <- Seq(0L, 10L, 11L, 12L, 123L, 499L, 100003L)) {
      val bytes = Multimodal.encodeMp4(id)
      // a real ISO-BMFF file leads with an ftyp box
      assert(bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p')
      val p = Multimodal.parseMp4(id, bytes)
      val ts = (600 * (id % 4 + 1)).toInt
      assert(p.brand == Seq("isom", "mp41", "mp42")((id % 3).toInt))
      assert(p.timescale == ts)
      assert(p.duration_ms == (id % 90000 + ts) * 1000 / ts)
      assert(p.n_tracks == (id % 3 + 1).toInt)
      assert(p.video_codec == Seq("avc1", "hvc1", "av01")((id % 3).toInt))
      val wantAudio =
        if (id % 3 + 1 >= 2) Some(if (id % 2 == 0) "mp4a" else "opus") else None
      assert(p.audio_codec == wantAudio, s"doc $id audio")
      assert(p.width == (id % 640 + 160).toInt && p.height == ((id * 7) % 480 + 120).toInt)
    }
  }

  test("parseMp4 rejects truncated and size-corrupted containers cleanly") {
    val good = Multimodal.encodeMp4(7L)
    // truncated mid-moov: the box walk must fail the bounds check, not
    // wander off the end of the array
    intercept[Exception] {
      Multimodal.parseMp4(7L, java.util.Arrays.copyOf(good, good.length / 2))
    }
    // corrupt the top-level moov size field (byte after ftyp+free) to
    // overrun the buffer
    val bad = good.clone()
    val moovOff = {
      def u32(o: Int) = ((bad(o) & 0xff) << 24) | ((bad(o + 1) & 0xff) << 16) |
        ((bad(o + 2) & 0xff) << 8) | (bad(o + 3) & 0xff)
      var o = 0
      while (!(bad(o + 4) == 'm' && bad(o + 5) == 'o' && bad(o + 6) == 'o' && bad(o + 7) == 'v'))
        o += u32(o)
      o
    }
    bad(moovOff) = 0x7f.toByte // absurd 2 GB box size
    intercept[Exception] { Multimodal.parseMp4(7L, bad) }
  }

  test("probeMp4 probes the container distributively at sf0.001") {
    val out = Multimodal.probeMp4(Multimodal.mp4Table(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { p =>
      val ts = (600 * (p.doc_id % 4 + 1)).toInt
      assert(p.timescale == ts, s"doc ${p.doc_id} timescale")
      assert(p.duration_ms == (p.doc_id % 90000 + ts) * 1000 / ts)
      assert(p.n_tracks == (p.doc_id % 3 + 1).toInt)
      assert(p.width == (p.doc_id % 640 + 160).toInt)
    }
  }

  test("q158: real JPEG decode tracks the pre-encode raster within the codec bound") {
    val out = SparkEntry.queries("q158_jpeg_decode")(spark, sf).collect()
    assert(out.nonEmpty)
    var anyLoss = false
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 24 + 8).toInt, s"doc $id width")
      assert(r.getInt(2) == ((id * 5) % 24 + 8).toInt, s"doc $id height")
      val maxErr = r.getLong(4)
      val meanMilli = r.getLong(5)
      // the property this class declares: per-image MEAN codec error under
      // the bound (per-pixel max is unboundable for lossy JPEG on noise)
      assert(meanMilli <= Multimodal.JpegMeanErrMilli,
        s"doc $id mean err $meanMilli m‰ exceeds ${Multimodal.JpegMeanErrMilli}")
      assert(r.getBoolean(6), s"doc $id within_bound is false")
      if (maxErr > 0) anyLoss = true
    }
    // lossy codec on noise rasters: at least one image must show real
    // error, or the "decode" isn't decoding the encoded bytes at all
    assert(anyLoss, "zero error across a lossy codec corpus is implausible")
  }
}
