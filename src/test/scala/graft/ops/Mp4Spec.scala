package graft.ops

import graft.SparkSpec

/** MP4 (ISO BMFF) container parsing: round-trips through both mvhd wire
  * versions, structural-corruption degradation, box-order independence,
  * 64-bit largesize boxes, and the Multimodal dispatch hookup. */
class Mp4Spec extends SparkSpec {

  private def meta(bytes: Array[Byte]) = Mp4.parse(7L, bytes)

  test("parse inverts synthesize for both mvhd versions") {
    for (v <- Seq(0, 1)) {
      val bytes = Mp4.synthesize(duration = 12345L, width = 640L,
        height = 480L, payload = "hello mp4".getBytes, version = v)
      val m = meta(bytes).get
      assert(m.timescale == 600L)
      assert(m.duration == 12345L)
      assert(m.duration_ms == 12345L * 1000L / 600L)
      assert(m.width == 640L && m.height == 480L)
      assert(m.n_top_boxes == 3L)
      assert(m.mdat_bytes == 9L)
    }
  }

  test("corrupt and truncated bytes degrade to None, never throw") {
    val good = Mp4.synthesize(600L, 320L, 240L, "x".getBytes)
    assert(meta(Array.empty[Byte]).isEmpty)
    assert(meta("not an mp4 at all".getBytes).isEmpty)
    // truncation anywhere before the end of moov must be a clean None
    // (a cut exactly at the ftyp/moov boundary walks but lacks moov); a
    // cut at the moov/mdat boundary is legitimately parseable metadata
    val headLen = good.length - (8 + 1) // minus the 1-byte-payload mdat
    for (cut <- 1 until headLen)
      assert(meta(good.take(cut)).isEmpty, s"cut=$cut")
    assert(meta(good.take(headLen)).get.mdat_bytes == 0L)
    for (cut <- headLen + 1 until good.length)
      assert(meta(good.take(cut)).isEmpty, s"cut=$cut")
    // a box whose declared size overruns the file
    val bad = good.clone(); bad(0) = 0x7f.toByte
    assert(meta(bad).isEmpty)
    // flipping moov's type makes the container metadata-less
    val noMoov = good.clone()
    val moovAt = {
      var i = -1
      for (o <- 0 until good.length - 4)
        if (i < 0 && new String(good, o, 4, "US-ASCII") == "moov") i = o
      i
    }
    noMoov(moovAt) = 'x'.toByte
    assert(meta(noMoov).isEmpty)
  }

  test("box order does not matter: mdat before moov parses identically") {
    val std = Mp4.synthesize(900L, 352L, 288L, "abc".getBytes)
    // re-order: locate top-level boxes and emit ftyp, mdat, moov
    def boxAt(b: Array[Byte], off: Int): (String, Array[Byte]) = {
      val size = ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
      (new String(b, off + 4, 4, "US-ASCII"), b.slice(off, off + size.toInt))
    }
    var off = 0
    var boxes = Map.empty[String, Array[Byte]]
    while (off < std.length) {
      val (t, bytes) = boxAt(std, off)
      boxes += t -> bytes; off += bytes.length
    }
    val reordered = boxes("ftyp") ++ boxes("mdat") ++ boxes("moov")
    assert(meta(reordered).get == meta(std).get)
  }

  test("64-bit largesize mdat is walked correctly") {
    val std = Mp4.synthesize(900L, 352L, 288L, "abcdef".getBytes)
    // rebuild the mdat as a size==1 + u64 largesize box
    val payload = "abcdef".getBytes
    def u32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val large = u32(1L) ++ "mdat".getBytes("US-ASCII") ++
      u32(0L) ++ u32(16L + payload.length) ++ payload
    val head = std.dropRight(8 + payload.length) // strip the normal mdat
    val m = meta(head ++ large).get
    assert(m.mdat_bytes == payload.length.toLong)
    assert(m.width == 352L)
  }

  test("parseFrames inverts the png mux + codec: exact luma round-trip") {
    for (id <- Seq(0L, 1L, 5L, 38L)) {
      val nf = 1 + (id % 4L).toInt
      val w = 4 + (id % 3L).toInt * 4
      val h = 4
      def px(f: Int)(x: Int, y: Int): Int =
        ((id * 31L + f * 17L + x * 7L + y * 13L) % 256L).toInt
      val frames = (0 until nf).map(f => Mp4.pngFrame(w, h, px(f)))
      val bytes = Mp4.synthesizePngTrack(nf * 100L, w.toLong, h.toLong,
        frames, syncEvery = 1L + (id % 2L),
        version = if (id % 3 == 0) 1 else 0)
      val m = Mp4.parseFrames(id, bytes).get
      val expectSums = (0 until nf).map(f =>
        (for (x <- 0 until w; y <- 0 until h) yield px(f)(x, y).toLong).sum)
      assert(m.codec == "png")
      assert(m.n_frames == nf.toLong)
      assert(m.frame_width == w.toLong && m.frame_height == h.toLong)
      assert(m.luma_sum == expectSums.sum)
      assert(m.max_frame_sum == expectSums.max)
      assert(m.luma_mean_ppm == expectSums.sum * 1000000L / (nf.toLong * w * h))
      // the header-level parser must still read the same container
      val hm = meta(bytes).get
      assert(hm.width == w.toLong && hm.height == h.toLong)
      // and the sample-table parser must see the real PNG byte sizes
      val sm = Mp4.parseSamples(id, bytes).get
      assert(sm.n_samples == nf.toLong)
      assert(sm.sample_bytes == frames.map(_.length.toLong).sum)
    }
  }

  test("parseFrames degrades to None on corruption, never throws") {
    val frames = (0 until 3).map(f => Mp4.pngFrame(8, 4, (x, y) => (f * 17 + x * 7 + y * 13) % 256))
    val good = Mp4.synthesizePngTrack(300L, 8L, 4L, frames, 2L)
    assert(Mp4.parseFrames(1L, good).isDefined)
    // stsd-declared vs decoded dimension mismatch must be rejected:
    // corrupt the sample entry's u16 width field
    val stsdAt = {
      var i = -1
      for (o <- 0 until good.length - 4)
        if (i < 0 && new String(good, o, 4, "US-ASCII") == "stsd") i = o
      i
    }
    val mism = good.clone()
    mism(stsdAt + 4 + 8 + 8 + 24 + 1) = 0x63.toByte // entry payload width lo byte
    assert(Mp4.parseFrames(1L, mism).isEmpty)
    // seeded fuzz: random single-byte corruption + random truncation over
    // the whole file (header boxes AND png payload bytes) — the decoder
    // must degrade to None or a well-formed row, never throw
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Mp4.parseFrames(1L, b) // no throw
    }
    for (_ <- 0 until 500) {
      Mp4.parseFrames(1L, good.take(rnd.nextInt(good.length))) // no throw
    }
    // truncating anywhere inside mdat kills at least the last frame
    assert(Mp4.parseFrames(1L, good.take(good.length - 1)).isEmpty)
  }

  test("Multimodal dispatch routes video/mp4 through the container parser") {
    import spark.implicits._
    val bytes = Mp4.synthesize(1200L, 640L, 360L, "payload".getBytes)
    val assets = Seq(
      Asset(1L, "video/mp4", bytes.length.toLong, bytes),
      Asset(2L, "video/mp4", 3L, "bad".getBytes)).toDS()
    val f = Multimodal.extractFeatures(assets).collect()
      .map(x => x.asset_id -> x.features).toMap
    assert(f(1L)(0) == 640f && f(1L)(1) == 360f) // parsed, not stub
    assert(f(1L)(2) == 2f)                       // 1200 ticks / 600 Hz
    // undecodable video bytes degrade to the stub histogram
    assert(f(2L).toSeq == Multimodal.decodeStub("bad".getBytes).toSeq)
  }

  test("Multimodal dispatch: png-coded video tracks get FULL frame decode; " +
    "other codecs fall back to container metadata") {
    import spark.implicits._
    val frames = (0 until 2).map(f =>
      Mp4.pngFrame(4, 4, (x, y) => (f * 17 + x * 7 + y * 13) % 256))
    val pngTrack = Mp4.synthesizePngTrack(200L, 4L, 4L, frames, 1L)
    val headerOnly = Mp4.synthesize(1200L, 640L, 360L, "payload".getBytes)
    val assets = Seq(
      Asset(1L, "video/mp4", pngTrack.length.toLong, pngTrack),
      Asset(2L, "video/mp4", headerOnly.length.toLong, headerOnly)).toDS()
    val f = Multimodal.extractFeatures(assets).collect()
      .map(x => x.asset_id -> x.features).toMap
    val expect = Mp4.parseFrames(1L, pngTrack).get
    assert(f(1L)(2) == 2f, "n_frames from real frame decode")
    assert(f(1L)(4) == expect.luma_sum.toFloat, "decoded pixel sum")
    assert(f(2L)(0) == 640f && f(2L)(5) == "payload".length.toFloat,
      "codec-less track served by the metadata tier")
  }

  test("fuzz: random bytes and random single-byte corruptions of a valid " +
    "mp4 never throw — the degrade-don't-crash contract under fire") {
    val rnd = new java.util.Random(42L)
    // arbitrary garbage of every small length
    for (_ <- 1 to 2000) {
      val b = Array.fill(rnd.nextInt(96))(rnd.nextInt(256).toByte)
      Mp4.parse(1L, b) // Some or None, never an exception
    }
    // single-byte flips anywhere in a structurally valid container —
    // the sharper corpus: almost-right headers, corrupted sizes, types,
    // version bytes, fixed-point fields
    val good = Mp4.synthesize(12345L, 640L, 480L, "payload bytes".getBytes,
      version = 1)
    for (_ <- 1 to 4000) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Mp4.parse(2L, b)
    }
    // double flips + random truncation combined
    for (_ <- 1 to 2000) {
      val cut = 1 + rnd.nextInt(good.length)
      val b = good.take(cut)
      if (b.length > 1) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Mp4.parse(3L, b)
    }
  }

  test("parseSamples inverts synthesizeWithSamples; header parse is " +
      "unchanged by the sample-table track") {
    for (v <- Seq(0, 1)) {
      val sizes = Seq(100L, 150L, 120L, 99L, 131L)
      val runs = Seq((3L, 400L), (2L, 512L))
      val bytes = Mp4.synthesizeWithSamples(duration = 9000L, width = 640L,
        height = 480L, payload = "pp".getBytes, sizes = sizes,
        syncEvery = 2L, runs = runs, version = v)
      val sm = Mp4.parseSamples(7L, bytes).get
      assert(sm.n_samples == 5L)
      assert(sm.sample_bytes == sizes.sum)
      assert(sm.min_sample == 99L && sm.max_sample == 150L)
      assert(sm.n_keyframes == 3L) // samples 1, 3, 5
      assert(sm.keyframe_ppm == 3L * 1000000L / 5L)
      assert(sm.stts_entries == 2L)
      assert(sm.track_ticks == 3L * 400L + 2L * 512L)
      // the header-only parser must skip the mdia subtree it doesn't know
      val m = Mp4.parse(7L, bytes).get
      assert(m.duration == 9000L && m.width == 640L && m.height == 480L)
      assert(m.mdat_bytes == 2L)
      // a meta-only container has no sample table: clean None
      assert(Mp4.parseSamples(7L,
        Mp4.synthesize(9000L, 640L, 480L, "pp".getBytes, v)).isEmpty)
    }
  }

  test("stsz constant-size wire form (real fixed-size-audio muxer output) " +
      "expands to the per-sample view") {
    // hand-build an stsz with sample_size=121, count=4 inside the full
    // nesting by synthesizing then splicing is brittle; instead reuse the
    // writer for everything else and check the parser branch directly on
    // a minimal stbl-only container
    val sizes = Seq(121L, 121L, 121L, 121L)
    val bytes = Mp4.synthesizeWithSamples(600L, 320L, 240L, "x".getBytes,
      sizes, syncEvery = 1L, runs = Seq((4L, 250L)))
    // patch the per-sample stsz into constant form: locate the stsz box
    // payload (version u32, sample_size u32, count u32, 4 sizes) and
    // rewrite sample_size=121, leaving the (now-ignored) table in place
    val idx = {
      val pat = "stsz".getBytes("US-ASCII")
      bytes.indices.find(i => i + 4 <= bytes.length &&
        bytes.slice(i, i + 4).sameElements(pat)).get + 4
    }
    def w32(off: Int, v: Long): Unit = {
      bytes(off) = ((v >> 24) & 0xff).toByte
      bytes(off + 1) = ((v >> 16) & 0xff).toByte
      bytes(off + 2) = ((v >> 8) & 0xff).toByte
      bytes(off + 3) = (v & 0xff).toByte
    }
    w32(idx + 4, 121L)
    val sm = Mp4.parseSamples(1L, bytes).get
    assert(sm.n_samples == 4L && sm.sample_bytes == 484L)
    assert(sm.min_sample == 121L && sm.max_sample == 121L)
  }

  test("fuzz: corruptions of a sample-table container never throw, for " +
      "either parser") {
    val rnd = new java.util.Random(43L)
    val good = Mp4.synthesizeWithSamples(12345L, 640L, 480L,
      "payload".getBytes, sizes = (0L until 9L).map(i => 100L + i),
      syncEvery = 3L, runs = Seq((5L, 400L), (4L, 500L)), version = 1)
    for (_ <- 1 to 4000) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Mp4.parse(2L, b); Mp4.parseSamples(2L, b)
    }
    for (_ <- 1 to 4000) {
      val cut = 1 + rnd.nextInt(good.length)
      val b = good.take(cut)
      if (b.length > 1) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Mp4.parse(3L, b); Mp4.parseSamples(3L, b)
    }
  }

  test("videoSamples query fields derive from parsed stbl bytes at sf0.001") {
    val rows = Mp4.videoSamples(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    val docs = sf("documents").select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val id = r.getLong(0)
      val n = 1L + (docs(id) % 29L)
      val k = 1L + (id % 4L)
      assert(r.getLong(1) == n)
      assert(r.getLong(2) ==
        (0L until n).map(i => 100L + (id * 31L + i * 7L) % 50L).sum)
      assert(r.getLong(5) == (n - 1L) / k + 1L)
      assert(r.getLong(6) == ((n - 1L) / k + 1L) * 1000000L / n)
      val c1 = (n + 1L) / 2L
      assert(r.getLong(8) == c1 * (400L + id % 100L) +
        (n - c1) * (500L + id % 50L))
    }
  }

  test("videoMeta query fields derive from parsed bytes at sf0.001") {
    val rows = Mp4.videoMeta(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    val docs = sf("documents").select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val id = r.getLong(0)
      assert(r.getLong(1) == 600L)
      assert(r.getLong(2) == docs(id) * 10L)
      assert(r.getLong(3) == docs(id) * 10L * 1000L / 600L)
      assert(r.getLong(4) == 320L + (id % 8) * 16L)
      assert(r.getLong(5) == 240L + (id % 5) * 12L)
      assert(r.getLong(7) == docs(id))
    }
  }
}
