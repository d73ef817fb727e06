package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parsed MP4 container metadata (no codec involved — header-level). */
final case class Mp4Meta(asset_id: Long, timescale: Long, duration: Long,
    duration_ms: Long, width: Long, height: Long, n_top_boxes: Long,
    mdat_bytes: Long)

/** Per-track sample-table statistics read from `stbl` — pure box
  * arithmetic over the already-parsed container, no codec (r13 verdict
  * #5: the honest next step past header metadata). Everything is
  * integer-exact: ppm ratios use BIGINT div on both engines. */
final case class Mp4Samples(asset_id: Long, n_samples: Long,
    sample_bytes: Long, min_sample: Long, max_sample: Long,
    n_keyframes: Long, keyframe_ppm: Long, stts_entries: Long,
    track_ticks: Long)

/** Per-asset pixel statistics from REAL frame decode of a `png `-coded
  * video track: codec fourcc from stsd, frame locations from stsz+stco,
  * pixel values from ImageIO's PNG decoder. All stats integer-exact
  * (PNG is lossless, so decoded luma == synthesized luma). */
final case class Mp4Frames(asset_id: Long, codec: String, n_frames: Long,
    frame_width: Long, frame_height: Long, luma_sum: Long,
    luma_mean_ppm: Long, max_frame_sum: Long)

/** Real MP4 (ISO BMFF, ISO/IEC 14496-12) container parsing — the
  * header-level half of the video modality the JDK can actually do
  * (frame DECODE needs a codec the JDK doesn't ship and stays the
  * labeled stub in [[Multimodal]]; duration/resolution/structure need
  * only big-endian box walking).
  *
  * Box model: [size:u32][type:4cc], size == 1 → u64 largesize follows,
  * size == 0 → box runs to end of file; `moov` nests `mvhd` (version 0:
  * u32 timescale/duration; version 1: u64) and `trak`/`tkhd` (16.16
  * fixed-point width/height after a version-dependent prefix). The
  * parser walks top-level boxes in one pass, descends only into moov,
  * and never materializes anything but the ~100-byte header boxes —
  * mdat payloads are skipped by size, which is what makes this safe on
  * multi-GB assets: metadata extraction reads O(header), not O(file).
  *
  * Scale contract is [[Multimodal]]'s: binary payloads never shuffle;
  * the mapPartitions pass emits only the fixed-width [[Mp4Meta]] row.
  *
  * The harness query synthesizes a structurally-valid MP4 per document
  * with metadata that is a pure arithmetic function of the document's
  * columns, then parses it back; the DuckDB oracle recomputes the same
  * arithmetic DIRECTLY from the columns — so a hash match proves the
  * byte parser exactly inverts the byte writer (same pinning pattern as
  * mm_features' stub histogram, but over a REAL container format, both
  * mvhd versions included).
  */
object Mp4 {
  val Timescale = 600L // the QuickTime-conventional default

  // --- synthesis -----------------------------------------------------------

  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    u32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** mvhd payload: version 0 packs timescale/duration as u32, version 1
    * as u64 with u64 create/modify times — both wire formats are real
    * and both are exercised by the synthesizer (split by asset id). */
  private def mvhd(version: Int, timescale: Long, duration: Long): Array[Byte] = {
    val head = Array(version.toByte, 0.toByte, 0.toByte, 0.toByte)
    val times =
      if (version == 1) u64(0L) ++ u64(0L) ++ u32(timescale) ++ u64(duration)
      else u32(0L) ++ u32(0L) ++ u32(timescale) ++ u32(duration)
    // rate 1.0 (16.16), volume 1.0 (8.8) + reserved, unity matrix,
    // 6 predefined words, next_track_id
    head ++ times ++ u32(0x00010000L) ++ u32(0x01000000L) ++ u32(0) ++
      u32(0) ++ unityMatrix ++ Array.fill(24)(0.toByte) ++ u32(2L)
  }

  private def unityMatrix: Array[Byte] =
    u32(0x00010000L) ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32(0x00010000L) ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(0x40000000L)

  /** tkhd payload: width/height as 16.16 fixed point after the
    * version-dependent time prefix. */
  private def tkhd(version: Int, duration: Long, width: Long,
      height: Long): Array[Byte] = {
    val head = Array(version.toByte, 0.toByte, 0.toByte, 7.toByte) // enabled
    val times =
      if (version == 1)
        u64(0L) ++ u64(0L) ++ u32(1L) ++ u32(0) ++ u64(duration)
      else u32(0L) ++ u32(0L) ++ u32(1L) ++ u32(0) ++ u32(duration)
    head ++ times ++ u32(0) ++ u32(0) ++ // reserved[2]
      u32(0) ++ // layer + alternate_group
      u32(0) ++ // volume + reserved
      unityMatrix ++ u32(width << 16) ++ u32(height << 16)
  }

  /** A structurally valid minimal MP4: ftyp + moov(mvhd, trak(tkhd)) +
    * mdat(payload). Every field is a deterministic function of the
    * arguments; `version` alternates the mvhd/tkhd wire format. */
  def synthesize(duration: Long, width: Long, height: Long,
      payload: Array[Byte], version: Int = 0): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ u32(0x200L) ++
        "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))
    val moov = box("moov",
      box("mvhd", mvhd(version, Timescale, duration)) ++
        box("trak", box("tkhd", tkhd(version, duration, width, height))))
    ftyp ++ moov ++ box("mdat", payload)
  }

  /** mdhd payload (version 0): media timescale + duration after the
    * create/modify times; language + pre_defined close the box. */
  private def mdhd(timescale: Long, duration: Long): Array[Byte] =
    Array(0.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      u32(0L) ++ u32(0L) ++ u32(timescale) ++ u32(duration) ++ u32(0x55c40000L)

  /** stsz payload: sample_size = 0 → per-sample u32 size table follows
    * (the general wire form; the parser also accepts the constant-size
    * form real muxers emit for fixed-size audio). */
  private def stsz(sizes: Seq[Long]): Array[Byte] =
    u32(0L) ++ u32(0L) ++ u32(sizes.length.toLong) ++
      sizes.toArray.flatMap(u32)

  /** stss payload: 1-based sync-sample numbers. */
  private def stss(syncs: Seq[Long]): Array[Byte] =
    u32(0L) ++ u32(syncs.length.toLong) ++ syncs.toArray.flatMap(u32)

  /** stts payload: (sample_count, sample_delta) run pairs. */
  private def stts(runs: Seq[(Long, Long)]): Array[Byte] =
    u32(0L) ++ u32(runs.length.toLong) ++
      runs.toArray.flatMap { case (c, d) => u32(c) ++ u32(d) }

  /** [[synthesize]] plus a full sample-table track:
    * trak(tkhd, mdia(mdhd, minf(stbl(stsz, stss, stts)))) — the real
    * ISO BMFF nesting a demuxer walks for per-sample stats. `syncEvery`
    * marks samples 1, 1+k, 1+2k, … as keyframes; `runs` is the stts
    * time-to-sample run-length encoding. The header-only [[parse]] must
    * return the identical [[Mp4Meta]] for these bytes (it skips boxes it
    * doesn't know), which the spec asserts. */
  def synthesizeWithSamples(duration: Long, width: Long, height: Long,
      payload: Array[Byte], sizes: Seq[Long], syncEvery: Long,
      runs: Seq[(Long, Long)], version: Int = 0): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ u32(0x200L) ++
        "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))
    val syncs = 1L.to(sizes.length.toLong).by(syncEvery)
    val stbl = box("stbl",
      box("stsz", stsz(sizes)) ++ box("stss", stss(syncs)) ++
        box("stts", stts(runs)))
    val mediaTicks = runs.map { case (c, d) => c * d }.sum
    val moov = box("moov",
      box("mvhd", mvhd(version, Timescale, duration)) ++
        box("trak",
          box("tkhd", tkhd(version, duration, width, height)) ++
            box("mdia",
              box("mdhd", mdhd(Timescale, mediaTicks)) ++
                box("minf", stbl))))
    ftyp ++ moov ++ box("mdat", payload)
  }

  private def u16(v: Long): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** stsd payload: one VisualSampleEntry in the real wire layout
    * (ISO 14496-12 §8.5.2 + §12.1.3): 6 reserved bytes + data_reference_
    * index, 16 bytes of pre_defined/reserved, u16 width/height, 16.16
    * resolutions, reserved, frame_count, 32-byte compressorname, depth,
    * pre_defined = -1. The entry's own box type IS the codec fourcc —
    * `png ` is the registered QuickTime lossless video codec, the one
    * video codec whose samples the JDK can actually decode. */
  private def stsd(codec: String, width: Long, height: Long): Array[Byte] = {
    val entry = box(codec,
      Array.fill(6)(0.toByte) ++ u16(1L) ++      // reserved + data_ref_index
        Array.fill(16)(0.toByte) ++              // pre_defined + reserved
        u16(width) ++ u16(height) ++
        u32(0x00480000L) ++ u32(0x00480000L) ++  // 72 dpi horiz/vert
        u32(0L) ++ u16(1L) ++                    // reserved + frame_count
        Array.fill(32)(0.toByte) ++              // compressorname
        u16(24L) ++ u16(0xffffL))                // depth 24, pre_defined -1
    u32(0L) ++ u32(1L) ++ entry
  }

  /** stsc payload: all samples in one chunk (entry (1, n, 1)). */
  private def stsc1(n: Long): Array[Byte] =
    u32(0L) ++ u32(1L) ++ u32(1L) ++ u32(n) ++ u32(1L)

  /** stco payload: the single chunk's absolute file offset. */
  private def stco1(off: Long): Array[Byte] = u32(0L) ++ u32(1L) ++ u32(off)

  /** Encode one grayscale frame as real PNG bytes via the JDK codec.
    * In-memory cache only: the default ImageIO disk cache would add a
    * temp-file write per frame to the hot path. */
  def pngFrame(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, px(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      writer.setOutput(ios)
      try writer.write(img) finally writer.dispose()
    } finally ios.close()
    bos.toByteArray
  }

  /** [[synthesizeWithSamples]]'s sibling for a decodable track: the stbl
    * additionally carries stsd (codec = `png `), stsc, and stco, and the
    * mdat payload is the concatenation of the real PNG sample bytes —
    * i.e. a playable-shape lossless video track, not just headers. stco
    * needs the absolute mdat payload offset, which depends on moov's own
    * size — resolved by the standard two-pass build (box sizes are
    * fixed-width, so pass 2's moov length equals pass 1's). */
  def synthesizePngTrack(duration: Long, width: Long, height: Long,
      frames: Seq[Array[Byte]], syncEvery: Long,
      version: Int = 0): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ u32(0x200L) ++
        "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))
    val sizes = frames.map(_.length.toLong)
    val syncs = 1L.to(sizes.length.toLong).by(syncEvery)
    def moovOf(chunkOff: Long): Array[Byte] = box("moov",
      box("mvhd", mvhd(version, Timescale, duration)) ++
        box("trak",
          box("tkhd", tkhd(version, duration, width, height)) ++
            box("mdia",
              box("mdhd", mdhd(Timescale, duration)) ++
                box("minf", box("stbl",
                  box("stsd", stsd("png ", width, height)) ++
                    box("stsz", stsz(sizes)) ++
                    box("stsc", stsc1(sizes.length.toLong)) ++
                    box("stco", stco1(chunkOff)) ++
                    box("stss", stss(syncs)) ++
                    box("stts", stts(Seq((sizes.length.toLong, 100L)))))))))
    val probe = moovOf(0L)
    val chunkOff = ftyp.length.toLong + probe.length.toLong + 8L
    ftyp ++ moovOf(chunkOff) ++ box("mdat", frames.toArray.flatten)
  }

  // --- parsing -------------------------------------------------------------

  private def readU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def readU64(b: Array[Byte], off: Int): Long =
    (readU32(b, off) << 32) | readU32(b, off + 4)

  private def typeAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Iterate boxes in b[from, until): (type, payloadStart, payloadEnd).
    * Returns None on any structural violation (truncated header, box
    * overrunning its parent) — the degrade-don't-crash contract. */
  private def walk(b: Array[Byte], from: Int,
      until: Int): Option[List[(String, Int, Int)]] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Int, Int)]
    var off = from
    while (off < until) {
      if (off + 8 > until) return None
      val size32 = readU32(b, off)
      val typ = typeAt(b, off + 4)
      val (size, headerLen) =
        if (size32 == 1L) {
          if (off + 16 > until) return None
          (readU64(b, off + 8), 16)
        } else if (size32 == 0L) ((until - off).toLong, 8)
        else (size32, 8)
      if (size < headerLen || off + size > until) return None
      out += ((typ, off + headerLen, off + size.toInt))
      off += size.toInt
    }
    Some(out.toList)
  }

  /** Header-level metadata of one MP4 byte array. None = not parseable
    * as ISO BMFF (missing moov/mvhd, truncated, overrunning boxes). */
  def parse(assetId: Long, bytes: Array[Byte]): Option[Mp4Meta] =
    for {
      top <- walk(bytes, 0, bytes.length)
      moov <- top.find(_._1 == "moov")
      inMoov <- walk(bytes, moov._2, moov._3)
      mv <- inMoov.find(_._1 == "mvhd")
      (timescale, duration) <- parseMvhd(bytes, mv._2, mv._3)
      trak <- inMoov.find(_._1 == "trak")
      inTrak <- walk(bytes, trak._2, trak._3)
      tk <- inTrak.find(_._1 == "tkhd")
      (w, h) <- parseTkhd(bytes, tk._2, tk._3)
      if timescale > 0
    } yield Mp4Meta(assetId, timescale, duration,
      duration * 1000L / timescale, w, h,
      top.length.toLong,
      top.filter(_._1 == "mdat").map(t => (t._3 - t._2).toLong).sum)

  private def parseMvhd(b: Array[Byte], from: Int,
      until: Int): Option[(Long, Long)] = {
    if (from >= until) return None
    b(from) & 0xff match {
      case 0 if until - from >= 20 =>
        Some((readU32(b, from + 12), readU32(b, from + 16)))
      case 1 if until - from >= 32 =>
        Some((readU32(b, from + 20), readU64(b, from + 24)))
      case _ => None
    }
  }

  /** Sample-table statistics of one MP4 byte array: walk
    * moov → trak → mdia → minf → stbl, then read stsz/stss/stts by the
    * wire format. None = no parseable sample table (missing boxes,
    * truncated tables, counts overrunning their box) — same
    * degrade-don't-crash contract as [[parse]]. */
  def parseSamples(assetId: Long, bytes: Array[Byte]): Option[Mp4Samples] =
    for {
      top <- walk(bytes, 0, bytes.length)
      moov <- top.find(_._1 == "moov")
      inMoov <- walk(bytes, moov._2, moov._3)
      trak <- inMoov.find(_._1 == "trak")
      inTrak <- walk(bytes, trak._2, trak._3)
      mdia <- inTrak.find(_._1 == "mdia")
      inMdia <- walk(bytes, mdia._2, mdia._3)
      minf <- inMdia.find(_._1 == "minf")
      inMinf <- walk(bytes, minf._2, minf._3)
      stbl <- inMinf.find(_._1 == "stbl")
      inStbl <- walk(bytes, stbl._2, stbl._3)
      sz <- inStbl.find(_._1 == "stsz")
      sizes <- parseStsz(bytes, sz._2, sz._3)
      ss <- inStbl.find(_._1 == "stss")
      syncs <- parseStss(bytes, ss._2, ss._3)
      tt <- inStbl.find(_._1 == "stts")
      runs <- parseStts(bytes, tt._2, tt._3)
      if sizes.nonEmpty
    } yield Mp4Samples(assetId,
      n_samples = sizes.length.toLong,
      sample_bytes = sizes.sum,
      min_sample = sizes.min,
      max_sample = sizes.max,
      n_keyframes = syncs.length.toLong,
      keyframe_ppm = syncs.length.toLong * 1000000L / sizes.length,
      stts_entries = runs.length.toLong,
      track_ticks = runs.map { case (c, d) => c * d }.sum)

  /** stsz: constant sample_size, or 0 → per-sample table. */
  private def parseStsz(b: Array[Byte], from: Int,
      until: Int): Option[Seq[Long]] = {
    if (until - from < 12) return None
    val const = readU32(b, from + 4)
    val n = readU32(b, from + 8)
    if (n > Int.MaxValue / 4) return None
    // the constant-size branch must not MATERIALIZE n elements: an
    // adversarial header claiming ~500M samples would force a multi-GB
    // Vector.fill (OutOfMemoryError is not NonFatal — it would pierce the
    // degrade-don't-crash contract the fuzz suite asserts). A constant
    // view costs O(1) memory whatever n claims; the count itself is
    // bounded at 16M samples — beyond any real fixed-size-audio track's
    // header, and it caps the callers' O(n) folds. The file-size bound
    // deliberately does NOT involve const·n: sample analytics are a
    // header-level read and the mdat payload may be truncated or absent.
    if (const != 0L) {
      if (n > (1L << 24)) None
      else Some(new scala.collection.immutable.IndexedSeq[Long] {
        def length: Int = n.toInt
        def apply(i: Int): Long = const
      })
    }
    else if (until - from < 12 + 4 * n) None
    else Some((0 until n.toInt).map(i => readU32(b, from + 12 + 4 * i)))
  }

  private def parseStss(b: Array[Byte], from: Int,
      until: Int): Option[Seq[Long]] = {
    if (until - from < 8) return None
    val n = readU32(b, from + 4)
    if (n > Int.MaxValue / 4 || until - from < 8 + 4 * n) None
    else Some((0 until n.toInt).map(i => readU32(b, from + 8 + 4 * i)))
  }

  private def parseStts(b: Array[Byte], from: Int,
      until: Int): Option[Seq[(Long, Long)]] = {
    if (until - from < 8) return None
    val n = readU32(b, from + 4)
    if (n > Int.MaxValue / 8 || until - from < 8 + 8 * n) None
    else Some((0 until n.toInt).map(i =>
      (readU32(b, from + 8 + 8 * i), readU32(b, from + 12 + 8 * i))))
  }

  /** stsd: codec fourcc + declared u16 width/height of the FIRST sample
    * entry (the entry's box type is the codec identifier). */
  private def parseStsd(b: Array[Byte], from: Int,
      until: Int): Option[(String, Long, Long)] = {
    if (until - from < 8) return None
    if (readU32(b, from + 4) < 1L) return None
    for {
      entries <- walk(b, from + 8, until)
      (codec, p, end) <- entries.headOption
      if end - p >= 28
    } yield (codec, readU32(b, p + 24) >> 16, readU32(b, p + 24) & 0xffffL)
  }

  /** stco: first chunk offset (this engine's synthesized tracks pack all
    * samples into one chunk; multi-chunk layout would extend here). */
  private def parseStco1(b: Array[Byte], from: Int, until: Int): Option[Long] = {
    if (until - from < 12) return None
    if (readU32(b, from + 4) < 1L) return None
    Some(readU32(b, from + 8))
  }

  /** Decode every sample in [chunkOff + running stsz offsets) as PNG via
    * the JDK codec; None on any bounds violation, undecodable frame, or
    * disagreement with the stsd-declared dimensions. The dimension check
    * runs against the codec's HEADER (reader.getWidth) BEFORE pixel
    * allocation, so corrupted frame bytes declaring absurd sizes are
    * rejected without allocating — degrade-don't-crash at O(header)
    * cost, same contract as [[parse]]. Returns per-frame luma sums. */
  private def decodeFrames(b: Array[Byte], chunkOff: Long, sizes: Seq[Long],
      expectW: Long, expectH: Long): Option[Seq[Long]] = {
    var off = chunkOff
    val sums = new Array[Long](sizes.length)
    var i = 0
    while (i < sizes.length) {
      val sz = sizes(i)
      if (off < 0 || sz <= 0 || sz > Int.MaxValue || off + sz > b.length)
        return None
      try {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b, off.toInt, sz.toInt))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          reader.setInput(iis)
          try {
            if (reader.getWidth(0).toLong != expectW ||
              reader.getHeight(0).toLong != expectH) return None
            val raster = reader.read(0).getRaster
            var sum = 0L
            var y = 0
            while (y < expectH) {
              var x = 0
              while (x < expectW) {
                sum += raster.getSample(x.toInt, y.toInt, 0); x += 1
              }
              y += 1
            }
            sums(i) = sum
          } finally reader.dispose()
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => return None }
      off += sz
      i += 1
    }
    Some(sums.toIndexedSeq)
  }

  /** REAL video frame decode: stsd gives the codec, stsz+stco locate the
    * sample byte ranges, and — for the `png ` lossless codec the JDK
    * ships a decoder for — every frame is decoded to pixels and reduced
    * to integer luma statistics. This closes the r13 "pixel decode" gap
    * for lossless-coded tracks; codecs the JDK lacks (H.264 etc.) still
    * degrade to header-level metadata in [[Multimodal]]'s dispatch. The
    * decoded dimensions must agree with the stsd-declared ones — a real
    * demuxer consistency check the spec corrupts both sides of. */
  def parseFrames(assetId: Long, bytes: Array[Byte]): Option[Mp4Frames] =
    for {
      top <- walk(bytes, 0, bytes.length)
      moov <- top.find(_._1 == "moov")
      inMoov <- walk(bytes, moov._2, moov._3)
      trak <- inMoov.find(_._1 == "trak")
      inTrak <- walk(bytes, trak._2, trak._3)
      mdia <- inTrak.find(_._1 == "mdia")
      inMdia <- walk(bytes, mdia._2, mdia._3)
      minf <- inMdia.find(_._1 == "minf")
      inMinf <- walk(bytes, minf._2, minf._3)
      stbl <- inMinf.find(_._1 == "stbl")
      inStbl <- walk(bytes, stbl._2, stbl._3)
      sd <- inStbl.find(_._1 == "stsd")
      (codec, sdW, sdH) <- parseStsd(bytes, sd._2, sd._3)
      if codec == "png "
      sz <- inStbl.find(_._1 == "stsz")
      sizes <- parseStsz(bytes, sz._2, sz._3)
      if sizes.nonEmpty
      co <- inStbl.find(_._1 == "stco")
      chunkOff <- parseStco1(bytes, co._2, co._3)
      if sdW > 0 && sdH > 0
      frameSums <- decodeFrames(bytes, chunkOff, sizes, sdW, sdH)
    } yield Mp4Frames(assetId, codec.trim,
      n_frames = frameSums.length.toLong,
      frame_width = sdW, frame_height = sdH,
      luma_sum = frameSums.sum,
      luma_mean_ppm = frameSums.sum * 1000000L / (frameSums.length * sdW * sdH),
      max_frame_sum = frameSums.max)

  private def parseTkhd(b: Array[Byte], from: Int,
      until: Int): Option[(Long, Long)] = {
    val fixedOff = b(from) & 0xff match {
      case 0 => 76 // 4 flags + 4+4 times + 4 id + 4 res + 4 dur + 8 res + 8 attrs + 36 matrix
      case 1 => 88 // u64 times and duration
      case _ => return None
    }
    if (until - from < fixedOff + 8) None
    else Some((readU32(b, from + fixedOff) >> 16,
      readU32(b, from + fixedOff + 4) >> 16))
  }

  // --- harness query -------------------------------------------------------

  /** Deterministic per-document video metadata: duration ticks =
    * n_chars·10 (at the 600 Hz timescale), width/height from small
    * doc_id-keyed lookup grids, payload = the text bytes, and the mvhd
    * version alternating by doc_id % 3 — all recomputable by the oracle
    * as column arithmetic. */
  def videoMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), col("text"))
      .as[(Long, Long, String)]
    assets.mapPartitions { it =>
      it.map { case (id, nChars, text) =>
        val bytes = synthesize(
          duration = nChars * 10L,
          width = 320L + (id % 8) * 16L,
          height = 240L + (id % 5) * 12L,
          payload = text.getBytes("UTF-8"),
          version = if (id % 3 == 0) 1 else 0)
        // parse-back: every output field below comes from the BYTES
        parse(id, bytes).getOrElse(
          throw new IllegalStateException(s"unparseable synthesized mp4 for doc $id"))
      }
    }.toDF()
      .orderBy(col("asset_id"))
  }

  /** Per-track sample-table analytics over synthesized-then-parsed real
    * `stbl` wire bytes — sample count/size stats from stsz, keyframe
    * rate from stss, duration ticks from the stts run-length encoding.
    * Like [[videoMeta]], every parameter is deterministic column
    * arithmetic (sample count 1..29 from n_chars; per-sample sizes from
    * a doc_id-keyed affine grid; keyframe interval 1..4; a two-run stts)
    * so the DuckDB oracle recomputes the same integers directly from the
    * columns and a hash match proves the stbl parser exactly inverts the
    * stbl writer. Scale contract unchanged: bytes are synthesized and
    * parsed inside one mapPartitions pass, only the fixed-width
    * [[Mp4Samples]] row survives — payload bytes never shuffle. */
  def videoSamples(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), col("text"))
      .as[(Long, Long, String)]
    assets.mapPartitions { it =>
      it.map { case (id, nChars, text) =>
        val n = 1L + (nChars % 29L)
        val sizes = (0L until n).map(i => 100L + (id * 31L + i * 7L) % 50L)
        val k = 1L + (id % 4L)
        val c1 = (n + 1L) / 2L
        val c2 = n - c1
        val runs = if (c2 > 0)
          Seq((c1, 400L + id % 100L), (c2, 500L + id % 50L))
        else Seq((c1, 400L + id % 100L))
        val bytes = synthesizeWithSamples(
          duration = nChars * 10L,
          width = 320L + (id % 8) * 16L,
          height = 240L + (id % 5) * 12L,
          payload = text.getBytes("UTF-8"),
          sizes = sizes, syncEvery = k, runs = runs,
          version = if (id % 3 == 0) 1 else 0)
        parseSamples(id, bytes).getOrElse(
          throw new IllegalStateException(
            s"unparseable synthesized sample table for doc $id"))
      }
    }.toDF()
      .orderBy(col("asset_id"))
  }

  /** End-to-end video FRAME decode through a real container and a real
    * codec: per document, 1–4 grayscale frames whose pixels are a pure
    * arithmetic function of (doc_id, frame, x, y) are PNG-encoded by the
    * JDK codec, muxed into a `png `-coded MP4 track, then the OUTPUT is
    * derived exclusively by parsing the container back (stsd → codec,
    * stsz+stco → sample ranges) and decoding each frame's pixels. PNG is
    * lossless, so the DuckDB oracle recomputes the identical integer
    * luma sums directly from the pixel formula — a hash match proves
    * decode ∘ encode = id through both layers (mux and codec).
    *
    * Scale shape: synthesis, mux, demux, and decode all happen inside
    * one mapPartitions pass; only the fixed-width [[Mp4Frames]] row
    * survives — frame bytes never shuffle, and the decoder initializes
    * per partition, not per row (ImageIO's in-memory streams; the
    * temp-file cache is bypassed in [[pngFrame]]). */
  def videoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    assets.mapPartitions { it =>
      it.map { id =>
        val nf = 1 + (id % 4L).toInt
        val w = 4 + (id % 3L).toInt * 4
        val h = 4
        val frames = (0 until nf).map(f =>
          pngFrame(w, h,
            (x, y) => ((id * 31L + f * 17L + x * 7L + y * 13L) % 256L).toInt))
        val bytes = synthesizePngTrack(
          duration = nf * 100L, width = w.toLong, height = h.toLong,
          frames = frames, syncEvery = 1L + (id % 2L),
          version = if (id % 3 == 0) 1 else 0)
        parseFrames(id, bytes).getOrElse(throw new IllegalStateException(
          s"undecodable synthesized png track for doc $id"))
      }
    }.toDF()
      .orderBy(col("asset_id"))
  }
}
