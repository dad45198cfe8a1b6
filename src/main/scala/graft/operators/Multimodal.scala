package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, plus per-partition batched
  * decode/feature-extract. The reference has no binary data at all
  * (flat scalar CSVs, SURVEY.md §1); this is the north-star surface
  * for image/audio/video corpora at 100 TB.
  *
  * Design:
  *   - at rest, media is `(id, payload binary, meta struct)` — in
  *     production loaded via `spark.read.format("binaryFile")` from an
  *     object store; here the payload is derived deterministically from
  *     `documents.text` so the plumbing is testable without media libs;
  *   - decode runs per-partition (`mapPartitions` on a typed Dataset):
  *     one decoder instance per partition, batched iteration, no
  *     per-row setup cost — the Scala analogue of `mapInPandas`;
  *   - decode is REAL for images (`javax.imageio`, which ships in
  *     the JDK: PNG/JPEG/GIF/BMP decode to true width x height), for
  *     WAV audio (`javax.sound.sampled` header/PCM-format parse), and
  *     for MP4 video container headers (ISO-BMFF box walk: true
  *     dims/frame-count/duration; frame PIXEL decode would need codecs
  *     this container lacks). Everything else — text payloads, corrupt
  *     media — takes the deterministic stub: degrade, never fail the
  *     partition, which is routine hygiene at 100 TB where some
  *     fraction of crawled media is always malformed.
  *
  * The SQL-expressible slice (byte length, content hash, frame-offset
  * sampling) is registered as oracle-checked queries; the typed
  * Dataset path is covered by ScalaTest (MultimodalSpec).
  */
object Multimodal {

  case class MediaItem(id: Long, payload: Array[Byte], mime: String, n_chars: Long)

  /** Decoded features. `kind` records which decoder actually ran:
    * "image" (real ImageIO decode), "audio" (real WAV header/PCM
    * parse), "video" (real MP4/ISO-BMFF container-header parse), or
    * "other" (the deterministic stub — text and corrupt payloads).
    * Image features land in width/height/n_frames; audio features in
    * sample_rate_hz/channels/duration_ms with n_frames = PCM
    * sample-frame count; video features in width/height (track
    * header), n_frames (stts sample count) and duration_ms (movie
    * header); stub payloads keep the historical stub triple and zero
    * audio fields.
    */
  case class MediaFeatures(
      id: Long,
      n_bytes: Int,
      checksum: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate_hz: Int,
      channels: Int,
      duration_ms: Long)

  /** Media decoder: real image decode, deterministic stub otherwise.
    *
    * Dispatch keys on the payload's container signature (magic bytes),
    * not the `mime` column — decode must be source-agnostic (the same
    * bytes give the same features whether they arrived via binaryFile,
    * a documents-derived fixture, or a stream), and at crawl scale the
    * declared mime routinely lies about the content.
    *
    *   - image signatures (PNG / JPEG / GIF / BMP) → `javax.imageio`
    *     (JDK-native, `java.desktop` module — zero extra deps): true
    *     pixel dimensions, 1 frame;
    *   - RIFF/WAVE → `javax.sound.sampled` header parse: true sample
    *     rate / channels / frame count / duration;
    *   - ISO-BMFF `ftyp` (MP4/MOV family) → bounded box-tree walk:
    *     true track dimensions, stts frame count, movie duration;
    *   - unparseable-despite-signature → stub fallback (corrupt media
    *     must degrade, not kill the partition);
    *   - everything else (text, unknown codecs) → the deterministic
    *     stub, the extension point for codecs this container lacks.
    */
  object Decoder {
    // ImageIO's default path spools through a temp-file disk cache per
    // read; in-memory decode is the right shape for a per-partition
    // batch loop.
    javax.imageio.ImageIO.setUseCache(false)

    private def sig(p: Array[Byte], off: Int): Int =
      if (p.length > off) p(off) & 0xff else -1

    private[graft] def isImage(p: Array[Byte]): Boolean =
      (sig(p, 0) == 0x89 && sig(p, 1) == 'P' && sig(p, 2) == 'N' && sig(p, 3) == 'G') || // PNG
        (sig(p, 0) == 0xff && sig(p, 1) == 0xd8 && sig(p, 2) == 0xff) || // JPEG
        (sig(p, 0) == 'G' && sig(p, 1) == 'I' && sig(p, 2) == 'F') || // GIF
        (sig(p, 0) == 'B' && sig(p, 1) == 'M') // BMP

    /** RIFF/WAVE container signature: "RIFF" at 0, "WAVE" at 8. */
    private[graft] def isWav(p: Array[Byte]): Boolean =
      sig(p, 0) == 'R' && sig(p, 1) == 'I' && sig(p, 2) == 'F' && sig(p, 3) == 'F' &&
        sig(p, 8) == 'W' && sig(p, 9) == 'A' && sig(p, 10) == 'V' && sig(p, 11) == 'E'

    /** Deterministic stand-in for codecs not present in this container
      * (audio/video) and the fallback for undecodable image bytes.
      */
    def stub(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      val b0 = if (n > 0) payload(0) & 0xff else 0
      (64 + b0 % 64, 64 + (n % 64), 1 + n / 256)
    }

    /** Decompression-bomb guard: a crafted header can DECLARE huge
      * dimensions, and `ImageIO.read` allocates the full
      * width×height raster BEFORE any decode error surfaces — the
      * resulting OutOfMemoryError is an Error, escapes a
      * `catch Exception`, and kills the task. 64 MPix ≈ a 256 MB ARGB
      * raster per concurrently-decoding task — above any plausible
      * crawl image, below what would destabilize an executor.
      */
    private[graft] val MaxImagePixels = 64L * 1000 * 1000

    /** Header-only dimensions via the matching [[javax.imageio.ImageReader]]
      * — `getWidth/getHeight(0)` parse the container header without
      * allocating the raster, so even a bomb header costs bytes, not
      * gigabytes. None when no reader matches or the header is
      * unparseable.
      */
    private def headerDims(payload: Array[Byte]): Option[(Int, Int)] = {
      // createImageInputStream may return null per its contract —
      // honor this helper's own "None when no reader matches" promise
      // instead of NPE-ing in the finally and relying on a caller's
      // catch to route to the stub.
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (iis == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis, true, true); Some((r.getWidth(0), r.getHeight(0))) }
          finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }

    /** Full image decode behind the bomb guard: the decoded raster
      * when the payload is a sane, decodable image; None otherwise.
      * Shared by the feature, resize, and embed paths so "decodable"
      * means exactly one thing engine-wide.
      */
    private[graft] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (!isImage(payload)) None
      else try {
        headerDims(payload) match {
          case Some((w, h)) if w > 0 && h > 0 && w.toLong * h <= MaxImagePixels =>
            // Header is sane — now the full decode is safe to
            // attempt, and still required: a valid header on a
            // truncated body must degrade to the stub (corrupt
            // media must not report real-looking features).
            Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
          case _ => None
        }
      } catch { case _: Exception => None }

    def decode(payload: Array[Byte]): (Int, Int, Int) =
      decodeImage(payload) match {
        case Some(img) => (img.getWidth, img.getHeight, 1)
        case None => stub(payload)
      }

    /** Real WAV decode via `javax.sound.sampled` (JDK `java.desktop`
      * module, zero extra deps): header/PCM-format parse only — the
      * sample data itself is never buffered, so cost is O(header)
      * regardless of payload size. Returns (sample_rate_hz, channels,
      * sample_frames, duration_ms); None when the RIFF signature lies
      * (truncated/corrupt payloads degrade to the stub like images do).
      */
    private[graft] def decodeWav(payload: Array[Byte]): Option[(Int, Int, Int, Long)] =
      if (!isWav(payload)) None
      else try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength
        val rate = fmt.getSampleRate
        if (frames < 0 || rate <= 0 || fmt.getChannels <= 0) None
        else Some((math.round(rate), fmt.getChannels, frames,
          math.round(frames * 1000.0 / rate)))
      } catch { case _: Exception => None }

    /** MP4 / ISO base-media signature: a `ftyp` box type at offset 4
      * (the first box of every conforming file).
      */
    private[graft] def isMp4(p: Array[Byte]): Boolean =
      sig(p, 4) == 'f' && sig(p, 5) == 't' && sig(p, 6) == 'y' && sig(p, 7) == 'p'

    // Hoisted off the per-row decode path (decodeMedia runs per row in
    // mapPartitions; a per-call Set allocation there is setup cost the
    // batching design exists to avoid).
    private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

    /** Real MP4 container-header parse (ISO/IEC 14496-12 box grammar —
      * public spec, no codec involved): a bounded recursive walk over
      * the box tree collecting
      *   - `moov/mvhd`   → movie timescale + duration → duration_ms,
      *   - `trak/tkhd`   → presentation width/height (16.16 fixed),
      *   - `trak/mdia/hdlr` = 'vide' gates which track counts as the
      *     video track (audio tracks carry 0×0 in tkhd, but the
      *     handler is the spec'd discriminator, not a heuristic),
      *   - its `stbl/stts` → Σ sample_count = video frame count.
      * O(header) like the WAV branch: only box headers and the few
      * leaf payloads above are read; sample DATA (`mdat`) is skipped
      * by size. Every read is bounds-checked and the recursion is
      * depth-capped, so a truncated/adversarial payload returns None
      * (→ stub) instead of throwing or spinning.
      */
    private[graft] def decodeMp4(payload: Array[Byte]): Option[(Int, Int, Int, Long)] =
      if (!isMp4(payload)) None
      else try {
        def i32(off: Int): Long =
          if (off + 4 > payload.length) -1L
          else ((payload(off) & 0xffL) << 24) | ((payload(off + 1) & 0xffL) << 16) |
            ((payload(off + 2) & 0xffL) << 8) | (payload(off + 3) & 0xffL)
        def i64(off: Int): Long =
          if (off + 8 > payload.length) -1L else (i32(off) << 32) | i32(off + 4)
        def typ(off: Int): String =
          if (off + 4 > payload.length) ""
          else new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

        var timescale = 0L; var duration = -1L
        var width = 0; var height = 0; var frames = 0L; var gotVideo = false
        // Per-trak state: tkhd dims + hdlr verdict + stts count are
        // only committed to the result when the handler says 'vide'
        // (first video track wins). The walk must NOT abort once a
        // video trak commits: ISO 14496-12 does not mandate child
        // order inside moov, and some muxers write mvhd AFTER the
        // traks — aborting there would lose the timescale and degrade
        // a valid file to the stub. The full walk stays O(header);
        // mdat is skipped by size either way.
        var trakW = 0; var trakH = 0; var trakFrames = 0L; var trakVide = false

        def walk(start: Long, end: Long, depth: Int): Unit = {
          var off = start
          while (depth < 8 && off + 8 <= end) {
            var size = i32(off.toInt)
            var hdr = 8L
            if (size == 1) { size = i64(off.toInt + 8); hdr = 16L }
            else if (size == 0) size = end - off // box runs to end
            // Overflow-safe bounds check: `off + size > end` wraps when a
            // crafted 64-bit largesize is near Long.MaxValue (off + size
            // goes negative, the guard passes, and off.toInt truncation
            // would re-read from the start of the payload — an infinite
            // walk). `end - off` is non-negative here (loop invariant
            // off + 8 <= end), so comparing size against it cannot wrap.
            if (size < hdr || size > end - off) return // corrupt: stop this level
            val t = typ(off.toInt + 4)
            val body = off + hdr
            t match {
              case c if Containers.contains(c) =>
                if (c == "trak") { trakW = 0; trakH = 0; trakFrames = 0L; trakVide = false }
                walk(body, off + size, depth + 1)
                if (c == "trak" && trakVide && !gotVideo && trakW > 0 && trakH > 0) {
                  width = trakW; height = trakH; frames = trakFrames; gotVideo = true
                }
              case "mvhd" =>
                val v = sig(payload, body.toInt)
                if (v == 1) { timescale = i32(body.toInt + 20); duration = i64(body.toInt + 24) }
                else { timescale = i32(body.toInt + 12); duration = i32(body.toInt + 16) }
                // All-ones duration is the spec's "unknown" sentinel.
                // For v0 that is 32-bit all-ones (0xFFFFFFFF); for v1 it
                // is 64-bit all-ones, already covered by the -1L check —
                // a v1 duration of exactly 4294967295 ticks is a
                // legitimate value and must NOT be degraded to unknown.
                if (duration == -1L || (v == 0 && duration == 0xFFFFFFFFL)) duration = -1L
              case "tkhd" =>
                val v = sig(payload, body.toInt)
                // width/height are 16.16 fixed point at the end of the
                // box: v0 layout puts them 76/80 bytes in, v1 88/92.
                val wOff = body.toInt + (if (v == 1) 88 else 76)
                trakW = (i32(wOff) >> 16).toInt
                trakH = (i32(wOff + 4) >> 16).toInt
              case "hdlr" =>
                trakVide = typ(body.toInt + 8) == "vide"
              case "stts" =>
                // Entries bound by THIS box's end (off + size), not the
                // parent's: a lying entry_count must not read siblings.
                val n = i32(body.toInt + 4)
                var k = 0; var sum = 0L
                while (k < n && body + 8 + k * 8 + 4 <= off + size) {
                  sum += i32((body + 8 + k * 8).toInt); k += 1
                }
                trakFrames = sum
              case _ => () // mdat, free, ftyp, udta... skipped by size
            }
            off += size
          }
        }
        walk(0L, payload.length.toLong, 0)
        // Overflow guard: an adversarial 64-bit v1 duration near
        // 2^63/1000 would wrap duration * 1000 negative.
        if (!gotVideo || timescale <= 0 || duration < 0 ||
          duration > Long.MaxValue / 1000) None
        else Some((width, height, frames.min(Int.MaxValue.toLong).toInt,
          duration * 1000 / timescale))
      } catch { case _: Exception => None }

    /** Unified dispatch: which decoder ran ("image" / "audio" /
      * "video" / "other"-stub) plus that decoder's real features.
      * Field layout documented on [[MediaFeatures]].
      */
    private[graft] def decodeMedia(payload: Array[Byte])
        : (String, Int, Int, Int, Int, Int, Long) =
      decodeImage(payload) match {
        case Some(img) => ("image", img.getWidth, img.getHeight, 1, 0, 0, 0L)
        case None =>
          decodeWav(payload) match {
            case Some((rate, ch, frames, durMs)) =>
              ("audio", 0, 0, frames, rate, ch, durMs)
            case None =>
              decodeMp4(payload) match {
                case Some((w, h, nf, durMs)) =>
                  ("video", w, h, nf, 0, 0, durMs)
                case None =>
                  val (w, h, f) = stub(payload)
                  ("other", w, h, f, 0, 0, 0L)
              }
          }
      }
  }

  /** documents.text → media frame: payload = utf-8 bytes, metadata
    * carried alongside. Narrow projection, no shuffle.
    */
  def mediaFrame(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"),
        col("n_chars").cast("long").as("n_chars"))

  /** Production loader: media objects from a filesystem / object
    * store via Spark's `binaryFile` source — schema `(path,
    * modificationTime, length, content)`, with `pathGlobFilter` /
    * recursive lookup available as reader options. Mapped into the
    * same MediaItem frame the documents-derived fixture uses, so the
    * decode pipeline is source-agnostic: id = 60-bit hash of the
    * object path (deterministic, join-stable), mime sniffed from the
    * extension. At 100 TB this scan parallelizes per object like any
    * file source; `spark.sql.files.maxPartitionBytes` bounds task
    * input as usual (large media files land one-per-task).
    */
  def mediaFrameFromBinaryFiles(spark: SparkSession, pathGlob: String): DataFrame = {
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    val mime = when(ext === "png", "image/png")
      .when(ext === "jpg" || ext === "jpeg", "image/jpeg")
      .when(ext === "wav", "audio/wav")
      .when(ext === "mp4", "video/mp4")
      .when(ext === "txt", "text/plain")
      .otherwise("application/octet-stream")
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        graft.functions.TextFns.hash60(col("path")).as("id"),
        col("content").as("payload"),
        mime.as("mime"),
        col("length").as("n_chars"))
  }

  /** Per-partition batched decode: one decoder per partition,
    * streamed iterator (no materialization of the whole partition).
    */
  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val (kind, w, h, f, rate, ch, durMs) = Decoder.decodeMedia(m.payload)
        val checksum = m.payload.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
        MediaFeatures(m.id, m.payload.length, checksum, kind, w, h, f, rate, ch, durMs)
      }
    }
  }

  /** Typed end-to-end: frame → Dataset[MediaItem] → decode. */
  def features(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    decodeFeatures(mediaFrame(spark, sfDir).as[MediaItem])
  }

  final case class ResizedItem(id: Long, payload: Array[Byte], width: Int, height: Int)
  final case class MediaEmbedding(id: Long, embedding: Array[Float])

  /** Resize: REAL raster scaling for decodable image payloads —
    * decode, `Graphics2D.drawImage` onto a w×h canvas with bilinear
    * interpolation, re-encode as PNG — so the output payload is a
    * true image whose decoded dimensions are exactly (w, h). Payloads
    * no image codec handles (text, audio, video) keep the
    * deterministic truncate/pad stub: payload size exactly w*h bytes.
    * Shape contract either way: one output row per input row, decoded
    * (or declared) dimensions = (w, h), corrupt media degrades rather
    * than killing the partition.
    */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[ResizedItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val out = Decoder.decodeImage(m.payload) match {
          case Some(img) =>
            val dst = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          case None => java.util.Arrays.copyOf(m.payload, w * h)
        }
        ResizedItem(m.id, out, w, h)
      }
    }
  }

  /** Feature extraction: fixed `dim`-bucket float histogram,
    * L1-normalized — over DECODED PIXEL luminance (ITU-R BT.601
    * integer weights) for image payloads, over raw bytes otherwise —
    * a deterministic stand-in for a vision encoder that nonetheless
    * sees real pixel space: the same image re-encoded (PNG vs BMP)
    * embeds identically, which a byte histogram cannot do. Output
    * plugs directly into the Similarity operators (same
    * `array<float>` shape as `embeddings.embedding`), so media
    * near-dup mining runs through the exact ANN path text embeddings
    * use.
    */
  def embed(items: Dataset[MediaItem], dim: Int = 16): Dataset[MediaEmbedding] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        // Counts accumulate in Long, not Float: a 36 MPix mostly-uniform
        // image (well under the 64 MPix bomb guard) puts >2^24 pixels in
        // one bucket, where `+= 1f` silently stops counting and the L1
        // norm drifts below 1.
        val hist = new Array[Long](dim)
        val n = Decoder.decodeImage(m.payload) match {
          case Some(img) =>
            val w = img.getWidth
            // Row-bulk getRGB: one ColorModel conversion per row into a
            // reused buffer instead of a per-pixel getRGB(x, y) call —
            // identical ARGB values, ~an order of magnitude less call
            // overhead on the per-row hot path.
            val row = new Array[Int](w)
            var y = 0
            while (y < img.getHeight) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val rgb = row(x)
                val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                  114 * (rgb & 0xff)) / 1000
                hist(lum * dim / 256) += 1L
                x += 1
              }
              y += 1
            }
            w.toLong * img.getHeight
          case None =>
            m.payload.foreach(b => hist((b & 0xff) % dim) += 1L)
            m.payload.length.toLong
        }
        val denom = math.max(1L, n).toDouble
        MediaEmbedding(m.id, hist.map(c => (c / denom).toFloat))
      }
    }
  }

  /** SQL-expressible metadata extraction over the binary payload:
    * byte length, md5, and 3 sampled "frames" (fixed-offset 32-byte
    * windows — the frame-sampling access pattern without a codec).
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val n = length(col("text"))
    def frame(k: Int) =
      col("text").substr(lit(1) + floor(n / lit(4)).cast("int") * k, lit(32))
    mediaFrame(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select(col("doc_id").as("id"), col("text")), Seq("id"))
      .select(
        col("id"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        md5(frame(0).cast("binary")).as("frame0_md5"),
        md5(frame(1).cast("binary")).as("frame1_md5"),
        md5(frame(2).cast("binary")).as("frame2_md5"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (mediaMeta _))

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       md5(text) AS payload_md5,
        |       md5(substr(text, 1, 32)) AS frame0_md5,
        |       md5(substr(text, 1 + (length(text) // 4), 32)) AS frame1_md5,
        |       md5(substr(text, 1 + (length(text) // 4) * 2, 32)) AS frame2_md5
        |FROM documents ORDER BY id""".stripMargin)
}
