package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal._

/** Pins the multimodal surface: schema/encoder round-trip, partition
  * batching, plan math, and the REAL per-modality decoders — ImageIO
  * pixels, javax.sound PCM audio, MJPEG frame pixels in AVI and MP4
  * (RIFF walk / ISO BMFF sample-table walk), and the pure-JVM MP4 box
  * parser — each against a generated fixture with known ground truth.
  * Only non-MJPEG video codecs (H.264 etc.) remain metadata+fingerprint
  * (no such codec in a bare JVM).
  */
class MultimodalSpec extends SparkSpec {

  /** 1 s of 440 Hz half-amplitude sine, 16-bit mono PCM at 8 kHz,
    * wrapped as a WAV by the JVM's own writer.
    */
  private def sineWav(rate: Int = 8000, amp: Double = 0.5): Array[Byte] = {
    val n = rate
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Minimal valid ISO BMFF tree: ftyp + moov(mvhd, trak(tkhd)). */
  private def miniMp4(w: Int, h: Int, timescale: Int,
      duration: Int): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      java.nio.ByteBuffer.allocate(body.length + 8)
        .putInt(body.length + 8).put(typ.getBytes("ISO-8859-1")).put(body)
        .array()
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0)           // version 0 + flags
      b.putInt(0).putInt(0) // ctime, mtime
      b.putInt(timescale).putInt(duration)
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0)                                         // v0 + flags
      b.putInt(0).putInt(0).putInt(1).putInt(0).putInt(0) // times/id/dur
      b.position(b.position() + 16 + 36)                  // reserved+matrix
      b.putInt(w << 16).putInt(h << 16)                   // 16.16 fixed
      box("tkhd", b.array())
    }
    box("ftyp", "isomisom".getBytes("ISO-8859-1")) ++
      box("moov", mvhd ++ box("trak", tkhd))
  }

  /** ISO BMFF file with real JPEG samples (MJPEG-in-MP4): ftyp +
    * mdat(concatenated JPEGs) + moov(mvhd, trak(tkhd, mdia(mdhd,
    * minf(stbl(stsd `codec`, stsz, stsc, stco))))). All samples live
    * in one chunk at the known mdat body offset; per-sample sizes in
    * stsz — the exact tables decodeMp4Mjpeg walks.
    */
  private def miniMp4Mjpeg(frames: Seq[java.awt.image.BufferedImage],
      timescale: Int, duration: Int,
      codec: String = "jpeg"): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      java.nio.ByteBuffer.allocate(body.length + 8)
        .putInt(body.length + 8).put(typ.getBytes("ISO-8859-1")).put(body)
        .array()
    val jpegs = frames.map { img =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val ftyp = box("ftyp", "isomisom".getBytes("ISO-8859-1"))
    val mdat = box("mdat", jpegs.toArray.flatten)
    val firstSampleOff = ftyp.length + 8 // mdat body starts after its header
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(timescale).putInt(duration)
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0)
      b.putInt(0).putInt(0).putInt(1).putInt(0).putInt(0)
      b.position(b.position() + 16 + 36)
      b.putInt(w << 16).putInt(h << 16)
      box("tkhd", b.array())
    }
    val mdhd = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(timescale).putInt(duration).putInt(0)
      box("mdhd", b.array())
    }
    val stsd = {
      // VisualSampleEntry: 86 bytes — header(8) + reserved/dataref(8) +
      // predefined/reserved(16) + w/h(4) + res/framecount/name/depth(50)
      val e = java.nio.ByteBuffer.allocate(86)
      e.putInt(86).put(codec.getBytes("ISO-8859-1"))
      e.position(16 + 16)
      e.putShort(w.toShort).putShort(h.toShort)
      val b = java.nio.ByteBuffer.allocate(8 + 86)
      b.putInt(0).putInt(1).put(e.array())
      box("stsd", b.array())
    }
    val stsz = {
      val b = java.nio.ByteBuffer.allocate(12 + 4 * jpegs.length)
      b.putInt(0).putInt(0).putInt(jpegs.length)
      jpegs.foreach(j => b.putInt(j.length))
      box("stsz", b.array())
    }
    val stsc = {
      val b = java.nio.ByteBuffer.allocate(20)
      b.putInt(0).putInt(1)
      b.putInt(1).putInt(jpegs.length).putInt(1)
      box("stsc", b.array())
    }
    val stco = {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(0).putInt(1).putInt(firstSampleOff)
      box("stco", b.array())
    }
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
    val trak = box("trak",
      tkhd ++ box("mdia", mdhd ++ box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd ++ trak)
  }

  /** Minimal RIFF/AVI wrapping real JPEG frames (MJPEG): hdrl(avih
    * with dwMicroSecPerFrame) + movi(00dc chunks), even-padded.
    */
  private def miniAviMjpeg(frames: Seq[java.awt.image.BufferedImage],
      usPerFrame: Long): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad: Array[Byte] =
        if (body.length % 2 == 1) Array(0.toByte) else Array.empty
      id.getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("ISO-8859-1") ++ body)
    val avih = chunk("avih", le32(usPerFrame) ++ new Array[Byte](52))
    val dcs = frames.toArray.flatMap { img =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      chunk("00dc", bos.toByteArray)
    }
    val body = "AVI ".getBytes("ISO-8859-1") ++ list("hdrl", avih) ++
      list("movi", dcs)
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body
  }

  /** AVI with UNCOMPRESSED (BI_RGB) frames: a vids strh + a
    * BITMAPINFOHEADER strf in the header list, raw padded BGR rows as
    * `00db` chunks — the layout decodeAviMjpeg's DIB fallback reads.
    */
  private def miniAviDib(w: Int, h: Int, grays: Seq[Int],
      usPerFrame: Long): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad: Array[Byte] =
        if (body.length % 2 == 1) Array(0.toByte) else Array.empty
      id.getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("ISO-8859-1") ++ body)
    val avih = chunk("avih", le32(usPerFrame) ++ new Array[Byte](52))
    val strh = chunk("strh",
      "vids".getBytes("ISO-8859-1") ++ new Array[Byte](52))
    val stride = ((w * 3 + 3) / 4) * 4
    val strf = chunk("strf",
      le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++
        le16(24) ++ le32(0L) ++ le32(stride.toLong * h) ++
        new Array[Byte](16))
    val dbs = grays.toArray.flatMap { g =>
      val body = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        body(y * stride + x * 3 + c) = g.toByte
      chunk("00db", body)
    }
    val body = "AVI ".getBytes("ISO-8859-1") ++
      list("hdrl", avih ++ list("strl", strh ++ strf)) ++ list("movi", dbs)
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body
  }

  private def grayFrame(w: Int, h: Int, gray: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  private lazy val media = {
    implicit val s = spark
    import s.implicits._
    // payloads built from documents text bytes — opaque binary as far
    // as the pipeline is concerned
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    asMedia(docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "video")
        .when(col("doc_id") % 3 === 1, "image").otherwise("audio").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      map(lit("source"), col("source")).as("meta")))
  }

  test("binary media round-trips through the typed Dataset") {
    implicit val s = spark
    val first = media.filter(_.media_id == 0).head()
    assert(first.kind == "video")
    assert(first.payload.length > 0)
    assert(first.meta("source").startsWith("src"))
  }

  test("extractFeatures: batched decode emits fixed-dim deterministic features") {
    val f1 = extractFeatures(media, dim = 16, batchSize = 8).collect()
      .sortBy(_.media_id)
    val f2 = extractFeatures(media, dim = 16, batchSize = 3).collect()
      .sortBy(_.media_id)
    assert(f1.length == 50)
    assert(f1.forall(_.features.length == 16))
    // batch size must not change results — batching is an execution
    // detail, not a semantic one
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.features.toSeq == b.features.toSeq)
    }
    assert(f1.forall(f => f.width >= 16 && f.height >= 16))
    assert(f1.forall(_.n_bytes > 0))
  }

  test("real PNG decodes via ImageIO: true dimensions + luminance histogram") {
    implicit val s = spark
    import s.implicits._
    // 32x16: left half pure red, right half pure white
    val img = new java.awt.image.BufferedImage(32, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0xff0000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val ds = asMedia(Seq((1L, "image", png, Map("f" -> "fixture.png")))
      .toDF("media_id", "kind", "payload", "meta"))
    val f = extractFeatures(ds, dim = 16).head()
    assert(f.width == 32 && f.height == 16)
    assert(f.n_bytes == png.length)
    // red: lum = .299*255 = 76.2 → bin 4; white: 255 → bin 15; half each
    assert(math.abs(f.features(4) - 0.5f) < 1e-6)
    assert(math.abs(f.features(15) - 0.5f) < 1e-6)
    assert(math.abs(f.features.sum - 1.0f) < 1e-5)
  }

  test("real WAV decodes via javax.sound: frames, channels, duration, RMS") {
    implicit val s = spark
    import s.implicits._
    val wav = sineWav()
    val ds = asMedia(Seq((3L, "audio", wav, Map("f" -> "tone.wav")))
      .toDF("media_id", "kind", "payload", "meta"))
    val f = extractFeatures(ds, dim = 8).head()
    assert(f.width == 8000)      // sample frames (1 s at 8 kHz)
    assert(f.height == 1)        // mono
    assert(math.abs(f.duration_s - 1.0f) < 1e-3)
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ≈ 0.3536, per segment
    val want = 0.5 / math.sqrt(2)
    f.features.foreach(v => assert(math.abs(v - want) < 0.01, v))
  }

  test("real MP4 metadata parses from the box tree") {
    val meta = Multimodal.parseMp4Meta(miniMp4(640, 360, 1000, 5000)).get
    assert(meta.width == 640 && meta.height == 360)
    assert(meta.timescale == 1000L && meta.durationTicks == 5000L)
    assert(math.abs(meta.durationS - 5.0f) < 1e-6)
    // non-BMFF bytes must not parse
    assert(Multimodal.parseMp4Meta("certainly not an mp4".getBytes).isEmpty)
  }

  test("video rows get real container dims/duration; frames follow them") {
    implicit val s = spark
    import s.implicits._
    val mp4 = miniMp4(1280, 720, 600, 1800) // 3 s at timescale 600
    val ds = asMedia(Seq((4L, "video", mp4, Map.empty[String, String]))
      .toDF("media_id", "kind", "payload", "meta"))
    val feats = extractFeatures(ds, dim = 8)
    val f = feats.head()
    assert(f.width == 1280 && f.height == 720)
    assert(math.abs(f.duration_s - 3.0f) < 1e-6)
    // 3 s at 10 fps, stride 10 → frames 0, 10, 20
    val idxs = frameSamplePlanTimed(feats, fps = 10, stride = 10)
      .select("frame_idx").as[Int].collect().sorted
    assert(idxs.toSeq == Seq(0, 10, 20))
  }

  test("real MJPEG-MP4 frames decode to pixels via the sample tables") {
    // 4 frames: black, black, white, white — mdhd says 2 s
    val frames = Seq(0, 0, 255, 255).map(grayFrame(24, 18, _))
    val mp4 = miniMp4Mjpeg(frames, timescale = 1000, duration = 2000)
    val d = Multimodal.decodeMp4Mjpeg(mp4, dim = 2).get
    assert(d.width == 24 && d.height == 18)
    assert(math.abs(d.durationS - 2.0f) < 1e-3)
    assert(d.features(0) < 0.1f, d.features(0))
    assert(d.features(1) > 0.9f, d.features(1))
    // the frame cap samples evenly and still decodes
    val many = miniMp4Mjpeg(Seq(0, 0, 0, 0, 255, 255, 255, 255)
      .map(grayFrame(16, 12, _)), 1000, 4000)
    val capped = Multimodal.decodeMp4Mjpeg(many, dim = 2, maxFrames = 4).get
    assert(capped.features(0) < 0.1f && capped.features(1) > 0.9f)
    // non-BMFF bytes must not parse
    assert(Multimodal.decodeMp4Mjpeg("not an mp4".getBytes, 2).isEmpty)
  }

  test("non-MJPEG MP4s keep the declared metadata + fingerprint fallback") {
    // same tables, but the stsd entry names a codec the JVM can't
    // decode — the MJPEG path must refuse, and decodeVideo must fall
    // back to box-tree metadata with fingerprint features
    val frames = Seq(0, 255).map(grayFrame(24, 18, _))
    val avc = miniMp4Mjpeg(frames, 1000, 2000, codec = "avc1")
    assert(Multimodal.decodeMp4Mjpeg(avc, 2).isEmpty)
    val d = Multimodal.decodeVideo(avc, 2).get
    assert(d.width == 24 && d.height == 18) // tkhd dims still real
    // fingerprint features, not a luminance envelope: must match the
    // stub's deterministic bytes-derived vector
    assert(d.features.sameElements(Multimodal.decodeStub(avc, 2).features))
  }

  test("real MJPEG-AVI frames decode to pixels: dims, duration, luminance envelope") {
    // 4 frames: black, black, white, white — 250 ms each → 1 s total
    val frames = Seq(0, 0, 255, 255).map(grayFrame(24, 18, _))
    val avi = miniAviMjpeg(frames, usPerFrame = 250000L)
    val d = Multimodal.decodeAviMjpeg(avi, dim = 2).get
    assert(d.width == 24 && d.height == 18)
    assert(math.abs(d.durationS - 1.0f) < 1e-3)
    // envelope halves: dark run then bright run (JPEG is lossy; wide bands)
    assert(d.features(0) < 0.1f, d.features(0))
    assert(d.features(1) > 0.9f, d.features(1))
    // non-AVI bytes must not parse
    assert(Multimodal.decodeAviMjpeg("not an avi at all".getBytes, 2).isEmpty)
  }

  test("uncompressed-DIB AVI frames decode to exact pixel luminance") {
    // 5×3 frames at gray 0, 51, 255 — no codec loss on the DIB path,
    // so the envelope is EXACT (gray/255), unlike the JPEG-lossy bands
    val avi = miniAviDib(5, 3, Seq(0, 51, 255), usPerFrame = 200000L)
    val d = Multimodal.decodeAviMjpeg(avi, dim = 3).get
    assert(d.width == 5 && d.height == 3) // from the strf header
    assert(math.abs(d.durationS - 0.6f) < 1e-3)
    assert(math.abs(d.features(0) - 0.0f) < 1e-6)
    assert(math.abs(d.features(1) - 0.2f) < 1e-6)
    assert(math.abs(d.features(2) - 1.0f) < 1e-6)
    // a declared-compressed stream must NOT hit the raw-DIB reader:
    // flipping biCompression to non-zero makes the same bytes undecodable
    val idx = {
      val hay = avi.indexOfSlice("strf".getBytes("ISO-8859-1"))
      hay + 8 + 16 // biCompression offset inside BITMAPINFOHEADER
    }
    val bad = avi.clone(); bad(idx) = 1.toByte
    assert(Multimodal.decodeAviMjpeg(bad, 3).isEmpty)
  }

  test("AVI video rows route through the pixel decoder in extractFeatures") {
    implicit val s = spark
    import s.implicits._
    val avi = miniAviMjpeg(Seq(128, 128).map(grayFrame(20, 10, _)), 100000L)
    val ds = asMedia(Seq((7L, "video", avi, Map.empty[String, String]))
      .toDF("media_id", "kind", "payload", "meta"))
    val f = extractFeatures(ds, dim = 4).head()
    assert(f.width == 20 && f.height == 10)
    assert(math.abs(f.duration_s - 0.2f) < 1e-3)
    // mid-gray frames → envelope near 0.5 everywhere (JPEG-lossy band)
    f.features.foreach(v => assert(math.abs(v - 0.5f) < 0.1f, v))
  }

  test("animated GIF decodes every frame; stills stay on the image path") {
    def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null),
          null)
      }
      writer.endWriteSequence()
      writer.dispose()
      ios.close()
      bos.toByteArray
    }
    val gif = animatedGif(Seq(0, 0, 255, 255).map(grayFrame(16, 12, _)))
    val d = Multimodal.decodeGifAnimation(gif, dim = 2).get
    assert(d.width == 16 && d.height == 12)
    // GIF palette quantization is loose; the dark/bright split must hold
    assert(d.features(0) < 0.2f, d.features(0))
    assert(d.features(1) > 0.8f, d.features(1))
    // a single-frame GIF is a still — the image path owns it
    val still = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(grayFrame(8, 8, 128), "gif", bos)
      bos.toByteArray
    }
    assert(Multimodal.decodeGifAnimation(still, 2).isEmpty)
    assert(Multimodal.decodeImage(still, 4).isDefined)

    // the PIPELINE path: .gif ingests as kind "image" (readMediaDir
    // extension map) — extractFeatures must still give an animated gif
    // the multi-frame envelope, not the first-frame still decode
    implicit val s = spark
    import s.implicits._
    val ds = asMedia(Seq(
        (9L, "image", gif, Map.empty[String, String]),
        (10L, "image", still, Map.empty[String, String]))
      .toDF("media_id", "kind", "payload", "meta"))
    val fs = extractFeatures(ds, dim = 2).collect()
      .map(f => f.media_id -> f).toMap
    assert(fs(9L).features(0) < 0.2f && fs(9L).features(1) > 0.8f,
      "animated gif lost its frame envelope on the image path")
    assert(fs(10L).width == 8 && fs(10L).height == 8)
  }

  test("frame sampling cap bounds per-row decode cost, evenly spread") {
    val frames = (0 until 12).map(i => grayFrame(8, 8, i * 20))
    val avi = miniAviMjpeg(frames, usPerFrame = 50000L)
    val capped = Multimodal.decodeAviMjpeg(avi, dim = 3, maxFrames = 4).get
    // duration still reflects ALL container frames, not just decoded ones
    assert(math.abs(capped.durationS - 0.6f) < 1e-3)
    // envelope must still be monotone increasing (frames brighten)
    assert(capped.features(0) < capped.features(1))
    assert(capped.features(1) < capped.features(2))
  }

  test("undecodable image bytes fall back to the deterministic stub") {
    implicit val s = spark
    import s.implicits._
    val ds = asMedia(Seq((2L, "image", "not an image".getBytes, Map.empty[String, String]))
      .toDF("media_id", "kind", "payload", "meta"))
    val f = extractFeatures(ds, dim = 8).head()
    assert(f.features.length == 8) // stub path, still total
  }

  test("resizePlan: longest side clamped, aspect preserved, no upscale") {
    val plan = resizePlan(extractFeatures(media), maxSide = 64).collect()
    plan.foreach { r =>
      val (w, h) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(w <= 64 && h <= 64)
      assert(r.getAs[Double]("scale") <= 1.0)
    }
  }

  test("frameSamplePlan: only video rows, stride honored, frame 0 present") {
    val frames = frameSamplePlan(media, stride = 4)
    val byId = frames.collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1)
    assert(byId.nonEmpty)
    byId.values.foreach { fs =>
      val idxs = fs.map(_._2).sorted
      assert(idxs.head == 0)
      assert(idxs.forall(_ % 4 == 0))
    }
    assert(byId.keys.forall(_ % 3 == 0)) // only the video kind
  }

  test("readMediaDir ingests a directory via binaryFile with glob pruning") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("mediadir")
    def writePng(name: String, w: Int, h: Int): Unit = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val f = dir.resolve(name)
      java.nio.file.Files.createDirectories(f.getParent)
      javax.imageio.ImageIO.write(img, "png", f.toFile)
    }
    writePng("a.png", 8, 4)
    writePng("shard1/b.png", 5, 7) // nested: recursiveFileLookup path
    java.nio.file.Files.write(dir.resolve("notes.txt"),
      "not an image".getBytes)
    try {
      val all = Multimodal.readMediaDir(spark, dir.toString)
      assert(all.count() == 3)
      val kinds = all.collect().map(m =>
        m.meta("path").split('/').last -> m.kind).toMap
      assert(kinds("a.png") == "image" && kinds("notes.txt") == "binary")

      // glob prunes at listing level: only the PNGs are read
      val pngs = Multimodal.readMediaDir(spark, dir.toString, "*.png")
      val feats = extractFeatures(pngs, dim = 8).collect()
        .map(f => f.media_id -> ((f.width, f.height))).toMap
      assert(feats.size == 2)
      assert(feats.values.toSet == Set((8, 4), (5, 7)))
      // media ids are stable across re-ingests (path-keyed hash)
      val again = Multimodal.readMediaDir(spark, dir.toString, "*.png")
        .collect().map(_.media_id).toSet
      assert(again == feats.keySet)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("dHash: gradient structure survives brightness shift; patterns differ") {
    implicit val s = spark
    import spark.implicits._
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gradient(w: Int, h: Int, base: Int, flip: Boolean)
        : java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val t = if (flip) w - 1 - x else x
        val g = math.min(255, base + t * 200 / w)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val items = Seq(
      Multimodal.MediaItem(1L, "image", png(gradient(64, 32, 10, false)),
        Map.empty),
      // same structure, globally brighter → same gradient signs
      Multimodal.MediaItem(2L, "image", png(gradient(64, 32, 40, false)),
        Map.empty),
      // mirrored gradient → opposite signs, far in hamming
      Multimodal.MediaItem(3L, "image", png(gradient(64, 32, 10, true)),
        Map.empty),
      // undecodable → null hash
      Multimodal.MediaItem(4L, "image", Array[Byte](1, 2, 3), Map.empty)
    ).toDS()
    val hashes = Multimodal.imageDHashes(items)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hashes(4L).isEmpty, "undecodable payload must hash to null")
    val Seq(h1, h2, h3) = Seq(1L, 2L, 3L).map(hashes(_).get)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2) <= 3, s"brightness shift moved dHash ${ham(h1, h2)}")
    assert(ham(h1, h3) > 16, s"mirrored image too close: ${ham(h1, h3)}")

    // end-to-end: fingerprint pairing finds the perceptual pair only
    val pairs = Dedup.fingerprintNearDupPairs(
        Multimodal.imageDHashes(items), "media_id", "dhash", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"$pairs")
  }

  test("syntheticImageCorpus: decoded dHash equals the analytic " +
      "ground truth for every id (the q224 bridge)") {
    // the whole point of the corpus: PNG encode → imageio decode →
    // 9×8 pooling → dHash must read the planted bits back VERBATIM,
    // making the SQL-arithmetic oracle a true end-to-end check
    val n = 60
    val got = Multimodal.imageDHashes(
        Multimodal.syntheticImageCorpus(spark, n))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    (0L until n).foreach { id =>
      assert(got(id) == Multimodal.groundTruthHash(id),
        s"id $id: decoded ${got(id).toHexString} != " +
          s"analytic ${Multimodal.groundTruthHash(id).toHexString}")
    }
    // planted triple structure: member 1 is hamming-1 from member 0,
    // member 2 is 32 bits away, bit 63 never set
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0L until n by 3).foreach { base =>
      assert(ham(got(base), got(base + 1)) == 1)
      assert(ham(got(base), got(base + 2)) == 32)
      assert(got(base) >= 0L, "bit 63 must stay clear")
    }
  }

  test("syntheticAudioCorpus: decoded audio fingerprint equals the " +
      "analytic ground truth for every id (the q228 bridge)") {
    // WAV encode → javax.sound decode → mono mix → 65-segment RMS →
    // delta-sign fingerprint must read the planted bits back VERBATIM
    import spark.implicits._
    val n = 60
    val got = Multimodal.audioFingerprints(
        Multimodal.syntheticAudioCorpus(spark, n))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    (0L until n).foreach { id =>
      assert(got(id) == Multimodal.groundTruthHash(id),
        s"id $id: decoded ${got(id).toHexString} != " +
          s"analytic ${Multimodal.groundTruthHash(id).toHexString}")
    }
    // same planted triple structure as the image corpus, and the
    // pairing finds exactly the hamming-1 member per triple
    val pairs = Dedup.fingerprintNearDupPairs(
        Multimodal.audioFingerprints(
          Multimodal.syntheticAudioCorpus(spark, n)),
        "media_id", "afp", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == (0L until n by 3).map(b => (b, b + 1)).toSet, s"$pairs")
  }

  test("syntheticVideoCorpus: decoded video fingerprint equals the " +
      "analytic ground truth for every id (the q229 bridge)") {
    // RIFF walk → DIB luminance → 65-segment envelope → delta-sign
    // fingerprint must read the planted bits back VERBATIM
    import spark.implicits._
    val n = 60
    val got = Multimodal.videoFingerprints(
        Multimodal.syntheticVideoCorpus(spark, n))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    (0L until n).foreach { id =>
      assert(got(id) == Multimodal.groundTruthHash(id),
        s"id $id: decoded ${got(id).toHexString} != " +
          s"analytic ${Multimodal.groundTruthHash(id).toHexString}")
    }
    val pairs = Dedup.fingerprintNearDupPairs(
        Multimodal.videoFingerprints(
          Multimodal.syntheticVideoCorpus(spark, n)),
        "media_id", "vfp", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == (0L until n by 3).map(b => (b, b + 1)).toSet, s"$pairs")
  }

  test("syntheticGifCorpus: decoded GIF fingerprint equals the " +
      "analytic ground truth for every id (the q233 bridge)") {
    // JVM GIF encoder → ImageReader frame walk → mean luminance →
    // envelope → delta-sign fingerprint must read the planted bits
    // back VERBATIM (GIF palettes are lossless for constant frames)
    import spark.implicits._
    val n = 60
    val got = Multimodal.videoFingerprints(
        Multimodal.syntheticGifCorpus(spark, n))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    (0L until n).foreach { id =>
      assert(got(id) == Multimodal.groundTruthHash(id),
        s"id $id: decoded ${got(id).toHexString} != " +
          s"analytic ${Multimodal.groundTruthHash(id).toHexString}")
    }
    val pairs = Dedup.fingerprintNearDupPairs(
        Multimodal.videoFingerprints(
          Multimodal.syntheticGifCorpus(spark, n)),
        "media_id", "vfp", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == (0L until n by 3).map(b => (b, b + 1)).toSet, s"$pairs")
  }

  test("syntheticMp4Corpus: production box walk reads the analytic " +
      "dims/timescale/duration back for every id (the q235 bridge)") {
    // hand-built ftyp/moov/mvhd/trak/tkhd trees through
    // extractFeatures → decodeVideo → parseMp4Meta: the v0/v1 mvhd
    // layouts, the 64-bit moov header (ids ≡ 0 mod 3), the 16.16
    // fixed-point dims and the leading 0×0 audio-track skip (odd ids)
    // must all read back verbatim
    val n = 60
    val got = Multimodal.extractFeatures(
        Multimodal.syntheticMp4Corpus(spark, n))
      .collect().map(f => f.media_id -> f).toMap
    assert(got.size == n)
    (0L until n).foreach { id =>
      val f = got(id)
      val ts = 600L * (1 + id % 5)
      val dur = ts * (1 + id % 29) + (id % 97)
      assert(f.width == 16 + (id % 31).toInt * 8, s"id $id width")
      assert(f.height == 16 + (id % 23).toInt * 8, s"id $id height")
      assert(f.duration_s == (dur.toDouble / ts).toFloat, s"id $id dur")
    }
    // malformed/truncated bytes must parse to None, not throw: the
    // corpus generator's own output truncated mid-moov falls back to
    // the stub decoder (duration 0) rather than erroring
    import spark.implicits._
    val broken = Multimodal.groundTruthMp4(7L).take(40)
    val brokenDf = Seq((99L, "video", broken, Map.empty[String, String]))
      .toDF("media_id", "kind", "payload", "meta")
    val stub = Multimodal.extractFeatures(
      Multimodal.asMedia(brokenDf)(spark)).collect().head
    assert(stub.duration_s == 0f)
  }

  /** Amplitude-modulated sine (the envelope carries the content): a
    * flat tone has a featureless RMS envelope, so the fingerprint
    * tests modulate loudness at `modHz` and vary only `gain` for the
    * "same content, different level" pair.
    */
  private def modWav(gain: Double, modHz: Double,
      rate: Int = 8000): Array[Byte] = {
    val n = rate
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val t = i.toDouble / rate
      val env = 0.55 + 0.45 * math.sin(2 * math.Pi * modHz * t)
      val s = (math.sin(2 * math.Pi * 440 * t) * env * gain * 32767).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio fingerprint: gain-invariant, content-sensitive, null on " +
      "undecodable") {
    import spark.implicits._
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val a = Multimodal.audioFingerprint64(modWav(gain = 0.9, modHz = 3)).get
    val b = Multimodal.audioFingerprint64(modWav(gain = 0.45, modHz = 3)).get
    val c = Multimodal.audioFingerprint64(modWav(gain = 0.9, modHz = 7)).get
    // half the gain, same loudness SHAPE → near-identical delta signs
    assert(hamming(a, b) <= 4, s"gain changed the fingerprint: ${hamming(a, b)}")
    // different modulation → mostly different delta signs
    assert(hamming(a, c) > 10, s"contents collide: ${hamming(a, c)}")
    assert(Multimodal.audioFingerprint64("nope".getBytes).isEmpty)

    // end-to-end: the pigeonhole pairing finds the gain pair only
    val items = Seq(
      Multimodal.MediaItem(1L, "audio", modWav(0.9, 3), Map.empty),
      Multimodal.MediaItem(2L, "audio", modWav(0.45, 3), Map.empty),
      Multimodal.MediaItem(3L, "audio", modWav(0.9, 7), Map.empty),
      Multimodal.MediaItem(4L, "audio", "junk".getBytes, Map.empty))
      .toDS()
    val fps = Multimodal.audioFingerprints(items)
    assert(fps.filter(col("media_id") === 4 && col("afp").isNull).count() == 1)
    val pairs = Dedup.fingerprintNearDupPairs(fps, "media_id", "afp",
        maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"$pairs")
  }
}
