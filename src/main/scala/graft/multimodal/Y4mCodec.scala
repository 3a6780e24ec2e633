package graft.multimodal

/** YUV4MPEG2 (`.y4m`) container codec — self-written walker + writer
  * for the raw-video interchange format (public spec: the mjpegtools
  * `yuv4mpeg(5)` man page; ffmpeg's `yuv4mpegpipe` muxer is the common
  * producer). The format is a plain-ASCII stream header
  *
  * {{{ YUV4MPEG2 W<w> H<h> F<num>:<den> [I...] [A...] [C<space>] \n }}}
  *
  * followed by frames, each a `FRAME[ params]\n` marker and then the
  * UNCOMPRESSED planar pixel data whose size is fixed by the header's
  * geometry and colorspace. Zero entropy coding anywhere, so the whole
  * container decodes with no codec library — after AVI (q110) and MP4
  * (q115) this is the next container a real multimodal ingest hits
  * (lossless video interchange between tools). Two properties make it
  * the cheapest member of the video family at scale:
  *
  *  - frame `k` is at a CLOSED-FORM offset (header + k·(marker+planes))
  *    once the first frame's marker length is known — the walk below
  *    still validates every marker, but a trusted re-read can seek;
  *  - luma is NATIVE: the Y plane IS the mean-pool input, so feature
  *    extraction does zero RGB→luma conversion per pixel.
  *
  * Like [[AviCodec]]/[[Mp4Codec]], malformed bytes throw
  * `IllegalArgumentException` with the doc id (never hang or return
  * garbage), and parsing never touches pixel bytes — only
  * [[frameLumaGrid]] does, for exactly the frames a sampler asks for. */
object Y4mCodec {

  /** Mimes this codec owns ([[Multimodal]] dispatch). */
  val Mimes: Set[String] = Set("video/x-yuv4mpeg", "video/y4m")

  /** Parsed stream facts + the byte offset of each frame's plane data
    * (markers validated; pixel bytes untouched). */
  case class Container(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      colorspace: String, frameOffsets: IndexedSeq[Int]) {
    def nFrames: Int = frameOffsets.size
  }

  /** Plane bytes per frame — the layout table from the yuv4mpeg spec.
    * All C420 variants share sizes (they differ only in chroma siting). */
  def frameBytes(docId: Long, cs: String, w: Int, h: Int): Int = cs match {
    case "C420" | "C420jpeg" | "C420mpeg2" | "C420paldv" =>
      w * h + 2 * ((w / 2) * (h / 2))
    case "C422" => w * h + 2 * ((w / 2) * h)
    case "C444" => w * h * 3
    case "Cmono" => w * h
    case other => throw new IllegalArgumentException(
      s"doc $docId: unsupported Y4M colorspace '$other'")
  }

  private val Magic = "YUV4MPEG2"
  private val MaxLine = 256 // sane bound on any header/FRAME line

  /** Index of the first '\n' in [from, from+MaxLine) — loud on a
    * missing terminator (a truncated header must throw, not scan 100 MB). */
  private def lineEnd(docId: Long, bytes: Array[Byte], from: Int): Int = {
    var i = from
    val lim = math.min(bytes.length, from + MaxLine)
    while (i < lim && bytes(i) != '\n') i += 1
    require(i < lim, s"doc $docId: Y4M header line unterminated")
    i
  }

  /** Parse the stream header and walk every FRAME marker. One pass of
    * header reads; O(nFrames) marker validations; zero plane reads. */
  def parse(docId: Long, bytes: Array[Byte]): Container = {
    require(bytes.length >= Magic.length + 1 &&
        new String(bytes, 0, Magic.length,
          java.nio.charset.StandardCharsets.US_ASCII) == Magic,
      s"doc $docId: payload is not a YUV4MPEG2 stream")
    val hEnd = lineEnd(docId, bytes, 0)
    val header = new String(bytes, 0, hEnd,
      java.nio.charset.StandardCharsets.US_ASCII)
    var w = 0; var h = 0; var fn = 0; var fd = 0; var cs = "C420"
    header.split(' ').drop(1).filter(_.nonEmpty).foreach { tag =>
      def intOf(s: String, what: String): Int =
        try s.toInt catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"doc $docId: bad Y4M $what '$s'") }
      tag.charAt(0) match {
        case 'W' => w = intOf(tag.tail, "width")
        case 'H' => h = intOf(tag.tail, "height")
        case 'F' =>
          val parts = tag.tail.split(':')
          require(parts.length == 2, s"doc $docId: bad Y4M frame rate '$tag'")
          fn = intOf(parts(0), "fps numerator")
          fd = intOf(parts(1), "fps denominator")
        case 'C' => cs = tag
        case _ => () // I (interlace), A (aspect), X (vendor): not load-bearing
      }
    }
    require(w > 0 && h > 0, s"doc $docId: Y4M header missing W/H geometry")
    require(fn > 0 && fd > 0, s"doc $docId: Y4M header missing F frame rate")
    if (cs != "Cmono")
      require(w % 2 == 0 && h % 2 == 0,
        s"doc $docId: chroma-subsampled Y4M needs even geometry, got ${w}x$h")
    val fb = frameBytes(docId, cs, w, h)
    val offs = scala.collection.mutable.ArrayBuffer[Int]()
    var o = hEnd + 1
    while (o < bytes.length) {
      require(o + 5 <= bytes.length &&
          new String(bytes, o, 5,
            java.nio.charset.StandardCharsets.US_ASCII) == "FRAME",
        s"doc $docId: Y4M frame ${offs.size} has no FRAME marker")
      val mEnd = lineEnd(docId, bytes, o)
      val data = mEnd + 1
      require(data + fb.toLong <= bytes.length,
        s"doc $docId: Y4M frame ${offs.size} planes overrun the payload")
      offs += data
      o = data + fb
    }
    require(offs.nonEmpty, s"doc $docId: Y4M stream has no frames")
    Container(w, h, fn, fd, cs, offs.toIndexedSeq)
  }

  /** Mean-pool one frame's NATIVE luma (Y) plane onto a `g`×`g` grid —
    * same exact integer statistics as
    * [[Multimodal.ImageIoCodec.lumaGridWH]] (floor cell bounds, integer
    * sum, one final division) so a relational oracle reproduces the
    * floats bit-for-bit; chroma planes are never read. */
  def frameLumaGrid(docId: Long, bytes: Array[Byte], c: Container,
      frameIdx: Int, g: Int): Array[Float] = {
    require(frameIdx >= 0 && frameIdx < c.nFrames,
      s"doc $docId: Y4M frame $frameIdx out of ${c.nFrames}")
    val base = c.frameOffsets(frameIdx)
    val w = c.width; val h = c.height
    require(w >= g && h >= g,
      s"doc $docId: frame ${w}x$h smaller than the ${g}x$g pooling grid")
    val out = new Array[Float](g * g)
    var i = 0
    while (i < g) {
      val y0 = i * h / g; val y1 = (i + 1) * h / g
      var j = 0
      while (j < g) {
        val x0 = j * w / g; val x1 = (j + 1) * w / g
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += bytes(base + y * w + x) & 0xff; x += 1 }
          y += 1
        }
        out(i * g + j) = sum.toFloat / ((y1 - y0) * (x1 - x0))
        j += 1
      }
      i += 1
    }
    out
  }

  /** Write a YUV4MPEG2 stream: header + `FRAME\n` + the given planes
    * (each frame's bytes must match the colorspace's plane layout). */
  def encode(frames: Seq[Array[Byte]], w: Int, h: Int,
      fpsNum: Int, fpsDen: Int, colorspace: String = "C420"): Array[Byte] = {
    require(frames.nonEmpty, "Y4M stream needs at least one frame")
    val fb = frameBytes(-1L, colorspace, w, h)
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == fb,
        s"frame $i has ${f.length} plane bytes, $colorspace ${w}x$h needs $fb")
    }
    val header = s"$Magic W$w H$h F$fpsNum:$fpsDen Ip A1:1 $colorspace\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.size * (marker.length + fb))
    out.write(header)
    frames.foreach { f => out.write(marker); out.write(f) }
    out.toByteArray
  }
}
