package graft.multimodal

/** WebVTT subtitle codec — self-written parser + writer for the W3C
  * WebVTT format (the caption format of the open web: every HTML5
  * `<track>` and most HLS caption renditions). In a multimodal
  * training pipeline subtitles are the TEXT SIDE of video-text pairs:
  * cues carry `(start, end, text)`, and aligning them to sampled
  * frames turns one video into supervised (frame, caption) examples —
  * the alignment query (q154) is exactly that join.
  *
  * What parses for REAL with zero dependencies: the `WEBVTT` magic,
  * blank-line-separated cue blocks, optional numeric cue identifiers,
  * and the `HH:MM:SS.mmm --> HH:MM:SS.mmm` timing line (the MM:SS.mmm
  * short form too), multi-line cue payloads. Malformed bytes throw
  * `IllegalArgumentException` naming the doc id — a negative or
  * reversed timing line is a parse error, never a silent empty cue. */
object VttCodec {

  /** Mimes this codec owns ([[Multimodal]] dispatch). */
  val Mimes: Set[String] = Set("text/vtt")

  case class Cue(idx: Int, startMs: Long, endMs: Long, text: String)

  // ------------------------------------------------------------- writer

  /** Render cues as one WebVTT file (numeric identifiers, full
    * HH:MM:SS.mmm timestamps). */
  def encode(cues: Seq[Cue]): String = {
    require(cues.nonEmpty, "VTT needs at least one cue")
    val sb = new StringBuilder("WEBVTT\n")
    cues.foreach { c =>
      sb ++= "\n"
      sb ++= s"${c.idx}\n"
      sb ++= s"${ts(c.startMs)} --> ${ts(c.endMs)}\n"
      sb ++= s"${c.text}\n"
    }
    sb.toString
  }

  private def ts(ms: Long): String = {
    val h = ms / 3600000; val m = (ms / 60000) % 60
    val s = (ms / 1000) % 60; val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d.$f%03d"
  }

  // ------------------------------------------------------------- parser

  /** Parse one WebVTT file into cues. Line-based single pass. */
  def parse(docId: Long, vtt: String): IndexedSeq[Cue] = {
    val lines = vtt.split("\n", -1)
    require(lines.nonEmpty && lines(0).startsWith("WEBVTT"),
      s"doc $docId: payload lacks the WEBVTT magic")
    val out = scala.collection.mutable.ArrayBuffer[Cue]()
    var i = 1
    var autoIdx = 0
    while (i < lines.length) {
      // skip blank separators
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        // optional identifier line (no "-->"), then the timing line
        var idLine: Option[String] = None
        if (!lines(i).contains("-->")) {
          idLine = Some(lines(i).trim)
          i += 1
          require(i < lines.length && lines(i).contains("-->"),
            s"doc $docId: cue block at line $i has no timing line")
        }
        val timing = lines(i).trim
        val parts = timing.split("-->")
        require(parts.length == 2,
          s"doc $docId: malformed timing line '$timing'")
        val start = parseTs(docId, parts(0).trim)
        val end = parseTs(docId, parts(1).trim.split("\\s+")(0))
        require(end > start,
          s"doc $docId: cue timing '$timing' is empty or reversed")
        i += 1
        val body = new StringBuilder()
        while (i < lines.length && lines(i).trim.nonEmpty) {
          if (body.nonEmpty) body ++= "\n"
          body ++= lines(i)
          i += 1
        }
        require(body.nonEmpty, s"doc $docId: cue at '$timing' has no text")
        autoIdx += 1
        val idx = idLine.flatMap(s => scala.util.Try(s.toInt).toOption)
          .getOrElse(autoIdx)
        out += Cue(idx, start, end, body.toString)
      }
    }
    require(out.nonEmpty, s"doc $docId: VTT file has no cues")
    out.toIndexedSeq
  }

  /** `HH:MM:SS.mmm` or the short `MM:SS.mmm` form → milliseconds. */
  def parseTs(docId: Long, s: String): Long = {
    val m = "^(?:(\\d+):)?(\\d{2}):(\\d{2})\\.(\\d{3})$".r
      .findFirstMatchIn(s).getOrElse(throw new IllegalArgumentException(
        s"doc $docId: malformed VTT timestamp '$s'"))
    val h = Option(m.group(1)).map(_.toLong).getOrElse(0L)
    val mm = m.group(2).toLong; val ss = m.group(3).toLong
    require(mm < 60 && ss < 60, s"doc $docId: out-of-range timestamp '$s'")
    ((h * 60 + mm) * 60 + ss) * 1000 + m.group(4).toLong
  }
}
