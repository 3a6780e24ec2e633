package graft.multimodal

/** POSIX ustar tar codec — self-written walker + writer for the
  * archive format multimodal training data actually ships in: the
  * WebDataset convention (one tar shard = a stream of samples, each
  * sample = consecutive members sharing a key prefix, e.g.
  * `00042.jpg` + `00042.txt` + `00042.json`) is the de-facto layout
  * for image-text corpora, because tar members stream sequentially —
  * no random access, no index — which is exactly what a 1000-executor
  * sequential shard read wants. Public spec: POSIX.1-1988 ustar; the
  * WebDataset convention is documented by the webdataset project.
  *
  * What parses for REAL with zero dependencies: the 512-byte header
  * blocks (name, octal size/mtime, typeflag, ustar magic), the header
  * CHECKSUM (sum of header bytes with the chksum field blanked —
  * verified on every member), data-block padding arithmetic, and the
  * two-zero-block end marker. Member payloads are returned as byte
  * slices; pairing members into samples is the consumer's relational
  * job ([[Multimodal.webdatasetSamplesBatched]]).
  *
  * Like every codec here, malformed bytes throw
  * `IllegalArgumentException` naming the doc id — a corrupt size
  * field, bad checksum or truncated member can never hang the walk or
  * return garbage. */
object TarCodec {

  /** Mimes this codec owns ([[Multimodal]] dispatch). */
  val Mimes: Set[String] = Set("application/x-tar")

  val BlockSize = 512

  case class Member(name: String, size: Int, typeflag: Char,
      data: Array[Byte])

  // ------------------------------------------------------------- writer

  /** Write one ustar archive: a header block + padded data blocks per
    * member, then the two-zero-block end marker. */
  def encode(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(members.nonEmpty, "tar needs at least one member")
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      require(name.getBytes("US-ASCII").length <= 100,
        s"member name '$name' exceeds the 100-byte ustar name field")
      val h = new Array[Byte](BlockSize)
      // `full = true` for the name field only: ustar allows a
      // non-NUL-terminated name filling all 100 bytes (parse()'s cstr
      // stops at the field limit); every other field needs its NUL.
      def put(s: String, off: Int, len: Int, full: Boolean = false): Unit = {
        val b = s.getBytes("US-ASCII")
        require(if (full) b.length <= len else b.length < len,
          s"field '$s' overflows $len bytes")
        System.arraycopy(b, 0, h, off, b.length)
      }
      put(name, 0, 100, full = true)
      put("0000644", 100, 8) // mode
      put("0000000", 108, 8) // uid
      put("0000000", 116, 8) // gid
      put(f"${data.length}%011o", 124, 12)
      put("00000000000", 136, 12) // mtime: epoch (deterministic)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces
      h(156) = '0' // typeflag: regular file
      put("ustar", 257, 6)
      h(263) = '0'; h(264) = '0' // version "00"
      var sum = 0
      var i = 0
      while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
      val cs = f"$sum%06o".getBytes("US-ASCII")
      System.arraycopy(cs, 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      val pad = (BlockSize - data.length % BlockSize) % BlockSize
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BlockSize))
    out.toByteArray
  }

  // ------------------------------------------------------------- walker

  /** Walk one archive member by member, verifying every header
    * checksum. O(members) header reads + one slice per payload. */
  def parse(docId: Long, bytes: Array[Byte]): IndexedSeq[Member] = {
    require(bytes.length % BlockSize == 0,
      s"doc $docId: tar length ${bytes.length} is not block-aligned")
    val out = scala.collection.mutable.ArrayBuffer[Member]()
    var o = 0
    var ended = false
    while (!ended) {
      require(o + BlockSize <= bytes.length,
        s"doc $docId: tar truncated at offset $o (no end marker)")
      if (bytes.slice(o, o + BlockSize).forall(_ == 0)) {
        require(o + 2 * BlockSize <= bytes.length &&
            bytes.slice(o + BlockSize, o + 2 * BlockSize).forall(_ == 0),
          s"doc $docId: tar has a single zero block at $o, not the " +
            "two-block end marker")
        ended = true
      } else {
        val name = cstr(bytes, o, 100)
        require(cstr(bytes, o + 257, 6).startsWith("ustar"),
          s"doc $docId: member '$name' at $o lacks the ustar magic")
        val size = octal(docId, name, bytes, o + 124, 12)
        val stored = octal(docId, name, bytes, o + 148, 8)
        var sum = 0
        var i = 0
        while (i < BlockSize) {
          sum += (if (i >= 148 && i < 156) ' '.toInt
            else bytes(o + i) & 0xff)
          i += 1
        }
        require(sum == stored,
          s"doc $docId: member '$name' header checksum mismatch " +
            s"($sum != $stored)")
        val dataAt = o + BlockSize
        require(size >= 0 && dataAt + size.toLong <= bytes.length,
          s"doc $docId: member '$name' data overruns the archive")
        val typeflag = (bytes(o + 156) & 0xff).toChar
        out += Member(name, size,
          if (typeflag == 0) '0' else typeflag,
          java.util.Arrays.copyOfRange(bytes, dataAt, dataAt + size))
        val blocks = (size + BlockSize - 1) / BlockSize
        o = dataAt + blocks * BlockSize
      }
    }
    require(out.nonEmpty, s"doc $docId: tar archive has no members")
    out.toIndexedSeq
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var e = off
    val lim = off + len
    while (e < lim && b(e) != 0) e += 1
    new String(b, off, e - off, "US-ASCII")
  }

  private def octal(docId: Long, name: String, b: Array[Byte], off: Int,
      len: Int): Int = {
    var v = 0L
    var i = off
    val lim = off + len
    while (i < lim && b(i) == ' ') i += 1 // tolerate leading-space padding
    while (i < lim && b(i) != 0 && b(i) != ' ') {
      require(b(i) >= '0' && b(i) <= '7',
        s"doc $docId: member '$name' has a non-octal size/chksum digit")
      v = v * 8 + (b(i) - '0')
      require(v <= Int.MaxValue,
        s"doc $docId: member '$name' octal field overflows")
      i += 1
    }
    v.toInt
  }
}
