package graft

import graft.multimodal.ZipCodec
import org.scalatest.funsuite.AnyFunSuite

/** ZIP codec: roundtrip over both methods, end-record discovery under a
  * trailing comment, and loud refusal of every corruption class the
  * walker claims to catch. */
class ZipCodecSpec extends AnyFunSuite {

  private def m(name: String, text: String, method: Int) =
    (name, text.getBytes("US-ASCII"), method)

  test("stored + deflated members roundtrip byte-for-byte in directory order") {
    val members = Seq(
      m("a.txt", "alpha beta gamma delta epsilon zeta", ZipCodec.MethodDeflate),
      m("a.cls", "en", ZipCodec.MethodStored),
      m("b.txt", "x" * 5000, ZipCodec.MethodDeflate), // compressible run
      m("empty.txt", "", ZipCodec.MethodDeflate),
      m("empty2.txt", "", ZipCodec.MethodStored))
    val got = ZipCodec.parse(7L, ZipCodec.encode(members))
    assert(got.map(_.name) == members.map(_._1).toIndexedSeq)
    assert(got.map(_.method) == members.map(_._3).toIndexedSeq)
    got.zip(members).foreach { case (g, (_, data, _)) =>
      assert(g.size == data.length)
      assert(g.data.toSeq == data.toSeq)
    }
    // deflate actually compressed the run (not stored under another name)
    assert(ZipCodec.encode(members).length <
      members.map(_._2.length).sum)
  }

  test("end record is found through a trailing archive comment") {
    val bytes = ZipCodec.encode(Seq(m("a.txt", "hello", ZipCodec.MethodStored)))
    val comment = "trailing shard comment".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, bytes.length - 2) // drop the zero comment_len
    out.write(comment.length & 0xff); out.write(0)
    out.write(comment)
    val got = ZipCodec.parse(1L, out.toByteArray)
    assert(got.map(_.name) == IndexedSeq("a.txt"))
    assert(new String(got.head.data, "US-ASCII") == "hello")
  }

  test("corruption classes fail loudly with the doc id") {
    val good = ZipCodec.encode(Seq(
      m("a.txt", "some payload bytes here", ZipCodec.MethodDeflate),
      m("b.txt", "second member", ZipCodec.MethodStored)))
    def corrupt(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // flip a payload byte (first member's deflate data, after the
    // 30-byte local header + 5-byte name) -> CRC or inflate failure
    val e1 = intercept[IllegalArgumentException] {
      ZipCodec.parse(42L, corrupt(b => b(38) = (b(38) ^ 0x5a).toByte))
    }
    assert(e1.getMessage.contains("42"))
    // break the local signature
    val e2 = intercept[IllegalArgumentException] {
      ZipCodec.parse(43L, corrupt(b => b(0) = 0))
    }
    assert(e2.getMessage.contains("43"))
    // truncate the end record away
    val e3 = intercept[IllegalArgumentException] {
      ZipCodec.parse(44L, good.take(good.length - 4))
    }
    assert(e3.getMessage.contains("end-of-central-directory"))
    // set the data-descriptor flag in the first central entry
    val cd = {
      // locate the central directory via the (intact) end record
      val e = good.length - 22
      ((good(e + 16) & 0xff) | ((good(e + 17) & 0xff) << 8) |
        ((good(e + 18) & 0xff) << 16) | ((good(e + 19) & 0xff) << 24))
    }
    val e4 = intercept[IllegalArgumentException] {
      ZipCodec.parse(45L, corrupt(b => b(cd + 8) = 0x08))
    }
    assert(e4.getMessage.contains("data descriptor"))
  }
}
