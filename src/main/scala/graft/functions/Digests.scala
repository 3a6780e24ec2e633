package graft.functions

/** Shared md5-hex helper for the hash-based operators (MinHashSignature,
  * KMVSketch): one thread-local MessageDigest (no per-row provider
  * lookup), one lowercase-hex encoding.
  */
object Digests {
  private val HEX = "0123456789abcdef".toCharArray
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Thread-local digest, reset and ready to use. */
  def md5(): java.security.MessageDigest = {
    val md = local.get(); md.reset(); md
  }

  def toHex(dig: Array[Byte]): String = {
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = HEX((dig(b) >> 4) & 0xf)
      hex(2 * b + 1) = HEX(dig(b) & 0xf)
      b += 1
    }
    new String(hex)
  }

  def md5Hex(s: String): String = toHex(md5().digest(s.getBytes("UTF-8")))
}
