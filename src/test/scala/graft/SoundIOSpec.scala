package graft

import org.scalatest.funsuite.AnyFunSuite
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem, UnsupportedAudioFileException}
import graft.multimodal.SoundIO

/** SoundIO is AudioSystem with the SPI provider lookup hoisted to
  * once-per-JVM (optimization round 18): every byte and every decoded
  * value must be identical to the AudioSystem path it replaced. */
class SoundIOSpec extends AnyFunSuite {

  private def wav(ns: Int, rate: Float, channels: Int): (Array[Byte], Array[Byte]) = {
    val pcm = Array.tabulate(ns * 2 * channels)(i => ((i * 31 + 7) % 251).toByte)
    def enc(write: (AudioInputStream, AudioFileFormat.Type, java.io.ByteArrayOutputStream) => Any): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val out = new java.io.ByteArrayOutputStream()
      write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    (enc(AudioSystem.write), enc(SoundIO.write))
  }

  test("write: bytes identical to AudioSystem.write for mono and stereo") {
    for ((ns, rate, ch) <- Seq((48, 8000f, 1), (96, 12000f, 1), (64, 16000f, 2))) {
      val (jdk, ours) = wav(ns, rate, ch)
      assert(jdk.sameElements(ours), s"ns=$ns rate=$rate ch=$ch")
    }
  }

  test("read: format and stream bytes identical to AudioSystem") {
    val (bytes, _) = wav(80, 8000f, 1)
    val fJdk = AudioSystem.getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
    val fOurs = SoundIO.getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
    assert(fJdk.getFormat.toString === fOurs.getFormat.toString)
    assert(fJdk.getFrameLength === fOurs.getFrameLength)
    val sJdk = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes)).readAllBytes()
    val sOurs = SoundIO.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes)).readAllBytes()
    assert(sJdk.sameElements(sOurs))
  }

  test("read: undecodable bytes fail with UnsupportedAudioFileException, stream-position safe") {
    val junk = Array.tabulate(64)(i => (i * 13).toByte)
    intercept[UnsupportedAudioFileException] {
      SoundIO.getAudioInputStream(new java.io.ByteArrayInputStream(junk))
    }
    intercept[UnsupportedAudioFileException] {
      SoundIO.getAudioFileFormat(new java.io.ByteArrayInputStream(junk))
    }
  }

  test("write: concurrent encodes stay bit-exact (the contended path)") {
    val expected = wav(48, 12000f, 1)._1
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((1 to 64).map(_ => Future(wav(48, 12000f, 1)._2))),
      1.minute)
    results.foreach(r => assert(r.sameElements(expected)))
  }
}
