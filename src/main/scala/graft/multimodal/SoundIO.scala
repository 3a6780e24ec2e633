package graft.multimodal

import java.io.{InputStream, OutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioInputStream, UnsupportedAudioFileException}
import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

/** `javax.sound.sampled.AudioSystem` front door with the provider lookup
  * hoisted to once per JVM.
  *
  * Why this exists (optimization guide §4.5 "initialise heavyweight state
  * once per task, not per row"): every `AudioSystem.getAudioInputStream` /
  * `getAudioFileFormat` / `write` call re-runs
  * `JDK13Services.getProviders`, which takes a JVM-global class lock and
  * re-instantiates every SPI provider. Under `local[32]` with one tiny WAV
  * per row, the executor threads serialize on that lock — JFR on
  * q104_audio_resample recorded >10k `JavaMonitorEnter` events of ~20 ms
  * each on exactly that monitor, ~5 s of a 6.9 s query. Caching the
  * provider list removes the lock from the per-row path while keeping the
  * REAL JDK codecs (same `WaveFileReader`/`WaveFileWriter` classes parse
  * and emit the bytes, so output is bit-identical to `AudioSystem`).
  *
  * The dispatch loops mirror `AudioSystem`'s exactly: try each reader,
  * treat `UnsupportedAudioFileException` as "next provider"; pick the
  * first writer that supports the file type. Provider instances are
  * stateless by SPI contract, so sharing them across threads is safe.
  */
object SoundIO {
  // JDK-PROVIDERS-ONLY assumption, on purpose: loading against
  // AudioSystem's (platform) classloader resolves exactly the JDK's
  // built-in codecs, while AudioSystem/JDK13Services itself resolves via
  // the thread context classloader — an application-classpath SPI codec
  // (e.g. an mp3/vorbis provider jar) would be visible to AudioSystem
  // but NOT here. No such provider ships in this build, so dispatch is
  // bit-identical; if one is ever added, switch to
  // Thread.currentThread().getContextClassLoader (falling back to the
  // platform loader) and re-pin SoundIOSpec's provider-set assertion.
  private def providers[T](cls: Class[T]): List[T] = {
    val it = java.util.ServiceLoader
      .load(cls, classOf[javax.sound.sampled.AudioSystem].getClassLoader)
      .iterator()
    val b = List.newBuilder[T]
    while (it.hasNext) b += it.next()
    b.result()
  }
  /** Readers in cheap-first order. The JDK's MIDI-bridge reader
    * (`SoftMidiAudioFileReader`) calls `MidiSystem.getSequence` per
    * attempt, which re-enters the same synchronized provider lookup this
    * object exists to avoid — JFR showed it re-serializing the decode
    * path after the first fix. Every reader accepts only its own magic
    * number, so formats are disjoint and trying the MIDI bridge last
    * cannot change which reader succeeds, only what a failed probe
    * costs. */
  private lazy val readers: List[AudioFileReader] = {
    val (midi, rest) =
      providers(classOf[AudioFileReader])
        .partition(_.getClass.getName.toLowerCase.contains("midi"))
    rest ++ midi
  }
  private lazy val writers: List[AudioFileWriter] =
    providers(classOf[AudioFileWriter])

  /** `AudioSystem.getAudioFileFormat(InputStream)` without the per-call
    * provider lookup. The stream must support mark/reset (providers
    * rewind it on failure), which every call site satisfies with a
    * `ByteArrayInputStream`. */
  def getAudioFileFormat(stream: InputStream): AudioFileFormat = {
    readers.foreach { r =>
      try return r.getAudioFileFormat(stream)
      catch { case _: UnsupportedAudioFileException => () }
    }
    throw new UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  /** `AudioSystem.getAudioInputStream(InputStream)` without the per-call
    * provider lookup. */
  def getAudioInputStream(stream: InputStream): AudioInputStream = {
    readers.foreach { r =>
      try return r.getAudioInputStream(stream)
      catch { case _: UnsupportedAudioFileException => () }
    }
    throw new UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  /** `AudioSystem.write(AudioInputStream, Type, OutputStream)` without the
    * per-call provider lookup. */
  def write(stream: AudioInputStream, fileType: AudioFileFormat.Type,
      out: OutputStream): Int = {
    writers.foreach { w =>
      if (w.isFileTypeSupported(fileType, stream))
        return w.write(stream, fileType, out)
    }
    throw new IllegalArgumentException(
      s"could not write audio file: file type not supported: $fileType")
  }
}
