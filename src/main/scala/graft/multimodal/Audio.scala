package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio-modality plumbing, mirroring the image path's split
  * ([[Multimodal.ImageIoCodec]] / [[Multimodal.FakeCodec]]):
  *
  *  - [[WavCodec]] decodes REAL audio containers via the JDK's
  *    `javax.sound.sampled` (WAV/AIFF/AU PCM — no native libs), with the
  *    same corrupt-blob degradation and decompression-bomb guard
  *    contract as the image codec;
  *  - [[RawPcm16]] is the oracle-hashable twin: the payload bytes ARE
  *    the stream — 16-bit little-endian signed mono PCM — so a SQL
  *    engine can recompute every sample from hex digit pairs and the
  *    catalog rows hash cross-engine (the fixtures are text-derived
  *    blobs, not audio, exactly like the image rows).
  *
  * Feature extraction is the classic VAD front-end as EXACT INTEGER
  * suffstats: per-frame energy Σ s² over fixed-size frames (BIGINT —
  * ≤ 64·32768² ≈ 7e10 per frame, no float accumulation anywhere), then
  * silence segmentation with an ADAPTIVE threshold — a frame is silent
  * iff its per-sample energy is below 1/4 of the doc's mean per-sample
  * energy, evaluated as a BIGINT cross-multiplication
  * (energy·n_total·4 < total_energy·n_frame), the standard
  * relative-energy VAD rule with zero rounding. */
object Audio {

  /** One fixed-size PCM analysis frame: `energy_fx` = Σ s² exact. */
  case class PcmFrame(
      doc_id: Long, frame_idx: Int, n_samples: Int, energy_fx: Long)

  /** Samples per analysis frame. 64 samples = 8 ms at 8 kHz — small
    * enough that the fixtures' text-length payloads (100–750 samples)
    * yield a real multi-frame sequence per doc. */
  val FrameSize: Int = 64

  /** 16-bit LE signed mono PCM view of a raw payload — the stub codec.
    * An odd trailing byte is dropped (`n_samples = n_bytes / 2`),
    * mirroring how a real decoder truncates a short final sample. */
  object RawPcm16 {
    def samples(payload: Array[Byte]): Array[Int] = {
      val n = payload.length / 2
      val out = new Array[Int](n)
      var k = 0
      while (k < n) {
        out(k) = ((payload(2 * k) & 0xff) |
          (payload(2 * k + 1) << 8)).toShort.toInt
        k += 1
      }
      out
    }
  }

  /** REAL audio codec over the JDK's `javax.sound.sampled`. Contract
    * mirrors [[Multimodal.ImageIoCodec]]:
    *  - header metadata (rate, channels, bits, declared frame count)
    *    comes from the actual container;
    *  - an undecodable payload yields zeroed metadata rather than
    *    throwing (one corrupt blob must not kill a 100 TB decode job);
    *  - a header declaring more than [[MaxSamples]] frames is never
    *    PCM-decoded (a 44-byte WAV header can declare 2^32 frames —
    *    the audio decompression bomb); metadata is still reported and
    *    `samples` returns empty, the documented skip. */
  object WavCodec {
    /** 2^24 mono samples (~35 min at 8 kHz, 32 MB as ints) — far above
      * any legitimate training clip, far below a hostile header. */
    val MaxSamples: Long = 1L << 24

    case class AudioMeta(
        sample_rate: Int, channels: Int, bits: Int, n_samples: Long)

    /** The SPI provider lists, loaded ONCE per JVM with the plain WAV
      * reader/writer ordered FIRST. `AudioSystem.getAudioInputStream`
      * re-resolves providers per call and tries them in registry order,
      * where the non-WAV readers ahead of the match (including a
      * soft-synth MIDI reader that takes a global lock) serialize a
      * 32-thread decode stage: measured 1037 µs CPU/doc via the
      * registry vs 5 µs calling the WAV reader first (the 100× slice's
      * audio_wav_energy fell 121.7 → ~8 s). Non-WAV containers still
      * decode — they just fall through to the rest of the list. */
    private lazy val fileReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      val all = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.toVector
      val (wav, rest) =
        all.partition(_.getClass.getName.endsWith(".WaveFileReader"))
      wav ++ rest
    }
    private lazy val fileWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
      import scala.jdk.CollectionConverters._
      val all = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .asScala.toVector
      val (wav, rest) =
        all.partition(_.getClass.getName.endsWith(".WaveFileWriter"))
      wav ++ rest
    }

    /** Registry-free [[javax.sound.sampled.AudioSystem.getAudioInputStream]]:
      * same provider classes, same fall-through semantics, no per-call
      * lookup. Throws UnsupportedAudioFileException if no reader
      * accepts the payload (callers degrade, matching the contract). */
    private def openStream(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      val it = fileReaders.iterator
      while (it.hasNext) {
        val r = it.next()
        try return r.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "no installed AudioFileReader accepts this payload")
    }

    def meta(payload: Array[Byte]): AudioMeta = {
      try {
        val ais = openStream(payload)
        try {
          val f = ais.getFormat
          AudioMeta(f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, ais.getFrameLength)
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => AudioMeta(0, 0, 0, 0L) }
    }

    /** Wrap raw 16-bit LE signed mono PCM bytes into a REAL WAV
      * container via the JDK's own writer (`AudioSystem.write`) — the
      * fixture synthesizer for the real-container path: PCM-in-WAV is
      * lossless, so `samples(wrapPcm16(p))` returns exactly
      * [[RawPcm16.samples]]`(p)` (spec-pinned roundtrip), and a catalog
      * row whose payloads go through this writer + the container
      * decoder still hashes against the raw-PCM SQL oracle. An odd
      * trailing byte is dropped, mirroring [[RawPcm16]]. */
    def wrapPcm16(payload: Array[Byte], sampleRate: Float = 8000f): Array[Byte] = {
      val n = payload.length / 2
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate, 16, 1, /* signed = */ true, /* bigEndian = */ false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(payload, 0, n * 2), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream(44 + n * 2)
      // the WAVE writer from the hoisted provider list (same class
      // AudioSystem.write dispatches to, minus the per-call registry)
      val tpe = javax.sound.sampled.AudioFileFormat.Type.WAVE
      val w = fileWriters
        .find(_.isFileTypeSupported(tpe, ais))
        .getOrElse(throw new IllegalStateException("no WAVE writer installed"))
      try w.write(ais, tpe, out)
      finally ais.close()
      out.toByteArray
    }

    /** First-channel PCM samples as ints (16-bit LE signed or 8-bit
      * unsigned-centered, the two javax.sound PCM encodings); empty on
      * corrupt or bomb-flagged payloads. */
    def samples(payload: Array[Byte]): Array[Int] = {
      try {
        val ais = openStream(payload)
        try {
          val f = ais.getFormat
          val frames = ais.getFrameLength
          if (frames < 0 || frames > MaxSamples || f.getChannels < 1)
            return Array.empty
          val bytesPerFrame = f.getFrameSize
          val buf = ais.readNBytes((frames * bytesPerFrame).toInt)
          val n = buf.length / bytesPerFrame
          val out = new Array[Int](n)
          val sixteen = f.getSampleSizeInBits == 16
          val big = f.isBigEndian
          var k = 0
          while (k < n) {
            val o = k * bytesPerFrame // first channel only
            out(k) =
              if (sixteen) {
                if (big) (((buf(o) << 8) | (buf(o + 1) & 0xff)).toShort).toInt
                else (((buf(o) & 0xff) | (buf(o + 1) << 8)).toShort).toInt
              } else (buf(o) & 0xff) - 128
            k += 1
          }
          out
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => Array.empty }
    }
  }

  /** Per-partition frame-energy kernel over an arbitrary sample
    * extractor — ONE pass per payload, exact BIGINT energies, no
    * shuffle (frames are emitted doc-local). */
  def frameEnergies(
      media: Dataset[Multimodal.MediaRecord],
      extract: Array[Byte] => Array[Int] = RawPcm16.samples,
      frameSize: Int = FrameSize): Dataset[PcmFrame] = {
    import media.sparkSession.implicits._
    require(frameSize >= 1, "frameSize must be >= 1")
    media.mapPartitions { it =>
      it.flatMap { r =>
        val s = extract(r.payload)
        val nFrames = (s.length + frameSize - 1) / frameSize
        (0 until nFrames).iterator.map { f =>
          val start = f * frameSize
          val end = math.min(s.length, start + frameSize)
          var e = 0L
          var k = start
          while (k < end) { val v = s(k).toLong; e += v * v; k += 1 }
          PcmFrame(r.doc_id, f, end - start, e)
        }
      }
    }
  }

  /** Silence segmentation over a frame table: adaptive-threshold VAD
    * (silent iff per-sample energy < 1/4 of the doc's mean), then
    * gaps-and-islands over the silent frames — all windows are
    * PARTITIONED BY doc (never global), all arithmetic BIGINT. Returns
    * one row per doc: frame/silence counts, number of contiguous
    * silent segments, and the longest one. */
  def silenceSegments(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = frames.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_frames"),
      sum(col("n_samples")).as("n_total_samples"),
      sum(col("energy_fx")).as("total_energy_fx"))
    val flagged = frames.join(totals, Seq("doc_id"))
      .withColumn("silent",
        col("energy_fx") * col("n_total_samples") * lit(4L) <
          col("total_energy_fx") * col("n_samples"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val islands = flagged.where(col("silent"))
      .withColumn("island",
        col("frame_idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_silence_segments"),
        max(col("run_len")).as("longest_silence_frames"))
    totals
      .join(flagged.where(col("silent")).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_silent")), Seq("doc_id"), "left")
      .join(islands, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_silent", "n_silence_segments", "longest_silence_frames"))
      .select(col("doc_id"), col("n_frames"), col("n_silent"),
        col("n_silence_segments"), col("longest_silence_frames"))
  }
}
