package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Audio, Multimodal}

/** Real-codec checks for the audio path (the image path's
  * MultimodalCodecSpec sibling): synthesized WAV containers through the
  * JDK javax.sound.sampled codec, the raw-PCM oracle twin, the exact
  * frame-energy kernel, and the planted-silence segmentation. */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal canonical 44-byte PCM WAV: 16-bit LE signed mono. */
  private def wav(samples: Array[Short], rate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("WavCodec.meta reads the real container header; corrupt degrades to zeros") {
    val tone = Array.tabulate[Short](400)(i =>
      (8000 * math.sin(i * 0.3)).toShort)
    val m = Audio.WavCodec.meta(wav(tone, rate = 16000))
    m.sample_rate shouldBe 16000
    m.channels shouldBe 1
    m.bits shouldBe 16
    m.n_samples shouldBe 400L
    val corrupt = Audio.WavCodec.meta("not a wav at all".getBytes)
    corrupt shouldBe Audio.WavCodec.AudioMeta(0, 0, 0, 0L)
    Audio.WavCodec.samples("junk".getBytes).length shouldBe 0
  }

  test("WavCodec.samples round-trips the PCM payload exactly") {
    val src = Array.tabulate[Short](300)(i => ((i * 131) % 30000 - 15000).toShort)
    val got = Audio.WavCodec.samples(wav(src))
    got.length shouldBe 300
    got.toSeq shouldBe src.map(_.toInt).toSeq
  }

  test("wrapPcm16: the codec's own writer emits a real container that " +
      "round-trips to RawPcm16 exactly (incl. odd trailing byte)") {
    // arbitrary bytes (not a crafted tone): text-derived payloads are
    // what the audio_wav_energy catalog row wraps
    val payload = "The quick brown fox, éèê! 0123456789"
      .getBytes("UTF-8")
    val wavBytes = Audio.WavCodec.wrapPcm16(payload)
    // it IS a container: the real header parse sees 16-bit mono PCM
    val m = Audio.WavCodec.meta(wavBytes)
    m.bits shouldBe 16
    m.channels shouldBe 1
    m.n_samples shouldBe payload.length / 2
    // lossless roundtrip: container decode == raw-PCM view of the bytes
    Audio.WavCodec.samples(wavBytes).toSeq shouldBe
      Audio.RawPcm16.samples(payload).toSeq
    // odd length drops the trailing byte on both paths
    val odd = payload.take(7)
    Audio.WavCodec.samples(Audio.WavCodec.wrapPcm16(odd)).toSeq shouldBe
      Audio.RawPcm16.samples(odd).toSeq
    // zero-sample payload degrades to an empty (but valid) container
    Audio.WavCodec.samples(Audio.WavCodec.wrapPcm16(Array[Byte](1))).length shouldBe 0
  }

  test("audio_wav_energy == audio_frame_energy (the container roundtrip " +
      "is value-transparent at catalog scale)") {
    val raw = SparkEntry.queries("audio_frame_energy")(spark, sf).collect()
    val viaWav = SparkEntry.queries("audio_wav_energy")(spark, sf).collect()
    viaWav.map(_.toString).toSeq shouldBe raw.map(_.toString).toSeq
  }

  test("bomb guard: a header declaring more than MaxSamples frames is never decoded") {
    // hand-build a header claiming 2^25 frames (64 MB of data) over a
    // 4-byte body — javax.sound would trust the header; the guard must not
    val declared = (1L << 25).toInt * 2
    val bb = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + declared)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(declared)
      .putInt(0) // 4 bytes of actual body
    Audio.WavCodec.samples(bb.array()).length shouldBe 0
  }

  test("frameEnergies: exact integer energies, dense frame indices, short tail") {
    // 130 samples -> frames of 64, 64, 2
    val s = Array.tabulate[Short](130)(i => (if (i < 64) 100 else 3).toShort)
    val pcm = s.flatMap(v => Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
    val media = Seq(Multimodal.MediaRecord(7L, pcm)).toDS()
    val got = Audio.frameEnergies(media).collect().sortBy(_.frame_idx)
    got.map(_.frame_idx).toSeq shouldBe Seq(0, 1, 2)
    got.map(_.n_samples).toSeq shouldBe Seq(64, 64, 2)
    got(0).energy_fx shouldBe 64L * 100 * 100
    got(1).energy_fx shouldBe 64L * 3 * 3
    got(2).energy_fx shouldBe 2L * 3 * 3
  }

  test("silence segmentation finds a planted silent middle through the REAL codec") {
    // tone(256) | silence(128) | tone(256): 10 frames of 64 — frames
    // 4..5 are the silent island
    val tone = (i: Int) => (6000 * math.sin(i * 0.35)).toShort
    val src: Array[Short] =
      (Array.tabulate[Short](256)(tone) ++ Array.fill[Short](128)(0) ++
        Array.tabulate[Short](256)(i => tone(i + 256)))
    val media = Seq(Multimodal.MediaRecord(1L, wav(src))).toDS()
    val frames = Audio.frameEnergies(media, Audio.WavCodec.samples).toDF()
    frames.count() shouldBe 10L
    val seg = Audio.silenceSegments(frames).collect().head
    seg.getAs[Long]("n_frames") shouldBe 10L
    seg.getAs[Long]("n_silent") shouldBe 2L
    seg.getAs[Long]("n_silence_segments") shouldBe 1L
    seg.getAs[Long]("longest_silence_frames") shouldBe 2L
  }

  test("catalog rows: frame energies reproduce from raw bytes; segments consistent") {
    val rows = SparkEntry.queries("audio_frame_energy")(spark, sf).collect()
    rows.length should be > 0
    // recompute one doc's frame-0 energy from the text bytes directly
    val doc = Tables.documents(spark, sf).orderBy(col("doc_id")).limit(1)
      .collect().head
    val bytes = doc.getAs[String]("text").getBytes("UTF-8")
    val s = Audio.RawPcm16.samples(bytes)
    val expect = s.take(64).map(v => v.toLong * v).sum
    val got = rows.find(r => r.getAs[Long]("doc_id") == doc.getAs[Long]("doc_id")
      && r.getAs[Int]("frame_idx") == 0).get
    got.getAs[Long]("energy_fx") shouldBe expect
    val segs = SparkEntry.queries("audio_silence_segments")(spark, sf).collect()
    segs.foreach { r =>
      r.getAs[Long]("n_silent") should be <= r.getAs[Long]("n_frames")
      r.getAs[Long]("longest_silence_frames") should be <= r.getAs[Long]("n_silent")
    }
  }
}
