package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}


/**
 * 11 entries: multimodal binary-column ops (q_multimodal_*) —
 * split verbatim from the former monolithic TrainingCatalog and
 * aggregated there; shared fixtures live in [[TrainingShared]].
 */
private[graft] object TrainingMultimodalEntries {
  import TrainingShared._

  val entries: Map[String, (Q, Option[String])] = Map(

    // =====================================================================
    // multimodal — q_multimodal_meta exercises the payload PLUMBING with
    // the deterministic stub; q_multimodal_decode validates the REAL
    // BMP/PNG header decoders against payloads with planted dimensions
    // =====================================================================

    // REAL decode check: BMP and PNG payloads are synthesized with
    // dimensions derived from doc_id (different formulas per format, so
    // the two decoders can't mask each other), then decoded by the pure
    // Column-algebra header parsers; the oracle states the planted
    // arithmetic. The payload-synthesis UDF is test scaffolding — the
    // decoders under test are codegen'd Column algebra, not UDFs.
    // GIF logical-screen decode: planted 87a/89a headers with id-
    // derived dims and a real global color table (3·2^bits bytes +
    // trailer), parsed by pure Column algebra; the oracle states the
    // planted arithmetic (colors = 2^(id%3+1), byte_len follows the
    // table size).
    "q_multimodal_gif" -> (q((s, dir) => {
      val mkGif = udf((id: Long) =>
        Multimodal.syntheticGif((id % 251 + 16).toInt, (id * 7 % 251 + 16).toInt,
          gctBits = (id % 3 + 1).toInt, v89 = id % 2 == 0))
      val withPayloads = docs(s, dir).select(col("doc_id"),
        mkGif(col("doc_id")).as("gif"))
      val gm = Multimodal.gifMeta(col("gif"))
      withPayloads.select(col("doc_id"),
        gm.getField("byte_len").as("byte_len"),
        gm.getField("version").as("version"),
        gm.getField("width").as("w"), gm.getField("height").as("h"),
        gm.getField("gct_colors").as("gct_colors"))
    }), Some("""
      SELECT doc_id,
             CAST(14 + 3 * power(2, doc_id % 3 + 1) AS BIGINT) AS byte_len,
             CASE WHEN doc_id % 2 = 0 THEN '89a' ELSE '87a' END AS version,
             CAST(doc_id % 251 + 16 AS INT) AS w,
             CAST(doc_id * 7 % 251 + 16 AS INT) AS h,
             CAST(power(2, doc_id % 3 + 1) AS INT) AS gct_colors
      FROM documents ORDER BY doc_id""")),

    "q_multimodal_decode" -> (q((s, dir) => {
      val mkBmp = udf((id: Long) =>
        Multimodal.syntheticBmp((id % 241 + 16).toInt, (id * 3 % 241 + 16).toInt))
      val mkPng = udf((id: Long) =>
        Multimodal.syntheticPng((id * 5 % 199 + 16).toInt, (id * 7 % 199 + 16).toInt))
      val withPayloads = docs(s, dir).select(col("doc_id"),
        mkBmp(col("doc_id")).as("bmp"), mkPng(col("doc_id")).as("png"))
      val bm = Multimodal.bmpMeta(col("bmp"))
      val pm = Multimodal.pngMeta(col("png"))
      withPayloads.select(
        col("doc_id"),
        bm.getField("width").as("bmp_w"), bm.getField("height").as("bmp_h"),
        bm.getField("channels").as("bmp_c"),
        pm.getField("width").as("png_w"), pm.getField("height").as("png_h"),
        pm.getField("channels").as("png_c"))
    }), Some("""
      SELECT doc_id,
             CAST(doc_id % 241 + 16 AS INT) AS bmp_w,
             CAST(doc_id * 3 % 241 + 16 AS INT) AS bmp_h,
             CAST(3 AS INT) AS bmp_c,
             CAST(doc_id * 5 % 199 + 16 AS INT) AS png_w,
             CAST(doc_id * 7 % 199 + 16 AS INT) AS png_h,
             CAST(3 AS INT) AS png_c
      FROM documents ORDER BY doc_id""")),
    // REAL audio-header decode: canonical WAV payloads with planted
    // rate/channels/bits/duration arithmetic, decoded by the pure
    // Column-algebra wavMeta parser (the audio sibling of the BMP/PNG
    // check above). data length = byteRate x whole seconds, so the
    // duration division is exact in both engines.
    // PERCEPTUAL image hash (aHash) with REAL decode: two-tone and
    // solid PNGs whose 8×8 area-averages are exactly one tone per cell,
    // so the 64-bit hashes are hand-derived constants (bright-left →
    // rows of 0xF0, bright-right → rows of 0x0F, solid → 0: nothing
    // exceeds the strict mean) — a wrong cell order, threshold, or
    // grayscale formula cannot pass. Near-dup pairing composes with the
    // same Hamming banding the SimHash text tier uses.
    "q_multimodal_phash" -> (q((s, dir) => {
      import s.implicits._
      val mkImg = udf((id: Long) => (id % 3) match {
        case 0 => Multimodal.syntheticHalfPng(16, 16, 200, 200, 200, 50, 50, 50)
        case 1 => Multimodal.syntheticHalfPng(16, 16, 50, 50, 50, 200, 200, 200)
        case _ => Multimodal.syntheticSolidPng(16, 16, 120, 120, 120)
      })
      val payload = docs(s, dir)
        .select(col("doc_id"), mkImg(col("doc_id")).as("png"))
        .as[(Long, Array[Byte])]
      Multimodal.aHashPartitioned(payload).toDF()
        .select(col("id").as("doc_id"), col("ahash"))
        .orderBy("doc_id")
    }), Some("""
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN CAST(-1085102592571150096 AS BIGINT)
               WHEN 1 THEN CAST(1085102592571150095 AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS ahash
      FROM documents ORDER BY doc_id""")),

    // REAL audio SAMPLE parse (not just the header): 16-bit PCM square
    // waves with doc_id-derived amplitude; pcm16Stats reads the actual
    // sample bytes and the oracle pins peak and rms to the planted
    // amplitude EXACTLY (every sample is ±A, and sqrt(A²) is correctly
    // rounded) — a wrong byte order, offset, or width cannot pass.
    "q_multimodal_audio" -> (q((s, dir) => {
      import s.implicits._
      val mkWav = udf((id: Long) => Multimodal.syntheticWavSquare(
        rate = 16000, amplitude = (1000 + (id % 7) * 2000).toShort,
        halfPeriod = (1 + id % 4).toInt, nSamples = 4800))
      val payload = docs(s, dir)
        .select(col("doc_id"), mkWav(col("doc_id")).as("wav"))
        .as[(Long, Array[Byte])]
      Multimodal.pcmStatsPartitioned(payload).toDF()
        .select(col("id").as("doc_id"), col("nSamples").as("n_samples"),
          col("peakAbs").as("peak_abs"),
          sqrt(col("sumSq").cast("double") / col("nSamples")).as("rms"))
        .orderBy("doc_id")
    }), Some("""
      SELECT doc_id, CAST(4800 AS BIGINT) AS n_samples,
             CAST(1000 + (doc_id % 7) * 2000 AS INT) AS peak_abs,
             CAST(1000 + (doc_id % 7) * 2000 AS DOUBLE) AS rms
      FROM documents ORDER BY doc_id""")),

    // REAL PCM RESAMPLE (not just a parse): 16 kHz square waves
    // linear-interpolated down to 8 kHz — the 2:1 ratio lands every
    // output position exactly on a source sample, and an even planted
    // half-period keeps the decimated stream a full-scale square wave,
    // so count/peak/rms pin EXACTLY to the planted parameters (a wrong
    // position map, interpolation weight, or output length cannot
    // pass). The fractional-weight interpolation path (rem ≠ 0) is
    // law-tested in OpsSpec on a ramp upsample where midpoints are
    // integer-exact.
    "q_multimodal_audio_resample" -> (q((s, dir) => {
      import s.implicits._
      val mkWav = udf((id: Long) => Multimodal.syntheticWavSquare(
        rate = 16000, amplitude = (1000 + (id % 7) * 2000).toShort,
        halfPeriod = (2 * (1 + id % 4)).toInt, nSamples = 4800))
      val payload = docs(s, dir)
        .select(col("doc_id"), mkWav(col("doc_id")).as("wav"))
        .as[(Long, Array[Byte])]
      Multimodal.pcmResamplePartitioned(payload, srcRate = 16000, dstRate = 8000)
        .toDF()
        .select(col("id").as("doc_id"), col("nOut").as("n_samples"),
          col("peakAbs").as("peak_abs"),
          sqrt(col("sumSq").cast("double") / col("nOut")).as("rms"))
        .orderBy("doc_id")
    }), Some("""
      SELECT doc_id, CAST(2400 AS BIGINT) AS n_samples,
             CAST(1000 + (doc_id % 7) * 2000 AS INT) AS peak_abs,
             CAST(1000 + (doc_id % 7) * 2000 AS DOUBLE) AS rms
      FROM documents ORDER BY doc_id""")),

    // REAL MP4 container parse (ISO-BMFF box walk, pure JDK): each doc
    // gets a well-formed ftyp+moov stream with doc_id-derived movie
    // header and track list; mp4Parse walks the box structure and the
    // oracle pins brand/timescale/duration/track-count arithmetic —
    // closing the "MP4 = stub" caveat for container METADATA (sample
    // decode still needs a codec and stays behind the stub seam)
    "q_multimodal_mp4" -> (q((s, dir) => {
      import s.implicits._
      val mkMp4 = udf((id: Long) => Multimodal.syntheticMp4(
        brand = "isom", timescale = 600,
        durationTicks = (((id % 1000) + 1) * 600).toInt,
        nTracks = (id % 3 + 1).toInt))
      val payload = docs(s, dir)
        .select(col("doc_id"), mkMp4(col("doc_id")).as("mp4"))
        .as[(Long, Array[Byte])]
      Multimodal.mp4MetaPartitioned(payload).toDF()
        .select(col("id").as("doc_id"), col("brand"), col("timescale"),
          col("durationMs").as("duration_ms"), col("nTracks").as("n_tracks"))
        .orderBy("doc_id")
    }), Some("""
      SELECT doc_id, 'isom' AS brand, CAST(600 AS BIGINT) AS timescale,
             CAST(((doc_id % 1000) + 1) * 1000 AS BIGINT) AS duration_ms,
             CAST(doc_id % 3 + 1 AS INT) AS n_tracks
      FROM documents ORDER BY doc_id""")),

    "q_multimodal_wav" -> (q((s, dir) => {
      val mkWav = udf((id: Long) => Multimodal.syntheticWav(
        rate = (8000 + (id % 5) * 8000).toInt,
        channels = (1 + id % 2).toShort,
        bits = if (id % 3 == 0) 8.toShort else 16.toShort,
        dataLen = ((8000 + (id % 5) * 8000) * (1 + id % 2) *
          (if (id % 3 == 0) 1 else 2) * (1 + id % 3)).toInt))
      val am = Multimodal.wavMeta(mkWav(col("doc_id")))
      docs(s, dir).select(
        col("doc_id"),
        am.getField("sample_rate").as("sample_rate"),
        am.getField("channels").as("channels"),
        am.getField("bits_per_sample").as("bits_per_sample"),
        am.getField("duration_sec").as("duration_sec"))
    }), Some("""
      SELECT doc_id,
             CAST(8000 + (doc_id % 5) * 8000 AS INT) AS sample_rate,
             CAST(1 + doc_id % 2 AS INT) AS channels,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INT) AS bits_per_sample,
             CAST(1 + doc_id % 3 AS DOUBLE) AS duration_sec
      FROM documents ORDER BY doc_id""")),

    // FULL-DECODE check: each document gets a REAL compressed PNG
    // (ImageIO.write of a BufferedImage with doc_id-derived dimensions
    // and deterministic pixel data), then [[Multimodal.ImageIoDecoder]]
    // inflates the actual pixel stream through the partition-batched
    // decodePartitioned seam — so this entry proves the compressed-pixel
    // path, where q_multimodal_decode proves only the header parsers.
    // byte_len is excluded from the output: deflate size is encoder-
    // dependent, so only the decoded dims/channels are oracle-stable.
    "q_multimodal_imageio" -> (q((s, dir) => {
      import s.implicits._
      val payloads = pngCorpus(s, dir).as[(Long, Array[Byte])]
      Multimodal.decodePartitioned(payloads, Multimodal.orStub(Multimodal.ImageIoDecoder))
        .toDF()
        .select(col("id").as("doc_id"), col("width"), col("height"), col("channels"))
    }), Some("""
      SELECT doc_id,
             CAST(doc_id % 41 + 8 AS INT) AS width,
             CAST(doc_id * 3 % 41 + 8 AS INT) AS height,
             CAST(3 AS INT) AS channels
      FROM documents ORDER BY doc_id""")),

    // REAL pixel resize end-to-end (Multimodal.resizePartitioned — pure
    // JDK: ImageIO decode → Graphics2D bilinear scale → PNG re-encode,
    // all inside mapPartitions with zero shuffle): the PNG corpus is
    // resized to maxSide=24, then the RESIZED payloads are decoded
    // AGAIN through ImageIoDecoder — so the oracle-checked dims prove
    // the outputs are valid PNGs of exactly the contract size (floor
    // division, never upscaling; within-bounds payloads pass through
    // byte-identical and re-decode at their original dims).
    "q_multimodal_resize" -> (q((s, dir) => {
      import s.implicits._
      val payloads = pngCorpus(s, dir).as[(Long, Array[Byte])]
      val resized = Multimodal.resizePartitioned(payloads, maxSide = 24)
      Multimodal.decodePartitioned(
          resized.map(r => (r.id, r.payload)),
          Multimodal.orStub(Multimodal.ImageIoDecoder))
        .toDF()
        .select(col("id").as("doc_id"), col("width"), col("height"))
    }), Some("""
      WITH d AS (
        SELECT doc_id,
               CAST(doc_id % 41 + 8 AS INT) AS w,
               CAST(doc_id * 3 % 41 + 8 AS INT) AS h
        FROM documents)
      SELECT doc_id,
             CAST(CASE WHEN greatest(w, h) <= 24 THEN w
                  ELSE greatest(1, w * 24 // greatest(w, h)) END AS INT) AS width,
             CAST(CASE WHEN greatest(w, h) <= 24 THEN h
                  ELSE greatest(1, h * 24 // greatest(w, h)) END AS INT) AS height
      FROM d ORDER BY doc_id""")),

    // REAL content-derived feature extraction (Multimodal.channelMeans
    // — ImageIO decode → per-channel pixel means), oracle-checked
    // BIT-EXACTLY via a planted solid-color corpus: a mean over w×h
    // identical 8-bit samples is the sample value itself, exact in
    // double arithmetic, so the oracle restates the planted color
    // directly. This is the real tier next to the fakeEmbedding stub
    // (which hashes bytes without decoding).
    "q_multimodal_features" -> (q((s, dir) => {
      val mk = udf((id: Long) => Multimodal.syntheticSolidPng(
        w = (id % 13 + 4).toInt, h = (id % 7 + 4).toInt,
        r = (id % 256).toInt, g = (id * 7 % 256).toInt, b = (id * 13 % 256).toInt))
      val means = udf((bytes: Array[Byte]) =>
        Multimodal.channelMeans(bytes).map { case (r, g, b) => Seq(r, g, b) }.orNull)
      docs(s, dir)
        .select(col("doc_id"), means(mk(col("doc_id"))).as("m"))
        .select(col("doc_id"),
          col("m").getItem(0).as("mean_r"),
          col("m").getItem(1).as("mean_g"),
          col("m").getItem(2).as("mean_b"))
        .orderBy("doc_id")
    }), Some("""
      SELECT doc_id,
             CAST(doc_id % 256 AS DOUBLE) AS mean_r,
             CAST(doc_id * 7 % 256 AS DOUBLE) AS mean_g,
             CAST(doc_id * 13 % 256 AS DOUBLE) AS mean_b
      FROM documents ORDER BY doc_id""")),

    "q_multimodal_meta" -> (q((s, dir) => {
      val withBin = Multimodal.withPayload(docs(s, dir), "text")
      val meta = Multimodal.imageMeta(col("content"))
      withBin.select(
        col("doc_id"),
        meta.getField("byte_len").as("byte_len"),
        meta.getField("width").as("width"),
        meta.getField("height").as("height"),
        Multimodal.resizeMeta(meta, 128).getField("width").as("rs_width"),
        Multimodal.resizeMeta(meta, 128).getField("height").as("rs_height"),
        size(Multimodal.frameOffsets(col("content"), 2)).as("n_sampled_frames"))
    }), Some("""
      WITH m AS (
        SELECT doc_id, octet_length(encode(text)) AS byte_len,
               octet_length(encode(text)) % 241 + 16 AS width,
               (octet_length(encode(text)) * 7) % 241 + 16 AS height,
               octet_length(encode(text)) % 7 + 1 AS n_frames
        FROM documents)
      SELECT doc_id, byte_len, width, height,
             CAST(width * least(128, greatest(width, height))
                  // greatest(width, height) AS INT) AS rs_width,
             CAST(height * least(128, greatest(width, height))
                  // greatest(width, height) AS INT) AS rs_height,
             CAST((n_frames + 1) // 2 AS INT) AS n_sampled_frames
      FROM m ORDER BY doc_id""")),
  )
}
