package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt north star): media as
  * opaque `binary` columns with typed metadata, processed per-partition
  * in batches. The actual codecs (image/audio libs) are NOT in this
  * environment, so the decode kernel is a clearly-marked deterministic
  * STUB — everything around it (schema, batch shape, partitioning,
  * feature layout) is real and tested.
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
      media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  /** STUB decode kernel: a real implementation would hand `bytes` to an
    * image/audio codec here. Deterministic fake: 8 features derived from
    * byte statistics so specs can assert exact values. Swap this single
    * function for the real codec; nothing else changes.
    */
  def decodeStub(kind: String, bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0.0f)
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    val mean = sum.toFloat / n
    Array(
      n.toFloat, mean, (bytes.head & 0xff).toFloat, (bytes.last & 0xff).toFloat,
      (sum % 251).toFloat, (kind.hashCode & 0xff).toFloat,
      (n % 17).toFloat, ((bytes(n / 2) & 0xff)).toFloat)
  }

  /** Feature extraction over a media frame: binary payload → fixed-width
    * float features, per-partition batched (mapPartitions so per-batch
    * setup — codec init, model load — is amortized).
    *
    * A production codec replacing [[decodeStub]] must honor the codec
    * contract in PLANS.md ("Multimodal codec contract"): per-PARTITION
    * init before the row loop, streaming row-at-a-time consumption (no
    * iterator drain — payloads are MBs), null/corrupt payload → defined
    * value not a throw, and a fixed-width deterministic feature layout.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("payload"),
        coalesce(col("meta.width"), lit(0)).as("width"),
        coalesce(col("meta.height"), lit(0)).as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition (≙ per-batch) setup would init the codec here
        rows.map { r =>
          val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
          MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
            decodeStub(r.kind, bytes))
        }
      }
  }

  /** Deterministic frame sampling for video-ish payloads: every k-th
    * chunk of `chunk` bytes becomes a "frame" (STUB for a real frame
    * decoder; the plumbing — one row per sampled frame with ordinals —
    * is the real contract).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, every: Int, chunk: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val bytes = Option(payload).getOrElse(Array.emptyByteArray)
        bytes.grouped(chunk).zipWithIndex
          .filter { case (_, i) => i % every == 0 }
          .map { case (frame, i) => (id, i.toLong, frame.length.toLong,
            Multimodal.decodeStub("frame", frame)) }
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

  /** Catalog query: run the real multimodal path — batch decode via
    * [[extractFeatures]] (mapPartitions over binary payloads) and
    * deterministic [[sampleFrames]] — and project the integral feature
    * components as exact longs the oracle reproduces from the text.
    * (The one non-integral feature, the byte mean, stays covered by
    * MultimodalSpec — float32 division is not cross-engine exact.)
    */
  def featuresQuery(s: SparkSession, dir: String): DataFrame = {
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

  private val featuresSql =
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
    graft.CatalogEntry("q_multimodal_features", featuresQuery, Some(featuresSql)))
}
