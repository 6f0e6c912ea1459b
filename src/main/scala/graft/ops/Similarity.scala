package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (builder-prompt north
  * star). Baseline = brute-force cosine top-k; scale path = sign-LSH
  * bucketing (coarse quantization) so candidates shrink from N to
  * N/2^bits per query. Dot products fold through the integer bridge —
  * exact long accumulation, order-independent, bit-identical to the
  * DuckDB oracle.
  */
object Similarity {

  /** Exact scaled dot product of two float arrays: Σ round(a·b·1e8) as a
    * long (zip_with + fold stays inside codegen; no explode, no shuffle).
    */
  def bridgedDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * y.cast("double") * lit(1e8)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** cosine = (dot/1e8) / (√(na/1e8)·√(nb/1e8)) — all from exact longs,
    * expression shape mirrored exactly in the oracle SQL.
    */
  def cosineFromDots(dot: Column, normA: Column, normB: Column): Column =
    (dot / lit(1e8)) / (sqrt(normA / lit(1e8)) * sqrt(normB / lit(1e8)))

  /** Brute-force cosine top-5 neighbors for the query subset
    * (vec_id % 50 == 0). Queries are broadcast; candidates stream —
    * at scale this is the exact-rescore baseline every ANN variant is
    * checked against.
    */
  def bruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // norms precomputed per row (one fold each), NOT per pair — per-pair
    // work is exactly one dot fold
    val e = Tables.t(s, dir, "embeddings")
      .select($"vec_id", $"embedding", bridgedDot($"embedding", $"embedding").as("n2"))
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"n2".as("qn2"))
    val scored = broadcast(q).join(e, $"qid" =!= $"vec_id")
      .select($"qid", $"vec_id".as("cid"),
        cosineFromDots(bridgedDot($"qemb", $"embedding"), $"qn2", $"n2").as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .orderBy($"qid", $"rank")
  }

  private val bruteForceTopKSql =
    """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |           unnest(embedding) AS x FROM embeddings),
      |norms AS (SELECT vec_id,
      |    CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS n2
      |  FROM e GROUP BY 1),
      |dots AS (
      |  SELECT a.vec_id AS qid, b.vec_id AS cid,
      |    CAST(SUM(CAST(round(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS dot
      |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT qid, cid, (dot / 1e8) / (sqrt(na.n2 / 1e8) * sqrt(nb.n2 / 1e8)) AS cos
      |  FROM dots JOIN norms na ON qid = na.vec_id JOIN norms nb ON cid = nb.vec_id),
      |ranked AS (
      |  SELECT qid, cid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
      |  FROM scored)
      |SELECT qid, cid, cos, rank FROM ranked WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  /** Sign-LSH bucket for the first `bits` dimensions (coarse quantizer):
    * bucket = Σ [x_i > 0]·2^(i-1). Deterministic — no RNG needed.
    */
  def signBucket(emb: Column, bits: Int): Column =
    (1 to bits).map { i =>
      when(element_at(emb, i).cast("double") > 0.0, lit(1L << (i - 1))).otherwise(lit(0L))
    }.reduce(_ + _)

  private def signBucketSql(bits: Int): String =
    (1 to bits).map { i =>
      s"(CASE WHEN embedding[$i] > 0 THEN ${1L << (i - 1)} ELSE 0 END)"
    }.mkString(" + ")

  /** Bucketed (IVF/LSH-style) ANN: candidates restricted to the query's
    * sign bucket, then exact bridged-cosine top-3 within the bucket.
    * The bucket is the shuffle/partition key — at 100 TB each probe
    * touches 1/2^bits of the corpus instead of all of it.
    */
  def lshBucketed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bits = 6
    val e = Tables.t(s, dir, "embeddings")
      .select($"vec_id", $"embedding", signBucket($"embedding", bits).as("bucket"),
        bridgedDot($"embedding", $"embedding").as("n2"))
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"bucket", $"n2".as("qn2"))
    val scored = broadcast(q).join(e, Seq("bucket"))
      .filter($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id".as("cid"), $"bucket",
        cosineFromDots(bridgedDot($"qemb", $"embedding"), $"qn2", $"n2").as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .orderBy($"qid", $"rank")
  }

  private val lshBucketedSql = {
    val b = signBucketSql(6)
    s"""WITH eb AS (SELECT vec_id, embedding, CAST($b AS BIGINT) AS bucket FROM embeddings),
       |e AS (SELECT vec_id, bucket, generate_subscripts(embedding, 1) AS i,
       |      unnest(embedding) AS x FROM eb),
       |norms AS (SELECT vec_id,
       |    CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS n2
       |  FROM e GROUP BY 1),
       |dots AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid, a.bucket,
       |    CAST(SUM(CAST(round(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.bucket = b.bucket
       |    AND a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT qid, cid, bucket, (dot / 1e8) / (sqrt(na.n2 / 1e8) * sqrt(nb.n2 / 1e8)) AS cos
       |  FROM dots JOIN norms na ON qid = na.vec_id JOIN norms nb ON cid = nb.vec_id),
       |ranked AS (
       |  SELECT qid, cid, bucket, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
       |  FROM scored)
       |SELECT qid, cid, bucket, cos, rank FROM ranked WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin
  }

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_sim_topk", bruteForceTopK, Some(bruteForceTopKSql)),
    CatalogEntry("q_sim_lsh_bucketed", lshBucketed, Some(lshBucketedSql)))
}
