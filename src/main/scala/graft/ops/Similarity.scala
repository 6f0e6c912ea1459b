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

  /** IVF-style ANN: a 16-entry codebook (deterministically the vectors
    * with vec_id < 16 — standing in for a trained k-means codebook, the
    * training being out of scope for an oracle-checked query), every
    * vector assigned to its nearest centroid by exact bridged L2
    * (argmin of n2_c − 2·dot, norm_v constant per vector), queries probe
    * ONLY their own inverted list (nprobe=1) and rescore with exact
    * cosine. At 100 TB the inverted list is the partition key: each
    * probe touches corpus/centroids, and the coarse assignment is one
    * broadcast join of the tiny codebook.
    */
  def ivf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.t(s, dir, "embeddings")
      .select($"vec_id", $"embedding", bridgedDot($"embedding", $"embedding").as("n2"))
      .persist()
    val cents = e.filter($"vec_id" < 16)
      .select($"vec_id".as("cid0"), $"embedding".as("cemb"),
        $"n2".as("cn2"))
    // score = ||c||² − 2·v·c (exact longs); smallest = nearest centroid
    val scored = e.join(broadcast(cents))
      .select($"vec_id", $"embedding", $"n2", $"cid0",
        ($"cn2" - lit(2L) * bridgedDot($"embedding", $"cemb")).as("score"))
    val w = Window.partitionBy($"vec_id").orderBy($"score".asc, $"cid0".asc)
    val assigned = scored.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"embedding", $"n2", $"cid0".as("centroid"))
      .persist()
    val q = assigned.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qemb"),
        $"n2".as("qn2"), $"centroid")
    val cand = broadcast(q).join(assigned, Seq("centroid"))
      .filter($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id".as("cid"), $"centroid",
        cosineFromDots(bridgedDot($"qemb", $"embedding"), $"qn2", $"n2").as("cos"))
    val wr = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
    cand.withColumn("rank", row_number().over(wr).cast("long"))
      .filter($"rank" <= 3)
      .orderBy($"qid", $"rank")
  }

  private val ivfSql =
    """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |           unnest(embedding) AS x FROM embeddings),
      |norms AS (SELECT vec_id,
      |    CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS n2
      |  FROM e GROUP BY 1),
      |cdots AS (
      |  SELECT v.vec_id, c.vec_id AS cid0,
      |    CAST(SUM(CAST(round(CAST(v.x AS DOUBLE) * CAST(c.x AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS dot
      |  FROM e v JOIN e c ON v.i = c.i AND c.vec_id < 16
      |  GROUP BY 1, 2),
      |assigned AS (
      |  SELECT vec_id, cid0 AS centroid FROM (
      |    SELECT d.vec_id, d.cid0,
      |      row_number() OVER (PARTITION BY d.vec_id
      |        ORDER BY nc.n2 - 2 * d.dot ASC, d.cid0 ASC) AS rn
      |    FROM cdots d JOIN norms nc ON nc.vec_id = d.cid0) t
      |  WHERE rn = 1),
      |dots AS (
      |  SELECT a.vec_id AS qid, b.vec_id AS cid,
      |    CAST(SUM(CAST(round(CAST(ea.x AS DOUBLE) * CAST(eb.x AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS dot,
      |    a.centroid
      |  FROM assigned a JOIN assigned b
      |    ON a.centroid = b.centroid AND a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
      |  JOIN e ea ON ea.vec_id = a.vec_id
      |  JOIN e eb ON eb.vec_id = b.vec_id AND ea.i = eb.i
      |  GROUP BY 1, 2, 4),
      |scored AS (
      |  SELECT qid, cid, centroid,
      |    (dot / 1e8) / (sqrt(na.n2 / 1e8) * sqrt(nb.n2 / 1e8)) AS cos
      |  FROM dots JOIN norms na ON qid = na.vec_id JOIN norms nb ON cid = nb.vec_id),
      |ranked AS (
      |  SELECT qid, cid, centroid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
      |  FROM scored)
      |SELECT qid, cid, centroid, cos, rank FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_sim_topk", bruteForceTopK, Some(bruteForceTopKSql)),
    CatalogEntry("q_sim_lsh_bucketed", lshBucketed, Some(lshBucketedSql)),
    CatalogEntry("q_sim_ivf", ivf, Some(ivfSql)))
}
