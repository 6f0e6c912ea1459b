package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (builder-prompt
  * north star; no reference counterpart — the reference dedups nothing).
  * Exact, MinHash-LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup — all expressed so the per-document signature work happens
  * map-side inside codegen (higher-order array functions, no explode
  * until the candidate-pair shuffle, which is the only shuffle and is
  * keyed by band/bucket — the shape that survives 100 TB).
  *
  * Determinism: hashes are md5 hex strings (identical in Spark and
  * DuckDB); float math goes through the integer bridge (ops package doc).
  */
object Dedup {

  /** Exact dedup on normalized text: canonical = min doc_id per group.
    * (At 100 TB: one hash-shuffle on the normalized key — use
    * md5(normalized) as the shuffle key to keep rows narrow.)
    */
  def exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .groupBy(lower(trim($"text")).as("norm_key"))
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(md5($"norm_key").as("key_md5"), $"canonical_id", $"n_copies")
      .orderBy($"canonical_id")
  }

  private val exactSql =
    """SELECT md5(lower(trim(text))) AS key_md5,
      |  min(doc_id) AS canonical_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY lower(trim(text))
      |ORDER BY canonical_id""".stripMargin

  private val nSeeds = 6 // 3 bands × 2 rows per band

  /** MinHash + LSH banding: 6 seeded minhashes over the distinct 3-gram
    * shingle set, 3 bands of 2; documents sharing any band key become
    * candidate pairs. Shingles (not unigrams) so the feature space stays
    * rich — the fixture's word pool is tiny and unigram sets saturate.
    * Signature computation is per-row map-side work; the only shuffle
    * carries (band, key, doc_id).
    */
  /** Distinct 3-gram shingles of a space-tokenized text column. */
  private def shingleCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w0 = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), size(w0) - 2),
      i => concat_ws(" ",
        element_at(w0, i.cast("int")),
        element_at(w0, (i + 1).cast("int")),
        element_at(w0, (i + 2).cast("int")))))
  }

  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigCols = (1 to nSeeds).map { i =>
      array_min(transform($"shingles", w => md5(concat(lit(s"$i:"), w)))).as(s"h$i")
    }
    // shingles materialized once per row (its own projection) — the 6
    // signature columns each fold over it without rebuilding the array
    val withSig = Tables.t(s, dir, "documents")
      .select($"doc_id", shingleCol($"text").as("shingles"))
      .select(($"doc_id" +: sigCols): _*)
    val bandStructs = (1 to nSeeds / 2).map { b =>
      struct(lit(b).as("band"), concat(col(s"h${2 * b - 1}"), col(s"h${2 * b}")).as("key"))
    }
    // persist: bands is self-joined — without it the 6 md5 signature
    // passes over every shingle run twice
    val bands = withSig
      .select($"doc_id", explode(array(bandStructs: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.key".as("key"))
      .persist()
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(countDistinct(col("a.band")).as("n_bands"))
      .orderBy($"d1", $"d2")
  }

  private val minhashLshSql = {
    val sigExprs = (1 to nSeeds).map { i =>
      s"list_min(list_transform(words, w -> md5(concat('$i:', w)))) AS h$i"
    }.mkString(",\n  ")
    val bandSelects = (1 to nSeeds / 2).map { b =>
      s"SELECT doc_id, $b AS band, concat(h${2 * b - 1}, h${2 * b}) AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH w0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |docs AS (SELECT doc_id,
       |  list_distinct([array_to_string(ws[i:i+2], ' ')
       |                 FOR i IN generate_series(1, len(ws) - 2)]) AS words
       |FROM w0),
       |sig AS (SELECT doc_id,
       |  $sigExprs
       |FROM docs),
       |bands AS (
       |  $bandSelects)
       |SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(DISTINCT a.band) AS n_bands
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY d1, d2""".stripMargin
  }

  /** 16-bit SimHash over word multiset; bit i = sign of the sum of ±1
    * votes from the i-th hex digit of each word's md5. Docs sharing a
    * simhash are near-dup clusters (n_same window count).
    */
  /** 16-bit SimHash expression over a space-tokenized text column. */
  def simhashExpr(text: Column): Column = {
    val words = split(text, " ")
    val highHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    def bit(i: Int): Column = {
      val votes = aggregate(
        transform(words, w =>
          when(substring(md5(w), i + 1, 1).isin(highHex: _*), 1L).otherwise(-1L)),
        lit(0L), (acc, x) => acc + x)
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    (0 until 16).map(bit).reduce(_ + _)
  }

  def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .select($"doc_id", simhashExpr($"text").as("simhash"))
      .withColumn("n_same",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy($"simhash")))
      .orderBy($"doc_id")
  }

  /** DuckDB twin of [[simhashExpr]] (assumes a `words` list column). */
  private val simhashBitsSql: String = {
    val hi = "('8','9','a','b','c','d','e','f')"
    (0 until 16).map { i =>
      s"(CASE WHEN list_sum(list_transform(words, w -> CASE WHEN substr(md5(w), ${i + 1}, 1) IN $hi THEN 1 ELSE -1 END)) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" +\n    ")
  }

  private val simhashSql =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |sh AS (SELECT doc_id, CAST($simhashBitsSql AS BIGINT) AS simhash FROM docs)
       |SELECT doc_id, simhash, COUNT(*) OVER (PARTITION BY simhash) AS n_same
       |FROM sh ORDER BY doc_id""".stripMargin

  /** SimHash near-dup histogram via the custom codegen expression
    * `hamming64` (graft.functions.HammingDistance): all doc pairs,
    * Hamming distance of their 16-bit simhashes, count per distance
    * ≤ 4. The pairwise inner loop is a branch-free
    * `Long.bitCount(a ^ b)` inlined by whole-stage codegen — the shape
    * (cheap fingerprint pre-filter before exact verification) is the
    * 100 TB near-dup pipeline's first stage.
    */
  def simhashHamming(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    // persist: both sides of the self-join reference the (16 md5 passes
    // per doc) simhash projection
    val sh = Tables.t(s, dir, "documents")
      .select($"doc_id", simhashExpr($"text").as("simhash"))
      .persist()
    val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(expr("hamming64(a.simhash, b.simhash)").as("h"))
    pairs.filter($"h" <= 4)
      .groupBy($"h").agg(count(lit(1)).as("n"))
      .orderBy($"h")
  }

  private val simhashHammingSql =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |sh AS (SELECT doc_id, CAST($simhashBitsSql AS BIGINT) AS simhash FROM docs)
       |SELECT CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS h, COUNT(*) AS n
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
       |GROUP BY 1 ORDER BY h""".stripMargin

  /** N-gram Jaccard similarity over distinct 3-gram shingle sets:
    * top-20 same-language pairs. Shingles (not unigrams — the fixture's
    * tiny vocabulary makes every doc-pair collide on words, a quadratic
    * fan-out) + lang blocking bound the candidate space; the
    * intersection is a shingle-level equi-join (shuffle keyed by
    * shingle), counts are exact ints, the ratio a deterministic double.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // persist: the shingle arrays feed the self-joined intersection AND
    // the per-doc counts — without it the (expensive) shingle build runs
    // once per plan reference
    val docs = Tables.t(s, dir, "documents")
      .select($"doc_id", $"lang", shingleCol($"text").as("words"))
      .persist()
    val w = docs.select($"doc_id", $"lang", explode($"words").as("wd"))
    val n = docs.select($"doc_id", size($"words").cast("long").as("nw"))
    val inter = w.as("a")
      .join(w.as("b"),
        col("a.wd") === col("b.wd") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("ni"))
    inter
      .join(n.as("na"), col("d1") === col("na.doc_id"))
      .join(n.as("nb"), col("d2") === col("nb.doc_id"))
      .select($"d1", $"d2",
        ($"ni".cast("double") / ($"na.nw" + $"nb.nw" - $"ni")).as("jaccard"))
      .orderBy($"jaccard".desc, $"d1", $"d2")
      .limit(20)
  }

  private val ngramJaccardSql =
    """WITH w0 AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
      |docs AS (SELECT doc_id, lang,
      |  list_distinct([array_to_string(ws[i:i+2], ' ')
      |                 FOR i IN generate_series(1, len(ws) - 2)]) AS words
      |FROM w0),
      |w AS (SELECT doc_id, lang, unnest(words) AS wd FROM docs),
      |n AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS nw FROM docs),
      |inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS ni
      |  FROM w a JOIN w b ON a.wd = b.wd AND a.lang = b.lang AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT d1, d2, CAST(ni AS DOUBLE) / (na.nw + nb.nw - ni) AS jaccard
      |FROM inter JOIN n na ON d1 = na.doc_id JOIN n nb ON d2 = nb.doc_id
      |ORDER BY jaccard DESC, d1, d2 LIMIT 20""".stripMargin

  /** Embedding-cosine near-dup: top-20 candidate pairs by bridged
    * cosine, candidates = same label AND same 6-bit sign bucket (coarse
    * quantization). The bucket join is what bounds pairs at scale —
    * N²/(labels·2^bits) instead of N² — and high-cosine pairs
    * concentrate in the same sign bucket, so candidates cover the true
    * near-dups. Norms precomputed per row, one dot fold per pair.
    */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.t(s, dir, "embeddings")
      .select($"vec_id", $"label", $"embedding",
        Similarity.signBucket($"embedding", 6).as("bucket"),
        Similarity.bridgedDot($"embedding", $"embedding").as("n2"))
    val pairs = e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        Similarity.cosineFromDots(
          Similarity.bridgedDot(col("a.embedding"), col("b.embedding")),
          col("a.n2"), col("b.n2")).as("cos"))
    pairs.orderBy($"cos".desc, $"v1", $"v2").limit(20)
  }

  private val embeddingNearDupSql = {
    val bucket = (1 to 6).map { i =>
      s"(CASE WHEN embedding[$i] > 0 THEN ${1L << (i - 1)} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH eb AS (SELECT vec_id, label, embedding, CAST($bucket AS BIGINT) AS bucket FROM embeddings),
       |e AS (SELECT vec_id, label, bucket, generate_subscripts(embedding, 1) AS i,
       |      unnest(embedding) AS x FROM eb),
       |norms AS (SELECT vec_id,
       |    CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS n2
       |  FROM e GROUP BY 1),
       |pairs AS (
       |  SELECT a.vec_id AS v1, b.vec_id AS v2,
       |    CAST(SUM(CAST(round(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS dot
       |  FROM e a JOIN e b ON a.i = b.i AND a.label = b.label AND a.bucket = b.bucket
       |    AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2)
       |SELECT v1, v2,
       |  (dot / 1e8) / (sqrt(na.n2 / 1e8) * sqrt(nb.n2 / 1e8)) AS cos
       |FROM pairs JOIN norms na ON v1 = na.vec_id JOIN norms nb ON v2 = nb.vec_id
       |ORDER BY cos DESC, v1, v2 LIMIT 20""".stripMargin
  }

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_dedup_exact", exact, Some(exactSql)),
    CatalogEntry("q_dedup_minhash", minhashLsh, Some(minhashLshSql)),
    CatalogEntry("q_dedup_simhash", simhash, Some(simhashSql)),
    CatalogEntry("q_dedup_simhash_hamming", simhashHamming, Some(simhashHammingSql)),
    CatalogEntry("q_dedup_jaccard", ngramJaccard, Some(ngramJaccardSql)),
    CatalogEntry("q_dedup_embedding", embeddingNearDup, Some(embeddingNearDupSql)))
}
