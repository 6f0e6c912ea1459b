package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.B "Scalar functions"): string,
  * date/time, math, conditional/cast, array (incl. higher-order), map,
  * JSON. All stay inside whole-stage codegen — built-in functions only,
  * no UDFs (the reference's analog is arbitrary T-SQL scalars in the
  * passthrough query, reference: core/extractors/sqlserver.py:171-173).
  *
  * Oracle notes (DuckDB dialect drift handled in the SQL twins):
  * ceil/sign return typed differently (cast); pmod emulated via
  * ((x%y)+y)%y; dayofweek is 0-based; libm-sensitive fns (ln/exp)
  * rounded to 6-8 decimals — engines differ ≤1 ulp, far below the
  * rounding grain.
  */
object Scalars {

  def stringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "part")
      .select(
        $"p_partkey",
        concat_ws("|", $"p_brand", $"p_type").as("tag"),
        upper($"p_name").as("name_u"),
        lower($"p_brand").as("brand_l"),
        substring($"p_name", 1, 6).as("name6"),
        length($"p_name").cast("long").as("name_len"),
        regexp_replace($"p_name", " ", "_").as("name_us"),
        size(split($"p_name", " ")).cast("long").as("n_words"),
        regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
        lpad($"p_brand", 12, "*").as("brand_pad"),
        instr($"p_name", "e").cast("long").as("e_pos"),
        format_string("%s/%d", $"p_brand", $"p_size").as("fmt"),
        trim(lit("  x  ")).as("trimmed"),
        split_part($"p_type", lit(" "), lit(1)).as("type_head"),
        translate($"p_brand", "#", "-").as("brand_tr"),
        repeat($"p_brand", 2).as("brand_x2"),
        reverse($"p_name").as("name_rev"),
        $"p_name".rlike("^[a-z]+ (ring|bolt)$").as("is_ring_or_bolt"))
      .orderBy($"p_partkey")
  }

  private val stringFuncsSql =
    """SELECT p_partkey,
      |  concat_ws('|', p_brand, p_type) AS tag,
      |  upper(p_name) AS name_u, lower(p_brand) AS brand_l,
      |  substring(p_name, 1, 6) AS name6,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  regexp_replace(p_name, ' ', '_', 'g') AS name_us,
      |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
      |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  lpad(p_brand, 12, '*') AS brand_pad,
      |  CAST(strpos(p_name, 'e') AS BIGINT) AS e_pos,
      |  printf('%s/%d', p_brand, p_size) AS fmt,
      |  trim('  x  ') AS trimmed,
      |  split_part(p_type, ' ', 1) AS type_head,
      |  translate(p_brand, '#', '-') AS brand_tr,
      |  repeat(p_brand, 2) AS brand_x2,
      |  reverse(p_name) AS name_rev,
      |  regexp_matches(p_name, '^[a-z]+ (ring|bolt)$') AS is_ring_or_bolt
      |FROM part ORDER BY p_partkey""".stripMargin

  def dateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .filter($"o_orderkey" < 2000)
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dom"),
        (dayofweek($"o_orderdate") - 1).cast("long").as("dow0"),
        quarter($"o_orderdate").cast("long").as("qtr"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        date_add($"o_orderdate", 30).as("plus30"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate").cast("long").as("days_to_2002"),
        last_day($"o_orderdate").as("eom"),
        unix_timestamp($"o_orderdate").as("epoch_s"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("iso_day"),
        add_months($"o_orderdate", 3).as("plus3mo"))
      .orderBy($"o_orderkey")
  }

  private val dateFuncsSql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  CAST(day(o_orderdate) AS BIGINT) AS dom,
      |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
      |  CAST(date_diff('day', o_orderdate, DATE '2002-01-01') AS BIGINT) AS days_to_2002,
      |  last_day(o_orderdate) AS eom,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo
      |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin

  def mathFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "part")
      .select(
        $"p_partkey",
        abs($"p_size" - 25).cast("long").as("size_dev"),
        round($"p_retailprice", 1).as("price_r1"),
        ceil($"p_retailprice").as("price_ceil"),
        floor($"p_retailprice").cast("long").as("price_floor"),
        pow($"p_size".cast("double"), 2.0).as("size_sq"),
        sqrt($"p_retailprice").as("price_sqrt"),
        round(log($"p_retailprice"), 6).as("price_ln6"),
        round(exp(-$"p_size".cast("double") / 10.0), 8).as("decay8"),
        signum($"p_retailprice" - 1000.0).as("sign_dev"),
        pmod($"p_size" - 25, lit(7)).cast("long").as("pm7"))
      .orderBy($"p_partkey")
  }

  private val mathFuncsSql =
    """SELECT p_partkey,
      |  CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
      |  round(p_retailprice, 1) AS price_r1,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
      |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      |  pow(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
      |  sqrt(p_retailprice) AS price_sqrt,
      |  round(ln(p_retailprice), 6) AS price_ln6,
      |  round(exp(-CAST(p_size AS DOUBLE) / 10.0), 8) AS decay8,
      |  CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sign_dev,
      |  CAST((((p_size - 25) % 7) + 7) % 7 AS BIGINT) AS pm7
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Nested CASE WHEN, casts incl. try_cast, boolean projection.
    * Oracle: DuckDB CAST(double→int) rounds where Spark truncates, so
    * the SQL twin wraps with trunc().
    */
  def condCast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "customer")
      .select(
        $"c_custkey",
        when($"c_acctbal" < 0, "debt")
          .when($"c_acctbal" < 5000,
            when($"c_nationkey" < 12, "low-west").otherwise("low-east"))
          .otherwise("high").as("bal_class"),
        $"c_acctbal".cast("int").as("bal_int"),
        $"c_custkey".cast("string").as("key_str"),
        expr("try_cast(c_mktsegment AS BIGINT)").as("seg_as_num"),
        expr("try_cast(cast(c_custkey AS STRING) AS BIGINT)").as("key_roundtrip"),
        ($"c_acctbal" > 0).as("in_credit"))
      .orderBy($"c_custkey")
  }

  private val condCastSql =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'debt'
      |       WHEN c_acctbal < 5000 THEN
      |         CASE WHEN c_nationkey < 12 THEN 'low-west' ELSE 'low-east' END
      |       ELSE 'high' END AS bal_class,
      |  CAST(trunc(c_acctbal) AS INT) AS bal_int,
      |  CAST(c_custkey AS VARCHAR) AS key_str,
      |  TRY_CAST(c_mktsegment AS BIGINT) AS seg_as_num,
      |  TRY_CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
      |  c_acctbal > 0 AS in_credit
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Array functions incl. higher-order transform/aggregate over the
    * embedding column. The L2 norm folds through the integer bridge
    * (exact long accumulation) so both engines agree bit-for-bit.
    * Array-typed results (slice/transform/sequence) are serialized to
    * csv strings in the final projection — the driver's pandas compare
    * can't hash raw array cells — with float elements bridged to scaled
    * longs first so the rendered text is engine-independent.
    */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val normSq = aggregate(
      transform($"embedding",
        x => round(x.cast("double") * x.cast("double") * lit(1e8)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    def csvBridged(arr: Column): Column =
      concat_ws(",", transform(arr,
        x => round(x.cast("double") * lit(1e6)).cast("long").cast("string")))
    Tables.t(s, dir, "embeddings")
      .select(
        $"vec_id",
        size($"embedding").cast("long").as("dim"),
        element_at($"embedding", 1).as("first_el"),
        csvBridged(slice($"embedding", 1, 4)).as("head4"),
        csvBridged(transform($"embedding", x => x * lit(2.0f))).as("scaled2"),
        sqrt(normSq.cast("double") / 1e8).as("l2_norm"),
        concat_ws(",", sequence(lit(1L), lit(5L)).cast("array<string>")).as("seq15"),
        size(filter($"embedding", x => x.cast("double") > 0.0)).cast("long").as("n_pos"),
        exists($"embedding", x => x.cast("double") < -1.0).as("has_big_neg"),
        forall($"embedding", x => abs(x.cast("double")) < 10.0).as("all_small"))
      .orderBy($"vec_id")
  }

  private val arrayFuncsSql =
    """SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS dim,
      |  embedding[1] AS first_el,
      |  array_to_string(list_transform(embedding[1:4],
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)), ',') AS head4,
      |  array_to_string(list_transform(embedding,
      |    x -> CAST(round(CAST(CAST(x AS FLOAT) * CAST(2.0 AS FLOAT) AS DOUBLE) * 1e6) AS BIGINT)), ',')
      |    AS scaled2,
      |  sqrt(CAST(CAST(list_sum(list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e8) AS BIGINT))) AS BIGINT) AS DOUBLE) / 1e8)
      |    AS l2_norm,
      |  array_to_string(generate_series(1, 5), ',') AS seq15,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
      |  len(list_filter(embedding, x -> x < -1.0)) > 0 AS has_big_neg,
      |  len(list_filter(embedding, x -> NOT (abs(x) < 10.0))) = 0 AS all_small
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** posexplode (UDTF/generator surface). */
  def arrayExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "embeddings")
      .filter($"vec_id" < 10)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "val")))
      .select($"vec_id", $"pos".cast("long").as("pos"), $"val")
      .orderBy($"vec_id", $"pos")
  }

  private val arrayExplodeSql =
    """SELECT vec_id,
      |  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
      |  unnest(embedding) AS val
      |FROM embeddings WHERE vec_id < 10
      |ORDER BY vec_id, pos""".stripMargin

  /** Map construction + lookup (oracle computes the equivalent values
    * directly — DuckDB map dialect differs but the *result* contract is
    * what the driver hashes).
    */
  def mapFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = map(lit("double"), $"value" * 2.0, lit("triple"), $"value" * 3.0)
    Tables.t(s, dir, "events")
      .filter($"event_id" < 3000)
      .select(
        $"event_id",
        element_at(m, "triple").as("v3"),
        size(m).cast("long").as("n_keys"),
        element_at(expr("str_to_map(concat('a:1,b:', event_type), ',', ':')"), "b")
          .as("b_val"))
      .orderBy($"event_id")
  }

  private val mapFuncsSql =
    """SELECT event_id, value * 3.0 AS v3, CAST(2 AS BIGINT) AS n_keys,
      |  event_type AS b_val
      |FROM events WHERE event_id < 3000 ORDER BY event_id""".stripMargin

  /** JSON surface over events.props: get_json_object / from_json /
    * json_tuple / to_json (formats verified byte-identical).
    */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val parsed = from_json($"props", StructType(Seq(StructField("k", LongType))))
    Tables.t(s, dir, "events")
      .filter($"event_id" < 3000)
      .select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        parsed.getField("k").as("k_num"),
        to_json(struct($"event_type".as("t"), parsed.getField("k").as("k"))).as("packed"))
      .orderBy($"event_id")
  }

  private val jsonFuncsSql =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
      |  to_json(struct_pack(t := event_type,
      |    k := CAST(json_extract_string(props, '$.k') AS BIGINT)))::VARCHAR AS packed
      |FROM events WHERE event_id < 3000 ORDER BY event_id""".stripMargin

  /** Bitwise scalar surface over integer keys: AND/OR/XOR, NOT, shifts,
    * and popcount — exact integer ops, identical across engines. (The
    * dedup pipeline leans on these — pigeonhole blocks, sign buckets,
    * `hamming64` — so the raw SQL surface deserves its own gate row.)
    */
  def bitwiseFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .select(
        $"o_orderkey",
        ($"o_orderkey".bitwiseAND(lit(255L))).as("and255"),
        ($"o_orderkey".bitwiseOR(lit(4096L))).as("or4096"),
        ($"o_orderkey".bitwiseXOR($"o_custkey")).as("xor_cust"),
        bitwise_not($"o_orderkey").as("not_key"),
        shiftleft($"o_orderkey", 3).as("shl3"),
        shiftright($"o_orderkey", 2).as("shr2"),
        bit_count($"o_orderkey").cast("long").as("pop"))
      .orderBy($"o_orderkey")
  }

  private val bitwiseFuncsSql =
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS and255,
      |  o_orderkey | 4096 AS or4096,
      |  xor(o_orderkey, o_custkey) AS xor_cust,
      |  ~o_orderkey AS not_key,
      |  o_orderkey << 3 AS shl3,
      |  o_orderkey >> 2 AS shr2,
      |  CAST(bit_count(o_orderkey) AS BIGINT) AS pop
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** URL parsing — host / path / query-parameter extraction, the
    * first structural step of crawl curation (domain quotas, path
    * filters, tracking-param stripping). URLs are PLANTED
    * deterministically from fixture columns (like the PII and NFC
    * rows — the fixture has no raw URLs) and parsed with three
    * anchored regexes that mean the same thing in Java regex (Spark)
    * and RE2 (DuckDB): no backreferences, no lookaround. Spark also
    * ships `parse_url`, but DuckDB has no counterpart — regex is the
    * cross-engine-checkable formulation, and it is the same map-side
    * codegen'd projection. Zero shuffles.
    */
  def urlParse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .select($"doc_id",
        concat(lit("https://"), $"source", lit(".example.com/docs/d"),
          $"doc_id".cast("string"), lit("?lang="), $"lang", lit("&v=2")).as("url"))
      .select($"doc_id",
        regexp_extract($"url", "^https://([^/]+)/", 1).as("host"),
        regexp_extract($"url", "^https://[^/]+(/[^?]*)", 1).as("path"),
        regexp_extract($"url", "[?&]lang=([^&]+)", 1).as("lang_param"))
      .orderBy($"doc_id")
  }

  private val urlParseSql =
    """WITH u AS (SELECT doc_id,
      |  'https://' || source || '.example.com/docs/d' || CAST(doc_id AS VARCHAR)
      |    || '?lang=' || lang || '&v=2' AS url
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_extract(url, '^https://([^/]+)/', 1) AS host,
      |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
      |  regexp_extract(url, '[?&]lang=([^&]+)', 1) AS lang_param
      |FROM u ORDER BY doc_id""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_scalar_url", urlParse, Some(urlParseSql)),
    CatalogEntry("q_scalar_bitwise", bitwiseFuncs, Some(bitwiseFuncsSql)),
    CatalogEntry("q_scalar_string", stringFuncs, Some(stringFuncsSql)),
    CatalogEntry("q_scalar_date", dateFuncs, Some(dateFuncsSql)),
    CatalogEntry("q_scalar_math", mathFuncs, Some(mathFuncsSql)),
    CatalogEntry("q_scalar_cond_cast", condCast, Some(condCastSql)),
    CatalogEntry("q_scalar_array", arrayFuncs, Some(arrayFuncsSql)),
    CatalogEntry("q_array_explode", arrayExplode, Some(arrayExplodeSql)),
    CatalogEntry("q_scalar_map", mapFuncs, Some(mapFuncsSql)),
    CatalogEntry("q_scalar_json", jsonFuncs, Some(jsonFuncsSql)))
}
