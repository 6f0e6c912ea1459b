package graft.model

/** Pipeline data model ≅ the reference's core/models.py (SURVEY.md §1.1).
  *
  * Reference shapes: `ConnectionConfig` (core/models.py:15-20),
  * `Step` with `step_type ∈ {extract, transform, load}` and free-form
  * JSON config (core/models.py:23-31, enum :9-12), `ScheduledTask`
  * (core/models.py:34-40). Here the free-form configs are typed cases.
  */
final case class ConnectionSpec(
    id: String,
    name: String,
    format: String, // parquet | csv | json | orc | jdbc
    options: Map[String, String] = Map.empty)

sealed trait StepSpec {
  def name: String
  def order: Int
}

/** Extract: read from a registered connection. For file formats `path`
  * is the location; for jdbc either `table` or `query` (the reference's
  * single extract mode is a raw query —
  * reference: core/extractors/sqlserver.py:46-55).
  */
final case class ExtractStep(
    name: String,
    order: Int,
    connectionId: String,
    path: Option[String] = None,
    table: Option[String] = None,
    query: Option[String] = None,
    options: Map[String, String] = Map.empty)
    extends StepSpec

/** Transform: `sql` runs Spark SQL with the in-flight frame registered
  * as view `input` (the reference's declared sql_transformer,
  * structure.txt:21-26); `named` looks up a registered
  * DataFrame => DataFrame (idiomatic replacement for the reference's
  * arbitrary-python transform, SURVEY.md §2.A A10).
  *
  * `audit = true` records the step's output row count as an `audit`
  * history event — the per-stage retention accounting a curation run
  * publishes (kept/total per filter). OPT-IN because the count is an
  * extra ACTION: it executes the upstream plan once more per audited
  * step — put a `cache` step upstream when auditing several stages,
  * and never audit what you don't need accounted.
  */
final case class TransformStep(
    name: String,
    order: Int,
    kind: String, // "sql" | "named"
    sql: Option[String] = None,
    transformName: Option[String] = None,
    audit: Boolean = false)
    extends StepSpec

/** Load: write modes mirror A7/A8 (`append`, `replace`) plus `errorIfExists`.
  * `sanitize = true` applies the reference's value sanitization (§1.3)
  * before the sink — off by default (standard SQL null semantics).
  */
final case class LoadStep(
    name: String,
    order: Int,
    connectionId: String,
    path: Option[String] = None,
    table: Option[String] = None,
    mode: String = "append",
    sanitize: Boolean = false,
    options: Map[String, String] = Map.empty)
    extends StepSpec

/** ≅ ScheduledTask: name + cron recurrence + enabled + ordered steps. */
final case class PipelineSpec(
    id: String,
    name: String,
    recurrence: Option[String],
    enabled: Boolean = true,
    steps: List[StepSpec] = Nil)

object PipelineJson {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
  import scala.jdk.CollectionConverters._

  private val mapper = new ObjectMapper()

  private def optStr(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText)

  private def optsMap(n: JsonNode): Map[String, String] =
    Option(n.get("options")).filterNot(_.isNull).map { o =>
      o.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }.getOrElse(Map.empty)

  def parseStep(n: JsonNode): StepSpec = {
    val name = n.get("name").asText
    val order = n.get("order").asInt
    n.get("stepType").asText match {
      case "extract" => ExtractStep(name, order,
        n.get("connectionId").asText,
        optStr(n, "path"), optStr(n, "table"), optStr(n, "query"), optsMap(n))
      case "transform" => TransformStep(name, order,
        n.get("kind").asText, optStr(n, "sql"), optStr(n, "transformName"),
        Option(n.get("audit")).exists(_.asBoolean(false)))
      case "load" => LoadStep(name, order,
        n.get("connectionId").asText,
        optStr(n, "path"), optStr(n, "table"),
        optStr(n, "mode").getOrElse("append"),
        Option(n.get("sanitize")).exists(_.asBoolean(false)), optsMap(n))
      case other => throw new IllegalArgumentException(
        s"unknown stepType '$other'") // ≅ engine.py:95-96 unknown-step guard
    }
  }

  def parsePipeline(json: String): PipelineSpec = {
    val n = mapper.readTree(json)
    PipelineSpec(
      id = n.get("id").asText,
      name = n.get("name").asText,
      recurrence = optStr(n, "recurrence"),
      enabled = Option(n.get("enabled")).forall(_.asBoolean(true)),
      steps = Option(n.get("steps")).map(_.elements().asScala.map(parseStep).toList)
        .getOrElse(Nil))
  }

  def parseConnection(json: String): ConnectionSpec = {
    val n = mapper.readTree(json)
    ConnectionSpec(n.get("id").asText, n.get("name").asText,
      n.get("format").asText, optsMap(n))
  }

  // --- serialization (for the file-backed repository) ---

  private def put(o: ObjectNode, f: String, v: Option[String]): Unit =
    v.foreach(o.put(f, _))

  private def putOptions(o: ObjectNode, m: Map[String, String]): Unit =
    if (m.nonEmpty) {
      val opts = o.putObject("options")
      m.foreach { case (k, v) => opts.put(k, v) }
    }

  def stepToNode(s: StepSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("name", s.name); o.put("order", s.order)
    s match {
      case e: ExtractStep =>
        o.put("stepType", "extract"); o.put("connectionId", e.connectionId)
        put(o, "path", e.path); put(o, "table", e.table); put(o, "query", e.query)
        putOptions(o, e.options)
      case t: TransformStep =>
        o.put("stepType", "transform"); o.put("kind", t.kind)
        put(o, "sql", t.sql); put(o, "transformName", t.transformName)
        if (t.audit) o.put("audit", true)
      case l: LoadStep =>
        o.put("stepType", "load"); o.put("connectionId", l.connectionId)
        put(o, "path", l.path); put(o, "table", l.table)
        o.put("mode", l.mode); o.put("sanitize", l.sanitize)
        putOptions(o, l.options)
    }
    o
  }

  def pipelineToJson(p: PipelineSpec): String = {
    val o = mapper.createObjectNode()
    o.put("id", p.id); o.put("name", p.name)
    put(o, "recurrence", p.recurrence)
    o.put("enabled", p.enabled)
    val arr: ArrayNode = o.putArray("steps")
    p.steps.foreach(s => arr.add(stepToNode(s)))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  def connectionToJson(c: ConnectionSpec): String = {
    val o = mapper.createObjectNode()
    o.put("id", c.id); o.put("name", c.name); o.put("format", c.format)
    putOptions(o, c.options)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }
}
