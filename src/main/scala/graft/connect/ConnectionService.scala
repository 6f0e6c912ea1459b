package graft.connect

import graft.model.{ConnectionSpec, ExtractStep}
import org.apache.spark.sql.SparkSession

/** Connection test ≅ services/connection_service.py:20-40 (SURVEY.md
  * §2.A A14): open the source with a bounded probe, return (ok, message)
  * instead of throwing. For files: schema-only read; for JDBC: a
  * limit(0) load (compiles to a no-row probe on the source).
  */
object ConnectionService {

  def test(spark: SparkSession, conn: ConnectionSpec,
      probePath: Option[String] = None): (Boolean, String) =
    try {
      conn.format match {
        case f if Sources.fileFormats(f) =>
          val path = probePath.orElse(conn.options.get("basePath"))
            .getOrElse(return (false, "no path to probe"))
          val step = ExtractStep("probe", 0, conn.id,
            path = probePath.orElse(Some(path)))
          val df = Sources.read(spark, conn, step)
          (true, s"ok: ${df.schema.fields.length} columns")
        case "jdbc" =>
          // ≅ the reference's probe: open a connection with a 5 s
          // timeout, report (ok, message) (services/connection_service
          // .py:20-40) — dialect-neutral, no query parsing involved.
          conn.options.get("driver").foreach(Class.forName)
          val url = conn.options.getOrElse("url",
            return (false, "jdbc url missing"))
          java.sql.DriverManager.setLoginTimeout(5)
          val props = new java.util.Properties()
          conn.options.get("user").foreach(props.setProperty("user", _))
          conn.options.get("password").foreach(props.setProperty("password", _))
          val c = java.sql.DriverManager.getConnection(url, props)
          try (true, "ok") finally c.close()
        case other => (false, s"unsupported format '$other'")
      }
    } catch {
      case e: Exception =>
        (false, Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
    }
}
