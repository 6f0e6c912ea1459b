package graft.store

import graft.model.{ConnectionSpec, PipelineJson, PipelineSpec}
import java.nio.file.{Files, Path}
import java.time.Instant
import scala.jdk.CollectionConverters._

/** Execution-history event ≅ the reference's execution_history table
  * (storage/repository.py:84-96): status ∈ {running, success, error}.
  */
final case class HistoryEvent(
    taskId: String,
    startedAt: Instant,
    finishedAt: Option[Instant],
    status: String,
    message: String)

/** File-backed metadata repository ≅ storage/repository.py (SURVEY.md
  * §2.A A15): connections + pipelines as one JSON file per id
  * (insert-or-update by id, repository.py:145-173; task save replaces
  * steps wholesale, repository.py:237-270; cascade delete
  * repository.py:272-279), history as an append-only JSONL log
  * (repository.py:336-364). Data lives in parquet; only this small
  * control-plane metadata is file-backed — swap for JDBC at scale.
  */
final class Repository(root: Path) {
  private val connDir = root.resolve("connections")
  private val pipeDir = root.resolve("pipelines")
  private val historyFile = root.resolve("history.jsonl")
  Files.createDirectories(connDir)
  Files.createDirectories(pipeDir)

  // --- connections ---

  def saveConnection(c: ConnectionSpec): Unit =
    Files.writeString(connDir.resolve(s"${c.id}.json"), PipelineJson.connectionToJson(c))

  def getConnection(id: String): Option[ConnectionSpec] = {
    val f = connDir.resolve(s"$id.json")
    if (Files.exists(f)) Some(PipelineJson.parseConnection(Files.readString(f))) else None
  }

  def listConnections(): Seq[ConnectionSpec] =
    Files.list(connDir).iterator.asScala.toSeq.sortBy(_.getFileName.toString)
      .map(f => PipelineJson.parseConnection(Files.readString(f)))

  def deleteConnection(id: String): Boolean =
    Files.deleteIfExists(connDir.resolve(s"$id.json"))

  // --- pipelines (save replaces steps wholesale, like the reference) ---

  def savePipeline(p: PipelineSpec): Unit =
    Files.writeString(pipeDir.resolve(s"${p.id}.json"), PipelineJson.pipelineToJson(p))

  def getPipeline(id: String): Option[PipelineSpec] = {
    val f = pipeDir.resolve(s"$id.json")
    if (Files.exists(f)) Some(PipelineJson.parsePipeline(Files.readString(f))) else None
  }

  def listPipelines(): Seq[PipelineSpec] =
    Files.list(pipeDir).iterator.asScala.toSeq.sortBy(_.getFileName.toString)
      .map(f => PipelineJson.parsePipeline(Files.readString(f)))

  def listEnabled(): Seq[PipelineSpec] = listPipelines().filter(_.enabled)

  /** Cascade delete: pipeline + its history (≅ repository.py:272-279). */
  def deletePipeline(id: String): Boolean = {
    val existed = Files.deleteIfExists(pipeDir.resolve(s"$id.json"))
    if (existed && Files.exists(historyFile)) {
      val kept = Files.readAllLines(historyFile).asScala
        .filterNot(_.contains(s"\"taskId\":\"$id\""))
      Files.write(historyFile, kept.asJava)
    }
    existed
  }

  // --- history (append log; ≅ repository.py:336-364) ---

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def appendHistory(e: HistoryEvent): Unit = {
    val fin = e.finishedAt.map(i => s""""${i.toString}"""").getOrElse("null")
    val line =
      s"""{"taskId":"${esc(e.taskId)}","startedAt":"${e.startedAt}","finishedAt":$fin,"status":"${e.status}","message":"${esc(e.message)}"}"""
    Files.writeString(historyFile, line + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  def history(taskId: String): Seq[HistoryEvent] = {
    if (!Files.exists(historyFile)) return Nil
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Files.readAllLines(historyFile).asScala.toSeq
      .map(mapper.readTree)
      .filter(_.get("taskId").asText == taskId)
      .map { n =>
        HistoryEvent(
          n.get("taskId").asText,
          Instant.parse(n.get("startedAt").asText),
          Option(n.get("finishedAt")).filterNot(_.isNull).map(f => Instant.parse(f.asText)),
          n.get("status").asText,
          n.get("message").asText)
      }
  }
}
