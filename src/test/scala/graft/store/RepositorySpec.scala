package graft.store

import graft.model._
import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant

/** CRUD round-trips ≅ storage/repository.py semantics (SURVEY.md §5.2):
  * insert-or-update by id, save replaces steps wholesale, cascade
  * delete removes history.
  */
class RepositorySpec extends AnyFunSuite {
  private def repo() = {
    val p = java.nio.file.Files.createTempDirectory("graft-repo")
    p.toFile.deleteOnExit()
    new Repository(p)
  }

  private val conn = ConnectionSpec("c1", "warehouse", "jdbc",
    Map("url" -> "jdbc:postgresql://h/db", "user" -> "u"))

  private val pipe = PipelineSpec("t1", "nightly", Some("*/30"), enabled = true, List(
    ExtractStep("src", 1, "c1", query = Some("SELECT * FROM t")),
    TransformStep("sql", 2, "sql", sql = Some("SELECT * FROM input WHERE x > 0")),
    LoadStep("dst", 3, "c1", table = Some("out"), mode = "replace", sanitize = true,
      options = Map("batchsize" -> "10000"))))

  test("connection round-trip and upsert by id") {
    val r = repo()
    r.saveConnection(conn)
    assert(r.getConnection("c1").contains(conn))
    val updated = conn.copy(name = "renamed")
    r.saveConnection(updated) // upsert ≅ repository.py:145-173
    assert(r.listConnections() == Seq(updated))
    assert(r.deleteConnection("c1"))
    assert(r.getConnection("c1").isEmpty)
  }

  test("pipeline round-trip preserves typed steps and order") {
    val r = repo()
    r.savePipeline(pipe)
    val back = r.getPipeline("t1").get
    assert(back == pipe)
  }

  test("save replaces steps wholesale (repository.py:237-270)") {
    val r = repo()
    r.savePipeline(pipe)
    val fewer = pipe.copy(steps = pipe.steps.take(1))
    r.savePipeline(fewer)
    assert(r.getPipeline("t1").get.steps.size == 1)
  }

  test("enabled filter and cascade delete with history") {
    val r = repo()
    r.savePipeline(pipe)
    r.savePipeline(PipelineSpec("t2", "off", None, enabled = false))
    assert(r.listEnabled().map(_.id) == Seq("t1"))
    r.appendHistory(HistoryEvent("t1", Instant.now(), None, "running", "started"))
    r.appendHistory(HistoryEvent("t1", Instant.now(), Some(Instant.now()), "success", "ok"))
    assert(r.history("t1").map(_.status) == Seq("running", "success"))
    r.deletePipeline("t1") // cascade ≅ repository.py:272-279
    assert(r.getPipeline("t1").isEmpty)
    assert(r.history("t1").isEmpty)
  }

  test("history messages with quotes/newlines survive the JSONL encoding") {
    val r = repo()
    r.appendHistory(HistoryEvent("t9", Instant.now(), None, "error", "bad \"query\"\nline2"))
    assert(r.history("t9").head.message == "bad \"query\"\nline2")
  }
}
