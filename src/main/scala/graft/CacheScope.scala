package graft

import org.apache.spark.sql.Dataset

/** Session-scoped registry for the intermediates catalog operators
  * persist. The pattern problem it solves: an operator like
  * [[ops.Similarity.pqAdc]] persists a table its RETURNED lazy plan
  * reads twice, so the operator cannot unpersist before returning (the
  * caller has not run the terminal action yet) — and with no registry,
  * repeated catalog invocations in one long-lived session accumulate
  * cached blocks until executor storage evicts under pressure.
  *
  * Contract: operators persist through [[CacheScope.persistScoped]];
  * whoever owns the terminal action calls [[CacheScope.drain]] after
  * it. The in-tree harness drains between queries ([[Verify]],
  * [[Bench]], and the spec base already `clearCache()` there — drain
  * keeps the registry itself from growing); a library user embedding
  * the catalog drains at their own batch boundary. Unpersist is
  * non-blocking, and dropping a cache entry is always correctness-safe
  * in Spark (the plan recomputes), so a missed drain degrades to the
  * pre-registry behavior, never to a wrong result.
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Unpersist every tracked dataset; returns how many were dropped. */
  def drain(): Int = {
    var n = 0
    var d = live.poll()
    while (d != null) { d.unpersist(blocking = false); n += 1; d = live.poll() }
    n
  }

  implicit final class Scoped[T](private val ds: Dataset[T]) extends AnyVal {
    /** `persist()` + register for the next [[drain]]. */
    def persistScoped(): Dataset[T] = { val p = ds.persist(); live.add(p); p }
  }
}
