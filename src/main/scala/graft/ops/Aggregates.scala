package graft.ops

import graft.CatalogEntry

object Aggregates {
  def entries: Seq[CatalogEntry] = Seq()
}
