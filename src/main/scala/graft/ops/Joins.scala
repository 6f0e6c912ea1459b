package graft.ops

import graft.CatalogEntry

object Joins {
  def entries: Seq[CatalogEntry] = Seq()
}
