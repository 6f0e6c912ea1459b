package graft.ops

import graft.CatalogEntry

object SetSortLimit {
  def entries: Seq[CatalogEntry] = Seq()
}
