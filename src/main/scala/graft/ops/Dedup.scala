package graft.ops

import graft.CatalogEntry

object Dedup {
  def entries: Seq[CatalogEntry] = Seq()
}
