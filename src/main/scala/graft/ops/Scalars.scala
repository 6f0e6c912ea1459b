package graft.ops

import graft.CatalogEntry

object Scalars {
  def entries: Seq[CatalogEntry] = Seq()
}
