package graft.ops

import graft.CatalogEntry

object Similarity {
  def entries: Seq[CatalogEntry] = Seq()
}
