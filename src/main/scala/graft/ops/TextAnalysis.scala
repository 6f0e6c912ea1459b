package graft.ops

import graft.CatalogEntry

object TextAnalysis {
  def entries: Seq[CatalogEntry] = Seq()
}
