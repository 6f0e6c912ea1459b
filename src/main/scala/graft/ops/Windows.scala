package graft.ops

import graft.CatalogEntry

object Windows {
  def entries: Seq[CatalogEntry] = Seq()
}
