package graft.ops

import graft.CatalogEntry

object EventOps {
  def entries: Seq[CatalogEntry] = Seq()
}
