package graft.operators

import graft.QueryDef

/** Event-stream operators over `events` (windowed aggregation,
  * sessionization, JSON props extraction). Filled in milestone 4. */
object EventOps {
  def queries: Seq[QueryDef] = Seq.empty
}
