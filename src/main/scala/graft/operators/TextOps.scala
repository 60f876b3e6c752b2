package graft.operators

import graft.QueryDef

/** Text-analysis operators over `documents` (lang-ID, quality scoring,
  * token counting, fingerprinting). Filled in milestone 3. */
object TextOps {
  def queries: Seq[QueryDef] = Seq.empty
}
