package graft.operators

import graft.QueryDef

/** Deduplication operators over `documents` (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding near-dup). Filled in milestone 3. */
object DedupOps {
  def queries: Seq[QueryDef] = Seq.empty
}
