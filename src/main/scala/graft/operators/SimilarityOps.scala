package graft.operators

import graft.QueryDef

/** Similarity search over `embeddings` (brute-force cosine top-k, LSH/IVF
  * bucketed ANN). Filled in milestone 3. */
object SimilarityOps {
  def queries: Seq[QueryDef] = Seq.empty
}
