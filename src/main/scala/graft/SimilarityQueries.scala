package graft

/** Similarity search over `embeddings` — brute-force and LSH-bucketed ANN. */
object SimilarityQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
