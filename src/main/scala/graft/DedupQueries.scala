package graft

/** Dedup family over `documents` — exact, MinHash-LSH, SimHash, n-gram Jaccard. */
object DedupQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
