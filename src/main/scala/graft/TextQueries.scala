package graft

/** Text-analysis suite over `documents` — filled in by graft.functions.TextAnalysis. */
object TextQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
