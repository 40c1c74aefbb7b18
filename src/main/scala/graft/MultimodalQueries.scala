package graft

/** Multimodal binary-column plumbing — stubbed decode over synthetic bytes. */
object MultimodalQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
