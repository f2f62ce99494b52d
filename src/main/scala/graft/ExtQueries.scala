package graft

/** LLM-data-pipeline extension query battery (dedup, similarity search, text
  * analysis, multimodal) — filled in alongside graft.operators / graft.functions.
  */
object ExtQueries {
  def all: Seq[(String, Queries.Q)] = Seq.empty
}
