package graft

/** LLM-data-pipeline operator inventory (dedup, similarity search, text
  * analysis, multimodal) — filled in as operators land.
  */
object QueriesPipeline {
  val all: Seq[NamedQuery] = Seq.empty
}
