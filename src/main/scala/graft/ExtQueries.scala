package graft

/** LLM-data-pipeline extension battery: dedup, similarity search, text
  * analysis, multimodal plumbing, event windows/sessions — each a
  * first-class operator with a DuckDB oracle where SQL can express it.
  * The family sections live in `graft/battery/` (one file each, split
  * at round 19); this object is the stable aggregation point the
  * driver contract reads. Order is load-bearing only for stable
  * round-to-round diffs — names are unique across families.
  */
object ExtQueries {
  import Queries.Q

  def all: Seq[(String, Q)] =
    TextBattery.queries ++
      DedupBattery.queries ++
      SimilarityBattery.queries ++
      KnnBattery.queries ++
      PqBattery.queries ++
      CurationBattery.queries ++
      QuantileBattery.queries ++
      MultimodalBattery.queries ++
      ResizeBattery.queries ++
      EventBattery.queries ++
      LayoutBattery.queries ++
      ZorderBattery.queries ++
      AnalyticsBattery.queries ++
      MaintenanceBattery.queries ++
      IngestLoopBattery.queries ++
      StreamTwinBattery.queries ++
      HeadlineBattery.queries
}
