package graft.queries

/** Filled in by subsequent milestones. */
object DedupOps { def qs: Seq[Q] = Seq.empty }
object VectorSearch { def qs: Seq[Q] = Seq.empty }
object StoreOps { def qs: Seq[Q] = Seq.empty }
