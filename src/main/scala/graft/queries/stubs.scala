package graft.queries

/** Filled in by subsequent milestones. */
object VectorSearch { def qs: Seq[Q] = Seq.empty }
object StoreOps { def qs: Seq[Q] = Seq.empty }
