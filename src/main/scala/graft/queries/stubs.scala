package graft.queries

/** Filled in by subsequent milestones. */
object StoreOps { def qs: Seq[Q] = Seq.empty }
