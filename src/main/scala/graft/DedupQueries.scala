package graft

object DedupQueries { def defs: Seq[QueryDef] = Seq() }
