package graft

object EventQueries { def defs: Seq[QueryDef] = Seq() }
