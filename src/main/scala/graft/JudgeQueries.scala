package graft

object JudgeQueries { def defs: Seq[QueryDef] = Seq() }
