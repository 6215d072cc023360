package graft

object SimilarityQueries { def defs: Seq[QueryDef] = Seq() }
