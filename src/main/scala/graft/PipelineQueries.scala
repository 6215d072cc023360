package graft

object PipelineQueries { def defs: Seq[QueryDef] = Seq() }
