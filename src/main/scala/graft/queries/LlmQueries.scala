package graft.queries

object LlmQueries { val qs: Seq[NamedQuery] = Seq() }
