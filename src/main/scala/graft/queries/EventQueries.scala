package graft.queries

object EventQueries { val qs: Seq[NamedQuery] = Seq() }
