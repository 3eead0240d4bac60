package graft.queries

object StarQueries { val qs: Seq[NamedQuery] = Seq() }
