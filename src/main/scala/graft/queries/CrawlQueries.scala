package graft.queries

/** Crawl-engine query pack (frontier rounds, extraction kernel, robots,
  * seen-set). Filled in as the engine modules land — these are non-SQL ops
  * whose oracles are the scalar BFS/extract reimplementations in ScalaTest.
  */
object CrawlQueries {
  val specs: Seq[QuerySpec] = Seq()
}
