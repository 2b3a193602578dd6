package graft

/** Full operator catalog (SURVEY.md §2). Order matters only for
  * readability; the driver addresses entries by name.
  */
object Catalog {
  def all: Seq[QueryDef] =
    queries.RelationalCore.defs ++
      queries.RelationalExt.defs ++
      queries.RelationalMore.defs ++
      queries.RelationalWide.defs ++
      queries.RelationalNext.defs ++
      queries.RelationalPlus.defs ++
      queries.GraphQueries.defs ++
      queries.PipelineQueries.defs ++
      queries.DedupQueries.defs ++
      queries.SimilarityQueries.defs ++
      queries.TextQueries.defs ++
      queries.MultimodalQueries.defs ++
      queries.IngestQueries.defs

  def byName(name: String): QueryDef =
    all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
}
