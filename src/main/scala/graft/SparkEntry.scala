package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in graft.queries.* / graft.etl.* modules as QueryDef
  * lists; this object just assembles the registry.
  */
object SparkEntry {
  private def all: Seq[QueryDef] =
    _root_.graft.etl.Pipeline.defs ++
      _root_.graft.queries.Relational.defs ++
      _root_.graft.queries.TextOps.defs ++
      _root_.graft.queries.Similarity.defs ++
      _root_.graft.queries.Retrieval.defs ++
      _root_.graft.queries.Events.defs ++
      _root_.graft.queries.Functions.defs ++
      _root_.graft.queries.Multimodal.defs ++
      _root_.graft.queries.SqlSurface.defs ++
      _root_.graft.queries.Curation.defs ++
      _root_.graft.queries.Tpch.defs ++
      _root_.graft.queries.LinkRank.defs ++
      _root_.graft.queries.Lake.defs ++
      _root_.graft.queries.MatView.defs ++
      _root_.graft.queries.PipelineTick.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full reference pipeline (ingest→transform→validate→clean rows).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_clean")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Declared scale ceilings of the by-contract superlinear queries:
    * name -> (driving table, max rows, reason naming the linear-regime
    * replacement). Bench skips-with-reason past the ceiling instead of
    * hanging a large-SF run. */
  def scaleCeilings: Map[String, (String, Long, String)] =
    all.flatMap(q => q.ceiling.map(q.name -> _)).toMap
}
