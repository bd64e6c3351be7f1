package graft.queries

/** Aggregates every module's QueryDefs into the driver-facing maps. */
object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ Geo.defs ++ Wind.defs ++ Models.defs ++ Events.defs ++
      Text.defs ++ Streaks.defs ++ Lm.defs ++ Web.defs ++ Sketch.defs

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
