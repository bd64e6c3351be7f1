package graft.queries

/** Aggregates every module's QueryDefs into the driver-facing maps. */
object Registry {
  def all: Seq[QueryDef] = {
    val ds = Relational.defs ++ Geo.defs ++ Wind.defs ++ Models.defs ++ Events.defs ++
      Text.defs ++ Streaks.defs ++ Lm.defs ++ Web.defs ++ Sketch.defs ++ Multimedia.defs ++
      Fuzzy.defs
    // A module's `val defs` built from a Sql val declared BELOW it captures
    // null (Scala object-init order) — fail HERE, naming the query, instead
    // of an NPE later in Verify's JSON writer.
    ds.foreach { q =>
      require(q.fn != null && q.oracle.forall(_ != null),
        s"${q.name}: null fn/oracle — declare its members above the module's `val defs`")
    }
    ds
  }

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracles: Map[String, String] =
    all.flatMap(q =>
      q.oracle.orElse(q.dynamicOracle.flatMap(_())).map(q.name -> _)).toMap
}
