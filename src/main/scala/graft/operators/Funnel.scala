package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an append-only event log: for each entity,
  * the earliest time it completed step 1, then step 2 strictly after that,
  * then step 3 strictly after that, … — the standard product-analytics
  * conversion query, and (on a corpus pipeline) the ingest→filter→publish
  * progress ledger.
  *
  * Scale shape: each step is one filter + one groupBy-min over the events,
  * joined to the previous step's (entity, t) frame — every shuffle is keyed
  * on the entity column, so after the first exchange all steps co-locate
  * (AQE reuses the partitioning), and nothing ever sorts whole event
  * histories per entity (no collect_list, no per-entity array build).
  */
object Funnel {

  /** Per-entity step-completion times for the ordered `stepTypes`. Returns
    * one row per distinct entity with a nullable `t_<type>` column per
    * step; a null means the funnel broke at that step.
    */
  def steps(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stepTypes: Seq[String]): DataFrame = {
    require(stepTypes.nonEmpty && stepTypes.distinct == stepTypes)
    val users = events.select(col(entityCol)).distinct()
    var acc = users
    var prev: Option[String] = None
    stepTypes.foreach { st =>
      val tcol = s"t_$st"
      val cand = events.filter(col(typeCol) === st)
        .select(col(entityCol), col(tsCol).as("_ts"))
      val eligible = prev match {
        case None => cand
        case Some(p) =>
          cand.join(acc.filter(col(p).isNotNull).select(col(entityCol), col(p)),
              entityCol)
            .filter(col("_ts") > col(p))
            .select(col(entityCol), col("_ts"))
      }
      val mins = eligible.groupBy(entityCol).agg(min(col("_ts")).as(tcol))
      acc = acc.join(mins, Seq(entityCol), "left")
      prev = Some(tcol)
    }
    acc
  }
}
