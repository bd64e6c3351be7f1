package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.GraphOps

/** Web-curation surface: the link-graph / URL / interchange operators a
  * crawl-derived corpus needs around the content pipeline.
  */
object Web {

  // ---------------------------------------------------------------- q89

  /** Out-links per document for the synthesized link graph: each doc
    * links to `LinkFanout` targets derived from its id and length —
    * deterministic, data-driven (n_chars is a real data column), and
    * identically expressible in both engines with pure integer math. */
  val LinkFanout = 3

  private def linkGraph(docs: DataFrame, n: Long): DataFrame = {
    val spark = docs.sparkSession
    val ks = spark.range(LinkFanout).select(col("id").as("k"))
    docs.crossJoin(ks)
      .select(col("doc_id").as("src"),
        ((col("doc_id") * 31 + col("n_chars") * 7 + col("k") * 13) % n).as("dst"))
      .filter(col("dst") =!= col("src"))
      .distinct()
  }

  /** q89: PageRank over the document link graph — the link-based quality
    * prior of Common-Crawl-style curation (Page et al. 1999), 5 damped
    * iterations in exact BIGINT micro-units (operators.GraphOps), so the
    * oracle's unrolled iterations match bit-for-bit with zero float
    * tolerance. `pr` is the micro-unit rank as a double (same IEEE
    * division on both engines).
    */
  def q89PageRank(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    val nodes = docs.select(col("doc_id").as("node"))
    GraphOps.pageRank(nodes, linkGraph(docs, n), iters = 5)
      .select(col("node").as("doc_id"), col("pr_micro"),
        (col("pr_micro").cast("double") / lit(1e12)).as("pr"))
  }

  val q89Sql: String = {
    val S = GraphOps.Scale
    def iter(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst, SUM(r.pr // od.od) AS inc
         |  FROM e JOIN od USING (src) JOIN $prev r ON r.node = e.src
         |  GROUP BY e.dst
         |),
         |d$i AS (
         |  SELECT COALESCE(SUM(r.pr), 0) AS dm
         |  FROM $prev r LEFT JOIN od ON od.src = r.node WHERE od.src IS NULL
         |),
         |r$i AS (
         |  SELECT d.doc_id AS node,
         |    (15 * $S) // (100 * (SELECT n FROM nn))
         |    + (85 * (COALESCE(c.inc, 0) + dd.dm // (SELECT n FROM nn))) // 100 AS pr
         |  FROM documents d
         |  LEFT JOIN c$i c ON c.dst = d.doc_id
         |  CROSS JOIN d$i dd
         |)""".stripMargin
    }
    s"""WITH nn AS (SELECT COUNT(1) AS n FROM documents),
       |e AS (
       |  SELECT DISTINCT doc_id AS src,
       |    (doc_id * 31 + n_chars * 7 + k * 13) % (SELECT n FROM nn) AS dst
       |  FROM documents
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${LinkFanout - 1})) AS k) ks
       |  WHERE (doc_id * 31 + n_chars * 7 + k * 13) % (SELECT n FROM nn) <> doc_id
       |),
       |od AS (SELECT src, COUNT(1) AS od FROM e GROUP BY src),
       |r0 AS (SELECT doc_id AS node, $S // (SELECT n FROM nn) AS pr FROM documents),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT node AS doc_id, pr AS pr_micro, CAST(pr AS DOUBLE) / 1e12 AS pr
       |FROM r5""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q89_pagerank", q89PageRank, Some(q89Sql)))
}
