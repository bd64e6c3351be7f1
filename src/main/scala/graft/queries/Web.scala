package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Delta, GraphOps, UrlOps}

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
    val n = Tables.rowCount(spark, sfDir, "documents")
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
       |SELECT node AS doc_id, CAST(pr AS BIGINT) AS pr_micro,
       |  CAST(pr AS DOUBLE) / 1e12 AS pr
       |FROM r5""".stripMargin
  }

  // ---------------------------------------------------------------- q148

  /** q148: label-propagation communities (Raghavan et al. 2007) over the
    * undirected view of the q89 link graph — the cheap community detector
    * a crawl corpus runs to group mutually-linking sites (mirror farms,
    * forums, doc families) before per-community curation decisions. Four
    * synchronous rounds, smallest-label tie-break, one self-vote — every
    * round is pure integer counting, so the oracle's unrolled CTE chain
    * replays the recurrence bit-for-bit with a row_number argmax where the
    * engine uses `max_by` over (count, −label): two independent argmax
    * formulations that must agree on every node.
    */
  def q148LabelProp(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = Tables.rowCount(spark, sfDir, "documents")
    GraphOps.labelPropagation(docs.select(col("doc_id").as("node")),
        linkGraph(docs, n), iters = 4)
      .select(col("node").as("doc_id"), col("label"))
  }

  // the undirected de-duplicated link-graph CTEs, shared by q148/q164/q165
  private val ueCtes: String =
    s"""nn AS (SELECT COUNT(1) AS n FROM documents),
       |e0 AS (
       |  SELECT DISTINCT doc_id AS src,
       |    (doc_id * 31 + n_chars * 7 + k * 13) % (SELECT n FROM nn) AS dst
       |  FROM documents
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${LinkFanout - 1})) AS k) ks
       |  WHERE (doc_id * 31 + n_chars * 7 + k * 13) % (SELECT n FROM nn) <> doc_id
       |),
       |ue AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
       |  ) s JOIN documents d ON d.doc_id = s.dst WHERE src <> dst
       |)""".stripMargin

  val q148Sql: String = {
    def iter(i: Int): String =
      s"""l$i AS (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |      row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
         |    FROM (
         |      SELECT node, label, COUNT(1) AS cnt FROM (
         |        SELECT ue.dst AS node, l.label FROM ue JOIN l${i - 1} l ON l.node = ue.src
         |        UNION ALL SELECT node, label FROM l${i - 1}
         |      ) v GROUP BY node, label
         |    ) c
         |  ) r WHERE rn = 1
         |)""".stripMargin
    s"""WITH $ueCtes,
       |l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents),
       |${(1 to 4).map(iter).mkString(",\n")}
       |SELECT node AS doc_id, label FROM l4""".stripMargin
  }

  // ---------------------------------------------------------------- q169

  /** q169: personalized PageRank (`GraphOps.personalizedPageRank`,
    * Haveliwala 2002) from the every-50th-doc seed set over the q89 link
    * graph — proximity-to-trusted-documents as a curation/retrieval prior
    * (the "more like these" primitive). Five exact-integer iterations;
    * the oracle unrolls the seeded recurrence the same way q89's does.
    */
  def q169PersonalizedPr(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = Tables.rowCount(spark, sfDir, "documents")
    GraphOps.personalizedPageRank(
      docs.select(col("doc_id").as("node")), linkGraph(docs, n),
      docs.filter(col("doc_id") % 50 === 0).select(col("doc_id").as("node")),
      iters = 5)
      .select(col("node").as("doc_id"), col("ppr_micro"))
  }

  val q169Sql: String = {
    val S = GraphOps.Scale
    val seed = "d.doc_id % 50 = 0"
    def iter(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst, SUM(r.pr // od.od) AS inc
         |  FROM e0 e JOIN od USING (src) JOIN $prev r ON r.node = e.src
         |  GROUP BY e.dst
         |),
         |d$i AS (
         |  SELECT COALESCE(SUM(r.pr), 0) AS dm
         |  FROM $prev r LEFT JOIN od ON od.src = r.node WHERE od.src IS NULL
         |),
         |r$i AS (
         |  SELECT d.doc_id AS node,
         |    (CASE WHEN $seed THEN (15 * $S) // (100 * (SELECT ns FROM sn)) ELSE 0 END)
         |    + (85 * (COALESCE(c.inc, 0) +
         |        CASE WHEN $seed THEN dd.dm // (SELECT ns FROM sn) ELSE 0 END)) // 100 AS pr
         |  FROM documents d
         |  LEFT JOIN c$i c ON c.dst = d.doc_id
         |  CROSS JOIN d$i dd
         |)""".stripMargin
    }
    s"""WITH nn AS (SELECT COUNT(1) AS n FROM documents),
       |e0 AS (
       |  SELECT DISTINCT doc_id AS src,
       |    (doc_id * 31 + n_chars * 7 + k * 13) % (SELECT n FROM nn) AS dst
       |  FROM documents
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${LinkFanout - 1})) AS k) ks
       |  WHERE (doc_id * 31 + n_chars * 7 + k * 13) % (SELECT n FROM nn) <> doc_id
       |),
       |od AS (SELECT src, COUNT(1) AS od FROM e0 GROUP BY src),
       |sn AS (SELECT CAST(COUNT(1) AS BIGINT) AS ns FROM documents WHERE doc_id % 50 = 0),
       |r0 AS (
       |  SELECT d.doc_id AS node,
       |    CASE WHEN $seed THEN $S // (SELECT ns FROM sn) ELSE 0 END AS pr
       |  FROM documents d
       |),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT node AS doc_id, CAST(pr AS BIGINT) AS ppr_micro FROM r5""".stripMargin
  }

  // ---------------------------------------------------------------- q164

  private def undirectedLinks(docs: DataFrame, n: Long): DataFrame = {
    val e = linkGraph(docs, n)
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst")).distinct()
  }

  /** q164: two-hop sampled neighborhoods (`GraphOps.twoHopSample`) — the
    * GNN mini-batch expansion (GraphSAGE, Hamilton 2017) over the q89 link
    * graph: 2 hop-1 neighbors per node, 2 hop-2 per hop-1 neighbor, both
    * picked by md5 order of the edge pair (seedless, engine-portable).
    * Hub fan-outs truncate to k BEFORE the hop-2 join — the sampled
    * expansion is O(k²) per node regardless of degree skew.
    */
  def q164NeighborSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    GraphOps.twoHopSample(undirectedLinks(docs, Tables.rowCount(spark, sfDir, "documents")), k1 = 2, k2 = 2)
  }

  val q164Sql: String =
    s"""WITH $ueCtes,
       |s1 AS (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src
       |    ORDER BY md5(CAST(src AS VARCHAR) || '_' || CAST(dst AS VARCHAR)), dst) AS rk
       |  FROM ue
       |),
       |a AS (SELECT src AS node, dst AS n1, CAST(rk AS BIGINT) AS rank1 FROM s1 WHERE rk <= 2),
       |b AS (SELECT src AS n1, dst AS n2, CAST(rk AS BIGINT) AS rank2 FROM s1 WHERE rk <= 2)
       |SELECT node, n1, n2, rank1, rank2
       |FROM a JOIN b USING (n1) WHERE n2 <> node""".stripMargin

  // ---------------------------------------------------------------- q165

  /** q165: negative-edge sampling (`GraphOps.negativeEdges`) — the
    * link-prediction training prep: per node, 8 multiplicative-hash
    * candidate endpoints, true edges removed by an EXACT anti-join (no
    * false negatives, unlike rejection sampling), first 3 survivors kept
    * in probe order.
    */
  def q165NegativeEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = Tables.rowCount(spark, sfDir, "documents")
    GraphOps.negativeEdges(docs.select(col("doc_id").as("node")),
      undirectedLinks(docs, n), n, m = 8, k = 3)
  }

  val q165Sql: String =
    s"""WITH $ueCtes,
       |c0 AS (
       |  SELECT doc_id AS node, CAST(i AS BIGINT) AS i,
       |    (doc_id * 31 + i * 2654435761) % (SELECT n FROM nn) AS cand
       |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) gi
       |  WHERE (doc_id * 31 + i * 2654435761) % (SELECT n FROM nn) <> doc_id
       |),
       |c AS (
       |  SELECT node, i, cand FROM c0
       |  QUALIFY i = MIN(i) OVER (PARTITION BY node, cand)
       |),
       |neg AS (
       |  SELECT c.* FROM c LEFT JOIN ue ON ue.src = c.node AND ue.dst = c.cand
       |  WHERE ue.src IS NULL
       |),
       |r AS (
       |  SELECT node, cand AS neg, i,
       |    row_number() OVER (PARTITION BY node ORDER BY i) AS rk
       |  FROM neg
       |)
       |SELECT node, neg, i, CAST(rk AS BIGINT) AS rank FROM r WHERE rk <= 3""".stripMargin

  // ---------------------------------------------------------------- q112

  /** q112: per-document triangle counts over the q89 link graph — the
    * community-density / spam-farm signal of link-based curation
    * (triangle-rich neighborhoods ≈ genuine communities; spam farms are
    * star-shaped and triangle-poor). Engine side runs the degree-ordered
    * wedge algorithm (Suri & Vassilvitskii 2011, GraphOps.triangleCounts);
    * the ORACLE counts triangles the completely different brute way — a
    * 3-way self-join on id-ordered undirected edges — so the two
    * independent algorithms must agree on every node's count.
    */
  def q112Triangles(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = Tables.rowCount(spark, sfDir, "documents")
    GraphOps.triangleCounts(docs.select(col("doc_id").as("node")),
        linkGraph(docs, n))
      .select(col("node").as("doc_id"), col("n_triangles"))
  }

  val q112Sql: String =
    s"""WITH nn AS (SELECT COUNT(1) AS n FROM documents),
       |e AS (
       |  SELECT DISTINCT doc_id AS src,
       |    (doc_id * 31 + n_chars * 7 + k * 13) % (SELECT n FROM nn) AS dst
       |  FROM documents
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${LinkFanout - 1})) AS k) ks
       |  WHERE (doc_id * 31 + n_chars * 7 + k * 13) % (SELECT n FROM nn) <> doc_id
       |),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e
       |),
       |tri AS (
       |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM und e1
       |  JOIN und e2 ON e2.u = e1.v
       |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
       |),
       |cnt AS (
       |  SELECT node, COUNT(1) AS c
       |  FROM (SELECT unnest([a, b, c]) AS node FROM tri)
       |  GROUP BY node
       |)
       |SELECT d.doc_id, COALESCE(cnt.c, 0) AS n_triangles
       |FROM documents d LEFT JOIN cnt ON cnt.node = d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q90

  /** q90: JSONL round trip — the corpus leaves as gzipped JSON-lines (the
    * training-data interchange format: one file per partition, the
    * many-files layout that carries parallelism since .jsonl.gz members
    * are not splittable) through Spark's native json sink and returns
    * through the schema'd json source. The oracle is the documents table
    * itself: any escaping, encoding, or schema defect breaks the hash.
    */
  def q90JsonlRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    Tables.load(spark, sfDir, "documents")
      .write.mode("overwrite").option("compression", "gzip").json(dir)
    spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .json(dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
  }

  val q90Sql: String =
    "SELECT doc_id, text, lang, source, n_chars FROM documents"

  // ---------------------------------------------------------------- q91

  /** The synthesized per-document URL: mixed-case scheme/host, data-driven
    * labels, default and non-default ports, tracking + unsorted query
    * params, and a fragment — every canonicalization rule exercised, and
    * two-level public suffixes (com.cn, co.uk) reached via the lang TLD
    * map. Spark and SQL build the identical string. */
  private def urlOf(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    val id = col("doc_id")
    val tld = when(col("lang") === "zh", "com.cn").when(col("lang") === "fr", "co.uk")
      .when(col("lang") === "de", "de").when(col("lang") === "es", "org")
      .otherwise("com")
    val hostPart = concat(when(id % 2 === 0, "WWW.").otherwise("m."),
      lit("Example"), (id % 13).cast("string"), lit("."), tld)
    val portPart = when(id % 3 === 0, ":80").when(id % 3 === 1, ":8080").otherwise("")
    d.select(id.as("doc_id"), concat(
      when(id % 2 === 0, "HTTP").otherwise("https"), lit("://"), hostPart, portPart,
      lit("/Docs/"), col("source"), lit("/"), id.cast("string"),
      lit("?z=9&utm_source=feed&id="), id.cast("string"),
      lit("&a=1#sec"), (id % 5).cast("string")).as("url"))
  }

  private val urlSqlCte: String =
    """u AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
      |    (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'm.' END) ||
      |    'Example' || CAST(doc_id % 13 AS VARCHAR) || '.' ||
      |    (CASE WHEN lang = 'zh' THEN 'com.cn' WHEN lang = 'fr' THEN 'co.uk'
      |          WHEN lang = 'de' THEN 'de' WHEN lang = 'es' THEN 'org'
      |          ELSE 'com' END) ||
      |    (CASE WHEN doc_id % 3 = 0 THEN ':80' WHEN doc_id % 3 = 1 THEN ':8080'
      |          ELSE '' END) ||
      |    '/Docs/' || source || '/' || CAST(doc_id AS VARCHAR) ||
      |    '?z=9&utm_source=feed&id=' || CAST(doc_id AS VARCHAR) ||
      |    '&a=1#sec' || CAST(doc_id % 5 AS VARCHAR) AS url
      |  FROM documents
      |)""".stripMargin

  /** q91: URL parse + canonicalize (operators.UrlOps) — scheme/host
    * lowering, default-port and fragment and tracker stripping, param
    * sorting, registered-domain extraction with two-level public
    * suffixes. Pure per-row column math, zero shuffles at any scale.
    */
  def q91UrlCanon(spark: SparkSession, sfDir: String): DataFrame = {
    val u = urlOf(spark, sfDir)
    u.select(col("doc_id"), col("url"),
      UrlOps.scheme(col("url")).as("scheme"),
      UrlOps.host(col("url")).as("host"),
      UrlOps.registeredDomain(UrlOps.host(col("url"))).as("registered_domain"),
      UrlOps.path(col("url")).as("path"),
      UrlOps.nParams(col("url")).cast("long").as("n_params"),
      UrlOps.canonicalize(col("url")).as("canonical_url"))
  }

  val q91Sql: String = {
    val suffixes = UrlOps.TwoLevelSuffixes.map(s => s"'$s'").mkString(", ")
    s"""WITH $urlSqlCte,
       |parts AS (
       |  SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)) AS scheme,
       |    lower(regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
       |      '^([^:]*)', 1)) AS host,
       |    regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
       |      ':([0-9]+)$$', 1) AS port,
       |    CASE WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) = ''
       |         THEN '/' ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
       |    END AS path,
       |    list_sort(list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
       |      p -> p <> '' AND NOT regexp_matches(p, '^(${UrlOps.TrackingParams})=')))
       |      AS kept
       |  FROM u
       |),
       |dom AS (
       |  SELECT *, string_split(host, '.') AS labels FROM parts
       |)
       |SELECT doc_id, url, scheme, host,
       |  CASE WHEN len(labels) >= 3 AND (labels[-2] || '.' || labels[-1]) IN ($suffixes)
       |       THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
       |       WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
       |       ELSE host END AS registered_domain,
       |  path, CAST(len(kept) AS BIGINT) AS n_params,
       |  scheme || '://' || host ||
       |  (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
       |             OR (scheme = 'https' AND port = '443') THEN ''
       |        ELSE ':' || port END) ||
       |  path ||
       |  (CASE WHEN len(kept) = 0 THEN '' ELSE '?' || array_to_string(kept, '&') END)
       |    AS canonical_url
       |FROM dom""".stripMargin
  }

  // ---------------------------------------------------------------- q92

  /** Accented markers appended per document — composed forms, and one
    * DECOMPOSED spelling ("e"+U+0301) that NFC must fold onto its composed
    * twin: the property that makes pre-hash normalization matter for
    * dedup. All bases are ASCII and all marks are Mn, the subset where
    * java.text.Normalizer and DuckDB's utf8proc agree byte-for-byte. */
  val AccentMarkers: Seq[String] = Seq(
    "Café", "naïve", "Zürich", "façade",
    "piñata", "Ångström", "déjà-vu",
    "étude")

  /** q92: Unicode normalization (codegen'd `nfc_normalize` +
    * `strip_accents` expressions, sql.UnicodeNormExpression) — NFC
    * composition, accent stripping, casefold: the canonical text key for
    * encoding-robust dedup. `composed` flags docs whose marker lost code
    * points under NFC (the decomposed spelling). Zero shuffles.
    */
  def q92Normalize(spark: SparkSession, sfDir: String): DataFrame = {
    val markers = array(AccentMarkers.map(lit): _*)
    val aug = concat(col("text"), lit(" "),
      element_at(markers, (col("doc_id") % AccentMarkers.size).cast("int") + 1))
    val nfc = call_function("nfc_normalize", aug)
    Tables.load(spark, sfDir, "documents").select(
      col("doc_id"),
      lower(call_function("strip_accents", nfc)).as("norm_text"),
      length(aug).cast("long").as("n_cp_raw"),
      length(nfc).cast("long").as("n_cp_nfc"),
      (length(nfc) < length(aug)).as("composed"))
  }

  val q92Sql: String = {
    val list = AccentMarkers.map(m => "'" + m.replace("'", "''") + "'").mkString(", ")
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    text || ' ' || ([$list])[CAST(doc_id % ${AccentMarkers.size} AS INT) + 1] AS a
       |  FROM documents
       |)
       |SELECT doc_id,
       |  lower(strip_accents(nfc_normalize(a))) AS norm_text,
       |  CAST(length(a) AS BIGINT) AS n_cp_raw,
       |  CAST(length(nfc_normalize(a)) AS BIGINT) AS n_cp_nfc,
       |  length(nfc_normalize(a)) < length(a) AS composed
       |FROM aug""".stripMargin
  }

  // ---------------------------------------------------------------- q100

  /** The synthesized "next crawl" snapshot: a deterministic rewrite of the
    * documents table with removals (÷17), in-place edits (÷13), and fresh
    * ids (÷23 re-emitted shifted by 1e6) — every diff status reachable.
    */
  private def nextSnapshot(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val kept = docs.filter(id % 17 =!= 0)
      .select(id, when(id % 13 === 0, concat(col("text"), lit(" [rev2]")))
        .otherwise(col("text")).as("text"))
    val added = docs.filter(id % 23 === 0)
      .select((id + 1000000L).as("doc_id"), concat(lit("new "), col("text")).as("text"))
    kept.unionByName(added)
  }

  /** q100: snapshot CDC diff (operators.Delta.snapshotDiff) — the daily
    * crawl-refresh bookkeeping: one co-partitioned full-outer join over
    * (id, content-hash) pairs, payloads never shuffle. Statuses
    * added/removed/changed/unchanged per doc id.
    */
  def q100SnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    Delta.snapshotDiff(docs, nextSnapshot(docs), "doc_id", "text")
  }

  val q100Sql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS text
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text
      |  FROM documents WHERE doc_id % 23 = 0
      |),
      |ha AS (SELECT doc_id, md5(text) AS hash_a FROM documents),
      |hb AS (SELECT doc_id, md5(text) AS hash_b FROM b)
      |SELECT COALESCE(ha.doc_id, hb.doc_id) AS doc_id,
      |  CASE WHEN ha.doc_id IS NULL THEN 'added'
      |       WHEN hb.doc_id IS NULL THEN 'removed'
      |       WHEN hash_a = hash_b THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM ha FULL JOIN hb ON ha.doc_id = hb.doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q89_pagerank", q89PageRank, Some(q89Sql)),
    QueryDef("q112_triangles", q112Triangles, Some(q112Sql)),
    QueryDef("q148_label_prop", q148LabelProp, Some(q148Sql)),
    QueryDef("q164_neighbor_sample", q164NeighborSample, Some(q164Sql)),
    QueryDef("q169_personalized_pr", q169PersonalizedPr, Some(q169Sql)),
    QueryDef("q165_negative_edges", q165NegativeEdges, Some(q165Sql)),
    QueryDef("q90_jsonl_roundtrip", q90JsonlRoundtrip, Some(q90Sql)),
    QueryDef("q91_url_canon", q91UrlCanon, Some(q91Sql)),
    QueryDef("q92_normalize", q92Normalize, Some(q92Sql)),
    QueryDef("q100_snapshot_diff", q100SnapshotDiff, Some(q100Sql)))
}
