package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.Similarity
    val n10 = 10000000L
    val pid10 = col("id") - when(col("id") % 10 === 9, 1L).otherwise(0L)
    val base10 = transform(sequence(lit(0), lit(15)),
      i => (pmod(hash(pid10, i), lit(2000)) - 1000).cast("double") / 1000.0)
    val noise10 = transform(sequence(lit(0), lit(15)),
      i => (pmod(hash(col("id"), i, lit(7)), lit(2000)) - 1000).cast("double") / 1000.0 * 0.245)
    val emb10 = spark.range(n10)
      .select(col("id").as("vec_id"),
        when(col("id") % 10 === 9, zip_with(base10, noise10, (x, d) => x + d))
          .otherwise(base10).cast("array<float>").as("embedding"))
    val np = Similarity.autoPlanes(n10)
    val nb = Similarity.autoBands(np)
    println(s"planes=$np bands=$nb")
    val bb = Similarity.bandBuckets(emb10, np, nb, "vec_id", "embedding")
    val sizes = bb.groupBy("band", "bucket").count()
    val stats = sizes.agg(count(lit(1)).as("nBuckets"), max("count").as("maxB"),
      expr("percentile(count, 0.999)").as("p999"), expr("percentile(count, 0.99)").as("p99"),
      sum(expr("count * (count - 1) / 2")).as("pairs")).head()
    println(s"occupied=${stats.getLong(0)} max=${stats.getLong(1)} p999=${stats.getDouble(2)} p99=${stats.getDouble(3)} pairsUpper=${stats.getDouble(4)}")
    sizes.orderBy(col("count").desc).limit(10).collect()
      .foreach(r => println(s"  band=${r.getInt(0)} bucket=${r.getLong(1)} n=${r.getLong(2)}"))
    spark.stop()
  }
}
