package graft

import org.apache.spark.sql.functions._
import graft.operators.Delta

/** Snapshot-delta operators: diff statuses and latest-wins determinism. */
class DeltaSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies every status; ids never vanish") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "c")
    val b = Seq((1L, "x"), (2L, "Y2"), (4L, "w")).toDF("id", "c")
    val got = Delta.snapshotDiff(a, b, "id", "c")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("latestWins survivor is identical under any input order / partitioning") {
    val rows = for (k <- 0 until 20; v <- 0 until 10)
      yield (k.toLong, v.toLong, (k * 31 + v * 7).toLong % 13, s"p$k-$v")
    val df = rows.toDF("k", "ver", "tie", "payload")
    def survivors(d: org.apache.spark.sql.DataFrame) =
      Delta.latestWins(d, "k", "ver", "tie")
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val s1 = survivors(df.repartition(7))
    val s2 = survivors(df.orderBy(col("payload").desc).repartition(3))
    assert(s1 == s2 && s1.size == 20)
    // the survivor really is the max (ver, tie) per key
    val want = rows.groupBy(_._1).view.mapValues(_.maxBy(t => (t._2, t._3))._4).toMap
    assert(s1 == want)
  }
}
