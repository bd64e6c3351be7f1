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

  test("scd2 collapses no-op updates, closes intervals, keeps one open version") {
    // key 1: a→a→b→b→a (re-deliveries collapse; value returning later is a NEW version)
    val rows = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "b"), (1L, 50L, 5L, "a"),
      (2L, 10L, 6L, "x")).toDF("k", "ts", "tie", "v")
    val hist = Delta.scd2(rows, "k", "ts", "tie", "v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2))
    assert(hist.toSeq == Seq(
      (1L, 1, "a", 10L, Some(30L), false),
      (1L, 2, "b", 30L, Some(50L), false),
      (1L, 3, "a", 50L, None, true),
      (2L, 1, "x", 10L, None, true)))
    // intervals tile the key's timeline: each valid_to equals the next valid_from
    assert(hist.filter(_._1 == 1L).toSeq.sliding(2).forall {
      case Seq(a, b) => a._5.contains(b._4)
      case _ => true
    })
  }
}
