package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks the latest right row at-or-before, per key") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b"), (2L, 50L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, 10L, 0.9), (1L, 100L, 11L, 1.0), (1L, 200L, 12L, 2.0),
      (2L, 60L, 13L, 6.0))
      .toDF("k", "ts", "rid", "v")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "rid", Seq("v"))
      .select("tag", "asof_v").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out("a") == 1.0) // equal timestamp row IS eligible
    assert(out("b") == 2.0) // latest preceding
    assert(out("c") == null) // no right row at or before ts=50
  }

  test("ties at equal right timestamps resolve to the largest rightOrd") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 100L, 5L, 5.0), (1L, 100L, 9L, 9.0), (1L, 100L, 7L, 7.0))
      .toDF("k", "ts", "rid", "v")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "rid", Seq("v")).collect()
    assert(out.head.getAs[Double]("asof_v") == 9.0)
  }
}
