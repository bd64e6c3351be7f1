package graft

import org.apache.spark.sql.functions._
import graft.sources.{Tar, TarIO}

/** WebDataset tar-shard gates: the independently-written Python-tarfile
  * fixture, header-only member indexing, writer↔reader roundtrip (both
  * directions — Python reads OUR bytes too), and the Spark shard IO:
  * whole-shard vs member-fanout plans identical, sample grouping.
  */
class TarSpec extends SparkSpec {

  private lazy val fixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/wds_fixture.tar")
    assert(in != null, "wds_fixture.tar missing — run tools/make_tar_fixture.py")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  test("independent Python fixture: members, sizes, bodies, block-boundary padding") {
    val idx = Tar.memberIndex(fixture)
    assert(idx.map(m => (m.name, m.size)) == Seq(
      ("000001.bin", 768L), ("000001.txt", 14L), ("000001.json", 23L),
      ("000002.bin", 513L), ("000002.txt", 0L), ("000002.json", 23L),
      ("README", 22L)))
    val es = Tar.readAll(fixture)
    assert(es(0).body.sameElements((0 until 256).map(_.toByte).toArray ++
      (0 until 256).map(_.toByte) ++ (0 until 256).map(_.toByte)))
    assert(es(1).bodyText == "a tiny caption")
    assert(es(3).body.length == 513 && es(3).body.forall(_ == 0))
    assert(es(4).body.isEmpty)
    // data offsets are header-block aligned: each = previous data end padded to 512
    assert(idx(3).dataOffset == idx(2).dataOffset + 512 + 512,
      "23-byte member pads to one block before the next header")
  }

  test("key/ext split follows the WebDataset first-dot rule") {
    assert(Tar.keyExt("000001.bin") == (("000001", "bin")))
    assert(Tar.keyExt("dir/000001.seg.json") == (("000001", "seg.json")))
    assert(Tar.keyExt("README") == (("README", "")))
  }

  test("writer output reads back identically and Python tarfile agrees") {
    val entries = Seq(
      Tar.Entry("1.txt", "hello".getBytes("UTF-8")),
      Tar.Entry("1.bin", (0 until 600).map(_.toByte).toArray),
      Tar.Entry("2.txt", Array.emptyByteArray))
    val bytes = Tar.write(entries)
    val back = Tar.readAll(bytes)
    assert(back.map(_.name) == entries.map(_.name))
    assert(back.zip(entries).forall { case (a, b) => a.body.sameElements(b.body) })
    // cross-check with the foreign implementation when available
    val tmp = java.nio.file.Files.createTempFile("graft_tar", ".tar")
    java.nio.file.Files.write(tmp, bytes)
    val py =
      s"""import tarfile,sys
         |tf = tarfile.open('$tmp')
         |ms = [(m.name, m.size) for m in tf]
         |assert ms == [('1.txt', 5), ('1.bin', 600), ('2.txt', 0)], ms
         |assert tf.extractfile('1.txt').read() == b'hello'
         |""".stripMargin
    import scala.sys.process._
    val rc = Seq("python3", "-c", py).!
    if (rc != 0) fail("python tarfile rejected graft's ustar output")
  }

  test("ustar prefix carries >100-byte member paths, both directions") {
    val long = ("d" * 60) + "/" + ("e" * 60) + "/" + "sample-000123.flac"
    assert(long.length > 100)
    val bytes = Tar.write(Seq(Tar.Entry(long, "audio".getBytes("UTF-8"))))
    val back = Tar.readAll(bytes)
    assert(back.map(_.name) == Seq(long))
    assert(back(0).bodyText == "audio")
    assert(Tar.keyExt(long) == (("sample-000123", "flac")))
    // the foreign implementation agrees on the joined path
    val tmp = java.nio.file.Files.createTempFile("graft_tar_long", ".tar")
    java.nio.file.Files.write(tmp, bytes)
    val py =
      s"""import tarfile
         |tf = tarfile.open('$tmp')
         |names = [m.name for m in tf]
         |assert names == ['$long'], names
         |""".stripMargin
    import scala.sys.process._
    if (Seq("python3", "-c", "import tarfile").! == 0)
      assert(Seq("python3", "-c", py).! == 0, "python tarfile rejected the prefix split")
    // a name with no '/' break point must fail loudly, not truncate
    intercept[IllegalArgumentException](
      Tar.write(Seq(Tar.Entry("x" * 150, Array.emptyByteArray))))
  }

  test("ustar long-name split finds a valid slash and measures in UTF-8 bytes") {
    // valid split exists only at the EARLIER slash: the rightmost gives a
    // 161-byte prefix (>155); the writer must keep walking left
    val deep = "a" * 150 + "/" + "b" * 10 + "/" + "c" * 85
    val back = Tar.readAll(Tar.write(Seq(Tar.Entry(deep, "x".getBytes("UTF-8")))))
    assert(back.map(_.name) == Seq(deep))
    // multi-byte name: 60 2-byte chars = 120 bytes prefix, 90-byte tail
    val wide = "é" * 60 + "/" + "x" * 90
    val back2 = Tar.readAll(Tar.write(Seq(Tar.Entry(wide, "y".getBytes("UTF-8")))))
    assert(back2.map(_.name) == Seq(wide))
    // tail that fits in CHARS but not BYTES must be rejected up front, not
    // die later in the field writer
    val fatTail = "p/" + "é" * 60 // tail 120 bytes > name[100]
    intercept[IllegalArgumentException](Tar.write(Seq(Tar.Entry(fatTail, Array[Byte](1)))))
  }

  test("writeShards keeps a sample's members in ONE shard despite key-split input") {
    import spark.implicits._
    // txt and json member frames built separately then unioned — each key's
    // two members start in DIFFERENT partitions (the q107/q122 shape)
    val txt = (1 to 40).map(i => (i.toString, "txt", s"t$i".getBytes("UTF-8")))
    val json = (1 to 40).map(i => (i.toString, "json", s"j$i".getBytes("UTF-8")))
    val members = txt.toDF("key", "ext", "bytes").repartition(3)
      .unionAll(json.toDF("key", "ext", "bytes").repartition(3))
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_adj").toString
    TarIO.writeShards(members, dir)
    // every key's members must sit in one shard, ADJACENT (WebDataset contract)
    val byShard = TarIO.readShards(spark, dir)
      .select($"shard", $"key").as[(String, String)].collect()
    val shardsPerKey = byShard.groupBy(_._2).map { case (_, v) => v.map(_._1).distinct.size }
    assert(shardsPerKey.forall(_ == 1), "a sample's members were split across shards")
    val fs = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    fs.foreach { f =>
      val names = Tar.memberIndex(java.nio.file.Files.readAllBytes(f.toPath)).map(_.name)
      val keys = names.map(n => Tar.keyExt(n)._1)
      // adjacency: each key appears in one contiguous run
      assert(keys.distinct.length == keys.foldLeft((0, ""))((acc, k) =>
        if (k != acc._2) (acc._1 + 1, k) else acc)._1,
        s"members not adjacent in ${f.getName}: $keys")
    }
  }

  test("corrupt header fails loudly") {
    val bad = fixture.clone()
    bad(60) = 'x'.toByte // inside name field → checksum mismatch
    intercept[IllegalArgumentException](Tar.memberIndex(bad))
  }

  test("wds DataSource V2: schema, ext/key pushdown, payload pruning") {
    import spark.implicits._
    val docs = (1 to 30).flatMap(i => Seq(
      (i.toString, "txt", s"caption-$i".getBytes("UTF-8")),
      (i.toString, "img", Array.fill[Byte](1000)(i.toByte))))
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_dsv2").toString
    TarIO.writeShards(docs.toDF("key", "ext", "bytes").repartition(3), dir)
    val t = spark.read.format("wds").load(dir)
    assert(t.columns.toSeq == Seq("shard", "key", "ext", "size", "bytes"))
    assert(t.count() == 60)
    // ext pushdown: the scan description carries the member filter and
    // only txt rows surface
    val txt = t.filter($"ext" === "txt")
      .select($"key", decode($"bytes", "UTF-8").as("s"))
    val scanDesc = txt.queryExecution.executedPlan.toString
    assert(scanDesc.contains("ext=[txt]"),
      s"ext filter did not reach the wds scan:\n$scanDesc")
    val rows = txt.as[(String, String)].collect().toMap
    assert(rows.size == 30 && rows("7") == "caption-7")
    // key pushdown composes with ext
    val one = t.filter($"key" === "12" && $"ext" === "img")
    assert(one.queryExecution.executedPlan.toString.contains("key=[12]"))
    assert(one.count() == 1)
    // payload pruning: a bytes-free projection plans a bytes=false scan
    // (headers only — the census shape)
    val census = t.groupBy($"ext").agg(sum($"size").as("total"))
    val censusDesc = census.queryExecution.executedPlan.toString
    assert(censusDesc.contains("bytes=false"),
      s"bytes column not pruned from the wds scan:\n$censusDesc")
    val byExt = census.as[(String, Long)].collect().toMap
    assert(byExt("img") == 30000L && byExt("txt") > 0)
    // equivalence with the library reader
    val lib = TarIO.readShards(spark, dir)
      .select($"key", $"ext", md5($"bytes")).as[(String, String, String)]
      .collect().sorted.toSeq
    val dsv2 = t.select($"key", $"ext", md5($"bytes")).as[(String, String, String)]
      .collect().sorted.toSeq
    assert(lib == dsv2)
  }

  test("TarIO: fanout plan ≡ whole-shard plan; samples regroup split members") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toString, if (i % 2 == 0) "txt" else "bin",
      s"payload-$i".getBytes("UTF-8")))
    val df = docs.toDF("key", "ext", "bytes").repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_spec").toString
    TarIO.writeShards(df, dir)
    val whole = TarIO.readShards(spark, dir)
      .select($"key", $"ext", decode($"bytes", "UTF-8").as("s"))
      .as[(String, String, String)].collect().sorted
    val fan = TarIO.readShardsFanout(spark, dir, partitions = 7)
      .select($"key", $"ext", decode($"bytes", "UTF-8").as("s"))
      .as[(String, String, String)].collect().sorted
    assert(whole.length == 50 && whole.sameElements(fan))
    assert(whole.forall { case (k, _, s) => s == s"payload-$k" })
    // sample grouping: one row per key, members map holds the bytes
    val two = Seq(("7", "txt", "a".getBytes), ("7", "json", "b".getBytes))
      .toDF("key", "ext", "bytes")
    val s = TarIO.samples(two).collect()
    assert(s.length == 1)
    assert(s(0).getAs[scala.collection.Seq[String]]("exts").toSeq == Seq("json", "txt"))
  }
}
