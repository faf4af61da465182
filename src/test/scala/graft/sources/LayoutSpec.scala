package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the layout operators change the PLAN, not just the results:
  * bucketed joins run shuffle-free, partitioned scans prune
  * directories.
  */
class LayoutSpec extends SparkSpec {

  test("same-key bucketed tables join without a shuffle") {
    // the catalog is in-memory but the warehouse dir persists across
    // JVMs — drop both the entry and any stale location first
    for (t <- Seq("li_b", "or_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val or = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_b", Seq("l_orderkey"), 4)
    Layout.writeBucketed(or, "or_b", Seq("o_orderkey"), 4)
    val joined = spark.table("li_b")
      .join(spark.table("or_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(count(lit(1)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(1500)}")
    // and it is still correct
    val direct = li.join(or, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.agg(sum("count(1)")).head().getLong(0) == direct)
  }

  test("writeShards: disjoint ordered ranges, record cap honored") {
    val dir = Files.createTempDirectory("graft_shards").toString + "/docs"
    val df = spark.range(0, 100).toDF("id")
      .select((col("id") * 7919 % 100).as("key"), col("id"))
    Layout.writeShards(df, dir, "key", numShards = 4, maxRecordsPerFile = 10)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 10) // 100 rows / cap 10
    // every file's key range is disjoint from every other's: sorting
    // files by their min key must sort their max keys too, without
    // overlap — the "stream shards in order" contract
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getPath).agg(
        org.apache.spark.sql.functions.min("key"),
        org.apache.spark.sql.functions.max("key")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ => ()
    }
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("zValue: interleaved bits, locality, and bounds") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (255L, 255L),
        (3L, 5L))
      .toDF("x", "y")
      .select(Layout.zValue(8, Seq(col("x"), col("y"))).as("z"))
      .as[Long].collect().toSeq
    // hand-interleave: x bits at even positions, y at odd
    assert(got == Seq(0L, 1L, 2L, 3L, 65535L,
      // x=3 (011), y=5 (101): z = 1·1 + 2·1 + 4·1 + 8·0 + 16·0 + 32·1
      1 + 2 + 4 + 32))
  }

  test("writeZOrdered clusters BOTH dimensions; a plain sort clusters only one") {
    def extents(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val es = files.map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        ((r.getLong(1) - r.getLong(0)).toDouble,
          (r.getLong(3) - r.getLong(2)).toDouble)
      }
      (es.map(_._1).sum / es.length, es.map(_._2).sum / es.length)
    }
    // l_partkey vs l_orderkey: genuinely independent dimensions
    // (l_suppkey is DERIVED from l_partkey in TPC-H — sorting by one
    // clusters the other for free, which would make this test vacuous)
    val pts = graft.Tables(spark, sf, "lineitem")
      .select(pmod(col("l_partkey"), lit(256)).cast("long").as("x"),
        pmod(col("l_orderkey"), lit(256)).cast("long").as("y"))
    val zDir = Files.createTempDirectory("graft_z").toString + "/pts"
    Layout.writeZOrdered(pts, zDir, bits = 8, Seq("x", "y"), numShards = 16)
    val xDir = Files.createTempDirectory("graft_x").toString + "/pts"
    Layout.writeShards(pts, xDir, "x", numShards = 16)
    val (zx, zy) = extents(zDir)
    val (sx, sy) = extents(xDir)
    // z-order: every file covers a small rectangle in BOTH dims;
    // single-key sort: x clusters tightly but y spans ~the full range
    assert(zx < 128 && zy < 128, s"z extents not clustered: $zx x $zy")
    assert(sy > 2 * zy, s"x-sort should scatter y: sort-y=$sy z-y=$zy")
    assert(spark.read.parquet(zDir).count() == pts.count())
    // the Morton key is layout metadata — it must NOT persist as data
    assert(spark.read.parquet(zDir).columns.toSet == Set("x", "y"))
  }

  test("partitioned write enables partition pruning in the scan") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    val ev = graft.Tables(spark, sf, "events")
    Layout.writePartitioned(ev, dir, Seq("event_type"))
    val scan = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter:\n${plan.take(1000)}")
    assert(scan.count() ==
      ev.filter(col("event_type") === "click").count())
  }

  test("compact: collapses a small-file mess without losing a row") {
    def parquetFiles(d: String): Seq[java.io.File] =
      new java.io.File(d).listFiles((_, n) => n.endsWith(".parquet")).toSeq
    val base = Files.createTempDirectory("graft_compact").toString
    val ev = graft.Tables(spark, sf, "events")
    // simulate an over-parallel ingest: 40 files for ~100 KB of data
    ev.repartition(40).write.parquet(s"$base/messy")
    assert(parquetFiles(s"$base/messy").size >= 40)
    val n = Layout.compact(spark, s"$base/messy", s"$base/tidy",
      targetFileBytes = 4L * 1024 * 1024)
    val got = parquetFiles(s"$base/tidy").size
    assert(got == n && n < 5, s"expected <5 files, wrote $n (found $got)")
    // content identity, not just cardinality
    val a = spark.read.parquet(s"$base/messy")
    val b = spark.read.parquet(s"$base/tidy")
    assert(b.count() == a.count() && a.exceptAll(b).isEmpty &&
      b.exceptAll(a).isEmpty)
  }

  test("compact: refuses in-place and nested rewrites, any spelling") {
    for ((i, o) <- Seq(
        ("/tmp/x", "/tmp/x"),        // identical
        ("/tmp/x", "/tmp/x/"),       // trailing slash
        ("/tmp/x/part", "/tmp/x"),   // out is an ancestor of in
        ("/tmp/x", "/tmp/x/tidy")))  // out nests inside in
      assert(intercept[IllegalArgumentException](
        Layout.compact(spark, i, o)).getMessage.contains("nest"),
        s"$i -> $o must be rejected")
  }
}
