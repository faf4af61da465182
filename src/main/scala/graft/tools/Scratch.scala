package graft.tools

import org.apache.spark.sql.SparkSession

// Scratch dev harness — NOT part of the library surface.
// Dumps a subset of queries for a quick DuckDB compare during iteration.
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/graft_scratch")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q107,q108,q109,q110,q111,q112")
      .split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()
    val sel = graft.SparkEntry.queries.filter {
      case (n, _) => only.exists(n.startsWith)
    }
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_.nonEmpty)) {
      val q = sys.env("SPARK_GRAFT_EXPLAIN")
      for (round <- 1 to 3) {
        val tc = System.nanoTime()
        val df = graft.SparkEntry.queries(q)(spark, dir)
        println(f"[scratch] $q construct#$round ${(System.nanoTime() - tc) / 1e9}%6.2f s")
        val t0 = System.nanoTime()
        df.count()
        println(f"[scratch] $q count#$round ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_BPEPROF").exists(_.nonEmpty)) {
      val rounds = sys.env("SPARK_GRAFT_BPEPROF").toInt
      val df = graft.Tables(spark, dir, "documents")
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe.bpeTrain(df, "text", rounds)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] bpeTrain rounds=$rounds learned=${merges.size} " +
        f"wall=$wall%.1f s  ${merges.size / wall}%.2f merges/s")
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_NBPROF").contains("1")) {
      import org.apache.spark.sql.functions._
      def time[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[scratch] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        r
      }
      val df = graft.Tables(spark, dir, "documents")
      // fullop FIRST — before any persist, so CacheManager plan-equality
      // lookup can't substitute profiling caches into the operator
      val full0 = graft.operators.Selection.naiveBayes(df, "doc_id", "text",
        "source")
      time("fullop_fresh")(full0.count())
      val plan0 = full0.queryExecution.executedPlan.toString
      println("fresh FileScan: " + "FileScan".r.findAllIn(plan0).length)
      println("fresh InMemoryTableScan: " +
        "InMemoryTableScan".r.findAllIn(plan0).length)
      println("fresh SortMergeJoin: " +
        "SortMergeJoin".r.findAllIn(plan0).length)
      println("fresh BroadcastHashJoin: " +
        "BroadcastHashJoin".r.findAllIn(plan0).length)
      println("fresh BroadcastNestedLoopJoin: " +
        "BroadcastNestedLoopJoin".r.findAllIn(plan0).length)
      println("fresh Window: " + "Window".r.findAllIn(plan0).length)
      println("fresh Generate: " + "Generate".r.findAllIn(plan0).length)
      val tok = df.select(col("doc_id"), col("source").as("__cls"),
          explode(graft.operators.TextAnalysis.wsTokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
      val tokP = tok.persist()
      time("tok")(tokP.count())
      val dw = tokP.groupBy(col("doc_id"), col("__cls"), col("w"))
        .agg(count(lit(1)).as("n_dw"))
      val dwP = dw.persist()
      time("dw")(dwP.count())
      val cw = tokP.groupBy(col("__cls"), col("w")).agg(count(lit(1)).as("n_cw"))
      val cwP = cw.persist()
      time("cw")(cwP.count())
      val classTotals = cwP.groupBy(col("__cls")).agg(sum(col("n_cw")).as("n_c"))
      val vocabSize = cwP.select(col("w")).distinct().agg(count(lit(1)).as("v"))
      val vocab = cwP.select(col("w")).distinct()
      val weights = vocab.crossJoin(classTotals).crossJoin(vocabSize)
        .join(cwP, Seq("w", "__cls"), "left")
        .select(col("w"), col("__cls"),
          floor(log((coalesce(col("n_cw"), lit(0L)) + 1.0) /
            (col("n_c") + col("v"))) * 1e6 + 0.5).cast("long").as("w6"))
      val wP = weights.persist()
      time("weights")(wP.count())
      val scored = dwP.withColumnRenamed("__cls", "__actual")
        .join(wP, Seq("w"))
        .groupBy(col("doc_id"), col("__actual"), col("__cls"))
        .agg(sum(col("n_dw") * col("w6")).as("l6"))
      time("scored")(scored.count())
      time("scored2")(scored.count())
      val full = graft.operators.Selection.naiveBayes(df, "doc_id", "text",
        "source")
      time("fullop")(full.count())
      val plan = full.queryExecution.executedPlan.toString
      println("FileScan count: " +
        "FileScan".r.findAllIn(plan).length)
      println("InMemoryTableScan count: " +
        "InMemoryTableScan".r.findAllIn(plan).length)
      println("SortMergeJoin count: " +
        "SortMergeJoin".r.findAllIn(plan).length)
      println("BroadcastHashJoin count: " +
        "BroadcastHashJoin".r.findAllIn(plan).length)
      println("Window count: " + "Window".r.findAllIn(plan).length)
      println(plan.take(6000))
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_ED1").contains("1")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      def time[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[scratch] $label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        r
      }
      val strings = graft.Tables(spark, dir, "customer").select(col("c_name").as("s"))
        .filter(col("s").isNotNull && length(col("s")).between(1, 64))
        .distinct()
      time("strings")(strings.count())
      val keyed = strings.select(col("s"),
        explode(array_distinct(concat(
          array(col("s")),
          transform(sequence(lit(1), length(col("s"))), i =>
            concat(col("s").substr(lit(1), i - 1),
              col("s").substr(i + 1, length(col("s")) - i)))))).as("__var"))
      time("keyed")(keyed.count())
      val capped = keyed.withColumn("__bsz",
          count(lit(1)).over(Window.partitionBy("__var")))
        .filter(col("__bsz") <= 10000).drop("__bsz")
      time("capped")(capped.count())
      val joined = capped.as("a").join(capped.as("b"),
          col("a.__var") === col("b.__var") && col("a.s") < col("b.s"))
        .select(col("a.s").as("s_a"), col("b.s").as("s_b"))
      time("joined")(joined.count())
      val dd = joined.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("distinct (persist)")(dd.count())
      time("lev plain")(dd.filter(
        levenshtein(col("s_a"), col("s_b")) <= 1).count())
      time("lev plain again")(dd.filter(
        levenshtein(col("s_a"), col("s_b")) <= 1).count())
      time("lev threshold")(dd.filter(
        levenshtein(col("s_a"), col("s_b"), 1) >= 0).count())
      time("lit baseline")(dd.filter(
        length(col("s_a")) - length(col("s_b")) <= 1).count())
      spark.stop()
      return
    }
    val countOnly = sys.env.get("SPARK_GRAFT_COUNT").contains("1")
    sel.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        if (countOnly) fn(spark, dir).count()
        else fn(spark, dir).coalesce(1).write.mode("overwrite")
          .parquet(s"$out/$name")
        println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      } catch { case e: Throwable =>
        println(s"[scratch] $name FAILED: ${e.getMessage}")
      }
    }
    val oracles = graft.SparkEntry.oracleSql.filter {
      case (n, _) => only.exists(n.startsWith)
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      oracles.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
