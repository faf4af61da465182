package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Structural smoke over every declared query at sf0.001: runs, yields
  * rows, is deterministic across two executions (the oracle contract
  * demands a total ORDER BY — re-running must give identical bytes).
  * Value-level correctness is the driver's DuckDB oracle
  * (tools/selfcheck.py replicates it locally at sf0.01).
  */
class CoreQueriesSpec extends SparkSpec {

  test("all declared queries have distinct names and oracle keys ⊆ query keys") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs, returns rows, deterministic") {
      val a = q.fn(spark, sf).collect()
      assert(a.nonEmpty, s"${q.name} returned 0 rows at sf0.001")
      val b = q.fn(spark, sf).collect()
      assert(a.toSeq == b.toSeq, s"${q.name} not deterministic")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
