package graft.sources

import graft.{SparkSpec, Tables}

/** Schema contract for the ten driver-generated testdata tables
  * (FIXTURES.md §A): every query and every DuckDB oracle is written
  * against exactly these post-`Tables.apply` dtypes. Round 8 lost 31
  * queries because a Spark upgrade silently changed how parquet
  * TIMESTAMP(NANOS) surfaces (`nanosAsLong` stopped being honored and
  * `events.ts` arrived as TIMESTAMP_NTZ); this suite converts the next
  * such environment shift into a named one-line failure instead of a
  * 31-query crater. If it fails, fix `Tables.apply` normalization —
  * not the queries.
  */
class TableSchemaContractSpec extends SparkSpec {

  private val contract: Map[String, String] = Map(
    "region"     -> "r_regionkey:INT, r_name:STRING",
    "nation"     -> "n_nationkey:INT, n_name:STRING, n_regionkey:INT",
    "customer"   -> ("c_custkey:BIGINT, c_name:STRING, c_nationkey:INT, " +
                     "c_acctbal:DOUBLE, c_mktsegment:STRING"),
    "supplier"   -> "s_suppkey:BIGINT, s_name:STRING, s_nationkey:INT, s_acctbal:DOUBLE",
    "part"       -> ("p_partkey:BIGINT, p_name:STRING, p_brand:STRING, p_type:STRING, " +
                     "p_size:INT, p_retailprice:DOUBLE"),
    "orders"     -> ("o_orderkey:BIGINT, o_custkey:BIGINT, o_orderstatus:STRING, " +
                     "o_totalprice:DOUBLE, o_orderdate:TIMESTAMP_NTZ, o_orderpriority:STRING"),
    "lineitem"   -> ("l_orderkey:BIGINT, l_partkey:BIGINT, l_suppkey:BIGINT, " +
                     "l_linenumber:INT, l_quantity:DOUBLE, l_extendedprice:DOUBLE, " +
                     "l_discount:DOUBLE, l_tax:DOUBLE, l_returnflag:STRING, " +
                     "l_linestatus:STRING, l_shipdate:TIMESTAMP_NTZ"),
    // ts MUST be the bigint ns-epoch — the long-ns contract all
    // temporal queries and oracle epoch_ns() comparisons assume.
    "events"     -> ("event_id:BIGINT, ts:BIGINT, user_id:BIGINT, event_type:STRING, " +
                     "value:DOUBLE, props:STRING"),
    "documents"  -> "doc_id:BIGINT, text:STRING, lang:STRING, source:STRING, n_chars:BIGINT",
    "embeddings" -> "vec_id:BIGINT, embedding:ARRAY<FLOAT>, label:INT"
  )

  for (name <- Tables.names) {
    test(s"$name schema matches the FIXTURES.md §A contract") {
      val got = Tables(spark, sf, name).schema.fields
        .map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")
      assert(got === contract(name))
    }
  }

  test("events.ts values are ns-epoch instants in the generated range") {
    import org.apache.spark.sql.functions._
    val row = Tables(spark, sf, "events")
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val nsLo = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000000L
    val nsHi = java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli * 1000000L
    assert(row.getLong(0) >= nsLo && row.getLong(1) < nsHi,
      s"ts range [${row.getLong(0)}, ${row.getLong(1)}] outside expected ns-epoch window " +
      "— the events read is no longer producing ns since the epoch")
  }
}
