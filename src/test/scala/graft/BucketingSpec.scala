package graft

import org.apache.spark.sql.functions._

/** Bucketing = co-located joins: two tables bucketed by the join key join
  * with NO shuffle on either side — the physical layout replaces the
  * exchange. This is the 100 TB pattern for repeatedly-joined fact
  * tables (bucket once at write time, join shuffle-free forever after).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val nBuckets = 4
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "o_payload")
      .write.mode("overwrite")
      .bucketBy(nBuckets, "key").sortBy("key")
      .saveAsTable("b_orders")
    (1L to 5000L).map(i => (i % 1000 + 1, s"l$i")).toDF("key", "l_payload")
      .write.mode("overwrite")
      .bucketBy(nBuckets, "key").sortBy("key")
      .saveAsTable("b_lines")
    try {
      // disable broadcast so the join strategy must use the bucketing
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("b_orders").join(spark.table("b_lines"), "key")
        assert(joined.count() === 5000)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"expected a non-broadcast join:\n$plan")
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join must not shuffle either side:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
