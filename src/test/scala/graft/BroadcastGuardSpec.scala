package graft

import org.apache.spark.sql.functions._

/** CI gate for the broadcast-discipline class of defect (round-4
  * attachSets, round-5 q08/t45): no query may force-broadcast a side
  * derived from a fact/corpus table unless it is structurally bounded or
  * explicitly allowlisted with a justification. Plan-only — builds every
  * query's optimized plan without executing it. */
class BroadcastGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no query force-broadcasts an unbounded fact-derived side") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val offs = BroadcastGuard.forcedUnboundedBroadcasts(fn(spark, sf))
        if (offs.nonEmpty && !BroadcastGuard.allowlist.contains(name))
          Some(s"$name: ${offs.mkString("; ")}")
        else None
    }
    assert(offenders.isEmpty,
      "unallowlisted forced broadcasts (the q08/t45 OOM class):\n" +
        offenders.mkString("\n"))
  }

  test("allowlist entries are live (query exists and still has the hinted shape)") {
    // A stale allowlist entry would silently excuse a FUTURE regression
    // under the same query name; every entry must name a real query whose
    // plan still carries the fact-side broadcast hint it justifies.
    for ((name, why) <- BroadcastGuard.allowlist) {
      val fn = SparkEntry.queries.get(name)
      assert(fn.isDefined, s"allowlisted query $name no longer exists")
      val offs = BroadcastGuard.forcedUnboundedBroadcasts(fn.get(spark, sf))
      assert(offs.nonEmpty,
        s"allowlist entry for $name ('$why') is stale: plan no longer has " +
          "a fact-derived broadcast hint — delete the entry")
    }
  }

  test("guard actually fires on the defect shape (not vacuous)") {
    // Reconstruct the exact round-5 q08 defect: broadcast() of a
    // filtered fact table. The guard MUST flag it — this is the
    // non-vacuousness proof the old string-match assertion lacked
    // (ResolvedHint is eliminated by the optimizer, so grepping for it
    // passes on any plan).
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bad = Tables.lineitem(spark, sf)
      .join(broadcast(urgent), col("l_orderkey") === col("o_orderkey"), "left_semi")
    val offs = BroadcastGuard.forcedUnboundedBroadcasts(bad)
    assert(offs.nonEmpty, "guard failed to flag a forced fact-table broadcast")
    assert(offs.head.contains("orders"), s"offender should name the table: $offs")
    assert(BroadcastGuard.broadcastHintCount(bad) == 1)
  }

  test("a broadcast hint over a lineage-cut (pinned) frame is flagged unauditable") {
    // The r21 ADVICE blind spot: Tables.pin (localCheckpoint) truncates
    // lineage to a LogicalRDD, so a fact-derived side hinted AFTER a pin
    // used to sail through the fact-lineage audit silently (d56's shape).
    // The guard must now fail loudly on any hint it cannot audit.
    val pinned = Tables.pin(Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey"))
    val q = Tables.lineitem(spark, sf)
      .join(broadcast(pinned), col("l_orderkey") === col("o_orderkey"), "left_semi")
    val offs = BroadcastGuard.forcedUnboundedBroadcasts(q)
    assert(offs.nonEmpty, "guard passed an unauditable pinned-side broadcast hint silently")
    assert(offs.head.contains("UNAUDITABLE"), s"should be flagged unauditable: $offs")
  }

  test("a structural bound above the pinned frame still clears the hint") {
    // Limit above the LogicalRDD bounds whatever the checkpoint holds, so
    // the hint is auditable as bounded — same rule as un-pinned sides.
    val pinnedLimited = Tables.pin(Tables.orders(spark, sf)
      .select("o_orderkey")).limit(10)
    val q = Tables.lineitem(spark, sf)
      .join(broadcast(pinnedLimited), col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(BroadcastGuard.forcedUnboundedBroadcasts(q).isEmpty)
  }

  test("guard accepts structurally bounded broadcasts (limit, scalar agg)") {
    val li = Tables.lineitem(spark, sf)
    // LIMIT-bounded side: fine at any scale.
    val limited = li.select("l_orderkey").limit(10)
    assert(BroadcastGuard.forcedUnboundedBroadcasts(
      li.join(broadcast(limited), Seq("l_orderkey"), "left_semi")).isEmpty)
    // Grand-total aggregate (one row): fine at any scale.
    val scalarAgg = li.agg(avg(col("l_quantity")).as("aq"))
    assert(BroadcastGuard.forcedUnboundedBroadcasts(
      li.join(broadcast(scalarAgg))).isEmpty)
    // Dimension-table broadcast (q10 shape): not a fact table, fine.
    val dim = Tables.nation(spark, sf)
    assert(BroadcastGuard.forcedUnboundedBroadcasts(
      li.join(broadcast(dim), col("l_suppkey") === col("n_nationkey"))).isEmpty)
    // Grouped aggregate over a fact is NOT a bound (one row per key
    // grows with the data) — must still flag.
    val grouped = li.groupBy("l_partkey").agg(count(lit(1)).as("n"))
    assert(BroadcastGuard.forcedUnboundedBroadcasts(
      li.join(broadcast(grouped), Seq("l_partkey"))).nonEmpty)
  }
}
