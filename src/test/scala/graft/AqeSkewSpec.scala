package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Evidence for SCALE.md's claim that AQE handles skewed fact joins at
  * runtime — demonstrated, not asserted. Spark's production skew
  * thresholds (256 MB per partition) are sized for real clusters, so the
  * spec scales them down to test size, plants a hot key, and then shows
  * the two runtime re-plans by name:
  *
  *   - `OptimizeSkewedJoin` (spark.sql.adaptive.skewJoin): the hot
  *     partition of a sort-merge join is split into sub-partitions —
  *     visible as `isSkewJoin=true` on the executed SMJ and a skewed
  *     AQEShuffleRead. Each assertion has a non-firing control run so
  *     the observation is attributable to the rule, not the fixture.
  *   - runtime broadcast conversion (AdaptiveSparkPlanExec re-planning
  *     with `spark.sql.adaptive.autoBroadcastJoinThreshold`): a join
  *     planned as SMJ (static broadcast off) converts to
  *     BroadcastHashJoin once runtime stats show the small side fits.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  /** The final adaptive plan after execution. collect(), not a noop
    * write: a write wraps the query in its own fresh QueryExecution, so
    * THIS df's AdaptiveSparkPlanExec would never finalize. */
  private def adaptive(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => fail(s"expected an adaptive plan, got:\n$other")
    }
  }

  private def collectPlan[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val self = pf.lift(p).toSeq
    // cross query-stage boundaries: stage nodes (ResultQueryStage,
    // BroadcastQueryStage, ...) expose their subtree via .plan, not
    // .children — a naive children walk sees an empty tree
    val kids = (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }) ++ p.subqueries
    self ++ kids.flatMap(collectPlan(_)(pf))
  }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** 200k fact rows, 75% on key 0 (the planted hot key), vs a 1k-key dim.
    * String padding gives the hot shuffle partition real bytes. */
  private def skewedFact: DataFrame =
    spark.range(200000).select(
      when($"id" % 4 =!= 3, 0L).otherwise($"id" % 1000).as("k"),
      concat(lit("payload-payload-payload-payload-"), $"id").as("pad"))
  private def dim: DataFrame =
    spark.range(1000).select($"id".as("k"), concat(lit("dim-"), $"id").as("dname"))

  test("OptimizeSkewedJoin splits the planted hot partition (isSkewJoin on the executed SMJ)") {
    withConf(
      // keep the join a sort-merge join: broadcast off both statically
      // and adaptively, so the skew rule is the only degree of freedom
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // scale the 256MB production thresholds down to fixture size
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      // coalescing can merge away the evidence partitions on tiny inputs
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {

      val joined = skewedFact.join(dim, "k")
      assert(joined.count() === 200000L) // correctness before plan shape

      val plan = adaptive(skewedFact.join(dim, "k"))
      val smjs = collectPlan(plan) { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"fixture must keep a sort-merge join:\n$plan")
      assert(smjs.exists(_.isSkewJoin),
        s"OptimizeSkewedJoin did not fire (no isSkewJoin SMJ):\n$plan")
      val skewedReads = collectPlan(plan) {
        case r: AQEShuffleReadExec if r.hasSkewedPartition => r
      }
      assert(skewedReads.nonEmpty,
        s"expected an AQEShuffleRead with skewed partitions:\n$plan")

      // control: with production-size thresholds the same join must NOT
      // be flagged skewed — the observation above is the rule firing,
      // not an artifact of the fixture or the assertions
      withConf(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m") {
        val control = adaptive(skewedFact.join(dim, "k"))
        assert(!collectPlan(control) { case j: SortMergeJoinExec => j }
          .exists(_.isSkewJoin),
          "control run unexpectedly skew-split at production thresholds")
      }
    }
  }

  test("AQE converts SMJ to broadcast at runtime once the small side's true size is known") {
    withConf(
      // static broadcast OFF: the initial plan must be a sort-merge join
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // adaptive broadcast ON: runtime stats reveal dim fits comfortably
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10m") {
      val plan = adaptive(skewedFact.join(dim, "k"))
      val bhjs = collectPlan(plan) { case j: BroadcastHashJoinExec => j }
      assert(bhjs.nonEmpty,
        s"runtime broadcast conversion did not fire:\n$plan")
      assert(collectPlan(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"converted join must read a broadcast stage:\n$plan")

      // control: with adaptive broadcast also off, the join stays SMJ —
      // the conversion above came from AQE's re-plan, not static planning
      withConf("spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val control = adaptive(skewedFact.join(dim, "k"))
        assert(collectPlan(control) { case j: SortMergeJoinExec => j }.nonEmpty,
          s"control must stay sort-merge:\n$control")
        assert(collectPlan(control) { case j: BroadcastHashJoinExec => j }.isEmpty)
      }
    }
  }
}
