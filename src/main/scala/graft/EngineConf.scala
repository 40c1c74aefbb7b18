package graft

import org.apache.spark.sql.SparkSession

/** Engine-level performance configuration shared by every runner main
  * (Bench, Verify, Probe, PlanAudit). Nothing here changes what any query
  * computes — only how wide its stages execute.
  *
  * The one non-default setting, and why (optimization round 21,
  * spark_optimization_guide.md §2.2/§2.5 "make partitioning
  * scale-adaptive"):
  *
  * AQE coalesces post-shuffle partitions by BYTE size. Its target size is
  * `max(totalShuffleBytes / defaultParallelism, minPartitionSize)` (with
  * `coalescePartitions.parallelismFirst=true`, the default). This engine's
  * hot operators are CPU-DENSE per byte: a few hundred KB of document text
  * fans out into md5-hashed shingle sets, MinHash signatures, and
  * merge-scan verifies — so on the bench corpus (sf0.1: ~1–2 MB per
  * shuffle) the default 1 MB `minPartitionSize` floor coalesces every
  * post-shuffle stage to 1–2 tasks and the expensive kernels run nearly
  * single-threaded on a 32-core worker (measured: d57's two dominant
  * stages were 1 task × 4.7 s each; d53's 1 task × 2.4 s each).
  *
  * Lowering the FLOOR to 16k leaves the scale-adaptive part of the rule —
  * `totalShuffleBytes / defaultParallelism` — in charge: on any shuffle
  * bigger than `16k × parallelism` (i.e. every real-cluster shuffle, where
  * partitions are 100 MB+) the behavior is byte-identical to the default,
  * while tiny-byte/CPU-dense stages keep up to `defaultParallelism` tasks.
  * Trivial shuffles (KB-sized connected-components rounds) still coalesce
  * to one task, so this is not "32 empty tasks everywhere". The value is
  * env-overridable for deployments whose per-task scheduling cost
  * dominates at 16k.
  */
object EngineConf {
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "16k"))
}
