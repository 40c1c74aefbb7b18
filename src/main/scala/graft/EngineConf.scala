package graft

import org.apache.spark.sql.SparkSession

/** Engine-level performance configuration shared by every runner main
  * (Bench, Verify, Probe, PlanAudit). Nothing here changes what any query
  * computes — only how wide its stages execute.
  *
  * By default this applies NOTHING: stock AQE coalescing is kept. An
  * earlier r21 iteration lowered the session-wide AQE coalescing floor
  * (`coalescePartitions.minPartitionSize`) to 16k so the CPU-dense
  * tiny-byte dedup stages stayed wide — it worked for those, but a BYTE
  * floor cannot tell CPU-dense shuffles from cheap ones (the events/
  * orders shuffles are BIGGER in bytes yet trivial per byte), and the
  * interleaved A/B campaign showed every untouched single-shuffle
  * aggregate/window query paying 1.3–1.6x for its newly-widened final
  * stages. The surgical replacement is [[Tables.spread]]'s EXPLICIT
  * partition count (exempt from coalescing) at exactly the call sites
  * that are CPU-dense; everything else keeps stock behavior.
  *
  * SPARK_GRAFT_MIN_PARTITION_SIZE remains honored when set, so a
  * deployment can still move the floor without a rebuild.
  */
object EngineConf {
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    sys.env.get("SPARK_GRAFT_MIN_PARTITION_SIZE") match {
      case Some(v) =>
        b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize", v)
      case None => b
    }
}
