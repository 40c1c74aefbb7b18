package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** File sinks — the reference's `save_to_csv` family (S6/S7, SURVEY.md
  * §2.1) plus the production-scale parquet form.
  *
  * The reference stamps each run into the file name
  * (`f"{name}_{ts}.csv"`, 01_TestingPy/Spotify_API.py:159-165) and skips
  * empty frames (Spotify_API2.py:237-239). Here the run stamp becomes a
  * directory partition (`run_id=...`), so a downstream reader prunes runs
  * at the parquet-scan level instead of globbing file names.
  */
object Sinks {

  /** S6: header CSV under `dir/name_runId/` — the reference's sink shape,
    * one directory per run. */
  def csv(df: DataFrame, dir: String, name: String, runId: String): String = {
    val path = s"$dir/${name}_$runId"
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    path
  }

  /** Production sink: parquet partitioned by run id; append-mode so
    * successive runs accumulate and are pruned via `run_id=` predicates.
    * Caller controls file width via the frame's partitioning — at cluster
    * scale, repartition on the downstream join/filter key first. */
  def parquetRuns(df: DataFrame, dir: String, name: String, runId: String): String = {
    val path = s"$dir/$name"
    df.withColumn("run_id", lit(runId))
      .write.mode(SaveMode.Append).partitionBy("run_id").parquet(path)
    path
  }

  /** S7: empty-sink guard. `isEmpty` is a limit-1 scan, not a count. The
    * frame is persisted across the probe + write so the upstream plan
    * runs once, and so a nondeterministic upstream can't pass the probe
    * yet write different (or zero) rows. */
  def writeIfNonEmpty(df: DataFrame, dir: String, name: String, runId: String): Option[String] = {
    val pinned = df.persist()
    try { if (pinned.isEmpty) None else Some(csv(pinned, dir, name, runId)) }
    finally { pinned.unpersist(): Unit }
  }
}
