package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Partition pruning through the Tables loaders, end to end.
  *
  * SCALE.md's claim is that a hive-partitioned lake directory
  * (`lang=…/run_id=…/part-*.parquet`) read through `Tables.table` prunes
  * at the FILE level: a `lang = 'en'` filter must never open the other
  * languages' files. On 100 TB that is the difference between scanning a
  * corpus and scanning a shard — so this spec asserts the pruning three
  * ways, not just in the plan string:
  *   1. the scan's `PartitionFilters` carry the predicate (plan shape),
  *   2. the scan's `numFiles` metric counts only the matching partition's
  *      files (the reader's own accounting),
  *   3. `input_file_name()` on the result shows only matching paths
  *      (ground truth — which bytes were actually touched).
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case s: FileSourceScanExec    => Seq(s)
        case other                    => other.children.flatMap(unwrap)
      }
    val scans = unwrap(df.queryExecution.executedPlan)
    assert(scans.size === 1, s"expected exactly one file scan:\n${df.queryExecution.executedPlan}")
    scans.head
  }

  test("lang=/run_id=-partitioned lake read via Tables prunes files, not just rows") {
    val root = Files.createTempDirectory("graft-lake-").toFile
    try {
      // 3 langs x 2 runs = 6 hive partitions; ids disjoint per cell so
      // result correctness is checkable independently of pruning.
      val docs = (0 until 600).map { i =>
        (i.toLong, s"doc $i", Seq("en", "id", "de")(i % 3), s"r${i % 2}")
      }.toDF("doc_id", "text", "lang", "run_id")
      docs.write.partitionBy("lang", "run_id")
        .mode("overwrite").parquet(s"${root.getAbsolutePath}/documents.parquet")

      // through the canonical loader — same entry point every query uses
      val lake = Tables.table(spark, root.getAbsolutePath, "documents")
      assert(lake.count() === 600)

      // -- single-level pruning: lang only ------------------------------
      val en = lake.filter($"lang" === "en").select($"doc_id", $"text", $"lang")
      assert(en.collect().length === 200) // drive THIS plan so its scan metrics fill
      val enScan = scanOf(en)
      assert(enScan.partitionFilters.map(_.sql).mkString(",").contains("lang"),
        s"lang predicate must be a partition filter, got: ${enScan.partitionFilters}")
      // the reader's own accounting: only lang=en files were planned in
      val enFiles = enScan.metrics("numFiles").value
      val unpruned = lake.select($"doc_id")
      unpruned.collect()
      val allFiles = scanOf(unpruned).metrics("numFiles").value
      assert(enFiles > 0 && enFiles < allFiles,
        s"pruned scan read $enFiles files, unpruned reads $allFiles")

      // ground truth: which files execution actually opened
      val touched = lake.filter($"lang" === "en")
        .select(input_file_name()).distinct().as[String].collect()
      assert(touched.nonEmpty && touched.forall(_.contains("lang=en")),
        s"scan touched non-matching partition files: ${touched.mkString("\n")}")

      // -- composed pruning: both partition levels -----------------------
      val cell = lake.filter($"lang" === "id" && $"run_id" === "r1")
      assert(cell.count() === 100)
      val cellTouched = cell.select(input_file_name()).distinct().as[String].collect()
      assert(cellTouched.forall(f => f.contains("lang=id") && f.contains("run_id=r1")),
        s"two-level pruning leaked: ${cellTouched.mkString("\n")}")

      // -- pruning composes with pushdown: data filter stays pushed ------
      val mixed = lake.filter($"lang" === "de" && $"doc_id" < 50)
      val mixedScan = scanOf(mixed.select($"doc_id"))
      assert(mixedScan.partitionFilters.map(_.sql).mkString(",").contains("lang"))
      assert(mixedScan.dataFilters.map(_.sql).mkString(",").contains("doc_id"),
        s"doc_id must remain a data filter for pushdown: ${mixedScan.dataFilters}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }
}
