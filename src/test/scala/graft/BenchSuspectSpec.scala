package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's per-query outlier self-adjudication. Twice (r15's
  * one-shot 6.4s, r17's full-run 12.5s) a d57 weather spike polluted
  * the headline artifact and a human had to adjudicate it from
  * BENCH_HISTORY by hand; the bench now checks each query's min against
  * the median of its comparable history and emits a `suspect` block —
  * this spec is the required selftest that a synthetic spike produces
  * the marker, plus the cohort-filter and serialization pins that keep
  * the check honest (a band fed by noncomparable or foreign-cohort
  * lines would flag weather as regression and vice versa). */
class BenchSuspectSpec extends AnyFunSuite {

  private def tmpFile(content: String): String = {
    val p = java.nio.file.Files.createTempFile("benchsus", ".jsonl")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  /** A full history line built with the REAL serialization helpers —
    * the selftest must exercise the same shape main() emits, not a
    * hand-approximated one. */
  private def syntheticLine(d57Min: Double, clean: Boolean = true,
                            cpus: Int = 32, mode: String = "both",
                            sfDir: String = "/root/testdata/sf0.1"): String = {
    val cov = Bench.covariateJson(Some((1.0, 1.0, 1.0)), Some(0L))
    val body = s"""{${Bench.lineHead(mode, cpus, sfDir, cov, cov)},""" +
      s""""samples":{"d57_containment":[${d57Min + 0.4},$d57Min],"q01":[1.1,1.0]},""" +
      s""""queries":{"d57_containment":$d57Min,"q01":1.0},""" +
      s""""failed":[],"value":${d57Min + 1.0},""" +
      s"""${Bench.verdictFields(Some(if (clean) 0L else 9999L), Some(!clean))}}"""
    Bench.historyLine(body, "2026-08-14T00:00:00Z", "b" * 40, 1)
  }

  test("medianOf: odd takes the middle, even averages the two middles") {
    assert(Bench.medianOf(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.medianOf(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
    assert(Bench.medianOf(Seq(7.0)) === 7.0)
  }

  test("suspectsOf flags ratio+floor breaches only, against thick history only") {
    val hist = Map(
      "big"   -> Seq(4.0, 4.1, 3.9, 4.2, 4.0),   // median 4.0
      "tiny"  -> Seq(0.1, 0.1, 0.1, 0.1, 0.1),   // median 0.1
      "thin"  -> Seq(1.0, 1.0))                   // < SuspectMinHistory
    // the r17 case: 12.46 vs band ~4 -> flagged with the band evidence
    assert(Bench.suspectsOf(Map("big" -> 12.46), hist)
      === Map("big" -> ((4.0, 5))))
    // the r15 case: 6.4 vs band ~4 (1.6x) — the incident the 1.5 ratio
    // exists to catch (a 2.0 bar missed it on the real history replay)
    assert(Bench.suspectsOf(Map("big" -> 6.4), hist).keySet === Set("big"))
    // in band -> clean
    assert(Bench.suspectsOf(Map("big" -> 4.5), hist).isEmpty)
    // ratio breached but under the absolute floor: scheduler jitter on
    // a sub-second query must not flag (0.35 is 3.5x but only +0.25s)
    assert(Bench.suspectsOf(Map("tiny" -> 0.35), hist).isEmpty)
    // floor cleared but ratio not: a +1.1s drift to 1.28x on a 4s query
    // is the diffuse-weather band, not a spike
    assert(Bench.suspectsOf(Map("big" -> 5.1), hist).isEmpty)
    // thin history never flags; unknown query never flags
    assert(Bench.suspectsOf(Map("thin" -> 99.0, "new" -> 99.0), hist).isEmpty)
  }

  test("lineQueryMins takes per-sample mins from a comparable line") {
    val m = Bench.lineQueryMins(syntheticLine(4.0), 32, Some(0.1),
      headlineOrdered = true)
    assert(m === Map("d57_containment" -> 4.0, "q01" -> 1.0))
  }

  test("lineQueryMins rejects foreign-cohort and dirty lines") {
    val sf = Some(0.1)
    // a noncomparable line must NOT feed the band (its numbers carry the
    // disturbance the band exists to detect)
    assert(Bench.lineQueryMins(syntheticLine(4.0, clean = false), 32, sf, true).isEmpty)
    // wrong cpus / wrong sf / wrong headline cohort
    assert(Bench.lineQueryMins(syntheticLine(4.0, cpus = 8), 32, sf, true).isEmpty)
    assert(Bench.lineQueryMins(syntheticLine(4.0), 32, Some(0.01), true).isEmpty)
    assert(Bench.lineQueryMins(syntheticLine(4.0, mode = "unordered"), 32, sf, true).isEmpty)
    // an unordered headline compares against unordered lines only
    assert(Bench.lineQueryMins(syntheticLine(4.0, mode = "unordered"), 32, sf,
      headlineOrdered = false).nonEmpty)
    assert(Bench.lineQueryMins(syntheticLine(4.0), 32, sf,
      headlineOrdered = false).isEmpty)
    // no sf to match (hostile dir) -> no band, never a crash
    assert(Bench.lineQueryMins(syntheticLine(4.0), 32, None, true).isEmpty)
    // garbage lines are empty, never fatal
    assert(Bench.lineQueryMins("not json", 32, sf, true).isEmpty)
    assert(Bench.lineQueryMins("""{"cpus":32}""", 32, sf, true).isEmpty)
  }

  test("lineQueryMins reads the round-13 string-cpus and queries-only vintages") {
    val stringCpus =
      """{"mode":"both","cpus":"32","sf_num":0.1,""" +
        """"samples":{"q01":[2.0,1.5]},"noncomparable":false}"""
    assert(Bench.lineQueryMins(stringCpus, 32, Some(0.1), true)
      === Map("q01" -> 1.5))
    val queriesOnly =
      """{"mode":"both","cpus":32,"sf_num":0.1,""" +
        """"queries":{"q01":1.25},"noncomparable":false}"""
    assert(Bench.lineQueryMins(queriesOnly, 32, Some(0.1), true)
      === Map("q01" -> 1.25))
  }

  test("SELFTEST: a synthetic d57 spike over a clean history produces the marker") {
    // six comparable lines with d57 in its ~4s band, one dirty line and
    // one foreign-cohort line that must not dilute the median
    val hist = tmpFile((Seq(3.9, 4.0, 4.1, 4.2, 4.0, 4.05).map(syntheticLine(_)) ++
      Seq(syntheticLine(30.0, clean = false), syntheticLine(30.0, cpus = 8)))
      .mkString("", "\n", "\n"))
    val bands = Bench.historyBands(hist, 32, Some(0.1), headlineOrdered = true)
    assert(bands("d57_containment").size === 6)
    // the r17 driver capture replayed: d57 min 12.46 against the band
    val sus = Bench.suspectsOf(
      Map("d57_containment" -> 12.46, "q01" -> 1.05), bands)
    assert(sus.keySet === Set("d57_containment"),
      "the spiked query is flagged; the in-band one is not")
    val (med, n) = sus("d57_containment")
    assert(med === 4.025 && n === 6)
    // and an in-band run of the same history flags nothing
    assert(Bench.suspectsOf(
      Map("d57_containment" -> 4.5, "q01" -> 1.05), bands).isEmpty)
  }

  test("historyBands: missing file is empty, never fatal") {
    assert(Bench.historyBands("/no/such/file.jsonl", 32, Some(0.1), true).isEmpty)
  }

  test("suspectJson: names + per-query evidence + rerun, parseable, null-safe") {
    val j = JsonMethods.parse("{" + Bench.suspectJson(
      Map("d57_containment" -> ((4.025, 6))),
      Map("d57_containment" -> 12.46, "q01" -> 1.0),
      Map("d57_containment" -> 4.51), Some(65L)) + "}")
    assert(j \ "suspect" === JArray(List(JString("d57_containment"))))
    val d = j \ "suspect_detail" \ "d57_containment"
    assert(d \ "min" === JDouble(12.46))
    assert(d \ "band_median" === JDouble(4.025))
    assert(d \ "n" === JInt(6))
    assert(d \ "rerun" === JDouble(4.51))
    assert(j \ "rerun_steal_delta" === JInt(65))
    // the no-suspect / no-rerun shape: empty list+object, nulls
    val empty = JsonMethods.parse("{" + Bench.suspectJson(
      Map.empty, Map.empty, Map.empty, None) + "}")
    assert(empty \ "suspect" === JArray(Nil))
    assert(empty \ "suspect_detail" === JObject(Nil))
    assert(empty \ "rerun_steal_delta" === JNull)
    // a flagged query whose re-run did not happen (dirty covariates)
    // serializes rerun:null — "unadjudicated", distinct from "settled"
    val noRerun = JsonMethods.parse("{" + Bench.suspectJson(
      Map("q" -> ((1.0, 9))), Map("q" -> 3.0), Map.empty, None) + "}")
    assert(noRerun \ "suspect_detail" \ "q" \ "rerun" === JNull)
  }
}
