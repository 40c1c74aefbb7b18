package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokenCount splits on single spaces") {
    assert(one("a b c").select(tokenCount($"text")).as[Long].head() === 3L)
  }

  test("subwordCount = alpha runs + digit runs + punct chars") {
    // "ab12, cd" -> ab | 12 | , | cd
    assert(one("ab12, cd").select(subwordCount($"text")).as[Long].head() === 4L)
  }

  test("langId picks the argmax marker language") {
    assert(one("el la de comida").select(langId($"text")).as[String].head() === "es")
    assert(one("der und ist gut").select(langId($"text")).as[String].head() === "de")
    assert(one("zzz qqq").select(langId($"text")).as[String].head() === "unknown")
  }

  test("langId resolves ties by fixed precedence (en first)") {
    assert(one("the el").select(langId($"text")).as[String].head() === "en")
  }

  test("uniqueRatio is distinct/total as exact-int division") {
    assert(one("a a b").select(uniqueRatio($"text")).as[Double].head() === 2.0 / 3)
  }

  test("meanTokenLen = non-space chars / tokens") {
    assert(one("ab cdef").select(meanTokenLen($"text")).as[Double].head() === 3.0)
  }

  test("fingerprint normalizes case and runs of spaces") {
    val df = Seq("Hello  World", "hello world").toDF("text")
    val fps = df.select(fingerprint($"text")).as[String].collect()
    assert(fps(0) === fps(1))
  }

  test("fingerprint distinguishes different content") {
    val fps = Seq("hello world", "hello worlds").toDF("text")
      .select(fingerprint($"text")).as[String].collect()
    assert(fps(0) !== fps(1))
  }
}
