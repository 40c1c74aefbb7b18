package graft

import org.apache.spark.sql.functions._
import graft.expressions.QCosine
import graft.functions.{Planes, Similarity}
import graft.functions.Similarity._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("shingles produce overlapping word n-grams") {
    val out = Seq("a b c d").toDF("text")
      .select(split($"text", " ").as("w"))
      .select(shingles($"w", 2).as("s"))
      .as[Seq[String]].head()
    assert(out === Seq("a b", "b c", "c d"))
  }

  test("shingles of a too-short token array is empty, not garbage") {
    val out = Seq("a b", "a", "").toDF("text")
      .select(split($"text", " ").as("w"))
      .select(shingles($"w", 3).as("s"))
      .as[Seq[String]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("quantize floors to integer thousandths") {
    val out = Seq(Tuple1(Array(0.0015f, -0.5f, 1.0f))).toDF("e")
      .select(quantize($"e").as("q")).as[Seq[Long]].head()
    assert(out === Seq(1L, -500L, 1000L))
  }

  test("qdot is the exact integer dot product") {
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(qdot($"a", $"b")).as[Long].head() === 32L)
  }

  test("qcosine matches the declared IEEE shape; orthogonal is exactly 0.0") {
    val df = Seq(
      (Array(2L, 4L), Array(1L, 2L)),
      (Array(1L, 0L), Array(0L, 7L))
    ).toDF("a", "b")
    val out = df.select(
      qcosine(qdot($"a", $"b"), qdot($"a", $"a"), qdot($"b", $"b"))).as[Double].collect()
    // dot/(sqrt(na)*sqrt(nb)) — the exact expression the oracle replays;
    // for (10,20,5) that is 10/(sqrt(20)*sqrt(5)), NOT exactly 1.0.
    assert(out(0) === 10.0 / (math.sqrt(20.0) * math.sqrt(5.0)))
    assert(out(0) > 0.999999999 && out(0) <= 1.0)
    assert(out(1) === 0.0)
  }

  test("QCosine expression matches the declarative qcosine bit-for-bit") {
    val vecs = (1 to 50).map { i =>
      (Array.tabulate(16)(d => ((i * 31 + d * 17) % 2001 - 1000).toLong),
       Array.tabulate(16)(d => ((i * 13 + d * 7) % 2001 - 1000).toLong))
    }
    val df = vecs.toDF("a", "b")
    val decl = df.select(
      qcosine(qdot($"a", $"b"), qdot($"a", $"a"), qdot($"b", $"b")).as("c")).as[Double].collect()
    val expr = df.select(QCosine($"a", $"b").as("c")).as[Double].collect()
    assert(decl.toSeq === expr.toSeq)
  }

  test("QCosine is null on length mismatch or null input") {
    val df = Seq(
      (Array(1L, 2L), Array(1L, 2L, 3L)),
      (null.asInstanceOf[Array[Long]], Array(1L))
    ).toDF("a", "b")
    val out = df.select(QCosine($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("hamming counts differing bits") {
    val df = Seq((0x0fL, 0xf0L), (5L, 5L)).toDF("a", "b")
    assert(df.select(hamming($"a", $"b")).as[Long].collect().toSeq === Seq(8L, 0L))
  }

  test("simhash votes are ±1 and assemble into a 16-bit hash") {
    val df = Seq("tok").toDF("t")
    val vote = df.select(simhashVote($"t", 0)).as[Long].head()
    assert(vote === 1L || vote === -1L)
    val hash = df.select(simhashFromVotes((0 until 16).map(b => simhashVote($"t", b))))
      .as[Long].head()
    assert(hash >= 0L && hash < (1L << 16))
  }

  test("Planes coefficients are deterministic and bounded") {
    val p = Planes.planes(4, 8)
    assert(p === Planes.planes(4, 8))
    assert(p.flatten.forall(c => c >= -1000 && c <= 1000))
    assert(Planes.coeff(0, 1) === Planes.coeff(0, 1))
    // not all-equal (sanity that hashing actually varies)
    assert(p.flatten.distinct.size > 1)
  }

  test("duckHexToLong agrees with Spark conv() on md5 prefixes") {
    // Evaluate the generated DuckDB SQL shape in Spark: DuckDB's
    // strpos(haystack, needle) is Spark's instr(haystack, needle).
    val df = Seq("abc", "xyz").toDF("t").select(md5($"t").as("h"))
    val viaConv = df.select(conv(substring($"h", 1, 2), 16, 10).cast("long")).as[Long].collect()
    val manual = df.select(
      ((expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
       (expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)).cast("long")
    ).as[Long].collect()
    assert(viaConv.toSeq === manual.toSeq)
    // and the generator emits that exact arithmetic
    assert(Similarity.duckHexToLong("h", 2).contains("strpos"))
  }
}
