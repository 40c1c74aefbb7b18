package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity / locality-sensitive-hashing primitives.
  *
  * Everything is built on md5 (identical bytes-in/hex-out on any engine)
  * and integer arithmetic, so the whole LSH pipeline — signatures, bands,
  * candidate generation — is bit-reproducible: a DuckDB oracle replays it
  * exactly, and a re-run on another cluster dedups identically. No seeded
  * JVM RNG anywhere (a JVM Random would make results unreproducible
  * outside the JVM).
  *
  * Scale design: these primitives are used in band-join pipelines
  * (explode -> groupBy -> self-join on band key), never all-pairs. The
  * shuffle widths are bounded by (docs x bands) and candidate pairs, which
  * at 100 TB is the difference between feasible and impossible.
  */
object Similarity {

  /** Word n-gram shingles of a pre-split token array column. Total: rows
    * with fewer than n tokens yield an EMPTY array (an unguarded
    * sequence(0, size-n) would count down and emit null-padded garbage
    * grams). Built from the passed Column (not a hardcoded name): `get` is
    * 0-based and in-bounds for i in [0, size-n], j in [0, n) — no ANSI
    * throw. */
  def shingles(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n), i =>
        concat_ws(" ", (0 until n).map(j => get(words, i + j)): _*)))
      .otherwise(typedLit(Seq.empty[String]))

  /** One MinHash value: the lexicographic minimum of md5(seed|shingle)
    * over the document's shingle set. K independent hash functions come
    * from K distinct seed prefixes — standard MinHash, portable because
    * min-of-hex-strings is total-ordered identically everywhere. */
  def minhashAgg(shingle: Column, seed: Int): Column =
    min(md5(concat(lit(s"$seed|"), shingle)))

  /** Band key over a slice of signature columns (banding for LSH:
    * docs agreeing on all rows of any band become candidates). */
  def bandKey(sig: Seq[Column]): Column = md5(concat_ws("|", sig: _*))

  /** Quantize a float embedding to exact integers: floor(x * 1000) per
    * dimension (computed in double; float->double is exact, so every
    * engine floors the same value). All downstream dot products and norms
    * are then integer-exact, and the final cosine is a deterministic IEEE
    * expression over exact integers — cross-engine reproducible, and
    * 4x smaller shuffles than raw doubles. */
  def quantize(embedding: Column): Column =
    transform(embedding, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors (sequential fold,
    * overflow-safe: |q| <= ~1000 => |dot| <= 64M, far inside long). */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine from exact integer dot/norms: dot / (sqrt(na) * sqrt(nb)).
    * Single well-defined IEEE expression => identical on any engine. */
  def qcosine(dot: Column, normA: Column, normB: Column): Column =
    dot.cast("double") / (sqrt(normA.cast("double")) * sqrt(normB.cast("double")))

  /** SimHash bit b of a token: the low bit of hex digit b of md5(token).
    * 16 bits; portable to SQL as (strpos('0123..f', substr(md5,b+1,1))-1)%2. */
  def simhashBit(token: Column, b: Int): Column =
    simhashBitFromHex(md5(token), b)

  /** SimHash bit b from an ALREADY-COMPUTED md5 hex column — project the
    * md5 once and derive all 16 bits from it, instead of 16 md5 calls
    * per token (aggregate update expressions don't share subexpressions
    * the way a single projection does). */
  def simhashBitFromHex(hex: Column, b: Int): Column =
    (conv(substring(hex, b + 1, 1), 16, 10).cast("long") % 2)

  /** Per-token SimHash vote contribution for bit b: +1 / -1. */
  def simhashVote(token: Column, b: Int): Column =
    simhashBit(token, b) * 2 - 1

  /** Vote from a pre-computed md5 hex column (see simhashBitFromHex). */
  def simhashVoteFromHex(hex: Column, b: Int): Column =
    simhashBitFromHex(hex, b) * 2 - 1

  /** Assemble a 16-bit SimHash from 16 vote columns (sum>0 => bit set). */
  def simhashFromVotes(votes: Seq[Column]): Column =
    votes.zipWithIndex.map { case (v, b) =>
      when(v > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two small integer hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  // ---- portable SQL generators (the DuckDB side of the same ops) --------

  /** DuckDB: first `n` hex chars of an md5 hex string -> BIGINT
    * (DuckDB has no conv(); this expands to positional strpos arithmetic). */
  def duckHexToLong(md5Expr: String, n: Int): String =
    (1 to n).map { j =>
      val p = math.pow(16, n - j).toLong
      s"(strpos('0123456789abcdef', substr($md5Expr, $j, 1)) - 1) * ${p}"
    }.mkString("(", " + ", ")")

  /** DuckDB: word n-gram shingle list from a token list column `w`. */
  def duckShingles(n: Int): String = {
    val parts = (0 until n).map(i => s"w[i+$i]").mkString(" || ' ' || ")
    s"list_transform(range(1, len(w) - ${n - 2}), i -> $parts)"
  }
}
