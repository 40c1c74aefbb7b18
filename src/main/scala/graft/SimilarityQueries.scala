package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.embeddings
import graft.expressions.QCosine
import graft.functions.Planes
import graft.functions.Similarity._

/** Similarity search over `embeddings`:
  *
  *   - s60 brute-force cosine top-k  (declarative higher-order functions)
  *   - s61 sign-LSH bucketed ANN     (the 100 TB path: equality join on
  *                                    hyperplane-sign buckets, then exact
  *                                    re-rank of candidates only)
  *   - s62 per-label centroids       (the IVF "training" step)
  *   - s63 brute-force via the QCosine codegen Expression (same semantics
  *                                    as s60, fused-kernel physical path)
  *
  * All cosine math runs on quantized integer vectors (Similarity.quantize)
  * so results are exact and the DuckDB oracles replay them bit-for-bit.
  * The LSH hyperplanes are md5-derived integers embedded as literals in
  * both plans — no RNG, reproducible on any engine.
  */
object SimilarityQueries {

  private val NPLANES = 8
  private val DIMS = 64
  private val NQUERIES = 20

  /** (vec_id, q: array<long>, nrm: long), zero-norm vectors EXCLUDED:
    * a vector quantizing to all zeros has no defined cosine, and the two
    * engines disagree on 0/0 (Spark: NaN, DuckDB: NULL) — filtering
    * nrm > 0 on BOTH sides keeps the oracle exact and the semantics
    * honest ("no direction, no neighbors"). */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("q"))
      .withColumn("nrm", qdot(col("q"), col("q")))
      .filter(col("nrm") > 0)

  private val duckQuantized = """
        q AS (SELECT vec_id, label,
                     list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
              FROM embeddings),
        n AS (SELECT * FROM (
              SELECT vec_id, label, q,
                     CAST(list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * q[i])) AS BIGINT) AS nrm
              FROM q) WHERE nrm > 0)"""

  private val duckCos =
    """CAST(list_sum(list_transform(range(1, len(a.q) + 1), i -> a.q[i] * b.q[i])) AS DOUBLE)
                 / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))"""

  private def topkSql(candJoin: String, k: Int): String = s"""
        WITH $duckQuantized,
        p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     $duckCos AS cosine
              FROM n a JOIN n b ON $candJoin)
        SELECT query_id, neighbor_id, rank, cosine
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, neighbor_id) AS rank
              FROM p)
        WHERE rank <= $k
        ORDER BY query_id, rank"""

  /** Sign-LSH bucket assignment, parameterized by hyperplane count —
    * the s61 scale knob. Buckets = 2^nplanes; per-bucket candidate
    * pairs grow as (n / 2^nplanes)^2, so nplanes must grow with
    * log2(n / target-bucket-size) to hold per-bucket cost constant as
    * the corpus grows, while each added plane cuts recall (the s-curve
    * trade measured against brute force in SimilaritySpec at 4 vs 8
    * planes). Exposed for specs to count bucket occupancy directly. */
  private[graft] def lshBuckets(nplanes: Int)(s: SparkSession, dir: String): DataFrame = {
    val pl = Planes.planes(nplanes, DIMS)
    val bucketCol = pl.zipWithIndex.map { case (cs, p) =>
      when(qdot(typedlit(cs), col("q")) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    quantized(s, dir).withColumn("bucket", bucketCol)
  }

  /** s61 core at a given plane count: equality self-join on the bucket,
    * exact re-rank of bucket-mates only. */
  private[graft] def lshAnn(nplanes: Int)(s: SparkSession, dir: String): DataFrame = {
    val b = lshBuckets(nplanes)(s, dir)
    val pairs = b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("cosine",
        qcosine(qdot(col("a.q"), col("b.q")), col("a.nrm"), col("b.nrm")))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"), col("cosine"))
    rankTopK(pairs, 3)
  }

  /** Shared Spark top-k-per-query over a candidate pair frame. */
  private def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  /** IVF ANN, shared by s64 (nprobe=1) and s65 (nprobe=2): coarse
    * quantizer = per-label centroids (the s62 "training" output), probe
    * the `nprobe` nearest cells, exact re-rank inside them. nprobe is
    * the recall/cost knob: scanned rows scale by nprobe/ncells. */
  private def ivfAnn(nprobe: Int)(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    // centroid per label as an ordered long array + its norm
    val cent = e
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("cn"))
      .withColumn("ci",
        floor(col("sv").cast("double") / col("cn") * 1024).cast("long"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("ci")))),
                     x => x.getField("ci")).as("c"))
      .withColumn("cnrm", qdot(col("c"), col("c")))
      // all-zero centroid (degenerate cell) has no probe direction; both
      // engines must drop it or 0-division semantics diverge (NaN vs NULL)
      .filter(col("cnrm") > 0)
    val qs = e.filter(col("vec_id") < NQUERIES)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qn"))
    // probe: nprobe nearest centroids per query (tiny cross join, broadcast)
    val wBest = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cell"))
    val probed = qs.crossJoin(broadcast(cent.select(col("label").as("cell"),
                                                    col("c"), col("cnrm"))))
      .withColumn("score",
        qdot(col("qq"), col("c")).cast("double") /
          sqrt(col("cnrm").cast("double")))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") <= nprobe)
      .select("query_id", "qq", "qn", "cell")
    // exact re-rank within the probed cells only
    val pairs = broadcast(probed)
      .join(e, col("label") === col("cell") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", qcosine(qdot(col("qq"), col("q")), col("qn"), col("nrm")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
    rankTopK(pairs, 5)
  }

  /** DuckDB twin of [[ivfAnn]] — same parameterization. */
  private def duckIvfAnn(nprobe: Int): String = s"""
        WITH $duckQuantized,
        x AS (SELECT label, unnest(range(1, len(q) + 1)) AS dim_idx, unnest(q) AS v FROM n),
        cm AS (SELECT label, dim_idx, SUM(v) AS sv, COUNT(*) AS cn
               FROM x GROUP BY label, dim_idx),
        cent AS (SELECT label,
                        list(CAST(FLOOR(CAST(sv AS DOUBLE) / cn * 1024) AS BIGINT)
                             ORDER BY dim_idx) AS c
                 FROM cm GROUP BY label),
        centn AS (SELECT * FROM (
                  SELECT label AS cell, c,
                         CAST(list_sum(list_transform(range(1, len(c) + 1), i -> c[i] * c[i])) AS BIGINT) AS cnrm
                  FROM cent) WHERE cnrm > 0),
        qs AS (SELECT vec_id AS query_id, q AS qq, nrm AS qn FROM n WHERE vec_id < $NQUERIES),
        scores AS (SELECT query_id, qq, qn, cell,
                          CAST(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * c[i])) AS DOUBLE)
                            / sqrt(CAST(cnrm AS DOUBLE)) AS score
                   FROM qs, centn),
        probed AS (SELECT query_id, qq, qn, cell
                   FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                                      ORDER BY score DESC, cell) AS rn
                         FROM scores)
                   WHERE rn <= $nprobe),
        p AS (SELECT a.query_id, b.vec_id AS neighbor_id,
                     CAST(list_sum(list_transform(range(1, len(a.qq) + 1), i -> a.qq[i] * b.q[i])) AS DOUBLE)
                       / (sqrt(CAST(a.qn AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cosine
              FROM probed a JOIN n b ON b.label = a.cell AND b.vec_id <> a.query_id)
        SELECT query_id, neighbor_id, rank, cosine
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, neighbor_id) AS rank
              FROM p)
        WHERE rank <= 5
        ORDER BY query_id, rank"""

  def defs: Seq[QueryDef] = Seq(

    // ---- s60: brute-force top-5 for a query set (HOF path) --------------
    QueryDef("s60_ann_bruteforce",
      (s, dir) => {
        val e = quantized(s, dir)
        val qs = e.filter(col("vec_id") < NQUERIES)
          .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nrm").as("qn"))
        val pairs = broadcast(qs)
          .join(e, col("vec_id") =!= col("query_id"))
          .withColumn("cosine", qcosine(qdot(col("qq"), col("q")), col("qn"), col("nrm")))
          .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
        rankTopK(pairs, 5)
      },
      Some(topkSql(s"a.vec_id < $NQUERIES AND b.vec_id <> a.vec_id", 5))),

    // ---- s61: sign-LSH bucketed ANN (equality join on bucket) -----------
    // NPLANES=8 fits the test corpus (≈2^9 docs / 2^8 buckets); see
    // lshBuckets for the log2(n) scaling rule a deployment must apply.
    QueryDef("s61_ann_lsh",
      lshAnn(NPLANES),
      Some {
        val pl = Planes.planes(NPLANES, DIMS)
        val bucketExpr = pl.zipWithIndex.map { case (cs, p) =>
          val lst = cs.mkString("[", ", ", "]")
          s"(CASE WHEN list_sum(list_transform(range(1, len(q) + 1), i -> ($lst)[i] * q[i])) > 0 THEN ${1L << p} ELSE 0 END)"
        }.mkString(" + ")
        s"""
        WITH $duckQuantized,
        bk AS (SELECT vec_id, q, nrm, CAST($bucketExpr AS BIGINT) AS bucket FROM n),
        p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     $duckCos AS cosine
              FROM bk a JOIN bk b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id)
        SELECT query_id, neighbor_id, rank, cosine
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, neighbor_id) AS rank
              FROM p)
        WHERE rank <= 3
        ORDER BY query_id, rank"""
      }),

    // ---- s62: per-label centroids of quantized embeddings (IVF step) ----
    QueryDef("s62_label_centroids",
      (s, dir) => quantized(s, dir)
        .select(col("label"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim_idx"))
        .agg(count(lit(1)).as("n"),
             (sum(col("v")).cast("double") / count(lit(1))).as("mean_q"))
        .orderBy("label", "dim_idx"),
      Some(s"""
        WITH $duckQuantized,
        x AS (SELECT label, unnest(range(1, len(q) + 1)) AS dim_idx, unnest(q) AS v FROM n)
        SELECT label, dim_idx, COUNT(*) AS n,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_q
        FROM x GROUP BY label, dim_idx ORDER BY label, dim_idx""")),

    // ---- s64: IVF-style ANN — probe the nearest cell (nprobe=1). The
    //      scale path for clustered corpora: the centroid table is tiny
    //      and broadcast; each query scans ONE cell instead of the corpus
    //      (cells partition the data, so at 100 TB each probe is a
    //      partition-pruned scan).
    //      Determinism: centroids quantized to exact longs
    //      (floor(mean * 2^10); mean is one IEEE division of exact ints —
    //      2^10 keeps |ci| <= ~2^20, so the 64-dim norm stays <= ~2^46,
    //      far inside Long; 2^20 scale could overflow BIGINT on
    //      adversarial data), cell scores = integer dot / sqrt — identical
    //      doubles on any engine; ties broken by label.
    QueryDef("s64_ann_ivf", ivfAnn(1), Some(duckIvfAnn(1))),

    // ---- s65: multi-probe IVF — probe the 2 nearest cells ---------------
    //      The recall/cost knob every IVF deployment tunes: probing
    //      nprobe cells multiplies scanned rows by nprobe/ncells while
    //      recovering neighbors that sit just across a cell boundary.
    QueryDef("s65_ann_ivf_multiprobe", ivfAnn(2), Some(duckIvfAnn(2))),

    // ---- s63: brute-force top-5 via the QCosine codegen Expression ------
    QueryDef("s63_ann_codegen",
      (s, dir) => {
        val e = quantized(s, dir)
        val qs = e.filter(col("vec_id") < NQUERIES)
          .select(col("vec_id").as("query_id"), col("q").as("qq"))
        val pairs = broadcast(qs)
          .join(e, col("vec_id") =!= col("query_id"))
          .withColumn("cosine", QCosine(col("qq"), col("q")))
          .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
        rankTopK(pairs, 5)
      },
      Some(topkSql(s"a.vec_id < $NQUERIES AND b.vec_id <> a.vec_id", 5))))
}
