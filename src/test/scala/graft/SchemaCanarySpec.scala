package graft

import org.apache.spark.sql.types._

/** Canary for driver-side testdata schema drift. The driver regenerates
  * /root/testdata between rounds and the physical column types are not
  * stable across generations — on 2026-08-13 events.ts silently changed
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)/NTZ and surfaced as three
  * unrelated-looking analysis errors deep inside query plans. This spec
  * asserts, per table, the post-loader logical schema every query in the
  * registry is written against, so the next drift fails HERE with a
  * one-line diff naming the table and column instead.
  *
  * Runs over ALL THREE scale-factor dirs, not just sf0.001: each dir is
  * regenerated independently by the driver, the correctness gate reads
  * sf0.01, and the bench reads sf0.1 — a drift confined to a larger SF
  * would bypass an sf0.001-only canary. Schema-only reads (parquet
  * footers, no data) keep this sub-second per dir.
  *
  * Most columns are pinned to an EXACT type; the two date-bearing columns
  * (o_orderdate, l_shipdate) are deliberately pinned only to the
  * date-or-timestamp FAMILY, because the queries use to_date()/
  * date_trunc() on them and both the plans and the DuckDB oracle agree on
  * any member — a physical flip among DATE/TIMESTAMP/TIMESTAMP_NTZ there
  * is absorbable and should not fail the canary.
  *
  * Deliberately checks the NORMALIZED schema (through `Tables`, the only
  * supported read path), not the raw parquet footer: the loader is
  * allowed to absorb physical-type drift (that is its job — see
  * TablesSpec for the events vintages); what must never drift unnoticed
  * is the surface the queries consume.
  */
class SchemaCanarySpec extends SparkSpec {

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private sealed trait Pin { def ok(dt: DataType): Boolean; def show: String }
  private case class Exact(dt: DataType) extends Pin {
    def ok(got: DataType): Boolean = got == dt
    def show: String               = dt.toString
  }
  private case object DateLike extends Pin {
    def ok(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == TimestampNTZType
    def show: String = "date-or-timestamp (any of Date/Timestamp/TimestampNTZ)"
  }
  import scala.language.implicitConversions
  private implicit def exactPin(dt: DataType): Pin = Exact(dt)

  private def expect(sf: String, table: String, want: (String, Pin)*): Unit = {
    val got = Tables.all(spark, sf)(table).schema.map(f => f.name -> f.dataType)
    assert(got.map(_._1) === want.map(_._1).toSeq,
      s"$table column set drifted ($sf) — update the query registry " +
        "deliberately, or absorb the physical change in Tables like the " +
        "events vintages")
    for (((name, dt), (_, pin)) <- got.zip(want))
      assert(pin.ok(dt),
        s"$table.$name is $dt, want ${pin.show} ($sf) — update the query " +
          "registry deliberately, or absorb the physical change in Tables " +
          "like the events vintages")
  }

  for (sf <- sfDirs)
    test(s"normalized schemas match what the query registry consumes ($sf)") {
      expect(sf, "region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
      expect(sf, "nation", "n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType)
      expect(sf, "customer", "c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType)
      expect(sf, "supplier", "s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
      expect(sf, "part", "p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
      expect(sf, "orders", "o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> DateLike,
        "o_orderpriority" -> StringType)
      expect(sf, "lineitem", "l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> DateLike)
      expect(sf, "documents", "doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
      expect(sf, "embeddings", "vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
      expect(sf, "events", "event_id" -> LongType, "ts" -> TimestampType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType, "ts_us" -> LongType)
    }
}
