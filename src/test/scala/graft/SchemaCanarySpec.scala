package graft

import org.apache.spark.sql.types._

/** Canary for driver-side testdata schema drift. The driver regenerates
  * /root/testdata between rounds and the physical column types are not
  * stable across generations — on 2026-08-13 events.ts silently changed
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)/NTZ and surfaced as three
  * unrelated-looking analysis errors deep inside query plans. This spec
  * asserts, per table, the exact post-loader logical schema every query
  * in the registry is written against, so the next drift fails HERE with
  * a one-line diff naming the table and column instead.
  *
  * Deliberately checks the NORMALIZED schema (through `Tables`, the only
  * supported read path), not the raw parquet footer: the loader is
  * allowed to absorb physical-type drift (that is its job — see
  * TablesSpec for the events vintages); what must never drift unnoticed
  * is the surface the queries consume.
  */
class SchemaCanarySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def expect(table: String, want: (String, DataType)*): Unit = {
    val got = Tables.all(spark, sf)(table).schema
      .map(f => f.name -> f.dataType)
    assert(got === want.toSeq,
      s"$table schema drifted — update the query registry deliberately, " +
        "or absorb the physical change in Tables like the events vintages")
  }

  test("normalized testdata schemas match what the query registry consumes") {
    expect("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    expect("nation", "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    expect("customer", "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    expect("supplier", "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    expect("part", "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    expect("orders", "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType)
    expect("lineitem", "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
    expect("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    expect("embeddings", "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
    expect("events", "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType, "ts_us" -> LongType)
  }

  test("date-bearing columns stay timestamp-or-date (both oracle-portable)") {
    // The queries use to_date()/date_trunc() on these; either physical
    // type works and DuckDB agrees on both, so pin only the family.
    for ((t, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val dt = Tables.all(spark, sf)(t).schema(c).dataType
      assert(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
        s"$t.$c is $dt — neither date nor timestamp; queries and oracle both break")
    }
  }
}
