package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, IntegerType, MapType}
import org.scalatest.funsuite.AnyFunSuite

/** The output-type protocol (Relational1 Scaladoc / SURVEY.md §7.4 addendum),
  * enforced for EVERY registered query — oracle-checked or not, because the
  * driver loads every query's parquet dump into pandas and sorts it:
  *
  *   - no DecimalType output column: Spark renders SUM(DECIMAL(18,2)) as
  *     decimal(28,2), DuckDB as decimal(38,2); the driver hashes reprs, so
  *     trailing-zero/scale drift flips correct values red (8 round-1 fails).
  *     Decimals stay internal; the final projection casts to double/long.
  *   - no ArrayType / MapType output column: pandas sort_values throws
  *     "unhashable type: numpy.ndarray" before any compare (q33/x05 round 1).
  *
  * Schema inspection only (no job runs) for the lazy queries; the handful of
  * eagerly-materializing operators (x24's fixpoint loop, x06's fit, the
  * streaming twins) do execute at sf0.001 — that cost buys the guarantee that
  * the whole registry stays driver-comparable.
  */
class OutputContractSpec extends AnyFunSuite {
  import TestSpark.spark

  private def offending(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case _: ArrayType   => true
    case _: MapType     => true
    // int32 outputs depend on both load paths agreeing on width (ADVICE r2's
    // x05 note): integral output columns must be BIGINT end to end.
    case IntegerType    => true
    case _              => false
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name output schema is driver-comparable (no decimal/array/map)") {
      val schema = fn(spark, TestSpark.sfSmoke).schema
      val bad = schema.fields.filter(f => offending(f.dataType))
      assert(bad.isEmpty,
        s"$name emits non-portable output columns: " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    }
  }

  // x106's contract includes the malformed-row policy (NULL, not error) —
  // the testdata is all well-formed, so pin the policy on hostile inputs
  test("x106's typed JSON parse NULLs malformed/missing rows instead of erroring") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("""{"k": 7}""", """{"k": "notanint"}""", "not json at all",
                 """{"other": 1}""", null)
      .toDF("props")
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", IntegerType)))).as("p"))
    val agg = df.agg(count(lit(1)).as("cnt"), count(col("p.k")).as("parsed"),
                     sum(col("p.k")).as("sum_k")).head()
    assert(agg.getLong(0) === 5)
    assert(agg.getLong(1) === 1, "only the well-formed integer row parses")
    assert(agg.getLong(2) === 7L)
  }
}
