package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The registered `format("keel")` source (graft.sources.KeelDataSource):
  * short-name resolution through META-INF/services, schema-from-header,
  * pruned reads, write-side header generation, and the full round trip. */
class KeelDataSourceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val toyDat =
    """@relation toy
      |@attribute x1 real [0.0, 10.0]
      |@attribute x2 real [0.0, 1.0]
      |@attribute cls {neg, pos}
      |@inputs x1, x2
      |@outputs cls
      |@data
      |0.5,0.10,neg
      |1.0,0.20,neg
      |5.0,0.55,pos
      |9.5,0.10,neg""".stripMargin

  private def writeToy(): String = {
    val p = Files.createTempFile("dsv1toy", ".dat")
    Files.writeString(p, toyDat)
    p.toString
  }

  test("format(\"keel\") resolves by short name and reads the typed schema") {
    val df = spark.read.format("keel").load(writeToy())
    assert(df.columns.toSeq === Seq("x1", "x2", "cls"))
    assert(df.schema("x1").dataType.typeName === "double")
    assert(df.schema("cls").dataType.typeName === "string")
    assert(df.count() === 4)
    // values equal the direct helper read
    val direct = graft.sources.Keel.read(spark, writeToy())
    assert(df.orderBy("x1").collect().toSeq ===
           direct.orderBy("x1").collect().toSeq)
  }

  test("pruned scan: single-column select and count(*) both work") {
    val path = writeToy()
    val one = spark.read.format("keel").load(path).select("cls")
    assert(one.collect().map(_.getString(0)).sorted.toSeq ===
           Seq("neg", "neg", "neg", "pos"))
    // empty projection must preserve row count
    assert(spark.read.format("keel").load(path).count() === 4)
  }

  test("filter pushdown: predicates prune rows AT THE SOURCE, not above it") {
    val path = writeToy()
    // end-to-end: the physical scan node must advertise the pushed filters
    val df = spark.read.format("keel").load(path)
      .filter(col("x1") > 0.9 && col("cls") === "neg")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }.getOrElse(fail("expected a RowDataSourceScanExec over the keel relation"))
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThan(x1,0.9)") &&
           pushed.contains("EqualTo(cls,neg)"),
      s"both predicates must reach the source, got: $pushed")
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq === Seq(1.0, 9.5))
    // source-level: buildScan itself must return the pruned row set — the
    // filters act BEFORE Spark's re-check, not only above the scan
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
    val rel = graft.sources.KeelRelation(path)(spark.sqlContext)
    val rows = rel.buildScan(Array("x1"),
      Array(GreaterThan("x1", 0.9), EqualTo("cls", "neg"))).collect()
    assert(rows.map(_.getDouble(0)).sorted.toSeq === Seq(1.0, 9.5))
    // untranslatable filters degrade to no pruning, never to wrong rows
    assert(rel.buildScan(Array("x1"), Array.empty).count() === 4)
  }

  test("write round trip: header generated from the frame, data survives") {
    val df = Seq((0.5, 0.1, "neg"), (1.0, 0.2, "neg"), (5.0, 0.55, "pos"))
      .toDF("x1", "x2", "cls")
    val out = Files.createTempDirectory("keelout").resolve("t.dat").toString
    df.write.format("keel")
      .option("relation", "roundtrip").option("outputCol", "cls")
      .mode("overwrite").save(out)
    val header = graft.sources.Keel.readHeader(spark, out)
    assert(header.relation === "roundtrip")
    assert(header.outputs === Seq("cls"))
    assert(header.attributes.find(_.name == "x1").get.range === Some((0.5, 5.0)))
    val back = spark.read.format("keel").load(out)
    assert(back.orderBy("x1").collect().toSeq === df.orderBy("x1").collect().toSeq)
  }

  test("save modes: ErrorIfExists throws on existing target, Ignore is a no-op") {
    val df = Seq((1.0, "a")).toDF("x", "cls")
    val out = Files.createTempDirectory("keelmode").resolve("m.dat").toString
    df.write.format("keel").mode("overwrite").save(out)
    intercept[Exception] {
      df.write.format("keel").mode("error").save(out)
    }
    // Ignore leaves the original intact
    val df2 = Seq((9.0, "b")).toDF("x", "cls")
    df2.write.format("keel").mode("ignore").save(out)
    val back = spark.read.format("keel").load(out)
    assert(back.collect().map(_.getDouble(0)).toSeq === Seq(1.0))
  }

  test("save modes: Append throws (one @data section) and must NOT clobber the target") {
    val df = Seq((1.0, "a")).toDF("x", "cls")
    val out = Files.createTempDirectory("keelappend").resolve("a.dat").toString
    df.write.format("keel").mode("overwrite").save(out)
    val df2 = Seq((9.0, "b")).toDF("x", "cls")
    intercept[UnsupportedOperationException] {
      df2.write.format("keel").mode("append").save(out)
    }
    // the refused append left the original data untouched
    val back = spark.read.format("keel").load(out)
    assert(back.collect().map(_.getDouble(0)).toSeq === Seq(1.0))
  }
}
