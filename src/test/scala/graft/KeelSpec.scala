package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Keel
import java.nio.file.Files

/** KEEL `.dat` format parity (the reference's data I/O, [P1 §5.1]):
  * header parsing, declared ranges → fuzzy partitions, missing values,
  * round-trip write/read, and end-to-end KEEL → ChiCSClassifier. */
class KeelSpec extends AnyFunSuite {
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
      |2.0,0.15,neg
      |2.5,0.90,neg
      |4.8,0.50,neg
      |5.2,0.45,neg
      |9.0,0.80,neg
      |9.5,0.10,neg
      |5.0,0.55,pos
      |5.1,0.95,pos""".stripMargin

  private def writeToy(): String = {
    val p = Files.createTempFile("toy", ".dat")
    Files.writeString(p, toyDat)
    p.toString
  }

  test("header parse: types, declared ranges, nominal dictionary, io lists") {
    val h = Keel.parseHeader(toyDat)
    assert(h.relation === "toy")
    assert(h.attributes.map(_.name) === Seq("x1", "x2", "cls"))
    assert(h.attributes(0).range === Some((0.0, 10.0)))
    assert(h.attributes(2).nominalValues === Some(Seq("neg", "pos")))
    assert(h.inputs === Seq("x1", "x2") && h.outputs === Seq("cls"))
    val parts = h.partitions()
    assert(parts("x1").centers === IndexedSeq(0.0, 5.0, 10.0))
    assert(parts("x2").halfWidth === 0.5)
  }

  test("read: typed rows, header skipped, missing values as null") {
    val p = Files.createTempFile("miss", ".dat")
    Files.writeString(p,
      "@relation m\n@attribute a real [0,1]\n@attribute c {x,y}\n@data\n0.5,x\n?,y\n0.25,<null>")
    val df = Keel.read(spark, p.toString)
    val rows = df.collect()
    assert(rows.length === 3)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(1))
    assert(df.schema("a").dataType.typeName === "double")
  }

  test("KEEL → ChiCSClassifier end-to-end equals direct DataFrame fit") {
    val path = writeToy()
    val h = Keel.readHeader(spark, path)
    val df = Keel.read(spark, path)
      .withColumn("label", when(col("cls") === "pos", 1).otherwise(0))
    val ranges = h.inputs.flatMap { f =>
      val r = h.attributes.find(_.name == f).get.range.get
      Seq(r._1, r._2)
    }.toArray
    val m = new graft.engine.chi.ChiCSClassifier()
      .setFeatureCols(h.inputs.toArray).setLabelCol("label")
      .setFeatureRanges(ranges)
      .fit(df)
    // same rule base as the golden fixture's direct fit
    val direct = new graft.engine.chi.ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setFeatureRanges(Array(0.0, 10.0, 0.0, 1.0))
      .fit(Seq((0.5, 0.10, 0), (1.0, 0.20, 0), (2.0, 0.15, 0), (2.5, 0.90, 0),
               (4.8, 0.50, 0), (5.2, 0.45, 0), (9.0, 0.80, 0), (9.5, 0.10, 0),
               (5.0, 0.55, 1), (5.1, 0.95, 1)).toDF("x1", "x2", "label"))
    assert(m.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq ===
           direct.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq)
  }

  test("generateHeader (R11 descriptor pass) + render + write round-trip") {
    val df = Seq((1.0, "a"), (3.5, "b"), (2.0, "a")).toDF("v", "c")
    val h = Keel.generateHeader(df, "gen", "c")
    assert(h.attributes.find(_.name == "v").get.range === Some((1.0, 3.5)))
    assert(h.attributes.find(_.name == "c").get.nominalValues === Some(Seq("a", "b")))
    val out = Files.createTempDirectory("keel").toString + "/gen.dat"
    Keel.write(df, h, out)
    val back = Keel.read(spark, out)
    assert(back.count() === 3)
    assert(back.schema("v").dataType.typeName === "double")
    assert(back.orderBy("v").collect().map(_.getDouble(0)).toSeq === Seq(1.0, 2.0, 3.5))
  }

  test("generateHeader fails fast on a high-cardinality string column (driver OOM guard)") {
    // a unique-id string column is NOT a nominal dictionary — the guard must
    // fire from the distributed estimate BEFORE any driver-side collect
    val df = spark.range(0, 50000)
      .selectExpr("CAST(id AS DOUBLE) AS v", "CONCAT('id_', id) AS c")
    val e = intercept[IllegalArgumentException] {
      Keel.generateHeader(df, "gen", "c")
    }
    assert(e.getMessage.contains("distinct values"))
    assert(e.getMessage.contains("'c'"))
  }
}
