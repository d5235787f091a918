package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.chi.ChiCore.TriPartition

/** KEEL dataset format support — the reference's data I/O (López et al. 2015
  * §5.1: ARFF-like header + CSV rows). A user of the reference can point this
  * reader at their existing `.dat` files and run the same pipeline here.
  *
  * Header grammar handled:
  * {{{
  * @relation <name>
  * @attribute <name> real [lo, hi]        (also: integer [lo, hi])
  * @attribute <name> {v1, v2, ...}        (nominal)
  * @inputs a, b, ...
  * @outputs cls
  * @data
  * v1,v2,...                              (CSV rows; '?'/'<null>' = missing)
  * }}}
  *
  * Scale posture: only the header is parsed on the driver (a few KB); the
  * `@data` section streams through Spark's distributed CSV reader with an
  * explicit schema — no driver-side row handling, arbitrary file size.
  */
object Keel {

  /** One declared attribute: numeric with a range, or nominal with values. */
  final case class KeelAttribute(name: String, dataType: DataType,
                                 range: Option[(Double, Double)],
                                 nominalValues: Option[Seq[String]])

  final case class KeelHeader(relation: String, attributes: Seq[KeelAttribute],
                              inputs: Seq[String], outputs: Seq[String]) {
    def schema: StructType =
      StructType(attributes.map(a => StructField(a.name, a.dataType, nullable = true)))
    /** Fuzzy partitions from the DECLARED ranges (the reference derives the
      * DataBase from the header, not the data — [P1 §4.2]). */
    def partitions(numLabels: Int = 3): Map[String, TriPartition] =
      attributes.collect { case KeelAttribute(n, _, Some((lo, hi)), _) =>
        n -> TriPartition(lo, hi, numLabels)
      }.toMap
  }

  private val attrNumeric =
    """(?i)@attribute\s+(\S+)\s+(real|integer)\s*\[\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)\s*\]""".r
  private val attrNominal = """(?i)@attribute\s+(\S+)\s*\{(.*)\}""".r

  /** Parse a KEEL header from its text (everything before `@data`). */
  def parseHeader(text: String): KeelHeader = {
    var relation = ""
    val attrs = scala.collection.mutable.ArrayBuffer.empty[KeelAttribute]
    var inputs = Seq.empty[String]
    var outputs = Seq.empty[String]
    for (raw <- text.linesIterator.map(_.trim) if raw.nonEmpty) {
      val line = raw
      if (line.toLowerCase.startsWith("@relation"))
        relation = line.split("\\s+", 2).lift(1).getOrElse("").trim
      else if (line.toLowerCase.startsWith("@inputs"))
        inputs = line.split("\\s+", 2)(1).split(",").map(_.trim).toSeq
      else if (line.toLowerCase.startsWith("@outputs"))
        outputs = line.split("\\s+", 2)(1).split(",").map(_.trim).toSeq
      else line match {
        case attrNumeric(name, kind, lo, hi) =>
          val dt = if (kind.equalsIgnoreCase("integer")) IntegerType else DoubleType
          attrs += KeelAttribute(name, dt, Some((lo.toDouble, hi.toDouble)), None)
        case attrNominal(name, values) =>
          attrs += KeelAttribute(name, StringType, None,
            Some(values.split(",").map(_.trim).toSeq))
        case _ => // comments / @data marker / unknown directives
      }
    }
    val h = KeelHeader(relation, attrs.toSeq, inputs, outputs)
    require(h.attributes.nonEmpty, "KEEL header declared no attributes")
    h
  }

  /** Split a `.dat` file into (header, first data line index). Reads ONLY the
    * head of the file on the driver; the data section is never materialized. */
  def readHeader(spark: SparkSession, path: String): KeelHeader = {
    val src = scala.io.Source.fromFile(path)
    try {
      val head = src.getLines().takeWhile(!_.trim.equalsIgnoreCase("@data")).mkString("\n")
      parseHeader(head)
    } finally src.close()
  }

  /** Read a KEEL `.dat` file as a typed DataFrame: header → schema, `@data`
    * rows → Spark's distributed CSV reader ('?' and '<null>' as missing). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val header = readHeader(spark, path)
    val raw = spark.read
      .schema(StructType(header.attributes.map(a =>
        StructField(a.name, StringType, nullable = true))))
      .option("comment", "@") // header lines all start with '@'
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(path)
    header.attributes.foldLeft(raw) { (df, a) =>
      val cleaned = when(col(a.name).isin("?", "<null>"), lit(null)).otherwise(col(a.name))
      df.withColumn(a.name, cleaned.cast(a.dataType))
    }
  }

  /** R11 descriptor/header generation: one distributed pass over a DataFrame
    * derives ranges (numeric) and dictionaries (string) and renders a header.
    * The inverse of [[read]] — lets users produce the declarations the Chi
    * estimator wants from raw parquet/CSV data. */
  def generateHeader(df: DataFrame, relation: String, outputCol: String): KeelHeader = {
    val numeric = df.schema.fields.filter(f => f.dataType.isInstanceOf[NumericType])
    val nominal = df.schema.fields.filter(_.dataType == StringType)
    val aggs = numeric.flatMap(f => Seq(min(col(f.name)), max(col(f.name))))
    val row = if (aggs.nonEmpty) df.agg(aggs.head, aggs.tail: _*).head() else null
    val numAttrs = numeric.zipWithIndex.map { case (f, i) =>
      val lo = Option(row.get(2 * i)).map(_.toString.toDouble).getOrElse(0.0)
      val hi = Option(row.get(2 * i + 1)).map(_.toString.toDouble).getOrElse(0.0)
      KeelAttribute(f.name,
        if (f.dataType == IntegerType || f.dataType == LongType) IntegerType else DoubleType,
        Some((lo, hi)), None)
    }
    // KEEL nominal attributes are low-cardinality class/category dictionaries
    // by construction; a free-text or id column pointed at this collect would
    // OOM the DRIVER at scale. Guard with a distributed estimate and fail
    // fast — approx_count_distinct is one map-side-combined pass, and its
    // ±5% default error is irrelevant at a 10^4 threshold.
    val maxNominalValues = 10000L
    if (nominal.nonEmpty) {
      val est = df.agg(
        approx_count_distinct(col(nominal.head.name)).as(nominal.head.name),
        nominal.tail.map(f => approx_count_distinct(col(f.name)).as(f.name)): _*).head()
      nominal.foreach { f =>
        val n = est.getAs[Long](f.name)
        require(n <= maxNominalValues,
          s"column '${f.name}' has ~$n distinct values — too many for a KEEL " +
          s"nominal dictionary (limit $maxNominalValues). Nominal attributes " +
          "are class/category columns; bucket or drop high-cardinality strings " +
          "before generating a header.")
      }
    }
    val nomAttrs = nominal.map { f =>
      val values = df.select(f.name).distinct().orderBy(f.name)
        .collect().map(_.getString(0)).toSeq
      KeelAttribute(f.name, StringType, None, Some(values))
    }
    val attrs = df.schema.fields.flatMap(f =>
      numAttrs.find(_.name == f.name).orElse(nomAttrs.find(_.name == f.name))).toSeq
    KeelHeader(relation, attrs,
      attrs.map(_.name).filterNot(_ == outputCol), Seq(outputCol))
  }

  /** Render a header back to KEEL text (for writing `.dat` files). */
  def renderHeader(h: KeelHeader): String = {
    val attrs = h.attributes.map {
      case KeelAttribute(n, IntegerType, Some((lo, hi)), _) =>
        s"@attribute $n integer [${lo.toInt}, ${hi.toInt}]"
      case KeelAttribute(n, _, Some((lo, hi)), _) =>
        s"@attribute $n real [$lo, $hi]"
      case KeelAttribute(n, _, _, Some(vs)) =>
        s"@attribute $n {${vs.mkString(", ")}}"
      case KeelAttribute(n, _, _, _) => s"@attribute $n real [0.0, 1.0]"
    }
    (s"@relation ${h.relation}" +: attrs :+
      s"@inputs ${h.inputs.mkString(", ")}" :+
      s"@outputs ${h.outputs.mkString(", ")}" :+ "@data").mkString("\n")
  }

  /** Write a DataFrame as a single KEEL `.dat` file (header + CSV data).
    * Intended for model-exchange-sized data; large exports should stay
    * parquet. */
  def write(df: DataFrame, header: KeelHeader, path: String): Unit = {
    val tmp = path + ".data.tmp"
    df.select(header.attributes.map(a => col(a.name)): _*)
      .coalesce(1).write.mode("overwrite").option("header", "false").csv(tmp)
    val dataFile = new java.io.File(tmp).listFiles()
      .find(_.getName.startsWith("part-")).get
    val out = new java.io.PrintWriter(path)
    try {
      out.println(renderHeader(header))
      val src = scala.io.Source.fromFile(dataFile)
      try src.getLines().foreach(out.println) finally src.close()
    } finally out.close()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(tmp))
  }
}
