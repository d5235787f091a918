package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** KEEL `.dat` as a REGISTERED Spark data source: `spark.read.format("keel")
  * .load(path)` and `df.write.format("keel").save(path)` — so a user of the
  * reference can mount their existing datasets through the standard source
  * API (short name via META-INF/services, like every built-in format)
  * instead of calling [[Keel]] helpers directly.
  *
  * Read side implements [[PrunedScan]]: Catalyst pushes the required-column
  * list down, and only those columns are projected out of the distributed
  * CSV scan (the line must still be parsed — inherent to a row-oriented text
  * format, same as Spark's own CSV source). Write side derives the header
  * from the DataFrame with [[Keel.generateHeader]] (R11) — options:
  * `relation` (header name), `outputCol` (class attribute, defaults to the
  * last column).
  *
  * Scale posture: identical to [[Keel.read]] — header parsed driver-side
  * (KB), `@data` rows stream through the distributed CSV reader. The writer
  * coalesces to one file because a KEEL header declares ONE `@data` section;
  * it is a model/dataset-exchange format, not a warehouse sink (the
  * Scaladoc on [[Keel.write]] says the same).
  */
class KeelDataSource extends RelationProvider
  with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "keel"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("keel source requires a path"))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    KeelRelation(pathOf(parameters))(sqlContext)

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val exists = new java.io.File(path).exists()
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"keel target already exists: $path")
      case SaveMode.Ignore if exists => ()
      // A KEEL file has exactly one @data section, so Append has no sane
      // meaning; silently rewriting (the old behavior) is a data-loss path.
      case SaveMode.Append =>
        throw new UnsupportedOperationException(
          "keel source does not support SaveMode.Append; use Overwrite")
      case _ =>
        val relation = parameters.getOrElse("relation", "graft_export")
        val outputCol = parameters.getOrElse("outputCol", data.columns.last)
        Keel.write(data, Keel.generateHeader(data, relation, outputCol), path)
    }
    KeelRelation(path)(sqlContext)
  }
}

/** Lazy-schema relation over one `.dat` file; the scan delegates to the
  * distributed typed read and projects the pruned column set. */
case class KeelRelation(path: String)(@transient val sqlContext: SQLContext)
  extends BaseRelation with PrunedScan {

  @transient private lazy val header =
    Keel.readHeader(sqlContext.sparkSession, path)

  override def schema: StructType = header.schema

  override def buildScan(requiredColumns: Array[String]): RDD[Row] = {
    val df = Keel.read(sqlContext.sparkSession, path)
    // empty projection (e.g. count(*)) still has to preserve row count
    df.select(requiredColumns.toSeq.map(col): _*).rdd
  }
}
