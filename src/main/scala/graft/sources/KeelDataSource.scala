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
  * Read side implements [[PrunedFilteredScan]]: Catalyst pushes down both
  * the required-column list AND the predicate set, so only matching rows of
  * only the needed columns leave the distributed CSV scan (the line must
  * still be parsed — inherent to a row-oriented text format, same as
  * Spark's own CSV source — but non-matching rows are dropped at the source
  * instead of surviving a full-table handoff; the reference's selective
  * single-table read path at scale). Write side derives the header
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
  * distributed typed read, applies every translatable pushed filter, and
  * projects the pruned column set. */
case class KeelRelation(path: String)(@transient val sqlContext: SQLContext)
  extends BaseRelation with PrunedFilteredScan {

  @transient private lazy val header =
    Keel.readHeader(sqlContext.sparkSession, path)

  override def schema: StructType = header.schema

  /** `sources.Filter` → `Column` predicate; `None` = not translatable (the
    * default `unhandledFilters` keeps Spark re-checking every filter above
    * the scan, so a partial translation only ever prunes, never drops). */
  private def toPredicate(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case EqualNullSafe(a, v) => Some(col(a) <=> v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case Not(c) => toPredicate(c).map(!_)
    // one translatable And side alone is still a sound (weaker) prune
    case And(l, r) => (toPredicate(l), toPredicate(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (one, None) => one
      case (None, one) => one
    }
    // an Or needs BOTH sides to stay sound
    case Or(l, r) => for { a <- toPredicate(l); b <- toPredicate(r) } yield a || b
    case _ => None
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val df = Keel.read(sqlContext.sparkSession, path)
    val filtered = filters.flatMap(toPredicate)
      .foldLeft(df)((d, p) => d.filter(p))
    // empty projection (e.g. count(*)) still has to preserve row count
    filtered.select(requiredColumns.toSeq.map(col): _*).rdd
  }
}
