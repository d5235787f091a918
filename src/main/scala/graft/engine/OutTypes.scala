package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round
import org.apache.spark.sql.types.DoubleType

/** Output-type protocol helpers (SURVEY.md §7.4 rule 8): DECIMAL never leaves
  * a query. The one shared definition keeps the protocol in one place — a
  * scale or rounding-mode change here propagates to every emitting site
  * (Relational1/2, Temporal, StreamingOps) instead of drifting per file.
  */
object OutTypes {

  /** Exact decimal aggregate → repr-stable double output: round at scale 2
    * (HALF_UP, matching DuckDB's half-away-from-zero on the non-negative
    * money values this is used for), then cast — a scale-2 value ≪ 2^53 casts
    * to the same correctly-rounded IEEE double on Spark and DuckDB. Oracle
    * mirror: `CAST(ROUND(…, 2) AS DOUBLE)`. */
  def money(c: Column): Column = round(c, 2).cast(DoubleType)
}
