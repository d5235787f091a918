package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (same conf as Verify/Bench). */
object TestSpark {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, 4)
  val sfSmoke = "/root/testdata/sf0.001"
}
