package graft.queries
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(8, 8)
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BNLJ" -> plan.contains("BroadcastNestedLoopJoin"),
          "GlobalSortFullTable" -> false
        ).collect { case (f, true) => f }
        if (flags.nonEmpty) println(s"[audit] $name: ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"[audit] $name ERR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
