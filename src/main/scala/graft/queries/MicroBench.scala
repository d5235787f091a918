package graft.queries
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(32, 32)
    val dir = "/root/testdata/sf0.1"
    val names = Seq("x44_token_entropy","x35_text_repetition","x47_quality_gate")
    for (n <- names; fn = graft.SparkEntry.queries(n)) {
      fn(spark, "/root/testdata/sf0.001").count()   // warm
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] $n%-34s min=${ts.min}%.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
