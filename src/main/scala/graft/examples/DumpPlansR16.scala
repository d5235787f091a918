package graft.examples

import java.nio.file.{Files, Paths}

/** Round-16 optimization evidence: writes plans/r16/<key>_<tag>.txt with the
  * formatted physical plan of every key named on the command line.
  * Usage: sbt "runMain graft.examples.DumpPlansR16 before x111 x310 ..." */
object DumpPlansR16 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val keys = args.drop(1).toSeq
    val spark = graft.engine.Sessions.local(8, 8)
    val dir = "/root/testdata/sf0.001"
    keys.foreach { prefix =>
      val name = graft.SparkEntry.queries.keys.find(_.startsWith(prefix))
        .getOrElse(sys.error(s"no key matches $prefix"))
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r16/${name}_$tag.txt"), txt)
      println(s"[plans] wrote plans/r16/${name}_$tag.txt")
    }
    spark.stop()
  }
}
