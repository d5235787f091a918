package graft.examples

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec, TakeOrderedAndProjectExec}

/** Unpartitioned-window inventory (VERDICT r15 task 4): walks every
  * registered query's physical plan and prints one line per key that
  * contains a WindowExec/WindowGroupLimitExec with an EMPTY partition spec,
  * with the count and whether each such window's child subtree carries
  * bounded-row evidence (aggregate / global limit / top-k / local relation
  * — RegistryGuardSpec's criterion, which the suite ASSERTS registry-wide;
  * this tool exists to make the inventory a committed artifact rather than
  * a passing test's implicit fact).
  *
  * Usage: sbt "runMain graft.examples.WindowAudit"
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(4, 4)
    val dir = "/root/testdata/sf0.001"
    def bounded(p: SparkPlan): Boolean =
      p.find {
        case _: BaseAggregateExec => true
        case _: GlobalLimitExec => true
        case _: TakeOrderedAndProjectExec => true
        case _: LocalTableScanExec => true
        case _ => false
      }.isDefined
    var keysWith = 0; var totalWindows = 0; var unboundedN = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val ws = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w: SparkPlan
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w: SparkPlan
        }
        if (ws.nonEmpty) {
          keysWith += 1; totalWindows += ws.size
          val unbounded = ws.filterNot {
            case w: WindowExec => bounded(w.child)
            case w: WindowGroupLimitExec => bounded(w.child)
          }
          unboundedN += unbounded.size
          println(f"[winaudit] $name%-34s n=${ws.size} bounded=${ws.size - unbounded.size} UNBOUNDED=${unbounded.size}")
        }
      } catch { case e: Throwable =>
        println(s"[winaudit] $name FAILED to build: $e")
      }
    }
    println(s"[winaudit] summary keys_with_unpartitioned_windows=$keysWith " +
      s"windows=$totalWindows unbounded=$unboundedN")
    spark.stop()
  }
}
