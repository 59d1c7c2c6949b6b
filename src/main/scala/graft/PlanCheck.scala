package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for key queries + assert the structural
  * properties we design for (pushdown, pruning, broadcast, codegen). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq(
      "q1_agg", "q_anti_join_exclusion", "q_backfill_join", "q_topk",
      "q_range_resume", "q_regex_filter_extract", "q_precedence_dedup",
      "q_token_count")
    interesting.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
