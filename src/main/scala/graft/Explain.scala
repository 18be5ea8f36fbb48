package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("GRAFT_EXPLAIN_SF", "/root/testdata/sf0.01")
    // GRAFT_EXPLAIN_FINAL=1: collect() the frame and print the AQE
    // FINAL plan — the only view where runtime exchange/stage reuse
    // is visible (the static executedPlan duplicates multi-consumer
    // subtrees that the stage cache may collapse at execution).
    val runFinal = sys.env.get("GRAFT_EXPLAIN_FINAL").contains("1")
    for (name <- args) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (runFinal) df.collect()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate")
          || l.contains("Window") || l.contains("Generate") || l.contains("Scan parquet")
          || l.contains("AdaptiveSparkPlan") || l.contains("Sort ")
          || l.contains("Reused") || l.contains("QueryStage"))
        .mkString("\n"))
    }
  }
}
