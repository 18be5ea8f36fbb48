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
    for (name <- args) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate")
          || l.contains("Window") || l.contains("Generate") || l.contains("Scan parquet")
          || l.contains("AdaptiveSparkPlan") || l.contains("Sort "))
        .mkString("\n"))
    }
  }
}
