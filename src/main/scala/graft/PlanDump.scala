package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/**
 * Optimization-round measurement harness: dump `.explain("formatted")`
 * for named queries to `<outDir>/<query>_<tag>.txt` (the judge checks
 * plan claims against these files — r16 deliverable).
 *
 * Usage: runMain graft.PlanDump <outDir> <tag> <query...>
 * Env: GRAFT_EXPLAIN_SF (default sf0.1 — plans are judged at bench
 * scale), GRAFT_EXPLAIN_FINAL=1 to collect() first and dump the AQE
 * final plan of the exact frame.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...>")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("GRAFT_EXPLAIN_SF", "/root/testdata/sf0.1")
    val runFinal = sys.env.get("GRAFT_EXPLAIN_FINAL").contains("1")
    for (name <- args.drop(2)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (runFinal) df.collect()
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"[plandump] wrote ${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
