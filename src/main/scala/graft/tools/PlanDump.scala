package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: print executed plans of named contract queries (arg: substring). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.Engine.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    for ((n, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1) if n.contains(args(0))) {
      val df = fn(spark, dir)
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString.linesIterator.map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
