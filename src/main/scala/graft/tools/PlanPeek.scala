package graft.tools
import org.apache.spark.sql.SparkSession
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = graft.Catalog.byName(args(0)).fn(spark, args(1))
      .queryExecution.executedPlan.toString
    println(plan.linesIterator.filter(l =>
      l.contains("Scan") || l.contains("PartitionFilters") || l.contains("list_group")).mkString("\n"))
    spark.stop()
  }
}
