package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump the formatted physical plan of driver-gate queries.
  * `sbt "runMain graft.Explain sp23_nps cr1_orset_fold"` (sf0.001 inputs). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[4]").appName("explain")
      .config("spark.sql.shuffle.partitions", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
  }
}
