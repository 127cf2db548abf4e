package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileFA {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).selectExpr("sum(id)").collect()
    def exprCount(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Long = {
      var n = 0L
      p.foreach(node => node.expressions.foreach(e => e.foreach(_ => n += 1)))
      n
    }
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("geno_de_novo", "geno_tdt", "geno_phase_by_transmission",
        "matrix_cols_agg", "matrix_union_cols")) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val t0 = System.nanoTime()
      val a = exprCount(df.queryExecution.analyzed)
      val o = exprCount(df.queryExecution.optimizedPlan)
      val t1 = System.nanoTime()
      df.collect()
      val t2 = System.nanoTime()
      System.err.println(f"PROF $q analyzed=$a optimized=$o plan=${(t1-t0)/1e9}%.2f exec=${(t2-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
