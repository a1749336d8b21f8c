package graft


/** Dumps formatted physical plans for representative queries — the evidence
  * that the 100 TB plan properties hold (pushdown, pruning, broadcast dim
  * joins, TakeOrderedAndProject top-k, fused aggregates, whole-stage
  * codegen). Usage: runMain graft.Plans <sfDir> [query ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "s1_scan_pruned", "j1_broadcast_dim", "j2_chain_two_dims", "t2_topk",
      "a11_fused_count_avg", "q_most_delay", "g2_indegrees", "x_sim_cosine_topk")
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
