import org.apache.spark.sql.execution.FormattedMode
val d = "/root/testdata/sf0.1"
for (name <- Seq("q1_pricing_summary", "q3_shipping_priority", "join_sort_merge_large",
                 "join_bloom_prefilter", "events_asof_join", "ann_cosine_topk")) {
  println(s"@@@ $name")
  val plan = graft.SparkEntry.queries(name)(spark, d).queryExecution
    .explainString(FormattedMode)
  plan.linesIterator.takeWhile(_.nonEmpty).foreach(println)
  plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).foreach(l => println(l.trim.take(150)))
}
System.exit(0)
