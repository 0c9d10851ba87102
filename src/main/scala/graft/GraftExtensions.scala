package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftFunctions

/** `spark.sql.extensions` entry point: registers the engine's native
  * SQL functions (cosine_sim, dot_product, l2_norm, simhash64,
  * word_shingles, minhash_sig) and the one optimizer rule the built-in
  * planner genuinely needs ([[graft.plans.BandedIntervalJoinRule]]:
  * keyless interval joins would otherwise plan as nested loops).
  *
  * No custom SparkStrategy/SparkPlan is injected — SURVEY.md §7.5:
  * every operator's semantics fit built-in plans + custom expressions,
  * so Catalyst/AQE keep full planning freedom.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.BandedIntervalJoinRule)
  }
}
