package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftFunctions

/** `spark.sql.extensions` entry point: registers the engine's native
  * SQL functions (cosine_sim, dot_product, l2_norm, simhash64,
  * word_shingles, minhash_sig) at session build time.
  *
  * No custom Rule/SparkStrategy is injected — SURVEY.md §7.5: every
  * operator's semantics fit built-in plans + custom expressions, so
  * Catalyst/AQE keep full planning freedom.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
