package graft

import org.apache.spark.sql.types.{ArrayType, MapType}

/** Build-time lints over the oracle contract. Two failure classes have
  * produced red CORRECTNESS rows across rounds without any value being
  * wrong, and both are statically detectable:
  *
  *  1. DuckDB `SUM` over integers returns HUGEINT, which pandas
  *     materializes as float64 while the Spark side is int64 — a
  *     dtype-sensitive hash mismatch (bit `pack_sequences` in round 2,
  *     `snapshot_diff` + `stats_isotonic_calibration` in round 3). Any
  *     integer `SUM(CASE ... END)` aliased to a FINAL output column must
  *     be wrapped in `CAST(... AS BIGINT)`. Internal CTE sums that are
  *     consumed downstream (ratios, casts) are exempt — their dtype
  *     never reaches the driver.
  *
  *  2. The driver's row-sort before hashing is a pandas lexsort over all
  *     columns; list cells are unhashable there (`text_inverted_index`
  *     round 3). Oracle-checked results must therefore be flat: no
  *     array/map top-level columns — flatten to a joined string or
  *     explode instead.
  */
class OracleLintSpec extends SparkSpec {

  private val oracleDefs = SparkEntry.registry.filter(_.oracle.isDefined)

  // Building a DataFrame can run real driver-side work (model-fit
  // collects, localCheckpoints); both test families share one schema
  // per query instead of paying that cost twice.
  private val schemaCache =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.types.StructType]
  private def schemaOf(q: graft.QueryDef) =
    schemaCache.getOrElseUpdate(q.name, {
      val s = q.fn(spark, sf).schema
      spark.catalog.clearCache()
      s
    })

  oracleDefs.foreach { q =>
    test(s"${q.name}: oracle-checked result has no array/map columns") {
      val bad = schemaOf(q).fields.filter(f =>
        f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType])
      bad.map(_.name).toSeq shouldBe empty
    }
  }

  // `SUM(CASE ... END) AS <name>` with no CAST wrapper, matched on
  // single-space-normalized upper-cased SQL. NOT fully whitespace-
  // stripped: stripping would glue a final-position alias to the next
  // keyword ("AS POS\nFROM" → "ASPOSFROM"), silently passing the exact
  // position where both historical regressions sat.
  private val UncastSum = raw"SUM\(CASE .*?END\) AS (\w+)".r

  // 3. DuckDB 1.0's `epoch(TIMESTAMP)` returns DOUBLE while the Spark
  //    dual (`cast(ts as long)` / unix_seconds) is BIGINT — the same
  //    dtype-sensitive hash mismatch as the HUGEINT sums, caught red in
  //    round 7 (`join_interval_overlap`: 259200.0 vs 259200). Every
  //    oracle use of `epoch(` must sit inside an explicit CAST so the
  //    dtype decision is visible (`CAST(epoch(x) AS BIGINT)`, or AS
  //    DOUBLE when the Spark side really is floating). The runtime
  //    sibling (tools/verify_local.py) compares full DESCRIBE dtype
  //    parity; this static lint catches the known-bad form in `sbt test`
  //    without DuckDB.
  oracleDefs.foreach { q =>
    test(s"${q.name}: oracle epoch() uses carry an explicit CAST") {
      val norm = q.oracle.get.toUpperCase.replaceAll("\\s+", " ")
      val offenders = raw"EPOCH\(".r.findAllMatchIn(norm).filterNot { m =>
        m.start >= 5 && norm.substring(m.start - 5, m.start) == "CAST("
      }.map(m => s"offset ${m.start}").toSeq
      withClue("bare epoch(...) — DuckDB returns DOUBLE; wrap in CAST: ") {
        offenders shouldBe empty
      }
    }
  }

  oracleDefs.foreach { q =>
    test(s"${q.name}: final integer SUM(CASE) columns are CAST-wrapped") {
      val outCols = schemaOf(q).fieldNames.map(_.toUpperCase).toSet
      val norm = q.oracle.get.toUpperCase.replaceAll("\\s+", " ")
      val offenders = UncastSum.findAllMatchIn(norm).filter { m =>
        val castPrefix =
          m.start >= 5 && norm.substring(m.start - 5, m.start) == "CAST("
        // a later CAST(... AS BIGINT) AS <name> re-projection fixes the
        // dtype before it reaches the driver (psi_drift's CTE pattern)
        val recastElsewhere = norm.contains(s"AS BIGINT) AS ${m.group(1)}")
        outCols.contains(m.group(1)) && !castPrefix && !recastElsewhere
      }.map(m => s"${m.group(1)} (offset ${m.start})").toSeq
      withClue(s"uncast integer SUM aliased to output column(s): ") {
        offenders shouldBe empty
      }
    }
  }
}
