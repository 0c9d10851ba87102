package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.gmm.{EM, Gaussian}
import graft.functions.VectorExpressions

/** Property tests (SURVEY.md §5.3): expression kernels vs scalar
  * reimplementations on random inputs, EM recovery on known data.
  * 10 cases per property — each case is a Spark job on a tiny local frame.
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val xsGen = Gen.listOfN(40, Gen.choose(-100.0, 100.0))

  property("gaussian pdf expression == scalar reimplementation") =
    forAll(xsGen, Gen.choose(-50.0, 50.0), Gen.choose(0.1, 100.0)) { (xs, mu, s2) =>
      val got = xs.toDF("x")
        .select(Gaussian.pdf(col("x"), mu, s2).as("p"))
        .as[Double].collect()
      val want = xs.map(x =>
        math.exp(-math.pow(x - mu, 2) / (2.0 * s2)) / math.sqrt(2.0 * math.Pi * s2))
      got.zip(want).forall { case (g, w) => (g - w).abs <= 1e-12 * math.max(1.0, w.abs) }
    }

  property("var_pop == hand-rolled sum((x-mean)^2)/n") =
    forAll(xsGen) { xs => // xsGen is fixed-length 40, never empty
      val got = xs.toDF("x").agg(var_pop(col("x"))).as[Double].head()
      val mean = xs.sum / xs.size
      val want = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
      (got - want).abs <= 1e-9 * math.max(1.0, want.abs)
    }

  property("EM with k=1 recovers dataset mean/variance exactly") =
    forAll(Gen.choose(0L, 100000L), Gen.choose(-20.0, 20.0), Gen.choose(0.5, 9.0)) {
      (seed, mu, sigma) =>
        val rnd = new scala.util.Random(seed)
        val xs = Seq.fill(300)(mu + sigma * rnd.nextGaussian())
        val r = EM.fit(xs.toDF("x"), "x", k = 1, maxIter = 2)
        val n = xs.size
        val m = xs.sum / n
        val v = xs.map(x => (x - m) * (x - m)).sum / n
        // k=1: gamma == 1 per point, so the M-step returns the exact moments
        (r.model.means(0) - m).abs <= 1e-6 * math.max(1.0, m.abs) &&
          (r.model.variances(0) - v).abs <= 1e-6 * math.max(1.0, v.abs) &&
          r.model.weights(0) == 1.0
    }

  private val vecGen = Gen.listOfN(16, Gen.choose(-10.0f, 10.0f)).map(_.toArray)

  property("cosineSim is symmetric and bounded") =
    forAll(vecGen, vecGen) { (a, b) =>
      val r = Seq((a, b)).toDF("a", "b")
        .select(
          VectorExpressions.cosineSim(col("a"), col("b")).as("ab"),
          VectorExpressions.cosineSim(col("b"), col("a")).as("ba"))
        .head()
      val ab = r.getDouble(0); val ba = r.getDouble(1)
      ab == ba && ab >= -1.0000000001 && ab <= 1.0000000001
    }

  private val textGen = Gen.listOfN(25,
    Gen.oneOf("spark", "data", "join", "agg", "row", "batch", "stream"))
    .map(_.mkString(" "))

  property("wordShinglesAll: distinct+order == wordShingles; count == n-k+1") =
    forAll(textGen, Gen.choose(1, 6)) { (text, k) =>
      val df = Seq(Tuple1(text)).toDF("text")
      val r = df.select(
        VectorExpressions.wordShinglesAll(col("text"), k).as("all"),
        VectorExpressions.wordShingles(col("text"), k).as("dist")).head()
      val all = r.getSeq[String](0); val dist = r.getSeq[String](1)
      val nToks = text.trim.split("\\s+").length
      all.distinct == dist &&
        all.length == (if (nToks < k) 0 else nToks - k + 1)
    }

  property("bandedIntervalAfter == theta join on random timestamps") = {
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 1000L), Gen.choose(0L, 5000L))) // (id, epochSec)
    forAll(rowGen, rowGen, Gen.choose(1L, 600L)) { (ls, rs, w) =>
      val l = ls.zipWithIndex.map { case ((_, s), i) =>
        (i.toLong, new java.sql.Timestamp(s * 1000L)) }.toDF("l_id", "l_ts")
      val r = rs.zipWithIndex.map { case ((_, s), i) =>
        (i.toLong, new java.sql.Timestamp(s * 1000L)) }.toDF("r_id", "r_ts")
      val banded = graft.operators.RangeJoin
        .bandedIntervalAfter(l, r, "l_ts", "r_ts", w)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
      val theta = l.join(r,
          col("r_ts") > col("l_ts") &&
            col("r_ts") <= col("l_ts") + expr(s"INTERVAL $w SECOND"))
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
      banded.toSet == theta.toSet && banded.length == theta.length // no dup pairs
    }
  }

  // Non-zero vectors: absmax 0 makes scale infinite (out of the
  // quantization contract, as documented on VectorOps.quantStatsFloat).
  private val nonZeroVecGen =
    Gen.listOfN(16, Gen.choose(-10.0f, 10.0f)).map(_.toArray)
      .suchThat(v => v.exists(_ != 0.0f))

  property("QuantStats kernel == the composite-HOF quantization it replaced") =
    forAll(nonZeroVecGen) { v =>
      val df = Seq(Tuple1(v)).toDF("embedding")
      val qs = VectorExpressions.quantStats(col("embedding"))
      val got = df.select(
        qs.getField("absmax"), qs.getField("q1"),
        qs.getField("q_sum"), qs.getField("mse")).head()

      val absmax = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
      val want = df.withColumn("absmax", absmax)
        .withColumn("q", transform(col("embedding"),
          x => round(x.cast("double") * (lit(127.0) / col("absmax")), 0).cast("int")))
        .select(
          col("absmax"),
          element_at(col("q"), 1),
          aggregate(col("q"), lit(0L), (a, x) => a + x),
          aggregate(
            zip_with(col("embedding"), col("q"), (x, qi) => {
              val e = x.cast("double") - qi.cast("double") / (lit(127.0) / col("absmax"))
              e * e
            }),
            lit(0.0), (a, x) => a + x) / size(col("embedding")))
        .head()

      got.getDouble(0) == want.getDouble(0) &&
        got.getInt(1) == want.getInt(1) &&
        got.getLong(2) == want.getLong(2) &&
        got.getDouble(3) == want.getDouble(3)
    }

  property("mortonKey == per-bit scalar interleave; monotone along each axis") =
    forAll(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)) { (x, y) =>
      def interleave(a: Long, b: Long): Long =
        (0 until 16).foldLeft(0L) { (acc, i) =>
          acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
        }
      val got = Seq((x, y)).toDF("x", "y")
        .select(graft.operators.Layout.mortonKey(col("x"), col("y")))
        .as[Long].head()
      val monotone = // bit spreading preserves per-axis order (disjoint bits)
        x == 65535L || {
          val next = Seq((x + 1, y)).toDF("x", "y")
            .select(graft.operators.Layout.mortonKey(col("x"), col("y")))
            .as[Long].head()
          next > got
        }
      got == interleave(x, y) && monotone
    }

  property("murmur-kernel and md5-family LSH both surface a planted exact dup") = {
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    val docGen = Gen.listOfN(12, Gen.oneOf(vocab)).map(_.mkString(" "))
    forAll(docGen, docGen, docGen) { (d0, d2, d3) =>
      val corpus = Seq((0L, d0), (1L, d0), (2L, d2), (3L, d3)).toDF("doc_id", "text")
      val murmur = graft.operators.Dedup.nearDuplicatePairs(
        corpus, "doc_id", "text", threshold = 0.99)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val md5fam = graft.operators.Dedup.nearDuplicatePairsMd5(
        corpus, "doc_id", "text", threshold = 0.99)
        .select("a", "b").as[(Long, Long)].collect().toSet
      spark.catalog.clearCache()
      murmur.contains((0L, 1L)) && md5fam.contains((0L, 1L))
    }
  }

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(15, for {
      a <- Gen.choose(0L, 9L); b <- Gen.choose(0L, 9L) if a != b
    } yield (a, b))

  property("minLabelPropagation at node-count iters == connectedComponents") =
    forAll(edgeGen) { pairs =>
      pairs.nonEmpty ==> {
        val e = pairs.toDF("src", "dst")
        val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        val labels = graft.operators.Graph.minLabelPropagation(sym, iters = 10)
          .as[(Long, Long)].collect().toMap
        val nodes = sym.select(col("src").as("node")).distinct()
        val cc = graft.operators.Curation.connectedComponents(
          e.select(col("src").as("a"), col("dst").as("b")), nodes)
          .as[(Long, Long)].collect().toMap
        labels == cc
      }
    }

  property("pageRank: mass conserved (no dangling) and bit-stable under repartition") =
    forAll(edgeGen) { pairs =>
      pairs.nonEmpty ==> {
        val e = pairs.toDF("src", "dst")
        val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        val a = graft.operators.Graph.pageRank(sym, iters = 3)
          .orderBy("node").as[(Long, Double)].collect()
        val b = graft.operators.Graph.pageRank(sym.repartition(5), iters = 3)
          .orderBy("node").as[(Long, Double)].collect()
        // symmetric graph: every node has out-edges, so no rank leaks
        (a.map(_._2).sum - 1.0).abs <= 1e-9 && a.sameElements(b)
      }
    }

  property("Det.fixed: idempotent, within half an ulp of the scale") =
    forAll(Gen.choose(-1e6, 1e6), Gen.choose(0, 6)) { (v, k) =>
      val Seq(once, twice) = Seq(Tuple1(v)).toDF("v")
        .select(
          graft.util.Det.fixed(col("v"), k).as("a"),
          graft.util.Det.fixed(graft.util.Det.fixed(col("v"), k), k).as("b"))
        .as[(Double, Double)].collect().toSeq.flatMap(t => Seq(t._1, t._2))
      once == twice && (once - v).abs <= 0.5 * math.pow(10.0, -k) + 1e-9 * v.abs
    }

  property("TopKAggregator == sort-based reference under any merge split") =
    forAll(
      Gen.listOfN(30, Gen.zip(Gen.choose(-50.0, 50.0), Gen.choose(0L, 9L))),
      Gen.choose(1, 8), Gen.choose(0, 30)) { (xs, k, cut) =>
      val agg = new graft.operators.TopKAggregator(k)
      val (l, r) = xs.splitAt(cut min xs.size)
      val lb = l.foldLeft(agg.zero)((b, a) => agg.reduce(b, a))
      val rb = r.foldLeft(agg.zero)((b, a) => agg.reduce(b, a))
      val got = agg.finish(agg.merge(lb, rb))
      // reference: sort the multiset by (value, id) descending, take k
      val want = xs.sortBy { case (v, id) => (-v, -id) }.take(k)
      got == want
    }

  property("RangeCum == global-window cumulative for any keys/partitions") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L)).map(_.distinct),
      Gen.listOfN(64, Gen.choose(-99L, 99L)),
      Gen.choose(1, 9)) { (keys, vals, nParts) =>
      val rows = keys.zip(vals ++ List.fill(keys.size)(0L))
      val df = rows.toDF("k", "v")
      val got = graft.operators.RangeCum.withCums(df, "k",
          Seq(graft.operators.RangeCum.Cum("v", "cs"),
            graft.operators.RangeCum.Cum("v", "pm", agg = "max",
              inclusive = false)),
          partitions = nParts)
        .select(col("k"), col("cs"), col("pm"))
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
      // scalar reference: running sum + strict-predecessor running max
      val sorted = rows.sortBy(_._1)
      var acc = 0L
      var mx: Option[Long] = None
      val want = sorted.map { case (k, v) =>
        acc += v
        val out = (k, acc, mx)
        mx = Some(mx.fold(v)(math.max(_, v)))
        out
      }
      got == want
    }
}
