package graft

import org.apache.spark.sql.functions._

import graft.agg.{MisraGries, MisraGriesAgg}
import graft.ops.TextAnalysis

/** Misra–Gries frequent-items summary: the deterministic sketch bounds
  * (undercount ≤ N/(m+1); survival of anything above the bound) under
  * adversarial vocab ≫ m streams and arbitrary partitionings, plus the
  * sketch-then-recount heavy-hitter query's exactness.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish fixture: item i appears ~N/(i+1) times, vocab far above m.
  private def zipfStream(vocab: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val items = (0 until vocab).flatMap(i => Seq.fill(600 / (i + 1) + 1)(s"w$i"))
    rnd.shuffle(items)
  }

  test("aggregator unit: exact when vocabulary fits the capacity") {
    val agg = new MisraGriesAgg(64)
    val stream = zipfStream(vocab = 40, seed = 1)
    val got = stream.foldLeft(agg.zero)(agg.reduce)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == exact)
  }

  test("aggregator unit: MG bounds hold under eviction and pairwise merge") {
    val m = 20
    val agg = new MisraGriesAgg(m)
    val stream = zipfStream(vocab = 300, seed = 2)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val bound = n / (m + 1)

    // single-buffer fold, then a 4-way split folded and merged pairwise
    val whole = stream.foldLeft(agg.zero)(agg.reduce)
    val parts = stream.grouped((stream.size + 3) / 4)
      .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = parts.reduce(agg.merge)

    for (summary <- Seq(whole, merged)) {
      assert(summary.size <= m)
      summary.foreach { case (k, est) =>
        assert(est <= exact(k), s"$k overcounted: $est > ${exact(k)}")
        assert(exact(k) - est <= bound,
          s"$k undercount ${exact(k) - est} exceeds N/(m+1)=$bound")
      }
      exact.foreach { case (k, c) =>
        if (c > bound) assert(summary.contains(k),
          s"$k freq $c > bound $bound but evicted")
      }
    }
  }

  test("udaf: distributed bounds are partitioning-independent") {
    val m = 25
    val stream = zipfStream(vocab = 400, seed = 3)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = stream.size.toLong / (m + 1)
    for (nPart <- Seq(1, 4, 13)) {
      val df = stream.toDF("t").repartition(nPart)
      val summary = df.agg(MisraGries.misraGries(col("t"), m).as("s"))
        .head().getMap[String, Long](0).toMap
      assert(summary.size <= m)
      summary.foreach { case (k, est) =>
        assert(est <= exact(k) && exact(k) - est <= bound, s"$k at nPart=$nPart")
      }
      exact.foreach { case (k, c) =>
        if (c > bound) assert(summary.contains(k), s"$k lost at nPart=$nPart")
      }
    }
  }

  test("heavyHitters: equals exact bigram top-k under any partitioning") {
    // 5 head phrases, each ~160 occurrences — far above N/(m+1) ≈ 30 —
    // over a sparse tail (each tail bigram ≤ ~5). Exactness is only
    // guaranteed when the true top-k clear the survival bound, so the
    // fixture puts the top-k boundary well above the tail.
    val phrases = Seq("a b", "c d", "e f", "g h", "i j")
    val docs = (0 until 400).map { i =>
      val p = phrases(i % 5)
      (i.toLong, s"$p x${i % 97} $p y${i % 89}")
    }.toDF("doc_id", "text")
    // exact reference with a plain groupBy over all bigrams
    val toksRef = docs.select(explode(
      zip_with(
        slice(split(lower(col("text")), " "), lit(1),
          size(split(lower(col("text")), " ")) - 1),
        slice(split(lower(col("text")), " "), lit(2),
          size(split(lower(col("text")), " ")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("t"))
    val ref = toksRef.groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t").asc).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    for (nPart <- Seq(1, 7)) {
      val got = TextAnalysis.heavyHitters(docs.repartition(nPart), m = 64, k = 5)
        .orderBy("rank")
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(got == ref, s"nPart=$nPart got=$got ref=$ref")
    }
  }

  test("heavyHitters: gate-scale guarantee — top-10 clears N/(m+1) on testdata") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.heavyHitters(docs).collect()
    assert(out.length == 10)
    val n = docs.select(explode(split(lower(col("text")), " ")).as("w"))
      .count() - docs.count() // bigram count = token count − docs
    val bound = n / 1025
    assert(out.forall(_.getLong(2) > bound),
      s"top-10 min ${out.map(_.getLong(2)).min} within survival bound $bound — " +
        "exact-top-k guarantee would be void; raise m")
  }
}
