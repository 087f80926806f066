package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic-sampling contracts: same subset under any partitioning,
  * rates within binomial tolerance, strata respected, exact-k stable.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 10000).map { i =>
    (i.toLong, if (i % 10 < 6) "en" else if (i % 10 < 9) "de" else "fr")
  }.toDF("doc_id", "lang")

  test("hashSample: deterministic under repartitioning; rate within tolerance") {
    val a = Sampling.hashSample(corpus, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(corpus.repartition(13), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // binomial(10000, 0.2): sd = 40; allow 5 sd
    assert(math.abs(a.size - 2000) < 200, s"sampled ${a.size}")
    // selection is per-key, not positional: a subset of rows selects the
    // same keys the full corpus did
    val half = Sampling.hashSample(corpus.filter($"doc_id" < 5000), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(half == a.filter(_ < 5000))
  }

  test("stratifiedHashSample: per-stratum rates; default applies to unknown strata") {
    val out = Sampling.stratifiedHashSample(corpus, "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.1), defaultRate = 0.05)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("en") - 3000) < 350, s"en ${out("en")}")   // 6000 × 0.5
    assert(math.abs(out("de") - 300) < 120, s"de ${out("de")}")    // 3000 × 0.1
    assert(math.abs(out.getOrElse("fr", 0L) - 50) < 50, s"fr ${out.get("fr")}") // 1000 × 0.05
    // zero default drops unknown strata entirely
    val strict = Sampling.stratifiedHashSample(corpus, "doc_id", "lang",
      Map("en" -> 0.5))
    assert(strict.filter($"lang" =!= "en").count() == 0)
  }

  test("hashSampleExact: exactly k, stable, equals the k smallest hashes") {
    val got = Sampling.hashSampleExact(corpus, "doc_id", 25)
      .select("doc_id").as[Long].collect()
    assert(got.length == 25)
    val again = Sampling.hashSampleExact(corpus.repartition(7), "doc_id", 25)
      .select("doc_id").as[Long].collect()
    assert(got.toSeq == again.toSeq)
    val manual = corpus.select($"doc_id", md5($"doc_id".cast("string")).as("h"))
      .orderBy($"h", $"doc_id").limit(25).select("doc_id").as[Long].collect()
    assert(got.toSeq == manual.toSeq)
  }

  test("weightedSampleExact: deterministic, weight-monotone, Scala-exact") {
    // weights follow doc_id so heavy/light rows are known; a Scala
    // reimplementation of (uint32 md5 prefix) / weight must pick the
    // identical set in the identical order
    val weighted = corpus.withColumn("w", ($"doc_id" % 100 + 1).cast("long"))
    val got = Sampling.weightedSampleExact(weighted, "doc_id", "w", 30)
      .select("doc_id").as[Long].collect()
    assert(got.length == 30)
    val again = Sampling.weightedSampleExact(weighted.repartition(9), "doc_id", "w", 30)
      .select("doc_id").as[Long].collect()
    assert(got.toSeq == again.toSeq)
    val md = java.security.MessageDigest.getInstance("MD5")
    val manual = (0L until 10000L).map { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16).toDouble / (id % 100 + 1).toDouble, id)
    }.sorted.take(30).map(_._2)
    assert(got.toSeq == manual)
    // monotonicity: zeroed weights never selected; inflating one row's
    // weight 10^6× forces it into the sample
    val boosted = corpus.withColumn("w",
      when($"doc_id" === 777L, 100000000L).otherwise(1L))
    val sel = Sampling.weightedSampleExact(boosted, "doc_id", "w", 10)
      .select("doc_id").as[Long].collect()
    assert(sel.contains(777L))
  }

  test("capPerStratum: top-k by score per stratum, ties to lowest id, k beyond size keeps all") {
    val df = Seq(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.8), (4L, "a", 0.1),
      (5L, "b", 0.5)
    ).toDF("doc_id", "source", "score")
    val kept = Sampling.capPerStratum(df, "source", "score", "doc_id", 2)
      .select("doc_id").as[Long].collect().toSet
    // a: 0.9 wins, then the 0.8 tie goes to id 2 (not 3); b keeps its one
    assert(kept == Set(1L, 2L, 5L))
    // deterministic under repartitioning
    val again = Sampling.capPerStratum(df.repartition(4), "source", "score",
      "doc_id", 2).select("doc_id").as[Long].collect().toSet
    assert(again == kept)
    // k ≥ stratum size keeps everything
    assert(Sampling.capPerStratum(df, "source", "score", "doc_id", 10)
      .count() == 5L)
    intercept[IllegalArgumentException] {
      Sampling.capPerStratum(df, "source", "score", "doc_id", 0)
    }
  }

  test("budgetPerStratum: hash-order prefix per stratum until the budget fills") {
    // Scala reimplementation of the selection: per stratum, docs in
    // (md5 hex, id) order, keep while the running weight stays <= budget
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val weighted = corpus.withColumn("w", ($"doc_id" % 50 + 1).cast("int"))
    val budgets = Map("en" -> 500L, "de" -> 200L)
    val got = Sampling.budgetPerStratum(weighted, "lang", "doc_id", "w",
        budgets, defaultBudget = 100L)
      .select("doc_id").as[Long].collect().toSet
    val manual = (0 until 10000).map(_.toLong).groupBy { id =>
      if (id % 10 < 6) "en" else if (id % 10 < 9) "de" else "fr"
    }.flatMap { case (lang, ids) =>
      val budget = budgets.getOrElse(lang, 100L)
      var cum = 0L
      ids.sortBy(id => (hex(id), id)).takeWhile { id =>
        cum += id % 50 + 1; cum <= budget
      }
    }.toSet
    assert(got == manual && got.nonEmpty)
    // deterministic under repartitioning; selection is a prefix: growing
    // the corpus never evicts a selected doc that still fits
    val again = Sampling.budgetPerStratum(weighted.repartition(11), "lang",
        "doc_id", "w", budgets, 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got)
    // zero budget (the default here) selects nothing from unknown strata
    assert(Sampling.budgetPerStratum(weighted, "lang", "doc_id", "w",
      Map("en" -> 500L)).filter($"lang" =!= "en").count() == 0L)
    intercept[IllegalArgumentException] {
      Sampling.budgetPerStratum(weighted, "lang", "doc_id", "w",
        Map("en" -> -1L))
    }
  }

  test("shuffleShard: stable shard/pos layout, dense 0-based positions") {
    val out = Sampling.shuffleShard(corpus, "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(out.length == 10000)
    // shard is the uint32 md5 prefix mod 8
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    out.foreach { case (id, shard, _) =>
      assert(shard == (java.lang.Long.parseLong(hex(id), 16) % 8).toInt)
    }
    // positions within each shard are dense 0..n-1 in (hash, id) order
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length))
      val byPos = rows.sortBy(_._3).map(_._1).toSeq
      assert(byPos == rows.map(_._1).sortBy(id => (hex(id), id)).toSeq)
    }
    // deterministic under repartitioning
    val again = Sampling.shuffleShard(corpus.repartition(7), "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(again.toSet == out.toSet)
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(corpus, "doc_id", 0)
    }
  }

  test("topFractionPerStratum: ceil(n*f) best rows per stratum, ties to lowest id") {
    // stratum a: 5 rows, f=0.3 → ceil(1.5)=2 kept; b: 1 row → ceil(0.3)=1
    val df = Seq(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.8), (4L, "a", 0.1),
      (5L, "a", 0.05), (6L, "b", 0.5)
    ).toDF("doc_id", "lang", "score")
    val kept = Sampling.topFractionPerStratum(df, "lang", "score", "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    // a keeps 0.9 and the 0.8 tie at lowest id (2); b keeps its only row
    assert(kept == Set(1L, 2L, 6L))
    // f=1.0 keeps everything; fraction bounds enforced
    assert(Sampling.topFractionPerStratum(df, "lang", "score", "doc_id", 1.0)
      .count() == 6L)
    intercept[IllegalArgumentException] {
      Sampling.topFractionPerStratum(df, "lang", "score", "doc_id", 0.0)
    }
    // deterministic under repartitioning
    val again = Sampling.topFractionPerStratum(df.repartition(5), "lang",
      "score", "doc_id", 0.3).select("doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("splitByGroup: a group never straddles folds; fractions and determinism hold") {
    // 2000 groups × 5 rows each — every row of a group must share its fold
    val rows = (0 until 10000).map(i => (i.toLong, (i % 2000).toLong))
      .toDF("row_id", "grp")
    val out = Sampling.splitByGroup(rows, "grp")
    // leakage check: each group maps to exactly one fold
    assert(out.groupBy("grp")
      .agg(countDistinct($"split").as("n"))
      .filter($"n" =!= 1L).isEmpty)
    // fold sizes: binomial(2000, f) on GROUPS — 5 sd tolerance
    val byFold = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFold.keySet == Set("train", "val", "test"))
    assert(math.abs(byFold("train") - 8000L) < 450, byFold.toString)
    assert(math.abs(byFold("val") - 1000L) < 350, byFold.toString)
    assert(math.abs(byFold("test") - 1000L) < 350, byFold.toString)
    // deterministic under repartitioning
    val a = out.select("row_id", "split").as[(Long, String)].collect().toSet
    val b = Sampling.splitByGroup(rows.repartition(17), "grp")
      .select("row_id", "split").as[(Long, String)].collect().toSet
    assert(a == b)
    // degenerate fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.splitByGroup(rows, "grp", valFrac = 0.6, testFrac = 0.5)
    }
  }

  test("mixTemperature: exact budget split on a hand-computed fixture") {
    // A: 10 rows x 10 tokens = 100; B: 90 rows x 10 = 900.
    // alpha=0.5: Qa = 10*2^20, Qb = 30*2^20 -> budgets 25 / 75 of 100.
    // Prefix fill at weight 10 -> exactly 2 rows from A, 7 from B.
    val rows = ((0 until 10).map(i => (i.toLong, "A", 10L)) ++
      (100 until 190).map(i => (i.toLong, "B", 10L)))
      .toDF("id", "src", "w")
    val out = Sampling.mixTemperature(rows, "src", "id", "w", 100L)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("A" -> 2L, "B" -> 7L))
    val budgets = out.select("src", "budget").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(budgets == Map("A" -> 25L, "B" -> 75L))
    // cum_tokens respects the budget row-by-row
    assert(out.filter(col("cum_tokens") > col("budget")).isEmpty)
  }

  test("mixTemperature: alpha flattens the mix toward low-resource strata; alpha=1 is proportional") {
    val rows = ((0 until 990).map(i => (i.toLong, "big", 10L)) ++
      (1000 until 1010).map(i => (i.toLong, "small", 10L)))
      .toDF("id", "src", "w")
    def budgetOf(alpha: Double, src: String): Long =
      Sampling.mixTemperature(rows, "src", "id", "w", 1000L, alpha)
        .filter(col("src") === src).select("budget").head().getLong(0)
    // proportional share of 'small' = 100/10000 = 1% -> budget 10
    assert(budgetOf(1.0, "small") == 10L)
    // sqrt flattening: sqrt(100)/(sqrt(9900)+sqrt(100)) ~ 9.1% -> ~91
    val flat = budgetOf(0.5, "small")
    assert(flat > 80L && flat < 100L, s"flattened small budget $flat")
    // quarter power flattens harder still
    assert(budgetOf(0.25, "small") > flat)
    // unknown alpha rejected (pow is not engine-exact)
    intercept[IllegalArgumentException] {
      Sampling.mixTemperature(rows, "src", "id", "w", 1000L, 0.7)
    }
  }

  test("mixTemperature: selection is deterministic and a pure function of content") {
    val rows = (0 until 200).map(i =>
      (i.toLong, s"s${i % 5}", (i % 7 + 1).toLong)).toDF("id", "src", "w")
    val a = Sampling.mixTemperature(rows, "src", "id", "w", 300L)
      .select("id").as[Long].collect().toSet
    val b = Sampling.mixTemperature(rows.repartition(13), "src", "id", "w", 300L)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
