package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Native codegen'd dot-product expression: parity with the higher-order
  * spelling, null contract, and codegen participation.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (1L, Seq(0.5f, -1.5f, 2.25f), Seq(-2.0f, 0.0f, 8.0f))
  ).toDF("id", "a", "b")

  test("graft_dot equals the aggregate/zip_with spelling bit-for-bit") {
    GraftFunctions.register(spark)
    val hof = aggregate(
      zip_with(transform($"a", x => x.cast("double")),
        transform($"b", x => x.cast("double")), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = emb.select(call_function("graft_dot", $"a", $"b").as("native"),
      hof.as("reference")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
  }

  test("graft_dot: null input yields null; wrong type rejected at analysis") {
    GraftFunctions.register(spark)
    val withNull = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val out = withNull.select(call_function("graft_dot", $"a", $"b")).collect()
    assert(out(0).isNullAt(0))
    val bad = Seq((Seq(1.0), Seq(2.0))).toDF("a", "b") // double arrays
    intercept[Exception] {
      bad.select(call_function("graft_dot", $"a", $"b")).collect()
    }
  }

  test("graft_l2q equals the aggregate/zip_with spelling and the hand value") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1L, 5L, -3L), Seq(4L, 5L, 7L)),
      (Seq(1048576L, -1048576L), Seq(-1048576L, 1048576L))
    ).toDF("a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)
    val rows = df.select(call_function("graft_l2q", $"a", $"b").as("native"),
      hof.as("reference")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows(0).getLong(0) == 9L + 0L + 100L)
    assert(rows(1).getLong(0) == 2L * (2L * 1048576L) * (2L * 1048576L))
  }

  test("graft_l2q: null yields null, wrong type rejected, codegen participation") {
    GraftFunctions.register(spark)
    val withNull = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(withNull.select(call_function("graft_l2q", $"a", $"b"))
      .collect()(0).isNullAt(0))
    val bad = Seq((Seq(1.0), Seq(2.0))).toDF("a", "b") // double arrays
    intercept[Exception] {
      bad.select(call_function("graft_l2q", $"a", $"b")).collect()
    }
    val df = spark.range(10)
      .select(array($"id" + 1, $"id" + 2).as("a"),
        array(lit(2L), lit(3L)).as("b"))
      .select(call_function("graft_l2q", $"a", $"b").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [l2squaredlong"), plan)
    assert(df.agg(sum($"d")).as[Long].head() ==
      (0 until 10).map { i =>
        val d1 = (i + 1) - 2L; val d2 = (i + 2) - 3L; d1 * d1 + d2 * d2
      }.sum)
  }

  test("graft_dot participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // range() is a codegen source (local Seqs collapse to LocalTableScan
    // and would never show a codegen stage).
    val df = spark.range(10)
      .select(array(($"id" + 1).cast("float"), ($"id" + 2).cast("float")).as("a"),
        array(lit(2.0f), lit(3.0f)).as("b"))
      .select(call_function("graft_dot", $"a", $"b").as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dotproductfloat"), plan)
    assert(df.agg(sum($"d")).as[Double].head() ==
      (0 until 10).map(i => (i + 1.0) * 2.0 + (i + 2.0) * 3.0).sum)
  }

  test("graft_sdot: sorted-merge sparse dot — hand values, disjoint/empty/null, codegen participation") {
    graft.functions.GraftFunctions.register(spark)
    def vec(entries: (String, Long)*) =
      array(entries.map { case (t, w) => struct(lit(t).as("t"), lit(w).as("w")) }: _*)
    // shared {b, d}: 2*20 + 5*7 = 75; a-only c/e and b-only f ignored
    val rows = Seq(
      (vec("a" -> 1L, "b" -> 2L, "d" -> 5L), vec("b" -> 20L, "d" -> 7L, "f" -> 9L), 75L),
      (vec("a" -> 1L), vec("b" -> 1L), 0L),              // disjoint
      (array().cast("array<struct<t:string,w:bigint>>"),
        vec("a" -> 1L), 0L),                              // empty side
      (vec("x" -> 3L), vec("x" -> 4L), 12L)               // single shared
    )
    rows.zipWithIndex.foreach { case ((a, b, want), i) =>
      val got = spark.range(1).select(call_function("graft_sdot", a, b).as("d"))
        .as[Long].head()
      assert(got == want, s"case $i: got $got want $want")
    }
    // null propagates
    val n = spark.range(1).select(
      call_function("graft_sdot", lit(null).cast(
        "array<struct<t:string,w:bigint>>"), vec("a" -> 1L))).collect()
    assert(n(0).isNullAt(0))
    // participates in whole-stage codegen (data-dependent arg so the
    // optimizer can't constant-fold the call away)
    val df = spark.range(10)
      .select(call_function("graft_sdot",
        array(struct(lit("a").as("t"), lit(2L).as("w")),
          struct(lit("b").as("t"), $"id".as("w"))),
        vec("b" -> 10L)).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Project [sparsedotsorted"), plan)
    assert(plan.contains("*(1)"), plan)
    assert(df.as[Long].collect().toSeq == (0 until 10).map(_ * 10L))
    // equals the interpreted map/intersect spelling on random data
    val rnd = new scala.util.Random(7)
    val fixture = (0 until 50).map { i =>
      def side = (0 to rnd.nextInt(7)).map(j =>
        (s"t${rnd.nextInt(10)}", rnd.nextInt(100).toLong))
        .groupBy(_._1).map { case (t, g) => (t, g.head._2) }.toSeq.sortBy(_._1)
      val (a, b) = (side, side)
      val want = a.toMap.map { case (t, w) => w * b.toMap.getOrElse(t, 0L) }.sum
      (i, a, b, want)
    }
    fixture.foreach { case (i, a, b, want) =>
      val got = spark.range(1)
        .select(call_function("graft_sdot", vec(a: _*), vec(b: _*)).as("d"))
        .as[Long].head()
      assert(got == want, s"random case $i")
    }
  }

  test("graft_ldot equals the aggregate/zip_with spelling and the hand value") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(3L, -2L, 7L), Seq(10L, 100L, -1L)),
      (Seq(0L, 0L, 0L), Seq(1L, 2L, 3L))
    ).toDF("a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val rows = df.select(call_function("graft_ldot", $"a", $"b").as("native"),
      hof.as("reference")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows(0).getLong(0) == 3L * 10 + -2L * 100 + 7L * -1)
    // null contract + codegen participation
    val withNull = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(withNull.select(call_function("graft_ldot", $"a", $"b"))
      .collect()(0).isNullAt(0))
    // codegen participation: a range-based frame (a local Seq constant-
    // folds to LocalTableScan before any codegen stage exists)
    val ranged = spark.range(5).select(
      call_function("graft_ldot",
        array($"id", $"id" * 2), array(lit(3L), lit(5L))).as("d"))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    assert(ranged.as[Long].collect().toSeq ==
      (0 until 5).map(i => 3L * i + 5L * 2 * i))
  }

  test("graft_md5pre equals unhex(md5(concat)) and min-orders identically") {
    GraftFunctions.register(spark)
    val df = Seq("alpha beta", "x", "", "ünïcode test").toDF("s")
    val rows = df.select(
      call_function("graft_md5pre", lit("3:"), $"s").as("native"),
      unhex(md5(concat(lit("3:"), $"s"))).as("reference")).collect()
    rows.foreach { r =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    }
    // the minhash contract: min over the BINARY digests + hex rebuild
    // equals min over the hex-string spelling
    val agg = df.agg(
      lower(hex(min(call_function("graft_md5pre", lit("3:"), $"s")))).as("n"),
      min(md5(concat(lit("3:"), $"s"))).as("r")).head()
    assert(agg.getString(0) == agg.getString(1))
  }

  test("graft_md5u32 equals the conv(substring(md5)) spelling over random strings") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val df = ((0 until 100).map(_ => rnd.nextString(rnd.nextInt(12))) ++
      Seq("", "token", "ünïcode")).toDF("t")
    val rows = df.select(
      call_function("graft_md5u32", $"t").as("native"),
      conv(substring(md5($"t"), 1, 8), 16, 10).cast("long").as("reference"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }
}
