package graft

/** Physical-plan regression guards: the scale properties the operators
  * are DESIGNED around, pinned as plan-text assertions so a refactor
  * can't silently trade them away. Runs on sf0.001 — plan shape, not
  * data volume, is under test (AQE may re-plan at runtime, but a
  * nested-loop or an unpartitioned window in the INITIAL plan is already
  * the bug).
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def shuffles(p: String): Int =
    "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r
      .findAllIn(p).length

  test("range_join: equi-join on (key, bucket) — never a nested loop") {
    val p = plan("range_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("join_star: bounded dims broadcast; fact side never shuffles for them") {
    val p = plan("join_star")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("sessionize: both windows ride ONE user_id shuffle") {
    val p = plan("sessionize")
    // lag + running sum share partitioning; the aggregate reuses it too:
    // one hash shuffle total (plus AQE bookkeeping, which adds none)
    assert(shuffles(p) <= 2, s"shuffles=${shuffles(p)}\n$p")
    // an unpartitioned window would surface as a single-partition exchange
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("ohlc_hourly: pure hash aggregate — no window, no sort, map-side partials") {
    val p = plan("ohlc_hourly")
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
    assert(shuffles(p) <= 1, s"shuffles=${shuffles(p)}\n$p")
  }

  test("pii_scrub and text maps: zero shuffles — pure projection pipelines") {
    for (q <- Seq("pii_scrub", "text_stats", "token_bpe")) {
      val p = plan(q)
      assert(shuffles(p) == 0, s"$q shuffles=${shuffles(p)}\n$p")
      assert(!p.contains("Join"), s"$q\n$p")
    }
  }

  test("sample_weighted and seq_topk: TakeOrderedAndProject, never a global sort") {
    for (q <- Seq("sample_weighted", "seq_topk")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q\n$p")
    }
  }

  test("dedup_exact: aggregate family only — no window, no join") {
    val p = plan("dedup_exact")
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("emb_neardup_md5: candidate join is a hash equi-join on bucket — never a cross product") {
    val p = plan("emb_neardup_md5")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("ann_md5: single-row query broadcast + top-k heap, no global sort") {
    val p = plan("ann_md5")
    // the 1-row query side broadcasts (a nested-loop join against ONE row
    // is the correct plan — the guard is that the top-k never globally
    // sorts the corpus)
    assert(p.contains("Broadcast"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("scan pruning: projections reach the parquet reader") {
    // token_bpe touches (doc_id, text) only — the scan must not read
    // lang/source/n_chars
    val p = plan("token_bpe")
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), p)
    assert(!readSchema.contains("n_chars") && !readSchema.contains("source"),
      readSchema)
  }

  test("unigram_logprob / kl_drift: the corpus explodes ONCE — every other consumer rides ReusedExchange") {
    // three consumers each (doc/slice side, vocabulary, totals) — without
    // exchange reuse these are 2–3 redundant full-corpus token explodes
    // at 100 TB. Reuse is a RUNTIME property: check the AQE-final plan.
    for (name <- Seq("unigram_logprob", "kl_drift", "distinctive_terms")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val executed = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert("Generate explode".r.findAllIn(executed).length == 1,
        s"$name explodes the corpus more than once:\n$executed")
      assert(executed.contains("ReusedExchange"), s"$name:\n$executed")
    }
  }

  test("split_by_group: fold assignment is a pure map — only the rollup aggregate shuffles") {
    val p = plan("split_by_group")
    assert(!p.contains("Join"), p) // no lookup table, no shuffle to assign folds
    // the two exchanges are the count-distinct aggregate pair, nothing more
    assert(shuffles(p) <= 2, s"shuffles=${shuffles(p)}\n$p")
  }

  test("dedup_keep_best: payload branch never reads text; survivors via semi join") {
    val p = plan("dedup_keep_best")
    // payload discipline: the outer scan reads only the 4 output columns —
    // text is read once, in the key/score branch
    assert(p.contains(
      "ReadSchema: struct<doc_id:bigint,lang:string,source:string,n_chars:bigint>"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("winsorize / robust_scale: 1-row bounds broadcast — the corpus never reshuffles for the clamp") {
    for (q <- Seq("winsorize_price", "robust_scale")) {
      val p = plan(q)
      // the quantile row arrives by broadcast; a hash/range exchange here
      // would mean the full fact table shuffles just to apply the bounds
      assert(p.contains("Broadcast"), s"$q:\n$p")
      assert(shuffles(p) == 0, s"$q shuffles=${shuffles(p)}\n$p")
    }
  }

  test("shuffle_shard / mix_token_budget: exactly one shuffle — the per-stratum window") {
    for (q <- Seq("shuffle_shard", "mix_token_budget")) {
      val p = plan(q)
      assert(shuffles(p) == 1, s"$q shuffles=${shuffles(p)}\n$p")
      // the window must be stratum-partitioned, never a global sort
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("atr / stochastic: bar-level indicators — the OHLC aggregate plus one symbol-partitioned window") {
    for (q <- Seq("atr", "stochastic", "obv")) {
      val p = plan(q)
      // shuffle 1: the hourly groupBy; shuffle 2: repartition to the
      // symbol axis for the bar windows — never a single-task window
      assert(shuffles(p) <= 2, s"$q shuffles=${shuffles(p)}\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("drawdown / twap_hourly: one symbol-partitioned window, never single-task") {
    // drawdown: one hash exchange for the per-symbol prefix-max window;
    // twap: the lead window's symbol exchange + the bar groupBy
    for ((q, maxSh) <- Seq("drawdown" -> 1, "twap_hourly" -> 2)) {
      val p = plan(q)
      assert(shuffles(p) <= maxSh, s"$q shuffles=${shuffles(p)}\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("ohlc_rollup: two hash-aggregate layers — no window, no sort") {
    val p = plan("ohlc_rollup")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
    assert(shuffles(p) <= 2, s"shuffles=${shuffles(p)}\n$p")
  }

  test("volume_bars: one symbol-partitioned cumsum window + one hash agg") {
    for (q <- Seq("volume_bars", "volume_bars_chunked")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
      assert(p.contains("HashAggregate"), s"$q:\n$p")
    }
  }

  test("salient_terms: doc-partitioned top-k window, corpus size as one broadcast row") {
    val p = plan("salient_terms")
    // the top-k window must partition on doc_id — never a global sort
    // (the corpus-size reduction contributes the plan's only
    // single-partition exchange: a one-row aggregate, by construction)
    assert("windowspecdefinition\\(doc_id".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("seasonality_grid: one constant-size hash aggregate — no window, one shuffle") {
    val p = plan("seasonality_grid")
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
    assert(shuffles(p) <= 1, s"shuffles=${shuffles(p)}\n$p")
  }

  test("twap_anchored / returns_autocorr / amihud: symbol-partitioned windows, never single-task") {
    for (q <- Seq("twap_anchored", "returns_autocorr", "amihud")) {
      val p = plan(q)
      assert(shuffles(p) <= 3, s"$q shuffles=${shuffles(p)}\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("postings: one k-bounded hash aggregate — no window, no collect-then-truncate") {
    val p = plan("postings")
    // the min-k Aggregator folds inside the agg; a Window here would
    // mean the hot-term row_number spelling crept back in
    assert(!p.contains("Window"), p)
    assert(shuffles(p) <= 1, s"shuffles=${shuffles(p)}\n$p")
  }

  test("rolling_corr: bucket-aligned equi-join + pair-partitioned window — no nested loop") {
    val p = plan("rolling_corr")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the window partitions on the pair label, so a many-pair surface
    // parallelizes; a lost partitionBy would plan Exchange SinglePartition
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("heavy_hitters: candidates broadcast back; the token stream never joins by shuffle") {
    val p = plan("heavy_hitters")
    // candidate semi-join must be broadcast (≤ m rows), not a shuffled
    // hash join that would repartition the full token stream
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // top-k over ≤ m recounted candidates: bounded take, no global sort
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ann_quantized: both stages are TakeOrderedAndProject over broadcasts — the corpus never shuffles") {
    val p = plan("ann_quantized")
    // absmax row + query row ride broadcasts into the scan pipeline
    assert("BroadcastNestedLoopJoin|BroadcastHashJoin".r.findAllIn(p).nonEmpty, p)
    // candidate pass and re-rank are bounded takes, never a full sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!"Exchange rangepartitioning".r.findAllIn(p).hasNext, p)
    // the embedding payload must not hash-shuffle anywhere
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("split_embargo / walk_forward: symbol-partitioned windows, never single-task") {
    for (q <- Seq("split_embargo", "walk_forward")) {
      val p = plan(q)
      // row_number/count (and walk_forward's block prefix sums) all
      // partition on event_type — an unpartitioned window would plan an
      // Exchange SinglePartition and serialize the corpus into one task
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
      assert(p.contains("Window"), s"$q:\n$p")
      assert(!p.contains("Join"), s"$q:\n$p")
    }
  }

  test("macd / rsi: all EMAs ride ONE symbol shuffle and ONE sort") {
    // macd chains a second Window (signal over the derived macd line) and
    // rsi a lag + EMA pair — same partitioning/ordering throughout, so
    // Catalyst must plan one hash exchange and one sort total; a second
    // Sort would mean the derived-column window re-sorted the stream
    for (q <- Seq("macd", "rsi")) {
      val p = plan(q)
      assert(shuffles(p) == 1, s"$q shuffles=${shuffles(p)}\n$p")
      assert("Sort \\[".r.findAllIn(p).length == 1, s"$q sorts:\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("microstructure tier: bar/tick windows partition by symbol — never single-task") {
    // mfi/cmf/cci/dmi/donchian: OHLC(-qty) hash aggregate + one
    // symbol-partitioned bar window (shuffle 1 = groupBy, shuffle 2 =
    // repartition to the symbol axis); vwap: pure aggregate;
    // kaufman_er/roll_spread: tick windows riding one symbol shuffle.
    for ((q, maxSh) <- Seq("mfi" -> 2, "cmf" -> 2, "cci" -> 2, "dmi" -> 2,
        "donchian" -> 2, "vwap_hourly" -> 1, "kaufman_er" -> 1,
        "roll_spread" -> 2, "realized_vol" -> 2, "ichimoku" -> 2,
        "frac_diff" -> 2, "return_moments" -> 3, "kama" -> 2,
        "tick_rule_flow" -> 2, "run_lengths" -> 3)) {
      val p = plan(q)
      assert(shuffles(p) <= maxSh, s"$q shuffles=${shuffles(p)}\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
    // variance_ratio / hurst_rs branch off a materialized rank+lag cut;
    // the guard is that no branch (sampled lags, per-block windows)
    // funnels into a single task.
    for (q <- Seq("variance_ratio", "hurst_rs")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
    }
  }

  test("cosine_allpairs: merge-joined candidate/verify legs above the cuts, codegen'd sdot verify, no nested loop") {
    // feats/pref sit below Checkpoints.stable materialization cuts (the
    // tokenize→idf→norm subtree otherwise replays once per consumer —
    // six times in the un-cut physical tree), so the composed plan under
    // test is the candidate join + verify stage above the cuts.
    val p = plan("cosine_allpairs")
    // prefix×prefix candidates and both per-doc vector attaches must be
    // sort-merge: a mis-estimated broadcast or shuffled-hash build on a
    // post-window side is the OOM path the 50k-doc stress measured
    assert("SortMergeJoin".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // verify runs the native sorted-merge dot, not an interpreted HOF
    // and not a per-(doc, term) row-join re-aggregation
    assert(p.toLowerCase.contains("sparsedotsorted"), p)
    // candidate-pair dedup is a hash aggregate, never a global funnel
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("r18-opt cuts hold: jaccard_allpairs / dsir_weights / bigram_logprob tokenize the corpus below ONE materialization cut") {
    // the r18 optimization round measured these queries re-running their
    // corpus explode per consumer (3-4 Generate passes in the AQE-final
    // tree; plans/r18/*_before.txt) — the stable cuts moved the tokenize
    // into one eager materialization, so the executed plan above the
    // cuts must contain NO corpus explode and at least one cut leaf
    for ((name, minCuts) <- Seq("jaccard_allpairs" -> 2, "dsir_weights" -> 1,
        "bigram_logprob" -> 3)) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val executed = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!executed.contains("Generate explode"),
        s"$name re-explodes the corpus above its cuts:\n$executed")
      assert("Scan ExistingRDD".r.findAllIn(executed).length >= minCuts,
        s"$name expected >= $minCuts materialization cuts:\n$executed")
    }
  }

  test("banded near-dup (production + md5 twin): first-colliding-table filter in the join, no candidate distinct, shuffled-hash pair join") {
    // the r15 twin shape, r16-ported to the production float-plane form
    // (both now share bandedFirstCollidePairs): each pair is emitted ONLY
    // at its first colliding table — graft_firstmatch over the packed
    // signatures lives in the ShuffledHashJoin condition, so there must
    // be NO aggregate keyed on the candidate pair (the old distinct()
    // re-shuffled the ~L× cross-table multiplicity;
    // bench/r15_md5_twins.json: 192.5→17.9 s — the mass cut dominated)
    for (q <- Seq("emb_neardup", "emb_neardup_banded_md5")) {
      val p = plan(q)
      assert(p.contains("ShuffledHashJoin"), s"$q\n$p")
      assert(p.contains("graft_firstmatch(sig"), s"$q\n$p")
      assert(!p.contains("keys=[vec_a"), s"$q\n$p") // no (vec_a, vec_b) distinct
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q\n$p")
      // (the graft_ldot / graft_fddot sign-bit packing sits BELOW the
      // Checkpoints.stable cut — Scan ExistingRDD here — so it is pinned
      // by the codegen parity specs in DotProductSpec, not this string)
    }
  }
}
