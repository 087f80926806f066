package graft

import graft.ops.Packing

/** Packing contracts: deterministic layout, contiguous offsets within
  * each shard stream, budget arithmetic — pinned against a sequential
  * reimplementation.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(41)
  private val fixture = (0 until 2000).map { i =>
    val n = 1 + rnd.nextInt(300)
    (i.toLong, Seq.fill(n)("tok").mkString(" "), "en", "s", n.toLong)
  }
  private lazy val docs =
    fixture.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("packDocs: matches a sequential per-shard reimplementation; stable under repartition") {
    val budget = 512
    val out = Packing.packDocs(docs, budget).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val out2 = Packing.packDocs(docs.repartition(11), budget).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out == out2 && out.size == 2000)

    // sequential oracle: per shard, docs in md5 order, running token count
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0 until 2000).map { i =>
      val h = md5hex(i.toString)
      (i.toLong, h, h.substring(0, 1))
    }.groupBy(_._3).flatMap { case (shard, ds) =>
      var cum = 0L
      ds.sortBy(_._2).map { case (id, _, _) =>
        val n = out(id)._2 // token count checked separately below
        val r = (id, (shard, n, cum / budget, cum % budget))
        cum += n
        r
      }
    }.toMap
    assert(out == expected)
    // token counts are the actual whitespace counts
    docs.collect().foreach { r =>
      assert(out(r.getLong(0))._2 == r.getString(1).split(" ").length.toLong)
    }
  }

  test("packDocs Bpe tokenizer: budget counted in BPE-ish tokens, layout still gapless") {
    val budget = 64
    // punctuation + digits + mixed case: whitespace and BPE counts diverge
    val mixed = (0 until 500).map { i =>
      val n = 1 + rnd.nextInt(40)
      val words = (0 until n).map(j => s"Word$j, x${i % 10}.${j % 7}!")
      (i.toLong, words.mkString(" "), "en", "s", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Packing.packDocs(mixed, budget, 1, Packing.Bpe).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // n_tokens is EXACTLY TextAnalysis.tokenBpe's count (same regex)
    val bpe = graft.ops.TextAnalysis.tokenBpe(mixed).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    out.foreach { case (id, _, n, _, _) => assert(n == bpe(id), s"doc $id") }
    // and it diverges from the whitespace count (the budget is genuinely
    // measured in subword pre-tokens, not spaces)
    val ws = Packing.packDocs(mixed, budget).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.exists { case (id, _, n, _, _) => n != ws(id) })
    // gapless per-shard token stream under the BPE measure
    out.groupBy(_._2).foreach { case (_, ds) =>
      val byStart = ds.map { case (_, _, n, chunk, off) =>
        (chunk * budget + off, n)
      }.sortBy(_._1)
      byStart.foldLeft(0L) { case (expectedStart, (start, n)) =>
        assert(start == expectedStart)
        start + n
      }
    }
  }

  test("packDocs shardNibbles=2: 256-way sharding, each shard stream contiguous") {
    val budget = 512
    val rows = Packing.packDocs(docs, budget, shardNibbles = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 2000)
    // 2-hex-char shards: 2000 docs over 256 buckets → far more streams
    // than the 1-nibble layout, every label exactly two nibbles
    val shards = rows.map(_._2).toSet
    assert(shards.forall(s => s.length == 2 && s.forall("0123456789abcdef".contains(_))))
    assert(shards.size > 200, s"only ${shards.size} distinct shards")
    // within each shard the chunk layout is one gapless token stream:
    // sorted by start offset, every doc starts where the previous ended
    rows.groupBy(_._2).foreach { case (_, ds) =>
      val byStart = ds.map { case (_, _, n, chunk, off) =>
        (chunk * budget + off, n)
      }.sortBy(_._1)
      byStart.foldLeft(0L) { case (expectedStart, (start, n)) =>
        assert(start == expectedStart)
        start + n
      }
    }
    // 1-nibble shard is the first hex char of the 2-nibble shard: the
    // wider layout refines, never re-hashes
    val narrow = Packing.packDocs(docs, budget).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, s2, _, _, _) =>
      assert(s2.substring(0, 1) == narrow(id))
    }
  }
}
