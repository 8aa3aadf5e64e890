package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Pins the packing laws `Packing.packSequences`' scaladoc promises: fixed
  * budget per non-tail sequence, per-document token conservation, and full
  * layout equality against a sequential per-shard fold (the obviously-
  * correct formulation the distributed running-sum + integer-div span
  * table must reproduce exactly).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("corpus packing conserves tokens and cuts full-budget sequences") {
    val budget = 512
    val packed = Packing.packDocuments(spark, sf, budget, nShards = 4).cache()
    try {
      val tc = graft.ops.TextAnalysis
        .tokenCount(Tables.table(spark, sf, "documents"))
        .select(col("doc_id"), col("n_bpe_tokens").cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      // conservation: each document's spans sum to its token count, and
      // every positive-token document appears
      val perDoc = packed.groupBy("doc_id").agg(sum("span_len").as("s"))
        .join(tc, Seq("doc_id"), "full")
      assert(perDoc.filter(col("s").isNull || col("n_tokens").isNull ||
        col("s") =!= col("n_tokens")).count() == 0)
      // every sequence except each shard's last is exactly `budget` tokens
      // and none exceeds it; in-sequence spans tile contiguously from 0
      val seqLen = packed.groupBy("shard", "seq_id")
        .agg(sum("span_len").as("len"), min("seq_offset").as("first"),
          max(col("seq_offset") + col("span_len")).as("hi"),
          count(lit(1)).as("n_spans"))
      val lastSeq = seqLen.groupBy("shard").agg(max("seq_id").as("last"))
      assert(seqLen.join(lastSeq, "shard")
        .filter(col("seq_id") =!= col("last") && col("len") =!= budget)
        .count() == 0, "non-tail sequence not at full budget")
      assert(seqLen.filter(col("len") > budget).count() == 0)
      // contiguous tiling: offsets start at 0 and the spans of a sequence
      // cover [0, len) with no gaps (sum == hi − first)
      assert(seqLen.filter(col("first") =!= 0 ||
        col("hi") =!= col("len")).count() == 0, "sequence not tiled")
      // sanity: multiple full sequences exist (the laws above aren't
      // vacuous on this corpus)
      assert(seqLen.filter(col("len") === budget).count() > 0)
    } finally { packed.unpersist(); () }
  }

  test("subword-mode packing conserves the SUBWORD token budget") {
    // the production pairing: pack from token_count_bpe's subword counts
    // (a trainer budgets subword tokens, not pre-tokenizer pieces) — the
    // same laws must hold, and conservation must be against the SUBWORD
    // counts, proving the mode switch actually changed the pack input
    val budget = 512
    val packed = Packing.packDocuments(spark, sf, budget, nShards = 4,
      subword = true).cache()
    try {
      val tc = graft.ops.TextAnalysis
        .tokenCountBpe(Tables.table(spark, sf, "documents"))
        .select(col("doc_id"), col("n_subword_tokens").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      val perDoc = packed.groupBy("doc_id").agg(sum("span_len").as("s"))
        .join(tc, Seq("doc_id"), "full")
      assert(perDoc.filter(col("s").isNull || col("n_tokens").isNull ||
        col("s") =!= col("n_tokens")).count() == 0)
      val seqLen = packed.groupBy("shard", "seq_id")
        .agg(sum("span_len").as("len"))
      val lastSeq = seqLen.groupBy("shard").agg(max("seq_id").as("last"))
      assert(seqLen.join(lastSeq, "shard")
        .filter(col("seq_id") =!= col("last") && col("len") =!= budget)
        .count() == 0, "non-tail sequence not at full budget")
      // subword counts genuinely differ from piece counts on this corpus
      // (otherwise this test would silently re-prove the default mode)
      val diff = graft.ops.TextAnalysis
        .tokenCountBpe(Tables.table(spark, sf, "documents"))
        .filter(col("n_subword_tokens") =!= col("n_pieces")).count()
      assert(diff > 0, "subword == piece counts corpus-wide")
    } finally packed.unpersist()
  }

  test("true-BPE-mode packing conserves the ENCODER's token budget") {
    // the tokenize_bpe pairing: budgets driven by the real merge-walk
    // counts, so span sums must equal the encoder's n_tokens per doc and
    // every non-tail sequence must cut at exactly the budget
    val budget = 256
    val packed = Packing.packDocumentsTokenized(spark, sf, budget,
      nShards = 4).cache()
    try {
      val tc = graft.ops.TextAnalysis
        .tokenizeBpe(Tables.table(spark, sf, "documents"))
        .select(col("doc_id"), col("n_tokens"))
        .filter(col("n_tokens") > 0)
      val perDoc = packed.groupBy("doc_id").agg(sum("span_len").as("s"))
        .join(tc, Seq("doc_id"), "full")
      assert(perDoc.filter(col("s").isNull || col("n_tokens").isNull ||
        col("s") =!= col("n_tokens")).count() == 0)
      val seqLen = packed.groupBy("shard", "seq_id")
        .agg(sum("span_len").as("len"))
      val lastSeq = seqLen.groupBy("shard").agg(max("seq_id").as("last"))
      assert(seqLen.join(lastSeq, "shard")
        .filter(col("seq_id") =!= col("last") && col("len") =!= budget)
        .count() == 0, "non-tail sequence not at full budget")
      // the encoder's counts genuinely differ from the ⌈len/4⌉ subword
      // approximation on this corpus (the mode switch is real)
      val approx = graft.ops.TextAnalysis
        .tokenCountBpe(Tables.table(spark, sf, "documents"))
        .select(col("doc_id"), col("n_subword_tokens"))
      val exact = graft.ops.TextAnalysis
        .tokenizeBpe(Tables.table(spark, sf, "documents"))
        .select(col("doc_id"), col("n_tokens"))
      assert(approx.join(exact, "doc_id")
        .filter(col("n_subword_tokens") =!= col("n_tokens")).count() > 0)
    } finally packed.unpersist()
  }

  test("packing equals the sequential per-shard fold on a random corpus") {
    val rnd = new scala.util.Random(9L)
    // includes zero-token documents (must be dropped) and budget-straddling
    // sizes (must split across sequences)
    val docs = (1L to 300L).map(i => (i, rnd.nextInt(40)))
    val budget = 17
    val shards = 3
    val got = Packing.packSequences(docs.toDF("doc_id", "n_tokens"),
        budget, shards)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5))).toSet
    // the fold: same md5 shard hash, then a plain running cursor per shard
    def shardOf(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % shards).toInt
    }
    val expected = scala.collection.mutable.Set
      .empty[(Int, Long, Long, Int, Long, Int)]
    docs.filter(_._2 > 0).groupBy(d => shardOf(d._1)).foreach {
      case (sh, ds) =>
        var pos = 0L
        ds.sortBy(_._1).foreach { case (id, n) =>
          val start = pos
          val end = pos + n
          var s = start / budget
          while (s <= (end - 1) / budget) {
            val spanStart = math.max(start, s * budget)
            val spanEnd = math.min(end, (s + 1) * budget)
            expected += ((sh, s, id, (spanStart - s * budget).toInt,
              spanStart - start, (spanEnd - spanStart).toInt))
            s += 1
          }
          pos = end
        }
    }
    assert(got == expected)
  }

  test("mixture-replicated corpora pack after deriving instance ids") {
    // the mixture → packing composition (the two halves of the
    // training-data story): mixSample emits duplicate doc_ids (one row
    // per epoch copy), and packSequences requires a ROW-UNIQUE id (its
    // span table orders the shard stream by it) — so the composition
    // derives instance_id = doc_id·8 + copy_idx before counting. The
    // laws: token conservation per INSTANCE, and double-weighted sources
    // contribute exactly twice their single-epoch token mass.
    val budget = 512
    val docs = Tables.table(spark, sf, "documents")
    val mixed = graft.ops.Sources.mixSample(docs, col("doc_id"),
        col("source"), Map("src0" -> 2.0), defaultWeight = 1.0, salt = "pk")
      .select((col("doc_id") * 8 + col("copy_idx")).as("instance_id"),
        col("doc_id").as("orig_id"), col("source"), col("text"))
    val counted = graft.ops.TextAnalysis
      .tokenCount(mixed.select(col("instance_id").as("doc_id"), col("text")))
      .select(col("doc_id"), col("n_ws_tokens").cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val packed = Packing.packSequences(counted, budget, nShards = 4).cache()
    try {
      // conservation per instance
      val perDoc = packed.groupBy("doc_id").agg(sum("span_len").as("s"))
        .join(counted, Seq("doc_id"), "full")
      assert(perDoc.filter(col("s").isNull || col("n_tokens").isNull ||
        col("s") =!= col("n_tokens")).count() == 0)
      // the ×2.0 source's packed token mass is exactly twice its
      // single-epoch mass (integer weights are exact, and every copy
      // packs independently under its own instance id)
      val single = graft.ops.TextAnalysis.tokenCount(
          docs.filter(col("source") === "src0"))
        .agg(sum(col("n_ws_tokens").cast("long"))).head().getLong(0)
      val packedSrc0 = packed
        .join(mixed.select(col("instance_id").as("doc_id"), col("source")),
          "doc_id")
        .filter(col("source") === "src0")
        .agg(sum("span_len")).head().getLong(0)
      assert(packedSrc0 == 2 * single,
        s"2.0-weight source packed $packedSrc0 tokens, expected ${2 * single}")
    } finally packed.unpersist()
  }

  test("packer rejects invalid budgets and drops empty documents") {
    intercept[IllegalArgumentException] {
      Packing.packSequences(Seq((1L, 5)).toDF("doc_id", "n_tokens"), 0)
    }
    val out = Packing.packSequences(
      Seq((1L, 0), (2L, -3)).toDF("doc_id", "n_tokens"), 16)
    assert(out.count() == 0)
  }

  test("deterministic shuffle is a permutation equal to the sequential" +
      " md5 sort; the salt is the epoch dial") {
    import graft.ops.Packing
    val docs = Tables.table(spark, sf, "documents")
    val out = Packing.shuffleDeterministic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // permutation law: positions are exactly 0..N-1
    assert(out.map(_._1).sorted.toSeq == (0L until out.length.toLong))
    // two-phase bucket ranking == the sequential global md5 sort
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSeq
    val want = ids
      .sortBy(id => (md5hex(s"${Packing.ShuffleSalt}:$id"), id))
    assert(out.sortBy(_._1).map(_._2).toSeq == want)
    // a different salt is a genuinely different epoch order
    val other = Packing
      .shuffleDeterministicOn(docs, "graft-epoch-1").collect()
      .sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(other.toSet == ids.toSet)
    assert(other != out.sortBy(_._1).map(_._2).toSeq)
  }

  test("shard manifest: contiguous full shards, conserved tokens," +
      " order-faithful digests") {
    val docs = Tables.table(spark, sf, "documents")
    val s = Packing.ManifestDocsPerShard
    val got = Packing.shardManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    val n = docs.count()
    // coverage laws: every doc in exactly one shard, shards contiguous,
    // all but the last exactly docsPerShard
    assert(got.map(_._2).sum == n)
    got.foreach { case (sid, nd, fp, lp, _, _) =>
      assert(fp == sid * s && lp == fp + nd - 1, s"shard $sid ragged")
      assert(nd == s || sid == got.map(_._1).max, s"short mid-shard $sid")
    }
    // digest law: brute-force epoch order, cut, md5 of joined ids
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes)
        .map("%02x".format(_)).mkString
    val ordered = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy { case (id, _) =>
        (md5hex(s"${Packing.ShuffleSalt}:$id"), id) }
    val want = ordered.zipWithIndex
      .groupBy { case (_, p) => p / s }
      .map { case (sid, rows) =>
        sid.toLong -> ((
          md5hex(rows.map(_._1._1).mkString(",")),
          rows.map { case ((_, t), _) =>
            t.map(_.split(" ", -1).length.toLong).getOrElse(0L) }.sum))
      }
    got.foreach { case (sid, _, _, _, nt, dg) =>
      assert(want(sid) == ((dg, nt)), s"shard $sid digest/tokens diverge")
    }
  }

  test("gathered id sequences re-concatenate to the per-shard id streams") {
    import graft.ops.{Packing, TextAnalysis}
    val budget = 256
    val nShards = 4
    val docs = Tables.table(spark, sf, "documents")
    val gathered = Packing.packGatherIdsOn(docs, budget, nShards).cache()
    try {
      // every sequence's gathered id count IS its seq_len, and non-tail
      // sequences are at full budget (the loader's fixed-shape contract)
      val withN = gathered
        .withColumn("n_ids", size(split(col("token_ids"), " ")))
      assert(withN.filter(col("n_ids") =!= col("seq_len")).count() == 0,
        "id count diverges from seq_len")
      val last = gathered.groupBy("shard").agg(max("seq_id").as("last"))
      assert(gathered.join(last, "shard")
        .filter(col("seq_id") =!= col("last") && col("seq_len") =!= budget)
        .count() == 0, "non-tail sequence not at full budget")
      // stream equality: concatenating a shard's sequences in seq_id
      // order reproduces concatenating its documents' id streams in
      // doc_id order — the gather lost nothing and reordered nothing
      val enc = TextAnalysis.tokenizeBpe(docs)
        .filter(col("n_tokens") > 0)
        .withColumn("shard",
          (conv(substring(md5(col("doc_id").cast("string")), 1, 15),
            16, 10).cast("long") % nShards).cast("int"))
      def streamOf(df: org.apache.spark.sql.DataFrame, ord: String) =
        df.groupBy("shard").agg(
          array_join(transform(
            array_sort(collect_list(struct(col(ord), col("token_ids")))),
            x => x.getField("token_ids")), " ").as("stream"))
      val direct = streamOf(enc, "doc_id")
      val fromSeqs = streamOf(gathered, "seq_id")
        .withColumnRenamed("stream", "stream2")
      val joined = direct.join(fromSeqs, "shard")
      assert(joined.count() == nShards.toLong)
      assert(joined.filter(col("stream") =!= col("stream2")).count() == 0,
        "per-shard id stream diverges through the gather")
    } finally { gathered.unpersist(); () }
  }

  test("epoch gather: the global sequence stream IS the mixture's id " +
      "streams concatenated in the epoch permutation") {
    import graft.ops.{Packing, TextAnalysis}
    val docs = Tables.table(spark, sf, "documents")
    val budget = Packing.GradedBudget
    val gathered = Packing.packGatherEpoch(spark, sf).cache()
    try {
      // loader shape: id count == seq_len, every non-final sequence at
      // full budget, shards are contiguous seq_id ranges
      val withN = gathered
        .withColumn("n_ids", size(split(col("token_ids"), " ")))
      assert(withN.filter(col("n_ids") =!= col("seq_len")).count() == 0)
      val maxSeq = gathered.agg(max("seq_id")).collect()(0).getLong(0)
      assert(gathered.filter(col("seq_id") =!= maxSeq &&
        col("seq_len") =!= budget).count() == 0,
        "non-final sequence not at full budget")
      assert(gathered.filter(
        col("shard") =!= expr(s"seq_id div ${Packing.EpochSeqsPerShard}"))
        .count() == 0, "shard must be the contiguous seq_id range")
      // conservation ACROSS COPIES: total gathered tokens == Σ over
      // mixture instances of the source doc's id-stream length (an
      // upweighted doc contributes once PER COPY)
      val enc = TextAnalysis.tokenizeBpe(docs)
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"), col("n_tokens"), col("token_ids"))
      val instTok = Packing.mixtureInstances(docs)
        .withColumn("doc_id", expr(s"inst div ${Packing.MixMaxCopies}"))
        .join(enc, Seq("doc_id"))
      val wantTokens = instTok.agg(sum("n_tokens")).collect()(0).getLong(0)
      val gotTokens = gathered.agg(sum("seq_len")).collect()(0).getLong(0)
      assert(gotTokens == wantTokens,
        s"token conservation: $gotTokens != $wantTokens")
      // stream equality in the EPOCH permutation: concatenating ALL
      // sequences in seq_id order reproduces concatenating the
      // instances' id streams in epoch-1 pos order
      val orderedInst = Packing.shuffleDeterministicOn(
          instTok.select(col("inst").as("doc_id")), Packing.EpochSalts(1))
        .select(col("pos"), col("doc_id").as("inst"))
        .join(instTok.select(col("inst"), col("token_ids")), Seq("inst"))
      def streamOf(df: org.apache.spark.sql.DataFrame, ord: String) =
        df.agg(array_join(transform(
          array_sort(collect_list(struct(col(ord), col("token_ids")))),
          x => x.getField("token_ids")), " ")).collect()(0).getString(0)
      assert(streamOf(gathered, "seq_id") == streamOf(orderedInst, "pos"),
        "gathered stream diverges from the epoch-ordered instance streams")
    } finally { gathered.unpersist(); () }
  }

  test("epoch orders are distinct reproducible permutations of the " +
      "mixture instances") {
    import graft.ops.{Packing, Sources}
    val eo = Packing.epochOrder(spark, sf).cache()
    try {
      // the instance set IS mix_sample's (doc_id, copy_idx) set, copies
      // dense below the stride
      val mix = Sources.mixSample(Tables.table(spark, sf, "documents"),
        col("doc_id"), col("source"),
        Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25),
        defaultWeight = 0.5, salt = "mix_v1")
        .select(col("doc_id"), col("copy_idx"))
      val n = mix.count()
      assert(mix.filter(col("copy_idx") >= Packing.MixMaxCopies)
        .count() == 0, "copy_idx must stay below the instance stride")
      Seq(0, 1).foreach { e =>
        val ep = eo.filter(col("epoch") === e)
        assert(ep.count() == n, s"epoch $e instance count")
        // dense permutation: positions are exactly 0..n-1
        val agg = ep.agg(min("pos"), max("pos"),
          countDistinct(col("pos"))).collect()(0)
        assert(agg.getLong(0) == 0L && agg.getLong(1) == n - 1 &&
          agg.getLong(2) == n, s"epoch $e positions not dense")
        // instances recovered arithmetically == the mixture's
        assert(ep.select("doc_id", "copy_idx").except(mix).count() == 0)
        assert(mix.except(ep.select("doc_id", "copy_idx")).count() == 0)
      }
      // the two epochs are DIFFERENT orders (different salts)
      val e0 = eo.filter(col("epoch") === 0)
        .select(col("doc_id"), col("copy_idx"), col("pos").as("p0"))
      val e1 = eo.filter(col("epoch") === 1)
        .select(col("doc_id"), col("copy_idx"), col("pos").as("p1"))
      assert(e0.join(e1, Seq("doc_id", "copy_idx"))
        .filter(col("p0") =!= col("p1")).count() > 0,
        "epoch salts must produce distinct orders")
    } finally { eo.unpersist(); () }
  }
}
