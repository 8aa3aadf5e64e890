package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.table

/** Training-sequence packing: concatenate documents in token space and
  * chunk the stream into fixed-budget sequences — the standard packed
  * pretraining layout (documents span sequence boundaries; no padding
  * waste). The reference pipeline stops at per-document token counts
  * (`MarchineLearningAlgorithm.txt` ends at feature assembly); packing is
  * the step a 100 TB training-data pipeline needs between token counting
  * and the trainer's data loader. Graded as `pack_sequences`: the whole
  * span derivation is running-sum + integer-division arithmetic, so a
  * DuckDB window twin checks it hash-exactly.
  *
  * Layout produced: every document is hash-assigned to one of `nShards`
  * independent token streams; within a shard, documents concatenate in
  * `doc_id` order and the stream is cut every `budget` tokens. The output
  * is the span table a loader consumes directly: for each (document ×
  * overlapping sequence), which slice of the document ([doc_offset,
  * doc_offset+span_len)) lands where in the sequence (at seq_offset).
  *
  * Scale shape: ONE shuffle (hash by shard for the running-sum window),
  * then pure per-row arithmetic and a bounded explode (a document emits
  * ceil(n_tokens/budget)+1 spans at most). Parallelism = `nShards`, so at
  * cluster scale you set it to O(output shards) — thousands — and each
  * shard's window is a single sequential pass over its own partition;
  * hash sharding keeps shard sizes uniform (no skew key exists: the shard
  * is derived from `doc_id`, which is unique). No driver state, no
  * collect; the span table is itself partitionable by (shard, seq_id).
  */
object Packing {

  /** Pack a `(doc_id: long, n_tokens: int-like)` frame into
    * `budget`-token sequences over `nShards` independent streams.
    *
    * Returns one row per (document, sequence) overlap:
    * (shard, seq_id, doc_id, seq_offset, doc_offset, span_len) where
    * `seq_id` counts sequences within the shard, `seq_offset` is where the
    * span starts inside the sequence, and `doc_offset` is where it starts
    * inside the document. Every sequence except the last of each shard is
    * exactly `budget` tokens; token counts are conserved (the suite pins
    * both laws plus a brute-force fold equality on random corpora).
    *
    * Empty documents (n_tokens ≤ 0) occupy no token space and are
    * dropped — the loader contract, mirroring `corpusClean`'s floor.
    *
    * `doc_id` must be ROW-UNIQUE: the span table orders each shard's
    * stream by it, so duplicate ids would share a window rank and corrupt
    * the running sums. An epoch-replicated corpus
    * ([[Sources.mixSample]] emits one row per copy of a document) derives
    * an instance id first — e.g. `doc_id · maxCopies + copy_idx` —
    * and packs each epoch copy independently (PackingSpec pins the
    * composition: per-instance conservation, and a ×2-weighted source
    * packs exactly twice its single-epoch token mass).
    */
  def packSequences(docs: DataFrame, budget: Int,
      nShards: Int = 32): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .filter(col("n_tokens") > 0)
      // md5-derived 60-bit hash of the decimal doc_id, mod nShards: the
      // repo's engine-portable bucket convention (splitHash,
      // sample_stratified) — DuckDB computes the identical shard, so the
      // oracle twin reproduces the full layout, not just per-shard laws.
      .withColumn("shard",
        (conv(substring(md5(col("doc_id").cast(StringType)), 1, 15),
          16, 10).cast(LongType) % nShards).cast(IntegerType))
      .withColumn("tok_end", sum(col("n_tokens").cast(LongType)).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      // the doc covers token interval [tok_start, tok_end) of its shard's
      // stream → it overlaps sequences floor(start/B) .. floor((end-1)/B).
      // Integer `div`, not floor(x / B): double division loses exactness
      // past 2^53 and a 100 TB shard stream can hold >10^16 tokens.
      .withColumn("seq_id", explode(sequence(
        expr(s"tok_start div $budget"),
        expr(s"(tok_end - 1) div $budget"))))
      .withColumn("span_start",
        greatest(col("tok_start"), col("seq_id") * budget))
      .withColumn("span_end",
        least(col("tok_end"), (col("seq_id") + 1) * budget))
      .select(
        col("shard"),
        col("seq_id").cast(LongType).as("seq_id"),
        col("doc_id"),
        (col("span_start") - col("seq_id") * budget)
          .cast(IntegerType).as("seq_offset"),
        (col("span_start") - col("tok_start"))
          .cast(LongType).as("doc_offset"),
        (col("span_end") - col("span_start"))
          .cast(IntegerType).as("span_len"))
  }

  /** The corpus form: BPE-ish token counts from [[TextAnalysis.tokenCount]]
    * feed the packer — the composition a real pipeline runs (count once,
    * pack from the counts; the text itself never shuffles). With
    * `subword = true` the counts are the frozen-vocabulary SUBWORD counts
    * ([[TextAnalysis.tokenCountBpe]]'s `n_subword_tokens`) — the
    * production pairing, since a trainer's budget is subword tokens, not
    * pre-tokenizer pieces (PackingSpec pins the laws hold under both).
    */
  def packDocuments(spark: SparkSession, sfDir: String, budget: Int,
      nShards: Int = 32, subword: Boolean = false): DataFrame = {
    val counts =
      if (subword)
        TextAnalysis.tokenCountBpe(table(spark, sfDir, "documents"))
          .select(col("doc_id"), col("n_subword_tokens").as("n_tokens"))
      else
        TextAnalysis.tokenCount(table(spark, sfDir, "documents"))
          .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
    packSequences(counts, budget, nShards)
  }

  /** TRUE-tokenizer budget mode: counts from the frozen-BPE ENCODER
    * ([[TextAnalysis.tokenizeBpe]]'s `n_tokens` — an actual merge-table
    * walk, not the ⌈len/4⌉ approximation), so the packed sequences'
    * budgets are faithful to the id streams a trainer loads. Same span
    * arithmetic, same laws (PackingSpec pins conservation and the fixed
    * budget under this mode too); only the count column differs.
    */
  def packDocumentsTokenized(spark: SparkSession, sfDir: String, budget: Int,
      nShards: Int = 32): DataFrame =
    packSequences(
      TextAnalysis.tokenizeBpe(table(spark, sfDir, "documents"))
        .select(col("doc_id"), col("n_tokens")),
      budget, nShards)

  /** Graded budget/shard count: 1024-token sequences over 8 streams gives
    * every shard multiple full sequences plus a ragged tail at sf0.01 —
    * both laws (fixed budget, token conservation) are exercised.
    */
  private[graft] val GradedBudget = 1024
  private[graft] val GradedShards = 8

  /** `pack_sequences` query key: the corpus packed at the graded budget,
    * presentation-ordered by position (shard, seq_id, seq_offset).
    */
  def packSequencesQuery(spark: SparkSession, sfDir: String): DataFrame =
    packDocuments(spark, sfDir, GradedBudget, GradedShards)
      .orderBy(col("shard"), col("seq_id"), col("seq_offset"))

  /** Frozen salt for the graded epoch-0 global shuffle. */
  val ShuffleSalt = "graft-epoch-0"

  /** GLOBAL DETERMINISTIC SHUFFLE — the training-order primitive: every
    * epoch the corpus is visited in a reproducible pseudo-random order,
    * `ord = md5(salt:doc_id)` (change the salt, change the epoch). The
    * hard part at scale is assigning the global POSITION without a
    * global single-partition window: rows bucket by their first two ord
    * hex chars (256 ranges — md5 is uniform, so buckets balance), a
    * 256-row histogram prefix-sums into exclusive bucket offsets (the
    * only single-partition window, over 256 rows), offsets broadcast
    * back, and `pos = offset + rank-within-bucket − 1` — the classic
    * two-phase distributed ranking. The corpus-sized data sees one hash
    * shuffle (by bucket) and per-bucket local sorts; nothing
    * corpus-sized ever funnels through one partition (PlanSpec-pinned:
    * exactly one SinglePartition exchange, the 256-row histogram).
    */
  def shuffleDeterministicOn(docs: DataFrame, salt: String): DataFrame = {
    val keyed = docs.select(col("doc_id"))
      .withColumn("ord", md5(concat(lit(salt), lit(":"),
        col("doc_id").cast(StringType))))
      .withColumn("bucket", substring(col("ord"), 1, 2))
    val offsets = keyed.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(sum(col("n")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    keyed
      .join(broadcast(offsets.select(col("bucket"), col("offset"))),
        Seq("bucket"))
      .withColumn("pos", col("offset") +
        row_number().over(Window.partitionBy(col("bucket"))
          .orderBy(col("ord"), col("doc_id"))).cast(LongType) - 1)
      .select(col("pos"), col("doc_id"))
  }

  /** `shuffle_deterministic` checked key: the epoch-0 order of the
    * documents corpus. The twin is the direct global formulation — one
    * row_number over the whole corpus — so the hash match proves the
    * two-phase bucket ranking IS the global rank.
    */
  def shuffleDeterministic(spark: SparkSession, sfDir: String): DataFrame =
    shuffleDeterministicOn(table(spark, sfDir, "documents"), ShuffleSalt)
      .orderBy(col("pos"))

  /** Docs per training shard for the graded manifest. */
  val ManifestDocsPerShard = 100L

  /** TRAINING-SHARD MANIFEST — the data-loader contract artifact: the
    * epoch-0 deterministic order cut into fixed-size shards
    * (`shard_id = pos div docsPerShard`), one manifest row per shard
    * carrying the loader's integrity surface — doc count, position
    * range, whitespace-token total, and a CONTENT DIGEST (md5 of the
    * comma-joined doc_ids in position order), so a re-materialized
    * shard can be checked for both membership AND order without
    * re-reading payloads. This is what an `orderBy(pos)` +
    * `partitionBy(shard_id)` parquet sink would write alongside the
    * data; the graded surface is the manifest those files are checked
    * against.
    *
    * Scale shape: the position assignment is [[shuffleDeterministicOn]]
    * (two-phase bucket ranking — nothing corpus-sized funnels through
    * one partition); the token counts join back on doc_id (one hash
    * join of narrow rows — ids, positions, counts; text never moves);
    * the manifest aggregate is one shuffle keyed by shard_id whose
    * output is |corpus|/docsPerShard rows, and the in-row digest sort
    * is bounded by docsPerShard.
    */
  def shardManifestOn(docs: DataFrame, salt: String,
      docsPerShard: Long): DataFrame = {
    require(docsPerShard >= 1,
      s"docsPerShard must be >= 1, got $docsPerShard")
    val nt = docs.select(col("doc_id"),
      when(col("text").isNull, lit(0L))
        .otherwise(size(split(col("text"), " ")).cast(LongType))
        .as("nt"))
    shuffleDeterministicOn(docs, salt)
      .join(nt, Seq("doc_id"))
      .withColumn("shard_id", expr(s"pos div $docsPerShard"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"),
        sum(col("nt")).as("n_tokens"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("doc_id")))),
            x => x.getField("doc_id").cast(StringType)),
          ",")).as("shard_digest"))
  }

  /** `shard_manifest` checked key: the epoch-0 shard plan of the
    * documents corpus at [[ManifestDocsPerShard]] docs/shard. The twin
    * recomputes the global order directly and digests with
    * `string_agg(… ORDER BY pos)` — an independent proof that the
    * two-phase ranking, the shard cut, and the in-row digest ordering
    * all agree.
    */
  def shardManifest(spark: SparkSession, sfDir: String): DataFrame =
    shardManifestOn(table(spark, sfDir, "documents"), ShuffleSalt,
      ManifestDocsPerShard)
      .orderBy(col("shard_id"))

  /** TOKEN-ID GATHER — materialize what the span table only describes:
    * the per-(shard, seq_id) TOKEN-ID ARRAYS a trainer's data loader
    * actually reads. [[packSequences]]' spans (budgeted by the TRUE
    * frozen-BPE encoder's `n_tokens`, so the budget is faithful to the id
    * streams) join back to [[TextAnalysis.tokenizeBpe]]'s id sequences,
    * each document contributes its `[doc_offset, doc_offset + span_len)`
    * slice IN-ROW, and one (shard, seq_id) shuffle reunites each
    * sequence's pieces in `seq_offset` order (in-row struct sort — the
    * `shard_manifest` digest discipline; a sequence holds ≤ budget
    * tokens, so the collected list is bounded by construction).
    *
    * Scale shape: the ids frame ships ONCE through the doc_id hash join
    * (the unavoidable corpus-token-volume movement — at 100 TB both
    * sides are doc_id-bucketed and it is co-located); the slice runs
    * in-row so the (shard, seq_id) exchange carries only the tokens each
    * sequence actually keeps (≤ budget per output row). Output per
    * sequence: (shard, seq_id, n_spans, seq_len, token_ids) with ids
    * space-joined — hash-stable, and `seq_len` equal to the budget for
    * every sequence but each shard's last (the law PackingSpec pins).
    */
  def packGatherIdsOn(docs: DataFrame, budget: Int,
      nShards: Int): DataFrame = {
    val enc = TextAnalysis.tokenizeBpe(docs)
      .select(col("doc_id"), col("n_tokens"),
        split(col("token_ids"), " ").as("ids"))
    val spans = packSequences(
      enc.select(col("doc_id"), col("n_tokens")), budget, nShards)
    spans
      .join(enc.select(col("doc_id"), col("ids")), Seq("doc_id"))
      .select(col("shard"), col("seq_id"), col("seq_offset"),
        col("span_len"),
        slice(col("ids"), (col("doc_offset") + 1).cast(IntegerType),
          col("span_len")).as("piece"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_len").cast(LongType)).as("seq_len"),
        array_join(
          flatten(transform(
            array_sort(collect_list(struct(col("seq_offset"),
              col("piece")))),
            x => x.getField("piece"))),
          " ").as("token_ids"))
  }

  /** `pack_gather_ids` checked key: the documents corpus gathered at the
    * graded budget/shards. The DuckDB twin recomputes the id streams with
    * the generated BPE merge-walk SQL, re-derives the spans, slices with
    * 1-based list bounds and reassembles with `string_agg(… ORDER BY
    * seq_offset)` — hash equality proves the gathered sequences ARE the
    * tokenizer's output re-cut at sequence boundaries.
    */
  def packGatherIds(spark: SparkSession, sfDir: String): DataFrame =
    packGatherIdsOn(table(spark, sfDir, "documents"), GradedBudget,
      GradedShards)
      .orderBy(col("shard"), col("seq_id"))

  /** Per-epoch shuffle salts for the graded epoch-composition key. */
  val EpochSalts = Seq("graft-epoch-0", "graft-epoch-1")

  /** Max copies any source reaches under the graded `mix_sample` weights
    * (⌈2.5⌉) — the instance-id stride. `doc_id · MixMaxCopies + copy_idx`
    * is collision-free exactly because every copy_idx < MixMaxCopies
    * (PackingSpec pins the density law).
    */
  val MixMaxCopies = 3L

  /** EPOCH COMPOSITION — the training-order contract proven end-to-end:
    * [[Sources.mixSample]]'s fractional-epoch mixture (one row per
    * (document, copy)) composed with [[shuffleDeterministicOn]] under
    * PER-EPOCH salts. Each copy becomes a dense instance id
    * (`doc_id · MixMaxCopies + copy_idx` — the PackingSpec composition
    * contract), and each epoch orders ALL instances by
    * `md5(salt:instance_id)` through the two-phase bucket ranking. The
    * result is every epoch's full, reproducible visit order — distinct
    * across epochs (different salts), identical across re-runs/engines
    * (the hash oracle is the proof), with (doc_id, copy_idx) recovered
    * arithmetically from the instance id (no join back).
    *
    * Scale shape: the mixture is a zero-shuffle projection; each epoch's
    * ranking is the `shuffle_deterministic` two-phase shape (nothing
    * corpus-sized through one partition); the epochs union lazily — a
    * pipeline materializes one epoch at a time, the union here is the
    * graded two-epoch proof.
    */
  def epochOrderOn(docs: DataFrame): DataFrame = {
    val inst = mixtureInstances(docs).select(col("inst").as("doc_id"))
    EpochSalts.zipWithIndex.map { case (salt, e) =>
      shuffleDeterministicOn(inst, salt)
        .select(lit(e).as("epoch"), col("pos"),
          expr(s"doc_id div $MixMaxCopies").as("doc_id"),
          (col("doc_id") % MixMaxCopies).as("copy_idx"))
    }.reduce(_ unionAll _)
  }

  /** The graded mixture lifted to dense instance ids — ONE source for
    * `epoch_order` and `pack_gather_epoch`, so the two keys' mixture
    * draws cannot drift.
    */
  private[graft] def mixtureInstances(docs: DataFrame): DataFrame =
    Sources.mixSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25),
      defaultWeight = 0.5, salt = "mix_v1")
      .select((col("doc_id") * MixMaxCopies + col("copy_idx")).as("inst"))

  /** `epoch_order` checked key: two epochs of the mixture-replicated
    * documents corpus. The twin replants the identical mixture draw and
    * ranks each epoch with one direct global row_number — proving the
    * per-epoch orders are exactly the prescribed permutations.
    */
  def epochOrder(spark: SparkSession, sfDir: String): DataFrame =
    epochOrderOn(table(spark, sfDir, "documents"))
      .orderBy(col("epoch"), col("pos"))

  /** Sequences per training shard for the graded epoch gather, and the
    * number of contiguous position ranges the two-phase global token
    * cumsum buckets into (md5-uniform `pos` → balanced ranges; 256 keeps
    * the prefix window trivial while bounding each range at N/256 rows).
    */
  val EpochSeqsPerShard = 16L
  private val CumsumBuckets = 256L

  /** EPOCH-ORDER GATHER — the last composition of the training-data
    * assembly chain, the artifact a trainer's loader consumes for ONE
    * epoch: the mixture's instances ([[mixtureInstances]] — upweighted
    * documents appear `floor(w) + Bernoulli(frac)` times), visited in the
    * epoch's salted permutation ([[shuffleDeterministicOn]]), their
    * frozen-BPE id streams concatenated in that order and cut into
    * `budget`-token sequences, each materialized as its token-id array
    * and grouped into contiguous `seqsPerShard`-sequence shards (shards
    * are consecutive sequence files — the loader reads them in order).
    * `pack_gather_ids` proves the cut+gather against hash shards in
    * doc_id order; `epoch_order` proves the visit order; this key proves
    * mixture → order → pack → gather COMPOSED.
    *
    * Scale shape — the new piece is the GLOBAL running token sum in
    * epoch order without a corpus-sized single-partition window: `pos`
    * is already a dense global rank, so rows bucket into
    * [[CumsumBuckets]] contiguous pos ranges (`(pos · 256) div n_inst`
    * off a one-row count broadcast — the anomaly_zscore pattern), per-
    * bucket token totals prefix-sum in a 256-row window, offsets
    * broadcast back, and the within-bucket running sum completes the
    * global cumsum — the `shuffle_deterministic` two-phase discipline
    * applied to a SUM instead of a COUNT. After that the span arithmetic
    * is [[packSequences]]' (integer `div`, exact past 2⁵³), the ids
    * frame ships once per span through the src-doc hash join
    * (co-located under doc_id bucketing at scale), and the
    * (shard, seq_id) exchange carries ≤ budget tokens per output row.
    *
    * Instances whose document has no tokens (NULL text or an empty id
    * stream) occupy no token space and drop BEFORE ranking — the stream
    * order over survivors is the epoch permutation restricted to them
    * (md5 keys are per-instance, so filtering preserves relative order).
    *
    * Output per sequence: (shard, seq_id, n_spans, seq_len, token_ids),
    * `seq_id` global in epoch order, `seq_len` = budget everywhere but
    * the final sequence. Unordered.
    */
  def packGatherEpochOn(docs: DataFrame, salt: String, budget: Int,
      seqsPerShard: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(seqsPerShard >= 1,
      s"seqsPerShard must be >= 1, got $seqsPerShard")
    // enc and the ranked instance frame stay LAZY at harness scale:
    // enc's two consumers need different column sets (n_tokens-only vs
    // the id arrays), so persisting it forces the count path to
    // materialize the heavy ids too — measured SLOWER than the
    // duplicate column-pruned BPE pass; the narrow rank frame's persist
    // measured as noise. At 100 TB a real run materializes the
    // tokenized table and the epoch rank as TABLES between stages (the
    // corpus_pipeline macro-boundary discipline) rather than caching.
    val enc = TextAnalysis.tokenizeBpe(docs)
      .select(col("doc_id"), col("n_tokens").cast(LongType).as("n_tokens"),
        split(col("token_ids"), " ").as("ids"))
      .filter(col("n_tokens") > 0)
    val inst = mixtureInstances(docs)
      .withColumn("src_doc", expr(s"inst div $MixMaxCopies"))
      .join(enc.select(col("doc_id").as("src_doc"), col("n_tokens")),
        Seq("src_doc"))
    val ordered = shuffleDeterministicOn(
        inst.select(col("inst").as("doc_id")), salt)
      .select(col("pos"), col("doc_id").as("inst"))
    val instTok = ordered
      .join(inst.select(col("inst"), col("src_doc"), col("n_tokens")),
        Seq("inst"))
    val nTotal = instTok.agg(count(lit(1)).as("n_inst"))
    val bucketed = instTok.crossJoin(broadcast(nTotal))
      .withColumn("b", expr(s"(pos * $CumsumBuckets) div n_inst"))
    val offsets = bucketed.groupBy(col("b"))
      .agg(sum(col("n_tokens")).as("bt"))
      .withColumn("boff", coalesce(sum(col("bt")).over(
        Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val cum = bucketed
      .join(broadcast(offsets.select(col("b"), col("boff"))), Seq("b"))
      .withColumn("tok_end", col("boff") + sum(col("n_tokens")).over(
        Window.partitionBy(col("b")).orderBy(col("pos"))))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
    cum
      .withColumn("seq_id", explode(sequence(
        expr(s"tok_start div $budget"),
        expr(s"(tok_end - 1) div $budget"))))
      .withColumn("span_start",
        greatest(col("tok_start"), col("seq_id") * budget))
      .withColumn("span_end",
        least(col("tok_end"), (col("seq_id") + 1) * budget))
      .select(col("src_doc"),
        col("seq_id").cast(LongType).as("seq_id"),
        (col("span_start") - col("seq_id") * budget)
          .cast(IntegerType).as("seq_offset"),
        (col("span_start") - col("tok_start")).as("doc_offset"),
        (col("span_end") - col("span_start"))
          .cast(IntegerType).as("span_len"))
      .join(enc.select(col("doc_id").as("src_doc"), col("ids")),
        Seq("src_doc"))
      .select(expr(s"seq_id div $seqsPerShard").as("shard"), col("seq_id"),
        col("seq_offset"), col("span_len"),
        slice(col("ids"), (col("doc_offset") + 1).cast(IntegerType),
          col("span_len")).as("piece"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_len").cast(LongType)).as("seq_len"),
        array_join(
          flatten(transform(
            array_sort(collect_list(struct(col("seq_offset"),
              col("piece")))),
            x => x.getField("piece"))),
          " ").as("token_ids"))
  }

  /** `pack_gather_epoch` checked key: the mixture gathered for the
    * SECOND epoch's permutation ([[EpochSalts]](1) — proving the
    * non-default salt path end-to-end) at the graded budget,
    * [[EpochSeqsPerShard]] sequences per shard. The twin replants the
    * mixture, ranks with one direct global row_number, cumsums with one
    * global window, and slices the generated BPE id streams in the
    * epoch permutation — hash equality proves the composed chain.
    */
  def packGatherEpoch(spark: SparkSession, sfDir: String): DataFrame =
    packGatherEpochOn(table(spark, sfDir, "documents"), EpochSalts(1),
      GradedBudget, EpochSeqsPerShard)
      .orderBy(col("shard"), col("seq_id"))

  /** DuckDB twin of `packSequencesQuery`: same BPE-ish token count, same
    * md5 shard hash, running sum + integer floor-division span derivation.
    */
  val oracleSql: Map[String, String] = Map(
    // the generated BPE-walk twin nests as a derived table (its own WITH
    // chain), the spans re-derive exactly as in pack_sequences but from
    // the TRUE n_tokens, and the gather slices the id lists with DuckDB's
    // 1-based inclusive bounds
    "pack_gather_ids" -> {
      val bpe = graft.functions.BpeTokenizer.oracleSqlFor("documents")
      s"""WITH bpe AS (SELECT * FROM ($bpe) b),
         |tc AS (
         |  SELECT doc_id, n_tokens, string_split(token_ids, ' ') AS ids
         |  FROM bpe WHERE n_tokens > 0),
         |sh AS (
         |  SELECT doc_id, n_tokens, ids,
         |    CAST(CAST(concat('0x',
         |      substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |      % $GradedShards AS INTEGER) AS shard
         |  FROM tc),
         |cum AS (
         |  SELECT shard, doc_id, n_tokens, ids,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
         |      AS BIGINT) AS tok_end
         |  FROM sh),
         |spans AS (
         |  SELECT shard, doc_id, ids, tok_end,
         |    tok_end - n_tokens AS tok_start,
         |    unnest(range((tok_end - n_tokens) // $GradedBudget,
         |                 (tok_end - 1) // $GradedBudget + 1)) AS seq_id
         |  FROM cum),
         |pieces AS (
         |  SELECT shard, seq_id,
         |    CAST(greatest(tok_start, seq_id * $GradedBudget)
         |      - seq_id * $GradedBudget AS INTEGER) AS seq_offset,
         |    least(tok_end, (seq_id + 1) * $GradedBudget)
         |      - greatest(tok_start, seq_id * $GradedBudget) AS span_len,
         |    array_to_string(ids[
         |      (greatest(tok_start, seq_id * $GradedBudget) - tok_start + 1)
         |      : (greatest(tok_start, seq_id * $GradedBudget) - tok_start
         |         + least(tok_end, (seq_id + 1) * $GradedBudget)
         |         - greatest(tok_start, seq_id * $GradedBudget))], ' ')
         |      AS piece
         |  FROM spans)
         |SELECT shard, seq_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(span_len) AS BIGINT) AS seq_len,
         |  string_agg(piece, ' ' ORDER BY seq_offset) AS token_ids
         |FROM pieces GROUP BY shard, seq_id
         |ORDER BY shard, seq_id""".stripMargin
    },
    // mixture replant + direct global row_number for the epoch rank +
    // ONE global window cumsum (the orthogonal formulation of the
    // two-phase bucketed sum) + the pack_gather_ids slice/reassembly
    "pack_gather_epoch" -> {
      val bpe = graft.functions.BpeTokenizer.oracleSqlFor("documents")
      val salt = EpochSalts(1)
      s"""WITH bpe AS (SELECT * FROM ($bpe) b),
         |tc AS (
         |  SELECT doc_id, n_tokens, string_split(token_ids, ' ') AS ids
         |  FROM bpe WHERE n_tokens > 0),
         |w AS (
         |  SELECT doc_id, source,
         |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
         |                WHEN 'src2' THEN 0.25 ELSE 0.5 END AS w,
         |    CAST(CAST(concat('0x', substring(md5(
         |        CAST(doc_id AS VARCHAR) || ':mix_v1'), 1, 15)) AS BIGINT)
         |      AS DOUBLE) / 1152921504606846976 AS u
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(FLOOR(w) + CASE WHEN u < w - FLOOR(w) THEN 1 ELSE 0 END
         |      AS BIGINT) AS n
         |  FROM w),
         |m AS (
         |  SELECT doc_id, doc_id * $MixMaxCopies + j AS inst
         |  FROM c, unnest(range(0, n)) AS t(j)
         |  WHERE n > 0),
         |mi AS (
         |  SELECT m.inst, m.doc_id, tc.n_tokens
         |  FROM m JOIN tc ON tc.doc_id = m.doc_id),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(row_number() OVER (
         |      ORDER BY md5('$salt:' || CAST(inst AS VARCHAR)), inst) - 1
         |      AS BIGINT) AS pos
         |  FROM mi),
         |cum AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(SUM(n_tokens) OVER (ORDER BY pos) AS BIGINT) AS tok_end
         |  FROM o),
         |spans AS (
         |  SELECT doc_id, tok_end, tok_end - n_tokens AS tok_start,
         |    unnest(range((tok_end - n_tokens) // $GradedBudget,
         |                 (tok_end - 1) // $GradedBudget + 1)) AS seq_id
         |  FROM cum),
         |pieces AS (
         |  SELECT seq_id // $EpochSeqsPerShard AS shard, seq_id,
         |    CAST(greatest(tok_start, seq_id * $GradedBudget)
         |      - seq_id * $GradedBudget AS INTEGER) AS seq_offset,
         |    least(tok_end, (seq_id + 1) * $GradedBudget)
         |      - greatest(tok_start, seq_id * $GradedBudget) AS span_len,
         |    array_to_string(tc.ids[
         |      (greatest(tok_start, seq_id * $GradedBudget) - tok_start + 1)
         |      : (greatest(tok_start, seq_id * $GradedBudget) - tok_start
         |         + least(tok_end, (seq_id + 1) * $GradedBudget)
         |         - greatest(tok_start, seq_id * $GradedBudget))], ' ')
         |      AS piece
         |  FROM spans JOIN tc USING (doc_id))
         |SELECT shard, seq_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(span_len) AS BIGINT) AS seq_len,
         |  string_agg(piece, ' ' ORDER BY seq_offset) AS token_ids
         |FROM pieces GROUP BY shard, seq_id
         |ORDER BY shard, seq_id""".stripMargin
    },
    // identical mixture replant (the mix_sample twin's draw), dense
    // instance ids, one direct global row_number per epoch salt
    "epoch_order" -> {
      val epochs = EpochSalts.zipWithIndex.map { case (salt, e) =>
        s"""SELECT $e AS epoch,
           |  CAST(row_number() OVER (
           |    ORDER BY md5('$salt:' || CAST(inst AS VARCHAR)), inst) - 1
           |    AS BIGINT) AS pos,
           |  doc_id, copy_idx
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH w AS (
         |  SELECT doc_id, source,
         |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
         |                WHEN 'src2' THEN 0.25 ELSE 0.5 END AS w,
         |    CAST(CAST(concat('0x', substring(md5(
         |        CAST(doc_id AS VARCHAR) || ':mix_v1'), 1, 15)) AS BIGINT)
         |      AS DOUBLE) / 1152921504606846976 AS u
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(FLOOR(w) + CASE WHEN u < w - FLOOR(w) THEN 1 ELSE 0 END
         |      AS BIGINT) AS n
         |  FROM w),
         |m AS (
         |  SELECT doc_id, CAST(j AS BIGINT) AS copy_idx,
         |    doc_id * $MixMaxCopies + j AS inst
         |  FROM c, unnest(range(0, n)) AS t(j)
         |  WHERE n > 0)
         |SELECT epoch, pos, doc_id, copy_idx FROM (
         |$epochs)
         |ORDER BY epoch, pos""".stripMargin
    },
    "shard_manifest" ->
      s"""WITH o AS (
         |  SELECT
         |    CAST(row_number() OVER (
         |      ORDER BY md5('$ShuffleSalt:' || CAST(doc_id AS VARCHAR)),
         |        doc_id) - 1 AS BIGINT) AS pos,
         |    doc_id,
         |    CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT)
         |      AS nt
         |  FROM documents)
         |SELECT pos // $ManifestDocsPerShard AS shard_id,
         |  count(*) AS n_docs,
         |  min(pos) AS first_pos,
         |  max(pos) AS last_pos,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY pos))
         |    AS shard_digest
         |FROM o GROUP BY 1 ORDER BY shard_id""".stripMargin,
    "shuffle_deterministic" ->
      s"""SELECT
         |  CAST(row_number() OVER (
         |    ORDER BY md5('$ShuffleSalt:' || CAST(doc_id AS VARCHAR)),
         |      doc_id) - 1 AS BIGINT) AS pos,
         |  doc_id
         |FROM documents ORDER BY pos""".stripMargin,
    "pack_sequences" ->
      s"""WITH tc AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % $GradedShards AS INTEGER) AS shard
        |  FROM tc WHERE n_tokens > 0),
        |cum AS (
        |  SELECT shard, doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
        |      AS BIGINT) AS tok_end
        |  FROM sh),
        |spans AS (
        |  SELECT shard, doc_id, tok_end, tok_end - n_tokens AS tok_start,
        |    unnest(range((tok_end - n_tokens) // $GradedBudget,
        |                 (tok_end - 1) // $GradedBudget + 1)) AS seq_id
        |  FROM cum)
        |SELECT shard, seq_id, doc_id,
        |  CAST(greatest(tok_start, seq_id * $GradedBudget)
        |    - seq_id * $GradedBudget AS INTEGER) AS seq_offset,
        |  greatest(tok_start, seq_id * $GradedBudget) - tok_start AS doc_offset,
        |  CAST(least(tok_end, (seq_id + 1) * $GradedBudget)
        |    - greatest(tok_start, seq_id * $GradedBudget) AS INTEGER) AS span_len
        |FROM spans ORDER BY shard, seq_id, seq_offset""".stripMargin
  )
}
