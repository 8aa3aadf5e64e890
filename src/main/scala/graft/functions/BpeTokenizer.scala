package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Frozen byte-pair-encoding tokenizer — a REAL merge-table encoder (the
  * Sennrich et al. 2016 algorithm, the GPT-2 reference implementation's
  * shape) with a small FROZEN merge list, emitting token IDS, not just
  * counts. This is the step `token_count_bpe`'s closed-form ⌈len/4⌉
  * fallback approximates: here out-of-vocabulary cost emerges from the
  * merge walk itself, so `pack_sequences` budgets driven by these counts
  * are faithful to an actual tokenizer's output.
  *
  * Algorithm, per pre-tokenizer piece (lowercased; the same
  * letter-run/digit-run/symbol-run regex as [[TextAnalysis]]'s family):
  * start from single characters and apply each merge rule `(a, b) → ab`
  * in rank order with one left-to-right scan (leftmost-first,
  * non-overlapping). One scan per rule is EXACT exhaustive application:
  * merging (a,b) can only create adjacencies (x, ab) / (ab, y), never a
  * new (a, b) — `ab` differs from both operands by length. Sequential
  * rank-order application equals the iterative lowest-rank-present
  * algorithm because the table respects the BPE training invariant
  * (every rule's operands are base symbols or outputs of STRICTLY
  * earlier rules — a pair over a later output cannot be learned before
  * that output exists; asserted in the suite), so a rule that has been
  * passed can never become newly applicable.
  *
  * IDs: index into the frozen [[BpeTokenizer.Vocab]] — `<unk>` at 0 for
  * any residual symbol outside the base alphabet, base symbols (a–z,
  * 0–9), then one entry per merge output in rank order. The whole model
  * — merges + vocab — is data-independent source-frozen configuration
  * (the [[TextAnalysis.SubwordVocab]] discipline), and the DuckDB twin
  * is GENERATED from the same Scala constants, so the two engines cannot
  * drift.
  *
  * Scale shape: a scan-stage projection (this expression participates in
  * whole-stage codegen via the compiled-reference pattern the file's
  * other expressions use) — zero shuffle, zero state, linear in
  * characters × merge rules per document.
  */
case class BpeEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("token_ids", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires string, got ${other.simpleString}")
    }

  def encode(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    import BpeTokenizer._
    val m = PreToken.matcher(
      text.toString.toLowerCase(java.util.Locale.ROOT))
    var nPieces = 0L
    var nUnk = 0L
    val ids = new scala.collection.mutable.ArrayBuffer[Int]()
    while (m.find()) {
      nPieces += 1
      var syms: Array[String] = m.group().map(_.toString).toArray
      var r = 0
      while (r < Merges.length) {
        val (a, b) = Merges(r)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var pend: String = null
        var i = 0
        while (i < syms.length) {
          val s = syms(i)
          if (pend == a && s == b) { out += a + b; pend = null }
          else { if (pend != null) out += pend; pend = s }
          i += 1
        }
        if (pend != null) out += pend
        syms = out.toArray
        r += 1
      }
      var i = 0
      while (i < syms.length) {
        val id = VocabIndex.getOrElse(syms(i), 0)
        if (id == 0) nUnk += 1
        ids += id
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nPieces, ids.length.toLong, nUnk,
        UTF8String.fromString(ids.mkString(" "))))
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode = copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeTokenizer {

  import org.apache.spark.sql.graftbridge.Bridge

  /** Pre-tokenizer (the family regex over lowercased text), compiled
    * once per JVM.
    */
  private[functions] val PreToken = java.util.regex.Pattern.compile(
    "\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+")

  /** Base alphabet: single characters with their own vocabulary ids.
    * Anything else (accented letters, CJK, emoji…) survives the merge
    * walk as single characters and maps to `<unk>` — the fallback-share
    * signal a curation pipeline watches, as in `token_count_bpe`.
    */
  val BaseSymbols: IndexedSeq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(_.toString)

  /** The frozen merge table, in rank order. Respects the BPE training
    * invariant (suite-asserted): each rule's operands are base symbols
    * or outputs of strictly earlier rules. The rules build up the
    * corpus' highest-frequency words ("the table value scan fast row
    * part data" — the classic common-word-cheap economics) through their
    * intermediate pairs, exactly how a learned table's prefix looks.
    */
  val Merges: IndexedSeq[(String, String)] = IndexedSeq(
    ("t", "h"), ("th", "e"),                       // the
    ("a", "b"), ("t", "ab"), ("l", "e"), ("tab", "le"), // table
    ("v", "a"), ("va", "l"), ("u", "e"), ("val", "ue"), // value
    ("s", "c"), ("sc", "a"), ("sca", "n"),         // scan
    ("f", "a"), ("fa", "s"), ("fas", "t"),         // fast
    ("r", "o"), ("ro", "w"),                       // row
    ("p", "a"), ("pa", "r"), ("par", "t"),         // part
    ("i", "n"), ("e", "r"), ("o", "r"),            // in / er / or
    ("d", "a"), ("da", "t"), ("dat", "a"))         // data

  /** id → symbol. `<unk>` = 0, base alphabet, then merge outputs in rank
    * order. Merge outputs are pairwise distinct and disjoint from the
    * base alphabet by construction (suite-asserted), so ids are unique.
    */
  val Vocab: IndexedSeq[String] =
    "<unk>" +: (BaseSymbols ++ Merges.map { case (a, b) => a + b })

  private[functions] val VocabIndex: Map[String, Int] =
    Vocab.zipWithIndex.toMap

  /** Encode a text column under the frozen model: struct(n_pieces,
    * n_tokens, n_unk, token_ids) with ids space-joined in document
    * order.
    */
  def bpeEncode(text: Column): Column =
    Bridge.column(BpeEncode(Bridge.expression(text)))

  /** DuckDB recompute of the whole encoder, GENERATED from the same
    * frozen constants: char split, one CTE stage per merge rule,
    * vocabulary lookup by `list_position` against the interpolated vocab
    * literal. `tbl` must expose (doc_id, text).
    *
    * Each stage applies its rule with an INDEPENDENT formulation (no
    * fold): because every frozen rule has left ≠ right (suite-asserted),
    * one left-to-right scan can never chain consumptions — a symbol
    * consumed as a pair's right part (it equals `b`) could only start a
    * pair itself if it also equaled `a` — so the scan is equivalent to a
    * simultaneous per-position replacement: position i is dropped when
    * (s[i−1], s[i]) = (a, b), emits the merged symbol when (s[i],
    * s[i+1]) = (a, b), and passes through otherwise. That is a pure
    * `flatten(list_transform(range …))`, which also sidesteps a DuckDB
    * 1.0 `list_reduce` defect with list-valued struct accumulators
    * (earlier list contents are lost across iterations). Equivalence to
    * the Spark side's scan is additionally property-tested on arbitrary
    * symbol strings.
    */
  def oracleSqlFor(tbl: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val stages = Merges.zipWithIndex.map { case ((a, b), r) =>
      s"""t${r + 1} AS (
         |  SELECT doc_id, pi, flatten(list_transform(range(1, len(cs) + 1),
         |    i -> CASE
         |      WHEN i > 1 AND cs[i-1] = ${q(a)} AND cs[i] = ${q(b)}
         |        THEN CAST([] AS VARCHAR[])
         |      WHEN cs[i] = ${q(a)} AND i < len(cs) AND cs[i+1] = ${q(b)}
         |        THEN [${q(a + b)}]
         |      ELSE [cs[i]] END)) AS cs
         |  FROM t$r)""".stripMargin
    }.mkString(",\n")
    val fin = "cs"
    val vocabLit = Vocab.map(q).mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT doc_id, regexp_extract_all(lower(text),
       |    '\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+') AS pieces
       |  FROM $tbl WHERE text IS NOT NULL),
       |pc AS (
       |  SELECT doc_id, CAST(len(pieces) AS BIGINT) AS n_pieces FROM d),
       |t0 AS (
       |  SELECT doc_id, i AS pi,
       |    list_transform(range(1, length(pieces[i]) + 1),
       |      j -> substr(pieces[i], j, 1)) AS cs
       |  FROM d, UNNEST(range(1, len(pieces) + 1)) AS u(i)),
       |$stages,
       |ids AS (
       |  SELECT doc_id, pi,
       |    list_transform($fin, s ->
       |      CAST(coalesce(list_position($vocabLit, s), 1) - 1 AS BIGINT))
       |      AS id_list
       |  FROM t${Merges.length}),
       |agg AS (
       |  SELECT doc_id,
       |    CAST(sum(len(id_list)) AS BIGINT) AS n_tokens,
       |    CAST(sum(len(list_filter(id_list, x -> x = 0))) AS BIGINT)
       |      AS n_unk,
       |    string_agg(array_to_string(id_list, ' '), ' ' ORDER BY pi)
       |      AS token_ids
       |  FROM ids GROUP BY doc_id)
       |SELECT pc.doc_id, pc.n_pieces,
       |  coalesce(agg.n_tokens, 0) AS n_tokens,
       |  coalesce(agg.n_unk, 0) AS n_unk,
       |  coalesce(agg.token_ids, '') AS token_ids
       |FROM pc LEFT JOIN agg USING (doc_id)
       |ORDER BY pc.doc_id""".stripMargin
  }
}
