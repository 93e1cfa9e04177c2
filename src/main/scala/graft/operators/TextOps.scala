package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything is a composition of codegen'd built-in expressions — a pure
  * narrow map over the documents table, so at 100 TB it runs embarrassingly
  * parallel at scan speed with zero shuffles.
  */
object TextOps {

  /** Whitespace token count — fused single-pass native expression
    * ([[graft.functions.TokenCountWs]]; the composed regex-split form
    * below is its differential oracle). */
  def tokenCount(text: Column): Column =
    graft.functions.TokenCountWs.tokenCountWs(text)

  /** The pure-built-in composition tokenCount replaces: a per-row regex
    * split materializing the token array just to take its size. Kept as
    * the fused form's differential oracle and as the expression the
    * DuckDB oracles mirror textually. */
  def tokenCountComposed(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token estimate: word pieces + digits + punctuation as
    * separate tokens (a cheap stand-in for a real BPE vocab; determinstic
    * and identical in the oracle SQL). Fused single-pass counter
    * ([[graft.functions.BpeishCount]]); [[bpeishTokenCountComposed]] is
    * its regex twin and differential oracle. */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    graft.functions.TextCounts.bpeishCount(text)
  def bpeishTokenCountComposed(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Normalized text: lowercase, collapsed whitespace — the canonical form
    * for fingerprinting and exact dedup. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content-defined fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalize(text).cast(BinaryType))

  /** Polynomial rolling hash over the word stream (base-31 Horner form,
    * mod 2^31-1 so ANSI-mode long arithmetic can't overflow) —
    * order-sensitive unlike a bag-of-words hash. Pure expression. */
  val RollingHashPrime = 2147483647L
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(normalize(text), " "), w => pmod(xxhash64(w), lit(RollingHashPrime))),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, lit(RollingHashPrime)))

  /** Punctuation ratio, alpha ratio, stopword ratio, mean word length —
    * the classic cheap quality signals. The match counters are fused
    * single-pass expressions (graft.functions.TextCounts — each replaces
    * a `size(regexp_extract_all(…))` that materialized every match just
    * to count it); the `*Composed` twins are kept as their differential
    * oracles and as the forms the DuckDB oracle SQL mirrors textually. */
  def punctRatio(text: Column): Column =
    graft.functions.TextCounts.punctCount(text).cast(DoubleType) /
      greatest(length(text).cast(DoubleType), lit(1.0))
  def punctRatioComposed(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast(DoubleType) /
      greatest(length(text).cast(DoubleType), lit(1.0))

  val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  def stopwordRatioFor(text: Column, words: Seq[String]): Column =
    graft.functions.TextCounts.stopwordCount(lower(text), words).cast(DoubleType) /
      greatest(tokenCount(text).cast(DoubleType), lit(1.0))
  def stopwordRatioForComposed(text: Column, words: Seq[String]): Column = {
    val pat = "\\b(" + words.mkString("|") + ")\\b"
    size(regexp_extract_all(lower(text), lit(pat), lit(0))).cast(DoubleType) /
      greatest(tokenCount(text).cast(DoubleType), lit(1.0))
  }
  def stopwordRatio(text: Column): Column = stopwordRatioFor(text, Stopwords)

  def meanWordLen(text: Column): Column =
    length(regexp_replace(normalize(text), " ", "")).cast(DoubleType) /
      greatest(tokenCount(text).cast(DoubleType), lit(1.0))

  /** Composite quality score in [0,1]: length sweet-spot + punctuation
    * sanity + stopword presence. Deliberately simple and fully
    * SQL-expressible so the oracle can recompute it. The stopword list
    * is a parameter — real pipelines score per language. */
  def qualityScoreFor(text: Column, words: Seq[String]): Column = {
    val lenScore  = least(length(text).cast(DoubleType) / lit(500.0), lit(1.0))
    val punctPen  = greatest(lit(0.0), lit(1.0) - punctRatio(text) * lit(5.0))
    val stopScore = least(stopwordRatioFor(text, words) * lit(5.0), lit(1.0))
    round((lenScore + punctPen + stopScore) / lit(3.0), 4)
  }
  def qualityScore(text: Column): Column = qualityScoreFor(text, Stopwords)

  /** Language-aware quality: score each document against ITS language's
    * function-word profile (the [[LangProfiles]] t03 uses) — an English
    * stopword list scores every non-English document as low-quality,
    * which is exactly the mistake corpus-wide filters make. One when-fold
    * per profile; still a pure narrow map. */
  def qualityScoreByLang(text: Column, lang: Column): Column =
    LangProfiles.tail.foldLeft(
      when(lang === LangProfiles.head._1,
        qualityScoreFor(text, LangProfiles.head._2))) {
      case (acc, (l, ws)) => acc.when(lang === l, qualityScoreFor(text, ws))
    }.otherwise(qualityScoreFor(text, Stopwords))

  /** Language-ID: n-gram/stopword profile scoring. Each language has a
    * profile of high-frequency function words; score = count of profile
    * hits per token; argmax wins (ties broken by profile order). The
    * profiles are deliberately tiny — the point is the distributed scoring
    * shape (narrow map, no shuffle), not linguistic accuracy. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  def langScores(text: Column): Seq[(String, Column)] =
    LangProfiles.map { case (lang, words) =>
      val pat = "\\b(" + words.mkString("|") + ")\\b"
      lang -> size(regexp_extract_all(lower(text), lit(pat), lit(0)))
    }

  /** Fused native single-pass scorer (see graft.functions.LangIdExpr —
    * the expression-fold form re-evaluates every profile's regex count in
    * each argmax branch). `langScores` above stays as the composable
    * per-profile building block. */
  def langId(text: Column): Column = graft.functions.LangIdExpr.langId(text)

  // ---- TF-IDF keyword extraction ----------------------------------------

  /** Per-doc top-k terms by TF-IDF (idf = ln(N/df)).
    *
    * Distributed shape: the per-(doc, term) counts come out of the fused
    * single-pass [[graft.functions.TermCounts]] expression — the tf frame
    * is a NARROW explode of pre-counted entries (one row per distinct
    * term per doc, not per token), so the old groupBy(doc, term) shuffle
    * and the persist that amortized it are gone. The remaining shuffles
    * are the genuinely corpus-global ones: document frequency and the
    * per-doc top-k window. The corpus size joins in as a broadcast 1-row
    * frame (never a driver-side `count()` baked into a literal). The df
    * side is the piece to persist at 100 TB — it's corpus-global and
    * reused by every downstream query. tf's two consumers each re-run
    * the narrow pass; that's one extra text walk, cheaper than a
    * persisted materialization of the whole tf frame (the r11 measured
    * ~2 s persist-overhead rule).
    *
    * The tf join leg and the df aggregation evaluate the input lineage
    * independently, so a non-deterministic `docs` (a fresh `rand()`
    * sample) could yield a df computed over a different row set than
    * the tf rows it idf-weights — enforced fail-fast by
    * [[InputContracts.requireDeterministic]] (persist such a frame
    * first); plain scans/filters (every in-tree caller) pass. */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, topK: Int): org.apache.spark.sql.DataFrame = {
    InputContracts.requireDeterministic(docs, "tfidfTopTerms")
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.TermCounts.termCounts(col(textCol))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.cnt").as("tf"))
    // tf IS the distinct (doc, term) set with counts attached, so the
    // document frequency derives from it directly
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast(DoubleType) / col("df")), 4))
      .withColumn("rnk", row_number().over(w).cast(IntegerType))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rnk"))
  }

  // ---- repetition / quality signals (Gopher-style) -----------------------

  /** Per-doc repetition signals — the Gopher/C4-style quality-filter
    * inputs that need corpus-free per-doc term statistics:
    *
    *  - `n_words`       total tokens
    *  - `mean_word_len` mean token length
    *  - `top_word_frac` fraction of tokens that are the single most
    *                    frequent token (high ⇒ degenerate repetition)
    *  - `dup_bigram_frac` fraction of bigrams that are repeats of an
    *                    earlier bigram (high ⇒ looping text)
    *
    * Distributed shape: ONE narrow pass — a fused codegen'd expression
    * ([[graft.functions.RepetitionStats]]) computes all five counters
    * per doc inside the scan stage, and only the final ratio arithmetic
    * runs as columns. Zero shuffles, zero persisted intermediates: the
    * exploded token stream (the largest intermediate in the whole text
    * block at 100 TB — the previous shape shuffled per-(doc,term) and
    * per-(doc,bigram) counts and joined them back) never exists as rows.
    * All re-aggregated state was per-document, so it fits in the
    * expression's per-row hash map by construction. Measured at sf1
    * (defended, median-of-3, full-materialization timing): 15–23 s →
    * 1.9–2.7 s. Tokenizer contract is unchanged and shared with the oracle
    * SQL; the ratio/rounding columns are the same `round`/`cast` calls
    * as the old derivation, so results are bit-identical (sf1
    * set-compare: 50,000/50,000 rows). */
  def repetitionSignals(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    // explode of the 0-or-1-element stats array: drops tokenless docs
    // (exactly like the old explode-based pipeline) and evaluates the
    // fused pass ONCE per row inside GenerateExec — a filter(n_words>0)
    // would be pushed below the project and re-run the pass per row
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.RepetitionStats.repetitionStats(col(textCol))).as("__rs"))
      .select(col("doc_id"),
        col("__rs.n_words").as("n_words"),
        round(col("__rs.sum_len").cast(DoubleType) / col("__rs.n_words"), 4)
          .as("mean_word_len"),
        round(col("__rs.top_cnt").cast(DoubleType) / col("__rs.n_words"), 4)
          .as("top_word_frac"),
        when(col("__rs.n_bigrams") > 0,
          round(col("__rs.dup_bigrams").cast(DoubleType) / col("__rs.n_bigrams"), 4))
          .otherwise(0.0).as("dup_bigram_frac"))
  }

  // ---- corpus vocabulary ---------------------------------------------------

  /** Corpus vocabulary table: every term with its global count, frequency
    * rank, and cumulative corpus-coverage fraction — the Zipf table that
    * feeds tokenizer/BPE vocab selection and stopword discovery.
    *
    * Distributed shape: the fused [[graft.functions.TermCounts]] pass
    * pre-counts each doc's terms inside the scan stage, so the ONE
    * partial+final aggregation keyed by term starts from one row per
    * distinct term per doc (not per token; map-side combine then
    * collapses each partition to its local vocabulary before the
    * shuffle — the only full-corpus pass). The global top-K is then
    * taken with an ordered limit
    * (`TakeOrderedAndProject`: per-partition top-K heaps, driver merge —
    * never a full sort), and ONLY those ≤ topK survivors see the
    * rank/cumulative-sum window. The top-K rows by `(cnt desc, term)` are
    * by construction a prefix of the global ordering, so rnk/cum computed
    * within them are identical to ranking the whole vocabulary first —
    * but the unpartitioned window now touches a constant-bounded row set
    * instead of the corpus's multi-billion-term distinct vocabulary. The
    * corpus token total joins in as a broadcast 1-row frame, never a
    * driver-side literal. Tokenizer shared with
    * [[tfidfTopTerms]]/[[repetitionSignals]] so oracles recompute it
    * identically. */
  def vocabulary(docs: org.apache.spark.sql.DataFrame, textCol: String,
      topK: Int): org.apache.spark.sql.DataFrame = {
    val counts = docs.select(
        explode(graft.functions.TermCounts.termCounts(col(textCol))).as("tc"))
      .groupBy(col("tc.term").as("term")).agg(sum(col("tc.cnt")).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val top = counts.orderBy(col("cnt").desc, col("term")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term"))
    top
      .withColumn("rnk", row_number().over(w).cast(IntegerType))
      .withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(total))
      .select(col("rnk"), col("term"), col("cnt"),
        round(col("cum").cast(DoubleType) / col("total"), 4).as("cum_frac"))
  }

  // ---- sequence packing ---------------------------------------------------

  /** Concat-and-chunk sequence packing — the bookkeeping behind packed
    * pretraining batches: documents are laid head-to-tail into `streams`
    * independent token streams (deterministic `id % streams` routing, id
    * order within a stream), and each stream is cut into fixed
    * `capacity`-token chunks. Emits one row per document with its stream,
    * absolute token offset, and the first/last chunk its tokens land in
    * (`chunk_first != chunk_last` ⇔ the doc straddles a boundary) — all a
    * trainer needs to build attention-reset masks per chunk.
    *
    * Distributed shape: ONE window (cumulative token sum) partitioned by
    * stream — never a global single-partition ordering; `streams` is the
    * parallelism knob and each stream's window is an O(n) running sum.
    * Fully expression-based, so the DuckDB oracle recomputes it
    * independently (t10). Zero-token docs occupy no tokens: they attach
    * to `chunk_first` with `chunk_last = chunk_first`. */
  def packByBudget(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, capacity: Long, streams: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stream")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(col(idCol),
        tokenCount(col(textCol)).cast(LongType).as("n_tok"),
        pmod(col(idCol), lit(streams.toLong)).cast(IntegerType).as("stream"))
      .withColumn("tok_start", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("chunk_first", floor(col("tok_start") / lit(capacity.toDouble)).cast(LongType))
      .withColumn("chunk_last",
        when(col("n_tok") === 0, floor(col("tok_start") / lit(capacity.toDouble)))
          .otherwise(floor((col("tok_start") + col("n_tok") - 1) / lit(capacity.toDouble)))
          .cast(LongType))
  }

  // ---- PII redaction ------------------------------------------------------

  /** Patterns kept RE2-compatible (no backrefs/lookaround) so the same
    * strings run under Java regex (Spark) and RE2 (DuckDB oracle). */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "\\+[0-9][0-9\\-]{7,}[0-9]"

  /** Redact emails then phone numbers — a pure narrow map (two codegen'd
    * regex passes), the training-data scrub step at scan speed. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(emailPattern), lit("<EMAIL>")),
      lit(phonePattern), lit("<PHONE>"))

  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phonePattern))
}
