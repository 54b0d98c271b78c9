package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, keyword-vote language ID, shingling,
  * and MinHash fingerprints. All pure column expressions (codegen'd,
  * no UDFs) so they run at full scan speed over a 100 TB corpus and
  * push column pruning into the parquet reader.
  *
  * Determinism note: fingerprints use md5 (identical across engines)
  * rather than xxhash64 so results are oracle-checkable; use
  * [[simhash64]] (xxhash64-based) where raw speed matters more than
  * cross-engine parity.
  */
object TextOps {

  /** Whitespace tokenization of lower-cased trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: alternating letter/digit runs — a cheap
    * stand-in for a real tokenizer's token count (regex split keeps
    * punctuation as boundaries). */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0))

  /** Ratio of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Ratio of punctuation characters [.,!?;:] to total characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
      .cast("double") / greatest(length(text), lit(1))

  /** Simple document quality score in [0,1]: rewards moderate token
    * length and penalizes punctuation/stopword extremes. Deterministic,
    * SQL-expressible. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    round(qualityScoreRaw(text, stopwords), 6)

  /** [[qualityScore]] before its 6dp rounding — for callers that pin
    * the value in a representation-proof integer form instead. */
  def qualityScoreRaw(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokenCount(text)
    val meanLen = length(text).cast("double") / greatest(toks, lit(1))
    val lenScore = least(meanLen / 8.0, lit(1.0))
    val stopScore = lit(1.0) - stopwordRatio(text, stopwords)
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    (lenScore + stopScore + punctScore) / 3.0
  }

  /** Keyword-vote language ID: each language gets a marker-word list;
    * winner is the language with the most marker hits (ties broken by
    * list order). Returns the language key, or `default` when no
    * marker hits at all. */
  def langId(text: Column, markers: Seq[(String, Seq[String])],
             default: String = "und"): Column = {
    val toks = tokens(text)
    // One struct(score, lang) per language, all inside ONE array
    // constructor, then a single fold keeps the first strict maximum
    // (ties: first-listed language wins; nothing beats the 0-score
    // `default` seed unless some score is positive — same semantics as
    // a greatest()+CASE chain). Why this shape: a CASE chain references
    // `greatest(s1..sn)` in every branch, and after projection
    // collapse every reference re-evaluates the tokenizer+filter
    // pipeline — measured ~15 evaluations per row for 3 languages.
    // Here each score is computed once inside the array literal and the
    // fold references only lambda variables.
    val scored = array(markers.map { case (lang, words) =>
      struct(
        size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
          .as("s"),
        lit(lang).as("lang"))
    }: _*)
    aggregate(scored,
      struct(lit(0).as("s"), lit(default).as("lang")),
      (acc, x) => when(x.getField("s") > acc.getField("s"), x)
        .otherwise(acc),
      acc => acc.getField("lang"))
  }

  /** Word n-gram shingles: ["a b c", "b c d", ...]; empty array when
    * fewer than n tokens.
    *
    * Performance: if the token array is not already a materialized
    * column, every per-shingle slice re-evaluates the tokenizer
    * (O(tokens^2) work — Spark re-evaluates expressions referenced
    * inside lambdas). Prefer staging `tokens(text)` in its own select
    * and calling [[shinglesFromTokens]]. */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** N-gram shingles over a token array — native codegen'd expression
    * ([[graft.functions.TokenNgrams]]): the token array (the child)
    * evaluates exactly ONCE per row regardless of projection
    * collapse, which is the property the earlier zip_with chain
    * existed to guarantee (a lambda-BODY reference to `toks`
    * re-evaluates per element — the slice(toks, i, n) form re-ran the
    * tokenizer once per shingle, O(tokens^2) per document; see the
    * CLAUDE.md footgun). The native form additionally removes the
    * chain's n-1 interpreted zip_with passes and array allocations.
    * Output: ["t1 .. tn", "t2 .. tn+1", ...]; empty when fewer than
    * n tokens. */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(graft.functions.TokenNgrams(
      GraftExprBridge.expression(toks), n))
  }

  /** The zip_with-chain reference implementation of
    * [[shinglesFromTokens]] (kept for the codegen equivalence spec).
    * Evaluate-once discipline as documented above still applies to
    * any caller of this form. */
  private[graft] def shinglesFromTokensFold(toks: Column, n: Int)
      : Column = {
    // zip_with pads the shorter side with null; concat_ws skips nulls,
    // so tail entries are short-grams — the final slice drops them.
    val zipped = (2 to n).foldLeft(toks) { (acc, k) =>
      zip_with(acc,
        slice(toks, lit(k), greatest(size(toks) - (k - 1), lit(0))),
        (a, b) => concat_ws(" ", a, b))
    }
    when(size(toks) >= n, slice(zipped, lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<string>"))
  }

  /** One MinHash value: min over md5("<seed>:" + shingle). Lexicographic
    * min over hex strings — identical semantics in any engine with md5. */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$seed:"), s))))

  /** k-element MinHash signature as an array column (md5-per-seed:
    * cross-engine deterministic but k md5 calls per shingle — use for
    * oracle-checkable fingerprints, [[minhashSignatureFast]] for LSH
    * pipelines). */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(i => minhash(shingles, i)): _*)

  /** Fast k-element MinHash signature: ONE xxhash64 per shingle, then
    * k affine permutations h_i(x) = (a_i * x + b_i) mod p over the base
    * hash — the classic cheap minhash family. ~k times fewer hash
    * evaluations than the md5 variant; deterministic but Spark-native
    * (no SQL oracle). */
  def minhashSignatureFast(shingles: Column, k: Int): Column = {
    // Mersenne prime 2^31-1 keeps h*a+b well inside a long under ANSI
    // overflow checking (h < 2^31, a < 2^6, b < 2^27).
    val P = 2147483647L
    val base = transform(shingles, s => pmod(xxhash64(s), lit(P)))
    minhashFromBase(base, k, P)
  }

  /** Affine minhash family over an already-hashed shingle array.
    * IMPORTANT for performance: materialize `base` as its own column
    * before calling this — the k array passes each reference it, and
    * Spark re-evaluates nested lambda expressions per reference. */
  def minhashFromBase(base: Column, k: Int, p: Long): Column =
    array((0 until k).map { i =>
      val a = 2 * i + 1
      val b = 1_000_003L * (i + 1)
      array_min(transform(base, h => pmod(h * a + b, lit(p))))
    }: _*)

  /** 64-bit SimHash over tokens using xxhash64 bits: each token votes
    * +1/-1 per bit; the sign of each bit-sum forms the fingerprint.
    * Fast path (single hash per token, bit ops only) — not designed for
    * cross-engine oracle parity. */
  def simhash64(text: Column): Column = {
    val toks = tokens(text)
    val hashed = transform(toks, t => xxhash64(t))
    def shr(v: Column, bits: Column): Column =
      call_function("shiftright", v, bits)
    def shl(v: Column, bits: Column): Column =
      call_function("shiftleft", v, bits)
    // fold bit votes: acc is array(64) of int votes
    val votes = aggregate(
      hashed,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, bit) => a + when(shr(h, bit).bitwiseAND(1) === 1, 1)
          .otherwise(-1)))
    // assemble sign bits into a long
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, bit) => when(v > 0, shl(lit(1L), bit)).otherwise(0L)),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Per-document Shannon entropy of the character distribution, in
    * nats — the cheap gibberish/boilerplate screen (natural text sits
    * in a narrow band; base64 blobs score high, repeated filler low).
    * H = ln n − (Σ c·ln c)/n over code-point frequencies; zero
    * shuffle, scan speed. Backed by the native codegen'd
    * [[graft.functions.CharEntropy]] expression (single primitive
    * pass — measured well above the interpreted HOF fold it
    * replaced; the fold survives as [[charEntropyFold]] for the
    * equivalence spec). */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      graft.functions.CharEntropy(
        org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.GraftExprBridge.expression(text),
          org.apache.spark.sql.types.StringType)))

  /** HOF-fold formulation of [[charEntropy]] — kept as the
    * independent reference implementation for the equivalence spec:
    * sort the char array, then ONE left fold accumulates run lengths
    * (the struct accumulator references only lambda arguments, so
    * nothing re-evaluates per element — see the CLAUDE.md lambda-body
    * footgun). */
  private[graft] def charEntropyFold(text: Column): Column = {
    def clnc(c: Column): Column =
      when(c > 0, c.cast("double") * log(c.cast("double")))
        .otherwise(lit(0.0d))
    val chars = array_sort(split(text, ""))
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0.0d).as("acc"))
    val folded = aggregate(chars, zero,
      (st, c) => when(c === st.getField("prev"),
        struct(c.as("prev"), (st.getField("run") + 1L).as("run"),
          st.getField("acc").as("acc")))
        .otherwise(struct(c.as("prev"), lit(1L).as("run"),
          (st.getField("acc") + clnc(st.getField("run"))).as("acc"))),
      st => st.getField("acc") + clnc(st.getField("run")))
    val n = size(chars).cast("double")
    log(n) - folded / n
  }

  /** Distinct character count (the entropy's support size). */
  def charDistinct(text: Column): Column =
    size(array_distinct(split(text, "")))

  /** Overlapping token windows for LLM-style document chunking:
    * windows of `width` tokens every `stride` tokens, plus a final
    * shorter window when a tail would otherwise be lost. Returns
    * array<struct<chunk_idx, chunk_text>>.
    *
    * The window slice references `toks` inside the lambda (one
    * evaluation per WINDOW, not per token — windows/doc is small).
    * Still, pass a materialized token column rather than an inline
    * tokenizer where possible. */
  def tokenChunks(toks: Column, width: Int, stride: Int): Column = {
    require(stride > 0 && width >= stride,
      s"need width >= stride > 0, got width=$width stride=$stride")
    val n = size(toks)
    // number of windows: 1 + ceil(max(n - width, 0) / stride)
    val extra = greatest(n - width, lit(0))
    val nChunks = lit(1) + ceil(extra.cast("double") / stride).cast("int")
    transform(sequence(lit(0), nChunks - 1),
      i => struct(i.as("chunk_idx"),
        concat_ws(" ", slice(toks, i * stride + 1, lit(width)))
          .as("chunk_text")))
  }

  /** Regex redaction: replace every match of each pattern with its
    * replacement token, applied in order. Pure scan-shaped — composes
    * with pushdown and runs at full scan speed. */
  def redact(text: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(text) { case (acc, (pattern, repl)) =>
      regexp_replace(acc, pattern, repl)
    }

  /** Rolling polynomial hash fingerprint of the whole document
    * (base-31 over Unicode code points, mod 1e9+7) — document identity
    * stable across chunking. Backed by the codegen'd
    * [[graft.functions.RollingHash]] expression (one primitive loop
    * per string). */
  def rollingHash(text: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      graft.functions.RollingHash(
        org.apache.spark.sql.GraftExprBridge.expression(text)))

  /** C4-style rule-filter signals (Raffel et al. 2020 §2.2, the
    * public cleaning recipe): per-document flags every large-corpus
    * curation job screens on, each a pure scan-speed expression —
    * token count, bad-word hit, code brace, lorem-ipsum boilerplate,
    * and the fraction of lines that end in terminal punctuation.
    * Thresholding is left to [[c4Keep]] so corpora can tune the
    * gates without recomputing signals. */
  def c4Signals(text: Column, badWords: Seq[String]): Seq[Column] = {
    val toks = tokens(text)
    val bad = array(badWords.map(lit): _*)
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    Seq(
      size(toks).as("n_words"),
      (size(filter(toks, t => array_contains(bad, t))) > 0)
        .as("has_bad_word"),
      text.contains("{").as("has_brace"),
      lower(text).contains("lorem ipsum").as("has_lorem"),
      when(size(lines) <= 0, lit(0.0))
        .otherwise(
          size(filter(lines, l => l.rlike("[.!?]\\s*$"))).cast("double") /
            size(lines))
        .as("punct_line_frac"))
  }

  /** The C4 keep gate over [[c4Signals]] columns. Defaults are
    * permissive; real corpora tighten them (C4 uses >= 3 sentences,
    * >= 5 words per line, punctuation-terminated lines). */
  def c4Keep(nWords: Column, hasBadWord: Column, hasBrace: Column,
             hasLorem: Column, punctLineFrac: Column,
             minWords: Int = 1, maxWords: Int = Int.MaxValue,
             minPunctFrac: Double = 0.0): Column =
    nWords.between(minWords, maxWords) && !hasBadWord && !hasBrace &&
      !hasLorem && punctLineFrac >= minPunctFrac

  /** Vocabulary coverage curve: for each percentage threshold, the
    * smallest frequency-ranked vocabulary (ties broken toward fewer
    * terms) whose token occurrences cover at least that share of the
    * corpus — the standard tokenizer/vocab-sizing question ("how many
    * types cover 95% of tokens").
    *
    * Scale shape: NO per-term global sort. Terms are aggregated once
    * (term-keyed, partial-aggregated), then collapsed to the
    * DISTINCT-FREQUENCY table (n, g_terms) — thousands of rows even
    * on a billion-type vocabulary, since distinct counts grow ~n^0.5
    * on Zipfian corpora — and the cumulative walk + threshold
    * crossing run on that tiny table (its single-partition window is
    * the prefixSum-offsets idiom). Within the crossing frequency
    * group the answer is closed-form integer arithmetic: every term
    * there contributes exactly n tokens, so the number of terms
    * needed is ceil((target - cum_before) / n) — no intra-group
    * ranking ever happens.
    *
    * Output (one row per threshold): pct (int), vocab_size,
    * cum_tokens (coverage actually reached), total_tokens — all
    * exact integers, engine-independent. */
  def vocabCoverage(df: DataFrame, textCol: String,
                    pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be in [1,100], got $pcts")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val tf = df
      .select(explode(tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("__t"))
      .agg(count(lit(1)).as("n"))
    val gc = tf.groupBy(col("n"))
      .agg(count(lit(1)).as("g_terms"))
      .withColumn("toks", col("n") * col("g_terms"))
    val byFreq = Window.orderBy(col("n").desc)
    // total rides the same tiny-table window as the walk (one
    // single-partition exchange total; the corpus is scanned ONCE)
    val walk = gc
      .withColumn("cum_end",
        sum(col("toks")).over(
          byFreq.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_before", col("cum_end") - col("toks"))
      .withColumn("terms_before",
        coalesce(sum(col("g_terms")).over(
          byFreq.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total",
        sum(col("toks")).over(byFreq.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val th = pcts.toDF("pct").select(col("pct").cast("int").as("pct"))
    // target = ceil(total * pct / 100); the crossing group is the one
    // whose cumulative range straddles it; j terms of frequency n
    // close the gap.
    walk.crossJoin(broadcast(th))
      .filter(col("cum_end") * 100 >= col("total") * col("pct") &&
        col("cum_before") * 100 < col("total") * col("pct"))
      .withColumn("__target",
        expr("(total * pct + 99) DIV 100"))
      .withColumn("__j",
        expr("(__target - cum_before + n - 1) DIV n"))
      .select(col("pct"),
        (col("terms_before") + col("__j")).as("vocab_size"),
        (col("cum_before") + col("__j") * col("n")).as("cum_tokens"),
        col("total").as("total_tokens"))
  }

  /** Character n-grams (space-joined, code-point-aware) — the native
    * codegen'd expression ([[graft.functions.CharNgrams]]); the HOF
    * chain form survives as [[charNgramsFold]] for the equivalence
    * spec. */
  def charNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(graft.functions.CharNgrams(
      GraftExprBridge.expression(text), n))
  }

  /** The zip_with-chain reference implementation of [[charNgrams]]
    * (split("") keeps a trailing "" under java limit -1 — filtered so
    * the char array matches substr-based replays). */
  private[graft] def charNgramsFold(text: Column, n: Int): Column =
    shinglesFromTokens(filter(split(text, ""), _ =!= ""), n)

  /** Distinct (group, term) vocabulary table for a grouped corpus —
    * the shared scan under [[vocabJaccardPairs]] and
    * [[vocabMinhashSim]]. One explode + one distinct (term-keyed
    * partial agg); blank tokens dropped. */
  private def groupVocab(df: DataFrame, groupCol: String,
                         textCol: String): DataFrame =
    df.select(col(groupCol).as("g"),
        explode(tokens(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .distinct()

  /** Exact pairwise vocabulary Jaccard between groups (sources,
    * shards, snapshots) — "how much wording do two corpora share".
    * Inverted-index shape: the self-join is keyed on the TERM, so
    * shared-term counting shuffles by term (partial-aggregated), never
    * materializes a group cross product, and only emits group pairs
    * that share at least one term.
    *
    * Scale note: a term present in all G groups contributes G(G-1)/2
    * join rows, so this exact form is for BOUNDED group counts
    * (sources, snapshots — tens to hundreds). For many groups use
    * [[vocabMinhashSim]]: k minima per group replace the full vocab,
    * making the pair stage O(G^2 * k) on k-row signatures instead of
    * O(G^2 * sharedVocab).
    *
    * Output: g1, g2 (g1 < g2), v1, v2 (distinct-term counts), shared,
    * jaccard — counts exact integers, jaccard one IEEE division. */
  def vocabJaccardPairs(df: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    val vocab = groupVocab(df, groupCol, textCol)
    val sizes = vocab.groupBy(col("g")).agg(count(lit(1)).as("v"))
    vocab.as("a").join(vocab.as("b"),
        col("a.t") === col("b.t") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("g").as("g1"), col("v").as("v1")), "g1")
      .join(sizes.select(col("g").as("g2"), col("v").as("v2")), "g2")
      .select(col("g1"), col("g2"), col("v1"), col("v2"), col("shared"),
        (col("shared").cast("double") /
          (col("v1") + col("v2") - col("shared"))).as("jaccard"))
  }

  /** k-minimum md5 signature of each group's vocabulary: one row per
    * (group, seed in [0,k)) holding min over the group's distinct
    * terms of md5Hash32(seed + ":" + term). The group's entire
    * vocabulary collapses to k longs — the sketch [[vocabMinhashSim]]
    * compares. Cross-engine deterministic (md5 idiom, no RNG). */
  def vocabMinhashSketch(df: DataFrame, groupCol: String,
                         textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val seeds = array((0 until k).map(lit): _*)
    groupVocab(df, groupCol, textCol)
      .select(col("g"), col("t"), explode(seeds).as("seed"))
      .select(col("g"), col("seed"),
        graft.operators.CurationOps.md5Hash32(
          concat(col("seed").cast("string"), lit(":"), col("t")))
          .as("h"))
      .groupBy(col("g"), col("seed"))
      .agg(min(col("h")).as("minh"))
  }

  /** Per-document character-trigram commonness — the log-free
    * perplexity proxy: how frequent, corpus-wide, are the character
    * trigrams this document is made of. Spam/mojibake/generated noise
    * sits in the low tail (rare trigrams), boilerplate in the high
    * tail. Log-probability LM scoring is deliberately avoided: ln()
    * is not bit-identical across engines' libm, while occurrence
    * COUNTS are exact integers — so the per-doc sum is
    * engine-independent and the mean is one IEEE division.
    *
    * Trigrams come from [[shinglesFromTokens]] over the char array
    * (collection-argument zip_with — one tokenize per row even under
    * projection collapse, see the CLAUDE.md footgun); ALL positions
    * count (not distinct), matching an LM's view of the text. Shape:
    * one explode, one trigram-keyed count (partial-aggregated), one
    * join back, one doc-keyed aggregation. Output: id, n_tris,
    * freq_sum (exact), commonness (= freq_sum/n_tris, double). */
  def trigramCommonness(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val tris = df.select(col(idCol).as("__id"),
      explode(charNgrams(lower(col(textCol)), 3)).as("__tri"))
    val counts = tris.groupBy(col("__tri"))
      .agg(count(lit(1)).as("__cnt"))
    tris.join(counts, "__tri")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tris"), sum(col("__cnt")).as("freq_sum"))
      .select(col("__id").as(idCol), col("n_tris"), col("freq_sum"),
        (col("freq_sum").cast("double") / col("n_tris"))
          .as("commonness"))
  }

  /** Vocabulary growth curve (the Heaps-law measurement): distinct
    * terms and cumulative tokens seen after ingesting documents in id
    * order up to each checkpoint. The standard corpus-sizing
    * question — "how fast is the type inventory still growing".
    *
    * Scale shape: each term collapses to its FIRST document
    * (term-keyed min — one partial-aggregated pass), first-occurrence
    * ids map to their covering checkpoint with a chained-when scalar
    * (no non-equi join against the checkpoint list), and the
    * cumulative walk runs on the |checkpoints|-row table (tiny
    * single-partition window — the vocabCoverage idiom). Checkpoints
    * past the corpus end report the full-corpus totals. Output per
    * checkpoint: cp, vocab_size, tokens_seen (exact integers). */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints == checkpoints.sorted,
      s"checkpoints must be sorted non-empty, got $checkpoints")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    def cpOf(c: Column): Column =
      checkpoints.foldRight(lit(null).cast("long")) { (cp, rest) =>
        when(c < cp, lit(cp)).otherwise(rest)
      }
    val first = df
      .select(col(idCol).cast("long").as("__id"),
        explode(tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("__t")).agg(min(col("__id")).as("__fd"))
      .withColumn("cp", cpOf(col("__fd")))
      .filter(col("cp").isNotNull)
      .groupBy(col("cp")).agg(count(lit(1)).as("__nv"))
    val toks = df
      .select(col(idCol).cast("long").as("__id"),
        tokenCount(col(textCol)).cast("long").as("__nt"))
      .withColumn("cp", cpOf(col("__id")))
      .filter(col("cp").isNotNull)
      .groupBy(col("cp")).agg(sum(col("__nt")).as("__tk"))
    val byCp = Window.orderBy(col("cp"))
      .rowsBetween(Window.unboundedPreceding, 0)
    checkpoints.toDF("cp")
      .join(first, Seq("cp"), "left")
      .join(toks, Seq("cp"), "left")
      .withColumn("vocab_size",
        sum(coalesce(col("__nv"), lit(0L))).over(byCp))
      .withColumn("tokens_seen",
        sum(coalesce(col("__tk"), lit(0L))).over(byCp))
      .select(col("cp"), col("vocab_size"), col("tokens_seen"))
  }

  /** Longest run of a repeated token — the degenerate-repetition
    * signal ("buy buy buy buy ...") Gopher-class filters cut on.
    * Native codegen'd expression ([[graft.functions.MaxTokenRun]]):
    * one byte scan per row, no token-array materialization, no
    * interpreted-HOF dispatch — the fold form survives as
    * [[maxTokenRunFold]] for the equivalence spec. */
  def maxTokenRun(text: Column): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(graft.functions.MaxTokenRun(
      GraftExprBridge.expression(lower(trim(text)))))
  }

  /** Single-pass ASCII character-class count / run-count
    * ([[graft.functions.CharClassCount]] modes): the codegen'd
    * replacement for the `length(x) - length(regexp_replace(x, cls,
    * ''))` idiom — no rewritten-string allocation per class. Counts
    * are integer-identical to the regexp form (classes are pure
    * ASCII), so DuckDB oracles keep the regexp derivation. */
  def charClassCount(text: Column, mode: Int): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(graft.functions.CharClassCount(
      GraftExprBridge.expression(text), mode))
  }

  /** The aggregate-HOF reference implementation of [[maxTokenRun]]
    * (state machine (mx, cur, prev)); kept as the cross-check the
    * codegen equivalence spec runs against. */
  private[graft] def maxTokenRunFold(text: Column): Column = {
    val zero = struct(lit(0L).as("mx"), lit(0L).as("cur"),
      lit("").as("prev"))
    aggregate(tokens(text), zero,
      (acc, t) => {
        val cur = when(t === acc.getField("prev"),
          acc.getField("cur") + lit(1L)).otherwise(lit(1L))
        struct(greatest(acc.getField("mx"), cur).as("mx"),
          cur.as("cur"), t.as("prev"))
      },
      acc => acc.getField("mx"))
  }

  /** Estimated pairwise vocabulary Jaccard from k-min signatures: the
    * match fraction of the two groups' signature components is an
    * unbiased Jaccard estimate (one-permutation MinHash argument).
    * The pair join runs on G*k signature rows — independent of vocab
    * size — so it scales to group counts where [[vocabJaccardPairs]]'s
    * exact term join cannot. Output: g1, g2, k, matches, est_jaccard
    * (= matches/k, one division). */
  def vocabMinhashSim(df: DataFrame, groupCol: String, textCol: String,
                      k: Int): DataFrame = {
    val sig = vocabMinhashSketch(df, groupCol, textCol, k)
    sig.as("a").join(sig.as("b"),
        col("a.seed") === col("b.seed") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(sum(when(col("a.minh") === col("b.minh"), 1L)
        .otherwise(0L)).as("matches"))
      .select(col("g1"), col("g2"), lit(k).as("k"), col("matches"),
        (col("matches").cast("double") / lit(k.toDouble))
          .as("est_jaccard"))
  }

  /** Exact-phrase occurrence stats over the canonical token stream:
    * (n_hits, first_pos) for a token phrase, where the canonical
    * stream is the tokens space-joined with single separators — so
    * matching is at token boundaries only, robust to the original
    * text's whitespace.
    *
    * Semantics contract (mirror in any oracle): n_hits counts
    * LEFT-TO-RIGHT NON-OVERLAPPING occurrences (the `replace`
    * semantics both Spark and DuckDB implement identically — for a
    * phrase that can overlap itself, e.g. "a b a" in "a b a b a",
    * later overlapping starts are not counted); first_pos is the
    * 1-based token index of the first occurrence, null when absent.
    *
    * Scale shape: a pure per-row string expression — no shuffle, no
    * index build; the full-corpus phrase scan parallelizes perfectly
    * and pushes nothing but the text column through the reader. For
    * repeated interactive phrase workloads build the positional gram
    * table (see [[DedupOps.dupNgramCoverage]]'s inverted layout)
    * instead. */
  def phraseStats(text: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty && phrase.forall(_.nonEmpty),
      s"phrase must be non-empty tokens, got $phrase")
    val needle = " " + phrase.map(_.toLowerCase).mkString(" ") + " "
    val canon = concat(lit(" "), array_join(tokens(text), " "), lit(" "))
    val nHits = ((length(canon) -
      length(replace(canon, lit(needle), lit("")))) /
      lit(needle.length)).cast("long")
    val ix = instr(canon, needle) // 1-based char pos, 0 when absent
    // token index = spaces in the prefix before the match + 1
    val prefix = canon.substr(lit(1), ix - 1)
    val firstPos = when(ix > 0,
      (length(prefix) - length(replace(prefix, lit(" "), lit(""))) +
        lit(1)).cast("long"))
    struct(nHits.as("n_hits"), firstPos.as("first_pos"))
  }

  /** Sparse lexical k-nearest-neighbors: for every document, the k
    * most TF-IDF-cosine-similar documents, computed over `shingleN`-
    * gram terms through a document-frequency-pruned inverted index —
    * the classic "more like this" retrieval without an embedding
    * model, and the lexical twin of [[SimilarityOps.knnGraph]].
    *
    * Scale shape: one term-keyed aggregation builds (doc, term, tf);
    * terms with df < `minDf` cannot produce a pair and terms with
    * df > `maxDf` are stop-shingles whose O(df^2) join fan-out would
    * dominate (the df cap is the inverted-index hub cap — same
    * discipline as LSH megabuckets; recall loss is confined to pairs
    * similar ONLY through ubiquitous shingles). The pair space is
    * then one self-join keyed on surviving terms + one (id1, id2)
    * partial-agg sum; per-query top-k cuts via row_number over rows
    * already shuffled by qid.
    *
    * Engine determinism: idf is pinned to an integer ONCE
    * (idf3 = round(ln((N+1)/(df+1)) * 1e3)); weights tf*idf3 and all
    * dot products are then exact BIGINT sums, and cosine is
    * num / sqrt(ssq_a * ssq_b) — one correctly-rounded IEEE sqrt +
    * divide on exact operands, bit-identical in any engine. Ranking
    * ties break on nid asc.
    *
    * Output: qid, nid, shared (co-occurring terms), cos (double —
    * e6-pin at the call site), rk (1..k). */
  def tfidfKnn(df: DataFrame, idCol: String, textCol: String,
               shingleN: Int, k: Int, minDf: Int = 2,
               maxDf: Int = 200): DataFrame = {
    require(shingleN >= 1 && k >= 1 && minDf >= 2 && maxDf >= minDf,
      s"bad shingleN=$shingleN k=$k minDf=$minDf maxDf=$maxDf")
    // the (doc, term, tf) table feeds FOUR consumers (df counts, both
    // join sides of the pair space, the norm aggregation) — cut the
    // lineage once so the shingle explode + aggregation runs once,
    // not per consumer (the sourceKlDivergence checkpoint pattern)
    val tf = df.select(col(idCol).cast("long").as("__id"),
        explode(wordShingles(col(textCol), shingleN)).as("t"))
      .groupBy(col("__id"), col("t")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val n = df.select(col(idCol)).distinct().count()
    val dfc = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))
      .withColumn("idf3",
        round(log((lit(n) + lit(1.0)) / (col("df") + lit(1.0))) *
          lit(1e3), 0).cast("long"))
    val w = tf.join(dfc, "t")
      .select(col("__id"), col("t"), (col("tf") * col("idf3")).as("w"))
    val ssq = w.groupBy(col("__id"))
      .agg(sum(col("w") * col("w")).as("ssq"))
    val num = w.as("a").join(w.as("b"),
        col("a.t") === col("b.t") && col("a.__id") =!= col("b.__id"))
      .groupBy(col("a.__id").as("qid"), col("b.__id").as("nid"))
      .agg(count(lit(1)).as("shared"),
        sum(col("a.w") * col("b.w")).as("num"))
    val scored = num
      .join(ssq.select(col("__id").as("qid"), col("ssq").as("sa")), "qid")
      .join(ssq.select(col("__id").as("nid"), col("ssq").as("sb")), "nid")
      .withColumn("cos", col("num").cast("double") /
        sqrt(col("sa").cast("double") * col("sb").cast("double")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("shared"), col("cos"),
        col("rk"))
  }

  /** Pair-level modified n-gram precision (the BLEU-n core,
    * Papineni et al. 2002) for CANDIDATE pairs: how much of doc
    * id2's n-gram mass doc id1 covers, with clipped counts —
    * sum_g min(c1(g), c2(g)) / total n-grams in id2. The
    * summarization / paraphrase-mining lens on a near-dup candidate
    * list: token-SET methods (Jaccard) ignore repetition, this
    * scores the multiset.
    *
    * Scale shape: positional (not distinct) n-gram counts are one
    * explode + one (doc, gram)-keyed partial agg; the pair scoring
    * joins the PAIR-SIDED gram tables only — grams of docs never
    * appearing in `pairs` are semi-join-pruned before the gram
    * join, and nothing corpus-wide is pairwise. `pairs` is any
    * (id1, id2) candidate table (LSH, prefix blocking, near-dup
    * output).
    *
    * Output: id1, id2, total2 (id2's n-gram count), clipped,
    * precision (double — pin at the call site). */
  def pairNgramPrecision(df: DataFrame, idCol: String, textCol: String,
                         pairs: DataFrame, n: Int): DataFrame = {
    val g = df.select(col(idCol).cast("long").as("__id"),
        explode(wordShingles(col(textCol), n)).as("g"))
      .groupBy(col("__id"), col("g")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val p = pairs.select(col("id1").cast("long").as("id1"),
      col("id2").cast("long").as("id2"))
    val g2 = g.join(p.select(col("id2").as("__id")).distinct(), "__id")
    val g1 = g.join(p.select(col("id1").as("__id")).distinct(), "__id")
    p.join(g2.select(col("__id").as("id2"), col("g"), col("c").as("c2")),
        "id2")
      .join(g1.select(col("__id").as("__i1"), col("g").as("g1"),
        col("c").as("c1")),
        col("id1") === col("__i1") && col("g") === col("g1"), "left")
      .groupBy(col("id1"), col("id2"))
      .agg(sum(col("c2")).as("total2"),
        sum(least(col("c2"), coalesce(col("c1"), lit(0L)))).as("clipped"))
      .withColumn("precision",
        col("clipped").cast("double") / col("total2"))
  }

  /** Pair-level ROUGE-N core: modified n-gram precision AND recall
    * (plus F1) for candidate pairs, treating id1 as the reference and
    * id2 as the candidate. Same join discipline as
    * [[pairNgramPrecision]] — per-doc gram count table built once
    * (localCheckpoint, three consumers), pair-restricted equi-joins,
    * never all-pairs. recall = clipped / total grams of the REFERENCE
    * (id1), precision = clipped / total grams of the candidate (id2). */
  def pairNgramRouge(df: DataFrame, idCol: String, textCol: String,
                     pairs: DataFrame, n: Int): DataFrame = {
    val g = df.select(col(idCol).cast("long").as("__id"),
        explode(wordShingles(col(textCol), n)).as("g"))
      .groupBy(col("__id"), col("g")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val tot = g.groupBy(col("__id")).agg(sum(col("c")).as("tot"))
    val p = pairs.select(col("id1").cast("long").as("id1"),
      col("id2").cast("long").as("id2"))
    val g2 = g.join(p.select(col("id2").as("__id")).distinct(), "__id")
    val g1 = g.join(p.select(col("id1").as("__id")).distinct(), "__id")
    p.join(g2.select(col("__id").as("id2"), col("g"), col("c").as("c2")),
        "id2")
      .join(g1.select(col("__id").as("__i1"), col("g").as("g1"),
        col("c").as("c1")),
        col("id1") === col("__i1") && col("g") === col("g1"), "left")
      .groupBy(col("id1"), col("id2"))
      .agg(sum(least(col("c2"), coalesce(col("c1"), lit(0L))))
        .as("clipped"))
      .join(tot.select(col("__id").as("id1"), col("tot").as("total1")),
        "id1")
      .join(tot.select(col("__id").as("id2"), col("tot").as("total2")),
        "id2")
      .withColumn("precision",
        col("clipped").cast("double") / col("total2"))
      .withColumn("recall",
        col("clipped").cast("double") / col("total1"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  /** Jaro-Winkler similarity column — the native codegen'd
    * [[graft.functions.JaroWinkler]] expression (rapidfuzz byte
    * semantics: 0.7 boost threshold, 4-byte prefix cap, empty side
    * scores 0). Registered in SQL as `jaro_winkler(a, b)`. */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(graft.functions.JaroWinkler(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
  }

  /** Sorted-byte deletion variants — native codegen expression, the
    * blocking signature of the adaptive [[jaroWinklerTopMatch]]. */
  def sortedDeletionVariants(s: Column, maxDel: Column): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(graft.functions.SortedDeletionVariants(
      GraftExprBridge.expression(s), GraftExprBridge.expression(maxDel)))
  }

  /** Record-linkage top match: for every row, the single most
    * Jaro-Winkler-similar OTHER row inside the same block ("which
    * existing record is this probably a duplicate of"). EXACT — the
    * output is identical to all-pairs-within-block — but the
    * implementation is the adaptive sub-quadratic search (the r6
    * VERDICT flagged the all-pairs form as the suite's one quadratic
    * join):
    *
    *  1. Phase 0, sorted neighborhood: within each block, rows sorted
    *     by (string, id) score their next `neighborWindow` neighbors
    *     (one window + explode, O(N*W) comparisons). Per-id best =
    *     lower bound lb_i; per-block floor theta_b = min_i lb_i.
    *  2. Lossless candidate join: byte-semantics JW >= theta implies
    *     (for jaro > 0.7, i.e. theta > 0.7 + boost headroom)
    *     jaro >= j0 = (theta-0.4)/0.6 (Winkler boost capped at
    *     4 bytes), hence matched bytes
    *     m >= (3*j0-1)/(1/la+1/lb), and m is at most the byte-
    *     multiset overlap. Feasibility (m <= min(la,lb)) bounds the
    *     shortest partner at la*(3*j0-2), so a per-row deletion depth
    *     d = len - ceil(min feasible overlap) makes the sorted-byte
    *     deletion-variant equi-join ([[sortedDeletionVariants]])
    *     complete for every pair that can reach theta. PROBE depth
    *     uses the row's own lb_i (tight); INDEX depth uses theta_b —
    *     the asymmetry is sound because a pair that is i's argmax has
    *     jw >= lb_i >= theta_b, so the index side always emits the
    *     shared sub-multiset (a symmetric per-id threshold would NOT
    *     be: i's argmax can be mediocre for its partner — validated
    *     against brute force, 0/1500 mismatches at sf0.01).
    *  3. Rows whose depth would exceed `maxDeletionDepth` (low
    *     theta / short strings / adversarial corpora) fall back to
    *     all-pairs against their block — correctness never depends on
    *     the data being friendly; only speed does.
    *
    * Candidates (union of 0/2/3, deduped) are scored once per
    * unordered pair with the codegen [[jaroWinkler]] and the argmax
    * is one partial-agg max-by. Measured on the fixed-format TPC-H
    * names (worst-case low-entropy keys: every multiset filter
    * degenerates): candidates = 11% of all-pairs at sf0.1 and 4.3% at
    * 10x — N^~1.55 growth vs N^2, with the phase-0 floor rising as
    * density grows, which is what keeps the truth set itself
    * sub-quadratic on natural corpora.
    *
    * Determinism contract: the winner is picked by the MICRO-UNIT
    * pinned score (round(jw*1e6)) with lowest candidate id as the
    * tiebreak, so cross-engine last-ulp double noise cannot flip the
    * argmax (the CLAUDE.md LIMIT-by-raw-double footgun). Thresholds
    * feed only the CANDIDATE GENERATION (with a 1e-9 guard band), so
    * float noise there can only widen the candidate set, never change
    * the winner.
    * Output: (block, id, match_id, jw_e6); singleton blocks drop out
    * (no candidate). */
  def jaroWinklerTopMatch(df: DataFrame, blockCol: String,
                          idCol: String, strCol: String,
                          neighborWindow: Int = 8,
                          maxDeletionDepth: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // base is a 3-column scan projection consumed by several
    // branches — cheap to recompute, so no materialization (the scan
    // prunes to (block,id,str) and ReuseExchange dedups the shuffles
    // that matter); only fwd (the JW-scored neighbor pairs) is
    // checkpointed, since it feeds three consumers and carries real
    // compute.
    val base = df.select(col(blockCol).as("block"),
      col(idCol).cast("long").as("id"), col(strCol).as("s"))

    // -- phase 0: sorted-neighborhood scores -> per-id lower bounds
    val w = Window.partitionBy("block").orderBy(col("s"), col("id"))
      .rowsBetween(1, neighborWindow)
    val fwd = base
      .withColumn("__nb", collect_list(struct(col("id").as("cand_id"),
        col("s").as("cand_s"))).over(w))
      .select(col("block"), col("id"), col("s"),
        explode(col("__nb")).as("nb"))
      .withColumn("jw", jaroWinkler(col("s"), col("nb.cand_s")))
      .select(col("block"), col("id"), col("nb.cand_id").as("cand_id"),
        col("jw"))
      .localCheckpoint(false)
    val lower = fwd.select(col("block"), col("id"), col("jw"))
      .union(fwd.select(col("block"), col("cand_id").as("id"),
        col("jw")))
      .groupBy(col("block"), col("id"))
      .agg(max(col("jw")).as("lb"))
    // theta   = block floor (lossless bound for EVERY probe);
    // theta_t = ~2nd-percentile tier cut — the shallow index tier
    // serves the vast majority of probes whose own lower bound
    // clears it, so the deep (floor-threshold) index only ever joins
    // the few weak probes (AQE broadcasts that side). Threshold
    // choice affects only candidate-set size, never the argmax.
    val theta = lower.groupBy(col("block"))
      .agg(min(col("lb")).as("theta"),
        expr("percentile_approx(lb, 0.02, 1000)").as("__t0"))
      .withColumn("theta_t", greatest(col("theta"), col("__t0")))
      .drop("__t0")
    val lens = base.groupBy(col("block"))
      .agg(min(length(col("s"))).cast("double").as("lmin"))

    // depth(len, th): deletions that keep the variant join complete
    // for jw >= th (see scaladoc); conservative in the float-noise
    // direction (o rounds DOWN -> deeper deletions -> more
    // candidates, never fewer).
    def depth(lenC: Column, thC: Column, lminC: Column): Column = {
      val j0 = (thC - lit(0.4)) / lit(0.6)
      val coef = lit(3.0) * j0 - lit(1.0)
      val lbSmall = greatest(lit(1.0), lminC,
        ceil(lenC * (lit(3.0) * j0 - lit(2.0))))
      val oMin = coef / (lit(1.0) / lenC + lit(1.0) / lbSmall)
      greatest(lit(0),
        (lenC - ceil(oMin - lit(1e-9))).cast("int"))
    }

    val rec = base.join(lower, Seq("block", "id"))
      .join(theta, Seq("block"))
      .join(lens, Seq("block"))
      .withColumn("len", length(col("s")).cast("double"))
      .withColumn("d_pr",
        depth(col("len"), col("lb") - lit(1e-9), col("lmin")))
      .withColumn("d_ix",
        depth(col("len"), col("theta") - lit(1e-9), col("lmin")))
      .withColumn("d_ixs",
        depth(col("len"), col("theta_t") - lit(1e-9), col("lmin")))
      .withColumn("__hi", col("lb") - lit(1e-9) >= col("theta_t"))
      .withColumn("__fb",
        col("theta") <= lit(0.72) ||
          col("d_pr") > lit(maxDeletionDepth) ||
          col("d_ix") > lit(maxDeletionDepth))
      // consumed by probe, index, and the fallback filter — three
      // re-runs of the threshold joins without this barrier
      .localCheckpoint(false)

    // -- lossless variant join over the non-fallback rows, tiered:
    // a probe with lb >= theta_t only needs partners indexed at
    // theta_t (pair jw >= lb >= theta_t), so the deep floor-threshold
    // index never joins the bulk of the probes.
    val good = rec.filter(!col("__fb"))
    // explicit-N repartition: AQE's 64 MB advisory coalesces these
    // ~tens-of-MB variant shuffles to 1-2 partitions and serializes
    // the merge join; a user-specified partition count opts the
    // exchange out of coalescing and keeps the join wide.
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    def pairsOf(probe: DataFrame, index: DataFrame): DataFrame =
      probe.repartition(nPart, col("block"), col("v"))
        .join(index.repartition(nPart, col("block"), col("v")),
          Seq("block", "v"))
        .filter(col("id") =!= col("cand_id"))
        .select(col("block"), least(col("id"), col("cand_id")).as("a"),
          greatest(col("id"), col("cand_id")).as("b"))
    val probeHi = good.filter(col("__hi")).select(col("block"), col("id"),
      explode(sortedDeletionVariants(col("s"), col("d_pr"))).as("v"))
    val probeLo = good.filter(!col("__hi")).select(col("block"), col("id"),
      explode(sortedDeletionVariants(col("s"), col("d_pr"))).as("v"))
    val indexShallow = good.select(col("block"), col("id").as("cand_id"),
      explode(sortedDeletionVariants(col("s"), col("d_ixs"))).as("v"))
    val indexDeep = good.select(col("block"), col("id").as("cand_id"),
      explode(sortedDeletionVariants(col("s"), col("d_ix"))).as("v"))
    val varPairs = pairsOf(probeHi, indexShallow)
      .union(pairsOf(probeLo, indexDeep))

    // -- all-pairs fallback for rows the bound can't cover
    val fbPairs = rec.filter(col("__fb")).select(col("block"), col("id"))
      .join(base.select(col("block"), col("id").as("cand_id")),
        Seq("block"))
      .filter(col("id") =!= col("cand_id"))
      .select(col("block"), least(col("id"), col("cand_id")).as("a"),
        greatest(col("id"), col("cand_id")).as("b"))

    val p0Pairs = fwd.select(col("block"),
      least(col("id"), col("cand_id")).as("a"),
      greatest(col("id"), col("cand_id")).as("b"))

    // -- score each unordered candidate once, argmax both directions
    val scored = varPairs.union(fbPairs).union(p0Pairs)
      .groupBy(col("block"), col("a"), col("b")).agg(count(lit(1)).as("__c"))
      .drop("__c")
      .join(base.select(col("block"), col("id").as("a"),
        col("s").as("sa")), Seq("block", "a"))
      .join(base.select(col("block"), col("id").as("b"),
        col("s").as("sb")), Seq("block", "b"))
      .withColumn("jw_e6",
        round(jaroWinkler(col("sa"), col("sb")) * lit(1e6), 0)
          .cast("long"))
    scored.select(col("block"), col("a").as("id"),
        col("b").as("cand_id"), col("jw_e6"))
      .union(scored.select(col("block"), col("b").as("id"),
        col("a").as("cand_id"), col("jw_e6")))
      .groupBy(col("block"), col("id"))
      .agg(max(struct(col("jw_e6"), negate(col("cand_id")).as("__neg"),
        col("cand_id").as("cand_id"))).as("__b"))
      .select(col("block"), col("id"),
        col("__b.cand_id").as("match_id"), col("__b.jw_e6").as("jw_e6"))
  }
}
