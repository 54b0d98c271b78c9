package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{DedupOps, MultimodalOps, SimilarityOps, TextOps}

/** North-star training-data-pipeline queries (BASELINE.json): dedup,
  * similarity search, text analysis, multimodal — over the `documents`
  * and `embeddings` tables. DuckDB oracles where the op is
  * SQL-expressible; hash-based probabilistic ops (SimHash, hyperplane
  * LSH, media stubs) are declared without oracle (driver rows-only
  * check) and verified by ScalaTest instead.
  */
object NorthStar {
  private type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Marker words drawn from the synthetic corpus vocabulary — the
    * operator is generic; the query pins a concrete config. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "scanic" -> Seq("scan", "row", "table", "filter"),
    "joinic" -> Seq("join", "merge", "key", "hash"),
    "streamic" -> Seq("stream", "window", "batch", "order"))

  val Stopwords: Seq[String] = Seq("a", "the", "and", "of", "to", "data")

  // q21 — exact dedup (hash-groupBy, one shuffle)
  private val q21: Q = (s, dir) => {
    DedupOps.exactDedup(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("keep_id"))
  }

  // q22 — text quality metrics (pure scan, no shuffle)
  private val q22: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    d.select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.subwordCount(col("text")).as("n_subwords"),
        round(TextOps.stopwordRatio(col("text"), Stopwords), 6)
          .as("stop_ratio"),
        round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
        TextOps.qualityScore(col("text"), Stopwords).as("quality"))
      .orderBy(col("doc_id"))
  }

  // q23 — keyword-vote language ID + distribution
  private val q23: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(TextOps.langId(col("text"), LangMarkers).as("lang_pred"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang_pred"))
  }

  // q24 — MinHash document fingerprints (deterministic md5 minima).
  // Tokens/shingles staged as their own projections (see CLAUDE.md:
  // lambda-referenced expressions re-evaluate per element).
  private val q24: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(TextOps.shinglesFromTokens(col("toks"), 3)).as("sh"))
      .select(col("doc_id"),
        TextOps.minhash(col("sh"), 0).as("fp0"),
        TextOps.minhash(col("sh"), 1).as("fp1"))
      .orderBy(col("doc_id"))
  }

  // q25 — exact 2-gram Jaccard pairs via inverted-index join
  private val q25: Q = (s, dir) => {
    DedupOps.ngramJaccardPairs(
        t(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", n = 2, threshold = 0.1)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jacc"))
      .orderBy(col("id1"), col("id2"))
  }

  // q26 — MinHash-LSH near-dup dedup (bucket join; no oracle)
  private val q26: Q = (s, dir) => {
    DedupOps.minhashLshDedup(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 2, k = 16, bands = 16, threshold = 0.1)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jacc"))
      .orderBy(col("id1"), col("id2"))
  }

  // q27 — SimHash near-dup candidates (no oracle)
  private val q27: Q = (s, dir) => {
    DedupOps.simhashNearDup(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 24)
      .orderBy(col("id1"), col("id2"))
  }

  // q28 — brute-force cosine top-5 for queries vec_id < 5
  private val q28: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), col("cos").desc, col("nid"))
      .select(col("qid"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  // q29 — LSH-bucketed ANN top-5 (no oracle; recall vs q28 in tests)
  private val q29: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 50),
        "vec_id", "embedding", k = 5, planes = 4)
      .orderBy(col("qid"), col("cos").desc, col("nid"))
      .select(col("qid"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  // q30 — multimodal feature extraction over synthetic payloads
  // (codec step stubbed; plumbing real — no oracle)
  private val q30: Q = (s, dir) => {
    import s.implicits._
    val media = MultimodalOps
      .syntheticMedia(t(s, dir, "documents"), "doc_id", "text")
      .as[graft.operators.MediaPayload]
    MultimodalOps.extractFeatures(media)
      .select(col("media_id"), col("format"), col("n_bytes"),
        round(col("mean_byte"), 6).as("mean_byte"),
        round(col("entropy_proxy"), 6).as("entropy_proxy"))
      .orderBy(col("media_id"))
  }

  // q31 — embedding-cosine near-dup pairs via hyperplane buckets
  private val q31: Q = (s, dir) => {
    DedupOps.embeddingNearDup(t(s, dir, "embeddings"), "vec_id",
        "embedding", planes = 2, threshold = 0.35)
      .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cos"))
      .orderBy(col("id1"), col("id2"))
  }

  // q32 — video frame sampling (column-expression slicing; no oracle)
  private val q32: Q = (s, dir) => {
    val media = MultimodalOps
      .syntheticMedia(t(s, dir, "documents"), "doc_id", "text")
      .filter(col("format") === "video")
    MultimodalOps.frameSample(media, "data", frameBytes = 32, stride = 16)
      .select(col("media_id"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  // q33/q34 — one-pass distributed Welch t-test via the typed
  // Aggregator (click vs view event values). q33 exposes the
  // oracle-checkable pieces (t, df); q34 adds the p-value (incomplete
  // beta — not SQL-expressible, rows-only check + ScalaTest).
  private def welchDs(s: SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select((col("event_type") === "click").as("isA"),
        col("value"))
      .as[(Boolean, Double)]
  }

  private val q33: Q = (s, dir) => {
    welchDs(s, dir)
      .select(new graft.operators.WelchTTest("less").toColumn)
      .select(round(col("t"), 6).as("t"), round(col("df"), 6).as("df"))
  }

  private val q34: Q = (s, dir) => {
    welchDs(s, dir)
      .select(new graft.operators.WelchTTest("less").toColumn)
      .select(round(col("t"), 6).as("t"), round(col("df"), 6).as("df"),
        col("p").as("p_less"), col("nA").as("n_click"),
        col("nB").as("n_view"))
  }

  // q35 — corpus curation pipeline: quality-filter -> exact-dedup ->
  // language distribution, composed from the text/dedup operators in
  // one declarative plan (what a training-data curation job runs).
  private val q35: Q = (s, dir) => {
    val d = t(s, dir, "documents")
      .withColumn("quality", TextOps.qualityScore(col("text"), Stopwords))
      .filter(col("quality") >= 0.87)
    val surviving = DedupOps.exactDedup(d, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
      .join(d, "doc_id")
    surviving
      .select(TextOps.langId(col("text"), LangMarkers).as("lang_pred"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang_pred"))
  }

  // q40 — IVF ANN top-5 (coarse-quantizer cells + probes; no oracle,
  // recall vs brute force asserted in NorthStarSpec)
  private val q40: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 50),
        "vec_id", "embedding", k = 5, nCentroids = 16, nProbes = 4)
      .orderBy(col("qid"), col("cos").desc, col("nid"))
      .select(col("qid"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  // q41 — rolling-hash document fingerprints (base-31 polynomial over
  // code points mod 1e9+7; chunking-stable identity). Engine-specific
  // expression — no SQL oracle; determinism + sensitivity covered in
  // NorthStarSpec.
  private val q41: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(col("doc_id"), TextOps.rollingHash(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  val all: Map[String, Q] = Map(
    "q33_welch_agg" -> q33,
    "q34_welch_pvalue" -> q34,
    "q35_corpus_curation" -> q35,
    "q40_ivf_topk" -> q40,
    "q41_rolling_fingerprint" -> q41,
    "q21_dedup_exact" -> q21,
    "q22_text_quality" -> q22,
    "q23_lang_id" -> q23,
    "q24_minhash_fingerprint" -> q24,
    "q25_ngram_jaccard" -> q25,
    "q26_minhash_lsh_dedup" -> q26,
    "q27_simhash_neardup" -> q27,
    "q28_cosine_topk" -> q28,
    "q29_ann_lsh_topk" -> q29,
    "q30_multimodal_features" -> q30,
    "q31_embedding_neardup" -> q31,
    "q32_frame_sample" -> q32)

  val oracle: Map[String, String] = Map(
    "q35_corpus_curation" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, text, toks,
        |         len(list_filter(toks, t -> list_contains(['a','the','and','of','to','data'], t)))
        |           * 1.0 / GREATEST(len(toks), 1) AS stop_ratio,
        |         (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |           * 1.0 / GREATEST(length(text), 1) AS punct_ratio,
        |         length(text) * 1.0 / GREATEST(len(toks), 1) AS mean_len
        |  FROM d),
        |qd AS (
        |  SELECT doc_id, text, toks FROM m
        |  WHERE ROUND((LEAST(mean_len / 8.0, 1.0) + (1.0 - stop_ratio) +
        |               (1.0 - LEAST(punct_ratio * 5.0, 1.0))) / 3.0, 6) >= 0.87),
        |kept AS (
        |  SELECT MIN(doc_id) AS doc_id FROM qd GROUP BY md5(lower(trim(text)))),
        |sc AS (
        |  SELECT len(list_filter(q.toks, t -> list_contains(['scan','row','table','filter'], t))) AS s1,
        |         len(list_filter(q.toks, t -> list_contains(['join','merge','key','hash'], t))) AS s2,
        |         len(list_filter(q.toks, t -> list_contains(['stream','window','batch','order'], t))) AS s3
        |  FROM kept k JOIN qd q ON k.doc_id = q.doc_id),
        |p AS (
        |  SELECT CASE WHEN GREATEST(s1, s2, s3) <= 0 THEN 'und'
        |              WHEN s1 = GREATEST(s1, s2, s3) THEN 'scanic'
        |              WHEN s2 = GREATEST(s1, s2, s3) THEN 'joinic'
        |              ELSE 'streamic' END AS lang_pred
        |  FROM sc)
        |SELECT lang_pred, COUNT(*) AS n_docs FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33_welch_agg" ->
      """WITH a AS (SELECT AVG(value) m, VAR_SAMP(value) v, COUNT(*) n
        |           FROM events WHERE event_type = 'click'),
        |     b AS (SELECT AVG(value) m, VAR_SAMP(value) v, COUNT(*) n
        |           FROM events WHERE event_type = 'view')
        |SELECT ROUND((a.m - b.m) / SQRT(a.v/a.n + b.v/b.n), 6) AS t,
        |       ROUND(POWER(a.v/a.n + b.v/b.n, 2) /
        |             (POWER(a.v/a.n, 2)/(a.n-1) + POWER(b.v/b.n, 2)/(b.n-1)), 6) AS df
        |FROM a, b""".stripMargin,
    "q21_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS dups
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q22_text_quality" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, text,
        |         len(toks) AS n_tokens,
        |         len(list_filter(toks, t -> list_contains(['a','the','and','of','to','data'], t)))
        |           * 1.0 / GREATEST(len(toks), 1) AS stop_ratio,
        |         (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |           * 1.0 / GREATEST(length(text), 1) AS punct_ratio,
        |         length(text) * 1.0 / GREATEST(len(toks), 1) AS mean_len
        |  FROM d)
        |SELECT doc_id, n_tokens,
        |       len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                       t -> len(t) > 0)) AS n_subwords,
        |       ROUND(stop_ratio, 6) AS stop_ratio,
        |       ROUND(punct_ratio, 6) AS punct_ratio,
        |       ROUND((LEAST(mean_len / 8.0, 1.0) + (1.0 - stop_ratio) +
        |              (1.0 - LEAST(punct_ratio * 5.0, 1.0))) / 3.0, 6) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "q23_lang_id" ->
      """WITH d AS (
        |  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
        |s AS (
        |  SELECT len(list_filter(toks, t -> list_contains(['scan','row','table','filter'], t))) AS s1,
        |         len(list_filter(toks, t -> list_contains(['join','merge','key','hash'], t))) AS s2,
        |         len(list_filter(toks, t -> list_contains(['stream','window','batch','order'], t))) AS s3
        |  FROM d),
        |p AS (
        |  SELECT CASE WHEN GREATEST(s1, s2, s3) <= 0 THEN 'und'
        |              WHEN s1 = GREATEST(s1, s2, s3) THEN 'scanic'
        |              WHEN s2 = GREATEST(s1, s2, s3) THEN 'joinic'
        |              ELSE 'streamic' END AS lang_pred
        |  FROM s)
        |SELECT lang_pred, COUNT(*) AS n FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q24_minhash_fingerprint" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         CASE WHEN len(toks) >= 3
        |              THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                     i -> array_to_string(toks[i:i+2], ' ')))
        |              ELSE [] END AS sh
        |  FROM d)
        |SELECT doc_id,
        |       list_min(list_transform(sh, x -> md5('0:' || x))) AS fp0,
        |       list_min(list_transform(sh, x -> md5('1:' || x))) AS fp1
        |FROM s ORDER BY doc_id""".stripMargin,
    "q25_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE doc_id < 100),
        |s AS (
        |  SELECT doc_id,
        |         CASE WHEN len(toks) >= 2
        |              THEN list_distinct(list_transform(range(1, len(toks)),
        |                     i -> array_to_string(toks[i:i+1], ' ')))
        |              ELSE [] END AS sh
        |  FROM d),
        |inv AS (SELECT doc_id, unnest(sh) AS s1 FROM s),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
        |  FROM inv a JOIN inv b ON a.s1 = b.s1 AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, len(sh) AS n FROM s)
        |SELECT id1, id2,
        |       ROUND(shared * 1.0 / (x.n + y.n - shared), 6) AS jacc
        |FROM p JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
        |WHERE shared * 1.0 / (x.n + y.n - shared) >= 0.1
        |ORDER BY id1, id2""".stripMargin,
    "q28_cosine_topk" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosim
        |  FROM q, embeddings c WHERE c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT qid, nid, cosim,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosim DESC, nid) AS rk
        |  FROM scored)
        |SELECT qid, nid, ROUND(cosim, 6) AS cos FROM ranked WHERE rk <= 5
        |ORDER BY qid, cosim DESC, nid""".stripMargin)
}
