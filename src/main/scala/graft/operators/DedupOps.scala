package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each shaped for
  * 100 TB: exact dedup is one hash-shuffle; near-dup methods generate
  * candidates by *bucket join* (LSH bands / shared shingles / SimHash
  * bands / hyperplane buckets) so no O(n^2) cross join ever appears —
  * the shuffle key is always a bucket id, and verification runs only on
  * candidate pairs.
  */
object DedupOps {

  /** Exact dedup on a normalized key: one row per distinct key with the
    * smallest id as the survivor and the duplicate count. Single
    * hash-shuffle, partial+final agg. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(lower(trim(col(textCol)))).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dups"))

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle (inverted-index join — the exact method; use
    * [[minhashLshCandidates]] when even the inverted index is too hot).
    * Returns (id1, id2, jaccard) for pairs with jaccard >= threshold. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      array_distinct(TextOps.wordShingles(col(textCol), n)).as("sh"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("nsh"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val shared = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("nsh", "n1"), "id1")
      .join(sizes.withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("nsh", "n2"), "id2")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n1") + col("n2") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** MinHash + LSH banding: k-element signature split into `bands`
    * bands; documents sharing any band hash are candidate near-dups.
    * Returns distinct candidate pairs (id1 < id2). One shuffle on the
    * band bucket; bucket sizes bound the join fan-out. */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
                           shingleN: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val rowsPerBand = k / bands
    val sig = df.select(col(idCol).as("doc_id"),
      TextOps.minhashSignature(
        array_distinct(TextOps.wordShingles(col(textCol), shingleN)), k)
        .as("sig"))
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|",
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  /** MinHash-LSH dedup end to end: candidates -> exact Jaccard verify
    * -> pairs at/above threshold. */
  def minhashLshDedup(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val cand = minhashLshCandidates(df, idCol, textCol, shingleN, k, bands)
    val sh = df.select(col(idCol).as("doc_id"),
      array_distinct(TextOps.wordShingles(col(textCol), shingleN)).as("sh"))
    cand
      .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** SimHash near-dup candidates: 64-bit fingerprints band-matched in 4
    * 16-bit bands (any shared band => candidate; catches pairs within
    * Hamming distance 3 with certainty, more probabilistically), then
    * verified by exact Hamming distance <= maxHamming. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("doc_id"),
      TextOps.simhash64(col(textCol)).as("sim"))
    val banded = sig.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sim"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sim").as("sim1"), col("b.sim").as("sim2"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim1").bitwiseXOR(col("sim2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Embedding-cosine near-dup via hyperplane LSH (see
    * [[SimilarityOps.hyperplaneBucket]]): bucket join + cosine verify. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       planes: Int = 16, threshold: Double = 0.95): DataFrame = {
    val withBucket = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("bucket", SimilarityOps.hyperplaneBucket(col("v"), planes))
    withBucket.as("a").join(withBucket.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        SimilarityOps.cosine(col("a.v"), col("b.v")))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        col("cosine"))
  }
}
