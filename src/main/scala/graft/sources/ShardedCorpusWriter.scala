package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CurationOps

/** The training-data pipeline's last mile: write a curated corpus as
  * SIZE-BALANCED, DETERMINISTIC parquet shards — the layout a training
  * job actually consumes (uniform shard sizes for even data-loader
  * work, reproducible shard membership for resumable/debuggable runs).
  *
  * Shard assignment is content-addressed: pmod(md5(id), nShards) — the
  * same document lands in the same shard on every re-run, on any
  * engine, regardless of upstream partitioning or row order (the same
  * determinism idiom as the split/sampling operators). nShards derives
  * from the corpus count and the target docs-per-shard, so shard size
  * stays near-constant as the corpus grows.
  *
  * Scale shape: ONE hash shuffle into exactly nShards partitions (each
  * task owns one whole shard -> one file per shard per partition
  * value), rows sorted within the shard by (partition cols, id) so
  * file contents are byte-stable across runs. md5 spreads doc ids
  * uniformly, so shard skew is bounded regardless of id distribution.
  * At 100 TB, docsPerShard controls file size directly — no
  * small-files problem, no giant-file stragglers.
  */
object ShardedCorpusWriter {

  /** Writes `df` under `path`; returns the shard count. */
  def write(df: DataFrame, idCol: String, path: String,
            docsPerShard: Long,
            partitionCols: Seq[String] = Nil): Int = {
    require(docsPerShard > 0, s"docsPerShard must be positive")
    val total = df.count()
    val n = math.max(1L,
      math.ceil(total.toDouble / docsPerShard).toLong).toInt
    val sortCols = (partitionCols :+ idCol).map(col)
    val sharded = df
      .withColumn("shard",
        pmod(CurationOps.md5Hash32(col(idCol).cast("string")),
          lit(n.toLong)).cast("int"))
      .repartition(n, col("shard"))
      .sortWithinPartitions(sortCols: _*)
    val w = sharded.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
    n
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
