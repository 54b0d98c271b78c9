package graft

import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the optimization round: times the
  * sub-stages of the PPJoin family so changes target the real cost.
  * Usage: runMain graft.ProfileScratch [sfDir]
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.benchSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmUp(spark, sfDir)
    import graft.operators.DedupOps
    val docs = graft.core.Tables.load(spark, sfDir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // phase 1: verbatim collapse (materialize both checkpoints)
    val (reps, members) = DedupOps.collapseVerbatimTexts(
      docs, "doc_id", "text")
    time("collapse: reps count")(reps.count())
    time("collapse: members count")(members.count())

    // phase 2: shingles
    val sh = time("stagedShingles build+checkpoint") {
      val s = DedupOps.stagedShingles(reps, "doc_id", "text", 3)
        .localCheckpoint(false)
      s.count()
      s
    }

    // phase 3: kernel candidate generation only
    val cand = time("kernel: cross pairs (full)") {
      val c = DedupOps.prefixFilteredJaccardCrossPairsFromSets(sh, 0.4)
      c.count()
      c
    }
    println(s"[prof] n cross pairs = ${cand.count()}")

    // phase 3b: kernel internals, stage by stage (NEW shape)
    {
      import org.apache.spark.sql.expressions.Window
      val threshold = 0.4
      val sets = sh
      val inv = sets.select(col("doc_id"), size(col("sh")).as("nsh"),
        lit(true).as("isnew"), explode(col("sh")).as("s"))
      val dfc = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val pref = inv.join(dfc, "s")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("df"), col("s"))))
        .filter(col("rn") <=
          col("nsh") - ceil(lit(threshold) * col("nsh")) + 1)
        .select(col("doc_id"), col("s"), col("rn"), col("nsh"),
          col("isnew"))
      val prefC = pref.localCheckpoint(false)
      time("k: pref build+chkpt")(prefC.count())
      println(s"[prof] pref rows = ${prefC.count()}")
      val candRaw = prefC.as("a").join(prefC.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
            (col("a.isnew") || col("b.isnew")) &&
            col("b.nsh") >= ceil(lit(threshold) * col("a.nsh")) &&
            col("a.nsh") >= ceil(lit(threshold) * col("b.nsh")))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          col("a.rn").as("ra"), col("b.rn").as("rb"),
          col("a.nsh").as("na"), col("b.nsh").as("nb"))
      time("k: candRaw join count")(println(
        s"[prof] candRaw rows = ${candRaw.count()}"))
      val cand = candRaw
        .groupBy(col("id1"), col("id2"))
        .agg(count(lit(1)).as("m"), max(col("ra")).as("ra"),
          max(col("rb")).as("rb"), min(col("ra")).as("ra0"),
          min(col("rb")).as("rb0"), first(col("na")).as("na"),
          first(col("nb")).as("nb"))
        .filter(least(
            col("m") +
              least(col("na") - col("ra"), col("nb") - col("rb")),
            lit(1L) +
              least(col("na") - col("ra0"), col("nb") - col("rb0"))) >=
          ceil(lit(threshold / (1.0 + threshold)) *
            (col("na") + col("nb")).cast("double") - lit(1e-6)))
        .select(col("id1"), col("id2"))
      val candD = cand.localCheckpoint(false)
      time("k: cand groupBy+posfilter")(candD.count())
      println(s"[prof] cand rows = ${candD.count()}")
      val ver = candD
        .join(sets.select(col("doc_id").as("id1"), col("sh").as("sh1")),
          "id1")
        .join(sets.select(col("doc_id").as("id2"), col("sh").as("sh2")),
          "id2")
        .withColumn("shared",
          size(array_intersect(col("sh1"), col("sh2"))))
        .withColumn("jaccard", col("shared").cast("double") /
          (size(col("sh1")) + size(col("sh2")) - col("shared")))
        .filter(col("jaccard") >= threshold)
      time("k: verify joins+intersect")(noop(ver))
    }

    // phase 4: group pairs incl self rows
    val gp = time("groupPairsFromReps (full, chkpt)") {
      val g = DedupOps.prefixFilteredJaccardGroupPairsFromReps(
        reps, 3, 0.4).localCheckpoint(false)
      g.count()
      g
    }

    // phase 5: components
    time("groupComponents") {
      DedupOps.groupComponents(gp).count()
    }

    // phase 6: q370 tail from gp
    time("q370 tail (sizes/choices/agg)") {
      val lens = reps.select(col("doc_id").as("rid"),
        length(col("text")).cast("long").as("len"))
      val membersG = DedupOps.groupComponents(gp)
        .join(lens, col("rep_id") === col("rid"))
      val choices = membersG.groupBy(col("cluster_id"))
        .agg(min(col("rep_id")).as("keep_first"),
          max(struct(col("len"), (-col("rep_id")).as("nid"))).as("kl"),
          sum(col("g")).as("m"))
        .select(col("cluster_id"), col("keep_first"),
          (-col("kl.nid")).as("keep_longest"), col("m"))
      noop(choices
        .join(lens.select(col("rid").as("kf_rid"),
          col("len").as("len_f")), col("keep_first") === col("kf_rid"))
        .join(lens.select(col("rid").as("kl_rid"),
          col("len").as("len_l")), col("keep_longest") === col("kl_rid"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("len_f")).as("bytes_first")))
    }
    // ---- store build phases (q383 shape) ----
    locally {
      import graft.sources.NearDupGraphStore
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-prof-ndg"
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      time("store: write 2/3 (no labels)") {
        NearDupGraphStore.write(spark,
          docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0L), "doc_id",
          "text", n = 3, baseT = 0.3,
          componentThresholds = Seq.empty, path)
      }
      time("store: append 1/3 (labels 0.4)") {
        NearDupGraphStore.append(spark,
          docs.filter(pmod(col("doc_id"), lit(3L)) === 0L), "doc_id",
          "text", componentThresholds = Seq(0.4), path)
      }
      time("store: groupPairs read+agg") {
        NearDupGraphStore.groupPairs(spark, path, 0.4).count()
      }
      time("store: components read") {
        NearDupGraphStore.components(spark, path, 0.4).count()
      }
    }
    spark.stop()
  }
}
