package graft

import org.apache.spark.sql.SparkSession

import graft.checks.Validation

/** Cluster-size scaling evidence (north rule: throughput scaling
  * efficiency >= 0.8 between N and 4N executors). In this sandbox the two
  * cluster sizes are proxied by two local parallelism levels on identical
  * input: the same flagship validation job at local[8] and local[32].
  * Prints one JSON line; results are recorded in BENCH.md.
  */
object Scaling {
  def run(cpus: Int, sfDir: String, replicas: Int): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SCALE_JOB: "invariant" = span-sequence invariant job
    // (the north-rule per-row check); "full" = invariant + 20-keyword
    // rule set; "minhash" = Job C, the MinHash near-dup pipeline
    // end-to-end (shingle → 96-hash signature → banding shuffle →
    // candidate join → size-gated exact-Jaccard verify) on a replicated
    // disjoint-shingle corpus
    val jobKind = sys.env.getOrElse("SPARK_GRAFT_SCALE_JOB", "invariant")
    val (n, job): (Long, () => Unit) =
      if (jobKind == "minhash") {
        // 400 replicas ≈ 2.2M docs at sf0.1: large enough that task time
        // dominates the job's serial driver fraction (gate counts, AQE
        // stage rounds, broadcast builds ≈ 3-4 s constant — at 40
        // replicas that fixed cost capped 8→32 efficiency at 0.29)
        val mReplicas =
          sys.env.getOrElse("SPARK_GRAFT_MINHASH_REPLICAS", "400").toInt
        val path = BenchData.ensureTextCorpus(spark, sfDir, mReplicas)
        val corpus = spark.read.parquet(path)
        (corpus.count(), () => {
          // drop the previous rep's gated candidate cache first (inside
          // the timed region: recomputing candidates IS part of the job)
          graft.operators.Candidates.releaseAll(blocking = true)
          Bench.exec(graft.operators.Dedup.minhashCandidatesOf(corpus))
        })
      } else {
        val (docsTbl, refTbl) =
          BenchData.ensureBucketed(spark, sfDir, replicas)
        val docs = spark.table(docsTbl)
        val ref = spark.table(refTbl)
        val full = jobKind == "full"
        (docs.count(), () =>
          if (full) Bench.exec(Validation.perPartition(docs, ref))
          else Bench.exec(graft.checks.Verdicts.perPartition(
            graft.checks.SpanInvariant.verdicts(docs, ref))))
      }
    job() // warm-up (codegen + JIT)
    val sec = (1 to 3).map(_ => Bench.time(job())).min
    spark.stop()
    (n, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas =
      sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "8000").toInt
    // alternate levels (both levels run in this JVM, so a fixed order
    // would hand the second level all the JIT warm-up); min per level
    val (nLo, s8a) = run(8, sfDir, replicas)
    val (_, s32a) = run(32, sfDir, replicas)
    val (_, s8b) = run(8, sfDir, replicas)
    val (_, s32b) = run(32, sfDir, replicas)
    val secLo = math.min(s8a, s8b)
    val secHi = math.min(s32a, s32b)
    val thLo = nLo / secLo
    val thHi = nLo / secHi
    val eff = (thHi / thLo) / 4.0
    println(s"""{"metric":"scaling efficiency 8->32 cores",""" +
      s""""value":${math.rint(eff * 10000) / 10000},"unit":"ratio",""" +
      s""""docs":$nLo,"sec_n8":$secLo,"sec_n32":$secHi,""" +
      s""""docs_per_sec_n8":${math.rint(thLo)},""" +
      s""""docs_per_sec_n32":${math.rint(thHi)},"sf":"$sfDir"}""")
  }
}

/** One parallelism level in its own JVM — the two-process spark-submit
  * proxy (scripts/scaling-two-process.sh): each level gets a fresh JVM,
  * its own heap, and (via taskset) ONLY its own cores, exactly like an
  * N-core executor on a real cluster — the in-JVM alternation in
  * [[Scaling]] hands the low-parallelism run all 32 hardware cores for
  * GC/JIT, which a real 8-core node would not have. Prints one JSON line.
  */
object ScalingOne {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "4000").toInt
    val (n, sec) = Scaling.run(cpus, sfDir, replicas)
    println(s"""{"cpus":$cpus,"docs":$n,"sec":$sec,""" +
      s""""docs_per_sec":${math.rint(n / sec)}}""")
  }
}
