package graft

import org.apache.spark.sql.functions._

import graft.operators.{Candidates, Clusters, Dedup, TextOps}

/** Incremental near-dup dedup (new batch vs the persisted signature
  * table), the quality-aware keep rule, and the hardened component
  * closure — VERDICT r4 next-round tasks #2/#3/#7 and the ADVICE r4
  * empty-edge fix.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val dir01 = "/root/testdata/sf0.01"

  test("incremental dedup against the persisted index equals the full " +
      "recompute's cross pairs") {
    // full recompute ground truth: exact corpus-wide Jaccard pairs,
    // restricted to (existing doc, increment doc)
    val expected = Dedup.jaccardPairs(spark, dir01)
      .filter(col("id_a") < 1000000L && col("id_b") >= 1000000L)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.size >= 30, s"cross-pair fixtures: ${expected.size}")
    val corpusText = Tables.documents(spark, dir01)
      .select(col("doc_id"), col("text"))
    val path = Dedup.sigTablePath(dir01) + "-spec"
    Dedup.writeSignatureTable(corpusText, path)
    val (out, _) = Dedup.incrementalDedup(spark,
      Dedup.incrementBatch(spark, dir01), corpusText, path)
    val got = out.as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
    Candidates.releaseAll(blocking = true)
  }

  test("bucketed signature index: the stored side is never shuffled — " +
      "only the increment moves") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val corpusText = Tables.documents(spark, dir01)
      .select(col("doc_id"), col("text"))
    val plainPath = Dedup.sigTablePath(dir01) + "-specb-plain"
    Dedup.writeSignatureTable(corpusText, plainPath)
    val idxPath = Dedup.sigTablePath(dir01) + "-specb-idx"
    Dedup.writeSignatureIndex(spark, corpusText, "sig_idx_spec", idxPath)
    val batch = Dedup.incrementBatch(spark, dir01)
    // audit under the shuffle branch: gate off (no broadcast hints),
    // planner broadcasts off (a broadcast of the batch side would make
    // the co-location question moot), AQE off (stable plan walk)
    Candidates.releaseAll(blocking = true)
    sys.props("graft.candidates.gate") = "0"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (out, _) = Dedup.incrementalDedupFrom(spark, batch, corpusText,
        spark.table("sig_idx_spec"))
      val exec = out.queryExecution.executedPlan
      // the index IS read as a bucketed scan, and the path from that
      // scan UP to its band-key join crosses no exchange: the
      // corpus-sized index rows are joined where they were read, at
      // any corpus size (derived id-pair rows shuffling later is fine
      // — those are candidate-bounded). Walk into cached plans: the
      // index join sits under the staged candidate cache.
      def kids(p: SparkPlan): Seq[SparkPlan] = p match {
        case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
        case n => n.children
      }
      def isBucketScan(p: SparkPlan): Boolean = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.bucketedScan
        case _ => false
      }
      def pathToBucketScan(p: SparkPlan): Option[List[SparkPlan]] =
        if (isBucketScan(p)) Some(List(p))
        else kids(p).flatMap(pathToBucketScan(_)).headOption
          .map(p :: _)
      val path = pathToBucketScan(exec)
      assert(path.isDefined, s"no bucketed index scan in:\n$exec")
      val belowJoin = path.get.reverse
        .takeWhile(n => !n.nodeName.toLowerCase.contains("join"))
      assert(belowJoin.length < path.get.length,
        s"bucketed scan never joined:\n$exec")
      belowJoin.foreach { n =>
        assert(!n.isInstanceOf[ShuffleExchangeExec],
          "stored index shuffled before its join; path: " +
            path.get.map(_.nodeName).mkString(" -> "))
      }
      // same answer as the plain-parquet fallback path
      val got = out.as[(Long, Long, Double)].collect().toSet
      Candidates.releaseAll(blocking = true)
      val (plain, _) = Dedup.incrementalDedup(spark, batch, corpusText,
        plainPath)
      assert(got === plain.as[(Long, Long, Double)].collect().toSet)
      assert(got.nonEmpty)
    } finally {
      sys.props.remove("graft.candidates.gate")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS sig_idx_spec")
      Candidates.releaseAll(blocking = true)
    }
  }

  test("the increment path re-shingles only matched candidates, never " +
      "the full corpus") {
    val corpusText = Tables.documents(spark, dir01)
      .select(col("doc_id"), col("text"))
    val nCorpus = corpusText.count()
    val path = Dedup.sigTablePath(dir01) + "-spec2"
    Dedup.writeSignatureTable(corpusText, path)
    val (out, obs) = Dedup.incrementalDedup(spark,
      Dedup.incrementBatch(spark, dir01), corpusText, path)
    val results = out.collect()
    assert(results.nonEmpty)
    // matched existing-corpus candidates: every banding collision's
    // id_a — an UPPER bound on what verify may touch, recomputed
    // independently from the band keys
    val bandKeys = spark.read.parquet(path)
    val batchKeys = Dedup.bandKeysOf(Dedup.incrementBatch(spark, dir01))
      .select(col("doc_id").as("new_id"), col("bh"))
    val nMatched = bandKeys.join(batchKeys, Seq("bh"))
      .select("doc_id").distinct().count()
    val reshingled = obs.get("n_reshingled").asInstanceOf[Long]
    assert(reshingled === nMatched,
      s"re-shingled $reshingled, matched candidates $nMatched")
    assert(reshingled < nCorpus / 2,
      s"re-shingled $reshingled of $nCorpus corpus docs — not incremental")
    Candidates.releaseAll(blocking = true)
  }

  test("signature table schema is the 16-byte (doc_id, bh) band-key " +
      "index: 32 rows per doc") {
    val corpusText = Tables.documents(spark, dir01)
      .select(col("doc_id"), col("text"))
    val path = Dedup.sigTablePath(dir01) + "-spec3"
    Dedup.writeSignatureTable(corpusText, path)
    val stored = spark.read.parquet(path)
    assert(stored.columns.toSeq === Seq("doc_id", "bh"))
    assert(stored.schema.fields.forall(
      _.dataType === org.apache.spark.sql.types.LongType))
    val bandsPerDoc = Dedup.NumHashes / Dedup.BandSize
    assert(stored.count() === corpusText.count() * bandsPerDoc)
  }

  test("incremental embedding-cosine dedup against the persisted sign " +
      "index equals the full recompute's cross pairs, and re-reads only " +
      "matched candidates") {
    import graft.operators.Similarity
    // full-recompute ground truth: exact all-pairs cosine restricted to
    // (existing corpus, increment) cross pairs
    val expected = Similarity.cosineDups(spark, dir01)
      .filter(col("id_a") < 100000L && col("id_b") >= 100000L)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.size >= 10, s"cross-pair fixtures: ${expected.size}")
    val corpus = Tables.embeddings(spark, dir01).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val nCorpus = corpus.count()
    val path = Dedup.sigTablePath(dir01) + "-emb-spec"
    Similarity.writeSignTable(corpus, path)
    val (out, obs) = Similarity.incrementalCosineDups(spark,
      Similarity.embIncrementBatch(spark, dir01), corpus, path)
    val got = out.as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
    // the observation proves the corpus embedding re-read was candidate-
    // bounded: matched candidates recomputed independently from the keys
    val stored = spark.read.parquet(path)
    val batchKeys = Similarity.embIncrementBatch(spark, dir01)
      .select(col("vec_id").as("new_id"),
        posexplode(Similarity.dupSignatures(col("e")))
          .as(Seq("tbl", "sig")))
    val probed = batchKeys.select(col("new_id"), col("tbl"),
      explode(array((0 +: (0 until Similarity.DupBits).map(1 << _)).map(
        m => col("sig").bitwiseXOR(lit(m))): _*)).as("sig"))
    val nMatched = stored.join(probed, Seq("tbl", "sig"))
      .select("vec_id").distinct().count()
    val reread = obs.get("n_reread").asInstanceOf[Long]
    assert(reread === nMatched,
      s"re-read $reread, matched candidates $nMatched")
    assert(reread < nCorpus / 2,
      s"re-read $reread of $nCorpus corpus vectors — not incremental")
    Candidates.releaseAll(blocking = true)
  }

  test("appending a batch's signatures makes the NEXT increment dedup " +
      "against corpus ∪ batch without re-signing the corpus") {
    // corpus: 5 disjoint docs; batch1: near-dup of doc 1; batch2:
    // near-dup of both doc 1 and batch1's doc
    def words(p: String) = (1 to 30).map(i => s"$p$i").mkString(" ")
    val corpus = (1L to 5L).map(i => (i, words(s"c${i}w")))
      .toDF("doc_id", "text")
    val batch1 = Seq((101L, words("c1w") + " zzz zzz"))
      .toDF("doc_id", "text")
    val batch2 = Seq((201L, words("c1w") + " yyy yyy"))
      .toDF("doc_id", "text")
    val path = Dedup.sigTablePath("append-spec") + "-append"
    Dedup.writeSignatureTable(corpus, path)
    val (out1, _) = Dedup.incrementalDedup(spark, batch1, corpus, path)
    assert(out1.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      === Set((1L, 101L)))
    Dedup.appendSignatures(batch1, path)
    // the NEXT increment sees corpus ∪ batch1 through the index alone;
    // its text store is corpus ∪ batch1 (the sink batch1 landed in)
    val (out2, _) = Dedup.incrementalDedup(spark, batch2,
      corpus.unionAll(batch1), path)
    assert(out2.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      === Set((1L, 201L), (101L, 201L)))
    Candidates.releaseAll(blocking = true)
  }

  test("the append loop's batch-B dedup re-shingles only candidates " +
      "matched against corpus ∪ A — day-2 work is batch-bounded") {
    val docsT = Tables.documents(spark, dir01)
    val corpusText = docsT.select(col("doc_id"), col("text"))
    val path = Dedup.sigTablePath(dir01) + "-loop-spec"
    Dedup.writeSignatureTable(corpusText, path)
    val a = graft.data.Interleaved.spread(
      Dedup.loopBatchA(spark, dir01), docsT)
    // day 1: dedup A, then fold A's keys into the index (batch-sized)
    Dedup.incrementalDedup(spark, a, corpusText, path)._1.count()
    Candidates.releaseAll(blocking = true)
    Dedup.appendSignatures(a, path)
    val unionText = corpusText.unionAll(Dedup.loopBatchA(spark, dir01))
    val nUnion = unionText.count()
    val b = graft.data.Interleaved.spread(
      Dedup.loopBatchB(spark, dir01), docsT)
    val (out, obs) = Dedup.incrementalDedup(spark, b, unionText, path)
    val rows = out.as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // the pairs against batch A itself exist — the append was
    // load-bearing, not decorative
    assert(rows.exists(r => r._1 >= 2000000L && r._1 < 3000000L),
      "no B-vs-A pairs: the appended keys were not consulted")
    // independent candidate bound recomputed from the stored keys
    val batchKeys = Dedup.bandKeysOf(b)
      .select(col("doc_id").as("new_id"), col("bh"))
    val nMatched = spark.read.parquet(path).join(batchKeys, Seq("bh"))
      .select("doc_id").distinct().count()
    val reshingled = obs.get("n_reshingled").asInstanceOf[Long]
    assert(reshingled === nMatched,
      s"re-shingled $reshingled, matched candidates $nMatched")
    assert(reshingled < nUnion / 2,
      s"re-shingled $reshingled of $nUnion corpus∪A docs — not batch-bounded")
    Candidates.releaseAll(blocking = true)
  }

  test("connected components: empty edge set returns an empty frame " +
      "(ADVICE r4 — no NPE on the null convergence signal)") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val cc = Clusters.connectedComponents(empty)
    assert(cc.columns.toSeq === Seq("doc_id", "cluster_id"))
    assert(cc.count() === 0L)
  }

  test("connected components: pointer jumping converges on a depth-200 " +
      "path graph in O(log d) rounds; the MaxRounds backstop raises " +
      "cleanly when forced") {
    // adversarial long chain: 0-1, 1-2, ..., 199-200. Plain min-label
    // propagation needs 200 rounds — pointer jumping must land it
    // within the default MaxRounds=50 (≈ 2 + log2(200) ≈ 10)
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Clusters.connectedComponents(chain)
      .as[(Long, Long)].collect()
    assert(cc.length === 201 && cc.forall(_._2 == 0L))
    // backstop: an under-provisioned round budget raises rather than
    // returning a half-converged labelling
    val e = intercept[IllegalArgumentException] {
      Clusters.connectedComponents(chain, maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("quality-aware keep rule: per cluster exactly one keep — the " +
      "max-quality member, ties to the smaller doc_id") {
    val got = Clusters.keepQuality(spark, dir01)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(got.nonEmpty)
    // independent ground truth: union-find over the same pair edges +
    // the quality composite, argmax driver-side
    val edges = Dedup.minhashCandidates(spark, dir01)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val quality = TextOps.qualityScoresOf(Dedup.corpus(spark, dir01))
      .as[(Long, Double)].collect().toMap
    val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .groupBy(find)
    val expectedKeep = members.map { case (cid, ms) =>
      cid -> ms.maxBy(m => (quality(m), -m))
    }
    // cluster ids and membership agree; keep is the quality argmax
    assert(got.map(r => r._2 -> r._1).toMap ===
      members.toSeq.flatMap { case (cid, ms) =>
        ms.toSeq.map(_ -> cid) }.toMap)
    got.groupBy(_._1).foreach { case (cid, ms) =>
      assert(ms.count(_._4) === 1, s"cluster $cid keep count")
      assert(ms.filter(_._4).head._2 === expectedKeep(cid),
        s"cluster $cid keep != quality argmax")
    }
    // every member carries the same score the quality operator computes
    got.foreach(r => assert(r._3 === quality(r._2), s"doc ${r._2}"))
    Candidates.releaseAll(blocking = true)
  }

  test("quality keep rule prefers a higher-quality non-minimum member " +
      "(not min-id dedup in disguise)") {
    // chain 1-2-3 where the middle doc scores highest, plus a tied pair
    // where the smaller id must win the tie-break
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val quality = Seq((1L, 0.3), (2L, 1.0), (3L, 0.7),
      (10L, 0.7), (11L, 0.7)).toDF("doc_id", "quality_score")
    val got = Clusters.keepBestQuality(edges, quality)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._2 -> (r._1, r._4)).toMap
    assert(got(1L) === (1L, false) && got(2L) === (1L, true)
      && got(3L) === (1L, false), "argmax must beat min-id")
    assert(got(10L) === (10L, true) && got(11L) === (10L, false),
      "ties break to the smaller doc_id")
  }

  test("clusters from the STORED pair-edge table equal the recomputed " +
      "pipeline, and the stored path never re-reads the corpus") {
    val path = Dedup.sigTablePath(dir01) + "-edges-spec"
    Clusters.writePairEdges(spark, dir01, path)
    Candidates.releaseAll(blocking = true)
    val edges = spark.read.parquet(path)
    // the stored path's only input is the edge parquet (the closure
    // checkpoints internally, so inspect the INPUT plan): no documents
    // scan, no shingling — the MinHash pipeline is entirely absent
    val scans = edges.inputFiles
    assert(scans.nonEmpty && scans.forall(_.contains("edges-spec")),
      scans.mkString(", "))
    val got = Clusters.dupClustersFrom(edges)
      .as[(Long, Long, Boolean)].collect().toSeq
    val expected = Clusters.dupClusters(spark, dir01)
      .as[(Long, Long, Boolean)].collect().toSeq
    Candidates.releaseAll(blocking = true)
    assert(got == expected && got.nonEmpty)
  }
}
