package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity}

/** Pipeline ops without a SQL oracle: verified against their exact
  * baselines (MinHash vs exact Jaccard, LSH-ANN vs brute force) and
  * against analytic expectations of the injected fixtures.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("minhash LSH finds every injected exact and near duplicate") {
    val exact = Dedup.jaccardPairs(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashCandidates(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the injected pairs (id, id+1M) and (id, id+2M) must all be caught
    val injected = exact.filter { case (a, b) =>
      b == a + 1000000L || b == a + 2000000L }
    assert(injected.nonEmpty)
    assert(injected.subsetOf(lsh),
      s"missed: ${injected.diff(lsh)}")
    // LSH emits only verified pairs → must be a subset of the exact set
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
  }

  test("simhash catches exact duplicates at hamming 0") {
    val pairs = Dedup.simhashPairs(spark, dir)
      .as[(Long, Long, Int)].collect()
    val exactDups = pairs.filter { case (a, b, h) =>
      b == a + 1000000L && h == 0 }
    // every exact duplicate has an identical simhash
    assert(exactDups.length === 10)
  }

  test("LSH ANN top-1 matches brute-force within the same bucket") {
    val brute = Similarity.knnBrute(spark, dir, k = 3)
      .select("qid", "vec_id", "sim")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(-_._3)).toMap
    val lsh = Similarity.knnLsh(spark, dir)
      .select("qid", "vec_id", "sim").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (qid, vid, sim) =>
      // the LSH result can never beat the brute-force top-1
      assert(sim <= brute(qid).head._3 + 1e-9)
    }
  }

  test("multimodal decode stub runs per-partition over binary payloads") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, dir))
    val rows = feats.collect()
    assert(rows.length === 50)
    assert(rows.forall(_.n_bytes == 16))
    assert(rows.forall(f => f.brightness >= 0 && f.brightness <= 255))
    // deterministic: same payload → same brightness
    val again = Multimodal.decodeFeatures(
      Multimodal.mediaTable(spark, dir)).collect()
    assert(rows.sortBy(_.media_ref).map(_.brightness).toSeq ===
      again.sortBy(_.media_ref).map(_.brightness).toSeq)
  }

  test("exact dedup keeps the minimum doc_id of each duplicate group") {
    val d = Dedup.exactDuplicates(spark, dir)
      .select("cnt", "keep_id").as[(Long, Long)].collect()
    assert(d.length === 10)
    assert(d.forall { case (cnt, keep) => cnt == 2 && keep < 1000000L })
  }
}
