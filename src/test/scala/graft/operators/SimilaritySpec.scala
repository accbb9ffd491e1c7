package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("cosine: self-similarity is 1, symmetric, in [-1, 1]") {
    val sample = emb.limit(20).cache()
    val self = sample.select(
      Similarity.cosine(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("c"))
      .as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
    val pairs = Similarity.cosinePairs(sample, threshold = -2.0).collect()
    assert(pairs.forall(r => r.getDouble(2) >= -1.0 - 1e-9 &&
      r.getDouble(2) <= 1.0 + 1e-9))
  }

  test("bruteForceTopK returns k ranked neighbors, no self-matches") {
    val q = emb.filter(col("vec_id") < 5)
    val topk = Similarity.bruteForceTopK(emb, q, k = 3).collect()
    assert(topk.length === 15)
    assert(topk.forall(r => r.getAs[Long]("neighbor_id") !=
      r.getAs[Long]("query_id")))
    // ranks are 1..3 per query and scores non-increasing
    topk.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq === Seq(1, 2, 3))
      val scores = sorted.map(_.getAs[Double]("cos_sim"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshTopK results are a subset-ranking consistent with brute force") {
    val q = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Similarity.lshTopK(emb, q, k = 5).collect()
    // every LSH neighbor must be a genuine corpus vector, scored correctly;
    // recall vs exact top-10: each query finds at least one of them
    val byQuery = lsh.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.nonEmpty)
    val recallHits = byQuery.count { case (qid, rows) =>
      rows.exists(r => bf.contains((qid, r.getAs[Long]("neighbor_id"))))
    }
    assert(recallHits >= byQuery.size / 2)
  }

  test("ivfTopK: probed-list ANN with sane recall vs brute force") {
    val q = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.ivfTopK(emb, q, k = 5, nCentroids = 8, nprobe = 3)
      .collect()
    val byQuery = ivf.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size === 10) // every query answered
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to 5))
    }
    val recallHits = byQuery.count { case (qid, rows) =>
      rows.exists(r => bf.contains((qid, r.getAs[Long]("neighbor_id"))))
    }
    assert(recallHits >= 5, s"IVF recall too low: $recallHits/10")
  }

  test("cosinePairsBlocked: every pair exact, decent recall vs O(n2) scan") {
    val exact = Similarity.cosinePairs(emb, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exactPairs = exact.map(t => (t._1, t._2)).toSet
    val blocked = Similarity.cosinePairsBlocked(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // no false positives: blocked pairs are a subset with the SAME score
    val exactScore = exact.map(t => (t._1, t._2) -> t._3).toMap
    blocked.foreach { case (a, b, s) =>
      assert(exactPairs.contains((a, b)), s"($a,$b) not a true pair")
      assert(s === exactScore((a, b)))
    }
    // recall: band blocking keeps the majority of true near-dup pairs
    if (exact.nonEmpty)
      assert(blocked.length.toDouble / exact.length > 0.5,
        s"recall ${blocked.length}/${exact.length}")
  }

  test("dedupEmbeddings keeps one representative per cosine component") {
    val exact = Similarity.dedupEmbeddings(emb, threshold = 0.4,
      blocked = false).select("vec_id").as[Long].collect().toSet
    // survivors + losers partition the corpus; every dropped vector has
    // a surviving near-dup path (its component's min id survives)
    assert(exact.nonEmpty && exact.size < emb.count())
    val pairs = Similarity.cosinePairs(emb, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // directly-linked near-dups never BOTH survive
    pairs.foreach { case (a, b) =>
      assert(!(exact.contains(a) && exact.contains(b)), s"($a,$b)")
    }
    // blocked path: survivors are a superset (LSH may miss pairs, which
    // only UNDER-merges — it never drops a doc without a found dup)
    val blocked = Similarity.dedupEmbeddings(emb, threshold = 0.4)
      .select("vec_id").as[Long].collect().toSet
    assert(exact.subsetOf(blocked))
  }

  test("lsh signatures deterministic across invocations") {
    val s1 = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 3), k = 3)
      .collect().toSeq
    val s2 = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 3), k = 3)
      .collect().toSeq
    assert(s1 === s2)
  }

  test("ivfTopK deterministic across invocations (driver-held Lloyd " +
      "state re-derives the same centroids, assignments and ranking)") {
    val q = emb.filter(col("vec_id") < 5)
    val r1 = Similarity.ivfTopK(emb, q, k = 5, nCentroids = 8, nprobe = 3)
      .collect().toSeq
    val r2 = Similarity.ivfTopK(emb, q, k = 5, nCentroids = 8, nprobe = 3)
      .collect().toSeq
    assert(r1 === r2)
  }

  test("ivfTopK restores the session's AQE setting after the " +
      "scoped-off training loop") {
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 3), k = 3,
      nCentroids = 4, nprobe = 2).collect()
    assert(spark.conf.get("spark.sql.adaptive.enabled") === before)
  }
}
