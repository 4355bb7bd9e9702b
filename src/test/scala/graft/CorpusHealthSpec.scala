package graft

import graft.llm.{Corpus, Multimodal, TextAnalysis}

/** Hand-computable fixtures for the corpus-health wave: the drift
  * ledger's integer ppm arithmetic, collocation lift ordering, and the
  * phash threshold curve's cumulative-vs-at-distance accounting. */
class CorpusHealthSpec extends SparkSpec {

  import spark.implicits._

  test("length drift: integer ppm rates and absolute drift, no floats") {
    // even slice (src0): 3 docs in bucket 0, 1 in bucket 1
    // odd slice (src1): 1 doc in bucket 0, 3 in bucket 2
    val docs = Seq(
      (1L, "t", "en", "src0", 10L), (2L, "t", "en", "src0", 20L),
      (3L, "t", "en", "src0", 30L), (4L, "t", "en", "src0", 150L),
      (5L, "t", "en", "src1", 40L), (6L, "t", "en", "src1", 250L),
      (7L, "t", "en", "src1", 260L), (8L, "t", "en", "src1", 270L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.lengthDrift(docs).orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("cnt_a"),
        r.getAs[Long]("cnt_b"), r.getAs[Long]("ppm_a"),
        r.getAs[Long]("ppm_b"), r.getAs[Long]("drift_ppm")))
    assert(out.toSeq === Seq(
      (0L, 3L, 1L, 750000L, 250000L, 500000L),
      (1L, 1L, 0L, 250000L, 0L, 250000L),
      (2L, 0L, 3L, 0L, 750000L, 750000L)))
  }

  test("length drift: the top bucket is open (caps at maxBucket)") {
    val docs = Seq((1L, "t", "en", "src0", 99999L), (2L, "t", "en", "src1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val buckets = Corpus.lengthDrift(docs).select("bucket")
      .collect().map(_.getLong(0)).sorted
    assert(buckets.toSeq === Seq(0L, 9L))
  }

  test("collocations: lift ranks the exclusive pair above the promiscuous one") {
    // "x y" always adjacent and exclusive -> lift N/(n_x*n_y) maximal;
    // "a b" co-occurs but a and b also appear apart -> lower lift
    val docs = Seq(
      (1L, "x y x y x y x y x y", "en", "s", 1L),
      (2L, "a b c a b c a c b a b a b c c", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.collocations(docs, minPairs = 3L, k = 5)
      .orderBy("rnk").collect()
    val first = out.head
    assert(first.getAs[String]("bigram") === "x y")
    assert(first.getAs[Long]("n_pairs") === 5L)
    // n_x = n_y = 5, N = 25 -> lift = 5*25/(5*5) = 5.0 exactly
    assert(first.getAs[Double]("lift") === 5.0)
    // every later rank has lift <= the head's
    val lifts = out.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("collocations: pairs below minPairs never surface") {
    val docs = Seq((1L, "p q p q r s", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.collocations(docs, minPairs = 2L, k = 10)
      .select("bigram").collect().map(_.getString(0))
    assert(out.toSeq === Seq("p q"))  // "q p"/"q r"/"r s" occur once
  }

  test("phash threshold curve: at-distance counts and cumulative agree with" +
      " the pair set") {
    // hashes: A=0, B=1 bit away from A, C=3 bits from A / 2 from B
    val hashes = Seq(
      (1L, 0L, 0L, 0L),
      (2L, 0L, 0L, 1L),
      (3L, 0L, 0L, 11L))  // 1011: d(A,C)=3, d(B,C)=2
      .toDF("doc_id", "sum64", "phash_hi", "phash_lo")
    val out = Multimodal.phashThresholdCurve(hashes).orderBy("threshold")
      .collect()
      .map(r => (r.getAs[Long]("threshold"), r.getAs[Long]("n_at"),
        r.getAs[Long]("n_pairs_le")))
    assert(out.toSeq === Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)))
  }
}
