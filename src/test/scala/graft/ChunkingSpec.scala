package graft

import org.apache.spark.sql.functions._
import graft.llm.Chunking

/** Sliding-window chunking invariants: full token coverage, overlap
  * geometry, md5 payload parity with a directly-computed slice.
  */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    // 10 tokens — two chunks at size 6 / stride 4 (overlap 2)
    (0L, "a b c d e f g h i j", "s1"),
    // 6 tokens — exactly one full chunk
    (1L, "k l m n o p", "s1"),
    // 3 tokens — one short chunk
    (2L, "q r s", "s2"),
    // empty text — split yields [""], one 1-token chunk
    (3L, "", "s2")
  ).toDF("doc_id", "text", "source")

  test("chunk plan: coverage, stride geometry, short/empty docs") {
    val plan = Chunking.chunkPlan(docs, size = 6, stride = 4)
      .orderBy("doc_id", "chunk_idx").collect()
    val byDoc = plan.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.toSeq).toMap

    // doc 0: starts 0 and 4; last chunk ends exactly at token 10
    val d0 = byDoc(0L)
    assert(d0.map(_.getAs[Long]("start_tok")) === Seq(0L, 4L))
    assert(d0.map(_.getAs[Long]("n_tok")) === Seq(6L, 6L))
    // doc 1: one chunk, exactly the whole doc
    assert(byDoc(1L).map(r =>
      (r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok"))) === Seq((0L, 6L)))
    // doc 2: one short chunk of 3
    assert(byDoc(2L).map(_.getAs[Long]("n_tok")) === Seq(3L))
    // doc 3: split("") == [""] — one 1-token chunk, md5 of empty string
    assert(byDoc(3L).map(_.getAs[Long]("n_tok")) === Seq(1L))
    assert(byDoc(3L).head.getAs[String]("chunk_md5") ===
      "d41d8cd98f00b204e9800998ecf8427e")

    // payload parity: each chunk's md5 equals md5 of the token slice
    val tokens = "a b c d e f g h i j".split(" ", -1)
    for (r <- d0) {
      val s = r.getAs[Long]("start_tok").toInt
      val n = r.getAs[Long]("n_tok").toInt
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(tokens.slice(s, s + n).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("chunk_md5") === expect)
    }
  }

  test("every token is covered and chunk count matches the closed form") {
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val size = 64
    val stride = 48
    val plan = Chunking.chunkPlan(real, size, stride)
    val perDoc = plan.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("start_tok") + col("n_tok")).as("covered_to"),
      min("n_tok").as("min_tok"))
    val toks = real.select(col("doc_id"),
      org.apache.spark.sql.functions.size(split(col("text"), " "))
        .cast("long").as("n_tokens"))
    val joined = perDoc.join(toks, "doc_id").collect()
    for (r <- joined) {
      val n = r.getAs[Long]("n_tokens")
      val expected = 1L + math.ceil(math.max(n - size, 0).toDouble / stride).toLong
      assert(r.getAs[Long]("n_chunks") === expected, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("covered_to") === n, "last chunk must end at the last token")
      assert(r.getAs[Long]("min_tok") >= 1L)
    }
  }

  test("chunk stats reconcile with the exploded plan") {
    val stats = Chunking.chunkStats(docs, size = 6, stride = 4).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chunks"),
         r.getAs[Long]("emitted_tokens"), r.getAs[Double]("mean_fill"))).toMap
    assert(stats("s1") === ((2L, 3L, 18L, 1.0)))
    assert(stats("s2")._2 === 2L) // one short chunk per doc
    assert(stats("s2")._3 === 4L) // 3 + 1 tokens emitted
    assert(stats("s2")._4 < 1.0) // short chunks drag fill below 1
  }
}
