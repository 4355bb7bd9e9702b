package graft

import graft.llm.{Corpus, Multimodal, TextAnalysis}

/** Hand-computable fixtures for the corpus-health wave: the drift
  * ledger's integer ppm arithmetic, collocation lift ordering, and the
  * phash threshold curve's cumulative-vs-at-distance accounting. */
class CorpusHealthSpec extends SparkSpec {

  import spark.implicits._

  test("bucket-pruned admission == unpruned admission (bucketed index layout)") {
    // a mixed corpus: long clean docs, a short doc below shingle
    // resolution, PII carriers, and exact near-dups of corpus members
    val mk = (id: Long, text: String) => (id, text)
    val corpus = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog again and again"),
      mk(3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(5L, "call 555-1234 or mail bob@example.com for a quote today ok"),
      mk(7L, "totally unique corpus sentence about distributed query engines"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      mk(10L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
      mk(20L, "a brand new arrival document with its own words entirely"),
      mk(30L, "hi"), // below shingle resolution — dropped by both paths
      mk(40L, "ping 10.0.0.1 then mail eve@example.org about 555-9876 now"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_bucketed").toString
    Corpus.admissionIndexBucketed(corpus, numBuckets = 512)
      .write.mode("overwrite").partitionBy("sig_bucket").parquet(dir)
    val index = spark.read.parquet(dir)
    val pruned = Corpus.admissionGatePruned(arrivals, index)
      .orderBy("doc_id").collect().toSeq
    val full = Corpus.admissionGateWithIndex(arrivals, index)
      .orderBy("doc_id").collect().toSeq
    assert(pruned === full,
      "partition pruning must never change a verdict (matching rows share buckets)")
    val byId = pruned.map(r => r.getLong(0) -> r).toMap
    assert(!byId(10L).getBoolean(3) && byId(10L).getLong(4) === 1L,
      "the exact dup must hit the index (dup_of = lowest corpus owner)")
    assert(byId(20L).getBoolean(3), "the novel doc passes the dedup gate")
    assert(!byId.contains(30L), "below shingle resolution drops (both paths)")
    assert(!byId(40L).getBoolean(2), "PII carrier fails pass_pii")
  }

  test("bucket-pruned admission: an all-short-docs batch yields an empty " +
      "verdict set (empty bucket INSET, no error)") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // every arrival below the shingle resolution -> zero signatures ->
    // zero buckets collected -> the isin() filter is vacuously false and
    // the gate emits nothing (matching the unpruned short-doc drop)
    val arrivals = Seq((10L, "hi"), (20L, "x")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_empty").toString
    Corpus.admissionIndexBucketed(corpus, numBuckets = 512)
      .write.mode("overwrite").partitionBy("sig_bucket").parquet(dir)
    val index = spark.read.parquet(dir)
    assert(Corpus.admissionGatePruned(arrivals, index).count() === 0L)
    assert(Corpus.admissionGateWithIndex(arrivals, index).count() === 0L)
  }

  test("pruned admission folds with the index's RECORDED bucket count — a " +
      "drifted numBuckets argument cannot prune away matching partitions") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
      (20L, "a brand new arrival document with its own words entirely"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_recorded").toString
    // write-time fold: 64 buckets, recorded in the sidecar
    Corpus.writeAdmissionIndex(corpus, dir, numBuckets = 64)
    val index = Corpus.readAdmissionIndex(spark, dir)
    assert(Corpus.recordedNumBuckets(index) === Some(64))
    // caller passes the DEFAULT (512 ≠ 64): before the recorded count, this
    // silently admitted true duplicates (batch buckets folded mod 512 never
    // matched partitions folded mod 64); now the recorded fold wins
    val pruned = Corpus.admissionGatePruned(arrivals, index, numBuckets = 512)
      .orderBy("doc_id").collect().toSeq
    val full = Corpus.admissionGateWithIndex(arrivals, index)
      .orderBy("doc_id").collect().toSeq
    assert(pruned === full, "recorded-count prune must match the unpruned gate")
    val dup = pruned.find(_.getLong(0) == 10L).get
    assert(!dup.getBoolean(3) && dup.getLong(4) === 1L,
      "the true duplicate must still be caught under the mismatched argument")
    // a metadata-less frame (raw read, pre-round-15 layout) falls back to
    // the parameter — parity holds when the caller's count matches
    val raw = spark.read.parquet(dir)
    assert(Corpus.recordedNumBuckets(raw) === None)
    assert(Corpus.admissionGatePruned(arrivals, raw, numBuckets = 64)
      .orderBy("doc_id").collect().toSeq === full)
  }

  test("metadata-less index with a WRONG fallback fails loudly instead of " +
      "silently admitting duplicates (both pruned gates)") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_badfb").toString
    Corpus.writeAdmissionIndex(corpus, dir, numBuckets = 64)
    // lose the sidecar (pre-round-15 layout / failed write window): the
    // raw read has no recorded count, and the stale 512 default disagrees
    // with the write-time 64-fold — before round 16 this pruned away the
    // matching partitions and admitted the true duplicate silently
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, Corpus.NumBucketsSidecar))
    val raw = spark.read.parquet(dir)
    assert(Corpus.recordedNumBuckets(raw) === None)
    val e1 = intercept[IllegalStateException] {
      Corpus.admissionGatePruned(arrivals, raw, numBuckets = 512).collect()
    }
    assert(e1.getMessage.contains("metadata-less bucketed admission index"))
    val e2 = intercept[IllegalStateException] {
      graft.llm.Dedup.ingestGateWithIndex(arrivals, raw, numBuckets = 512)
        .collect()
    }
    assert(e2.getMessage.contains("metadata-less bucketed admission index"))
    // the CORRECT fallback validates against the sample and prunes soundly
    val ok = Corpus.admissionGatePruned(arrivals, raw, numBuckets = 64)
      .collect().head
    assert(!ok.getBoolean(3) && ok.getLong(4) === 1L,
      "validated fallback must still catch the true duplicate")
  }

  test("corrupt bucket-count sidecar fails with a clear contract error, " +
      "never a silent fallback") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_corrupt").toString
    Corpus.writeAdmissionIndex(corpus, dir, numBuckets = 16)
    for (garbage <- Seq("", "not-a-number", "-4")) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, Corpus.NumBucketsSidecar),
        garbage.getBytes("UTF-8"))
      val e = intercept[IllegalStateException] {
        Corpus.readAdmissionIndex(spark, dir)
      }
      assert(e.getMessage.contains(Corpus.NumBucketsSidecar),
        s"error must name the sidecar (garbage='$garbage'): ${e.getMessage}")
    }
  }

  test("auto-sized index build: one corpus scan, fold sized from INDEX " +
      "rows, count recorded and restored on read") {
    // 10 docs, two of them exact duplicates of others: the index collapses
    // duplicate signatures, so its row count (8) is what sizes the fold
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta", "eta theta iota kappa lambda mu",
      "nu xi omicron pi rho sigma", "tau upsilon phi chi psi omega",
      "one two three four five six", "seven eight nine ten eleven twelve",
      "red orange yellow green blue indigo", "violet black white gray pink teal")
    val corpus = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((100L, texts(0)), (101L, texts(1)))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_auto").toString
    val nb = Corpus.writeAdmissionIndexAutoSized(corpus, dir)
    val indexRows = Corpus.admissionIndex(corpus).count()
    assert(indexRows === 8L, "duplicate signatures must collapse (10 -> 8)")
    // the contract: fold sized from INDEX rows (at this scale both counts
    // clamp to the same bucket floor — the arithmetic boundary is pinned
    // by the sizeBuckets assertions below)
    assert(nb === Corpus.sizeBuckets(indexRows))
    assert(Corpus.sizeBuckets(2048L * 10) === 10 &&
      Corpus.sizeBuckets(2048L * 10 + 2048) === 11,
      "sizeBuckets is rows/2048 between the clamps — collapsing duplicate " +
        "signatures changes the fold once the corpus crosses bucket widths")
    val index = Corpus.readAdmissionIndex(spark, dir)
    assert(Corpus.recordedNumBuckets(index) === Some(nb))
    // and the duplicate owners are the LOWEST doc ids, as in the two-scan form
    val dupOf = Corpus.admissionGatePruned(
      Seq((200L, texts(0))).toDF("doc_id", "text"), index)
      .collect().head
    assert(!dupOf.getBoolean(3) && dupOf.getLong(4) === 0L)
  }

  test("indexed ingest gate == unindexed ingest gate (bucket-pruned " +
      "static side, identical verdicts)") {
    val corpus = Seq(
      (1L, "spark filter join table scan window batch merge"),
      (5L, "completely different words entirely other content here"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      (10L, "spark filter join table scan window batch merge"), // dup of 1
      (11L, "fresh unseen tokens nothing like the corpus rows"),
      (12L, "hi")) // below shingle resolution — dropped by both paths
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ingest_idx").toString
    Corpus.writeAdmissionIndex(corpus, dir, numBuckets = 32)
    val index = Corpus.readAdmissionIndex(spark, dir)
    val indexed = graft.llm.Dedup.ingestGateWithIndex(arrivals, index)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
    val plain = graft.llm.Dedup.ingestGate(arrivals, corpus)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
    assert(indexed === plain, "identical output contract, short-doc drop included")
    assert(indexed === Seq((10L, true, 1L), (11L, false, -1L)))
  }

  test("incremental admission-index update == full rebuild; min-owner " +
      "merges both directions; only affected partitions rewritten") {
    import org.apache.spark.sql.functions.col
    val base = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again"),
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9L, "totally unique corpus sentence about distributed query engines"))
      .toDF("doc_id", "text")
    val incr = Seq(
      // same signature as 5 with a LOWER id: the merged owner must flip to 2
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      // same signature as 7 with a higher id: the owner must stay 7
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // a brand-new signature: inserted
      (13L, "a brand new arrival document with its own words entirely"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_incr").toString
    Corpus.writeAdmissionIndex(base, dir, numBuckets = 32)
    // partition file state before the update, per sig_bucket directory
    def fileState(): Map[String, Seq[(String, Long)]] = {
      val root = new java.io.File(dir)
      root.listFiles.filter(f => f.isDirectory && f.getName.startsWith("sig_bucket="))
        .map(d => d.getName ->
          d.listFiles.filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified)).toSeq.sortBy(_._1))
        .toMap
    }
    val before = fileState()
    val freshBuckets = Corpus.admissionIndex(incr)
      .select(Corpus.sigBucket(32).as("b")).distinct()
      .collect().map(r => s"sig_bucket=${r.getInt(0)}").toSet
    Corpus.updateAdmissionIndex(spark, dir, incr)
    // rows == a full rebuild over base ∪ incr (owners merged min-doc)
    val cols = (0 until 8).map(i => col(s"m$i")) :+ col("dup_of")
    val updated = Corpus.readAdmissionIndex(spark, dir)
      .select(cols: _*).collect()
      .map(r => (0 until 9).map(r.getLong)).toSet
    val rebuilt = Corpus.admissionIndex(base.unionByName(incr))
      .select(cols: _*).collect()
      .map(r => (0 until 9).map(r.getLong)).toSet
    assert(updated === rebuilt,
      "incremental maintenance must be row-identical to a full rebuild")
    assert(updated.map(_.last) === Set(2L, 7L, 9L, 13L),
      "owner 5 -> 2 (lower new id wins), 7 stays, 9 untouched, 13 inserted")
    // partitions NOT hashed into by the increment are byte-untouched
    val after = fileState()
    for ((bucketDir, files) <- before if !freshBuckets.contains(bucketDir))
      assert(after(bucketDir) === files,
        s"unaffected partition $bucketDir must not be rewritten")
    // and at least one affected partition was actually rewritten
    assert(freshBuckets.exists(b => before.get(b) != after.get(b)),
      "the increment's partitions must change")
    // recorded fold unchanged: the pruned gate still reads it
    assert(Corpus.recordedNumBuckets(Corpus.readAdmissionIndex(spark, dir))
      === Some(32))
  }

  test("incremental update REFUSES an index without a recorded fold " +
      "(merging with a guessed fold would split signatures across partitions)") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_incr_bad").toString
    Corpus.writeAdmissionIndex(corpus, dir, numBuckets = 16)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, Corpus.NumBucketsSidecar))
    val e = intercept[IllegalStateException] {
      Corpus.updateAdmissionIndex(spark, dir,
        Seq((2L, "one two three four five six")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("recorded bucket count"))
  }

  test("sizeBuckets clamp is scale-aware; needsRebucket fires past 2x " +
      "target density and never at the ceiling") {
    assert(Corpus.sizeBuckets(2048L * 1000) === 1000,
      "the old 512 clamp froze per-bucket growth at ~1M signatures")
    assert(Corpus.sizeBuckets(2048L * 100000) === Corpus.MaxBucketsDefault)
    assert(Corpus.sizeBuckets(2048L * 100000, maxBuckets = 1024) === 1024)
    assert(Corpus.sizeBuckets(1L) === 8)
    assert(!Corpus.needsRebucket(2048L * 512, 512), "at target: healthy")
    assert(!Corpus.needsRebucket(2048L * 512 * 2, 512), "2x exactly: boundary")
    assert(Corpus.needsRebucket(2048L * 512 * 2 + 512, 512), "past 2x: split")
    assert(!Corpus.needsRebucket(Long.MaxValue / 4, Corpus.MaxBucketsDefault),
      "at the file-count ceiling there is no count left to grow into — " +
        "the remedy is sharding the index, not re-bucketing")
  }

  test("incremental growth steady state: every increment converges to the " +
      "rebuild; the frozen fold grows the gate's read; re-bucket restores it") {
    import org.apache.spark.sql.functions.{col, size, split}
    def mkDocs(ids: Range) = ids.map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_growth").toString
    Corpus.writeAdmissionIndex(mkDocs(0 until 30), dir, numBuckets = 8)
    // fixed probe batch, never ingested: its gate read against the grown
    // index is the steady-state cost the round-16 verdict asked to measure
    val batch = mkDocs(10000 until 10003)
    def gateRead(): (Long, Long) = {
      val index = Corpus.readAdmissionIndex(spark, dir)
      val nb = Corpus.recordedNumBuckets(index).get
      val buckets = graft.llm.Dedup.withProjectedSignatures(
          batch.filter(size(split(col("text"), " ")) >= 2))
        .select(Corpus.sigBucket(nb).as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq
      (index.filter(col("sig_bucket").isin(buckets: _*)).count(), index.count())
    }
    val sigCols = (0 until 8).map(i => col(s"m$i")) :+ col("dup_of")
    def indexRows(): Set[Seq[Long]] =
      Corpus.readAdmissionIndex(spark, dir).select(sigCols: _*)
        .collect().map(r => (0 until 9).map(r.getLong)).toSet
    var upto = 30
    val reads = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (k <- 1 to 10) {
      Corpus.updateAdmissionIndex(spark, dir, mkDocs(upto until upto + 30))
      upto += 30
      // EVERY intermediate state must equal the rebuild over the
      // cumulative corpus, not just the final one
      val rebuilt = Corpus.admissionIndex(mkDocs(0 until upto))
        .select(sigCols: _*).collect().map(r => (0 until 9).map(r.getLong)).toSet
      assert(indexRows() === rebuilt, s"diverged from rebuild after increment $k")
      val (rd, tot) = gateRead()
      reads += ((k, rd, tot))
    }
    info(s"gate read (rows, of total) per increment: ${reads.mkString(", ")}")
    // the frozen-fold property the decade rehearsals never see (they
    // rebuild per scale): the SAME probe batch reads more index rows as
    // the corpus grows through increments, because per-bucket density
    // grows while the fold stays the base-build 8
    assert(reads.last._3 > reads.head._3 * 5, "corpus grew through increments")
    assert(reads.last._2 > reads.head._2,
      s"fixed batch's gate read must grow under the frozen fold: $reads")
    // gate verdicts before the re-bucket, for the parity check below
    val before = Corpus.admissionGatePruned(
      batch, Corpus.readAdmissionIndex(spark, dir))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // the split-maintenance op: re-fold the grown index once
    val nb2 = Corpus.rebucketAdmissionIndex(spark, dir, Some(64))
    assert(nb2 === 64)
    val reloaded = Corpus.readAdmissionIndex(spark, dir)
    assert(Corpus.recordedNumBuckets(reloaded) === Some(64),
      "the sidecar must record the NEW fold after the swap")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + "__rebucket_tmp")),
      "staging dir must be gone after the swap")
    // rows untouched by the re-fold: still identical to the rebuild
    val rebuilt = Corpus.admissionIndex(mkDocs(0 until upto))
      .select(sigCols: _*).collect().map(r => (0 until 9).map(r.getLong)).toSet
    assert(indexRows() === rebuilt, "re-bucket must not change index rows")
    // identical verdicts, smaller read: density dropped 8x
    val after = Corpus.admissionGatePruned(batch, reloaded)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(after === before, "re-bucket must not change any gate verdict")
    val (rdAfter, totAfter) = gateRead()
    info(s"gate read after re-bucket: $rdAfter of $totAfter")
    assert(totAfter === reads.last._3)
    assert(rdAfter < reads.last._2,
      s"re-bucket must shrink the fixed batch's read (${reads.last._2} -> $rdAfter)")
  }

  test("partial-update crash window: retrying the SAME increment converges " +
      "to the rebuild (the min-fold merge is idempotent)") {
    import org.apache.spark.sql.functions.{col, min}
    val base = (10 until 50).map(i =>
      (i.toLong, s"b${i}q b${i}r b${i}s b${i}t b${i}u")).toDF("doc_id", "text")
    // the increment: new signatures, plus a LOWER-id duplicate of base doc
    // 10 (owner must flip) — the merge's both directions cross the crash
    val incr = (100 until 130).map(i =>
        (i.toLong, s"n${i}q n${i}r n${i}s n${i}t n${i}u"))
      .toDF("doc_id", "text")
      .unionByName(Seq((2L, "b10q b10r b10s b10t b10u")).toDF("doc_id", "text"))
    val dir = java.nio.file.Files.createTempDirectory("adm_crash").toString
    val nb = 8
    Corpus.writeAdmissionIndex(base, dir, numBuckets = nb)
    val sigCols = (0 until 8).map(i => s"m$i")
    val outCols = (0 until 8).map(i => col(s"m$i")) :+ col("dup_of")
    def rows(): Set[Seq[Long]] =
      Corpus.readAdmissionIndex(spark, dir).select(outCols: _*)
        .collect().map(r => (0 until 9).map(r.getLong)).toSet
    val rebuilt = Corpus.admissionIndex(base.unionByName(incr))
      .select(outCols: _*).collect().map(r => (0 until 9).map(r.getLong)).toSet
    // simulate the exact crash window of the non-atomic multi-partition
    // overwrite: the increment's merge computed in full, but only a STRICT
    // SUBSET of the affected partitions committed before the failure
    val index = Corpus.readAdmissionIndex(spark, dir)
    val fresh = Corpus.admissionIndex(incr)
      .withColumn("sig_bucket", Corpus.sigBucket(nb))
    val buckets = fresh.select("sig_bucket").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    assert(buckets.size >= 2,
      "drill needs >= 2 affected partitions for a real crash window")
    val committed = buckets.take(buckets.size / 2)
    val partial = index.filter(col("sig_bucket").isin(buckets: _*))
      .unionByName(fresh)
      .groupBy((sigCols :+ "sig_bucket").map(col): _*)
      .agg(min("dup_of").as("dup_of"))
      .select(sigCols.map(col) :+ col("dup_of") :+ col("sig_bucket"): _*)
      .filter(col("sig_bucket").isin(committed: _*))
      .localCheckpoint(true)
    partial.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("sig_bucket").parquet(dir)
    // the crash is real: the mixed old/new index diverges from the rebuild
    assert(rows() !== rebuilt, "partial commit must leave a divergent index")
    // the documented remedy: RE-RUN THE SAME increment
    Corpus.updateAdmissionIndex(spark, dir, incr)
    assert(rows() === rebuilt,
      "retry over the partially-updated index must converge to the rebuild")
  }

  test("concurrent increments are UNSUPPORTED: the documented last-writer-" +
      "wins overwrite drops the first writer's signatures") {
    import org.apache.spark.sql.functions.{col, min}
    val nb = 8
    // find two pool docs with DIFFERENT signatures in the SAME bucket —
    // the overlap that makes two concurrent writers collide
    val pool = (200 until 260).map(i =>
      (i.toLong, s"c${i}q c${i}r c${i}s c${i}t c${i}u")).toDF("doc_id", "text")
    val byBucket = Corpus.admissionIndex(pool)
      .withColumn("b", Corpus.sigBucket(nb))
      .select(col("dup_of"), col("b")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._2)
      .filter(_._2.length >= 2)
    assert(byBucket.nonEmpty, "pool must yield a shared bucket")
    val Seq(idA, idB) = byBucket.head._2.take(2).map(_._1).toSeq
    val base = (10 until 30).map(i =>
      (i.toLong, s"z${i}q z${i}r z${i}s z${i}t z${i}u")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_conc").toString
    Corpus.writeAdmissionIndex(base, dir, numBuckets = nb)
    val sigCols = (0 until 8).map(i => s"m$i")
    val docA = pool.filter(col("doc_id") === idA)
    val docB = pool.filter(col("doc_id") === idB)
    // writer B reads the PRE-A index and materializes its merge (the
    // concurrent interleaving), eagerly — exactly what a second session's
    // in-flight job holds while A commits
    val freshB = Corpus.admissionIndex(docB)
      .withColumn("sig_bucket", Corpus.sigBucket(nb))
    val bucketsB = freshB.select("sig_bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val mergedB = Corpus.readAdmissionIndex(spark, dir)
      .filter(col("sig_bucket").isin(bucketsB: _*)).unionByName(freshB)
      .groupBy((sigCols :+ "sig_bucket").map(col): _*)
      .agg(min("dup_of").as("dup_of"))
      .select(sigCols.map(col) :+ col("dup_of") :+ col("sig_bucket"): _*)
      .localCheckpoint(true)
    // writer A commits first (the real op); writer B overwrites after
    Corpus.updateAdmissionIndex(spark, dir, docA)
    mergedB.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("sig_bucket").parquet(dir)
    val outCols = (0 until 8).map(i => col(s"m$i")) :+ col("dup_of")
    val got = Corpus.readAdmissionIndex(spark, dir).select(outCols: _*)
      .collect().map(r => (0 until 9).map(r.getLong)).toSet
    val rebuilt = Corpus
      .admissionIndex(base.unionByName(docA).unionByName(docB))
      .select(outCols: _*).collect().map(r => (0 until 9).map(r.getLong)).toSet
    val sigA = Corpus.admissionIndex(docA).select(outCols: _*)
      .collect().map(r => (0 until 9).map(r.getLong)).toSet
    assert(got !== rebuilt,
      "concurrent writers must diverge from the rebuild — if this starts " +
        "CONVERGING, the scaladoc's single-writer refusal is stale")
    assert(sigA.forall(s => !got.contains(s)),
      "B's shared-bucket overwrite must drop A's signatures — the " +
        "documented last-writer-wins hazard")
  }

  test("delta segments: two appenders RACING on threads publish without " +
      "coordination; folded read == rebuild; compaction absorbs both") {
    import org.apache.spark.sql.functions.col
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val base = (10 until 40).map(i =>
      (i.toLong, s"e${i}q e${i}r e${i}s e${i}t e${i}u")).toDF("doc_id", "text")
    // writer A: fresh signatures + a LOWER-id duplicate of base doc 10
    // (owner must flip through the fold); writer B: fresh signatures + a
    // duplicate of one of A's docs (a CROSS-SEGMENT duplicate — the min
    // owner must fold across segments, not just segment-vs-base)
    val incrA = (100 until 120).map(i =>
        (i.toLong, s"f${i}q f${i}r f${i}s f${i}t f${i}u"))
      .toDF("doc_id", "text")
      .unionByName(Seq((2L, "e10q e10r e10s e10t e10u")).toDF("doc_id", "text"))
    val incrB = (200 until 220).map(i =>
        (i.toLong, s"g${i}q g${i}r g${i}s g${i}t g${i}u"))
      .toDF("doc_id", "text")
      .unionByName(
        Seq((250L, "f100q f100r f100s f100t f100u")).toDF("doc_id", "text"))
    val dir = java.nio.file.Files.createTempDirectory("adm_delta").toString
    Corpus.writeAdmissionIndex(base, dir, numBuckets = 8)
    // the race is real: both appenders run at once on separate threads —
    // each owns its own sibling directory, so neither can observe or
    // clobber the other (the guarantee updateAdmissionIndex cannot make)
    val published = Await.result(Future.sequence(Seq(
      Future(Corpus.appendAdmissionDelta(spark, dir, incrA)),
      Future(Corpus.appendAdmissionDelta(spark, dir, incrB)))), 5.minutes)
    assert(Corpus.pendingAdmissionDeltas(dir).toSet === published.toSet)
    val outCols = (0 until 8).map(i => col(s"m$i")) :+ col("dup_of")
    def setOf(df: org.apache.spark.sql.DataFrame): Set[Seq[Long]] =
      df.select(outCols: _*).collect().map(r => (0 until 9).map(r.getLong)).toSet
    val rebuilt = setOf(Corpus.admissionIndex(
      base.unionByName(incrA).unionByName(incrB)))
    // the folded read sees the full corpus BEFORE any compaction, and the
    // cross-segment duplicate's owner is the global min (A's doc 100)
    assert(setOf(Corpus.readAdmissionIndexFolded(spark, dir)) === rebuilt,
      "base ∪ segments min-folded must equal the rebuild")
    // the base itself is untouched by appends — segments are siblings
    assert(setOf(Corpus.readAdmissionIndex(spark, dir)) ===
      setOf(Corpus.admissionIndex(base)))
    assert(Corpus.compactAdmissionIndex(spark, dir) === 2)
    assert(Corpus.pendingAdmissionDeltas(dir).isEmpty,
      "absorbed segments must be deleted")
    assert(setOf(Corpus.readAdmissionIndex(spark, dir)) === rebuilt,
      "after compaction the plain fast-path read must equal the rebuild")
    assert(Corpus.compactAdmissionIndex(spark, dir) === 0)
  }

  test("delta segments: pruned gate over pending deltas == rebuilt-index " +
      "gate; .tmp staging invisible; double-absorption idempotent; " +
      "re-bucket refuses while deltas pend") {
    import org.apache.spark.sql.functions.col
    val base = (10 until 40).map(i =>
      (i.toLong, s"h${i}q h${i}r h${i}s h${i}t h${i}u")).toDF("doc_id", "text")
    val incrA = (100 until 115).map(i =>
      (i.toLong, s"j${i}q j${i}r j${i}s j${i}t j${i}u")).toDF("doc_id", "text")
    val incrB = (200 until 215).map(i =>
      (i.toLong, s"k${i}q k${i}r k${i}s k${i}t k${i}u")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_dgate").toString
    Corpus.writeAdmissionIndex(base, dir, numBuckets = 8)
    Corpus.appendAdmissionDelta(spark, dir, incrA)
    Corpus.appendAdmissionDelta(spark, dir, incrB)
    // a crashed (never-published) append: its .tmp staging directory must
    // be invisible to the pending list, the folded read, and compaction
    val tmp = java.nio.file.Paths.get(dir + "__delta_deadbeef.tmp")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("junk"), Array[Byte](1, 2, 3))
    assert(Corpus.pendingAdmissionDeltas(dir).size === 2,
      ".tmp staging must not count as a published segment")
    // the batch: duplicates of a base doc, an A doc, a B doc + fresh rows —
    // every verdict source crosses the fold
    val batch = Seq(
      (1000L, "h10q h10r h10s h10t h10u"),
      (1001L, "j100q j100r j100s j100t j100u"),
      (1002L, "k200q k200r k200s k200t k200u"),
      (1003L, "zz1 zz2 zz3 zz4 zz5")).toDF("doc_id", "text")
    val viaDeltas = Corpus.admissionGatePruned(
        batch, Corpus.readAdmissionIndexFolded(spark, dir))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val rebuiltDir = java.nio.file.Files.createTempDirectory("adm_dgate_rb")
      .toString
    Corpus.writeAdmissionIndex(
      base.unionByName(incrA).unionByName(incrB), rebuiltDir, numBuckets = 8)
    val viaRebuild = Corpus.admissionGatePruned(
        batch, Corpus.readAdmissionIndex(spark, rebuiltDir))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaDeltas === viaRebuild,
      "gate verdicts over pending segments must equal the rebuilt index's")
    // re-bucket while deltas pend would strand them on the old fold
    val rb = intercept[IllegalArgumentException] {
      Corpus.rebucketAdmissionIndex(spark, dir, Some(16))
    }
    assert(rb.getMessage.contains("pending delta"))
    assert(Corpus.compactAdmissionIndex(spark, dir) === 2)
    // the crash-retry story: a re-published copy of an ALREADY-ABSORBED
    // increment (the at-least-once window — appender retried after a
    // commit it never saw) folds to a no-op
    Corpus.appendAdmissionDelta(spark, dir, incrA)
    assert(Corpus.compactAdmissionIndex(spark, dir) === 1)
    val outCols = (0 until 8).map(i => col(s"m$i")) :+ col("dup_of")
    def setOf(df: org.apache.spark.sql.DataFrame): Set[Seq[Long]] =
      df.select(outCols: _*).collect().map(r => (0 until 9).map(r.getLong)).toSet
    assert(setOf(Corpus.readAdmissionIndex(spark, dir)) ===
      setOf(Corpus.admissionIndex(base.unionByName(incrA).unionByName(incrB))),
      "absorbing the same increment twice must be a no-op under the min-fold")
    // now compacted: re-bucket proceeds
    assert(Corpus.rebucketAdmissionIndex(spark, dir, Some(16)) === 16)
  }

  test("folded pruned gate plan: the sig_bucket filter pushes below the " +
      "min-fold into EVERY segment's scan as a partition filter") {
    import org.apache.spark.sql.functions.col
    val base = (10 until 40).map(i =>
      (i.toLong, s"p${i}q p${i}r p${i}s p${i}t p${i}u")).toDF("doc_id", "text")
    val incr = (100 until 115).map(i =>
      (i.toLong, s"r${i}q r${i}r r${i}s r${i}t r${i}u")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("adm_dplan").toString
    Corpus.writeAdmissionIndex(base, dir, numBuckets = 8)
    Corpus.appendAdmissionDelta(spark, dir, incr)
    val folded = Corpus.readAdmissionIndexFolded(spark, dir)
    val pruned = folded.filter(col("sig_bucket").isin(0, 1, 2))
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(scans)
    }
    val ss = scans(pruned.queryExecution.executedPlan)
    assert(ss.size === 2, s"base + 1 segment = 2 file scans, got ${ss.size}")
    ss.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(
          _.name == "sig_bucket")),
        "each segment scan must carry the pushed sig_bucket partition " +
          s"filter — O(touched partitions), not O(corpus): $s")
    }
    // and the fold itself stays above the prune: verdicts are computed
    // over only the touched partitions' rows
    assert(pruned.columns.toSeq ===
      Seq("m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7", "dup_of",
        "sig_bucket"))
  }

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

  test("subword fertility: regex tokens per whitespace word, per source") {
    val docs = Seq(
      (1L, "ab cd.", "en", "s1", 6L),     // ws 2; re: ab, cd, '.' = 3
      (2L, "x y", "en", "s1", 3L),        // ws 2; re 2
      (3L, "a1b2", "en", "s2", 4L))       // ws 1; re: a,1,b,2 = 4
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.subwordFertility(docs).orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("word_tokens"),
        r.getAs[Long]("subword_tokens"), r.getAs[Double]("fertility")))
    assert(out.toSeq === Seq(("s1", 4L, 5L, 1.25), ("s2", 1L, 4L, 4.0)))
  }

  test("pack efficiency curve: every window's bins off the same prefix sum") {
    // token counts 3, 4, 5 -> cum 3, 7, 12
    val docs = Seq(
      (1L, "a b c", "en", "s", 5L),
      (2L, "d e f g", "en", "s", 7L),
      (3L, "h i j k l", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.llm.Packing.packEfficiencyCurve(docs, Seq(4, 8))
      .orderBy("window_tokens").collect()
      .map(r => (r.getAs[Long]("window_tokens"), r.getAs[Long]("n_windows"),
        r.getAs[Long]("n_straddling"), r.getAs[Double]("mean_fill")))
    // w=4: bins (0,0),(0,1),(1,2) -> 3 windows, docs 2 and 3 straddle
    // w=8: bins (0,0),(0,0),(0,1) -> 2 windows, doc 3 straddles
    assert(out.toSeq === Seq(
      (4L, 3L, 2L, 1.0),
      (8L, 2L, 1L, 0.75)))
  }

  test("contamination matrix: cells sum to C(n,2) per cluster and match" +
      " the split assignment") {
    import org.apache.spark.sql.functions.col
    // one near-dup cluster of 4 docs + two singletons
    val docs = (1L to 6L).map(i => (i, s"doc $i", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val clusters = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 50L), (6L, 60L))
      .toDF("doc_id", "cluster_id")
    val out = graft.llm.Sampling.contaminationMatrix(docs, clusters).collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b"),
        r.getAs[Long]("n_pairs"))).toSeq
    // total pairs across all cells = C(4,2) = 6 (singletons contribute 0)
    assert(out.map(_._3).sum === 6L)
    // expected per-cell from the actual hash split of docs 1..4
    val splits = docs.filter(col("doc_id") <= 4)
      .select(col("doc_id"),
        graft.llm.Sampling.splitFor(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (1L to 4L).flatMap(a => (a + 1 to 4L).map(b =>
      (Seq(splits(a), splits(b)).min, Seq(splits(a), splits(b)).max)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.map(c => (c._1, c._2) -> c._3).toMap === expected)
  }

  test("phash clusters: chained pairs contract to one cluster; far hash " +
      "stays a singleton") {
    val hashes = Seq(
      (1L, 0L, 0L, 0L),
      (2L, 0L, 0L, 1L),                   // 1 bit from #1
      (3L, 0L, 0L, 11L),                  // 3 bits from #1, 2 from #2
      (4L, 0L, -1L, -1L))                 // all 64 bits away from the rest
      .toDF("doc_id", "sum64", "phash_hi", "phash_lo")
    val out = graft.llm.Clusters.sizeHistogram(graft.llm.Clusters.assign(
      hashes.select(org.apache.spark.sql.functions.col("doc_id")),
      graft.llm.Multimodal.phashDups(hashes).select("a_id", "b_id")))
      .orderBy("cluster_size").collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs")))
    assert(out.toSeq === Seq((1L, 1L, 1L), (3L, 1L, 3L)))
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

  test("padding waste: exact per-octave pad bill, chunked long docs") {
    // token counts 3 (octave 1), 4 and 5 (octave 2); W = 4:
    //   octave 1: 1 seq,  pad 4-3 = 1, waste 1/4
    //   octave 2: 1+2 seqs, pad 3*4-9 = 3, waste 3/12
    val docs = Seq(
      (1L, "a b c", "en", "s", 5L),
      (2L, "d e f g", "en", "s", 7L),
      (3L, "h i j k l", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.llm.Packing.paddingWaste(docs, windowTokens = 4)
      .orderBy("octave").collect()
      .map(r => (r.getAs[Long]("octave"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_seqs_padded"), r.getAs[Long]("pad_tokens"),
        r.getAs[Double]("waste_frac")))
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 1L, 0.25),
      (2L, 2L, 3L, 3L, 0.25)))
  }

  test("modality mix: frame-count classes with doc and pixel shares") {
    val meta = Seq(
      (1L, 2L, 2L, 1L),    // image, 4 px
      (2L, 3L, 1L, 1L),    // image, 3 px
      (3L, 2L, 3L, 10L),   // clip,  60 px
      (4L, 1L, 2L, 100L))  // video, 200 px
      .toDF("doc_id", "width", "height", "n_frames")
    val out = graft.llm.Multimodal.modalityMix(meta).orderBy("modality")
      .collect()
      .map(r => (r.getAs[String]("modality"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pixels"), r.getAs[Double]("doc_share"),
        r.getAs[Double]("pixel_share")))
    assert(out.toSeq === Seq(
      ("clip", 1L, 60L, 0.25, 60.0 / 267.0),
      ("image", 2L, 7L, 0.5, 7.0 / 267.0),
      ("video", 1L, 200L, 0.25, 200.0 / 267.0)))
  }

  test("frame dedup ledger: identical clips collapse to the kept member's frames") {
    // A and B identical text (one near-dup cluster), C distinct
    val docs = Seq(
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "a b c d e", "en", "s", 9L),
      (3L, "zz yy xx ww vv qq rr tt uu pp oo nn mm ll", "en", "s", 44L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.encodeCorpus(docs)
    val out = Multimodal.frameDedupLedger(media).collect().head
    val fAB = 1L + "a b c d e".length % 120L
    val fC = 1L + "zz yy xx ww vv qq rr tt uu pp oo nn mm ll".length % 120L
    assert(out.getAs[Long]("n_clips") === 3L)
    assert(out.getAs[Long]("n_clusters") === 2L)
    assert(out.getAs[Long]("n_frames_total") === 2 * fAB + fC)
    assert(out.getAs[Long]("n_frames_redundant") === fAB)
    assert(out.getAs[Double]("reclaim_frac") ===
      fAB.toDouble / (2 * fAB + fC))
  }

  test("source quality matrix: bands 0..4, per-source fractions sum to 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en", "s1", 22L),
      (2L, "the the the the the", "en", "s1", 19L),      // stopword soup
      (3L, "epsilon zeta eta theta iota", "en", "s2", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.llm.TextAnalysis.sourceQualityMatrix(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("band"),
        r.getAs[Long]("n_docs"), r.getAs[Double]("band_frac")))
    assert(out.forall(c => c._2 >= 0L && c._2 <= 4L))
    assert(out.map(_._3).sum === 3L)
    out.groupBy(_._1).foreach { case (_, cells) =>
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-12)
    }
    // the all-stopword doc must land in band 0
    assert(out.exists(c => c._1 == "s1" && c._2 == 0L))
  }

  test("pixel profile: per-modality sums, mean and dimension envelope") {
    val meta = Seq(
      (1L, 2L, 2L, 1L, 10L),    // image: 4 px, red 10
      (2L, 3L, 1L, 1L, 5L),     // image: 3 px, red 5
      (3L, 2L, 3L, 10L, 30L),   // clip
      (4L, 1L, 2L, 100L, 7L))   // video
      .toDF("doc_id", "width", "height", "n_frames", "sum_red")
    val out = graft.llm.Multimodal.pixelProfile(meta).orderBy("modality")
      .collect()
      .map(r => (r.getAs[String]("modality"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pixels"), r.getAs[Long]("sum_red"),
        r.getAs[Double]("mean_red"), r.getAs[Long]("min_width"),
        r.getAs[Long]("max_width")))
    assert(out.toSeq === Seq(
      ("clip", 1L, 6L, 30L, 5.0, 2L, 2L),
      ("image", 2L, 7L, 15L, 15.0 / 7.0, 2L, 3L),
      ("video", 1L, 2L, 7L, 3.5, 1L, 1L)))
  }

  test("kfold clustered: a near-dup cluster never straddles folds") {
    val docs = (1L to 4L).map(i => (i, "a b c", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 50L), (4L, 60L))
      .toDF("doc_id", "cluster_id")
    val out = graft.llm.Sampling.kfoldClustered(docs, clusters, k = 2)
      .collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_clusters"),
        r.getAs[Double]("token_share"), r.getAs[Double]("balance")))
    assert(out.map(_._1).sum === 4L)
    // straddling would double-count cluster 10 across folds (sum > 3)
    assert(out.map(_._2).sum === 3L)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-12)
    out.foreach { case (_, _, share, balance) =>
      assert(balance === share * 2)
    }
  }
}
