package graft

import graft.fixtures.SpanGen
import graft.lineage.Lineage
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Resume semantics (SURVEY.md §5.6): a partial run followed by a resume
  * must process only the remainder and the union must equal a single
  * uninterrupted run's output.
  */
class LineageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lineage-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    Files.createTempDirectory("graft-lineage").toString

  test("partial run + resume equals one full run; nothing reprocessed") {
    import spark.implicits._
    val fixtures = SpanGen.genDocs(80, seed = 21L)
    val all = spark.createDataset(fixtures.map(_._1))
    val firstHalf = spark.createDataset(fixtures.take(40).map(_._1))

    val out = tmp() + "/out"
    val metrics = tmp() + "/metrics"

    // run 1: only half the input reaches the job (simulated interruption)
    val (p1, s1) = Lineage.runResumable(spark, firstHalf, out, metrics, "run-1")
    assert(p1 == 40 && s1 == 0)

    // run 2: full input; the 40 completed docs must be skipped
    val (p2, s2) = Lineage.runResumable(spark, all, out, metrics, "run-2")
    assert(p2 == 40 && s2 == 40)

    // union equals goldens, each doc exactly once
    val rows = Lineage.readOutput(spark, out)
      .select("doc_id", "spans", "status").as[(String, Seq[Span], String)]
      .collect()
    assert(rows.length == 80)
    assert(rows.map(_._1).distinct.length == 80)
    val byId = rows.map(r => r._1 -> r).toMap
    for ((doc, golden) <- fixtures) {
      val (_, spans, status) = byId(doc.doc_id)
      assert(status == "ok")
      assert(spans == golden, s"${doc.doc_id}")
    }

    // a third run over the same input is a no-op
    val (p3, s3) = Lineage.runResumable(spark, all, out, metrics, "run-3")
    assert(p3 == 0 && s3 == 80)

    // metrics: one row per (doc, run), checksums present
    val m = spark.read.parquet(metrics)
    assert(m.count() == 80)
    assert(m.filter($"checksum".isNull || $"checksum" === "").count() == 0)
    assert(m.select("doc_id").distinct().count() == 80)
  }

  test("reusing a run_id fails fast instead of appending duplicates") {
    import spark.implicits._
    val ds = spark.createDataset(SpanGen.genDocs(5, 3L).map(_._1))
    val out = tmp() + "/out"
    val metrics = tmp() + "/metrics"
    Lineage.runResumable(spark, ds, out, metrics, "run-x")
    val e = intercept[IllegalStateException] {
      Lineage.runResumable(spark, ds, out, metrics, "run-x")
    }
    assert(e.getMessage.contains("run-x"))
  }

  test("crash between output and metrics appends: readCommitted sees each doc once") {
    import spark.implicits._
    val fixtures = SpanGen.genDocs(20, seed = 9L)
    val ds = spark.createDataset(fixtures.map(_._1))
    val out = tmp() + "/out"
    val metrics = tmp() + "/metrics"

    // simulate a crashed attempt: the output append committed but the
    // metrics append never ran (orphan rows under run_id=crashed)
    import org.apache.spark.sql.functions.lit
    Lineage.extractWithLineage(spark, ds, graft.extract.Extract.Strategy.RegionClustering, 4)
      .withColumn("run_id", lit("crashed"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("run_id").parquet(out)

    // retry under a fresh run_id processes everything (metrics is empty)
    val (p, s) = Lineage.runResumable(spark, ds, out, metrics, "retry")
    assert(p == 20 && s == 0)

    // raw output holds both attempts; committed view dedups to one row/doc
    assert(Lineage.readOutput(spark, out).count() == 40)
    val committed = Lineage.readCommitted(spark, out, metrics)
    assert(committed.count() == 20)
    assert(committed.select("doc_id").distinct().count() == 20)
    assert(committed.filter($"run_id" =!= "retry").count() == 0)
  }

  test("bucketed resume prunes completed buckets before the per-doc anti-join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fixtures = SpanGen.genDocs(200, seed = 31L)
    val all = spark.createDataset(fixtures.map(_._1))
    val buckets = 8
    // same bucket formula as Lineage.resumeBucket
    val bucketOf = pmod(xxhash64(col("doc_id"), lit(16)), lit(buckets))
    val withB = all.toDF().withColumn("bucket", bucketOf)

    // mark every doc complete except all of bucket 3 and one straggler in
    // bucket 5 — so exactly two buckets are partially complete
    val straggler = withB.filter($"bucket" === 5)
      .select("doc_id").as[String].head()
    val metrics = tmp() + "/metrics"
    withB.filter($"bucket" =!= 3 && col("doc_id") =!= straggler)
      .select(col("doc_id"), lit("ok").as("status"))
      .write.parquet(metrics)

    // pruning: only the two partially-complete buckets survive, so the
    // per-doc anti-join input shrinks from 200 docs to just their docs
    val incomplete = Lineage.incompleteBuckets(spark, all, metrics, buckets)
      .as[Long].collect().toSet
    assert(incomplete == Set(3L, 5L))
    val candidateCount = withB.filter($"bucket".isin(3, 5)).count()
    assert(candidateCount < 200 && candidateCount > 0)

    // fast path output is identical to the plain anti-join
    val plain = Lineage.filterPending(spark, all, metrics)
      .select("doc_id").as[String].collect().sorted.toSeq
    val fast = Lineage.filterPendingBucketed(spark, all, metrics, buckets)
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(fast == plain)
    assert(fast.length == withB.filter($"bucket" === 3).count() + 1)
    assert(fast.contains(straggler))
  }

  test("bucketed resume stays correct when metrics holds docs not in the input") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // run 1 completed {A, B}; the input then replaces B with a new doc E.
    // buckets = 1 forces everything into one bucket: a count-equality
    // prune would see n_in = 2 = n_done, declare the bucket done, and
    // silently never extract E — the set fingerprint must catch it
    val fixtures = SpanGen.genDocs(3, seed = 51L)
    val Seq(a, bDoc, e) = fixtures.map(_._1)
    val metrics = tmp() + "/metrics"
    Seq(a.doc_id, bDoc.doc_id).toDF("doc_id")
      .withColumn("status", lit("ok")).write.parquet(metrics)
    val input = spark.createDataset(Seq(a, e))
    val pending = Lineage.filterPendingBucketed(spark, input, metrics, buckets = 1)
      .select("doc_id").as[String].collect().toSeq
    assert(pending == Seq(e.doc_id))
    // and the unchanged-input steady case still prunes to empty
    val same = spark.createDataset(Seq(a, bDoc))
    assert(Lineage.filterPendingBucketed(spark, same, metrics, buckets = 1).isEmpty)
  }

  test("snapshot time travel: readAsOf replays the table as of a prior append") {
    import spark.implicits._
    import graft.lineage.ParquetCatalog
    val fixtures = SpanGen.genDocs(60, seed = 41L)
    val all = spark.createDataset(fixtures.map(_._1))
    val firstHalf = spark.createDataset(fixtures.take(30).map(_._1))
    val out = tmp() + "/out"
    val metrics = tmp() + "/metrics"

    Lineage.runResumable(spark, firstHalf, out, metrics, "run-1")
    Lineage.runResumable(spark, all, out, metrics, "run-2")

    // one snapshot per append, on both the partitioned output table and
    // the flat metrics table
    assert(ParquetCatalog.snapshots(spark, out) == Seq(1L, 2L))
    assert(ParquetCatalog.snapshots(spark, metrics) == Seq(1L, 2L))

    // metrics as of snapshot 1 = just run-1's 30 rows; as of 2 = current
    assert(ParquetCatalog.readAsOf(spark, metrics, 1L).count() == 30)
    val asOf2 = ParquetCatalog.readAsOf(spark, metrics, 2L)
      .select("doc_id").as[String].collect().sorted.toSeq
    val current = ParquetCatalog.read(spark, metrics)
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(asOf2 == current && asOf2.length == 60)

    // partition column survives time travel on the partitioned table
    val outAsOf1 = ParquetCatalog.readAsOf(spark, out, 1L)
    assert(outAsOf1.columns.contains("run_id"))
    assert(outAsOf1.select("run_id").distinct().as[String].collect().toSeq == Seq("run-1"))
    assert(outAsOf1.count() == 30)

    // unknown snapshot fails fast
    intercept[IllegalArgumentException] {
      ParquetCatalog.readAsOf(spark, metrics, 99L)
    }
  }

  test("batched run: a crash loses at most one batch, retry resumes the rest") {
    import spark.implicits._
    val fixtures = SpanGen.genDocs(80, seed = 61L)
    val all = spark.createDataset(fixtures.map(_._1))
    val out = tmp() + "/out"
    val metrics = tmp() + "/metrics"
    val batches = 6

    // crashed attempt: only the first 3 batches committed
    for (b <- 0 until 3)
      Lineage.runResumable(spark, Lineage.batchSlice(all, batches, b),
        out, metrics, s"crash-b$b")
    val doneSoFar = spark.read.parquet(metrics).count()
    assert(doneSoFar > 0 && doneSoFar < 80)

    // retry under a new base run id: completed batches prune, only the
    // remainder is processed, and the union is complete with no dupes
    val (p, s) = Lineage.runResumableBatched(
      spark, all, out, metrics, "retry", batches = batches)
    assert(s == doneSoFar)
    assert(p == 80 - doneSoFar)
    val committed = Lineage.readCommitted(spark, out, metrics)
    assert(committed.count() == 80)
    assert(committed.select("doc_id").distinct().count() == 80)

    // a further full retry is a no-op
    val (p2, s2) = Lineage.runResumableBatched(
      spark, all, out, metrics, "retry2", batches = batches)
    assert(p2 == 0 && s2 == 80)
  }

  test("orphan files from a crashed append are published by the next commit") {
    import spark.implicits._
    import graft.lineage.ParquetCatalog
    val table = tmp() + "/t"
    ParquetCatalog.append(Seq((1L, "a")).toDF("id", "v"), table) // snap 1
    // crash simulation: data lands but the manifest write never runs
    Seq((2L, "orphan")).toDF("id", "v")
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(table)
    assert(ParquetCatalog.snapshots(spark, table) == Seq(1L))
    // the orphan is invisible to time travel until a commit adopts it
    assert(ParquetCatalog.readAsOf(spark, table, 1L).count() == 1)
    // the next successful append adopts the orphan (Iceberg retry
    // semantics): readAsOf(latest) re-synchronizes with read()
    ParquetCatalog.append(Seq((3L, "b")).toDF("id", "v"), table) // snap 2
    assert(ParquetCatalog.readAsOf(spark, table, 2L).count() == 3)
    assert(ParquetCatalog.read(spark, table).count() == 3)
  }

  test("filterPending on a fresh metrics path passes everything through") {
    import spark.implicits._
    val ds = spark.createDataset(SpanGen.genDocs(5, 2L).map(_._1))
    val pending = Lineage.filterPending(spark, ds, tmp() + "/nonexistent")
    assert(pending.count() == 5)
  }

  test("merge upsert: update, insert, tombstone, absent-key delete no-op, carry-over") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val target = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("id", "tag", "v")
    val source = Seq(
      (2L, "b2", 25L, false),  // matched update
      (3L, "c", 30L, true),    // matched tombstone
      (5L, "e", 50L, false),   // unmatched insert
      (9L, "x", 0L, true))     // delete of absent key: no-op
      .toDF("id", "tag", "v", "_deleted")
    val got = lineage.MergeUpsert.merge(target, source, "id")
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "a", 10L),   // untouched carry-over
      (2L, "b2", 25L),  // updated values
      (4L, "d", 40L),   // untouched carry-over
      (5L, "e", 50L)))  // inserted
  }

  test("compaction rewrites the current view; time travel to pre-compaction still works") {
    import spark.implicits._
    import graft.lineage.ParquetCatalog
    val table = tmp() + "/t"
    ParquetCatalog.append((1L to 40L).toDF("v").repartition(8), table)
    ParquetCatalog.append((41L to 80L).toDF("v").repartition(8), table)
    ParquetCatalog.compact(spark, table, targetFiles = 2)
    assert(ParquetCatalog.snapshots(spark, table) == Seq(1L, 2L, 3L))
    // current view: same row multiset, read from exactly 2 files
    val cur = ParquetCatalog.readCurrent(spark, table)
    assert(cur.select("v").as[Long].collect().sorted.toSeq == (1L to 80L))
    assert(cur.select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count() == 2)
    // pre-compaction snapshots unchanged (old files still on disk)
    assert(ParquetCatalog.readAsOf(spark, table, 1L).count() == 40)
    assert(ParquetCatalog.readAsOf(spark, table, 2L).count() == 80)
  }

  test("expireSnapshots drops old manifests and reclaims unreferenced files") {
    import spark.implicits._
    import graft.lineage.ParquetCatalog
    val table = tmp() + "/t"
    ParquetCatalog.append((1L to 40L).toDF("v").repartition(8), table)
    ParquetCatalog.append((41L to 80L).toDF("v").repartition(8), table)
    ParquetCatalog.compact(spark, table, targetFiles = 2)
    def dataFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val fs = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        fs.flatMap(c => if (c.isDirectory) walk(c) else Seq(c))
      }
      walk(new java.io.File(table)).count(f =>
        f.getName.endsWith(".parquet") && !f.getPath.contains("_graft_snapshots"))
    }
    val before = dataFiles()
    assert(before >= 18) // 16 small pre-compaction files + 2 compacted
    ParquetCatalog.expireSnapshots(spark, table, keepLast = 1)
    // only the compacted snapshot remains, its view intact
    assert(ParquetCatalog.snapshots(spark, table) == Seq(3L))
    assert(ParquetCatalog.readCurrent(spark, table)
      .select("v").as[Long].collect().sorted.toSeq == (1L to 80L))
    // the 16 pre-compaction files are physically gone
    assert(dataFiles() == 2, s"expected 2 live files, found ${dataFiles()}")
    // expired ids fail fast
    intercept[IllegalArgumentException] {
      ParquetCatalog.readAsOf(spark, table, 1L)
    }
    // expiring with nothing to drop is a no-op
    ParquetCatalog.expireSnapshots(spark, table, keepLast = 5)
    assert(ParquetCatalog.snapshots(spark, table) == Seq(3L))
  }

  test("observe() collects pipeline metrics in the same pass, no extra job") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    // the production pattern: per-batch row counts / quality tallies
    // ride the data pass itself via AccumulableMetrics instead of a
    // second count() scan — at 100 TB the avoided scan IS the feature
    val obs = org.apache.spark.sql.Observation("batch_stats")
    val df = (1L to 100L).toDF("v")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("v")).as("v_sum"),
        max(col("v")).as("v_max"))
      .filter(col("v") % 2 === 0)
    assert(df.count() == 50) // downstream sees the filtered view...
    val m = obs.get
    // ...while the metrics observed the full pre-filter pass
    assert(m("n_rows") == 100L && m("v_sum") == 5050L && m("v_max") == 100L)
  }

  test("write-audit-publish: staged rows invisible until publish; abort erases them") {
    import spark.implicits._
    import graft.lineage.ParquetCatalog
    val tbl = tmp() + "/wap"
    ParquetCatalog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), tbl)
    // stage a good batch: invisible to current readers, visible to audit
    val s1 = ParquetCatalog.stageAppend(Seq((3L, "c")).toDF("id", "v"), tbl)
    assert(ParquetCatalog.readCurrent(spark, tbl).count() == 2)
    assert(ParquetCatalog.snapshots(spark, tbl).size == 1)
    val audit = ParquetCatalog.readStaged(spark, tbl, s1)
    assert(audit.count() == 3)
    ParquetCatalog.publishStaged(spark, tbl, s1)
    assert(ParquetCatalog.readCurrent(spark, tbl)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(ParquetCatalog.snapshots(spark, tbl).size == 2)
    // stage a bad batch and abort: no trace in data or snapshots
    val s2 = ParquetCatalog.stageAppend(Seq((99L, "BAD")).toDF("id", "v"), tbl)
    assert(ParquetCatalog.readStaged(spark, tbl, s2).count() == 4)
    ParquetCatalog.abortStaged(spark, tbl, s2)
    assert(ParquetCatalog.readCurrent(spark, tbl).count() == 3)
    assert(spark.read.parquet(tbl).count() == 3) // files physically gone
    // and a later commit sequence is unaffected
    ParquetCatalog.append(Seq((4L, "d")).toDF("id", "v"), tbl)
    assert(ParquetCatalog.readCurrent(spark, tbl).count() == 4)
  }

  test("merge-on-read deletes: key-file anti-join, then compaction folds them in") {
    import spark.implicits._
    import graft.lineage.{MorDeletes, ParquetCatalog}
    val tbl = tmp() + "/mor"
    ParquetCatalog.append((0L until 20L).map(i => (i, s"v$i")).toDF("id", "v"), tbl)
    MorDeletes.commitDelete(Seq(3L, 7L).toDF("id"), tbl, "id")
    MorDeletes.commitDelete(Seq(7L, 11L).toDF("id"), tbl, "id") // overlap is fine
    val mor = MorDeletes.readCurrent(spark, tbl, "id").collect().map(_.getLong(0)).toSet
    assert(mor == (0L until 20L).toSet -- Set(3L, 7L, 11L))
    // raw current view still carries the rows (deletes are logical)
    assert(ParquetCatalog.readCurrent(spark, tbl).count() == 20)
    val preCompact = ParquetCatalog.snapshots(spark, tbl).last
    MorDeletes.compactDeletes(spark, tbl, "id")
    // physically applied now, delete files cleared, MOR == plain read
    assert(ParquetCatalog.readCurrent(spark, tbl).count() == 17)
    assert(MorDeletes.readCurrent(spark, tbl, "id").count() == 17)
    // time travel still sees the pre-delete rows
    assert(ParquetCatalog.readAsOf(spark, tbl, preCompact).count() == 20)
  }

  test("iterative resume replays committed rounds from storage, never recomputes") {
    import spark.implicits._
    import graft.lineage.IterativeResume
    import org.apache.spark.sql.functions.{col, lit}
    val root = tmp() + "/iter"
    var stepCalls = 0
    def step(prev: org.apache.spark.sql.DataFrame, k: Int) = {
      stepCalls += 1
      prev.select(col("node"), (col("v") + k).as("v"))
    }
    val init = (0L until 10L).toDF("node").select(col("node"), lit(0L).as("v"))
    // interrupted attempt: rounds 0..3 committed
    IterativeResume.run(spark, root, 3, init, step).count()
    assert(stepCalls == 3)
    assert(IterativeResume.lastCommitted(spark, root, 6).contains(3))
    // resume to 6: exactly three MORE step invocations, none replayed
    val resumed = IterativeResume.run(spark, root, 6, init, step)
    assert(stepCalls == 6)
    val want = (1 to 6).sum.toLong
    assert(resumed.collect().forall(_.getLong(1) == want))
    // a completed run re-invoked is a pure read: zero new step calls
    IterativeResume.run(spark, root, 6, init, step).count()
    assert(stepCalls == 6)
  }

  test("resumable PageRank equals the in-memory power iteration bit-for-bit") {
    import spark.implicits._
    val rng = new scala.util.Random(5L)
    val edges = (0 until 60).map(_ => (rng.nextInt(12).toLong, rng.nextInt(12).toLong))
      .distinct.toDF("src", "dst")
    val plain = graft.operators.PageRank.pageRank(edges, "src", "dst", iters = 5, d = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val root = tmp() + "/prres"
    // interrupt at 2, resume to 5
    graft.operators.PageRank.pageRankResumable(edges, "src", "dst",
      iters = 2, d = 0.85, stateRoot = root).count()
    val resumed = graft.operators.PageRank.pageRankResumable(edges, "src", "dst",
        iters = 5, d = 0.85, stateRoot = root)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(resumed == plain)
  }

  test("incremental join delta equals full join minus base join") {
    import spark.implicits._
    val rng = new scala.util.Random(11L)
    val aAll = (0L until 40L).map(i => (i, s"a$i"))
    val bAll = (0L until 40L).filter(_ => rng.nextBoolean()).map(i => (i, i * 2))
    val (aBase, aDelta) = aAll.partition(_._1 % 2 == 0)
    val (bBase, bDelta) = bAll.partition(_._1 % 3 != 0)
    val delta = graft.operators.IncrementalJoin.joinDelta(
        aBase.toDF("k", "av"), aDelta.toDF("k", "av"),
        bBase.toDF("k", "bv"), bDelta.toDF("k", "bv"), "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val full = aAll.toDF("k", "av").join(bAll.toDF("k", "bv"), "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val base = aBase.toDF("k", "av").join(bBase.toDF("k", "bv"), "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(delta == (full -- base))
  }

  test("merge upsert rejects a target that already has the tombstone column") {
    import spark.implicits._
    val target = Seq((1L, false)).toDF("id", "_deleted")
    val source = Seq((1L, false)).toDF("id", "_deleted")
    assertThrows[IllegalArgumentException] {
      lineage.MergeUpsert.merge(target, source, "id")
    }
  }
}
