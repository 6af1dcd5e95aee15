package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture specs for the round-15 maintenance/gating group
  * (q297–q300). The registered queries' DuckDB oracles already prove the
  * headline algebra cross-engine (q297's merge == recompute, q298's
  * shortcut == full rank); these specs pin the DEGENERATE paths those
  * oracles can't plant: fully-retracted groups, shortcut-boundary
  * survivors, the over-estimate-only property, the no-false-negative
  * guarantee. */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.queries.Maintenance

  /** The engine's md5 bucket convention, replayed on the driver (first 8
    * hex chars of md5, parsed base-16, mod m). */
  private def bucket(s: String, m: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % m
  }

  test("q297 refresh: fully-retracted group vanishes; merge == naive recompute on a planted ledger") {
    import spark.implicits._
    val D = 9862L // MvSplitDay
    // group (199601, A): both base rows retracted (key % 97 == 0) -> gone
    // group (199602, B): one of two base rows retracted + one late insert
    // group (199703, C): insert-only (born after the split)
    val rows = Seq(
      (97L, "A", 199601L, D - 100L, 1000L),
      (194L, "A", 199601L, D - 99L, 2000L),
      (1L, "B", 199602L, D - 50L, 300L),
      (291L, "B", 199602L, D - 49L, 700L),
      (2L, "B", 199602L, D + 10L, 500L),
      (3L, "C", 199703L, D + 20L, 900L))
      .toDF("o_orderkey", "status", "ym", "day", "cents")
    val got = Maintenance.mvRefresh(rows)
      .as[(Long, String, Long, Long)].collect().toSeq
    // naive recompute of the effective set, on the driver
    val eff = Seq((199602L, "B", 1L, 300L), (199602L, "B", 1L, 500L),
      (199703L, "C", 1L, 900L))
    val want = eff.groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1)
      .map { case ((ym, st), g) => (ym, st, g.size.toLong, g.map(_._4).sum) }
    assert(got == want, s"got $got want $want")
    assert(!got.exists(_._1 == 199601L),
      "a fully-retracted group must vanish exactly as the recompute omits it")
  }

  test("q298 sampler: output == full-rank driver replay (shortcut provably lossless); allocation spends the budget") {
    import spark.implicits._
    // 3 sources with UNEQUAL sizes so the largest-remainder arm is live
    val docs = ((1L to 37L).map(i => (i, "sa")) ++
      (101L to 153L).map(i => (i, "sb")) ++
      (201L to 210L).map(i => (i, "sc"))).toDF("doc_id", "source")
    val got = Maintenance.stratifiedSample(docs)
      .as[(String, Long, Long)].collect().toSeq
    // full-rank replay with no shortcut, driver-side
    val all = docs.as[(Long, String)].collect().toSeq
    val n = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = all.size.toLong
    val budget = 100L
    val base = n.view.mapValues(_ * budget / t).toMap
    val rem = n.map { case (s, ns) => s -> ns * budget % t }
    val spare = budget - base.values.sum
    val bump = rem.toSeq.sortBy { case (s, r) => (-r, s) }
      .take(spare.toInt).map(_._1).toSet
    val k = base.map { case (s, b) => s -> (b + (if (bump(s)) 1L else 0L)) }
    assert(k.values.sum == budget, s"allocation must spend the budget: $k")
    val want = all.groupBy(_._2).toSeq.flatMap { case (s, ds) =>
      ds.map { case (id, _) => (bucket(s"smp:$id", 1L << 32), id) }
        .sorted.take(k(s).toInt).zipWithIndex
        .map { case ((_, id), i) => (s, id, i + 1L) }
    }.sortBy(r => (r._1, r._3))
    assert(got == want,
      s"shortcut sample diverges from the full rank: got $got want $want")
  }

  test("q298 guard: an all-clipped source refuses loudly, even with ZERO survivor rows") {
    import spark.implicits._
    // Build a corpus where one source's EVERY doc hashes above its
    // survivor threshold. With t = 10000 docs over two 5000-doc sources,
    // k_s = 50 each and thr = ceil(2^32*4*50/5000) ~ 4% of 2^32 — so
    // picking 5000 ids whose hash lands ABOVE thr (96% of ids do) makes
    // source "z" survivor-free. The pre-fix guard inner-joined the
    // survivor census and silently dropped exactly this case (review
    // finding r15); the fixed guard must throw and name the source.
    val thr = (((1L << 32) * 4L * 50L) + 4999L) / 5000L
    val zIds = Iterator.from(1).map(_.toLong)
      .filter(i => bucket(s"smp:$i", 1L << 32) >= thr).take(5000).toSeq
    val aIds = Iterator.from(1000000).map(_.toLong).take(5000).toSeq
    val docs = (zIds.map((_, "z")) ++ aIds.map((_, "a")))
      .toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException] {
      graft.queries.Maintenance.stratifiedSample(docs).collect()
    }
    assert(e.getMessage.contains("clipped source") &&
      e.getMessage.contains("z"),
      s"guard must refuse and name the clipped source: ${e.getMessage}")
  }

  test("q299 count-min: estimate == driver replay of the sketch; never an under-estimate") {
    import spark.implicits._
    val counts = (1L to 40L).map(u => (u, u * 3L)).toDF("user_id", "exact")
    val got = Maintenance.countMinAudit(counts)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // driver replay: cells then min-probe, same md5 convention
    val keys = (1L to 40L).map(u => (u, u * 3L))
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for ((u, c) <- keys; j <- 0 until 4) {
      val b = bucket(s"cm$j:$u", 1024L)
      cells((j, b)) = cells.getOrElse((j, b), 0L) + c
    }
    val top = keys.sortBy { case (u, c) => (-c, u) }.take(20)
    val want = top.map { case (u, c) =>
      val est = (0 until 4).map(j => cells((j, bucket(s"cm$j:$u", 1024L)))).min
      (u, c, est, (est - c) * 1000000L / math.max(1L, c))
    }
    assert(got == want, s"got $got want $want")
    got.foreach { case (u, exact, est, over) =>
      assert(est >= exact, s"user $u: CMS must never under-estimate")
      assert(over >= 0L)
    }
  }

  test("q301 key census: argmax tie breaks to the highest key string, deterministically") {
    import spark.implicits._
    // two keys tied at the max count: the census must pick the
    // lexicographically highest key string in BOTH engines (the
    // max(struct) rule), never a partition-order-dependent arbitrary one
    val rows = Seq("a", "a", "b", "b", "c").toDF("k0")
    val got = Maintenance.keyCensus(rows, "t.k", col("k0"))
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(("t.k", 5L, 3L, 2L, "b")), s"got $got")
  }

  test("q300 Bloom gate: a known-duplicate arrival always passes (no false negative) and counts as a member") {
    import spark.implicits._
    // find a doc_id the md5 split routes to ARRIVALS and two it keeps KNOWN
    val arrId = (1L to 400L).find(i => bucket(s"arr:$i", 10L) == 0L).get
    val knownIds = (1L to 400L).filter(i => bucket(s"arr:$i", 10L) != 0L)
      .take(40)
    val dupText = "the planted duplicate content"
    val docs = (knownIds.map(i =>
        (i, "src", if (i == knownIds.head) dupText else s"known text $i")) :+
      ((arrId, "src", dupText)))
      .toDF("doc_id", "source", "text")
    val got = Maintenance.bloomGate(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 1, s"got $got")
    val (_, nArr, nMaybe, nKnown, nFp, _) = got.head
    assert(nArr == 1L && nKnown == 1L,
      s"planted duplicate must be a true member: $got")
    assert(nMaybe >= 1L,
      "Bloom can never false-negative a true member — the planted " +
        s"duplicate must pass: $got")
    assert(nFp == nMaybe - 1L, s"accounting must reconcile: $got")
  }
}
