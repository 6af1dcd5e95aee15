package graft

import graft.queries.{Analytics, Training}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the pattern-mining additions (q144 BPE encoding, q145
  * frequent triples) beyond the smoke / oracle gates: the encoder's word
  * and char accounting reconciles with an independent scan, encoding never
  * inflates, and every reported triple respects the A-Priori monotonicity
  * bound against independently-computed pair supports.
  */
class MiningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q144 word/char accounting reconciles; encoding only ever shrinks") {
    val rows = Training.q144(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val native = Tables.load(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("nw"), sum(length(col("w"))).as("nc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == native.keySet)
    rows.foreach { case (src, (nWords, sumChars, nTokens, perMchar)) =>
      assert((nWords, sumChars) == native(src), s"$src accounting")
      // 3 learned merges must compress SOMETHING but can never inflate
      assert(nTokens <= sumChars, s"$src inflated")
      assert(perMchar == nTokens * 1000000L / sumChars)
    }
    assert(rows.values.map(_._3).sum < rows.values.map(_._2).sum,
      "corpus-level: merges found nothing to compress")
  }

  test("q147 attribution: both models credit exactly the attributable purchases") {
    val rows = Analytics.q147(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (ch, _, _, _, _) => assert(ch != "purchase") }
    // every purchase with at least one preceding touch is credited once
    // under EACH model, so the counts and cents reconcile across models
    assert(rows.map(_._2).sum == rows.map(_._4).sum, "credited purchase counts differ")
    assert(rows.map(_._3).sum == rows.map(_._5).sum, "credited cents differ")
    // the only uncredited purchases are ones BEFORE a user's first touch
    val purchases = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_._2).sum <= purchases)
    assert(rows.map(_._2).sum > 0)
  }

  test("q149 U-shaped credit: per-path credit sums to <= 1e6, floor loss bounded") {
    val rows = Analytics.q149(spark, sf).collect()
    assert(rows.nonEmpty)
    // reconstruct the per-user paths and check the channel rollup implies
    // per-path conservation: total credit = sum over converted users of
    // (1e6 - floor loss), where loss < (n-2) per path
    val totalCredit = rows.map(_.getLong(2)).sum
    val e = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .groupBy(_.getLong(0))
    val perUser = e.values.flatMap { evs =>
      val sorted = evs.sortBy(r => (r.getAs[java.sql.Timestamp](2).getTime, r.getLong(3)))
      val firstPurchase = sorted.indexWhere(_.getString(1) == "purchase")
      if (firstPurchase < 0) None // never converted
      else {
        val n = sorted.take(firstPurchase).count(_.getString(1) != "purchase").toLong
        if (n == 0) None
        else if (n <= 2) Some(1000000L)
        else Some(800000L + (200000L / (n - 2)) * (n - 2))
      }
    }
    assert(totalCredit == perUser.sum,
      s"channel rollup $totalCredit != per-path reconstruction ${perUser.sum}")
  }

  test("q150 overlap matrix: containment bounded by 1e6 and by source gram counts") {
    val rows = graft.queries.Training.q150(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val per = Tables.load(spark, sf, "documents")
      .select(col("source"),
        explode(array_distinct(
          graft.functions.TextFunctions.wordShingles(col("text"), 4))).as("g"))
      .distinct()
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (a, b, shared, ppm) =>
      assert(a < b, s"($a,$b) not normalized")
      val mn = math.min(per(a), per(b))
      assert(shared >= 1 && shared <= mn, s"($a,$b) shared=$shared > min=$mn")
      assert(ppm == shared * 1000000L / mn && ppm <= 1000000L)
    }
  }

  test("q145 triples: support >= 2 and every sub-pair respects monotonicity") {
    val triples = Analytics.q145(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(triples.nonEmpty)
    val items = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    val pairs = items.select(col("okey"), col("part").as("pa"))
      .join(items.select(col("okey").as("o2"), col("part").as("pb")),
        col("okey") === col("o2") && col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    triples.foreach { case (a, b, c, n) =>
      assert(n >= 2, s"($a,$b,$c) below threshold")
      assert(a < b && b < c, s"($a,$b,$c) not normalized")
      Seq((a, b), (a, c), (b, c)).foreach { p =>
        assert(pairs.getOrElse(p, 0L) >= n,
          s"sub-pair $p support ${pairs.getOrElse(p, 0L)} < triple support $n")
      }
    }
  }

  // The q110/q159/q163 quantized-cosine statistic, recomputed independently
  // on the driver for replay tests (overflow-safe: |q_i| <= 100, 64 dims =>
  // dot^2 * 1e6 <= 4.1e17).
  private def quant(e: Seq[Float]): Array[Long] =
    e.map(x => math.floor(x.toDouble * 100).toLong).toArray
  private def qscore(a: Array[Long], b: Array[Long]): Long = {
    val dot = a.indices.map(i => a(i) * b(i)).sum
    val na = a.map(x => x * x).sum
    val nb = b.map(x => x * x).sum
    val m = dot * dot * 1000000L / (na * nb)
    if (dot >= 0) m else -m
  }

  // q159's portable 63-bit hyperplane signature, recomputed independently:
  // bit t = [Σ_j q_j·c(t,j) ≥ 0], c(t,j) = ((1299709·(t·dim+j) + 15485863)
  // mod 1000003) − 500001.
  private def psig(q: Array[Long]): Long = {
    val d = q.length
    var s = 0L
    var t = 0
    while (t < 63) {
      var acc = 0L
      var j = 0
      while (j < d) {
        acc += q(j) * ((1299709L * (t * d + j) + 15485863L) % 1000003L - 500001L)
        j += 1
      }
      if (acc >= 0L) s |= (1L << t)
      t += 1
    }
    s
  }
  private def bandCollide(sa: Long, sb: Long): Boolean =
    (0 until 9).exists(b => ((sa >> (b * 7)) & 127L) == ((sb >> (b * 7)) & 127L))

  test("q159 semantic dedup agrees with a driver-side banded replay") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), quant(r.getSeq[Float](2))))
      .filter { case (_, _, q) => q.map(x => x * x).sum > 0 }
    val sigs = vecs.map { case (id, _, q) => id -> psig(q) }.toMap
    var allPairs = 0L
    var candPairs = 0L
    val expected = vecs.groupBy(_._2).map { case (lbl, vs) =>
      for (a <- vs; b <- vs if a._1 < b._1) {
        allPairs += 1
        if (bandCollide(sigs(a._1), sigs(b._1))) candPairs += 1
      }
      val dropped = vs.count { case (idB, _, qb) =>
        vs.exists { case (idA, _, qa) =>
          idA < idB && bandCollide(sigs(idA), sigs(idB)) &&
            qscore(qa, qb) >= 150000L
        }
      }
      lbl -> (vs.length.toLong, dropped.toLong)
    }
    val got = Training.q159(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (lbl, (n, d, k)) =>
      val (en, ed) = expected(lbl)
      assert((n, d, k) == ((en, ed, en - ed)),
        s"label $lbl: got ($n,$d,$k) want ($en,$ed,${en - ed})")
    }
    assert(got.values.map(_._2).sum > 0, "threshold never fired — test is vacuous")
    // The point of the banding: candidates must be a real reduction over
    // all-pairs-within-label, not a disguised Σ label².
    assert(candPairs * 4 < allPairs,
      s"banding is not sub-quadratic: $candPairs candidates of $allPairs pairs")
  }

  test("q164 preference pairs: exhaustive, deduped, purchase-views excluded") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
        col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .collect()
      .filter(!_.isNullAt(3))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val pos = ev.collect { case (u, d, "purchase", i) => (u, d, i) }.toSet
    val neg = ev.collect { case (u, d, "view", i) => (u, d, i) }.toSet -- pos
    val pairs = for {
      (u, d, c) <- pos.toSeq
      (u2, d2, rj) <- neg if u2 == u && d2 == d
    } yield (u, d, c, rj)
    val expected = pairs.groupBy(_._3).map { case (c, ps) =>
      c -> ((ps.size.toLong, ps.map(_._1).distinct.size.toLong,
        ps.map(_._4).distinct.size.toLong))
    }
    val got = Training.q164(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.map(_._1).sum > 0, "no pairs — vacuous")
  }

  test("q165 flattening keeps exactly the r²≤size prefix of every dup cluster") {
    val rows = Training.q165(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.foreach { case (src, n, kept, dropped, _) =>
      assert(kept + dropped == n, s"$src: kept+dropped != n_docs")
      assert(kept >= 1, s"$src: a source lost every doc")
    }
    // non-vacuous: the fixture has multi-member band clusters, so the
    // √-flattening must drop SOMETHING corpus-wide
    assert(rows.map(_._4).sum > 0, "no cluster ever shrank — vacuous")
    // independent total: every shingled doc is accounted exactly once
    val nShingled = Tables.load(spark, sf, "documents")
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(rows.map(_._2).sum == nShingled)
  }

  test("q281 sqrt-temperature mix: exact budget, exact isqrt, flattening") {
    val rows = Training.q281(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // the largest-remainder split is exact: ppm sums to exactly 10^6
    assert(rows.map(_._5).sum == 1000000L)
    rows.foreach { case (src, n, w, raw, sm) =>
      // the Newton-corrected isqrt is exact against BigInt arithmetic
      val bi = BigInt(n).bigInteger.sqrt().longValue()
      assert(w == bi, s"$src: isqrt($n) = $w, expected $bi")
      assert(raw >= 0 && raw <= 1000000L && sm >= 0 && sm <= 1000000L)
    }
    // smoothing flattens: below-average sources gain share, above lose
    // (strict when shares differ; ±1 slack for the remainder distribution)
    val mean = 1000000L / rows.length
    rows.foreach { case (src, _, _, raw, sm) =>
      if (raw < mean - 1) assert(sm >= raw, s"$src: low-share source shrank")
      if (raw > mean + 1) assert(sm <= raw, s"$src: high-share source grew")
    }
    // order preserved: more tokens never means less smoothed share (±1)
    rows.sortBy(_._2).map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1)
      case _ =>
    }
  }

  test("q166 Hamilton apportionment: allocations sum exactly to the budget") {
    val rows = Training.q166(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (src, _, base, alloc) =>
      assert(alloc == base || alloc == base + 1, s"$src: alloc not base or base+1")
    }
    assert(rows.map(_._4).sum == 1000000L, "largest-remainder must spend the budget exactly")
    // the floor quotas alone must NOT reach the budget (the slack Hamilton
    // distributes is the whole point of the query)
    assert(rows.map(_._3).sum < 1000000L)
    val totalTokens = Tables.load(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("nt"))
      .agg(sum("nt")).collect().head.getLong(0)
    assert(rows.map(_._2).sum == totalTokens)
  }

  test("q239 purged split: retained sides separated by more than the embargo") {
    val rows = Training.q239(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("embargo_dropped", "eval", "train"))
    val bySplit = rows.map(r => r._1 -> r).toMap
    val (train, ev) = (bySplit("train"), bySplit("eval"))
    // eval starts strictly more than the 1-day embargo after train ends:
    // eval.min > cut + 1d >= train.max + 1d
    assert(ev._4 - train._5 > 86400000L,
      s"gap ${ev._4 - train._5} ms does not clear the embargo")
    // the split partitions the event stream exactly
    val total = Tables.load(spark, sf, "events").count()
    assert(rows.map(_._2).sum == total, "splits must partition all events")
    // the residual-exposure column is a single global number on every row
    assert(rows.map(_._6).distinct.length == 1)
    assert(rows.head._6 >= 0L && rows.head._6 <= train._3.min(ev._3))
  }

  test("q206 water-filling: caps respected, budget spent exactly at the fixed point") {
    val rows = Training.q206(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // the residual column is the in-band fixed-point witness: exactly 0
    // when the 3 rounds converged (every row carries the same value)
    assert(rows.forall(_._5 == 0L),
      s"non-zero residual ${rows.head._5}: rounds did not reach the fixed point")
    val totalTokens = rows.map(_._2).sum
    val budget = 5L * totalTokens / 4L
    rows.foreach { case (src, _, capped, alloc, _) =>
      assert(capped == 0L || capped == 1L, src)
      if (capped == 1L) assert(alloc == 1800L, s"$src: capped but alloc != cap")
      else assert(alloc <= 1800L, s"$src: uncapped alloc over the ceiling")
    }
    // mixed outcome: the knob genuinely binds on some sources, not all
    assert(rows.exists(_._3 == 1L), "no source capped — ceiling too high")
    assert(rows.exists(_._3 == 0L), "every source capped — ceiling too low")
    // at the fixed point (round 3 caps nobody new) the budget is spent
    // exactly — this is the invariant plain floor shares cannot give
    assert(rows.map(_._4).sum == budget,
      s"allocations ${rows.map(_._4).sum} != budget $budget")
    // replay the declared 3-round algebra driver-side
    var capped = Set.empty[String]
    val mass = rows.map(r => r._1 -> r._2).toMap
    var alloc = Map.empty[String, Long]
    for (_ <- 1 to 3) {
      val active = mass.keySet -- capped
      val m = active.toSeq.map(mass).sum
      val r = budget - 1800L * capped.size
      val base = active.map(s => s -> r * mass(s) / m).toMap
      val rem = active.map(s => s -> r * mass(s) % m).toMap
      val spare = r - base.values.sum
      val order = active.toSeq.sortBy(s => (-rem(s), s))
      alloc = order.zipWithIndex
        .map { case (s, i) => s -> (base(s) + (if (i < spare) 1L else 0L)) }
        .toMap
      capped = capped ++ active.filter(s => alloc(s) > 1800L)
    }
    rows.foreach { case (src, _, c, a, _) =>
      assert(c == (if (capped(src)) 1L else 0L), s"$src capped flag")
      assert(a == (if (capped(src)) 1800L else alloc(src)), s"$src alloc")
    }
  }

  test("q231 sourcing HHI: bounds, multi-supplier filter, driver replay") {
    val rows = queries.Analytics.q231(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    val cells = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_quantity")).cast("long").as("q")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val perPart = cells.groupBy(_._1._1).map { case (p, xs) =>
      val t = xs.values.sum
      val hhi = xs.values.map { q =>
        val s = q * 1000000L / t; s * s / 1000000L
      }.sum
      p -> ((xs.size.toLong, t, hhi))
    }.filter(_._2._1 >= 2)
    val expected = perPart.toSeq
      .sortBy { case (p, (_, _, h)) => (-h, p) }.take(20)
      .map { case (p, (n, t, h)) => (p, n, t, h) }
    assert(rows.toSeq == expected, "HHI replay mismatch")
    rows.foreach { case (p, n, _, hhi) =>
      assert(n >= 2L, s"part $p: single-supplier parts are filtered")
      // n shares summing to <=1e6: HHI bounded by (1e6/n, 1e6)
      assert(hhi <= 1000000L && hhi >= 1000000L / n - n, s"part $p hhi $hhi")
    }
  }

  test("q230 RFM segments replay from a driver-side octave fold") {
    val rows = queries.Analytics.q230(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val p = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        floor(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val now = p.map(_._2).max
    def oct(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val expected = p.groupBy(_._1).toSeq.map { case (_, xs) =>
      val (r, f, m) = (oct((now - xs.map(_._2).max) / 86400000L + 1),
        oct(xs.length.toLong), oct(xs.map(_._3).sum + 1))
      (r * 10000 + f * 100 + m, r, f, m, xs.map(_._3).sum)
    }.groupBy(t => (t._1, t._2, t._3, t._4)).map { case (k, xs) =>
      (k._1, k._2, k._3, k._4, xs.size.toLong, xs.map(_._5).sum)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq == expected, "RFM segment replay mismatch")
    // codes decompose and users conserve
    rows.foreach { case (code, r, f, m, _, _) =>
      assert(code == r * 10000 + f * 100 + m)
    }
    assert(rows.map(_._5).sum == p.map(_._1).distinct.length.toLong,
      "segments must partition the purchasing users")
  }

  test("q217 decayed popularity replays from a driver-side shift fold") {
    val rows = queries.Analytics.q217(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), to_date(col("l_shipdate")).as("d")).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
    val mx = li.map(_._2).max
    val perPart = li.groupBy(_._1).map { case (p, xs) =>
      val dec = xs.map { case (_, d) =>
        val ageH = java.time.temporal.ChronoUnit.DAYS.between(d, mx) / 28
        if (ageH >= 20) 0L else 1000000L / (1L << ageH.toInt)
      }.sum
      p -> ((xs.length.toLong, dec))
    }
    val expected = perPart.toSeq
      .sortBy { case (p, (_, dec)) => (-dec, p) }.take(20)
      .map { case (p, (n, dec)) => (p, n, dec) }
    assert(rows.toSeq == expected, "decay replay mismatch")
    // decay reorders: the decayed top-20 is NOT the raw-count top-20
    val rawTop = perPart.toSeq.sortBy { case (p, (n, _)) => (-n, p) }
      .take(20).map(_._1).toSet
    assert(rows.map(_._1).toSet != rawTop,
      "fixture should separate trending from all-time popularity")
  }

  test("q224 Bloom ingest gate: no false negatives, reconciles with q128") {
    val rows = Training.q224(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, n, pos, dup, fp, fn, saved) =>
      assert(fn == 0L, s"$s: a Bloom filter can NEVER false-negative")
      assert(pos == dup + fp,
        s"$s: positives must split exactly into true dups and false positives")
      assert(saved == (n - pos) * 1000000L / n, s"$s saved share")
    }
    // the same batch the exact gate q128 audits, duplicate-for-duplicate
    val byK = Training.q128(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { case (s, n, _, dup, _, _, _) =>
      assert(byK(s)._1 == n, s"$s: batch populations diverge from q128")
      assert(byK(s)._2 == dup, s"$s: true-dup counts diverge from q128")
    }
    // the screen saves real work at the fixture's duplicate rate
    val (tn, tpos) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(tpos * 3 < tn, "bloom-positive share too high — filter undersized")
  }

  test("q221 funnel: stage monotonicity and agreement with the standalone gates") {
    val rows = Training.q221(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // per-source monotone through the row-local stages; dedup stages can
    // move survivors across sources, so only the global chain is monotone
    rows.foreach { case (s, n0, n1, n2, n3, n4, _) =>
      assert(n0 >= n1 && n1 >= n2, s"$s: row-local stages must be monotone")
      assert(n3 <= n2 && n4 <= n3,
        s"$s: a source's survivors are a subset of its own model-passers")
    }
    def tot(f: ((String, Long, Long, Long, Long, Long, Long)) => Long) =
      rows.map(f).sum
    assert(tot(_._2) >= tot(_._3) && tot(_._3) >= tot(_._4) &&
      tot(_._4) >= tot(_._5) && tot(_._5) >= tot(_._6),
      "the global funnel must narrow at every stage")
    assert(tot(_._6) > 0L, "an empty final corpus means a stage is broken")
    // stage 1 agrees with q205: survivors = docs - fail_any per source
    val q205 = graft.queries.Extensions.q205(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1) - r.getLong(5))).toMap
    rows.foreach { case (s, _, n1, _, _, _, _) =>
      assert(n1 == q205(s), s"$s: rules stage diverges from q205")
    }
    // stage 2 can never keep more than q111's unconditioned gate
    val q111 = graft.queries.Retrieval.q111(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.foreach { case (s, _, _, n2, _, _, _) =>
      assert(n2 <= q111(s), s"$s: model stage exceeds the q111 gate")
    }
  }

  test("q170 source matrix conserves the q99 pair set and respects the threshold") {
    val cells = queries.Extensions.q170(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nPairs = queries.Extensions.q99(spark, sf).count()
    assert(cells.nonEmpty && nPairs > 0)
    assert(cells.map(_._3).sum == nPairs, "matrix must conserve every pair")
    cells.foreach { case (x, y, n, mj) =>
      assert(x <= y, s"cells must be unordered: ($x,$y)")
      assert(n > 0 && mj >= 800000L && mj <= 1000000L,
        s"($x,$y) max jaccard $mj outside [threshold, 1e6]")
    }
  }

  test("q171 split: sides partition the corpus and never split a cluster") {
    val sides = graft.dedup.Dedup
      .splitSides(spark, sf)
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(sides.count() == nDocs, "every document must be assigned a side")
    assert(sides.filter(!col("side").isin(0L, 1L)).count() == 0)
    // cluster cohesion: a (c0, c1) cluster must sit entirely on one side
    val split = sides.groupBy("c0", "c1")
      .agg(countDistinct("side").as("ns"))
      .filter(col("ns") > 1).count()
    assert(split == 0, s"$split clusters straddle the boundary")
    // both sides populated at this SF (md5 balance) and the rollup conserves
    val cells = queries.Training.q171(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cells.map(_._3).sum == nDocs)
    assert(cells.map(_._2).distinct.sorted.sameElements(Seq(0L, 1L)),
      "both sides must be populated")
  }

  test("q172 leakage cells conserve the q99 pair set; first-band pairs never leak") {
    val cells = queries.Extensions.q172(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nPairs = queries.Extensions.q99(spark, sf).count()
    assert(cells.map(_._3).sum == nPairs, "cells must conserve every pair")
    cells.foreach { case (x, y, n, mj) =>
      assert(x <= y && x >= 0 && y <= 1)
      assert(n > 0 && mj >= 800000L && mj <= 1000000L)
    }
    // by construction: pairs agreeing on (s0, s1) share a cluster → a side
    val sides = graft.dedup.Dedup
      .splitSides(spark, sf)
      .select(col("doc_id"), col("c0"), col("c1"), col("side"))
    val leaked = queries.Extensions.q99(spark, sf)
      .join(sides.select(col("doc_id").as("doc_a"), col("c0").as("ca0"),
        col("c1").as("ca1"), col("side").as("sa")), "doc_a")
      .join(sides.select(col("doc_id").as("doc_b"), col("c0").as("cb0"),
        col("c1").as("cb1"), col("side").as("sb")), "doc_b")
      .filter(col("ca0") === col("cb0") && col("ca1") === col("cb1") &&
        col("sa") =!= col("sb"))
      .count()
    assert(leaked == 0, "same-cluster pairs must never straddle the boundary")
  }

  test("q174 calibration: bins cover the candidates; agreement tracks exact Jaccard") {
    val bins = queries.Extensions.q174(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(bins.nonEmpty)
    bins.foreach { case (m, n, avg, mn, mx) =>
      // a banded candidate agrees on at least one FULL band → ≥ 2 perms
      assert(m >= 2 && m <= 8, s"bin $m outside the band-collision range")
      assert(n > 0 && mn <= avg && avg <= mx && mx <= 1000000L)
    }
    val nCand = graft.dedup.Dedup.portableCalibrationPairs(spark, sf).count()
    assert(bins.map(_._2).sum == nCand, "bins must conserve the candidate set")
    // discrimination: full agreement must not read BELOW the weakest bin
    assert(bins.maxBy(_._1)._3 >= bins.minBy(_._1)._3,
      "estimate and truth anti-correlated — banding is broken")
  }

  test("q160 surprisal replays exactly from a driver-side bigram LM") {
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 10
    }
    def bitlen(c: Long): Long = java.lang.Long.toBinaryString(c).length.toLong
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).toSeq))
    val (evalDocs, trainDocs) = docs.partition(d => bucket(d._1) == 0)
    def bigrams(w: Seq[String]): Seq[(String, String)] =
      if (w.length < 2) Nil else w.sliding(2).map(p => (p(0), p(1))).toSeq
    val train = trainDocs.flatMap(d => bigrams(d._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = train.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val perSource = evalDocs.flatMap { case (_, src, w) =>
      bigrams(w).map { bg =>
        val bits = train.get(bg) match {
          case Some(cxy) => bitlen(ctx(bg._1)) - bitlen(cxy)
          case None      => 20L
        }
        (src, bits)
      }
    }.groupBy(_._1).map { case (src, xs) =>
      val total = xs.map(_._2).sum
      src -> (xs.size.toLong, total, total * 1000L / xs.size)
    }
    val got = Training.q160(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == perSource.keySet)
    got.foreach { case (src, t) =>
      assert(t == perSource(src), s"$src: got $t want ${perSource(src)}")
    }
    assert(got.values.exists(_._2 > 0), "no surprisal accumulated — vacuous")
  }

  test("q176 decontamination: flags replay exactly from pairs × sides") {
    val rows = queries.Extensions.q176(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, c, _) =>
      assert(c >= 0 && c <= n, s"$src: $c contaminated of $n train docs")
    }
    val sides = graft.dedup.Dedup.splitSides(spark, sf)
    assert(rows.map(_._2).sum == sides.filter(col("side") === 0).count(),
      "per-source train counts must conserve the side-0 population")
    // independent replay of the flag set: train endpoints of straddling pairs
    val flagged = graft.dedup.Dedup.minHashPairsPortable(spark, sf)
      .join(sides.select(col("doc_id").as("doc_a"), col("side").as("sa")),
        "doc_a")
      .join(sides.select(col("doc_id").as("doc_b"), col("side").as("sb")),
        "doc_b")
      .filter(col("sa") =!= col("sb"))
      .select(when(col("sa") === 0, col("doc_a")).otherwise(col("doc_b"))
        .as("doc_id"))
      .distinct().collect().map(_.getLong(0))
    assert(rows.map(_._3).sum == flagged.length,
      "contaminated counts must equal the distinct straddling train docs")
    assert(rows.map(_._4).sum == flagged.sum,
      "checksums must pin the exact flagged id set")
  }

  test("q179 DSIR weights replay exactly from a driver-side feature model") {
    val rows = Training.q179(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, mean, mn, mx, pos) =>
      assert(n > 0 && pos >= 0 && pos <= n, src)
      assert(mn <= mean && mean <= mx, s"$src: mean $mean outside [$mn, $mx]")
    }
    // full driver-side replay: md5 buckets, both count profiles, the
    // normalizer, per-doc sums, per-source rollup
    def bucket(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1024
    }
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val docs = Tables.load(spark, sf, "documents").collect()
      .map(r => (r.getLong(0), r.getString(3),
        r.getString(1).split(" ").toSeq))
      .map { case (id, src, w) =>
        (id, src, w.indices.dropRight(1).map(i => bucket(w(i) + " " + w(i + 1))))
      }
      .filter(_._3.nonEmpty)
    val raw = docs.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong)
    val tgt = docs.filter(_._2 == "src0").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val z = bitlen(raw.values.sum) - bitlen(docs.filter(_._2 == "src0").map(_._3.length.toLong).sum)
    val perDoc = docs.map { case (_, src, bs) =>
      src -> bs.map(b =>
        bitlen(tgt.getOrElse(b, 0L) + 1) - bitlen(raw(b) + 1) + z).sum
    }
    val expected = perDoc.groupBy(_._1).map { case (src, xs) =>
      val ws = xs.map(_._2)
      src -> ((ws.length.toLong, ws.sum / ws.length, ws.min, ws.max,
        ws.count(_ > 0).toLong))
    }
    assert(rows.map(_._1).toSet == expected.keySet)
    rows.foreach { case (src, n, mean, mn, mx, pos) =>
      assert((n, mean, mn, mx, pos) == expected(src), s"$src mismatch")
    }
  }

  test("q183 quality survivorship replays from a driver-side per-cluster argmax") {
    val rows = Training.q183(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, kept, removed, _) =>
      assert(kept >= 1 && kept + removed == n, src)
    }
    // clusters + logits replayed driver-side
    val clusters = graft.dedup.Dedup.splitSides(spark, sf)
      .select("doc_id", "source", "c0", "c1").collect()
      .map(r => (r.getLong(0), r.getString(1), (r.getLong(2), r.getLong(3))))
    val logit = Tables.load(spark, sf, "documents").collect().map { r =>
      val w = r.getString(1).split(" ")
      val n = w.length.toLong
      val distinctPpm = w.distinct.length.toLong * 1000000L / n
      val stopPpm = w.count(t => t == "the" || t == "a").toLong * 1000000L / n
      r.getLong(0) -> (-1000000L + 20000L * n + 4L * distinctPpm - 30L * stopPpm)
    }.toMap
    val winners = clusters.groupBy(_._3).map { case (_, docs) =>
      docs.minBy { case (id, _, _) => (-logit(id), id) }
    }
    val expected = winners.groupBy(_._2).map { case (src, ws) =>
      src -> ((ws.size.toLong, ws.map(_._1).sum))
    }
    val total = clusters.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    rows.foreach { case (src, n, kept, _, cks) =>
      assert(n == total(src), s"$src doc count")
      assert((kept, cks) == expected.getOrElse(src, (0L, 0L)),
        s"$src winners mismatch")
    }
    // non-vacuous: the argmax must have had a real choice somewhere
    assert(clusters.groupBy(_._3).exists(_._2.length > 1),
      "no multi-doc dup cluster at this SF — survivorship untested")
  }

  test("q185 near-dup ingest gate replays from the pair set and the batch split") {
    val rows = Training.q185(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, de, db, ing, _) =>
      assert(de + db + ing == n, s"$src: gate outcomes must partition the batch")
    }
    def bucket10(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val docs = Tables.load(spark, sf, "documents").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val isNew = docs.map { case (id, _) => id -> (bucket10(id) == 0) }.toMap
    val pairs = graft.dedup.Dedup.minHashPairsPortable(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val neigh = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val expected = docs.filter(d => isNew(d._1)).map { case (id, src) =>
      val ns = neigh.getOrElse(id, Array.empty[Long])
      val dupExisting = ns.exists(o => !isNew(o))
      val dupInBatch = !dupExisting && ns.exists(o => isNew(o) && o < id)
      (src, dupExisting, dupInBatch, id)
    }.groupBy(_._1).map { case (src, xs) =>
      src -> ((xs.length.toLong, xs.count(_._2).toLong,
        xs.count(_._3).toLong,
        xs.filter(x => !x._2 && !x._3).map(_._4).sum))
    }
    assert(rows.map(_._1).toSet == expected.keySet)
    rows.foreach { case (src, n, de, db, _, cks) =>
      val (en, ede, edb, ecks) = expected(src)
      assert((n, de, db, cks) == ((en, ede, edb, ecks)), s"$src mismatch")
    }
  }

  test("q189 novelty: attribution partitions the gram universe; first source gets 1e6") {
    val rows = Training.q189(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // driver-side replay
    val bySrc = Tables.load(spark, sf, "documents").collect()
      .map(r => (r.getString(3), r.getString(1).split(" ")))
      .groupBy(_._1).view.mapValues(_.flatMap { case (_, w) =>
        w.sliding(4).filter(_.length == 4).map(_.mkString(" "))
      }.toSet).toMap
    val firstOf = bySrc.toSeq.flatMap { case (s, gs) => gs.map(_ -> s) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    rows.foreach { case (src, nd, nn, ppm) =>
      assert(nd == bySrc(src).size.toLong, s"$src distinct grams")
      assert(nn == firstOf.count(_._2 == src).toLong, s"$src novel grams")
      assert(ppm == nn * 1000000L / nd, src)
      assert(nn <= nd)
    }
    // every gram is attributed to exactly one source
    assert(rows.map(_._3).sum == firstOf.size.toLong)
    // the lexicographically first source is all-novel by definition
    val first = rows.map(_._1).min
    assert(rows.find(_._1 == first).get._4 == 1000000L)
  }

  test("q197 cluster census replays from the split-side cluster keys") {
    val rows = Training.q197(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "no multi-doc cluster at this SF — census untested")
    val clusters = graft.dedup.Dedup.splitSides(spark, sf)
      .select("doc_id", "source", "c0", "c1").collect()
      .map(r => ((r.getLong(2), r.getLong(3)), r.getString(1)))
      .groupBy(_._1).values
      .map(xs => (xs.size.toLong, xs.map(_._2).distinct.size.toLong))
      .filter(_._1 >= 2).toSeq
    val expected = clusters.groupBy(identity).map { case ((sz, ns), cs) =>
      (sz, ns) -> ((cs.size.toLong, cs.size.toLong * sz))
    }
    assert(rows.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap == expected)
    rows.foreach { case (sz, ns, _, _) =>
      assert(sz >= 2 && ns >= 1 && ns <= sz)
    }
  }
}
