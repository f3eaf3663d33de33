package graft.operators

import graft.SparkTestBase
import graft.analytics.{Relational, TextAnalytics}
import graft.operators.Multimodal
import org.apache.spark.sql.functions.{col, to_date, round => sround, sum => ssum}

/** Semantics of the round-8 diagnostic gates (q280-q283) — the stage-wise
  * bisection probes of the r7 red-cell family — plus the q202 gate-shape
  * regression (no large-magnitude rounded double ships). Driver-side
  * replays on sf0.001.
  */
class Round8OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def dailyCents(): Map[java.time.LocalDate, Long] =
    graft.core.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day"),
        sround(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(_.getLong(1)).sum).toMap

  test("daily cents audit: one row replaying count/sum/bounds/checksum") {
    val daily = dailyCents()
    val r = Relational.dailyCentsAudit(spark, sf).collect() match {
      case Array(only) => only
    }
    assert(r.getLong(0) === daily.size.toLong)
    assert(r.getLong(1) === daily.values.sum)
    assert(r.getDate(2).toLocalDate === daily.keys.min)
    assert(r.getDate(3).toLocalDate === daily.keys.max)
    val expectChecksum = daily.map { case (d, c) =>
      BigInt(c) * (d.toEpochDay % 97 + 1)
    }.sum
    assert(BigInt(r.getLong(4)) === expectChecksum)
  }

  test("spine audit: zero-filled calendar replay incl. zero-day count") {
    val daily = dailyCents()
    val (d0, d1) = (daily.keys.min, daily.keys.max)
    val nDays = d1.toEpochDay - d0.toEpochDay + 1
    val r = Relational.spineAudit(spark, sf).collect() match {
      case Array(only) => only
    }
    assert(r.getLong(0) === nDays)
    assert(r.getDate(1).toLocalDate === d0)
    assert(r.getDate(2).toLocalDate === d1)
    assert(r.getLong(3) === nDays - daily.count(_._2 != 0L))
    assert(r.getLong(4) === daily.values.sum)
    val expectChecksum = (0L until nDays).map { i =>
      val d = d0.plusDays(i)
      BigInt(daily.getOrElse(d, 0L)) * (d.toEpochDay % 97 + 1)
    }.sum
    assert(BigInt(r.getLong(5)) === expectChecksum)
  }

  test("window probe: pinned-date rolling sums match a direct replay") {
    val daily = dailyCents()
    val d0 = daily.keys.min
    def x(d: java.time.LocalDate): Long = daily.getOrElse(d, 0L)
    val got = Relational.spineWindowProbe(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === Set(60, 130, 200).map(o => d0.plusDays(o.toLong)))
    got.foreach { case (d, (sy, sxy, hi, lo)) =>
      // window = lags L=0..30 ending at d; source day for lag L is d-(30-L)
      val pts = (0 to 30).map(l => (l, x(d.minusDays((30 - l).toLong))))
      assert(sy === pts.map(_._2).sum, s"$d sy")
      assert(sxy === pts.map { case (l, y) => l.toLong * y }.sum, s"$d sxy")
      val fp = pts.map { case (l, y) => (BigInt(1) << l) * y }.sum
      assert(BigInt(hi) * BigInt(1000000000L) + lo === fp, s"$d ewma_fp")
      assert(lo >= 0L && lo < 1000000000L)
    }
  }

  test("cms bucket probe: cells re-aggregate to q209's min estimate") {
    val probe = TextAnalytics.cmsBucketProbe(spark, sf).collect()
    assert(probe.length === 20) // 5 words x 4 rows
    val byWord = probe.groupBy(_.getString(0))
    assert(byWord.size === 5)
    byWord.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted === Seq(0, 1, 2, 3))
      rows.foreach { r =>
        val (bucket, cell, exact) = (r.getLong(3), r.getLong(4), r.getLong(1))
        assert(bucket >= 0L && bucket < 1024L)
        // a CMS cell can never undercount the word it contains
        assert(cell >= exact)
      }
    }
    // the probe's min cell per word IS q209's estimate for that word
    val audit = TextAnalytics.cmsAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    byWord.foreach { case (w, rows) =>
      assert(rows.map(_.getLong(4)).min === audit(w), s"word $w")
    }
  }

  test("frame sample: spans tile the payload; checksums replay per byte") {
    val texts = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Multimodal.frameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet === texts.keySet) // every doc has >= 1 sampled frame
    rows.foreach { r =>
      val (id, idx, off, len, ck) =
        (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val bytes = texts(id).getBytes("UTF-8")
      val n = bytes.length.toLong
      val nf = 1 + (n % 7).toInt
      assert(idx % 2 === 0 && idx < nf)
      assert(off === idx * n / nf)
      assert(len === (idx + 1) * n / nf - idx * n / nf)
      val expect = (off until off + len).map(j => (bytes(j.toInt) & 0xFF).toLong).sum
      assert(ck === expect, s"doc $id frame $idx")
    }
  }

  test("media features: all 8 dims dense; counts sum to byte length") {
    val texts = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Multimodal.byteHistogramFeatures(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.size === texts.size)
    byDoc.foreach { case (id, rs) =>
      assert(rs.map(_.getInt(1)).sorted === (0 until 8))
      val n = texts(id).getBytes("UTF-8").length.toLong
      assert(rs.map(_.getLong(2)).sum === n, s"doc $id histogram mass")
      rs.foreach { r =>
        assert(r.getLong(3) === r.getLong(2) * 1000000L / math.max(n, 1L))
      }
    }
  }

  test("resize plan: aspect preserved within integral truncation; caps hold") {
    val rows = Multimodal.resizePlan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, nw, nh, scaled) = (r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6))
      val longest = math.max(w, h)
      if (scaled == 0) {
        assert(longest <= 224 && nw === w && nh === h)
      } else {
        assert(longest > 224)
        assert(nw === w * 224 / longest && nh === h * 224 / longest)
        assert(math.max(nw, nh) <= 224 && math.min(nw, nh) >= 1)
      }
    }
  }

  test("frame dedup: groups replay the frame rows; only cross-doc emit") {
    val frames = Multimodal.frameSample(spark, sf).collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(0))) // len, ck, doc
    val expect = frames.groupBy(f => (f._1, f._2))
      .filter(_._2.map(_._3).distinct.size >= 2)
      .map { case (k, fs) =>
        k -> (fs.size.toLong, fs.map(_._3).distinct.size.toLong,
          fs.map(_._3).min, fs.map(_._3).max)
      }
    val got = Multimodal.frameDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === expect)
  }

  test("frame dedup verify: same groups as q287, md5 verdicts replay") {
    val cand = Multimodal.frameDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val ver = Multimodal.frameDedupVerify(spark, sf).collect()
    // the verify pass covers exactly the candidate groups
    assert(ver.map(r => (r.getLong(0), r.getLong(1))).toSet === cand.keySet)
    val texts = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // replay each group's distinct-slice count from the raw payloads
    val slices = Multimodal.frameSample(spark, sf).collect().map { r =>
      val bytes = texts(r.getLong(0)).getBytes("UTF-8")
      val off = r.getLong(3).toInt
      val len = r.getLong(4).toInt
      ((r.getLong(4), r.getLong(5)),
        new String(bytes, off, len, "UTF-8"))
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    ver.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert((r.getLong(2), r.getLong(3)) === cand(k), s"group $k shape")
      assert(r.getLong(4) === slices(k).toLong, s"group $k distinct slices")
      assert(r.getInt(5) === (if (slices(k) == 1) 1 else 0))
    }
    // the natural random-word corpus has no byte-identical frames: every
    // candidate is a collision, which is the measurement q289 exists for
    assert(ver.forall(_.getInt(5) === 0))
  }

  test("media ann: one query's top-3 replays the exact cosine ranking") {
    val feats = Multimodal.byteHistogramFeatures(spark, sf).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(rs => rs.sortBy(_.getInt(1)).map(_.getLong(2))).toMap
    val qid = 0L
    val qv = feats(qid)
    val ranked = feats.toSeq.filter(_._1 != qid).map { case (id, v) =>
      val dot = qv.zip(v).map { case (a, b) => a * b }.sum
      val cos = BigDecimal(dot.toDouble /
        (math.sqrt(qv.map(x => x * x).sum.toDouble)
          * math.sqrt(v.map(x => x * x).sum.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, dot, cos)
    }.sortBy { case (id, _, cos) => (-cos, id) }.take(3)
    val got = Multimodal.mediaFeatureAnn(spark, sf).collect()
      .filter(_.getLong(0) == qid).sortBy(_.getInt(2))
      .map(r => (r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === ranked.map(t => (t._1, t._2, t._3)))
  }

  test("resize plan over a persisted metadata table is payload-free") {
    val s = spark
    import s.implicits._
    // a standalone metadata table — no payload column anywhere
    val meta = Seq((1L, "image/x", 640, 480), (2L, "image/x", 100, 200),
      (3L, "image/x", 2240, 224)).toDF("doc_id", "media_type", "width", "height")
    val plan = Multimodal.resizePlanOf(meta)
    val rows = plan.collect().map(r =>
      r.getLong(0) -> (r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    assert(rows(1L) === ((224, 168, 1)))   // 640x480 -> fit 224 wide
    assert(rows(2L) === ((100, 200, 0)))   // inside the box: untouched
    assert(rows(3L) === ((224, 22, 1)))    // extreme aspect survives
    // pure projection: no decode stage, no shuffle in the physical plan
    val p = plan.queryExecution.executedPlan.toString
    assert(!p.contains("MapPartitions") && !p.contains("Exchange"), p)
  }

  test("rolling trend gate ships exact integers only (no rounded double)") {
    val df = Relational.rollingTrend(spark, sf)
    assert(df.columns.toSeq === Seq("day", "rev_cents", "slope_fp"))
    assert(!df.schema.fields.exists(_.dataType ==
      org.apache.spark.sql.types.DoubleType))
  }
}
