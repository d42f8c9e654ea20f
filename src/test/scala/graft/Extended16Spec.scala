package graft

import org.apache.spark.sql.functions._

import graft.queries.{Extended16, Tables}

/** Brute-force cross-checks for the q170–q177 shelf: each query's
  * integer ppm/micro-nat arithmetic recomputed in plain Scala over the
  * collected sf0.001 fixture (tiny — hundreds of docs), so the
  * distributed plan is pinned against an independent scalar
  * implementation, not just the DuckDB oracle's SQL transliteration.
  * Floors over `math.log` match the engines because all three run the
  * same IEEE-754 double ln. */
class Extended16Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String, String, String, Long)] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("q170: ECE in ppm == brute-force integer fold") {
    val d = docs()
    val mx = d.map(_._5).max
    val rows = d.map { case (_, _, lang, _, nChars) =>
      val conf = nChars * 1000000L / mx
      val bin = math.min(conf / 100000L, 9L)
      (bin, conf, if (lang == "en") 1L else 0L)
    }
    val bins = rows.groupBy(_._1).map { case (b, g) =>
      val n = g.size.toLong
      val nPos = g.map(_._3).sum
      val sumConf = g.map(_._2).sum
      (b, (n, nPos, sumConf, math.abs(nPos * 1000000L - sumConf)))
    }
    val ece = bins.values.map(_._4).sum / bins.values.map(_._1).sum
    val got = Extended16.q170(spark, dir).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("sum_conf_ppm"), r.getAs[Long]("gap_abs"),
          r.getAs[Long]("ece_ppm"))).toMap
    assert(got.keySet === bins.keySet)
    bins.foreach { case (b, (n, nPos, sumConf, gap)) =>
      assert(got(b) === ((n, nPos, sumConf, gap, ece)), s"bin $b")
    }
  }

  test("q171: AP and P@100 == brute-force ranked walk") {
    val d = docs()
    val ranked = d
      .map { case (id, _, lang, _, nChars) =>
        (nChars, id, if (lang == "en") 1L else 0L)
      }
      .sortBy { case (score, id, _) => (-score, id) }
    var tp = 0L
    var apSum = 0L
    var tp100 = 0L
    ranked.zipWithIndex.foreach { case ((_, _, rel), i) =>
      val k = i + 1L
      if (rel == 1L) {
        apSum += (tp + 1L) * 1000000L / k
        tp += 1L
        if (k <= 100L) tp100 += 1L
      }
    }
    val nPos = ranked.map(_._3).sum
    val got = Extended16.q171(spark, dir).head()
    assert(got.getAs[Long]("n") === ranked.size.toLong)
    assert(got.getAs[Long]("n_pos") === nPos)
    assert(got.getAs[Long]("ap_ppm") === apSum / nPos)
    assert(got.getAs[Long]("p100_ppm") === tp100 * 10000L)
  }

  test("q172: Heaps curve and Chao1 == brute-force first-occurrence scan") {
    val d = docs()
    val mx = d.map(_._1).max
    val toks = d.flatMap { case (id, text, _, _, _) =>
      val bucket = id * 10L / (mx + 1L)
      text.trim.split("\\s+").map(t => (bucket, t))
    }
    val perTok = toks.groupBy(_._2).map { case (t, g) =>
      (t, g.map(_._1).min, g.size.toLong)
    }
    val newTypes = perTok.groupBy(_._2).map { case (b, g) => b -> g.size.toLong }
    val bucketToks = toks.groupBy(_._1).map { case (b, g) => b -> g.size.toLong }
    val v = perTok.size.toLong
    val f1 = perTok.count(_._3 == 1L).toLong
    val f2 = perTok.count(_._3 == 2L).toLong
    val chao1 = v * 1000000L + (f1 * (f1 - 1L) * 1000000L) / (2L * (f2 + 1L))
    val got = Extended16.q172(spark, dir).collect()
    var cumT = 0L
    var cumN = 0L
    got.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("new_types") === newTypes.getOrElse(b, 0L), s"b=$b")
      assert(r.getAs[Long]("bucket_tokens") === bucketToks(b), s"b=$b")
      cumT += newTypes.getOrElse(b, 0L)
      cumN += bucketToks(b)
      assert(r.getAs[Long]("cum_types") === cumT, s"b=$b")
      assert(r.getAs[Long]("cum_tokens") === cumN, s"b=$b")
      assert(r.getAs[Long]("v_total") === v)
      assert(r.getAs[Long]("chao1_micro") === chao1)
    }
    assert(cumT === v, "final cumulative types == total vocabulary")
  }

  test("q173: JS divergence micro-nats == brute-force double-ln fold") {
    val d = docs()
    val counts = d
      .flatMap { case (_, text, _, source, _) =>
        text.trim.split("\\s+").map(t => (source, t))
      }
      .groupBy(identity).map { case ((s, t), g) => ((s, t), g.size.toLong) }
    val totals = counts.groupBy(_._1._1).map { case (s, g) =>
      s -> g.values.sum
    }
    val sources = totals.keys.toSeq.sorted
    def js(s1: String, s2: String): (Long, Long, Long, Long) = {
      val at = totals(s1); val bt = totals(s2)
      val toks = counts.keys.collect {
        case (s, t) if s == s1 || s == s2 => t
      }.toSet
      var sa = 0L; var sb = 0L
      var shared = 0L; var only1 = 0L; var only2 = 0L
      toks.foreach { t =>
        val a = counts.getOrElse((s1, t), 0L)
        val b = counts.getOrElse((s2, t), 0L)
        val denom = (a * bt + b * at).toDouble
        if (a > 0)
          sa += a * math.floor(1000000.0 * math.log(2.0 * a * bt / denom)).toLong
        if (b > 0)
          sb += b * math.floor(1000000.0 * math.log(2.0 * b * at / denom)).toLong
        if (a > 0 && b > 0) shared += 1
        else if (b == 0) only1 += 1
        else only2 += 1
      }
      // the query clamps each (mathematically non-negative) KL half at
      // 0 before dividing, so truncating vs flooring division can't
      // diverge on the floor-noise-negative case
      (math.max(sa, 0L) / (2 * at) + math.max(sb, 0L) / (2 * bt),
        shared, only1, only2)
    }
    val got = Extended16.q173(spark, dir).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2")) ->
        (r.getAs[Long]("js_micro_nat"), r.getAs[Long]("n_shared"),
          r.getAs[Long]("n_only_1"), r.getAs[Long]("n_only_2"))).toMap
    val pairs = for {
      i <- sources.indices; j <- (i + 1) until sources.size
    } yield (sources(i), sources(j))
    assert(got.keySet === pairs.toSet)
    pairs.foreach { case (s1, s2) =>
      assert(got((s1, s2)) === js(s1, s2), s"pair ($s1, $s2)")
    }
    // JS is bounded by ln 2 and the floors keep it non-positive-biased:
    // every emitted value must sit in [0, ln2·1e6] up to floor slack
    got.values.foreach { case (v, _, _, _) =>
      assert(v >= -3L && v <= 693148L, s"JS out of [0, ln2] band: $v")
    }
  }

  test("q178: entropy micro-nats == brute-force fold, corpus row re-folds " +
      "shared tokens as one count") {
    val d = docs()
    val toks = d.flatMap { case (_, text, _, source, _) =>
      text.trim.split("\\s+").map(t => (source, t))
    }
    def h(group: Seq[String]): (Long, Long, Long) = {
      val counts = group.groupBy(identity).map(_._2.size.toLong)
      val n = counts.sum
      val types = counts.size.toLong
      val sClnc = counts.map(c =>
        c * math.floor(1000000.0 * math.log(c.toDouble)).toLong).sum
      (n, types,
        math.floor(1000000.0 * math.log(n.toDouble)).toLong - sClnc / n)
    }
    val want = toks.groupBy(_._1).map { case (s, g) =>
      s -> h(g.map(_._2))
    } + ("__all__" -> h(toks.map(_._2)))
    val got = Extended16.q178(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("entropy_micro_nat"))).toMap
    assert(got === want)
    // uniform bound: H <= ln(types); templated repetition pulls it down
    got.foreach { case (s, (_, types, hMicro)) =>
      assert(hMicro <= math.ceil(1000000.0 * math.log(types.toDouble)).toLong + 1,
        s"source $s entropy above ln(V)")
      assert(hMicro >= 0L, s"source $s negative entropy")
    }
  }

  test("q174: Zipf profile == brute-force sorted-count walk") {
    val d = docs()
    val counts = d
      .flatMap(_._2.trim.split("\\s+"))
      .groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    val ranked = counts.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((_, c), i) => (i + 1L, c) }
      .filter { case (r, _) => (r & (r - 1)) == 0L }
    def lnMicro(x: Long): Long =
      math.floor(1000000.0 * math.log(x.toDouble)).toLong
    val want = ranked.zipWithIndex.map { case ((r, c), i) =>
      val slope = if (i == 0) None
        else {
          val (pr, pc) = ranked(i - 1)
          val dy = lnMicro(pc) - lnMicro(c)
          val dx = lnMicro(r) - lnMicro(pr)
          Some(-((dy * 1000000L) / dx))
        }
      (r, c, lnMicro(r), lnMicro(c), slope)
    }
    val got = Extended16.q174(spark, dir).collect().map { r =>
      (r.getAs[Long]("rank"), r.getAs[Long]("cnt"),
        r.getAs[Long]("ln_rank_micro"), r.getAs[Long]("ln_cnt_micro"),
        Option(r.get(4)).map(_.asInstanceOf[Long]))
    }.toSeq
    assert(got === want)
  }

  test("q177: per-source TTR == brute-force gram sets") {
    val d = docs()
    val got = Extended16.q177(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n")) ->
        (r.getAs[Long]("total_grams"), r.getAs[Long]("distinct_grams"),
          r.getAs[Long]("ttr_ppm"))).toMap
    (1 to 3).foreach { n =>
      val grams = d.flatMap { case (_, text, _, source, _) =>
        val t = text.trim.split("\\s+")
        if (t.length >= n) t.sliding(n).map(g => (source, g.mkString(" ")))
        else Iterator.empty
      }
      grams.groupBy(_._1).foreach { case (src, g) =>
        val total = g.size.toLong
        val distinct = g.map(_._2).distinct.size.toLong
        assert(got((src, n.toLong)) ===
          ((total, distinct, distinct * 1000000L / total)), s"$src n=$n")
      }
    }
  }
}
