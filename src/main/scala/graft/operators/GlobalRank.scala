package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructField, StructType}

/** Deterministic GLOBAL row numbering without a single-partition
  * window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY moves the
  * entire dataset through ONE task — the canonical anti-pattern a
  * 100 TB sort-rank job cannot survive (WindowExec even logs a
  * warning). The scalable layout is the two-phase zip: range-partition
  * by the sort key, sort within partitions, count per partition, then
  * assign rank = partition offset + local index. Partition boundaries
  * come from sampling and are NOT deterministic — but the rank IS,
  * because the key order is total: every row's rank equals its
  * position in the global order regardless of where boundaries fall.
  *
  * This is the documented case for dropping to the RDD layer
  * (genuine per-partition imperative logic): `zipWithIndex` performs
  * exactly the count-then-offset passes described above.
  *
  * @param df       input
  * @param sortCols a TOTAL order (include a tiebreaker id column —
  *                 duplicate sort keys would make ranks run-dependent)
  * @param rankCol  output column name, 1-based contiguous ranks
  */
object GlobalRank {

  /** Intermediates persisted (MEMORY_AND_DISK) by the two-pass
    * operators below. Bench and Verify both drain this registry per
    * catalog query (releaseCache + a `getPersistentRDDs` sweep); a
    * library user running many ranked queries in one long session must
    * do the same — call [[releaseCache]] between queries (or whenever
    * the last DataFrame built from these operators is no longer
    * needed), else full-corpus row copies accumulate in the block
    * manager, pinned by this queue's strong references. */
  private val cached =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  private def registerCached[T](rdd: org.apache.spark.rdd.RDD[T])
      : org.apache.spark.rdd.RDD[T] = { cached.add(rdd); rdd }

  /** Unpersist every intermediate this object has cached so far.
    * Safe to call while downstream DataFrames still exist — they
    * recompute from the range shuffle if re-read after release. */
  def releaseCache(): Unit = {
    var r = cached.poll()
    while (r != null) { r.unpersist(blocking = false); r = cached.poll() }
  }

  /** Reader for the prefix-sum value column, dispatched on the actual
    * integral type — `getLong` on a non-long column reads the wrong
    * bytes out of an UnsafeRow and returns GARBAGE (silently wrong
    * sums, not an error), so anything non-integral is rejected at
    * entry. Fractional sums are out of contract: partial-order float
    * addition would make the "deterministic prefix sum" claim false. */
  private def longReaderFor(dt: DataType, col: String): (InternalRow, Int) => Long =
    dt match {
      case LongType    => (r, i) => r.getLong(i)
      case IntegerType => (r, i) => r.getInt(i).toLong
      case ShortType   => (r, i) => r.getShort(i).toLong
      case ByteType    => (r, i) => r.getByte(i).toLong
      case other => throw new IllegalArgumentException(
        s"GlobalRank prefix sums need an integral value column; '$col' is " +
        s"$other — cast to LONG first (float sums would be partial-order-" +
        "dependent, defeating the operator's determinism contract)")
    }

  /** Per-partition cap on key segments in the keyed form's pass-1
    * collect. The contract is LOW-cardinality keys (a handful of
    * corpus sources); a high-cardinality key (e.g. a unique id) would
    * collect ~#rows of metadata to the driver and OOM it. The guard
    * fails IN THE EXECUTOR, before the collect can hurt the driver. */
  private[graft] val MaxSegmentsPerPartition = 100000

  /** Stand-in for NaN key values in segment identity — a singleton
    * that IS equal to itself, unlike boxed NaN under Scala's numeric
    * `==`. All NaN payloads collapse to one group, matching SQL window
    * PARTITION BY (and Spark's own float normalization in keys). */
  private[operators] case object NaNKey extends Serializable

  def withRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rank", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    // Tungsten lane (see withKeyedRankAndPrefixSum): zipWithIndex's
    // size pass and the appending map both stream reused UnsafeRows
    // straight into a projection — no external-Row codec round-trip.
    val ranked = sorted.queryExecution.toRdd.zipWithIndex()
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(schema)
        val appended = new GenericInternalRow(1)
        val joined = new JoinedRow
        it.map { case (row, i) =>
          appended.update(0, i + 1L)
          proj(joined(row, appended)): InternalRow
        }
      }
    org.apache.spark.sql.graft.Bridge
      .internalCreateDataFrame(spark, ranked, schema)
  }

  /** `ntile(k)` without the single-partition window: global rank via
    * [[withRank]], then the ntile assignment computed ARITHMETICALLY
    * from (rank, n, k) — `ntile` semantics exactly (first n mod k tiles
    * get ⌈n/k⌉ rows, the rest ⌊n/k⌋), so results match the windowed
    * form row for row while the data never funnels through one task.
    * The row count is read with one bounded driver action (a single
    * long — the same contract as [[withPrefixSum]]'s per-partition
    * totals collect). */
  def withNtile(df: DataFrame, sortCols: Seq[Column], tiles: Int,
      tileCol: String = "tile", partitions: Int = 0): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    val ranked = withRank(df, sortCols, "__rk", partitions)
    val n = df.count()
    val q = n / tiles
    val rem = n % tiles
    // rank → tile, integer-exact: ranks ≤ (q+1)·rem fall in the first
    // rem (larger) tiles, the rest advance every q ranks
    val tileExpr =
      if (q == 0) "CAST(__rk AS INT)"
      else s"""CAST(CASE WHEN __rk <= ${(q + 1) * rem}
              |  THEN (__rk + $q) div ${q + 1}
              |  ELSE $rem + (__rk - ${(q + 1) * rem} + ${q - 1}) div $q
              |END AS INT)""".stripMargin
    ranked.withColumn(tileCol,
      org.apache.spark.sql.functions.expr(tileExpr)).drop("__rk")
  }

  /** [[withRank]] and [[withPrefixSum]] fused into ONE sorted pass:
    * emits the 1-based global rank AND the exclusive prefix sum of
    * `valueCol` over the same total order, with a single range
    * shuffle and a single bounded driver collect (one (count, sum)
    * pair per partition). The ranked-metric queries (exact AP, AUC
    * variants) need both columns; calling the two single-output
    * forms would sort-shuffle the data twice for no reason.
    *
    * The sorted input is persisted (MEMORY_AND_DISK) because both
    * passes read it — same contract as [[withPrefixSum]]: long-lived
    * callers running many queries per session must unpersist stale
    * blocks between queries (Bench does; it measured stale-block
    * accumulation degrading later heavy queries 3×).
    *
    * @param sortCols a TOTAL order (include a tiebreaker — duplicate
    *                 keys would make rank and sum run-dependent)
    * @param valueCol long, non-null column to prefix-sum
    */
  def withRankAndPrefixSum(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, rankCol: String = "rank",
      sumCol: String = "cum_before", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val getVal = longReaderFor(sorted.schema(idx).dataType, valueCol)
    val schema = StructType(sorted.schema.fields ++ Seq(
      StructField(rankCol, LongType, nullable = false),
      StructField(sumCol, LongType, nullable = false)))
    // Tungsten lane + copy-before-persist, as in withKeyedRankAndPrefixSum
    val rdd = registerCached(sorted.queryExecution.toRdd
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true))
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partStats = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var c = 0L
      var s = 0L
      it.foreach { r => c += 1; s += getVal(r, idx) }
      Iterator((pid, c, s))
    }.collect() // bounded: one (int, long, long) per partition
    val cntOff = new Array[Long](n + 1)
    val sumOff = new Array[Long](n + 1)
    partStats.sortBy(_._1).foreach { case (pid, c, s) =>
      cntOff(pid + 1) = c
      sumOff(pid + 1) = s
    }
    for (i <- 1 to n) {
      cntOff(i) += cntOff(i - 1)
      sumOff(i) += sumOff(i - 1)
    }
    val bcC = spark.sparkContext.broadcast(cntOff)
    val bcS = spark.sparkContext.broadcast(sumOff)
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val proj = UnsafeProjection.create(schema)
      val appended = new GenericInternalRow(2)
      val joined = new JoinedRow
      var k = bcC.value(pid)
      var run = bcS.value(pid)
      it.map { r =>
        k += 1
        appended.update(0, k)
        appended.update(1, run)
        run += getVal(r, idx)
        proj(joined(r, appended)): InternalRow
      }
    }
    org.apache.spark.sql.graft.Bridge
      .internalCreateDataFrame(spark, out, schema)
  }

  /** [[withRankAndPrefixSum]] generalized to RESET at key boundaries —
    * the scalable form of `row_number()` / `sum(x) OVER (PARTITION BY
    * key ORDER BY …)` when the key is LOW-CARDINALITY (a handful of
    * corpus sources): the windowed plan sorts each key's ENTIRE extent
    * in one task, so at 100 TB with 4 sources, 4 tasks carry the whole
    * table — the same single-partition pathology [[withRank]]'s doc
    * warns about, per key. Here the data range-partitions on
    * (keyCols ++ sortCols), so a big key SPANS partitions; pass 1
    * collects per-(partition, key-segment) counts and sums (key
    * segments are contiguous within a sorted partition, so this is
    * ≤ #partitions + #keys rows of driver metadata — bounded like the
    * flat form's per-partition longs), and pass 2 emits
    * `offset(partition, key) + running local count/sum`, resetting at
    * each in-partition key change.
    *
    * Results match the windowed form row for row (spec-pinned against
    * `row_number`/windowed cumsum at several partition counts) because
    * (keyCols, sortCols) is a total order.
    *
    * @param keyCols  window PARTITION BY columns (by name; null keys
    *                 group together, like SQL window partitioning)
    * @param sortCols a total order WITHIN each key (include a
    *                 tiebreaker id column)
    * @param valueCol long column to prefix-sum; NULLs contribute 0
    *                 (window-sum skip semantics) but still take a rank
    * @param rankCol  1-based rank within the row's key
    * @param sumCol   exclusive per-key prefix sum of `valueCol`
    */
  def withKeyedRankAndPrefixSum(df: DataFrame, keyCols: Seq[String],
      sortCols: Seq[Column], valueCol: String, rankCol: String = "rank",
      sumCol: String = "cum_before", partitions: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "withKeyedRankAndPrefixSum needs key columns" +
      " — use withRankAndPrefixSum for the unkeyed form")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val rangeCols = keyCols.map(org.apache.spark.sql.functions.col) ++ sortCols
    val sorted = df.repartitionByRange(n, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
    val inSchema = sorted.schema
    val vIdx = inSchema.fieldIndex(valueCol)
    val getVal = longReaderFor(inSchema(vIdx).dataType, valueCol)
    val keyIdxs = keyCols.map(inSchema.fieldIndex).toArray
    val keyTypes = keyIdxs.map(i => inSchema(i).dataType)
    val schema = StructType(inSchema.fields ++ Seq(
      StructField(rankCol, LongType, nullable = false),
      StructField(sumCol, LongType, nullable = false)))
    // Both passes run on the Tungsten representation
    // (queryExecution.toRdd): the payload columns (often KB of text)
    // are never decoded to external Rows and never re-encoded on the
    // way out — the first cut through df.rdd/createDataFrame paid that
    // full codec round-trip and it dominated the operator's cost at
    // generated-corpus scale. Sort-output UnsafeRows are buffer-reused,
    // so rows are copy()d (a byte-array copy) before the persist that
    // lets pass 2 skip recomputing the range shuffle.
    val rdd = registerCached(sorted.queryExecution.toRdd
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true))
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // key values surface as Tungsten-native objects (UTF8String, boxed
    // primitives, Decimal) — all value-equal and serializable, which is
    // what the driver-side segment merge and the broadcast need.
    // Floating keys are NORMALIZED (-0.0 → 0.0, every NaN → the
    // canonical NaN) so segment equality matches SQL window
    // PARTITION BY semantics — JVM equals on boxed doubles treats
    // -0.0 != 0.0 and NaN != NaN, which would split groups the
    // windowed form merges. (Spark's range partitioner sorts all NaNs
    // together and -0.0 adjacent to 0.0, so normalized segments stay
    // contiguous within a sorted partition.)
    // NaN maps to a SELF-EQUAL singleton marker, not a canonical boxed
    // NaN: Scala == on boxed doubles is numeric (NaN != NaN always),
    // so a boxed-NaN map key could never be looked up again.
    val keyNorm: Array[Any => Any] = keyTypes.map {
      case DoubleType => (v: Any) => v match {
        case d: java.lang.Double =>
          if (d.isNaN) NaNKey
          else if (d.doubleValue() == 0.0) java.lang.Double.valueOf(0.0)
          else d
        case other => other
      }
      case FloatType => (v: Any) => v match {
        case f: java.lang.Float =>
          if (f.isNaN) NaNKey
          else if (f.floatValue() == 0.0f) java.lang.Float.valueOf(0.0f)
          else f
        case other => other
      }
      case _ => identity[Any] _
    }
    def keyOf(r: InternalRow): List[Any] =
      keyIdxs.indices.map(i =>
        keyNorm(i)(r.get(keyIdxs(i), keyTypes(i)))).toList
    def valOf(r: InternalRow): Long =
      if (r.isNullAt(vIdx)) 0L else getVal(r, vIdx)
    // pass 1: one (count, sum) per (partition, key segment) — segments
    // are contiguous within a sorted partition, so the collect is
    // bounded by #partitions + #keys entries
    val segStats = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, List[Any], Long, Long)]
      var cur: List[Any] = null
      var c = 0L
      var s = 0L
      it.foreach { r =>
        val k = keyOf(r)
        if (cur == null) cur = k
        else if (k != cur) {
          out += ((pid, cur, c, s)); cur = k; c = 0L; s = 0L
          // Fail in the EXECUTOR before a high-cardinality key (a
          // unique id, say) collects ~#rows of metadata and OOMs the
          // driver — the operator's contract is low-cardinality keys.
          if (out.length > MaxSegmentsPerPartition)
            throw new IllegalArgumentException(
              s"withKeyedRankAndPrefixSum saw > $MaxSegmentsPerPartition " +
              s"key segments in partition $pid (keys: ${keyCols.mkString(",")})" +
              " — the keyed two-pass form is for LOW-cardinality keys;" +
              " for high-cardinality keys use a windowed" +
              " row_number/sum OVER (PARTITION BY key), which scales" +
              " fine when no single key dominates")
        }
        c += 1; s += valOf(r)
      }
      if (cur != null) out += ((pid, cur, c, s))
      out.iterator
    }.collect()
    // per key: exclusive running (count, sum) offsets in partition order
    val offsets = scala.collection.mutable
      .HashMap.empty[(Int, List[Any]), (Long, Long)]
    segStats.groupBy(_._2).foreach { case (k, segs) =>
      var c = 0L
      var s = 0L
      segs.sortBy(_._1).foreach { case (pid, _, sc, ss) =>
        offsets((pid, k)) = (c, s)
        c += sc; s += ss
      }
    }
    val bc = spark.sparkContext.broadcast(offsets.toMap)
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val m = bc.value
      val proj = UnsafeProjection.create(schema)
      val appended = new GenericInternalRow(2)
      val joined = new JoinedRow
      var cur: List[Any] = null
      var rk = 0L
      var run = 0L
      it.map { r =>
        val k = keyOf(r)
        if (cur == null || k != cur) {
          cur = k
          val (oc, os) = m((pid, k))
          rk = oc; run = os
        }
        rk += 1
        appended.update(0, rk)
        appended.update(1, run)
        run += valOf(r)
        // proj reuses its output buffer — the operator-iterator contract
        proj(joined(r, appended)): InternalRow
      }
    }
    org.apache.spark.sql.graft.Bridge
      .internalCreateDataFrame(spark, out, schema)
  }

  /** Per-key `row_number()` without the per-key single-task sort — see
    * [[withKeyedRankAndPrefixSum]]. */
  def withKeyedRank(df: DataFrame, keyCols: Seq[String],
      sortCols: Seq[Column], rankCol: String = "rank",
      partitions: Int = 0): DataFrame = {
    val one = "__gr_one"
    withKeyedRankAndPrefixSum(
      df.withColumn(one, org.apache.spark.sql.functions.lit(1L)),
      keyCols, sortCols, one, rankCol, "__gr_cum", partitions)
      .drop(one, "__gr_cum")
  }

  /** Per-key exclusive prefix sum without the per-key single-task sort —
    * see [[withKeyedRankAndPrefixSum]]. */
  def withKeyedPrefixSum(df: DataFrame, keyCols: Seq[String],
      sortCols: Seq[Column], valueCol: String,
      outCol: String = "cum_before", partitions: Int = 0): DataFrame =
    withKeyedRankAndPrefixSum(df, keyCols, sortCols, valueCol,
      "__gr_rank", outCol, partitions).drop("__gr_rank")

  /** Deterministic GLOBAL running sum (exclusive prefix sum) of a long
    * column in `sortCols` order, without a single-partition window —
    * the scalable form of `sum(x) OVER (ORDER BY … ROWS UNBOUNDED
    * PRECEDING AND 1 PRECEDING)`. Same two-phase layout as [[withRank]]:
    * range-partition by the sort key, sort within partitions, then one
    * pass computing per-partition totals (ONE long per partition — a
    * bounded driver collect) and a second pass emitting
    * `offset(partition) + running local sum`. The prefix sum is
    * total-order-determined even though partition boundaries are
    * sampled.
    *
    * The sorted input is persisted (MEMORY_AND_DISK) because both
    * passes read it; callers running many queries per session should
    * unpersist stale blocks between queries (Bench does).
    *
    * @param sortCols a TOTAL order (include a tiebreaker — duplicate
    *                 keys would make the running sum run-dependent)
    * @param valueCol long column to sum
    * @param outCol   exclusive prefix sum: sum of `valueCol` over all
    *                 rows STRICTLY BEFORE this row in the global order
    */
  def withPrefixSum(df: DataFrame, sortCols: Seq[Column], valueCol: String,
      outCol: String = "cum_before", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val getVal = longReaderFor(sorted.schema(idx).dataType, valueCol)
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    // Tungsten lane + copy-before-persist, as in withKeyedRankAndPrefixSum
    val rdd = registerCached(sorted.queryExecution.toRdd
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true))
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(r => s += getVal(r, idx))
      Iterator((pid, s))
    }.collect() // bounded: one (int, long) per partition
    val offsets = new Array[Long](n + 1)
    partSums.sortBy(_._1).foreach { case (pid, s) => offsets(pid + 1) = s }
    for (i <- 1 to n) offsets(i) += offsets(i - 1)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val proj = UnsafeProjection.create(schema)
      val appended = new GenericInternalRow(1)
      val joined = new JoinedRow
      var run = bc.value(pid)
      it.map { r =>
        appended.update(0, run)
        run += getVal(r, idx)
        proj(joined(r, appended)): InternalRow
      }
    }
    org.apache.spark.sql.graft.Bridge
      .internalCreateDataFrame(spark, out, schema)
  }
}
