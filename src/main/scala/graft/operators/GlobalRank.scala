package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
    val schema = StructType(sorted.schema.fields ++ Seq(
      StructField(rankCol, LongType, nullable = false),
      StructField(sumCol, LongType, nullable = false)))
    // Tungsten lane + copy-before-persist, as in withKeyedRankAndPrefixSum
    val rdd = sorted.queryExecution.toRdd
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partStats = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var c = 0L
      var s = 0L
      it.foreach { r => c += 1; s += r.getLong(idx) }
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
        run += r.getLong(idx)
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
    val rdd = sorted.queryExecution.toRdd
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // key values surface as Tungsten-native objects (UTF8String, boxed
    // primitives, Decimal) — all value-equal and serializable, which is
    // what the driver-side segment merge and the broadcast need
    def keyOf(r: InternalRow): List[Any] =
      keyIdxs.indices.map(i => r.get(keyIdxs(i), keyTypes(i))).toList
    def valOf(r: InternalRow): Long =
      if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
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
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    // Tungsten lane + copy-before-persist, as in withKeyedRankAndPrefixSum
    val rdd = sorted.queryExecution.toRdd
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(idx))
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
        run += r.getLong(idx)
        proj(joined(r, appended)): InternalRow
      }
    }
    org.apache.spark.sql.graft.Bridge
      .internalCreateDataFrame(spark, out, schema)
  }
}
