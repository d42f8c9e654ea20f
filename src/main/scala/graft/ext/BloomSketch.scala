package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter as the MEMBERSHIP member of the mergeable-sketch shelf
  * (HLL = distinct counts q117, Count-Min = frequencies q147, DDSketch
  * = quantiles q159): a per-shard bit array that OR-merges into the
  * corpus filter without touching raw keys again, then prunes joins —
  * the runtime-filter pattern a 100 TB decontamination pass needs so
  * the 99.9% of fact rows that can't possibly match a benchmark key
  * never enter the anti-join shuffle.
  *
  * Layout: `numBits` bits packed into ⌈numBits/64⌉ longs, held as a
  * (word_idx, word) frame — the sketch's mergeable state. A key sets
  * `numHashes` bits at positions xxhash64(key, seed) mod numBits for
  * seed = 1..numHashes (independent seeded hashes — the standard
  * double-hashing-free construction). Bit-OR is associative,
  * commutative, idempotent ⇒ build and merge are deterministic under
  * any partition/merge order, and re-adding a key is a no-op (retry
  * idempotence for free).
  *
  * Guarantees: NO false negatives ever (a member's bits are all set by
  * construction); false-positive rate ≈ (1 − e^(−kn/m))^k for n keys,
  * m bits, k hashes — callers size m ≈ 10–15 bits/key for ~1% FP.
  *
  * Scale shape: [[addAll]] is one explode(k) + one keyed bit_or agg,
  * map-side combinable, output ≤ m/64 rows regardless of input size;
  * [[merge]] aggregates word frames only; [[packed]] collapses the
  * BOUNDED word frame to one array row (the sketch-sized collect the
  * shelf exists to make safe); [[mightContain]] is a pure broadcast
  * expression — no shuffle at probe time, which is the whole point:
  * the filter rides into the scan stage of the fact table.
  */
object BloomSketch {

  /** Bit positions a key sets: numHashes seeded-xxhash64 positions in
    * [0, numBits). Returned as an array column. */
  private def positions(key: Column, numBits: Int, numHashes: Int): Column = {
    val hashes = (1 to numHashes).map { seed =>
      // xxhash64's seed parameter is fixed (42) in the SQL function;
      // seeding via an appended literal column is equivalent and keeps
      // the expression codegen'd
      pmod(xxhash64(key, lit(seed)), lit(numBits.toLong))
    }
    array(hashes: _*)
  }

  /** Build (or extend) the sketch's word frame from a key column: one
    * explode + one (word_idx → bit_or) agg; ≤ ⌈numBits/64⌉ output rows.
    * Null keys are ignored (no membership claim). */
  def addAll(df: DataFrame, keyCol: String, numBits: Int,
      numHashes: Int = 5): DataFrame = {
    require(numBits >= 64, s"numBits must be >= 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    df.filter(col(keyCol).isNotNull)
      .select(explode(positions(col(keyCol), numBits, numHashes)).as("pos"))
      .select(expr("CAST(pos div 64 AS INT)").as("word_idx"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("bit"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(bit)").as("word"))
  }

  /** OR-merge shard word frames (idempotent, order-free): one keyed
    * agg over sketch rows only — never data. */
  def merge(shards: Seq[DataFrame]): DataFrame = {
    require(shards.nonEmpty, "merge needs at least one shard")
    shards.reduce(_ unionByName _)
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(word)").as("word"))
  }

  /** Collapse a word frame to ONE dense array<long> row of length
    * ⌈numBits/64⌉ (absent words = 0) — the bounded sketch-sized
    * collect, safe by construction. Cross-join (broadcast) this single
    * row onto any probe frame. */
  def packed(words: DataFrame, numBits: Int): DataFrame = {
    val nWords = (numBits + 63) / 64
    // dense fill via range left-join + one sorted collect — O(n log n)
    // on the BOUNDED word frame. (A map_from_entries + per-index m[i]
    // first cut was O(n²): Catalyst map lookup is a linear scan, and
    // 2^28 bits made the pack stage alone 298 s — found by the Stress
    // sub-stage probe, fixed to sub-second.)
    words.sparkSession.range(nWords).toDF("word_idx")
      .join(words.select(col("word_idx").cast("long").as("word_idx"),
        col("word")), Seq("word_idx"), "left")
      .select(col("word_idx"), coalesce(col("word"), lit(0L)).as("w"))
      .agg(sort_array(collect_list(struct(col("word_idx"), col("w"))))
        .as("e"))
      .select(expr("transform(e, x -> x.w)").as("bloom"))
  }

  /** Membership test expression against a `bloom` array<long> column
    * (from [[packed]], typically broadcast): true iff ALL numHashes
    * bits are set. False ⇒ DEFINITELY not a member; true ⇒ maybe. */
  def mightContain(key: Column, bloomArr: Column, numBits: Int,
      numHashes: Int = 5): Column = {
    val checks = (1 to numHashes).map { seed =>
      val pos = pmod(xxhash64(key, lit(seed)), lit(numBits.toLong))
      val word = element_at(bloomArr, floor(pos / lit(64L)).cast("int") + 1)
      call_function("bit_get", word, (pos % 64).cast("int")) === 1
    }
    checks.reduce(_ && _)
  }

  /** Bloom-pruned anti join — `fact` rows whose key is NOT in `dim`,
    * computed as (definitely-absent rows, passed through with zero
    * shuffle) ∪ (maybe-present rows, exact anti join). Result is
    * EXACTLY the plain anti join (no false negatives ⇒ every true
    * match reaches the exact stage), but only the ~FP-rate fraction of
    * non-matching fact rows pays the shuffle — the runtime-filter
    * economics at 100 TB. `dim` is scanned twice (sketch build +
    * exact join); at scale callers persist the built sketch instead.
    */
  def prunedAntiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bloom = broadcast(packed(addAll(dim, dimKey, numBits, numHashes), numBits))
    val flagged = fact.crossJoin(bloom)
      .withColumn("__maybe",
        mightContain(col(factKey), col("bloom"), numBits, numHashes))
      .drop("bloom")
    val definiteMiss = flagged.filter(!col("__maybe")).drop("__maybe")
    val maybe = flagged.filter(col("__maybe")).drop("__maybe")
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_anti")
    definiteMiss.unionByName(maybe)
  }
}
