package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming novelty filter with BLOOM state — the approximate sibling
  * of [[StreamDedup]] for streams whose key universe is too large even
  * for a watermarked exact-key store: per-bucket state is a FIXED
  * `numBits`-bit Bloom filter (a few KB), so total state is
  * O(buckets · numBits) regardless of how many distinct keys flow
  * through — the only bounded-memory layout for "have we ever seen
  * this URL/document hash" at 100 TB/day.
  *
  * Trade (documented, inherent): a Bloom false positive DROPS a novel
  * row (rate ≈ (1 − e^(−k·n/m))^k — size `capacity` so n stays in the
  * design range); there are NO false negatives (a key admitted once is
  * never admitted again within an epoch). When a bucket's filter
  * exceeds `capacity` insertions it ROTATES (clears) — the standard
  * rotating-bloom pattern: old keys may re-admit after a rotation,
  * novel keys are never starved, and the FP rate stays bounded
  * forever. Exact-horizon semantics need [[StreamDedup]] instead.
  *
  * Keys hash with scala.util.hashing.MurmurHash3 (stable across JVM
  * runs and machines), double-hashing h1 + i·h2 for the k probe
  * positions (Kirsch–Mitzenmacher). Works identically in batch mode
  * (the transformWithState contract): one pass per bucket group.
  */
object StreamNovelty {

  case class KeyedRow(key: String, id: Long)
  case class BloomState(words: Array[Long], nAdded: Long)
  case class Novel(key: String, id: Long)

  private def hashes(key: String, numHashes: Int, numBits: Int): Array[Int] = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(key, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(key, 0x85ebca6b) | 1
    Array.tabulate(numHashes) { i =>
      math.floorMod(h1.toLong + i.toLong * h2.toLong, numBits.toLong).toInt
    }
  }

  /** Bucket a key for state parallelism (stable across runs). */
  def bucketOf(key: String, buckets: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key, 0x2545f491),
      buckets)

  class NoveltyFilter(numBits: Int, numHashes: Int, capacity: Long,
      ttl: TTLConfig) extends StatefulProcessor[Int, KeyedRow, Novel] {

    @transient private var state: ValueState[BloomState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BloomState](
        "bloom", Encoders.product[BloomState], ttl)

    override def handleInputRows(bucket: Int, rows: Iterator[KeyedRow],
        timerValues: TimerValues): Iterator[Novel] = {
      val nWords = (numBits + 63) / 64
      var st =
        if (state.exists()) state.get()
        else BloomState(new Array[Long](nWords), 0L)
      var words = st.words.clone()
      var n = st.nAdded
      val out = Vector.newBuilder[Novel]
      rows.foreach { r =>
        val pos = hashes(r.key, numHashes, numBits)
        var seen = true
        var i = 0
        while (i < pos.length) {
          if ((words(pos(i) / 64) >>> (pos(i) % 64) & 1L) == 0L) seen = false
          i += 1
        }
        if (!seen) {
          if (n >= capacity) { // rotate: bounded FP rate forever
            words = new Array[Long](nWords)
            n = 0L
          }
          i = 0
          while (i < pos.length) {
            words(pos(i) / 64) |= 1L << (pos(i) % 64)
            i += 1
          }
          n += 1
          out += Novel(r.key, r.id)
        }
      }
      state.update(BloomState(words, n))
      out.result().iterator
    }
  }

  /** Emit only never-before-seen keys (modulo the documented FP/rotate
    * trade). `buckets` spreads state across executors; `capacity` is
    * the per-bucket insertion budget before rotation — size
    * `numBits ≈ 10–15 · capacity` for ~1% FP. */
  def novel(rows: Dataset[KeyedRow], numBits: Int = 1 << 16,
      numHashes: Int = 5, buckets: Int = 64, capacity: Long = 4096L,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Novel] = {
    require(numBits >= 64 && numHashes >= 1 && buckets >= 1 && capacity >= 1,
      s"bad params bits=$numBits k=$numHashes buckets=$buckets cap=$capacity")
    import rows.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    rows
      .groupByKey(r => bucketOf(r.key, buckets))
      .transformWithState(
        new NoveltyFilter(numBits, numHashes, capacity, ttl),
        timeMode, OutputMode.Update())
  }
}
