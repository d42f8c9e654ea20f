package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Ranked retrieval as a LIBRARY operator — the q166 inverted-index +
  * q111 BM25 query shapes promoted to a build/search pair a curation
  * pipeline calls directly ("find the docs most like this
  * contamination probe", "pull the top-k docs for this topic").
  *
  * Layout mirrors a production search index:
  *  - [[build]] materializes the POSTINGS frame (token, doc, tf, dl) —
  *    the exploded-and-aggregated corpus, shuffled once on token, plus
  *    the token DICTIONARY (df, cf) derived from it; corpus stats
  *    (N docs, Σ dl) are two driver longs — broadcast metadata, the
  *    IVF-centroid contract, never a per-row join input.
  *  - [[Built.search]] filters postings to the query terms (a bounded
  *    IN over the token-keyed frame — at 100 TB the postings table is
  *    written bucketed by token so this prunes to the terms' buckets),
  *    joins the broadcast dictionary, scores BM25 per (doc, term) in
  *    one deterministic double expression floored to nano-units, and
  *    sums per doc as BIGINT (aggregation-order-proof, the q111
  *    doctrine). Top-k is TakeOrderedAndProject — bounded, never a
  *    global sort.
  *
  * `postingCap` bounds each token's posting list at build time via the
  * token-KEYED row_number ≤ cap filter (Spark rewrites it to
  * WindowGroupLimit, so map tasks forward at most `cap` rows per token
  * — a stopword's full posting list at 100 TB is the corpus). Capping
  * trades recall for bound: a doc evicted from a term's postings scores
  * 0 on that term. df/cf stay TRUE corpus statistics either way —
  * computed before the cap — so capped scores equal uncapped scores for
  * every doc that survived the cap.
  */
object Index {

  /** A built index: postings + dictionary frames (persist/write them
    * for reuse) and the two corpus scalars. `cached` holds the pinned
    * tokenized frame(s) behind this index — one per [[build]], the
    * union of the shards' for [[merge]] — call [[unpersist]] when the
    * index frames have been materialized/written. The catalog QUERY
    * functions (q181/q185/q187/q188/q190/q198) deliberately delegate
    * that cleanup to the harness (Bench/Verify drop all persisted
    * blocks between queries); a library user composing several
    * index-backed queries in one session should unpersist (or
    * [[writeBucketed]] then unpersist) once the index is
    * materialized, or corpus-sized pinned frames accumulate. */
  final case class Built(postings: DataFrame, dictionary: DataFrame,
      nDocs: Long, sumDl: Long, cached: Seq[DataFrame] = Nil) {

    /** Drop the pinned tokenized frame(s). */
    def unpersist(): Unit = cached.foreach(_.unpersist(false))

    /** BM25 top-k (k1 = 1.2, b = 0.75), scores in floor-nano units —
      * exactly q111's scoring. Ties break doc-id ascending.
      * @return (doc_id, score_nano, n_terms) — n_terms = query terms
      *         matched in the doc's (capped) postings */
    def search(terms: Seq[String], k: Int): DataFrame = {
      require(terms.nonEmpty, "search needs at least one term")
      require(k >= 1, s"k must be >= 1, got $k")
      val avgdl = sumDl.toDouble / nDocs.toDouble
      postings
        .filter(col("token").isin(terms: _*))
        .join(broadcast(dictionary), "token")
        .withColumn("idf",
          log(lit(1.0) + (lit(nDocs.toDouble) - col("df").cast("double")
            + lit(0.5)) / (col("df").cast("double") + lit(0.5))))
        .withColumn("tfn",
          col("tf").cast("double") * lit(2.2) /
            (col("tf").cast("double") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("dl").cast("double") / lit(avgdl))))
        .withColumn("s_nano", floor(col("idf") * col("tfn")
          * lit(1000000000.0)).cast("long"))
        .groupBy(col("doc_id"))
        .agg(sum(col("s_nano")).as("score_nano"),
          count(lit(1)).as("n_terms"))
        .orderBy(col("score_nano").desc, col("doc_id").asc)
        .limit(k)
    }
  }

  /** Sum-merge shard indexes built over DISJOINT document sets — the
    * retrieval member of the mergeable-state family ([[Profile]] token
    * counts, [[LanguageModel]] bigram counts, [[BloomSketch]] words):
    * each ingest batch builds its shard index independently; the
    * corpus index folds WITHOUT re-tokenizing anything. Exact because
    * every statistic is decomposable over disjoint docs: postings
    * union (a doc's rows live in exactly one shard), df/cf sum, the
    * two corpus scalars sum — merge(build(A), build(B)) ≡ build(A∪B),
    * frame for frame.
    *
    * `postingCap` re-caps the MERGED posting lists (uncapped shards in
    * → the same lists build(A∪B, cap) would produce; shards built with
    * their own caps stay capped-per-shard — a different, documented
    * semantic, since a shard cap already dropped rows by local doc
    * order). */
  def merge(shards: Seq[Built], postingCap: Option[Int] = None): Built = {
    require(shards.nonEmpty, "merge needs at least one shard")
    postingCap.foreach(c => require(c >= 1, s"postingCap must be >= 1, got $c"))
    val unioned = shards.map(_.postings).reduce(_ unionByName _)
    val postings = postingCap.fold(unioned) { cap =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("token")).orderBy(col("doc_id"))
      unioned.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= cap).drop("__rn")
    }
    val dict = shards.map(_.dictionary).reduce(_ unionByName _)
      .groupBy(col("token"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
    Built(postings, dict, shards.map(_.nDocs).sum, shards.map(_.sumDl).sum,
      shards.flatMap(_.cached))
  }

  /** Build the index frames from a document table. The corpus is
    * tokenized ONCE: the (doc, toks, dl) frame is pinned
    * (MEMORY_AND_DISK) so the eager 2-long stats read and the lazy
    * postings/dictionary build share one tokenize pass instead of two
    * full scans — call [[Built.unpersist]] once the frames are
    * materialized (the whole-run bench drops stale blocks between
    * queries anyway). */
  def build(docs: DataFrame, textCol: String, idCol: String,
      postingCap: Option[Int] = None): Built = {
    postingCap.foreach(c => require(c >= 1, s"postingCap must be >= 1, got $c"))
    val d = docs
      .select(col(idCol).as("doc_id"), TextFns.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = d.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    val tf = d
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .groupBy(col("token"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    // TRUE df/cf from the uncapped frame (tf is one row per (doc,
    // token), so count(*) = df); the cap bounds only the posting list
    val dict = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val postings = postingCap.fold(tf) { cap =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("token")).orderBy(col("doc_id"))
      tf.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= cap).drop("__rn")
    }
    Built(postings, dict, stats.getLong(0), stats.getLong(1), Seq(d))
  }

  /** Persist a built index with postings BUCKETED by token — the wired
    * form of the 100 TB contract in [[Built.search]]'s doc: a probe's
    * `token IN (terms)` filter then prunes the postings SCAN to the
    * terms' buckets (FileSourceScan reports SelectedBucketsCount ≤
    * |terms|) instead of rescanning the whole postings frame per
    * query. Dictionary and the two corpus scalars persist alongside
    * (the dictionary stays a plain table — it is broadcast at probe
    * time, never shuffled). Returns the reloaded catalog-backed index;
    * the in-memory `built` can be unpersisted after this.
    *
    * Bucketing metadata lives in the session catalog ([[
    * graft.store.BucketedStore]]'s contract), so `name` is a table
    * prefix: `<name>_postings`, `<name>_dict`, `<name>_stats` —
    * validated as a bare SQL identifier (it is interpolated into DROP
    * TABLE and resolved to a filesystem path).
    *
    * SINGLE WRITER assumed (the K2 idempotent-append precedent): the
    * stale-table cleanup drops catalog entries AND orphaned data
    * paths, so a concurrent reader of the same index name could see
    * its frames vanish mid-scan. Writers coordinate externally;
    * readers re-open via [[loadBucketed]] AFTER a write completes —
    * the reopened frames are consistent (spec-pinned). */
  def writeBucketed(built: Built, spark: SparkSession, name: String,
      numBuckets: Int = 32): Built = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"index name must be a bare SQL identifier, got '$name'")
    // with the in-memory session catalog a managed table's LOCATION can
    // outlive the catalog entry (fresh JVM, old warehouse dir) and
    // Overwrite then refuses to create over it — drop both forms of
    // staleness first (a Hive metastore wouldn't need the second step).
    // The orphan path resolves under the CURRENT database's location
    // (not a hard-coded warehouse root — a non-default database or a
    // custom DB location would otherwise skip, or worse hit, the
    // wrong path).
    val dbLoc = spark.sessionState.catalog
      .getDatabaseMetadata(spark.catalog.currentDatabase).locationUri
    Seq(s"${name}_postings", s"${name}_dict", s"${name}_stats")
      .foreach { table =>
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val p = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(dbLoc), table.toLowerCase)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
    built.postings.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, "token").sortBy("token")
      .format("parquet").saveAsTable(s"${name}_postings")
    built.dictionary.write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${name}_dict")
    import spark.implicits._
    Seq((built.nDocs, built.sumDl)).toDF("n_docs", "sum_dl")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${name}_stats")
    loadBucketed(spark, name)
  }

  /** Reopen a [[writeBucketed]] index from the catalog. */
  def loadBucketed(spark: SparkSession, name: String): Built = {
    val st = spark.table(s"${name}_stats").head()
    Built(spark.table(s"${name}_postings"), spark.table(s"${name}_dict"),
      st.getLong(0), st.getLong(1))
  }
}
