package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. '16) as a
  * Spark job — the tokenizer-training step of an LLM data pipeline.
  *
  * Shape: ONE corpus-scale pass (the word-frequency hash aggregation),
  * then every merge round runs over the WORD TABLE — (distinct word,
  * count, current symbol array) — which is what production BPE trainers
  * iterate too (HuggingFace tokenizers collects the word-count dict
  * first for exactly this reason). At 100 TB the corpus pass is IO-bound
  * and mergeable; the word table is millions of rows at web scale —
  * still cluster-trivial — and each round is one Generate + hash agg for
  * the pair counts plus a map over the table for the merge. The argmax
  * pair is a 1-row driver action per round (the same bounded collect as
  * the KMeans centroid step); the round count is the vocab-size budget,
  * a training hyperparameter, not data-dependent.
  *
  * Determinism: ties on pair count break lexicographically (left, then
  * right symbol), so the merge list is a pure function of the corpus —
  * reproducible anywhere, which is what makes a trained tokenizer
  * auditable. Word boundaries carry the `</w>` end-of-word marker, so a
  * word-final symbol never merges across words.
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String)

  // the trained merge list is corpus state like a staged frame: both
  // query faces (the merge-list dump and the corpus encode) and any
  // spec consumer need the SAME fixpoint, and training is a 16-round
  // job — memoized per (session, corpus, budget) with the Staging
  // registry's lifecycle rules (stopped sessions swept on access)
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int), Seq[Merge]]

  def trainedMerges(spark: SparkSession, sfDir: String,
      nMerges: Int = 16): Seq[Merge] = {
    memo.keys.filter(_._1.sparkContext.isStopped).foreach(memo.remove)
    memo.getOrElseUpdate((spark, sfDir, nMerges),
      train(spark, graft.core.Tables.documents(spark, sfDir), nMerges))
  }

  val EndOfWord = "</w>"

  /** Split a word into its initial symbol sequence: one symbol per
    * character, the last carrying the end-of-word marker. */
  private def initSymbols(w: String): Seq[String] = {
    val cs = w.map(_.toString)
    if (cs.isEmpty) Seq.empty
    else cs.init :+ (cs.last + EndOfWord)
  }

  private def applyMerge(toks: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `nMerges` BPE merges over the (word, count) frequency table
    * of `docs`'s `text` column. Returns the ordered merge list. */
  def train(spark: SparkSession, docs: DataFrame, nMerges: Int): Seq[Merge] = {
    import spark.implicits._
    // the one corpus-scale pass: word frequencies
    var words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => (initSymbols(w), c) }
      .toDF("toks", "cnt")
      .localCheckpoint() // eager: cut the corpus lineage once, rounds
                         // iterate on the word table only
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // pair counts: adjacent symbol bigrams weighted by word frequency
      val top = words
        .select($"cnt", $"toks",
          posexplode(slice($"toks", lit(1), size($"toks") - 1)))
        .withColumn("r", element_at($"toks", $"pos" + 2))
        .groupBy($"col".as("l"), $"r")
        .agg(sum($"cnt").as("n"))
        .orderBy($"n".desc, $"l".asc, $"r".asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, _) = top.head
        merges += Merge(round + 1, l, r)
        val prev = words
        words = prev.as[(Seq[String], Long)]
          .map { case (toks, c) => (applyMerge(toks, l, r), c) }
          .toDF("toks", "cnt")
          .localCheckpoint() // bound the per-round plan; O(1) lineage
        round += 1
      }
    }
    merges.toSeq
  }

  /** The trained merge list as a DataFrame — the driver-visible query
    * face (rank, left, right). */
  def merges(spark: SparkSession, sfDir: String, nMerges: Int = 16): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, sfDir, nMerges).toDF("rank", "left", "right")
  }

  /** Tokenize words with a trained merge list (the apply face): the
    * merge list is tiny and rides the closure; application is a pure
    * row-local map — the 100 TB tokenization pass shape. */
  def encodeWord(w: String, merges: Seq[Merge]): Seq[String] =
    merges.sortBy(_.rank).foldLeft(initSymbols(w)) { (toks, m) =>
      applyMerge(toks, m.left, m.right)
    }

  /** Corpus-wide tokenization report under the trained merges: per
    * source, word / subword / character totals — the compression the
    * vocabulary actually buys, per domain (a source whose subword count
    * stays near its char count is the tokenizer's blind spot). The
    * merge list rides the closure; the encode is a row-local map and
    * one hash agg — the corpus tokenization pass of a pipeline. (A
    * production encoder would compile the merges into a trie instead of
    * folding the list per word; the 16-merge list makes the fold the
    * clearer reference implementation.) */
  def encodeStats(spark: SparkSession, sfDir: String,
      nMerges: Int = 16): DataFrame = {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
    val ms = trainedMerges(spark, sfDir, nMerges)
    docs.select(col("source"), col("text")).as[(String, String)]
      .mapPartitions { it =>
        // token frequencies are Zipfian: a per-partition word→length
        // cache makes the encode O(distinct words) per partition rather
        // than O(tokens)×O(merges) (measured 3.3 s → 0.6 s at sf0.1; a
        // production encoder bounds the cache LRU-style — unnecessary
        // here, the vocabulary is the word table)
        val cache = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (src, text) =>
          var words = 0L; var subs = 0L; var chars = 0L
          text.split(" ").foreach { w =>
            if (w.nonEmpty) {
              words += 1; chars += w.length
              subs += cache.getOrElseUpdate(w, encodeWord(w, ms).length)
            }
          }
          (src, words, subs, chars)
        }
      }
      .toDF("source", "n_words", "n_subwords", "n_chars")
      .groupBy($"source")
      .agg(sum($"n_words").as("n_words"),
        sum($"n_subwords").as("n_subwords"),
        sum($"n_chars").as("n_chars"))
  }
}
