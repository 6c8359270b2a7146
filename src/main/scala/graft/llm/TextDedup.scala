package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact
  * (content hash), MinHash+LSH banded near-dup (NO all-pairs crossJoin —
  * candidate pairs only within band buckets), exact-Jaccard verification
  * of candidates, and SimHash.
  *
  * Scale design: every stage is a per-row expression or a shuffle on a
  * band/bucket key. At N documents the candidate generation costs
  * O(N · bands) rows exploded + a self-join per bucket whose size is the
  * bucket occupancy — never O(N²). Hashes are md5-based so the DuckDB
  * oracle can replicate the banding bit-for-bit (engine-portable, unlike
  * xxhash64).
  */
object TextDedup {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Distinct word n-gram shingles. Documents with fewer than n tokens
    * yield an EMPTY shingle set — guarded explicitly because Spark's
    * `sequence(1, 0)` is the descending [1, 0] (unlike DuckDB's empty
    * generate_series) and `slice(toks, 0, n)` throws. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact-dup key: md5 of the raw text. */
  def exactKey(text: Column): Column = md5(text.cast("binary"))

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set — catches shuffled/duplicated-word copies. */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))).cast("binary"))

  /** MinHash signature: k permutations simulated as min over shingles of
    * md5(i + "|" + shingle) (lexicographic min of hex strings — a
    * uniform order, portable across engines). Computed by the native
    * [[graft.functions.MinHash]] kernel — one JVM pass per row instead of
    * an interpreted k × |sh| nested-lambda walk. */
  def minhashSignature(sh: Column, k: Int): Column =
    graft.functions.MinHash.signature(sh, k)

  /** LSH band keys: the signature split into `bands` rows of `rowsPerBand`,
    * each band hashed to one key. Docs sharing ANY band key are candidate
    * pairs. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      concat_ws("#", lit(b.toString),
        md5(concat_ws("|", slice(sig, b * rowsPerBand + 1, rowsPerBand))
          .cast("binary")))): _*)

  /** Per-doc shingle frame `(id, sh)`. Callers running BOTH candidate
    * generation and verification should put an Exchange barrier (e.g.
    * `.repartition(col("id"))`) behind this — shingling is the expensive
    * derivation; the barrier stops projection collapse from recomputing
    * it per use site and lets the branches share one ReusedExchange. */
  def withShingles(df: DataFrame, idCol: String, textCol: String,
                   ngram: Int = 3): DataFrame =
    df.select(col(idCol).as("id"), shingles(col(textCol), ngram).as("sh"))

  /** Banded-LSH candidate pairs (id ordering a < b, distinct) from a
    * shingle frame: explode band keys, self-join per bucket. The join
    * shuffles on the band key — high cardinality, tiny buckets.
    *
    * The signature projection sits behind an Exchange barrier
    * (repartition on id) before the band-key fan-out: projection
    * collapse cannot cross an Exchange, so without it Catalyst would
    * inline the full k-permutation MinHash into each of the `bands` key
    * expressions — a bands× blow-up that also pushes the expression past
    * codegen limits into interpreted evaluation (observed 80× slower at
    * sf0.1). A barrier (unlike persist) leaves no cached blocks behind. */
  def candidatePairs(shDf: DataFrame, k: Int = 12, bands: Int = 6): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    // docs with no shingles (shorter than the n-gram) have no content
    // signal for MinHash — exclude them rather than colliding them all
    // into one degenerate empty-signature band (exactKey covers them)
    val sigDf = shDf.filter(size(col("sh")) > 0)
      .select(col("id"), minhashSignature(col("sh"), k).as("sig"))
      .repartition(col("id"))
    val keyed = sigDf.select(col("id"),
      explode(bandKeys(col("sig"), bands, k / bands)).as("band"))
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs: explode each side's
    * distinct shingles, count intersections grouped by pair, divide by
    * |A| + |B| − |A∩B|. Only candidates pay this cost. */
  def verifiedPairs(shDf: DataFrame, candidates: DataFrame,
                    threshold: Double = 0.3): DataFrame = {
    val withSh = shDf.withColumn("n_sh", size(col("sh")))
    val exploded = withSh.select(col("id"), col("n_sh"),
      explode(col("sh")).as("s"))
    val inter = candidates
      .join(exploded.select(col("id").as("id_a"), col("n_sh").as("na"),
        col("s")), "id_a")
      .join(exploded.select(col("id").as("id_b"), col("n_sh").as("nb"),
        col("s")), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash (64-bit, engine-native xxhash64 over tokens): per token
    * hash, sum signed bit contributions, take the sign bit vector. Near
    * dups = small Hamming distance. Spark-side only (xxhash64 is not
    * portable to the oracle; covered by ScalaTest instead). */
  def simhash(text: Column): Column = {
    val tokenHashes = tokens(text)
    (0 until 64).map { b =>
      val bitSum = aggregate(tokenHashes, lit(0L),
        (acc, t) => acc + when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1,
          lit(1L)).otherwise(lit(-1L)))
      when(bitSum > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
