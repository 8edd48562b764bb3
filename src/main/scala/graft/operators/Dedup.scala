package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: MinHash+LSH, SimHash with
  * pigeonhole banding, and n-gram Jaccard verification.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - signatures/buckets are computed per-row (narrow, codegen'd — the
  *    whole signature pipeline is built-in higher-order functions, no
  *    UDFs);
  *  - candidate generation is an equi-join on (band, bucket-hash), i.e.
  *    ONE shuffle keyed by bucket, never an O(n²) cross join;
  *  - exact verification runs only on bucket-collision pairs.
  * Bucket skew (a hot bucket from boilerplate text) is the known failure
  * mode — AQE skew-join handles moderate cases; pathological buckets
  * should be count-capped upstream.
  */
object Dedup {

  /** Distinct character k-shingles. Shorter-than-k texts yield their
    * whole text as the single shingle.
    */
  def charShingles(text: Column, k: Int): Column =
    array_distinct(
      transform(sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
        i => substr(text, i, lit(k))))

  /** Distinct word n-grams (space-joined). */
  def wordNgrams(tokens: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(1), greatest(size(tokens) - (n - 1), lit(1))),
        i => array_join(slice(tokens, i, lit(n)), " ")))

  /** MinHash signature: element s of the signature is
    * min over shingles of xxhash64(seed=s, shingle).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingles, s => xxhash64(seed, s))))

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Candidate pairs via banded MinHash-LSH.
    *
    * @param df       input with an id column and a text column
    * @param bands    number of LSH bands
    * @param rowsPer  signature rows per band (bands*rowsPer hashes total)
    * @return distinct (a_id, b_id) with a_id < b_id
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 5, bands: Int = 8, rowsPer: Int = 4): DataFrame = {
    val sig = minhashSignature(charShingles(col(textCol), shingleK), bands * rowsPer)
    val banded = df
      .select(col(idCol).as("id"), sig.as("sig"))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPer + lit(1), lit(rowsPer))))))
      .toDF("id", "band", "bucket")
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs, verified with exact character-shingle
    * Jaccard ≥ threshold.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, shingleK: Int = 5,
                      bands: Int = 8, rowsPer: Int = 4): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleK, bands, rowsPer)
    val sh = df.select(col(idCol).as("id"),
      charShingles(col(textCol), shingleK).as("sh"))
    cands
      .join(sh.as("sa"), col("a_id") === col("sa.id"))
      .join(sh.as("sb"), col("b_id") === col("sb.id"))
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("sa.sh"), col("sb.sh")), 6).as("jaccard_sim"))
      .filter(col("jaccard_sim") >= threshold)
  }

  /** 64-bit SimHash over word tokens. Token hashes are computed once;
    * each bit's counter is a static codegen'd fold (the bit index is a
    * compile-time constant, so no dynamic shifts are needed).
    */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bitCols = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash near-dup pairs: pigeonhole on four 16-bit bands (hamming ≤ 3
    * guarantees ≥ 1 identical band), then verify with bit_count(xor).
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"),
      simhash64(TextAnalysis.wordTokens(col(textCol))).as("sim"))
    val banded = withSig.select(col("id"), col("sim"), posexplode(
      array((0 until 4).map(b =>
        shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("id", "sim", "band", "bucket")
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"),
        bit_count(col("l.sim").bitwiseXOR(col("r.sim"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
