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

  /** Shingles hashed once to 64-bit longs — the signature then permutes
    * LONGS, never re-touching the strings. Staging this as its own
    * column matters: an expression inlined into the per-seed lambda
    * would be re-evaluated once per hash function.
    */
  def hashShingles(shingles: Column): Column =
    transform(shingles, s => xxhash64(s))

  /** MinHash signature over pre-hashed shingles: element s is
    * min over shingles of xxhash64(seed=s, shingleHash) — a fixed-width
    * 12-byte hash per element, no string re-reads.
    */
  def minhashSignature(hashedShingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(hashedShingles, h => xxhash64(seed, h))))

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
  /** Default shingling for near-dup detection: distinct word 3-grams.
    * Granularity matters enormously for bucket health: character
    * shingles of boilerplate-vocabulary corpora overlap at J≈0.2-0.3
    * between UNRELATED docs, which floods every band bucket and turns
    * LSH into an O(n²) verify; word n-grams keep unrelated docs at
    * J≈0.01 so candidates ≈ true near-dups.
    */
  def defaultShingler(text: Column): Column =
    wordNgrams(TextAnalysis.wordTokens(text), 3)

  /** (id, sh) frame with shingles hashed to 64-bit longs — signature
    * computation and Jaccard verification both run on fixed-width longs,
    * never re-touching strings. Collision risk at 64 bits is ~1e-15 per
    * pair: far below the verify threshold's sensitivity.
    */
  private def hashedShingleFrame(df: DataFrame, idCol: String, textCol: String,
                                 shingler: Column => Column): DataFrame =
    df.select(col(idCol).as("id"), shingler(col(textCol)).as("g"))
      .select(col("id"), hashShingles(col("g")).as("sh"))

  /** MinHash signatures via explode + grouped min aggregates.
    *
    * The naive shape — nested `transform(seeds, s -> array_min(
    * transform(shingles, h -> hash(s, h))))` — is correct but runs
    * INTERPRETED: Spark's higher-order functions are CodegenFallback, so
    * every per-element hash pays expression-tree dispatch (~1 µs; 74 s
    * for 5k docs × 430 shingles × 32 hashes). Exploding instead puts the
    * 32 `xxhash64` calls per shingle inside whole-stage codegen, and
    * map-side partial aggregation collapses the explosion back to
    * |docs| × numHashes before the (tiny) shuffle. Same result, ~30×
    * faster, and the explode never amplifies shuffled bytes at scale.
    */
  def minhashSignatures(shingled: DataFrame, numHashes: Int): DataFrame = {
    val exploded = shingled.select(col("id"), explode(col("sh")).as("h"))
    val aggs = (0 until numHashes).map(s => min(xxhash64(lit(s), col("h"))).as(s"m$s"))
    exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(s => col(s"m$s")): _*).as("sig"))
  }

  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        bands: Int = 8, rowsPer: Int = 4,
                        shingler: Column => Column = defaultShingler): DataFrame =
    candidatesFromShingles(hashedShingleFrame(df, idCol, textCol, shingler), bands, rowsPer)

  private def candidatesFromShingles(shingled: DataFrame, bands: Int, rowsPer: Int): DataFrame = {
    val banded = minhashSignatures(shingled, bands * rowsPer)
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

  /** MinHash-LSH near-dup pairs, verified with exact shingle-set
    * Jaccard ≥ threshold (over the hashed shingles).
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, bands: Int = 8, rowsPer: Int = 4,
                      shingler: Column => Column = defaultShingler): DataFrame = {
    val shingled = hashedShingleFrame(df, idCol, textCol, shingler)
    val cands = candidatesFromShingles(shingled, bands, rowsPer)
    cands
      .join(shingled.as("sa"), col("a_id") === col("sa.id"))
      .join(shingled.as("sb"), col("b_id") === col("sb.id"))
      // stage the intersection size so it is computed once per pair
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double").as("inter"),
        (size(col("sa.sh")) + size(col("sb.sh"))).cast("double").as("tot"))
      .select(col("a_id"), col("b_id"),
        round(col("inter") / (col("tot") - col("inter")), 6).as("jaccard_sim"))
      .filter(col("jaccard_sim") >= threshold)
  }

  /** 64-bit SimHash from PRE-HASHED tokens: each bit's counter is a
    * static codegen'd fold (the bit index is a compile-time constant, so
    * no dynamic shifts), reading a materialized long array. Callers must
    * stage the token hashes in their own projection — inlining the hash
    * here would recompute it for every one of the 64 folds.
    */
  def simhashFromHashes(tokenHashes: Column): Column = {
    val bitCols = (0 until 64).map { i =>
      val votes = aggregate(tokenHashes, lit(0),
        (acc, h) => acc + when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Convenience: simhash of a token array (stages internally when used
    * through [[simhashNearDups]]).
    */
  def simhash64(tokens: Column): Column =
    simhashFromHashes(transform(tokens, t => xxhash64(t)))

  /** SimHash signatures via explode + 64 grouped bit-vote sums — the
    * codegen'd sibling of [[simhashFromHashes]] (same interpreted-HOF
    * rationale as [[minhashSignatures]]).
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"),
        explode(transform(TextAnalysis.wordTokens(col(textCol)), t => xxhash64(t))).as("h"))
    val aggs = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("sim"))
  }

  /** SimHash near-dup pairs: pigeonhole on four 16-bit bands (hamming ≤ 3
    * guarantees ≥ 1 identical band), then verify with bit_count(xor).
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val withSig = simhashSignatures(df, idCol, textCol)
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
