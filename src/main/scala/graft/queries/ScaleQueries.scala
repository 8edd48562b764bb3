package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Logistic, Materialize, Multimodal, Pca, Similarity, TextAnalysis}


/** Scale-path operators: near-dup detection (MinHash-LSH, SimHash,
  * blocked n-gram Jaccard) and embedding similarity (brute-force knn,
  * LSH knn, blocked cosine near-dup).
  *
  * Oracle coverage: operators whose kernels are engine-portable
  * (n-gram Jaccard, double-fold cosine) have DuckDB oracles. The
  * xxhash64-based signatures (MinHash/SimHash buckets) are Spark-specific
  * by design — those queries get the driver's rows-only check plus
  * ScalaTest ground-truth suites (recall vs. brute force, planted dups).
  */
object ScaleQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def embs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  val Dim = 64

  // ------------------------------------------------------------- dedup

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(docs(spark, dir), "doc_id", "text", threshold = 0.5)
      .orderBy("a_id", "b_id")

  /** `dedup_minhash_md5` — the SAME banded MinHash-LSH pipeline as
    * `dedup_minhash` (32 mins, 8 bands × 4 rows, exact-Jaccard verify
    * at 0.5) but with every hash an md5 derivation DuckDB can replay,
    * so CANDIDACY itself is oracle-checked pair-for-pair — closing the
    * one thing `minhash_recall` only bounds statistically (the fast
    * path's xxhash64 signatures are engine-local by design; this
    * variant is the parity witness, the xxhash64 one stays the scale
    * path). Word-3-gram STRINGS travel here instead of gram hashes —
    * acceptable for a parity query, wrong for the scale path (the
    * scaladoc on [[graft.operators.Dedup.minhashSignatures]] explains
    * the codegen/explode design the fast path keeps). Verification
    * reuses [[graft.operators.Dedup.verifyJaccard]] verbatim.
    */
  def dedupMinhashMd5(spark: SparkSession, dir: String): DataFrame = {
    val grams = Materialize(kmGramFrame(docs(spark, dir)))
    // NOT materialized (measured 3.8 -> 4.4 s): the heavy 32-min
    // signature aggregation sits under an Exchange on `id` that
    // canonicalizes identically on both self-join sides, so Spark's
    // ReuseExchange already computes it once; a checkpoint would only
    // serialize the DAG and add a write
    val banded = kmBandKeys(grams)
    val l = banded.select(col("band").as("l_band"), col("key").as("l_key"),
      col("id").as("a_id"))
    val r = banded.select(col("band").as("r_band"), col("key").as("r_key"),
      col("id").as("b_id"))
    val cands = l.join(r, col("l_band") === col("r_band") &&
        col("l_key") === col("r_key") && col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    Dedup.verifyJaccard(cands, grams, 0.5).orderBy("a_id", "b_id")
  }

  /** (id, gh, h1, h2): per-doc DISTINCT word-3-gram STRINGS with the
    * two md5 base hashes for Kirsch-Mitzenmacher double hashing —
    * the engine-portable signature frame shared by `dedup_minhash_md5`
    * and the persisted near-dup ledger (`dedup_ledger_build`/`_probe`),
    * so the two surfaces cannot desync. ONE md5 per gram: the 32
    * permutations derive as m_s = (h1 + s·h2) mod p (the first cut
    * hashed md5(s|gram) per permutation — 32 md5s per gram, measured
    * 11.7 s at bench sf vs 4.7 s for this shape). Callers that read
    * the frame more than once should [[Materialize]] it.
    */
  /** The per-doc distinct word-3-gram STRING array as a column — the
    * row-local form shared by [[kmGramFrame]] (which explodes it), the
    * ledger's static gram side, and the streaming probe's row-local
    * verify.
    */
  private[graft] def kmGramArray(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = TextAnalysis.wordTokens(lower(textCol))
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - 3, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
  }

  private[queries] def kmGramFrame(d: DataFrame): DataFrame =
    // spreadToCores: gram STRINGS + two md5s per gram is the heaviest
    // text map stage on the surface; single-row-group scans ran it on
    // one core (identity at scale — see Relational.spreadToCores)
    graft.operators.Relational.spreadToCores(
        d.select(col("doc_id").as("id"), col("text")))
      .select(col("id"), explode(kmGramArray(col("text"))).as("gh"))
      .withColumn("h1", conv(substring(md5(col("gh")), 1, 8), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(md5(col("gh")), 9, 8), 16, 10).cast("long"))

  /** Largest prime < 2^32; h1 + 31·h2 < 2^37, no overflow. */
  private[graft] val MinhashP = 4294967291L

  /** KM signature geometry shared by the batch pipelines, the SQL
    * generators, and the streaming ledger probe: [[KmMins]] = KmBands
    * × KmRows permutation mins, banded KmRows-per-key.
    */
  private[graft] val KmBands = 8
  private[graft] val KmRows = 4
  private[graft] val KmMins = KmBands * KmRows

  /** (id, band, key): the 8 banded LSH bucket keys per doc from the KM
    * signatures (32 mins, 8 bands × 4 rows, ':'-joined key strings) —
    * one grouped aggregation (map-side combined) + a row-local band
    * explode; shared by `dedup_minhash_md5` and the ledger pair.
    */
  private[queries] def kmBandKeys(grams: DataFrame): DataFrame = {
    val md5min = (s: Int) =>
      min((col("h1") + lit(s.toLong) * col("h2")) % MinhashP).as(s"m$s")
    val sigs = grams.groupBy("id").agg(md5min(0), (1 until KmMins).map(md5min): _*)
    sigs.select(col("id"), explode(array((0 until KmBands).map(b =>
        struct(lit(b).as("band"),
          concat_ws(":", (0 until KmRows).map(r => col(s"m${KmRows * b + r}")): _*).as("key"))): _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** SQL mirror of [[kmGramFrame]]'s KM mins and [[kmBandKeys]]'s band
    * keys — generated from the SAME constants (32 mins, 8 bands × 4
    * rows, [[MinhashP]]) so `dedup_minhash_md5` and the ledger oracles
    * cannot desync from the Scala path or from each other.
    */
  private def kmMinsSql: String = (0 until KmMins).map(s =>
    s"min((h1 + $s * h2) % $MinhashP) AS m$s").mkString(",\n        ")

  private def kmBandSelectsSql(extraCols: String): String = (0 until KmBands).map(b =>
    s"SELECT id$extraCols, $b AS band, concat_ws(':', ${(0 until KmRows).map(r => s"m${KmRows * b + r}").mkString(", ")}) AS key FROM sig")
    .mkString("\n      UNION ALL\n      ")

  val dedupMinhashMd5Sql: String = {
    s"""
    WITH t AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents),
    g AS (
      SELECT id, unnest(list_distinct(
        [array_to_string(t[i:i+2], ' ') FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])) AS gh
      FROM t),
    gh2 AS (
      SELECT id, gh,
        CAST(concat('0x', substr(md5(gh), 1, 8)) AS BIGINT) AS h1,
        CAST(concat('0x', substr(md5(gh), 9, 8)) AS BIGINT) AS h2
      FROM g),
    sig AS (
      SELECT id,
        $kmMinsSql
      FROM gh2 GROUP BY id),
    bands AS (
      ${kmBandSelectsSql("")}),
    cand AS (
      SELECT DISTINCT a.id AS a_id, b.id AS b_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.id < b.id),
    sz AS (SELECT id, CAST(count(*) AS DOUBLE) AS n FROM g GROUP BY id),
    inter AS (
      SELECT c.a_id, c.b_id, CAST(count(*) AS DOUBLE) AS i
      FROM cand c
      JOIN g ga ON ga.id = c.a_id
      JOIN g gb ON gb.id = c.b_id AND gb.gh = ga.gh
      GROUP BY c.a_id, c.b_id),
    j AS (
      SELECT i.a_id, i.b_id, i.i / (na.n + nb.n - i.i) AS jr
      FROM inter i JOIN sz na ON na.id = i.a_id JOIN sz nb ON nb.id = i.b_id)
    SELECT a_id, b_id, round(jr, 6) AS jaccard_sim FROM j
    WHERE jr >= 0.5 ORDER BY a_id, b_id"""
  }

  // --------------------------------------- persisted near-dup ledger

  /** Bucket-key sub-partition count for the ledger layout: each band
    * directory splits into [[LedgerKb]] kb = md5(key)-mod
    * sub-directories, so a probe prunes to its batch's (band, kb)
    * pairs at parquet DIRECTORY level. 32 here (8 × 32 = 256 dirs —
    * file counts stay sane at test SFs); production at 100 TB raises
    * it: the key space is uniform md5 output, so the kb count is
    * purely a files-per-directory / pruning-granularity knob — with
    * the round-14 MEASURED caveats (SCALING.md "LedgerKb knob" table):
    * pruning engages only when kb outgrows the batch's per-band key
    * count (occupancy ≈ kb·(1−(1−1/kb)^keys); a saturated batch pays
    * the extra files for nothing), and plain-parquet reads re-list the
    * whole ledger root before pruning, so the knob needs a
    * manifest-backed store (or cached FileIndex) to convert its
    * measured flatter scan growth (2.3× vs 5.0× across 100× history)
    * into flat wall-clock.
    */
  private[graft] val LedgerKb = 32

  /** The probe batch: an id-hash slice (doc_id % 10 = 3) standing in
    * for a day's arrivals. Deliberately NOT `source = 'src19'` (the
    * `dedup_incremental` split): the synthetic corpus plants zero
    * cross-src19 near-dup pairs at sf0.01 — exactly the SF where the
    * driver's correctness gate runs — which would make the probe's
    * verified output structurally empty; the id slice has history hits
    * at every SF (measured: 2 at sf0.001, 6 at sf0.01). The split
    * predicate is a deployment parameter either way.
    */
  private def ledgerIsBatch = col("doc_id") % 10 === 3
  private val LedgerBatchSql = "doc_id % 10 = 3"

  /** kb sub-partition of a band key — md5-derived, so both engines
    * replay it. The parameterized form serves the `ScaleProbe ledgerkb`
    * run, which measures the [[LedgerKb]] knob at a production setting.
    */
  private[graft] def ledgerKbCol: org.apache.spark.sql.Column = ledgerKbColAt(LedgerKb)

  private[graft] def ledgerKbColAt(kb: Int): org.apache.spark.sql.Column =
    conv(substring(md5(col("key")), 1, 8), 16, 10).cast("long") % kb

  private def ledgerDir(dir: String, kb: Int = LedgerKb): java.io.File =
    corpusCacheDir(dir, "documents",
      if (kb == LedgerKb) "graft-dedup-ledger" else s"graft-dedup-ledger-kb$kb")

  /** `dedup_ledger_build` — the write half of the incremental near-dup
    * lifecycle (the `ann_index_build`/`ann_index_search` split applied
    * to dedup): compute every HISTORY doc's banded MinHash bucket keys
    * ONCE ([[kmGramFrame]] + [[kmBandKeys]] — the md5/KM pipeline
    * `dedup_minhash_md5` proved pair-for-pair against DuckDB) and
    * persist them `partitionBy(band, kb)`, so checking a day's
    * arrivals against 100 TB of history becomes a directory-pruned
    * bucket join instead of a full corpus re-signature + re-cluster —
    * the README-roadmap shape (`/root/reference/README.md:74`,
    * "validaciones previas de duplicidad" — pre-ingest duplicate
    * validation) `dedup_incremental` could not express beyond exact
    * fingerprints.
    * Returns the bucket table READ BACK from the persisted ledger (the
    * oracle checks the on-disk truth); a completion marker is written
    * last so a crashed build is never mistaken for a ledger.
    */
  def dedupLedgerBuild(spark: SparkSession, dir: String): DataFrame =
    dedupLedgerBuildAt(spark, dir, LedgerKb)

  private[graft] def dedupLedgerBuildAt(spark: SparkSession, dir: String,
      kb: Int): DataFrame = {
    val root = ledgerDir(dir, kb)
    val hist = docs(spark, dir).filter(!ledgerIsBatch)
    val banded = kmBandKeys(kmGramFrame(hist)).withColumn("kb", ledgerKbColAt(kb))
    val marker = new java.io.File(root, "_GRAFT_LEDGER_COMPLETE")
    marker.delete()
    // repartition ON the partition columns before partitionBy: each
    // (band, kb) directory is then written by exactly ONE task — one
    // file per directory instead of (tasks × dirs) small files, which
    // is the compaction lever the round-14 manifest measurement named
    // (probe cost past pruning is per-file opens). The extra exchange
    // is one linear shuffle of the banded frame.
    // numPartitions is PINNED to the directory count (KmBands × kb):
    // left keyless, AQE coalesced the small post-shuffle stage to ONE
    // partition, and that lone task wrote all bands×kb directories
    // serially — measured 4.26 s of the build's 4.9 s wall was this
    // single-task write stage (256 sequential parquet file opens).
    // Pinned, every (band, kb) group still lands in exactly one task
    // (hash on the full partition key), the one-file-per-directory
    // invariant holds, and the writes spread across the cluster. This
    // is the scale shape too: at 100 TB each directory is ~1/(bands·kb)
    // of the corpus and wants its own writer.
    banded.select(col("id"), col("key"), col("band"), col("kb"))
      .repartition(KmBands * kb, col("band"), col("kb"))
      .write.mode("overwrite").partitionBy("band", "kb")
      .parquet(new java.io.File(root, "buckets").toString)
    writeLedgerManifest(root)
    java.nio.file.Files.writeString(marker.toPath, "ok")
    // read-back through the cache: priming "full" here makes the fresh
    // build's first full-tree consumer (stats/static sides) listing-free
    cachedScan(spark, root, "full")(ledgerBuckets(spark, root))
      .select(col("id"), col("band").cast("long").as("band"),
        col("kb").cast("long").as("kb"), col("key"))
      .orderBy("band", "kb", "key", "id")
  }

  /** The persisted bucket table (partition columns band/kb read back
    * with parquet's inferred types — cast at the call sites that hash).
    */
  private def ledgerBuckets(spark: SparkSession, root: java.io.File): DataFrame =
    spark.read.parquet(new java.io.File(root, "buckets").toString)

  /** Session-scoped cache of RESOLVED ledger scans. `spark.read.parquet`
    * builds an InMemoryFileIndex at read time — a driver-side listing of
    * the touched tree plus a footer read for schema — and a repeated
    * probe in the same session re-pays that against an UNCHANGED ledger.
    * Keyed by (session identity, canonical root, ledger version, scan
    * signature), where the version is the manifest/completion-marker
    * mtime: a rebuild or compaction rewrites both, so stale entries miss
    * and are evicted on the next load — no explicit invalidation hook.
    * This is the plain-parquet analog of a catalog's FileStatusCache; at
    * 100 TB the listing is a metastore/S3-LIST round-trip per probe, and
    * reusing the resolved scan is what makes a session's SECOND and
    * later admission checks metadata-free (measured: `ScaleProbe
    * ledgerrepeat`, SCALING.md).
    */
  private val ledgerScanCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Long, String), DataFrame]

  private[graft] def clearLedgerScanCache(): Unit = ledgerScanCache.clear()

  private def ledgerVersion(root: java.io.File): Long =
    math.max(new java.io.File(root, "manifest.txt").lastModified(),
      new java.io.File(root, "_GRAFT_LEDGER_COMPLETE").lastModified())

  private def cachedScan(spark: SparkSession, root: java.io.File, sig: String)(
      load: => DataFrame): DataFrame = {
    val key = (System.identityHashCode(spark), root.getCanonicalPath,
      ledgerVersion(root), sig)
    val hit = ledgerScanCache.get(key)
    if (hit != null) hit
    else {
      // evict stale versions of this ledger so the map stays bounded by
      // (live ledgers × distinct scan signatures), not by rebuild count;
      // the blunt full clear caps a long session that probes many
      // DISTINCT batches (each a new signature) — a re-resolve is cheap
      // relative to leaking file-index plans forever
      ledgerScanCache.keySet.removeIf(k =>
        k._1 == key._1 && k._2 == key._2 && k._3 != key._3)
      if (ledgerScanCache.size > 256) ledgerScanCache.clear()
      val df = load
      ledgerScanCache.putIfAbsent(key, df)
      df
    }
  }

  /** The ledger MANIFEST — one relative path per leaf parquet file,
    * written ONCE at build time (the Delta/Iceberg-metadata analog for
    * this plain-parquet layout): the round-14 LedgerKb measurement
    * (SCALING.md) showed directory pruning flattens the probe's SCAN
    * growth but plain-parquet reads re-LIST the whole bucket tree —
    * O(bands×kb) files — before pruning anything, an O(total-files)
    * constant that swamps the pruned scan. A probe that selects its
    * files FROM the manifest pays O(touched files) instead and never
    * lists. Backfilled lazily for pre-manifest ledgers (one listing,
    * then amortized).
    */
  private[graft] def writeLedgerManifest(root: java.io.File): Unit = {
    val buckets = new java.io.File(root, "buckets")
    val sb = new StringBuilder
    for {
      bandDir <- Option(buckets.listFiles()).getOrElse(Array.empty[java.io.File])
        .sortBy(_.getName)
      if bandDir.isDirectory && bandDir.getName.startsWith("band=")
      kbDir <- Option(bandDir.listFiles()).getOrElse(Array.empty[java.io.File])
        .sortBy(_.getName)
      if kbDir.isDirectory && kbDir.getName.startsWith("kb=")
      f <- Option(kbDir.listFiles()).getOrElse(Array.empty[java.io.File])
        .sortBy(_.getName)
      if f.getName.endsWith(".parquet")
    } sb ++= s"${bandDir.getName}/${kbDir.getName}/${f.getName}\n"
    java.nio.file.Files.writeString(
      new java.io.File(root, "manifest.txt").toPath, sb.toString)
  }

  /** Manifest-pruned ledger scan: the batch's packed (band, kb) keys
    * select their (band, kb) DIRECTORIES from the manifest
    * (driver-side string work, manifest-sized), and the read opens
    * only those — `basePath` keeps band/kb as partition columns, and
    * the isin predicate stays on the scan as a staleness guard (it
    * lands in PartitionFilters like the directory route, so the
    * pruning spec holds for both paths). Directories, NOT leaf files:
    * passing thousands of leaf paths makes the driver stat each one
    * (measured WORSE than the tree listing at sf1 — 5.9 → 7.7 s);
    * touched-dir paths are bounded by 8×kb and each lists only its own
    * few files. Falls back (None) when the manifest selects nothing or
    * the touched fraction approaches the whole tree (the recursive
    * root listing is then the cheaper single walk — the saturated
    * fixed-batch case).
    */
  private def ledgerManifestScan(spark: SparkSession, root: java.io.File,
      packed: Array[Long], kb: Int): Option[DataFrame] = {
    val mf = new java.io.File(root, "manifest.txt")
    if (!mf.exists()) {
      if (new java.io.File(root, "_GRAFT_LEDGER_COMPLETE").exists())
        writeLedgerManifest(root) // backfill a pre-manifest ledger once
      else return None
    }
    val keep = packed.toSet
    val bucketsPath = new java.io.File(root, "buckets")
    val rel = """(band=(\d+)/kb=(\d+))/.*""".r
    val allDirs = scala.collection.mutable.LinkedHashSet.empty[String]
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(mf.toPath)).asScala
      .foreach {
        case rel(d, b, k) =>
          allDirs += d
          if (keep.contains(b.toLong * kb + k.toLong)) touched += d
        case _ => ()
      }
    if (touched.isEmpty || touched.size * 2 > allDirs.size) None
    else {
      val dirs = touched.toVector
      Some(cachedScan(spark, root, s"dirs:${dirs.hashCode}") {
        spark.read.option("basePath", bucketsPath.toString)
          .parquet(dirs.map(d => new java.io.File(bucketsPath, d).toString): _*)
      })
    }
  }

  /** `dedup_ledger_probe` — the read half: the batch slice's band keys
    * are computed in-session (batch-sized work), its DISTINCT
    * (band, kb) pairs — bounded by 8 × [[LedgerKb]] regardless of
    * batch size — collect into a static partition predicate, and the
    * ledger scan reads ONLY those bucket directories
    * (PartitionFilters; asserted in DedupLedgerSpec). Bucket-key
    * equality yields candidate (history, batch) pairs, verified with
    * exact gram-set Jaccard ≥ 0.5 over the gram sets of ONLY the
    * batch + candidate docs (a broadcast semi-join against the corpus
    * — never a full-history gram recompute). Probe cost is batch-,
    * candidate- and pruned-scan-sized; nothing rescans history, which
    * is the whole point of persisting the ledger.
    */
  /** Probe internals, exposed for DedupLedgerSpec: the batch gram
    * frame, the batch bucket frame, and the PRUNED ledger scan (the
    * batch's distinct (band, kb) pairs — bounded by 8 × [[LedgerKb]]
    * regardless of batch size — collected into a static partition
    * predicate). Builds the ledger first if the marker is absent.
    */
  private[graft] def ledgerProbeParts(spark: SparkSession, dir: String,
      isBatch: org.apache.spark.sql.Column = ledgerIsBatch,
      kb: Int = LedgerKb)
      : (DataFrame, DataFrame, DataFrame) = {
    val root = ledgerDir(dir, kb)
    if (!new java.io.File(root, "_GRAFT_LEDGER_COMPLETE").exists())
      dedupLedgerBuildAt(spark, dir, kb).count()
    val d = docs(spark, dir)
    val batchGrams = Materialize(kmGramFrame(d.filter(isBatch)))
    val bb = Materialize(kmBandKeys(batchGrams).withColumn("kb", ledgerKbColAt(kb)))
    // the batch's distinct (band, kb) pairs — bounded by 8 × kb — as ONE
    // packed-key isin over the partition columns: a single IN predicate
    // the file index prunes on at ANY kb (the former per-pair OR-chain
    // grew an optimizer-hostile 2 048-term tree at kb = 256), with the
    // empty batch short-circuiting to an empty pruned scan instead of
    // reduce() throwing.
    val pairs = bb.select(col("band"), col("kb")).distinct()
      .collect().map(r => r.getInt(0).toLong * kb + r.getLong(1)).sorted
    val pruned =
      if (pairs.isEmpty)
        cachedScan(spark, root, "full")(ledgerBuckets(spark, root)).filter(lit(false))
      else {
        // manifest route first (O(touched files), no tree listing);
        // cached full-tree scan as the fallback for manifest-less
        // ledgers and the saturated case (touched ≈ whole tree)
        val base = ledgerManifestScan(spark, root, pairs, kb)
          .getOrElse(cachedScan(spark, root, "full")(ledgerBuckets(spark, root)))
        base.filter(
          (col("band").cast("long") * kb + col("kb").cast("long")).isin(pairs: _*))
      }
    (batchGrams, bb, pruned)
  }

  /** The two STATIC sides a streaming admission probe joins against
    * ([[graft.streaming.StreamingLedgerProbe]]): the persisted bucket
    * table and the history docs' gram ARRAYS (the row-local-verify
    * sibling of the exploded gram frame — in production this is a
    * second persisted artifact next to the ledger, rebuilt with it).
    * Builds the ledger first if the marker is absent.
    */
  private[graft] def ledgerStaticSides(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val root = ledgerDir(dir)
    if (!new java.io.File(root, "_GRAFT_LEDGER_COMPLETE").exists())
      dedupLedgerBuild(spark, dir).count()
    val hg = docs(spark, dir).filter(!ledgerIsBatch)
      .select(col("doc_id").as("hist_id"), kmGramArray(col("text")).as("h_grams"))
    (cachedScan(spark, root, "full")(ledgerBuckets(spark, root)), hg)
  }

  def dedupLedgerProbe(spark: SparkSession, dir: String): DataFrame =
    dedupLedgerProbeOn(spark, dir, ledgerIsBatch)

  /** [[dedupLedgerProbe]] with an explicit batch predicate — the
    * deployment parameter. The scaling probe (`ScaleProbe ledger`)
    * passes a FIXED replica-0 batch so the measured quantity is a
    * constant day's arrivals against a growing history, isolating
    * corpus growth from batch growth.
    */
  private[graft] def dedupLedgerProbeOn(spark: SparkSession, dir: String,
      isBatch: org.apache.spark.sql.Column, kb: Int = LedgerKb): DataFrame = {
    val d = docs(spark, dir)
    val (batchGrams, bb, pruned) = ledgerProbeParts(spark, dir, isBatch, kb)
    val cands = pruned
      .select(col("id").as("a_id"), col("band").as("l_band"), col("key").as("l_key"))
      .join(bb.select(col("id").as("b_id"), col("band").as("r_band"),
          col("key").as("r_key")),
        col("l_band") === col("r_band") && col("l_key") === col("r_key"))
      .select("a_id", "b_id").distinct()
    val candIds = cands.select(col("a_id").as("doc_id")).distinct()
    val histGrams = kmGramFrame(d.join(broadcast(candIds), Seq("doc_id"), "left_semi"))
    Dedup.verifyJaccard(cands, histGrams.unionByName(batchGrams), 0.5)
      .select(col("b_id").as("batch_id"), col("a_id").as("hist_id"),
        col("jaccard_sim"))
      .orderBy("batch_id", "hist_id")
  }

  val dedupLedgerBuildSql: String = s"""
    WITH t AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents WHERE NOT ($LedgerBatchSql)),
    g AS (
      SELECT id, unnest(list_distinct(
        [array_to_string(t[i:i+2], ' ') FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])) AS gh
      FROM t),
    gh2 AS (
      SELECT id, gh,
        CAST(concat('0x', substr(md5(gh), 1, 8)) AS BIGINT) AS h1,
        CAST(concat('0x', substr(md5(gh), 9, 8)) AS BIGINT) AS h2
      FROM g),
    sig AS (
      SELECT id,
        $kmMinsSql
      FROM gh2 GROUP BY id),
    bands AS (
      ${kmBandSelectsSql("")})
    SELECT id, CAST(band AS BIGINT) AS band,
      CAST(concat('0x', substr(md5(key), 1, 8)) AS BIGINT) % $LedgerKb AS kb,
      key
    FROM bands
    ORDER BY band, kb, key, id"""

  /** `dedup_ledger_stats` — the [[annIndexStats]] sibling for the
    * near-dup ledger: per band, entry count, distinct buckets, the
    * largest bucket, and mean bucket occupancy — the numbers that say
    * whether probe cost is uniform (md5 keys ⇒ it should be) and when
    * [[LedgerKb]] needs raising (mean entries per (band, kb) directory
    * is the probe's scan unit; see the SCALING.md ledger section).
    * Reads the PERSISTED ledger back (building it if absent), so the
    * report audits the on-disk truth, not an in-session recompute.
    */
  def dedupLedgerStats(spark: SparkSession, dir: String): DataFrame = {
    val buckets = ledgerStaticSides(spark, dir)._1
    buckets.groupBy(col("band").cast("long").as("band"), col("key"))
      .agg(count(lit(1)).as("c"))
      .groupBy("band")
      .agg(sum("c").as("n_entries"), count(lit(1)).as("n_buckets"),
        max("c").as("max_bucket"))
      .select(col("band"), col("n_entries"), col("n_buckets"), col("max_bucket"),
        round(col("n_entries").cast("double") / col("n_buckets"), 6).as("avg_bucket"))
      .orderBy("band")
  }

  lazy val dedupLedgerStatsSql: String = s"""
    WITH lb AS ($dedupLedgerBuildSql),
    per AS (SELECT band, key, count(*) AS c FROM lb GROUP BY band, key)
    SELECT band, CAST(sum(c) AS BIGINT) AS n_entries,
      CAST(count(*) AS BIGINT) AS n_buckets,
      CAST(max(c) AS BIGINT) AS max_bucket,
      round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS avg_bucket
    FROM per GROUP BY band ORDER BY band"""

  val dedupLedgerProbeSql: String = s"""
    WITH t AS (
      SELECT doc_id AS id, $LedgerBatchSql AS is_batch,
        string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents),
    g AS (
      SELECT id, is_batch, unnest(list_distinct(
        [array_to_string(t[i:i+2], ' ') FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])) AS gh
      FROM t),
    gh2 AS (
      SELECT id, is_batch, gh,
        CAST(concat('0x', substr(md5(gh), 1, 8)) AS BIGINT) AS h1,
        CAST(concat('0x', substr(md5(gh), 9, 8)) AS BIGINT) AS h2
      FROM g),
    sig AS (
      SELECT id, is_batch,
        $kmMinsSql
      FROM gh2 GROUP BY id, is_batch),
    bands AS (
      ${kmBandSelectsSql(", is_batch")}),
    cand AS (
      SELECT DISTINCT a.id AS hist_id, b.id AS batch_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key
      WHERE NOT a.is_batch AND b.is_batch),
    sz AS (SELECT id, CAST(count(*) AS DOUBLE) AS n FROM g GROUP BY id),
    inter AS (
      SELECT c.batch_id, c.hist_id, CAST(count(*) AS DOUBLE) AS i
      FROM cand c
      JOIN g ga ON ga.id = c.hist_id
      JOIN g gb ON gb.id = c.batch_id AND gb.gh = ga.gh
      GROUP BY c.batch_id, c.hist_id),
    j AS (
      SELECT i.batch_id, i.hist_id, i.i / (na.n + nb.n - i.i) AS jr
      FROM inter i JOIN sz na ON na.id = i.hist_id JOIN sz nb ON nb.id = i.batch_id)
    SELECT batch_id, hist_id, round(jr, 6) AS jaccard_sim FROM j
    WHERE jr >= 0.5 ORDER BY batch_id, hist_id"""

  /** SimHash near-dup pairs at the h ≤ SimhashMaxHamming operating
    * point — see [[simhashPrecision]] for the measured recall/precision
    * tradeoff curve that picked it.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(docs(spark, dir), "doc_id", "text",
        maxHamming = SimhashMaxHamming)
      .orderBy("a_id", "b_id")

  /** Shipped SimHash accept threshold. The full measured curve
    * (RecallSweep, recall/precision vs rare-gram J ≥ 0.5 truth at
    * sf0.001 / 0.01 / 0.1):
    *   h ≤ 1: recall 32.1 / 24.0 / 38.3   precision 100 / 100  / 96.1
    *   h ≤ 2: recall 64.3 / 44.0 / 59.0   precision 100 / 91.7 / 74.8
    *   h ≤ 3: recall 75.0 / 60.0 / 73.8   precision 77.8 / 88.2 / 36.0
    * h ≤ 3's precision collapses at bench scale (36%: the larger corpus
    * has many h ≤ 3 pairs in the J 0.3–0.5 band), so the shipped point
    * is h ≤ 2 — precision ≥ 74.8 everywhere with recall still over the
    * 40 floor.
    */
  val SimhashMaxHamming = 2

  /** Word-3-gram Jaccard pairs, blocked by `source` (blocked-exact path;
    * the LSH path above is the unblocked scale path).
    *
    * Sparse-join shape: instead of materializing every blocked pair and
    * intersecting two sets per pair (O(pairs × set)), explode the n-grams
    * and equi-join on (source, gram) — only pairs sharing ≥1 gram ever
    * exist, and the whole count is codegen'd joins + aggregates. A 0.5
    * threshold can't admit zero-overlap pairs, so the result is identical.
    */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    // grams hashed to longs (same Jaccard as string sets modulo ~1e-15
    // collisions; the oracle intersects the strings). Materialized ONCE:
    // the sparse join + two size joins reference it four times, each of
    // which would recompute the gram hashing. Fresh-exprId sides (plain
    // aliased selects) — checkpointed-frame dataset aliases trip the
    // AttributeMap analyzer bug. Doc-frequency cap (rare-gram Jaccard):
    // a gram in > 20 same-source docs is boilerplate and would alone
    // contribute O(m²) rows to the gram-equality join below — dropped
    // before pairing AND before sizing, mirrored as a QUALIFY in the
    // oracle, so both engines score the same rare-gram universe. The RAW
    // gram frame materializes first: the cap reads it twice (hot-count
    // aggregate + anti-join input), and capping an unmaterialized frame
    // would re-run the gram hashing for each.
    val raw = Materialize(Dedup.explodedNgrams(docs(spark, dir), "doc_id", "text",
      n = 3, keep = Seq("source")))
    val grams = Materialize(
      Dedup.capGramDocFreq(raw, maxDocFreq = 20, keyCols = Seq("source")))
    val a = grams.select(col("id").as("aid"), col("gh").as("agh"), col("source").as("asrc"))
    val b = grams.select(col("id").as("bid"), col("gh").as("bgh"), col("source").as("bsrc"))
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).cast("double").as("n"))
    val na = sizes.select(col("id").as("na_id"), col("n").as("na_n"))
    val nb = sizes.select(col("id").as("nb_id"), col("n").as("nb_n"))
    a.join(b,
        col("asrc") === col("bsrc") && col("agh") === col("bgh") &&
          col("aid") < col("bid"))
      .groupBy(col("aid").as("a_id"), col("bid").as("b_id"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .join(na, col("a_id") === col("na_id"))
      .join(nb, col("b_id") === col("nb_id"))
      .select(col("a_id"), col("b_id"),
        (col("inter") / (col("na_n") + col("nb_n") - col("inter"))).as("jac_raw"))
      .filter(col("jac_raw") >= 0.5) // filter RAW like the oracle; round only for display
      .select(col("a_id"), col("b_id"), round(col("jac_raw"), 6).as("jaccard_sim"))
      .orderBy("a_id", "b_id")
  }

  /** Threshold-sensitivity sweep for the exact n-gram Jaccard dedup:
    * pair counts at τ ∈ {0.1, 0.3, 0.5, 0.7, 0.9} from ONE pass over
    * the same capped sparse-join score frame `dedup_ngram` filters at
    * 0.5 — the report that justifies (or indicts) the production
    * threshold before a corpus-wide collapse. Candidate fan-out is
    * bounded by the same df ≤ 20 cap (≤ C(20,2) pairs per gram), so
    * dropping the τ filter cannot reintroduce the quadratic.
    */
  def dedupSweep(spark: SparkSession, dir: String): DataFrame = {
    val raw = Materialize(Dedup.explodedNgrams(docs(spark, dir), "doc_id", "text",
      n = 3, keep = Seq("source")))
    val grams = Materialize(
      Dedup.capGramDocFreq(raw, maxDocFreq = 20, keyCols = Seq("source")))
    val a = grams.select(col("id").as("aid"), col("gh").as("agh"), col("source").as("asrc"))
    val b = grams.select(col("id").as("bid"), col("gh").as("bgh"), col("source").as("bsrc"))
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).cast("double").as("n"))
    val na = sizes.select(col("id").as("na_id"), col("n").as("na_n"))
    val nb = sizes.select(col("id").as("nb_id"), col("n").as("nb_n"))
    val scored = a.join(b,
        col("asrc") === col("bsrc") && col("agh") === col("bgh") &&
          col("aid") < col("bid"))
      .groupBy(col("aid").as("a_id"), col("bid").as("b_id"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .join(na, col("a_id") === col("na_id"))
      .join(nb, col("b_id") === col("nb_id"))
      .select((col("inter") / (col("na_n") + col("nb_n") - col("inter"))).as("j"))
    scored.agg(
        sum((col("j") >= 0.1).cast("long")).as("t1"),
        sum((col("j") >= 0.3).cast("long")).as("t3"),
        sum((col("j") >= 0.5).cast("long")).as("t5"),
        sum((col("j") >= 0.7).cast("long")).as("t7"),
        sum((col("j") >= 0.9).cast("long")).as("t9"))
      .selectExpr("""stack(5,
        0.1D, t1, 0.3D, t3, 0.5D, t5, 0.7D, t7, 0.9D, t9)
        AS (threshold, n_pairs)""")
      .select(col("threshold"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
      .orderBy("threshold")
  }

  /** Corpus novelty per document: the share of a doc's distinct word-
    * 3-grams whose FIRST occurrence (minimum doc_id) is the doc itself
    * — the "is this doc adding anything" freshness score an ingest
    * pipeline runs before paying to keep near-boilerplate. One gram
    * frame (row-local distinct before explode, the shared dedup
    * shape), one min-per-gram aggregation, one gh-co-partitioned join
    * back, one per-doc aggregation — all linear in corpus grams,
    * nothing pairwise. Gram identity is the hashed-gram long (same
    * ~1e-15 collision tolerance the hash-green `dedup_ngram` already
    * accepts; the oracle keys on the gram strings).
    */
  def noveltyRate(spark: SparkSession, dir: String): DataFrame = {
    val grams = Materialize(
      Dedup.explodedNgrams(docs(spark, dir), "doc_id", "text"))
    val firsts = grams.groupBy("gh").agg(min("id").as("fid"))
    grams.join(firsts, Seq("gh"))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        round(sum((col("fid") === col("id")).cast("long")).cast("double")
          / count(lit(1)), 6).as("novel"))
      .orderBy("doc_id")
  }

  val noveltyRateSql: String = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS g
      FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)),
    firsts AS (SELECT g, min(doc_id) AS fid FROM grams GROUP BY 1)
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_grams,
      round(cast(sum(CASE WHEN fid = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS novel
    FROM grams JOIN firsts USING (g)
    GROUP BY 1 ORDER BY 1"""

  val dedupSweepSql: String = """
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source, array_to_string(t[i:i+2], ' ') AS g
      FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)),
    kept AS (
      SELECT doc_id, source, g FROM grams
      QUALIFY count(*) OVER (PARTITION BY source, g) <= 20),
    sizes AS (
      SELECT doc_id, cast(count(*) AS DOUBLE) AS n FROM kept GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, cast(count(*) AS DOUBLE) AS i
      FROM kept a JOIN kept b
        ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    j AS (
      SELECT i / (na.n + nb.n - i) AS j
      FROM inter
      JOIN sizes na ON inter.a_id = na.doc_id
      JOIN sizes nb ON inter.b_id = nb.doc_id),
    agg AS (SELECT
      cast(coalesce(sum(CASE WHEN j >= 0.1 THEN 1 END), 0) AS BIGINT) AS t1,
      cast(coalesce(sum(CASE WHEN j >= 0.3 THEN 1 END), 0) AS BIGINT) AS t3,
      cast(coalesce(sum(CASE WHEN j >= 0.5 THEN 1 END), 0) AS BIGINT) AS t5,
      cast(coalesce(sum(CASE WHEN j >= 0.7 THEN 1 END), 0) AS BIGINT) AS t7,
      cast(coalesce(sum(CASE WHEN j >= 0.9 THEN 1 END), 0) AS BIGINT) AS t9
      FROM j)
    SELECT threshold, n_pairs FROM (
      SELECT 0.1 AS threshold, t1 AS n_pairs FROM agg
      UNION ALL SELECT 0.3, t3 FROM agg
      UNION ALL SELECT 0.5, t5 FROM agg
      UNION ALL SELECT 0.7, t7 FROM agg
      UNION ALL SELECT 0.9, t9 FROM agg)
    ORDER BY threshold"""

  val dedupNgramSql: String = """
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source, array_to_string(t[i:i+2], ' ') AS g
      FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)),
    kept AS (
      SELECT doc_id, source, g FROM grams
      QUALIFY count(*) OVER (PARTITION BY source, g) <= 20),
    sizes AS (
      SELECT doc_id, cast(count(*) AS DOUBLE) AS n FROM kept GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, cast(count(*) AS DOUBLE) AS i
      FROM kept a JOIN kept b
        ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT a_id, b_id, round(i / (na.n + nb.n - i), 6) AS jaccard_sim
    FROM inter
    JOIN sizes na ON inter.a_id = na.doc_id
    JOIN sizes nb ON inter.b_id = nb.doc_id
    WHERE i / (na.n + nb.n - i) >= 0.5
    ORDER BY a_id, b_id"""

  // -------------------------------------------------------- similarity

  /** Every 50th vector queries the rest of the corpus, brute force. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(col("id") % 50 === 0)
    Similarity.knnBrute(queries, prepped, k = 5).orderBy("q_id", "rk")
  }

  val knnBruteSql: String = """
    WITH e AS (
      SELECT vec_id, cast(embedding AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM e q JOIN e c ON q.vec_id % 50 = 0 AND c.vec_id != q.vec_id),
    ranked AS (
      SELECT q_id, n_id, cos,
        cast(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rk
      FROM scored)
    SELECT q_id, n_id, round(cos, 6) AS cosine, rk
    FROM ranked WHERE rk <= 5
    ORDER BY q_id, rk"""

  /** LSH-bucketed ANN over the same query set (recall measured in tests). */
  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(col("id") % 50 === 0)
    Similarity.knnLsh(queries, prepped, k = 5, dim = Dim, planes = 4, tables = 8)
      .orderBy("q_id", "rk")
  }

  /** IVF-flat ANN over the same query set, cells from a 1-round
    * distributed k-means. One Lloyd round is the measured knee: the
    * second round costs a full extra assignment+recompute job pair
    * (~40% of the query's wall time) and moved recall by less than the
    * spec's noise floor — `SimilaritySpec` pins iters=1 recall against
    * the untrained skeleton so a regression can't land silently.
    */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(col("id") % 50 === 0)
    val cent = Similarity.kmeansCentroids(prepped, k = 16, iters = 1)
    Similarity.knnIvf(queries, prepped, k = 5, nProbe = 6, centroids = Some(cent))
      .orderBy("q_id", "rk")
  }

  /** High-recall IVF operating point: same 16-cell index, 12 probes.
    * The RecallSweep curve (nProbe → recall at k=16/iters=1):
    * 4→50-68%, 6→66-82%, 8→76-88%, 12→94.5-98% across the three SFs —
    * and a 32-cell index is strictly WORSE at equal corpus fraction
    * here (cells of ~15 vectors scatter true neighbors), so the ≥90%
    * configuration is more probes, not more cells. Probing 12/16 cells
    * scans ~75% of the corpus: at this N that is the honest cost of
    * ≥90% recall; at corpus scale k grows ~√N and the same probe RATIO
    * keeps recall while the scanned fraction collapses.
    */
  def knnIvfHi(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(col("id") % 50 === 0)
    val cent = Similarity.kmeansCentroids(prepped, k = 16, iters = 1)
    Similarity.knnIvf(queries, prepped, k = 5, nProbe = 12, centroids = Some(cent))
      .orderBy("q_id", "rk")
  }

  /** Search-grade PQ configuration — SINGLE source of truth for the
    * Spark query, the generated SQL oracle ([[knnPqSql]]), the recall
    * audit, and the RecallSweep measurement: 8 subspaces × 8 dims over
    * the 64-dim embedding, 64 cells per sub-codebook (6 bits × 8 = 48
    * bits/vector vs 2048 bits raw). The round-9 path reused the emb_pq
    * REPORT codebooks (2×32-dim, 8 cells = 64 codes corpus-wide), so
    * ADC scores collapsed into giant tie groups and the rank cut
    * selected near-random lowest-id candidates (~18% recall). Finer
    * codes — not only more rerank — is the fix; the emb_pq report
    * keeps its own coarse layout (that one measures compression, not
    * search).
    *
    * RecallSweep, measured 2026-08-14 at ALL THREE SFs (the round-9
    * failure mode was a floor validated only below the bench SF):
    *   standard grid: subK=16 r=50 → 64/68/47, subK=32 r=100 →
    *     96/92/68.5 (sf0.001/0.01/0.1) — recall at fixed (subK, rerank)
    *     DEGRADES with corpus size, so the bench SF binds the config
    *   deep grid (SWEEP_PQ_DEEP): subK=64 it=1 r=100 → 98/98/80.5;
    *     r=200 → 100/100/93.5; 3 Lloyd rounds ≈ +0-2pp (not worth a
    *     3-round SQL mirror)
    * Shipped (subK=64, iters=1, rerank=200) = 100/100/93.5 ⇒ floor 70
    * holds at every SF with ≥23pp margin.
    */
  private[graft] val PqSubLen = 8
  private[graft] val PqSubK = 64
  private[graft] val PqK = 5
  private[graft] val PqRerank = 200
  private[graft] val PqQueryMod = 50
  /** Recall floors (pct) for the two PQ search paths — the single
    * source for the `knn_pq_recall`/`knn_ivfpq_recall` tolerance
    * oracles AND the SimilaritySpec pins; set from the RecallSweep
    * sections' measured minima with margin.
    */
  private[graft] val PqMinPct = 70
  private[graft] val IvfPqMinPct = 70
  /** Lloyd rounds for the PQ sub-quantizers (both paths). */
  private[graft] val PqSubIters = 1
  private[graft] val pqLos: Seq[Int] = (0 until Dim / PqSubLen).map(1 + _ * PqSubLen)

  /** The search codebooks as [[Similarity.knnPq]] inputs — kept as a
    * helper so the search query and its recall audit train the
    * IDENTICAL index: L2 sub-quantizers over the NORMALIZED slices
    * (the cosine-correct PQ construction; see [[Similarity.knnPq]]).
    * `subK` is swept by RecallSweep; queries pass the default.
    */
  private[graft] def pqSubspaces(corpus: DataFrame,
                                 subK: Int = PqSubK,
                                 iters: Int = PqSubIters): Seq[(Int, Int, DataFrame)] = {
    val banks = Similarity.kmeansCentroidsL2Multi(corpus,
      pqLos.map(lo => Similarity.unitSlice(col("v"), col("nrm"), lo, PqSubLen)),
      k = subK, iters = iters)
    pqLos.zip(banks).map { case (lo, b) => (lo, PqSubLen, b) }
  }

  /** PQ-based ANN over the same query set: ADC scan over the 8×6-bit
    * codes, exact re-rank of the top `PqRerank` candidates (40·k).
    * Fully oracle-checked (pure arithmetic end to end, like the IVF
    * family); recall vs brute force is floor-audited in
    * `knn_pq_recall`.
    */
  def knnPq(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(col("id") % PqQueryMod === 0)
    Similarity.knnPq(queries, prepped, k = PqK, rerank = PqRerank,
      pqSubspaces(prepped)).orderBy("q_id", "rk")
  }

  /** IVF+PQ probe count — 12 of 16 cells. RecallSweep IVF+PQ sections,
    * measured 2026-08-14 at the shipped residual codebooks (iters=1
    * coarse, subK=64, rerank=200):
    *   shipped point → 98/96/82 at sf0.001/0.01/0.1 ⇒ floor 70 holds
    *   at every SF with ≥12pp margin
    *   (nProbe curve at subK=32 r=100: 8/10/12/16 → 84/88/90/92 at
    *   sf0.001, 72/80/88/90 at sf0.01 — 12 is the knee; the IVF-flat
    *   ceiling at 12 probes is 98/96/94.5)
    * A 3-round coarse or sub-quantizer moves the shipped point ≤2pp
    * (deep grid) and would cost a 3-round unrolled SQL mirror, so the
    * composed index shares knn_ivf's 1-round coarse chain.
    */
  private[graft] val IvfPqNProbe = 12

  /** Residual sub-codebooks for the composed IVF+PQ index — trained by
    * [[Similarity.kmeansCentroidsL2]] on SLICES of
    * [[Similarity.residualFrame]]'s r column (û − ĉ(cell)), sharing
    * the flat-PQ layout constants so the two PQ paths differ ONLY in
    * what they quantize.
    */
  private[graft] def ivfPqSubspaces(corpus: DataFrame, coarse: DataFrame,
                                    subK: Int = PqSubK,
                                    iters: Int = PqSubIters): Seq[(Int, Int, DataFrame)] = {
    val resid = Similarity.residualFrame(corpus, coarse)
    val banks = Similarity.kmeansCentroidsL2Multi(resid,
      pqLos.map(lo => slice(col("r"), lo, PqSubLen)),
      k = subK, iters = iters)
    pqLos.zip(banks).map { case (lo, b) => (lo, PqSubLen, b) }
  }

  /** Composed IVF+PQ ANN — coarse cell pruning (the knn_ivf index,
    * 16 cells / 1 Lloyd round) + ADC over per-subspace RESIDUAL
    * codebooks within the probed cells + exact re-rank. The
    * deployment-shape index: scans nProbe/16 of the CODES, touches
    * full vectors only for the rerank rows. Pure arithmetic end to
    * end → fully oracle-checked like the IVF and flat-PQ paths.
    */
  def knnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(col("id") % PqQueryMod === 0)
    val coarse = Similarity.kmeansCentroids(prepped, k = 16, iters = 1)
    Similarity.knnIvfPq(queries, prepped, k = PqK, rerank = PqRerank,
      nProbe = IvfPqNProbe, coarse = coarse,
      subspaces = ivfPqSubspaces(prepped, coarse)).orderBy("q_id", "rk")
  }

  // ------------------------------------------ persisted ANN index

  /** Rerank pool for the label-filtered search. RecallSweep filtered
    * section (SWEEP_ONLY=filtered), measured 2026-08-14 vs the
    * FILTERED brute truth at nProbe=12 across rerank ∈ {50,100,200,400}
    * (sf0.001 / 0.01 / 0.1):
    *   50 → 94 / 94 / 87.5;  100 → 94 / 94 / 93;
    *   200 → 94 / 94 / 93;   400 → 94 / 94 / 93
    * The knee is 100 (the pool is spent only on same-label candidates,
    * so filter-before-rank needs NO widening over the unfiltered point
    * — widening past the knee pays nothing); shipped 200 to share the
    * unfiltered [[PqRerank]] pool with measured headroom on both sides.
    */
  private[graft] val FilteredRerank = 200

  /** Recall floor (pct) for `knn_filtered_recall`: measured 94/94/93
    * at the shipped point (curve at [[FilteredRerank]]) ⇒ 70 holds at
    * every SF with ≥ 23pp margin. (Filtered recall sits ABOVE the
    * unfiltered IVF+PQ's 82% at sf0.1: the same-label truth set lives
    * in the cells the label's queries probe.)
    */
  private[graft] val FilteredMinPct = 70

  /** On-disk home of a persisted artifact (ANN index / dedup ledger)
    * for one corpus dir, keyed by an md5 of the SOURCE parquet files'
    * (path, length, mtime) so a regenerated corpus can never be served
    * a stale artifact — a mismatched corpus simply hashes to a
    * different directory and triggers a rebuild.
    */
  private[queries] def corpusCacheDir(dir: String, table: String,
                                      ns: String): java.io.File = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil).flatMap(walk)
      else Seq(f)
    val sig = walk(new java.io.File(s"$dir/$table.parquet"))
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}").mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString
    new java.io.File(new java.io.File(
      System.getProperty("java.io.tmpdir"), ns), md)
  }

  private def annIndexDir(dir: String): java.io.File = annIndexDirAt(dir, 16)

  /** Index home for a non-default coarse cell count — the k ∝ √N
    * scaling recipe measured by `ScaleProbe annk` (SCALING.md): same
    * corpus-signature keying, separate namespace per k so the
    * registered k = 16 index is never clobbered by a probe build.
    */
  private def annIndexDirAt(dir: String, k: Int): java.io.File =
    corpusCacheDir(dir, "embeddings",
      if (k == 16) "graft-ann-index" else s"graft-ann-index-k$k")

  /** `ann_index_build` — the write half of the deployment-shape ANN
    * lifecycle (build once, search many): train the coarse quantizer +
    * per-cell residual sub-codebooks, code every vector ONCE, and
    * persist
    *   - `codes/`  — (n_id, code0..7, label) `partitionBy("c_id")`, so
    *     probing becomes parquet DIRECTORY pruning at search time (the
    *     label attribute is stored in the index rows — filtered search
    *     never touches a second table);
    *   - `coarse/`, `subs/` — the codebook sidecars (model-sized:
    *     16 + 8×64 centroid rows), read back by the search half.
    * Returns the codes frame READ BACK from the persisted index — the
    * oracle checks the on-disk truth, not the in-memory plan. A
    * completion marker is written last so a crashed build is never
    * mistaken for an index.
    */
  def annIndexBuild(spark: SparkSession, dir: String): DataFrame =
    annIndexBuildAt(spark, dir, 16)

  /** [[annIndexBuild]] at a caller-chosen coarse cell count — the
    * measurement hook behind the k ∝ √N recipe (`ScaleProbe annk`).
    */
  private[graft] def annIndexBuildAt(spark: SparkSession, dir: String,
      kCells: Int): DataFrame = {
    val root = annIndexDirAt(dir, kCells)
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding",
      keep = Seq("label"))
    val coarse = Similarity.kmeansCentroids(prepped, k = kCells, iters = 1)
    val subs = ivfPqSubspaces(prepped, coarse)
    val marker = new java.io.File(root, "_GRAFT_INDEX_COMPLETE")
    marker.delete()
    // one writer task per cell directory (pinned — the ledger-write
    // lesson: keyless/absent repartition left the 16-directory write
    // on a single task), one file per directory preserved
    Similarity.ivfPqCodes(prepped, coarse, subs, keep = Seq("label"))
      .repartition(kCells, col("c_id"))
      .write.mode("overwrite").partitionBy("c_id")
      .parquet(new java.io.File(root, "codes").toString)
    coarse.write.mode("overwrite")
      .parquet(new java.io.File(root, "coarse").toString)
    subs.zipWithIndex.map { case ((_, _, bank), s) =>
        bank.select(lit(s).as("s"), col("c_id"), col("cv"), col("cn"))
      }.reduce(_ union _)
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(root, "subs").toString)
    java.nio.file.Files.writeString(marker.toPath, "ok")
    val codeCols = pqLos.indices.map(s => col(s"code$s"))
    spark.read.parquet(new java.io.File(root, "codes").toString)
      .select(col("n_id") +: codeCols :+ col("label") :+
        col("c_id").cast("long").as("c_id"): _*)
      .orderBy("n_id")
  }

  /** The persisted index, read back — (codes, coarse, subspaces).
    * Builds first if the completion marker is absent (queries are an
    * unordered map, so `ann_index_search`/`knn_filtered` cannot assume
    * `ann_index_build` ran first in this session). Banks are re-sorted
    * by c_id so the collected model arrays are order-identical to the
    * trainer's output regardless of parquet file order.
    */
  private[graft] def annIndexParts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, Seq[(Int, Int, DataFrame)]) =
    annIndexPartsAt(spark, dir, 16)

  /** Session-scoped cache of the resolved index parts — the ANN twin of
    * [[ledgerScanCache]]: every search re-paid codes-tree listing plus
    * coarse/subs sidecar reads against an UNCHANGED index. Keyed by
    * (session, root, completion-marker mtime); a rebuild bumps the
    * marker and stale entries are evicted on the next load.
    */
  private val annPartsCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, Long), (DataFrame, DataFrame, Seq[(Int, Int, DataFrame)])]

  private[graft] def clearAnnPartsCache(): Unit = annPartsCache.clear()

  private[graft] def annIndexPartsAt(spark: SparkSession, dir: String,
      kCells: Int): (DataFrame, DataFrame, Seq[(Int, Int, DataFrame)]) = {
    val root = annIndexDirAt(dir, kCells)
    val marker = new java.io.File(root, "_GRAFT_INDEX_COMPLETE")
    if (!marker.exists()) annIndexBuildAt(spark, dir, kCells).count()
    val key = (System.identityHashCode(spark), root.getCanonicalPath,
      marker.lastModified())
    val hit = annPartsCache.get(key)
    if (hit != null) return hit
    annPartsCache.keySet.removeIf(k =>
      k._1 == key._1 && k._2 == key._2 && k._3 != key._3)
    if (annPartsCache.size > 64) annPartsCache.clear()
    val codes = spark.read.parquet(new java.io.File(root, "codes").toString)
    val coarse = spark.read.parquet(new java.io.File(root, "coarse").toString)
      .orderBy("c_id")
    val subsDf = spark.read.parquet(new java.io.File(root, "subs").toString)
    val subs = pqLos.indices.map { s =>
      (pqLos(s), PqSubLen,
        subsDf.filter(col("s") === s).select("c_id", "cv", "cn").orderBy("c_id"))
    }
    val parts = (codes, coarse, subs)
    annPartsCache.putIfAbsent(key, parts)
    parts
  }

  /** The probed slice of the persisted codes index: the query batch's
    * distinct coarse cells ([[Similarity.probedCells]] — model-sized,
    * ≤ nCells rows) collected into a STATIC `isin` predicate over the
    * partition column, so the scan reads only the probed cells'
    * parquet directories (PartitionFilters — asserted in AnnIndexSpec).
    */
  private[graft] def prunedIndexCodes(queries: DataFrame, codes: DataFrame,
                                      coarse: DataFrame,
                                      nProbe: Int = IvfPqNProbe): DataFrame = {
    val cells = Similarity.probedCells(queries, coarse, nProbe)
      .collect().map(_.getLong(0)).sorted.toSeq
    codes.filter(col("c_id").isin(cells: _*))
  }

  /** `ann_index_search` — the read half: identical results to the
    * inline-trained [[knnIvfPq]] (same oracle), but ALL training and
    * coding cost lives in `ann_index_build`; this query only reads the
    * probed cells' code partitions + the model sidecars, which is why
    * its bench time sits far under the build's.
    */
  def annIndexSearch(spark: SparkSession, dir: String): DataFrame =
    annIndexSearchOn(spark, dir, col("id") % PqQueryMod === 0)

  /** [[annIndexSearch]] with a caller-chosen query predicate — the
    * ScaleProbe `ann` mode pins the batch to replica-0 ids so the
    * measured quantity is the deployment one (a FIXED daily query
    * batch against a growing corpus), not batch×corpus growth.
    */
  private[graft] def annIndexSearchOn(spark: SparkSession, dir: String,
                                      queryPred: org.apache.spark.sql.Column): DataFrame =
    annIndexSearchOnAt(spark, dir, queryPred, 16, IvfPqNProbe)

  /** [[annIndexSearchOn]] against a k-parametrized persisted index with
    * a caller-chosen probe width — the `ScaleProbe annk` search hook.
    */
  private[graft] def annIndexSearchOnAt(spark: SparkSession, dir: String,
      queryPred: org.apache.spark.sql.Column, kCells: Int,
      nProbe: Int): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(queryPred)
    val (codes, coarse, subs) = annIndexPartsAt(spark, dir, kCells)
    Similarity.knnIvfPqOnCodes(queries, prepped,
        prunedIndexCodes(queries, codes, coarse, nProbe),
        k = PqK, rerank = PqRerank, nProbe = nProbe,
        coarse = coarse, subspaces = subs)
      .orderBy("q_id", "rk")
  }

  /** `knn_filtered` — predicate + top-k over the persisted index: each
    * query retrieves its k nearest SAME-LABEL vectors, the most common
    * production retrieval shape after plain top-k. The label predicate
    * is applied DURING the ADC code scan (filter-before-rank; the
    * label is stored in the index rows), so the whole rerank pool is
    * spent on predicate-satisfying candidates. Recall vs the filtered
    * brute truth is floor-audited in `knn_filtered_recall`.
    */
  def knnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding",
      keep = Seq("label"))
    val queries = prepped.filter(col("id") % PqQueryMod === 0)
    val (codes, coarse, subs) = annIndexParts(spark, dir)
    Similarity.knnIvfPqFilteredOnCodes(queries, prepped,
        prunedIndexCodes(queries, codes, coarse),
        k = PqK, rerank = FilteredRerank, nProbe = IvfPqNProbe,
        coarse = coarse, subspaces = subs, labCol = "label")
      .orderBy("q_id", "rk")
  }

  /** Cosine threshold for `ann_range` — the thresholding (not ranking)
    * retrieval primitive. τ = 0.30 sits at ≈p99 of the query batch's
    * pair-cosine distribution on this corpus (truth sizes 40/50/582 at
    * the three SFs) and is boundary-safe for the cross-engine compare:
    * the nearest pair cosine is ≥ 5.0e-5 away from τ at every SF
    * (measured), eleven decades above double-summation-order
    * divergence, so the brute count can never flip on a ulp.
    */
  private[graft] val RangeTau = 0.30

  /** ADC admission margin for the range scan: a candidate enters the
    * exact re-rank iff adc ≥ τ − margin. Measured (RecallSweep range
    * section): at the ε-ball's weak-cosine regime the residual-PQ ADC
    * underestimates by up to ≈τ itself — recall at the shipped nProbe
    * climbs 46.6→64.8→88.8→97.1% across margins 0.08/0.12/0.2/0.3 at
    * sf0.1 — so the shipped margin equals τ (admission = adc ≥ 0,
    * dropping only clearly anti-correlated candidates, ~half the probed
    * rows). This is the honest PQ physics: codes rank STRONG neighbors
    * well (knn_ivfpq holds 82%+ at rerank 200) but blur near a weak
    * threshold, so range admission must be loose and the exact re-rank
    * does the discriminating.
    */
  private[graft] val RangeMargin = 0.30

  /** Probe width for the range scan — wider than the top-k path's
    * [[IvfPqNProbe]] = 12: ε-ball truth at a weak τ spreads across more
    * cells than a query's top-5, and the probe ceiling (margin = 2.0 in
    * the sweep) is 92.1% at nProbe = 12 vs 98.1% at 14 at sf0.1. 14 of
    * 16 cells still exercises partition pruning while clearing the
    * floor with margin (100/96/97.1% at the three SFs).
    */
  private[graft] val RangeNProbe = 14

  /** Recall floor (percent) for `ann_range_recall` vs the brute ε-ball
    * truth. Measured 100/96/97.1% at sf0.001/0.01/0.1 at the shipped
    * (nProbe = 14, margin = 0.30) — ≥ 6pp of honest headroom; re-run
    * `SWEEP_ONLY=range RecallSweep` before changing any constant here.
    */
  private[graft] val RangeMinPct = 90

  /** `ann_range` — range (ε-ball) similarity search over the PERSISTED
    * IVF+PQ index: every neighbor of the query batch with exact cosine
    * ≥ [[RangeTau]], via the partition-pruned codes tree + absolute ADC
    * admission + exact re-rank ([[Similarity.rangeIvfPqOnCodes]]).
    * Precision is exact by construction (the final filter is on true
    * cosine); recall is floor-audited in `ann_range_recall`. Rows-only
    * at the driver gate (the candidate set depends on engine-local
    * k-means codebooks), with the oracle-checked companion carrying the
    * hard signal — same contract as `knn_ivfpq`/`dedup_minhash`.
    */
  def annRange(spark: SparkSession, dir: String): DataFrame =
    annRangeAt(spark, dir, RangeMargin)

  private[graft] def annRangeAt(spark: SparkSession, dir: String,
                                margin: Double,
                                nProbe: Int = RangeNProbe,
                                pred: Column = col("id") % PqQueryMod === 0)
      : DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(pred)
    val (codes, coarse, subs) = annIndexParts(spark, dir)
    Similarity.rangeIvfPqOnCodes(queries, prepped,
        prunedIndexCodes(queries, codes, coarse, nProbe),
        tau = RangeTau, margin = margin, nProbe = nProbe,
        coarse = coarse, subspaces = subs)
      .orderBy("q_id", "n_id")
  }

  /** `ann_range_recall` — tolerance companion: brute ε-ball truth (all
    * pairs with exact cosine ≥ τ over the same query batch) vs the
    * index path. Emits the exact truth count (oracle-checked in
    * DuckDB), the ≥[[RangeMinPct]]% recall flag, and a
    * `precision_exact` invariant flag (found ⊆ truth MUST hold — the
    * range filter is on true cosine, so any violation means the two
    * formulations drifted).
    */
  def annRangeRecall(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(col("id") % PqQueryMod === 0)
    val qv = broadcast(queries.select(col("id").as("q_id"),
      col("v").as("qv"), col("nrm").as("qn")))
    // both pair sets are referenced three times each (hit probe,
    // precision probe, denominator counts); materialized, the brute
    // ball join and the whole index pipeline run once — and the two
    // materializations are independent chains, so they overlap on two
    // driver threads (guide §2.6)
    val (brute, found) = Materialize.par2(
      Materialize(prepped.join(qv, col("id") =!= col("q_id"))
        .filter(Similarity.cosine(col("qv"), col("qn"),
          col("v"), col("nrm")) >= RangeTau)
        .select(col("q_id"), col("id").as("n_id"))),
      Materialize(annRange(spark, dir).select("q_id", "n_id")))
    val hits = brute.join(found, Seq("q_id", "n_id"), "left_semi")
    val prec = found.join(brute, Seq("q_id", "n_id"), "left_semi")
    brute.agg(count(lit(1)).as("n_brute"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .crossJoin(prec.agg(count(lit(1)).as("n_prec")))
      .select(col("n_brute").cast("long").as("n_brute"),
        (col("n_hit") * 100 >= col("n_brute") * RangeMinPct)
          .cast("long").as("recall_ok"),
        (col("n_prec") === col("n_found")).cast("long").as("precision_exact"))
  }

  val annRangeRecallSql: String = s"""
    WITH e AS (
      SELECT vec_id, cast(embedding AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    s AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM e q JOIN e c ON q.vec_id % $PqQueryMod = 0 AND c.vec_id != q.vec_id)
    SELECT cast(count(*) AS BIGINT) AS n_brute,
      cast(1 AS BIGINT) AS recall_ok,
      cast(1 AS BIGINT) AS precision_exact
    FROM s WHERE cos >= $RangeTau"""

  /** `ann_range_filtered` — the thresholding sibling of `knn_filtered`:
    * every SAME-LABEL neighbor within the ball, the label predicate
    * applied during the ADC code scan (the label is stored in the index
    * rows, so no second table at scan time). Same measured constants as
    * `ann_range` — filtering only SHRINKS the candidate set a probe
    * must carry, never widens the error. Rows-only by design;
    * `ann_range_filtered_recall` is the oracle-checked companion.
    */
  def annRangeFiltered(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding",
      keep = Seq("label"))
    val queries = prepped.filter(col("id") % PqQueryMod === 0)
    val (codes, coarse, subs) = annIndexParts(spark, dir)
    Similarity.rangeIvfPqFilteredOnCodes(queries, prepped,
        prunedIndexCodes(queries, codes, coarse, RangeNProbe),
        tau = RangeTau, margin = RangeMargin, nProbe = RangeNProbe,
        coarse = coarse, subspaces = subs, labCol = "label")
      .orderBy("q_id", "n_id")
  }

  /** Brute filtered ε-ball truth + floor flags, mirroring
    * [[annRangeRecall]] with the same-label predicate on both sides.
    */
  def annRangeFilteredRecall(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding",
      keep = Seq("label"))
    val queries = prepped.filter(col("id") % PqQueryMod === 0)
    val qv = broadcast(queries.select(col("id").as("q_id"),
      col("label").as("qlab"), col("v").as("qv"), col("nrm").as("qn")))
    // same three-consumer shape as annRangeRecall: materialize both,
    // overlapped on two driver threads (guide §2.6)
    val (brute, found) = Materialize.par2(
      Materialize(prepped.join(qv,
          col("id") =!= col("q_id") && col("label") === col("qlab"))
        .filter(Similarity.cosine(col("qv"), col("qn"),
          col("v"), col("nrm")) >= RangeTau)
        .select(col("q_id"), col("id").as("n_id"))),
      Materialize(
        annRangeFiltered(spark, dir).select("q_id", "n_id")))
    val hits = brute.join(found, Seq("q_id", "n_id"), "left_semi")
    val prec = found.join(brute, Seq("q_id", "n_id"), "left_semi")
    brute.agg(count(lit(1)).as("n_brute"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .crossJoin(prec.agg(count(lit(1)).as("n_prec")))
      .select(col("n_brute").cast("long").as("n_brute"),
        (col("n_hit") * 100 >= col("n_brute") * RangeMinPct)
          .cast("long").as("recall_ok"),
        (col("n_prec") === col("n_found")).cast("long").as("precision_exact"))
  }

  val annRangeFilteredRecallSql: String = s"""
    WITH e AS (
      SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    s AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM e q JOIN e c ON q.vec_id % $PqQueryMod = 0
        AND c.vec_id != q.vec_id AND c.label = q.label)
    SELECT cast(count(*) AS BIGINT) AS n_brute,
      cast(1 AS BIGINT) AS recall_ok,
      cast(1 AS BIGINT) AS precision_exact
    FROM s WHERE cos >= $RangeTau"""

  /** Arrival slice for the index-health monitor: vec_id %
    * [[HealthNewMod]] = 0, a ~4% stand-in for the stream appends
    * [[graft.streaming.StreamingIndexMaintenance]] codes under the
    * frozen codebook.
    */
  private val HealthNewMod = 23

  /** `ann_index_health` — the retrain trigger closing the ANN index
    * lifecycle: per coarse cell, the mean assignment affinity of the
    * ARRIVAL slice vs the rest of the corpus under the SAME deployed
    * codebook (the one `ann_index_build` persists: k=16, 1 Lloyd
    * round), plus the drift = build − new. A healthy append stream
    * drifts ~0; sustained positive drift means arrivals sit farther
    * from their assigned centroids than the corpus the codebook was
    * trained on — the signal to re-run `ann_index_build`.
    *
    * Retrain contract (wired into StreamingIndexMaintenance's
    * scaladoc): per-CELL drift is a small-sample diagnostic (measured
    * i.i.d.-arrival band: up to |0.27| at n_new ≤ 4 — mean of a
    * handful of affinities), so the deployment trigger aggregates this
    * query's output to the n_new-WEIGHTED mean drift
    * Σ n_new·drift / Σ n_new, measured 0.005 / −0.001 / 0.005 at
    * sf0.001/0.01/0.1 on the i.i.d. slice — retrain when the weighted
    * drift exceeds 0.05 (≈10× the i.i.d. band) for a full compaction
    * window. One map-only assignment pass against the literal centroid
    * bank + one 16-row aggregation; cells the arrival slice never
    * touched surface with n_new = 0 and NULL new_affinity (both
    * engines agree on the NULL).
    */
  def annIndexHealth(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val cent = Similarity.kmeansCentroids(prepped, k = 16, iters = 1)
    val isNew = col("id") % HealthNewMod === 0
    Similarity.assignCellsWithAffinity(prepped, cent)
      .withColumn("is_new", isNew)
      .groupBy("c_id")
      .agg(
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_build"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
        avg(when(!col("is_new"), col("aff"))).as("ba"),
        avg(when(col("is_new"), col("aff"))).as("na"))
      .select(col("c_id"), col("n_build"), col("n_new"),
        round(col("ba"), 6).as("build_affinity"),
        round(col("na"), 6).as("new_affinity"),
        round(col("ba") - col("na"), 6).as("drift"))
      .orderBy("c_id")
  }

  /** `ann_index_stats` — per-cell occupancy of the coarse quantizer
    * plus the FAISS imbalance factor k·Σshare² (1.0 = perfectly
    * balanced; the capacity-planning number that says whether probe
    * cost is uniform or one hot cell carries the corpus — at k ∝ √N
    * scale the imbalance factor IS the search-latency multiplier).
    * One assignment pass + a cell-keyed count; the factor folds from
    * the 16-row count frame.
    */
  def annIndexStats(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val cent = Similarity.kmeansCentroids(prepped, k = 16, iters = 1)
    val counts = Similarity.assignCells(prepped, cent)
      .groupBy("c_id").agg(count(lit(1)).as("n_vecs"))
    val tot = counts.agg(
      sum("n_vecs").as("n"),
      sum(col("n_vecs").cast("double") * col("n_vecs").cast("double")).as("s2"),
      count(lit(1)).as("k"))
    counts.crossJoin(tot).select(col("c_id"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("n"), 6).as("share"),
        round(col("k").cast("double") * col("s2") /
          (col("n").cast("double") * col("n").cast("double")), 6).as("imbalance"))
      .orderBy("c_id")
  }

  lazy val annIndexStatsSql: String = s"""$kmeansCtePrefix,
    counts AS (SELECT c_id, CAST(count(*) AS BIGINT) AS n_vecs FROM a2 GROUP BY c_id),
    tot AS (
      SELECT CAST(sum(n_vecs) AS BIGINT) AS n,
        sum(CAST(n_vecs AS DOUBLE) * CAST(n_vecs AS DOUBLE)) AS s2,
        CAST(count(*) AS BIGINT) AS k
      FROM counts)
    SELECT c_id, n_vecs,
      round(CAST(n_vecs AS DOUBLE) / n, 6) AS share,
      round(CAST(k AS DOUBLE) * s2 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS imbalance
    FROM counts, tot ORDER BY c_id"""

  // lazy: kmeansCtePrefix is declared later in the file, and a strict
  // val here would read null during object init
  lazy val annIndexHealthSql: String = s"""$kmeansCtePrefix,
    aff AS (
      SELECT a.vec_id, a.c_id,
        list_inner_product(a.v, c.cv) / (a.nrm * c.cn) AS aff,
        a.vec_id % $HealthNewMod = 0 AS is_new
      FROM a2 a JOIN c1 c ON c.c_id = a.c_id)
    SELECT c_id,
      cast(count(*) FILTER (NOT is_new) AS BIGINT) AS n_build,
      cast(count(*) FILTER (is_new) AS BIGINT) AS n_new,
      round(avg(aff) FILTER (NOT is_new), 6) AS build_affinity,
      round(avg(aff) FILTER (is_new), 6) AS new_affinity,
      round(avg(aff) FILTER (NOT is_new) - avg(aff) FILTER (is_new), 6) AS drift
    FROM aff GROUP BY c_id ORDER BY c_id"""

  /** Winnowing (rolling-hash) fingerprints over documents — engine-
    * portable md5 gram hashes, so fully oracle-checked.
    */
  def fingerprintWinnow(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowFingerprints(docs(spark, dir), "doc_id", "text", n = 3, w = 4)
      .withColumnsRenamed(Map("id" -> "doc_id"))
      .orderBy("doc_id", "fp")

  val fingerprintWinnowSql: String = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
    grams AS (
      SELECT doc_id, i,
        md5(array_to_string(t[i+1:i+3], ' ')) AS gh
      FROM toks, unnest(range(0, greatest(len(t)-3, 0) + 1)) AS u(i)),
    wins AS (
      SELECT doc_id, min(gh) OVER (PARTITION BY doc_id ORDER BY i
        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM grams)
    SELECT DISTINCT doc_id, fp FROM wins
    ORDER BY doc_id, fp"""

  /** Label-blocked exact cosine near-dup pairs. */
  def embNearDup(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(
      embs(spark, dir).select(col("vec_id"), col("embedding"), col("label")),
      "vec_id", "embedding")
    val withLabel = prepped // prep keeps only id/v/nrm; re-join label
    val lbl = embs(spark, dir).select(col("vec_id").as("id"), col("label"))
    Similarity.cosineNearDups(withLabel.join(lbl, "id"), col("label"), 0.4)
      .orderBy("a_id", "b_id")
  }

  val embNearDupSql: String = """
    WITH e AS (
      SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
    ORDER BY a_id, b_id"""

  private val DeconTau = 0.35
  private val DeconEvalMod = 101

  /** `decon_semantic` — eval-set decontamination in embedding space:
    * drop every training vector whose cosine to ANY eval-split vector
    * (vec_id % [[DeconEvalMod]] = 0, a benchmark-suite-sized ~1% slice)
    * reaches [[DeconTau]]. The gram-space `decontaminate` contract
    * (`PipelineQueries.scala`) lifted to vectors: the eval side is
    * model-sized and explicitly BROADCAST, so the corpus streams
    * map-side through the dot-product probe and never shuffles — the
    * only exchanges are the contaminated-id distinct (bounded by the
    * hit count) and the final anti-join against that tiny frame (itself
    * broadcast). An eval set too large to broadcast composes with the
    * persisted IVF index instead: probe the eval vectors' coarse cells
    * ([[annIndexParts]] + [[prunedIndexCodes]]) and brute-check only
    * cell-mates.
    *
    * τ = 0.35 was picked from the measured cross-split cosine
    * distribution (9/495 removals at sf0.01, 92 hit-pairs at sf0.1);
    * the nearest pair sits ≥ 1e-4 from the threshold at both SFs, five
    * orders above double-accumulation noise, so the engines cannot
    * disagree on membership.
    */
  private[graft] def deconSemanticOn(e: DataFrame): DataFrame = {
    val ev = broadcast(e.filter(col("id") % DeconEvalMod === 0)
      .select(col("id").as("e_id"), col("v").as("evec"), col("nrm").as("en")))
    val train = e.filter(col("id") % DeconEvalMod =!= 0)
    val bad = train.join(ev,
        Similarity.cosine(col("v"), col("nrm"), col("evec"), col("en")) >= DeconTau)
      .select(col("id")).distinct()
    train.join(bad, Seq("id"), "left_anti")
      .select(col("id").as("vec_id")).orderBy("vec_id")
  }

  def deconSemantic(spark: SparkSession, dir: String): DataFrame =
    deconSemanticOn(Similarity.prep(embs(spark, dir), "vec_id", "embedding"))

  val deconSemanticSql: String = s"""
    WITH e AS (
      SELECT vec_id, cast(embedding AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding AS DOUBLE[]),
             cast(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    ev AS (SELECT * FROM e WHERE vec_id % $DeconEvalMod = 0),
    bad AS (
      SELECT DISTINCT t.vec_id FROM e t JOIN ev
        ON list_inner_product(t.v, ev.v) / (t.nrm * ev.nrm) >= $DeconTau
      WHERE t.vec_id % $DeconEvalMod <> 0)
    SELECT vec_id FROM embeddings
    WHERE vec_id % $DeconEvalMod <> 0
      AND vec_id NOT IN (SELECT vec_id FROM bad)
    ORDER BY vec_id"""

  // ------------------------------------------------- linear probe

  private val ProbeDims = 16
  private val ProbeIters = 6
  private val ProbeLr = 4.0

  /** Feature frame for the `linear_probe*` queries: y = (label = 0)
    * one-vs-rest, x0 = intercept, x1..x[[ProbeDims]] = the leading
    * embedding dimensions z-standardized against the corpus (mean /
    * population stddev from ONE aggregation, broadcast back as a
    * 1-row frame). Standardization bounds every feature at O(1), which
    * bounds the GD steps and keeps σ away from the exp-overflow range —
    * the precondition [[graft.operators.Logistic.logLoss]] documents.
    */
  private[graft] def probeFeatures(e: DataFrame): DataFrame = {
    val dims = 1 to ProbeDims
    val raw = e.select(
      col("vec_id") +:
        when(col("label") === 0, 1.0).otherwise(0.0).as("y") +:
        dims.map(j => element_at(col("embedding"), j).cast("double").as(s"r$j")): _*)
    val statCols = dims.flatMap(j => Seq(
      avg(col(s"r$j")).as(s"m$j"), stddev_pop(col(s"r$j")).as(s"s$j")))
    // Materialized: the stats row is 1×(2·ProbeDims) doubles, but its
    // plan is a FULL corpus aggregation — and the feature frame is
    // re-evaluated once per GD step by Logistic.train plus once by the
    // scoring/loss pass, so an unmaterialized stats subtree would rerun
    // that corpus pass 7× per probe query (2 passes/step instead of 1)
    val st = Materialize(raw.agg(statCols.head, statCols.tail: _*))
    // s=0 guard mirrors textProbeStandardize (and the CASE WHEN in
    // probeTrainCtes): a constant feature dimension standardizes to 0
    // in BOTH engines instead of Spark-NULL-vs-DuckDB-inf divergence
    raw.crossJoin(broadcast(st)).select(
      col("vec_id") +: col("y") +: lit(1.0).as("x0") +:
        dims.map(j => when(col(s"s$j") === 0.0, 0.0)
          .otherwise((col(s"r$j") - col(s"m$j")) / col(s"s$j")).as(s"x$j")): _*)
  }

  /** `linear_probe` — model-in-the-loop curation head, training half:
    * [[ProbeIters]] unrolled full-batch GD steps of one-vs-rest
    * logistic regression ([[graft.operators.Logistic]]) over the
    * standardized leading embedding dims. Output: one row with the
    * corpus size, the final mean log-loss, and every weight — the
    * whole training trajectory is deterministic (zero init, fixed
    * steps), so the DuckDB oracle REPLAYS training as a generated CTE
    * chain and the weights must agree to the round-6 cell. On this
    * synthetic corpus the labels are only weakly linearly separable
    * (loss prior 0.325 → 0.312); LogisticSpec proves the trainer
    * drives loss ~0 on planted separable data, and the oracle proves
    * the distributed recurrence is exact — accuracy on real labels is
    * a property of the data, not the operator.
    */
  def linearProbe(spark: SparkSession, dir: String): DataFrame = {
    val feats = probeFeatures(embs(spark, dir))
    val w = Logistic.train(feats, ProbeDims + 1, ProbeIters, ProbeLr)
    Logistic.logLoss(feats, w).select(
      col("n") +: round(col("log_loss"), 6).as("log_loss") +:
        w.indices.map(j => round(lit(w(j)), 6).as(s"w$j")): _*)
  }

  /** `linear_probe_score` — the scoring half: every vector's predicted
    * probability under the trained head (the corpus-wide gate pass a
    * quality classifier exists for). Pure map-side projection once the
    * model-sized weights fold in as literals.
    */
  def linearProbeScore(spark: SparkSession, dir: String): DataFrame = {
    val feats = probeFeatures(embs(spark, dir))
    val w = Logistic.train(feats, ProbeDims + 1, ProbeIters, ProbeLr)
    feats.select(col("vec_id"), col("y"),
        round(Logistic.prob(w), 6).as("p"))
      .orderBy("vec_id")
  }

  /** Generated GD-step CTE chain `w0..w{iters}` over an existing CTE
    * `frame` with columns y, x0..x{nf-1} — the SQL replay of
    * [[graft.operators.Logistic.train]], shared by the embedding probe
    * and the text distillation probe so every probe oracle derives
    * from one generator (constants can't desync per-family).
    */
  private def gdChainCtes(nf: Int, iters: Int, lr: Double, frame: String): String = {
    def zExpr = (0 until nf).map(j => s"w.w$j*f.x$j").mkString("(", " + ", ")")
    def pExpr = s"(1.0/(1.0 + exp(-$zExpr)))"
    val steps = (1 to iters).flatMap { it =>
      val grads = (0 until nf)
        .map(j => s"sum(($pExpr - f.y) * f.x$j) / count(*) AS g$j")
        .mkString(",\n        ")
      val updates = (0 until nf)
        .map(j => s"w.w$j - $lr * g.g$j AS w$j").mkString(", ")
      Seq(
        s"""g$it AS (
      SELECT $grads
      FROM $frame f, w${it - 1} w)""",
        s"""w$it AS (SELECT $updates FROM w${it - 1} w, g$it g)""")
    }
    s"""w0 AS (SELECT ${(0 until nf).map(j => s"0.0 AS w$j").mkString(", ")}),
    ${steps.mkString(",\n    ")}"""
  }

  /** Generated CTE chain replaying the probe's training in DuckDB —
    * from the SAME constants as the Scala path, so query and oracle
    * cannot desync (the `knnPqSql` precedent). Ends at weight frame
    * `w[[ProbeIters]]`.
    */
  private def probeTrainCtes: String = {
    val dims = 1 to ProbeDims
    s"""raw AS (
      SELECT vec_id, CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y,
        ${dims.map(j => s"cast(embedding[$j] AS DOUBLE) AS r$j").mkString(",\n        ")}
      FROM embeddings),
    st AS (
      SELECT ${dims.map(j => s"avg(r$j) AS m$j, stddev_pop(r$j) AS s$j").mkString(",\n        ")}
      FROM raw),
    feats AS (
      SELECT vec_id, y, 1.0 AS x0,
        ${dims.map(j =>
           s"CASE WHEN s.s$j = 0 THEN 0.0 ELSE (r$j - s.m$j) / s.s$j END AS x$j")
          .mkString(",\n        ")}
      FROM raw, st s),
    ${gdChainCtes(ProbeDims + 1, ProbeIters, ProbeLr, "feats")}"""
  }

  val linearProbeSql: String = materializeCtes {
    val nf = ProbeDims + 1
    val z = (0 until nf).map(j => s"w.w$j*f.x$j").mkString("(", " + ", ")")
    // Logistic.ProbEps clamp, mirrored (1e0 literals keep DOUBLE math)
    val p = s"greatest(least((1.0/(1.0 + exp(-$z))), 1e0 - 1e-15), 1e-15)"
    s"""
    WITH $probeTrainCtes,
    loss AS (
      SELECT -sum(f.y*ln($p) + (1.0-f.y)*ln(1.0-$p))/count(*) AS ll,
        cast(count(*) AS BIGINT) AS n
      FROM feats f, w$ProbeIters w)
    SELECT l.n, round(l.ll, 6) AS log_loss,
      ${(0 until nf).map(j => s"round(w.w$j, 6) AS w$j").mkString(", ")}
    FROM loss l, w$ProbeIters w"""
  }

  val linearProbeScoreSql: String = materializeCtes {
    val nf = ProbeDims + 1
    val z = (0 until nf).map(j => s"w.w$j*f.x$j").mkString("(", " + ", ")")
    val p = s"(1.0/(1.0 + exp(-$z)))"
    s"""
    WITH $probeTrainCtes
    SELECT f.vec_id, f.y, round($p, 6) AS p
    FROM feats f, w$ProbeIters w
    ORDER BY f.vec_id"""
  }

  /** `probe_calibration` — reliability diagram of the trained head:
    * decile bins of the predicted probability vs the empirical positive
    * rate (is p=0.7 right 70% of the time?), the standard go/no-go
    * check before a probe's scores gate a corpus. Binning is on the
    * ROUND-6 probability — the exact value `linear_probe_score` proves
    * hash-identical across engines — so bin membership is deterministic
    * on both sides (a raw-double floor could flip a knife-edge row).
    * One corpus aggregation into ≤10 rows; scales like any keyed agg.
    */
  def probeCalibration(spark: SparkSession, dir: String): DataFrame = {
    val feats = probeFeatures(embs(spark, dir))
    val w = Logistic.train(feats, ProbeDims + 1, ProbeIters, ProbeLr)
    feats.select(col("y"), round(Logistic.prob(w), 6).as("p"))
      .withColumn("bin", least(floor(col("p") * 10), lit(9.0)).cast("int"))
      .groupBy("bin").agg(
        count(lit(1)).as("n"),
        round(avg("p"), 6).as("mean_p"),
        round(avg("y"), 6).as("frac_pos"))
      .orderBy("bin")
  }

  /** `probe_auc` — exact ROC-AUC of the trained head via the rank-sum
    * (Mann–Whitney) identity over the ROUND-6 score histogram: ranks
    * from cumulative value counts, 2U = Σ_pos(lo+hi) − n_pos(n_pos+1)
    * (the `auc_score` kernel, applied to a LEARNED score instead of a
    * proxy). The global window runs over the score histogram, which is
    * bounded at ≤ 10⁶+1 rows by the round-6 domain regardless of
    * corpus size — nothing data-sized is globally sorted. Rank sums in
    * DECIMAL(38,0)/HUGEINT: quadratic in N, past 2⁶³ at cluster scale.
    */
  def probeAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val feats = probeFeatures(embs(spark, dir))
    val w = Logistic.train(feats, ProbeDims + 1, ProbeIters, ProbeLr)
    val d = feats.select(round(Logistic.prob(w), 6).as("v"),
      col("y").cast("long").as("y"))
    val hist = d.groupBy("v").agg(count(lit(1)).as("c"), sum("y").as("pos"))
      .withColumn("hi", sum("c").over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("lo", col("hi") - col("c") + 1)
    hist.agg(
        sum(col("pos").cast(DecimalType(38, 0)) * (col("lo") + col("hi"))).as("rsum2"),
        sum("pos").as("np"), sum(col("c") - col("pos")).as("nn"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        round((col("rsum2") - col("np").cast(DecimalType(38, 0)) * (col("np") + 1)).cast("double") /
          (lit(2) * col("np").cast(DecimalType(38, 0)) * col("nn")).cast("double"), 6).as("auc"))
  }

  val probeCalibrationSql: String = materializeCtes {
    val nf = ProbeDims + 1
    val z = (0 until nf).map(j => s"w.w$j*f.x$j").mkString("(", " + ", ")")
    val p = s"(1.0/(1.0 + exp(-$z)))"
    s"""
    WITH $probeTrainCtes,
    scored AS (
      SELECT f.y, round($p, 6) AS p
      FROM feats f, w$ProbeIters w)
    SELECT least(cast(floor(p * 10) AS INT), 9) AS bin,
      count(*) AS n, round(avg(p), 6) AS mean_p,
      round(avg(y), 6) AS frac_pos
    FROM scored GROUP BY 1
    ORDER BY bin"""
  }

  val probeAucSql: String = materializeCtes {
    val nf = ProbeDims + 1
    val z = (0 until nf).map(j => s"w.w$j*f.x$j").mkString("(", " + ", ")")
    val p = s"(1.0/(1.0 + exp(-$z)))"
    s"""
    WITH $probeTrainCtes,
    scored AS (
      SELECT round($p, 6) AS v, cast(f.y AS BIGINT) AS y
      FROM feats f, w$ProbeIters w),
    hist AS (
      SELECT v, count(*) AS c, sum(y) AS pos FROM scored GROUP BY v),
    cum AS (
      SELECT v, c, pos,
        sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      FROM hist)
    SELECT cast(sum(pos) AS BIGINT) AS n_pos,
      cast(sum(c - pos) AS BIGINT) AS n_neg,
      round(CAST(sum(cast(pos AS HUGEINT) * ((hi - c + 1) + hi))
                 - cast(sum(pos) AS HUGEINT) * (sum(pos) + 1) AS DOUBLE)
        / CAST(2 * cast(sum(pos) AS HUGEINT) * sum(c - pos) AS DOUBLE), 6) AS auc
    FROM cum"""
  }

  /** `probe_pr_curve` — precision / recall / F1 of the trained head's
    * TOP-q% GATE for q ∈ {10..90}, completing the probe-eval suite
    * (probe_auc ranks, probe_calibration calibrates, this picks the
    * OPERATING POINT a curation gate deploys: "keep the best q%").
    * Quantile gates, not absolute thresholds — the head's scores live
    * in [0.03, 0.30] on this corpus (measured at every SF), so a fixed
    * decile threshold grid would leave most gates EMPTY and precision
    * 0/0; keep-fraction gates are non-empty by construction. Shape:
    * cuts come from the ROUND-6 score histogram (bounded ≤ 10⁶+1 rows
    * regardless of corpus size — the probe_auc domain argument), with
    * descending cumulative counts under a global window over that
    * bounded frame; each gate keeps whole score-groups, so `n_kept`
    * is the smallest group-closed count ≥ ⌈qN/100⌉ and both engines
    * agree exactly. The gate target uses integer-safe arithmetic
    * (floor((qN+99)/100): the true quotient is ≥ 0.01 from the next
    * integer, so fp floor cannot disagree).
    */
  def probePrCurve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = probeFeatures(embs(spark, dir))
    val w = Logistic.train(feats, ProbeDims + 1, ProbeIters, ProbeLr)
    val scored = feats.select(col("y"), round(Logistic.prob(w), 6).as("p"))
    val hist = scored.groupBy("p")
      .agg(count(lit(1)).as("c"), sum("y").cast("long").as("pos"))
      .withColumn("cum_n", sum("c").over(
        Window.orderBy(col("p").desc).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_hit", sum("pos").over(
        Window.orderBy(col("p").desc).rowsBetween(Window.unboundedPreceding, 0)))
    val tot = hist.agg(sum("c").as("n_total"), sum("pos").as("p_total"))
    val qs = spark.range(1, 10).select((col("id") * 10).cast("int").as("keep_pct"))
    val gates = qs.join(broadcast(tot))
      .join(hist, col("cum_n") >= floor((col("keep_pct") * col("n_total") + 99) / 100))
      .groupBy("keep_pct")
      .agg(min_by(struct(col("p"), col("cum_n"), col("cum_hit"), col("p_total")),
        col("cum_n")).as("g"))
      .select(col("keep_pct"), col("g.p").as("cut_p"),
        col("g.cum_n").as("n_kept"), col("g.cum_hit").as("hits"),
        col("g.p_total").as("p_total"))
    val prec = col("hits").cast("double") / col("n_kept")
    val rec = col("hits").cast("double") / col("p_total")
    gates.select(col("keep_pct"), col("cut_p"), col("n_kept"),
        round(prec, 6).as("precision"), round(rec, 6).as("recall"),
        when(col("hits") === 0, 0.0)
          .otherwise(round(lit(2.0) * prec * rec / (prec + rec), 6)).as("f1"))
      .orderBy("keep_pct")
  }

  val probePrCurveSql: String = materializeCtes {
    val nf = ProbeDims + 1
    val z = (0 until nf).map(j => s"w.w$j*f.x$j").mkString("(", " + ", ")")
    val p = s"(1.0/(1.0 + exp(-$z)))"
    s"""
    WITH $probeTrainCtes,
    scored AS (
      SELECT f.y, round($p, 6) AS p
      FROM feats f, w$ProbeIters w),
    hist AS (
      SELECT p, count(*) AS c, cast(sum(y) AS BIGINT) AS pos
      FROM scored GROUP BY p),
    cum AS (
      SELECT p, c, pos,
        sum(c) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        sum(pos) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hit
      FROM hist),
    tot AS (SELECT sum(c) AS n_total, sum(pos) AS p_total FROM hist),
    gates AS (
      SELECT q.keep_pct,
        min_by(struct_pack(p := c.p, cum_n := c.cum_n, cum_hit := c.cum_hit), c.cum_n) AS g
      FROM (SELECT cast(t.k * 10 AS INT) AS keep_pct FROM range(1, 10) t(k)) q
      JOIN tot ON true
      JOIN cum c ON c.cum_n >= floor((q.keep_pct * tot.n_total + 99) / 100)
      GROUP BY q.keep_pct)
    SELECT g.keep_pct, g.g.p AS cut_p,
      cast(g.g.cum_n AS BIGINT) AS n_kept,
      round(g.g.cum_hit / CAST(g.g.cum_n AS DOUBLE), 6) AS precision,
      round(g.g.cum_hit / CAST(t.p_total AS DOUBLE), 6) AS recall,
      CASE WHEN g.g.cum_hit = 0 THEN 0.0 ELSE
        round(2.0 * (g.g.cum_hit / CAST(g.g.cum_n AS DOUBLE)) * (g.g.cum_hit / CAST(t.p_total AS DOUBLE))
          / ((g.g.cum_hit / CAST(g.g.cum_n AS DOUBLE)) + (g.g.cum_hit / CAST(t.p_total AS DOUBLE))), 6)
      END AS f1
    FROM gates g, tot t ORDER BY g.keep_pct"""
  }

  // ------------------------------------- text distillation probe

  private val TpBuckets = 16
  private val TpFeats = TpBuckets + 3 // bucket rates + n_toks, ttr, avg_len
  // 8, not 12: held-out AUC measured identical (0.9787 vs 0.9783 at
  // sf0.01, 0.9743 vs 0.9748 at sf0.1) and each step is a full
  // aggregation pass over the cached feature frame — iterations are
  // the probe's unit of cost, so the budget stops where the metric does.
  private val TpIters = 8
  private val TpLr = 4.0
  private val TpQualityCut = 0.6

  /** TRAIN flag: md5 80/20 split on doc_id (the `sample_hash` recipe) —
    * the held-out 20% never touches training OR the standardization
    * stats, so `text_probe_eval` is a real generalization measurement.
    */
  private def tpIsTrain(id: org.apache.spark.sql.Column) =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 5) =!= 0

  /** Feature frame for the `text_probe*` queries — the fastText-style
    * distillation shape: y = (round-6 quality ≥ [[TpQualityCut]]), the
    * label a cheap heuristic assigns and the head learns to imitate
    * from DIFFERENT features: 16 hashed-token-bucket rates (md5 →
    * bucket, the reproducible-hash recipe) plus token count, type-token
    * ratio, and mean word length, z-standardized against TRAIN-ONLY
    * stats. One explode + one doc-keyed aggregation builds every
    * feature. Bucket rates alone can't see length (they're rate-
    * normalized) and quality is 40% length — measured: buckets-only
    * held-out AUC 0.53-0.62, with the three shape features 0.94-0.98.
    * A structurally EMPTY bucket (small-vocabulary corpus: every token
    * type hashes elsewhere) yields an all-zero rate column whose
    * stddev_pop is EXACTLY 0.0 in both engines (sums of zeros), so the
    * s=0 guard → feature 0 → weight stays at zero init; no knife edge.
    */
  private[graft] def textProbeFeatures(spark: SparkSession, dir: String): DataFrame =
    textProbeStandardize(textProbeRaw(spark, dir))

  /** Frozen text-probe model for DEPLOYMENT (the streaming scorer):
    * train-split standardization stats + trained weights + the bucket
    * count, all model-sized. One corpus pass + the GD steps, same
    * constants as the registered queries — including [[TpBuckets]], so
    * a deployed scorer can never hash into a different bucket space
    * than the batch pipeline trained in. `StreamingProbeScoreSpec`
    * proves a stream scored with this model emits round-6-identical
    * probabilities to the batch pipeline.
    */
  private[graft] def textProbeModel(spark: SparkSession, dir: String)
      : graft.streaming.StreamingProbeScore.ProbeModel = {
    val raw = textProbeRaw(spark, dir)
    val dims = 1 to TpFeats
    val statCols = dims.flatMap(j => Seq(
      avg(col(s"r$j")).as(s"m$j"), stddev_pop(col(s"r$j")).as(s"s$j")))
    val st = raw.filter(col("tr")).agg(statCols.head, statCols.tail: _*).head()
    val m = dims.map(j => st.getDouble(2 * (j - 1))).toArray
    val s = dims.map(j => st.getDouble(2 * (j - 1) + 1)).toArray
    val w = Logistic.train(
      Materialize(textProbeStandardize(raw).filter(col("tr"))),
      TpFeats + 1, TpIters, TpLr)
    graft.streaming.StreamingProbeScore.ProbeModel(m, s, w.toArray, TpBuckets)
  }

  private def textProbeRaw(spark: SparkSession, dir: String): DataFrame = {
    // The per-doc numeric frame is Materialize'd right after the single
    // corpus pass: the standardization stats, the train filter, and
    // every GD step then read (rows × 20 doubles) cached blocks instead
    // of re-running the explode pipeline. Two measured traps shaped
    // this:
    //  - per-doc scalars from the token ARRAY (size/array_distinct/
    //    aggregate) instead of the exploded rows: ~2× SLOWER — those
    //    are CodegenFallback per-row interpreters, while the exploded
    //    count-distinct expand stays inside codegen;
    //  - grouping the token aggregation BY the quality column: 0.6 s →
    //    10.7 s — the interpreted qualityScore expression becomes a
    //    grouping key evaluated per exploded TOKEN row (~200× per doc).
    //    Quality therefore lives in its own per-doc projection, joined
    //    on doc_id AFTER the aggregation (two doc-sized frames, one
    //    equi-join — the scale-safe shape regardless).
    // spreadToCores measured a wash here (2.09 -> 2.14 s): the md5
    // bucket hash per token looked kmGramFrame-shaped, but this query's
    // cost is the GD steps + AUC window over the materialized frame,
    // not the single-threaded map stage — left unspread
    val toks = docs(spark, dir).select(
      col("doc_id"),
      explode(TextAnalysis.wordTokens(lower(col("text")))).as("tok"))
    val bkt = conv(substring(md5(col("tok")), 1, 8), 16, 10)
      .cast("long") % TpBuckets
    val aggs = Seq(
      count(lit(1)).cast("double").as("n"),
      countDistinct(col("tok")).cast("double").as("dt"),
      sum(length(col("tok"))).cast("double").as("chars")) ++
      (0 until TpBuckets).map(b =>
        sum(when(bkt === b, 1).otherwise(0)).cast("double").as(s"k$b"))
    val q = docs(spark, dir).select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val per = toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .join(q, "doc_id")
    Materialize(per.select(
      col("doc_id") +:
        tpIsTrain(col("doc_id")).as("tr") +:
        when(col("quality") >= TpQualityCut, 1.0).otherwise(0.0).as("y") +:
        ((1 to TpBuckets).map(j => (col(s"k${j - 1}") / col("n")).as(s"r$j")) ++ Seq(
          col("n").as(s"r${TpBuckets + 1}"),
          (col("dt") / col("n")).as(s"r${TpBuckets + 2}"),
          (col("chars") / col("n")).as(s"r${TpBuckets + 3}"))): _*))
  }

  private def textProbeStandardize(raw: DataFrame): DataFrame = {
    val dims = 1 to TpFeats
    val statCols = dims.flatMap(j => Seq(
      avg(col(s"r$j")).as(s"m$j"), stddev_pop(col(s"r$j")).as(s"s$j")))
    val st = raw.filter(col("tr")).agg(statCols.head, statCols.tail: _*)
    raw.crossJoin(broadcast(st)).select(
      col("doc_id") +: col("tr") +: col("y") +: lit(1.0).as("x0") +:
        dims.map(j => when(col(s"s$j") === 0.0, 0.0)
          .otherwise((col(s"r$j") - col(s"m$j")) / col(s"s$j")).as(s"x$j")): _*)
  }

  /** `text_probe` — distill the composite quality heuristic into a
    * linear head over hashed-token features (the fastText/CCNet
    * curation-classifier shape: an expensive gate becomes a cheap
    * scan-time score). [[TpIters]] GD steps on the TRAIN split only;
    * output: train size, train log-loss, every weight (round 6). The
    * feature frame is [[graft.operators.Materialize]]d before training
    * — the opposite call from `linear_probe`, deliberately: its
    * recompute is a pruned-scan projection, this one's is a full
    * explode + two-level aggregation over the text, so pinning the
    * (rows × 20 doubles) numeric frame for 12 passes is the right
    * trade at any scale. Oracle replays training via [[gdChainCtes]].
    */
  def textProbe(spark: SparkSession, dir: String): DataFrame = {
    val train = Materialize(textProbeFeatures(spark, dir).filter(col("tr")))
    val w = Logistic.train(train, TpFeats + 1, TpIters, TpLr)
    Logistic.logLoss(train, w).select(
      col("n") +: round(col("log_loss"), 6).as("log_loss") +:
        w.indices.map(j => round(lit(w(j)), 6).as(s"w$j")): _*)
  }

  /** `text_probe_eval` — the generalization certificate: exact rank-sum
    * AUC (the `probe_auc` kernel), accuracy at p ≥ 0.5, and base rate,
    * all on the HELD-OUT 20% the training never saw (neither GD nor
    * the standardization stats). Measured 0.94-0.98 AUC across SFs —
    * the heuristic genuinely distills, unlike the weakly-separable
    * embedding probe (documented there). Comparisons are on the
    * round-6 probability, so engines agree on every gate membership.
    */
  def textProbeEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val feats = Materialize(textProbeFeatures(spark, dir))
    val w = Logistic.train(feats.filter(col("tr")), TpFeats + 1, TpIters, TpLr)
    val test = feats.filter(!col("tr"))
      .select(round(Logistic.prob(w), 6).as("p"), col("y"))
    val hist = test.groupBy("p")
      .agg(count(lit(1)).as("c"), sum("y").cast("long").as("pos"))
      .withColumn("hi", sum("c").over(
        Window.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("lo", col("hi") - col("c") + 1)
    val acc = test.agg(avg(when((col("p") >= 0.5) === (col("y") === 1.0), 1.0)
      .otherwise(0.0)).as("acc"))
    hist.agg(
        sum(col("pos").cast(DecimalType(38, 0)) * (col("lo") + col("hi"))).as("rsum2"),
        sum("pos").as("np"), sum(col("c") - col("pos")).as("nn"),
        sum("c").as("n"))
      .crossJoin(broadcast(acc))
      .select(col("n").as("n_test"),
        round(col("np").cast("double") / col("n"), 6).as("base_rate"),
        round((col("rsum2") - col("np").cast(DecimalType(38, 0)) * (col("np") + 1)).cast("double") /
          (lit(2) * col("np").cast(DecimalType(38, 0)) * col("nn")).cast("double"), 6).as("auc"),
        round(col("acc"), 6).as("accuracy"))
  }

  /** Shared feature CTEs for the text-probe oracles: quality gate →
    * hashed buckets → per-doc counts → train-only standardization →
    * `ftr` (train) / `fte` (held-out) frames. Generated from the SAME
    * constants as the Scala path.
    */
  private def textProbeCtes: String = {
    val dims = 1 to TpFeats
    s"""q AS (${TextQueries.qualityScoreSql}),
    tk AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents),
    bt AS (
      SELECT doc_id, tok,
        CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % $TpBuckets AS b
      FROM tk),
    per AS (
      SELECT bt.doc_id, q.quality,
        CAST(count(*) AS DOUBLE) AS n,
        CAST(count(DISTINCT tok) AS DOUBLE) AS dt,
        CAST(sum(length(tok)) AS DOUBLE) AS chars,
        ${(0 until TpBuckets).map(b =>
           s"CAST(sum(CASE WHEN b = $b THEN 1 ELSE 0 END) AS DOUBLE) AS k$b")
          .mkString(",\n        ")}
      FROM bt JOIN q USING (doc_id) GROUP BY bt.doc_id, q.quality),
    raw AS (
      SELECT doc_id,
        CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 != 0 AS tr,
        CASE WHEN quality >= $TpQualityCut THEN 1.0 ELSE 0.0 END AS y,
        ${(1 to TpBuckets).map(j => s"k${j - 1} / n AS r$j").mkString(",\n        ")},
        n AS r${TpBuckets + 1}, dt / n AS r${TpBuckets + 2}, chars / n AS r${TpBuckets + 3}
      FROM per),
    st AS (
      SELECT ${dims.map(j => s"avg(r$j) AS m$j, stddev_pop(r$j) AS s$j").mkString(",\n        ")}
      FROM raw WHERE tr),
    feats AS (
      SELECT doc_id, tr, y, 1.0 AS x0,
        ${dims.map(j =>
           s"CASE WHEN s.s$j = 0 THEN 0.0 ELSE (r$j - s.m$j) / s.s$j END AS x$j")
          .mkString(",\n        ")}
      FROM raw, st s),
    ftr AS (SELECT * FROM feats WHERE tr),
    fte AS (SELECT * FROM feats WHERE NOT tr),
    ${gdChainCtes(TpFeats + 1, TpIters, TpLr, "ftr")}"""
  }

  val textProbeSql: String = materializeCtes {
    val nf = TpFeats + 1
    val z = (0 until nf).map(j => s"w.w$j*f.x$j").mkString("(", " + ", ")")
    // Logistic.ProbEps clamp, mirrored (1e0 literals keep DOUBLE math)
    val p = s"greatest(least((1.0/(1.0 + exp(-$z))), 1e0 - 1e-15), 1e-15)"
    s"""
    WITH $textProbeCtes,
    loss AS (
      SELECT -sum(f.y*ln($p) + (1.0-f.y)*ln(1.0-$p))/count(*) AS ll,
        cast(count(*) AS BIGINT) AS n
      FROM ftr f, w$TpIters w)
    SELECT l.n, round(l.ll, 6) AS log_loss,
      ${(0 until nf).map(j => s"round(w.w$j, 6) AS w$j").mkString(", ")}
    FROM loss l, w$TpIters w"""
  }

  val textProbeEvalSql: String = materializeCtes {
    val nf = TpFeats + 1
    val z = (0 until nf).map(j => s"w.w$j*f.x$j").mkString("(", " + ", ")")
    val p = s"(1.0/(1.0 + exp(-$z)))"
    s"""
    WITH $textProbeCtes,
    scored AS (
      SELECT round($p, 6) AS p, f.y
      FROM fte f, w$TpIters w),
    hist AS (
      SELECT p, count(*) AS c, cast(sum(y) AS BIGINT) AS pos
      FROM scored GROUP BY p),
    cum AS (
      SELECT p, c, pos,
        sum(c) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      FROM hist),
    acc AS (
      SELECT avg(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END) AS acc
      FROM scored)
    SELECT cast(sum(c) AS BIGINT) AS n_test,
      round(CAST(sum(pos) AS DOUBLE) / sum(c), 6) AS base_rate,
      round(CAST(sum(cast(pos AS HUGEINT) * ((hi - c + 1) + hi))
                 - cast(sum(pos) AS HUGEINT) * (sum(pos) + 1) AS DOUBLE)
        / CAST(2 * cast(sum(pos) AS HUGEINT) * sum(c - pos) AS DOUBLE), 6) AS auc,
      round((SELECT acc FROM acc), 6) AS accuracy
    FROM cum"""
  }

  // ------------------------------------- between-label scatter axis

  private val ScatterSquarings = 7

  /** `label_scatter_pc1` — the drift axis: dominant eigendirection of
    * the between-label scatter ([[graft.operators.Pca]]), 64 rows
    * (dimension, loading). One label-keyed corpus aggregation; the
    * eigen-solve is model-sized driver math (power-by-squaring on the
    * L×L centroid matrix — see Pca's scaladoc for why vanilla power
    * iteration is the wrong tool on this near-isotropic corpus). The
    * oracle replays the identical recurrence in long-form SQL:
    * centroid frames → L²-row matrix squarings → lift → svd_flip sign.
    */
  def labelScatterPc1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sc = Pca.labelScatter(embs(spark, dir), "embedding", Dim)
    val (_, v, _, _) = Pca.dominantDirection(sc.w, sc.dMat, ScatterSquarings)
    v.toSeq.zipWithIndex.map { case (x, i) => (i + 1, x) }
      .toDF("i", "raw")
      .select(col("i"), round(col("raw"), 6).as("loading"))
      .orderBy("i")
  }

  /** `label_scatter_power` — the certificate row: λ₁, its share of
    * trace(B) (how concentrated inter-label drift is on one axis), and
    * the convergence residual ‖Bv − λv‖/λ (measured ~1e-14 after
    * [[ScatterSquarings]] squarings; a non-converged run would surface
    * as a nonzero round-6 resid AND an oracle hash break).
    */
  def labelScatterPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sc = Pca.labelScatter(embs(spark, dir), "embedding", Dim)
    val (lambda, _, resid, trace) = Pca.dominantDirection(sc.w, sc.dMat, ScatterSquarings)
    Seq((lambda, lambda / trace, resid)).toDF("l", "s", "r")
      .select(round(col("l"), 6).as("lambda"),
        round(col("s"), 6).as("scatter_share"),
        round(col("r"), 6).as("resid"))
  }

  /** Long-form SQL replaying the scatter solve up to the UNROUNDED
    * signed pc1 frame — shared by both `label_scatter_*` oracles.
    */
  private def scatterCtes: String = {
    val squarings = (1 to ScatterSquarings).flatMap(k => Seq(
      s"""a${k}r AS (
      SELECT a.l, b.r, sum(a.g * b.g) AS g
      FROM a${k - 1} a JOIN a${k - 1} b ON a.r = b.l GROUP BY a.l, b.r)""",
      s"""a$k AS (
      SELECT l, r, g / (SELECT sqrt(sum(g * g)) FROM a${k}r) AS g FROM a${k}r)"""))
    s"""el AS (
      SELECT label, t.i, cast(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, ${Dim + 1}) t(i)),
    wgt AS (
      SELECT label, count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM embeddings) AS w
      FROM embeddings GROUP BY label),
    cent AS (SELECT label, i, avg(x) AS c FROM el GROUP BY label, i),
    mu AS (
      SELECT c.i, sum(w.w * c.c) AS m
      FROM cent c JOIN wgt w USING (label) GROUP BY c.i),
    d AS (
      SELECT c.label, c.i, c.c - m.m AS dv
      FROM cent c JOIN mu m USING (i)),
    a0 AS (
      SELECT x.label AS l, y.label AS r, sqrt(wx.w * wy.w) * sum(x.dv * y.dv) AS g
      FROM d x JOIN d y USING (i)
      JOIN wgt wx ON wx.label = x.label JOIN wgt wy ON wy.label = y.label
      GROUP BY x.label, y.label, wx.w, wy.w),
    ${squarings.mkString(",\n    ")},
    dg AS (
      SELECT l FROM a$ScatterSquarings WHERE l = r
      ORDER BY g DESC, l ASC LIMIT 1),
    u0 AS (
      SELECT a.l, a.g AS u
      FROM a$ScatterSquarings a JOIN dg ON a.r = dg.l),
    u AS (SELECT l, u / (SELECT sqrt(sum(u * u)) FROM u0) AS u FROM u0),
    v0 AS (
      SELECT d.i, sum(sqrt(w.w) * u.u * d.dv) AS v
      FROM d JOIN u ON u.l = d.label JOIN wgt w ON w.label = d.label
      GROUP BY d.i),
    vn AS (SELECT i, v / (SELECT sqrt(sum(v * v)) FROM v0) AS v FROM v0),
    sgn AS (
      SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
      FROM vn ORDER BY abs(v) DESC, i ASC LIMIT 1),
    pc1 AS (SELECT i, v * s AS loading FROM vn, sgn)"""
  }

  val labelScatterPc1Sql: String = materializeCtes {
    s"""
    WITH $scatterCtes
    SELECT i, round(loading, 6) AS loading FROM pc1 ORDER BY i"""
  }

  val labelScatterPowerSql: String = materializeCtes {
    s"""
    WITH $scatterCtes,
    proj AS (
      SELECT d.label, sum(d.dv * p.loading) AS pr
      FROM d JOIN pc1 p ON p.i = d.i GROUP BY d.label),
    lam AS (
      SELECT sum(w.w * pr * pr) AS lambda
      FROM proj JOIN wgt w USING (label)),
    tr AS (
      SELECT sum(w.w * dv * dv) AS trace
      FROM d JOIN wgt w USING (label)),
    bv AS (
      SELECT d.i, sum(w.w * pr.pr * d.dv) AS bv
      FROM d JOIN proj pr ON pr.label = d.label JOIN wgt w ON w.label = d.label
      GROUP BY d.i)
    SELECT round(l.lambda, 6) AS lambda,
      round(l.lambda / t.trace, 6) AS scatter_share,
      round(sqrt((SELECT sum((bv.bv - l2.lambda * p.loading) * (bv.bv - l2.lambda * p.loading))
                  FROM bv JOIN pc1 p USING (i), lam l2)) / l.lambda, 6) AS resid
    FROM lam l, tr t"""
  }

  /** `label_scatter_project` — the apply step: every vector's
    * coordinate along the drift axis, score = v·(x − μ) with the
    * model-sized (v, μ) folded in as LITERALS — a pure map-side
    * projection over the corpus, zero shuffles beyond the final sort
    * (the linear_probe_score shape: train once on the driver, score
    * everywhere). Cross-engine fp: v diverges only by ~ΔA/gap ≈ 1e-13,
    * so the round-6 score cannot knife-edge at any registered SF.
    */
  def labelScatterProject(spark: SparkSession, dir: String): DataFrame = {
    val sc = Pca.labelScatter(embs(spark, dir), "embedding", Dim)
    val (_, v, _, _) = Pca.dominantDirection(sc.w, sc.dMat, ScatterSquarings)
    val score = (1 to Dim).map(i =>
      lit(v(i - 1)) * (element_at(col("embedding"), i).cast("double") - lit(sc.mu(i - 1))))
      .reduce(_ + _)
    embs(spark, dir).select(col("vec_id"), round(score, 6).as("drift"))
      .orderBy("vec_id")
  }

  /** `label_scatter_contrib` — which labels DRIVE the drift axis:
    * per-label weight, projection d_l·v, and contribution share
    * w_l·(d_l·v)²/λ (sums to 1 by the λ identity). Model-sized on the
    * driver; the oracle re-derives it from the same long-form chain.
    */
  def labelScatterContrib(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sc = Pca.labelScatter(embs(spark, dir), "embedding", Dim)
    val (lambda, v, _, _) = Pca.dominantDirection(sc.w, sc.dMat, ScatterSquarings)
    val rows = sc.w.indices.map { l =>
      val pr = sc.dMat(l).lazyZip(v).map(_ * _).sum
      (sc.labels(l), sc.w(l), pr, sc.w(l) * pr * pr / lambda)
    }
    rows.toDF("label", "wr", "pr", "cr")
      .select(col("label").cast("int").as("label"), round(col("wr"), 6).as("weight"),
        round(col("pr"), 6).as("projection"), round(col("cr"), 6).as("contrib_share"))
      .orderBy("label")
  }

  val labelScatterProjectSql: String = materializeCtes {
    s"""
    WITH $scatterCtes
    SELECT e.vec_id,
      round(sum(p.loading * (cast(e.embedding[p.i] AS DOUBLE) - m.m)), 6) AS drift
    FROM embeddings e, pc1 p JOIN mu m USING (i)
    GROUP BY e.vec_id
    ORDER BY e.vec_id"""
  }

  val labelScatterContribSql: String = materializeCtes {
    s"""
    WITH $scatterCtes,
    proj AS (
      SELECT d.label, sum(d.dv * p.loading) AS pr
      FROM d JOIN pc1 p ON p.i = d.i GROUP BY d.label),
    lam AS (
      SELECT sum(w.w * pr * pr) AS lambda
      FROM proj JOIN wgt w USING (label))
    SELECT cast(p.label AS INT) AS label, round(w.w, 6) AS weight,
      round(p.pr, 6) AS projection,
      round(w.w * p.pr * p.pr / l.lambda, 6) AS contrib_share
    FROM proj p JOIN wgt w USING (label), lam l
    ORDER BY p.label"""
  }

  // ------------------------------------- corpus-covariance PCA

  /** 12 squarings = C^4096: the corpus covariance is near-isotropic
    * (λ2/λ1 = 0.932 / 0.987 / 0.983 measured at sf0.001/0.01/0.1), so
    * 2^12 is the first power putting the convergence factor below fp
    * noise (0.987^4096 ≈ 1e-23; 10 squarings measured resid 2e-9 at
    * sf0.01, 12 → 3e-16). See [[graft.operators.Pca.dominantOfSymmetric]]
    * for the measured decision margins.
    */
  private val EmbPcaSquarings = 12

  /** ONE corpus pass for the d×d covariance, shaped as a DOUBLE
    * GENERATOR chain: append a sentinel 1.0 dimension, `posexplode`
    * the (d+1) positions, re-explode the carried vector per position,
    * keep the upper triangle, and sum x·y keyed by (i, j) — the
    * sentinel row folds the d mean-sums (j = d) and the count
    * ((d, d)) into the same pass, so NOTHING scans the corpus twice.
    * Both generators and the keyed aggregation stay inside whole-stage
    * codegen; map-side partial aggregation collapses each task to
    * ≤ (d+1)(d+2)/2 rows, so the only exchange is model-sized
    * regardless of corpus size.
    *
    * Shape was MEASURED against the obvious alternative — a single
    * 2 145-column aggregate (count + d sums + d(d+1)/2 product sums):
    * that agg plans AND executes pathologically (6.9 s warm at sf0.1
    * for 2 000 rows — per-row maintenance of thousands of named buffer
    * slots; the wide-aggregate sibling of the grouping-key traps) vs
    * 0.26 s for this chain, identical covariance to the last bit.
    * C_ij = S_ij/n − μ_i μ_j, mirrored symmetric on the driver
    * (model-sized).
    */
  private[queries] def embPcaCovOf(e: DataFrame, d: Int = Dim): Array[Array[Double]] =
    embPcaModelOf(e, d)._1

  /** (covariance, μ) from the same single pass — the projection query
    * needs the mean too.
    */
  private[queries] def embPcaModelOf(e: DataFrame, d: Int = Dim)
      : (Array[Array[Double]], Array[Double]) = {
    val aug = e.select(concat(col("embedding").cast("array<double>"),
      array(lit(1.0))).as("v"))
    val el = aug.select(col("v"), posexplode(col("v")).as(Seq("i", "x")))
    val up = el.select(col("i"), col("x"), posexplode(col("v")).as(Seq("j", "y")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j").agg(sum(col("x") * col("y")).as("sp"))
    val s = Array.ofDim[Double](d + 1, d + 1)
    up.collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      s(i)(j) = v
      s(j)(i) = v
    }
    val n = s(d)(d)
    val mu = Array.tabulate(d)(i => s(i)(d) / n)
    (Array.tabulate(d, d)((i, j) => s(i)(j) / n - mu(i) * mu(j)), mu)
  }

  /** `emb_pca` — UNSUPERVISED pc1 of the raw corpus covariance (the
    * whitening/JL-validation axis), completing the PCA family next to
    * the supervised between-label scatter: one wide aggregation pass
    * ([[embPcaCovOf]]) then model-sized driver math
    * ([[graft.operators.Pca.dominantOfSymmetric]]). 64 rows
    * (dimension, loading); the oracle replays covariance → 12
    * normalized squarings → max-diag column → svd_flip in long-form
    * SQL, the `label_scatter_pc1` discipline.
    */
  def embPca(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = embPcaCovOf(embs(spark, dir))
    val (_, v, _, _) = Pca.dominantOfSymmetric(c, EmbPcaSquarings)
    v.toSeq.zipWithIndex.map { case (x, i) => (i + 1, x) }
      .toDF("i", "raw")
      .select(col("i"), round(col("raw"), 6).as("loading"))
      .orderBy("i")
  }

  /** `emb_pca_power` — the certificate row: λ₁, its share of trace(C)
    * (near-isotropy quantified: measured ~0.02–0.03 on this corpus —
    * the number that justifies the scatter family's existence), and
    * the convergence residual (≈3e-16 at every SF after
    * [[EmbPcaSquarings]] squarings).
    */
  def embPcaPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = embPcaCovOf(embs(spark, dir))
    val (lambda, _, resid, trace) = Pca.dominantOfSymmetric(c, EmbPcaSquarings)
    Seq((lambda, lambda / trace, resid)).toDF("l", "s", "r")
      .select(round(col("l"), 6).as("lambda"),
        round(col("s"), 6).as("var_share"),
        round(col("r"), 6).as("resid"))
  }

  /** `emb_pca_project` — every vector's coordinate along the corpus
    * pc1, score = v·(x − μ) with the model-sized (v, μ) folded in as
    * LITERALS: the `label_scatter_project` shape for the UNSUPERVISED
    * axis (rank-1 whitening / JL validation input). Pure map-side
    * projection; same knife-edge argument as the scatter projection
    * (v diverges cross-engine by ~1e-16, coordinates are O(0.1)).
    */
  def embPcaProject(spark: SparkSession, dir: String): DataFrame = {
    val (c, mu) = embPcaModelOf(embs(spark, dir))
    val (_, v, _, _) = Pca.dominantOfSymmetric(c, EmbPcaSquarings)
    val score = (1 to Dim).map(i =>
      lit(v(i - 1)) * (element_at(col("embedding"), i).cast("double") - lit(mu(i - 1))))
      .reduce(_ + _)
    embs(spark, dir).select(col("vec_id"), round(score, 6).as("pc1_coord"))
      .orderBy("vec_id")
  }

  /** Long-form SQL replaying the covariance solve up to the UNROUNDED
    * signed pc1 frame — shared by both `emb_pca*` oracles. `c0` is the
    * full mirrored covariance; parenthesization of μ_i μ_j matches the
    * Scala driver's (S_i/n)·(S_j/n) exactly.
    */
  /** Deflated second axis: B = C − λ₁v₁v₁ᵀ, solved with the same
    * machinery. Measured margins (numpy, real corpus, all SFs):
    * resid ≤ 3.7e-16 at 12 squarings even at λ₃/λ₂ = 0.991,
    * diag-argmax gap ≥ 1.5e-2, sign margin ≥ 2.7e-2, |v₁·v₂| ≤ 5e-17,
    * and λ₂ agrees with a full eigensolve to 1.4e-17.
    */
  private def embPcaAxis2(e: DataFrame)
      : (Array[Double], Array[Double], Array[Double], Double, Double) = {
    val (c, mu) = embPcaModelOf(e)
    val (l1, v1, _, _) = Pca.dominantOfSymmetric(c, EmbPcaSquarings)
    val c2 = Array.tabulate(Dim, Dim)((i, j) => c(i)(j) - l1 * v1(i) * v1(j))
    val (l2, v2, _, _) = Pca.dominantOfSymmetric(c2, EmbPcaSquarings)
    (v1, v2, mu, l1, l2)
  }

  /** `emb_pca2` — the second covariance axis by deflation (the rank-2
    * completion of `emb_pca`): 64 rows (dimension, loading). Oracle
    * replays pc1 → λ₁ → B = C − λ₁v₁v₁ᵀ → the same squaring chain.
    */
  def embPca2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, v2, _, _, _) = embPcaAxis2(embs(spark, dir))
    v2.toSeq.zipWithIndex.map { case (x, i) => (i + 1, x) }
      .toDF("i", "raw")
      .select(col("i"), round(col("raw"), 6).as("loading"))
      .orderBy("i")
  }

  /** `emb_pca_map` — the 2-D corpus map: every vector's coordinates
    * along (pc1, pc2), the standard visualization / stratification
    * frame. Both axes fold in as literals — one map-side projection
    * pass, the `emb_pca_project` shape widened to two coordinates.
    */
  def embPcaMap(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2, mu, _, _) = embPcaAxis2(embs(spark, dir))
    def coord(v: Array[Double]) = (1 to Dim).map(i =>
      lit(v(i - 1)) * (element_at(col("embedding"), i).cast("double") - lit(mu(i - 1))))
      .reduce(_ + _)
    embs(spark, dir).select(col("vec_id"),
        round(coord(v1), 6).as("pc1_coord"),
        round(coord(v2), 6).as("pc2_coord"))
      .orderBy("vec_id")
  }

  /** `emb_whiten` — rank-2 PCA whitening: each vector's (pc1, pc2)
    * coordinates scaled to UNIT VARIANCE, w_k = v_k·(x−μ)/√λ_k — the
    * decorrelated, isotropic frame downstream consumers (Mahalanobis
    * gates, whitened-cosine retrieval, drift z-scores) read directly.
    * The whole model (v₁, v₂, μ, λ₁, λ₂) is model-sized driver output
    * of the one-pass covariance ([[embPcaModelOf]]) + deflation
    * ([[embPcaAxis2]]); the transform folds it in as LITERALS — one
    * map-side projection pass, `emb_pca_map` divided by the √λ the
    * oracle replays from its own lam1/lam2 CTEs. Coordinates are O(1)
    * by construction (whitening is exactly what makes them so);
    * measured whitened range ±3.5 across SFs, cross-engine divergence
    * ~1e-15 — round-6 safe.
    */
  def embWhiten(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2, mu, l1, l2) = embPcaAxis2(embs(spark, dir))
    def coord(v: Array[Double], l: Double) = (1 to Dim).map(i =>
      lit(v(i - 1)) * (element_at(col("embedding"), i).cast("double") - lit(mu(i - 1))))
      .reduce(_ + _) / lit(math.sqrt(l))
    embs(spark, dir).select(col("vec_id"),
        round(coord(v1, l1), 6).as("w1"),
        round(coord(v2, l2), 6).as("w2"))
      .orderBy("vec_id")
  }

  /** `emb_whiten_check` — the whitening CERTIFICATE: population
    * variance of each whitened coordinate and their covariance,
    * computed from the corpus itself in one aggregation pass over the
    * literal-folded transform. var(w_k) = v_kᵀCv_k/λ_k = 1 exactly up
    * to the solve residual (measured 1.000000000000 at every SF);
    * cov(w₁,w₂) = v₁ᵀCv₂/√(λ₁λ₂) ≈ λ₂(v₁·v₂) scaled — measured
    * ~1e-17 (|v₁·v₂| ≤ 5e-17 by deflation), so it rounds to zero.
    * `+ 0.0` on the covariance normalizes IEEE −0.0 to +0.0 on BOTH
    * engines (a ~±1e-17 quantity rounds to a SIGNED zero whose sign is
    * summation-order noise — the one knife-edge rounding alone cannot
    * heal). The moment formulation (Σw, Σw², Σw₁w₂ over n) is mirrored
    * verbatim in the oracle.
    */
  def embWhitenCheck(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2, mu, l1, l2) = embPcaAxis2(embs(spark, dir))
    def coord(v: Array[Double], l: Double) = (1 to Dim).map(i =>
      lit(v(i - 1)) * (element_at(col("embedding"), i).cast("double") - lit(mu(i - 1))))
      .reduce(_ + _) / lit(math.sqrt(l))
    embs(spark, dir).select(coord(v1, l1).as("w1"), coord(v2, l2).as("w2"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum("w1").as("s1"), sum(col("w1") * col("w1")).as("q1"),
        sum("w2").as("s2"), sum(col("w2") * col("w2")).as("q2"),
        sum(col("w1") * col("w2")).as("x12"))
      .select(col("n").cast("long").as("n_vecs"),
        round(col("q1") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")), 6).as("var_w1"),
        round(col("q2") / col("n") - (col("s2") / col("n")) * (col("s2") / col("n")), 6).as("var_w2"),
        (round(col("x12") / col("n") - (col("s1") / col("n")) * (col("s2") / col("n")), 6)
          + lit(0.0)).as("cov_w12"))
  }

  /** `emb_whiten_full_check` — the FULL-RANK whitening certificate
    * (closing SURVEY §9.2's rank-2 gap): all 64 eigenpairs of the
    * one-pass covariance via the driver-side cyclic Jacobi solve
    * ([[graft.operators.Pca.jacobiEigen]]), ZCA matrix
    * W = V diag(1/√λ) Vᵀ ([[graft.operators.Pca.zcaWhitenMatrix]]),
    * then the corpus is ACTUALLY whitened — y = W(x−μ) as an
    * executor-local broadcast matvec per row, the honest 100 TB shape
    * (the model is 64×64 doubles; the transform is one map pass) —
    * and the whitened covariance re-measured with the SAME one-pass
    * Gram machinery. Released: n_vecs plus max |offdiag| and
    * max |diag − 1| of cov(y) rounded to 6 (measured ~1e-13 — double
    * round-trip of solve + two Gram passes — so both round to exactly
    * 0.0) and the composite ok flag. Oracle-checkable because a
    * CORRECT full-rank whitening has constant output; a wrong W, a
    * diverged Jacobi, or a broken transform moves the deviations
    * above 5e-7 and the hash fails. The eigensolve itself is
    * pinned against planted-spectrum matrices in PcaSpec (the oracle
    * replay of 64 Jacobi sweeps would be ~10⁵ CTEs — the SURVEY §9.2
    * cost note; the certificate IS the oracle-visible contract).
    */
  def embWhitenFullCheck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (c, mu) = embPcaModelOf(embs(spark, dir))
    val (ev, vecs, offFro) = Pca.jacobiEigen(c, sweeps = 12)
    val w = Pca.zcaWhitenMatrix(ev, vecs, floor = 1e-12)
    val d = Dim
    val bw = spark.sparkContext.broadcast((w, mu))
    val whitened = embs(spark, dir)
      .select(col("embedding").cast("array<double>"))
      .as[Array[Double]]
      .mapPartitions { it =>
        val (wm, m) = bw.value
        it.map { x =>
          Array.tabulate(d) { i =>
            var s = 0.0; var j = 0
            while (j < d) { s += wm(i)(j) * (x(j) - m(j)); j += 1 }
            s
          }
        }
      }.toDF("embedding")
    val (cy, _) = embPcaModelOf(whitened)
    val maxOff = (for (i <- 0 until d; j <- 0 until d if i != j)
      yield math.abs(cy(i)(j))).max
    val maxDiag = (0 until d).map(i => math.abs(cy(i)(i) - 1.0)).max
    val ok = offFro <= 1e-9 && maxOff <= 1e-7 && maxDiag <= 1e-7
    val n = embs(spark, dir).count()
    Seq((n, maxOff, maxDiag, if (ok) 1L else 0L))
      .toDF("n_vecs", "mo", "md", "whiten_ok")
      .select(col("n_vecs"),
        (round(col("mo"), 6) + lit(0.0)).as("max_abs_offdiag"),
        (round(col("md"), 6) + lit(0.0)).as("max_diag_dev"),
        col("whiten_ok"))
  }

  val embWhitenFullCheckSql: String = """
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
      CAST(0.0 AS DOUBLE) AS max_abs_offdiag,
      CAST(0.0 AS DOUBLE) AS max_diag_dev,
      CAST(1 AS BIGINT) AS whiten_ok
    FROM embeddings"""

  /** `emb_outliers` — the consumer the whitened frame exists for: a
    * rank-2 Mahalanobis gate, m² = w₁² + w₂² (unit-variance
    * decorrelated coordinates make the χ² threshold meaningful —
    * against RAW pc coordinates the same cut would just re-measure
    * λ₁). Top-20 by (m², vec_id) plus the χ²₂ 99% flag
    * (m² > 9.21 ⇔ p < 0.01 under the Gaussian bulk) — the embedding
    * outlier pass a pipeline runs before the corpus trains a
    * codebook/probe on junk vectors. Map-side literal-folded
    * transform, TakeOrderedAndProject top-k.
    */
  def embOutliers(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2, mu, l1, l2) = embPcaAxis2(embs(spark, dir))
    def coord(v: Array[Double], l: Double) = (1 to Dim).map(i =>
      lit(v(i - 1)) * (element_at(col("embedding"), i).cast("double") - lit(mu(i - 1))))
      .reduce(_ + _) / lit(math.sqrt(l))
    val m2 = coord(v1, l1) * coord(v1, l1) + coord(v2, l2) * coord(v2, l2)
    embs(spark, dir).select(col("vec_id"), m2.as("m2raw"))
      .orderBy(col("m2raw").desc, col("vec_id")).limit(20)
      .select(col("vec_id"), round(col("m2raw"), 6).as("m2"),
        (col("m2raw") > 9.21).cast("long").as("beyond_chi2_99"))
      .orderBy(col("m2").desc, col("vec_id"))
  }

  val embOutliersSql: String = materializeCtes {
    s"""
    WITH $embWhitenCtes,
    m AS (SELECT vec_id, w1 * w1 + w2 * w2 AS m2raw FROM wc)
    SELECT vec_id, round(m2raw, 6) AS m2,
      CAST(m2raw > 9.21 AS BIGINT) AS beyond_chi2_99
    FROM (SELECT * FROM m ORDER BY m2raw DESC, vec_id LIMIT 20)
    ORDER BY m2 DESC, vec_id"""
  }

  /** The frozen whitening model for the streaming gate
    * ([[graft.streaming.StreamingOutlierGate]]) — batch-trained here,
    * folded as literals there.
    */
  private[graft] def whitenModel(spark: SparkSession, dir: String)
      : graft.streaming.StreamingOutlierGate.WhitenModel = {
    val (v1, v2, mu, l1, l2) = embPcaAxis2(embs(spark, dir))
    graft.streaming.StreamingOutlierGate.WhitenModel(v1, v2, mu, l1, l2)
  }

  // ------------------------------------ JL projection + distortion audit

  /** JL target dimension: 64 → 16 (4× storage/bandwidth cut for
    * distance-based work — the lever that matters when the embedding
    * column IS the 100 TB).
    */
  private val JlK = 16
  /** 1-in-4 deterministic hash sample for the distortion audit. */
  private val JlSampleMod = 4
  /** Pairing buckets — the window partition key, so the audit's only
    * window is B-way parallel, never single-partition.
    */
  private val JlBuckets = 8

  /** The seeded ±1/√k Achlioptas sign matrix, derived from md5 parity
    * of the PUBLIC name `jl_<i>_<j>` (1-indexed) so the oracle rebuilds
    * the identical matrix with SQL `md5()`: +1 iff the first hex digit
    * is even. Entries are ±0.25 exactly (√16 = 4), so both engines
    * fold identical literals.
    */
  private lazy val jlSigns: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(Dim, JlK) { (i0, j0) =>
      val hex = md.digest(s"jl_${i0 + 1}_${j0 + 1}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val sgn = if (Character.digit(hex.charAt(0), 16) % 2 == 0) 1.0 else -1.0
      sgn / math.sqrt(JlK.toDouble)
    }
  }

  /** y_j = Σ_i R_ij·x_i for one vector — the 64-term literal fold. */
  private def jlCoord(j: Int): org.apache.spark.sql.Column =
    (1 to Dim).map(i =>
      lit(jlSigns(i - 1)(j - 1)) * element_at(col("embedding"), i).cast("double"))
      .reduce(_ + _)

  /** `emb_jl_project` — the Johnson–Lindenstrauss sketch column:
    * every vector's 16-dim seeded random projection, y = Rᵀx with R
    * the ±1/√k sign matrix ([[jlSigns]]) folded in as LITERALS. Pure
    * map-side, one corpus pass, no state — the transform a 100 TB
    * pipeline runs once to cut every downstream distance computation
    * 4×; `emb_jl_check` is the distortion certificate that licenses
    * it. Wide output (y1..y16 columns), one row per vector.
    */
  def embJlProject(spark: SparkSession, dir: String): DataFrame = {
    val ys = (1 to JlK).map(j => round(jlCoord(j), 6).as(s"y$j"))
    embs(spark, dir).select(col("vec_id") +: ys: _*).orderBy("vec_id")
  }

  /** `emb_jl_check` — the JL distance-distortion CERTIFICATE: on a
    * deterministic 1-in-[[JlSampleMod]] hash sample, pair each sampled
    * vector with the NEXT one in (bucket, md5, id) order — a window
    * `lead`, so the audit is O(sample) pairs and LINEAR (never a
    * quadratic pair join; each vector contributes ≤ 1 pair) — and
    * measure r = ‖Δy‖²/‖Δx‖² per pair. Emits n_pairs, mean/min/max r,
    * and the fraction inside [0.5, 1.5] (ε = ½ band). Measured:
    * inband 84–90% at k = 16 across SFs (k = 8ε⁻²ln n would be the
    * guarantee regime — the certificate REPORTS the achieved band
    * rather than assuming the bound), and the nearest ratio sits
    * ≥ 2.5e-4 from a band edge vs ~1e-15 cross-engine divergence, so
    * the count cannot flip. dx² = 0 pairs (exact duplicate vectors)
    * are excluded on both engines.
    */
  def embJlCheck(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hx = md5(col("vec_id").cast("string"))
    val sel = embs(spark, dir)
      .filter(conv(substring(hx, 1, 8), 16, 10).cast("long") % JlSampleMod === 0)
      .select(col("vec_id"), col("embedding"), hx.as("hx"))
      .withColumn("bkt", conv(substring(col("hx"), 9, 8), 16, 10).cast("long") % JlBuckets)
      .withColumn("yarr", array((1 to JlK).map(jlCoord): _*))
    val w = Window.partitionBy("bkt").orderBy("hx", "vec_id")
    val paired = sel
      .withColumn("nx_emb", lead("embedding", 1).over(w))
      .withColumn("nx_y", lead("yarr", 1).over(w))
      .filter(col("nx_emb").isNotNull)
    val dx2 = (1 to Dim).map(i =>
      (element_at(col("embedding"), i).cast("double") - element_at(col("nx_emb"), i).cast("double")) *
      (element_at(col("embedding"), i).cast("double") - element_at(col("nx_emb"), i).cast("double")))
      .reduce(_ + _)
    val dy2 = (1 to JlK).map(j =>
      (element_at(col("yarr"), j) - element_at(col("nx_y"), j)) *
      (element_at(col("yarr"), j) - element_at(col("nx_y"), j)))
      .reduce(_ + _)
    paired.select(dx2.as("dx2"), dy2.as("dy2"))
      .filter(col("dx2") > 0)
      .select((col("dy2") / col("dx2")).as("ratio"))
      .agg(count(lit(1)).as("c"), sum("ratio").as("s"),
        min("ratio").as("mn"), max("ratio").as("mx"),
        sum(when(col("ratio") >= 0.5 && col("ratio") <= 1.5, 1.0).otherwise(0.0)).as("ib"))
      .select(col("c").cast("long").as("n_pairs"),
        round(col("s") / col("c"), 6).as("mean_ratio"),
        round(col("mn"), 6).as("min_ratio"),
        round(col("mx"), 6).as("max_ratio"),
        round(col("ib") / col("c"), 6).as("inband_frac"))
  }

  /** The shared rmat/el/yj replay: the md5-parity sign matrix, the
    * exploded (vec_id, i, x) frame over `$src`, and the projected
    * (vec_id, j, y) frame.
    */
  private def jlCtes(src: String): String = s"""rmat AS (
      SELECT i.i, j.j,
        (CASE WHEN CAST(concat('0x', substr(md5(concat('jl_', i.i, '_', j.j)), 1, 1)) AS BIGINT) % 2 = 0
          THEN 1.0 ELSE -1.0 END) / sqrt(${JlK}.0) AS r
      FROM range(1, ${Dim + 1}) i(i), range(1, ${JlK + 1}) j(j)),
    el AS (
      SELECT vec_id, t.i, cast(embedding[t.i] AS DOUBLE) AS x
      FROM $src, range(1, ${Dim + 1}) t(i)),
    yj AS (
      SELECT e.vec_id, r.j, sum(r.r * e.x) AS y
      FROM el e JOIN rmat r ON r.i = e.i GROUP BY 1, 2)"""

  val embJlProjectSql: String = materializeCtes {
    val cols = (1 to JlK).map(j =>
      s"round(max(CASE WHEN j = $j THEN y END), 6) AS y$j").mkString(",\n      ")
    s"""
    WITH ${jlCtes("embeddings")}
    SELECT vec_id,
      $cols
    FROM yj GROUP BY vec_id ORDER BY vec_id"""
  }

  val embJlCheckSql: String = materializeCtes {
    s"""
    WITH b AS (
      SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS hx,
        CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 9, 8)) AS BIGINT) % $JlBuckets AS bkt
      FROM embeddings
      WHERE CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % $JlSampleMod = 0),
    ${jlCtes("b")},
    pr AS (
      SELECT vec_id, lead(vec_id) OVER (PARTITION BY bkt ORDER BY hx, vec_id) AS nxt
      FROM b),
    p2 AS (SELECT vec_id, nxt FROM pr WHERE nxt IS NOT NULL),
    dx AS (
      SELECT p.vec_id, p.nxt, sum((a.x - c.x) * (a.x - c.x)) AS dx2
      FROM p2 p JOIN el a ON a.vec_id = p.vec_id
        JOIN el c ON c.vec_id = p.nxt AND c.i = a.i
      GROUP BY 1, 2),
    dy AS (
      SELECT p.vec_id, p.nxt, sum((a.y - c.y) * (a.y - c.y)) AS dy2
      FROM p2 p JOIN yj a ON a.vec_id = p.vec_id
        JOIN yj c ON c.vec_id = p.nxt AND c.j = a.j
      GROUP BY 1, 2),
    rt AS (
      SELECT dy.dy2 / dx.dx2 AS ratio
      FROM dx JOIN dy ON dx.vec_id = dy.vec_id AND dx.nxt = dy.nxt
      WHERE dx.dx2 > 0)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      round(sum(ratio) / count(*), 6) AS mean_ratio,
      round(min(ratio), 6) AS min_ratio,
      round(max(ratio), 6) AS max_ratio,
      round(sum(CASE WHEN ratio >= 0.5 AND ratio <= 1.5 THEN 1.0 ELSE 0.0 END) / count(*), 6) AS inband_frac
    FROM rt"""
  }

  /** `pfx`-named Frobenius-normalized squaring chain from `${pfx}0` to
    * `$pfx$EmbPcaSquarings` — shared by the pc1 and the deflated-pc2
    * replays.
    */
  private def pcaSquaringChainSql(pfx: String): String =
    (1 to EmbPcaSquarings).flatMap(k => Seq(
      s"""$pfx${k}r AS (
      SELECT a.l, b.r, sum(a.g * b.g) AS g
      FROM $pfx${k - 1} a JOIN $pfx${k - 1} b ON a.r = b.l GROUP BY a.l, b.r)""",
      s"""$pfx$k AS (
      SELECT l, r, g / (SELECT sqrt(sum(g * g)) FROM $pfx${k}r) AS g FROM $pfx${k}r)"""))
      .mkString(",\n    ")

  /** Max-diagonal column pick + normalize + svd_flip sign over the
    * converged matrix `$pfx$EmbPcaSquarings`, ending in CTE `$outCte`
    * (i, loading) — the shared tail of both axis replays. CTE names
    * are prefix-suffixed so the two chains coexist in one WITH.
    */
  private def pcaPickSignSql(pfx: String, outCte: String): String = s"""dg_$pfx AS (
      SELECT l FROM $pfx$EmbPcaSquarings WHERE l = r
      ORDER BY g DESC, l ASC LIMIT 1),
    u0_$pfx AS (
      SELECT a.l AS i, a.g AS u
      FROM $pfx$EmbPcaSquarings a JOIN dg_$pfx ON a.r = dg_$pfx.l),
    vn_$pfx AS (SELECT i, u / (SELECT sqrt(sum(u * u)) FROM u0_$pfx) AS v FROM u0_$pfx),
    sgn_$pfx AS (
      SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
      FROM vn_$pfx ORDER BY abs(v) DESC, i ASC LIMIT 1),
    $outCte AS (SELECT i, v * s AS loading FROM vn_$pfx, sgn_$pfx)"""

  private def embPcaCtes: String = {
    s"""el AS (
      SELECT vec_id, t.i, cast(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, ${Dim + 1}) t(i)),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
    ms AS (SELECT i, sum(x) AS s FROM el GROUP BY i),
    up AS (
      SELECT a.i AS l, b.i AS r, sum(a.x * b.x) AS sp
      FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2),
    a0 AS (
      SELECT u.l, u.r, u.sp / nn.n - (ma.s / nn.n) * (mb.s / nn.n) AS g
      FROM up u JOIN ms ma ON ma.i = u.l JOIN ms mb ON mb.i = u.r, nn
      UNION ALL
      SELECT u.r, u.l, u.sp / nn.n - (ma.s / nn.n) * (mb.s / nn.n) AS g
      FROM up u JOIN ms ma ON ma.i = u.l JOIN ms mb ON mb.i = u.r, nn
      WHERE u.l < u.r),
    ${pcaSquaringChainSql("a")},
    ${pcaPickSignSql("a", "pc1")}"""
  }

  /** [[embPcaCtes]] + the deflation replay: λ₁ from pc1, then the SAME
    * squaring/pick/sign machinery over B = C − λ₁v₁v₁ᵀ, ending in
    * `pc2`. Exactly mirrors the Scala driver's deflation
    * ([[embPca2]]).
    */
  private def embPca2Ctes: String = s"""$embPcaCtes,
    av1 AS (
      SELECT a.l AS i, sum(a.g * p.loading) AS av
      FROM a0 a JOIN pc1 p ON p.i = a.r GROUP BY a.l),
    lam1 AS (
      SELECT sum(av1.av * p.loading) AS lambda
      FROM av1 JOIN pc1 p USING (i)),
    b0 AS (
      SELECT a.l, a.r, a.g - l.lambda * pa.loading * pb.loading AS g
      FROM a0 a JOIN pc1 pa ON pa.i = a.l JOIN pc1 pb ON pb.i = a.r, lam1 l),
    ${pcaSquaringChainSql("b")},
    ${pcaPickSignSql("b", "pc2")}"""

  val embPcaSql: String = materializeCtes {
    s"""
    WITH $embPcaCtes
    SELECT i, round(loading, 6) AS loading FROM pc1 ORDER BY i"""
  }

  val embPcaProjectSql: String = materializeCtes {
    s"""
    WITH $embPcaCtes
    SELECT e.vec_id,
      round(sum(p.loading * (cast(e.embedding[p.i] AS DOUBLE) - ms.s / nn.n)), 6) AS pc1_coord
    FROM embeddings e, pc1 p JOIN ms ON ms.i = p.i, nn
    GROUP BY e.vec_id
    ORDER BY e.vec_id"""
  }

  val embPca2Sql: String = materializeCtes {
    s"""
    WITH $embPca2Ctes
    SELECT i, round(loading, 6) AS loading FROM pc2 ORDER BY i"""
  }

  val embPcaMapSql: String = materializeCtes {
    s"""
    WITH $embPca2Ctes
    SELECT e.vec_id,
      round(sum(p1.loading * (cast(e.embedding[p1.i] AS DOUBLE) - ms.s / nn.n)), 6) AS pc1_coord,
      round(sum(p2.loading * (cast(e.embedding[p1.i] AS DOUBLE) - ms.s / nn.n)), 6) AS pc2_coord
    FROM embeddings e, pc1 p1 JOIN pc2 p2 ON p2.i = p1.i JOIN ms ON ms.i = p1.i, nn
    GROUP BY e.vec_id
    ORDER BY e.vec_id"""
  }

  /** [[embPca2Ctes]] + λ₂ (the same Rayleigh-quotient replay as lam1,
    * over the DEFLATED matrix b0 and pc2) + the per-vector whitened
    * coordinates — shared by the `emb_whiten*` oracles.
    */
  private def embWhitenCtes: String = s"""$embPca2Ctes,
    av2 AS (
      SELECT a.l AS i, sum(a.g * p.loading) AS av
      FROM b0 a JOIN pc2 p ON p.i = a.r GROUP BY a.l),
    lam2 AS (
      SELECT sum(av2.av * p.loading) AS lambda
      FROM av2 JOIN pc2 p USING (i)),
    wc AS (
      SELECT e.vec_id,
        sum(p1.loading * (cast(e.embedding[p1.i] AS DOUBLE) - ms.s / nn.n))
          / (SELECT sqrt(lambda) FROM lam1) AS w1,
        sum(p2.loading * (cast(e.embedding[p1.i] AS DOUBLE) - ms.s / nn.n))
          / (SELECT sqrt(lambda) FROM lam2) AS w2
      FROM embeddings e, pc1 p1 JOIN pc2 p2 ON p2.i = p1.i JOIN ms ON ms.i = p1.i, nn
      GROUP BY e.vec_id)"""

  val embWhitenSql: String = materializeCtes {
    s"""
    WITH $embWhitenCtes
    SELECT vec_id, round(w1, 6) AS w1, round(w2, 6) AS w2
    FROM wc ORDER BY vec_id"""
  }

  val embWhitenCheckSql: String = materializeCtes {
    s"""
    WITH $embWhitenCtes,
    ag AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
        sum(w1) AS s1, sum(w1 * w1) AS q1,
        sum(w2) AS s2, sum(w2 * w2) AS q2,
        sum(w1 * w2) AS x12
      FROM wc)
    SELECT CAST(n AS BIGINT) AS n_vecs,
      round(q1 / n - (s1 / n) * (s1 / n), 6) AS var_w1,
      round(q2 / n - (s2 / n) * (s2 / n), 6) AS var_w2,
      round(x12 / n - (s1 / n) * (s2 / n), 6) + 0.0 AS cov_w12
    FROM ag"""
  }

  val embPcaPowerSql: String = materializeCtes {
    s"""
    WITH $embPcaCtes,
    av AS (
      SELECT a.l AS i, sum(a.g * p.loading) AS av
      FROM a0 a JOIN pc1 p ON p.i = a.r GROUP BY a.l),
    lam AS (
      SELECT sum(av.av * p.loading) AS lambda
      FROM av JOIN pc1 p USING (i)),
    tr AS (SELECT sum(g) AS trace FROM a0 WHERE l = r)
    SELECT round(l.lambda, 6) AS lambda,
      round(l.lambda / t.trace, 6) AS var_share,
      round(sqrt((SELECT sum((av.av - l2.lambda * p.loading) * (av.av - l2.lambda * p.loading))
                  FROM av JOIN pc1 p USING (i), lam l2)) / l.lambda, 6) AS resid
    FROM lam l, tr t"""
  }

  // ------------------------------------------ k-center coreset

  private val CoresetK = 8

  /** `coreset_kcenter` — greedy diversity selection
    * ([[graft.operators.Coreset]]): the k vectors that SPREAD over the
    * corpus, with the selection-time distance as the coverage-radius
    * trajectory. k−1 single-struct argmax aggregations; oracle replays
    * the greedy run as a CTE chain (argmax = ORDER BY d DESC, vec_id
    * LIMIT 1 — measured selection margins ≥ 1.3e-3 at every SF, so
    * engines cannot disagree on a pick).
    */
  def coresetKcenter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cs = graft.operators.Coreset.kCenter(embs(spark, dir), "vec_id", "embedding", CoresetK, Dim)
    cs.map(c => (c.rank, c.id, c.dist)).toDF("rk", "vec_id", "d")
      .select(col("rk"), col("vec_id"), round(col("d"), 6).as("dist"))
      .orderBy("rk")
  }

  /** `coreset_cover` — the coverage report: every vector assigned to
    * its nearest chosen center (distance ties → lowest rank), per
    * center (members, radius). One corpus aggregation with the centers
    * folded in as literals; max radius is the k-center objective the
    * greedy selection 2-approximates.
    */
  def coresetCover(spark: SparkSession, dir: String): DataFrame = {
    val cs = graft.operators.Coreset.kCenter(embs(spark, dir), "vec_id", "embedding", CoresetK, Dim)
    graft.operators.Coreset.cover(embs(spark, dir), "embedding", cs, Dim)
  }

  /** Greedy-selection CTE chain shared by both coreset oracles: ends
    * with center frames c1..c{k}. Distance uses the dot-product
    * identity with a greatest(0,·) guard (fp can push the true-zero
    * case a hair negative); the Scala side's Σdiff² differs only at
    * ~1e-13, ten orders inside the measured selection margins.
    */
  private def coresetCtes: String = {
    def dist(a: String, b: String) =
      s"sqrt(greatest(0.0, list_inner_product($a, $a) + list_inner_product($b, $b)" +
        s" - 2 * list_inner_product($a, $b)))"
    val steps = (2 to CoresetK).flatMap { r =>
      val prev = if (r == 2) s"SELECT e.vec_id, e.v, ${dist("e.v", "c1.v")} AS d FROM e, c1"
        else s"SELECT m.vec_id, m.v, least(m.d, ${dist("m.v", "c.v")}) AS d FROM m${r - 2} m, c${r - 1} c"
      Seq(
        s"""m${r - 1} AS ($prev)""",
        s"""c$r AS (SELECT vec_id, v, d FROM m${r - 1} ORDER BY d DESC, vec_id LIMIT 1)""")
    }
    s"""e AS (SELECT vec_id, cast(embedding AS DOUBLE[]) AS v FROM embeddings),
    c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
    ${steps.mkString(",\n    ")}"""
  }

  val coresetKcenterSql: String = materializeCtes {
    val sel = s"SELECT 1 AS rk, vec_id, 0.0 AS dist FROM c1" +:
      (2 to CoresetK).map(r => s"SELECT $r AS rk, vec_id, round(d, 6) AS dist FROM c$r")
    s"""
    WITH $coresetCtes
    ${sel.mkString("\n    UNION ALL ")}
    ORDER BY rk"""
  }

  val coresetCoverSql: String = materializeCtes {
    def dist(a: String, b: String) =
      s"sqrt(greatest(0.0, list_inner_product($a, $a) + list_inner_product($b, $b)" +
        s" - 2 * list_inner_product($a, $b)))"
    val cents = s"SELECT 1 AS rk, vec_id AS cid, v FROM c1" +:
      (2 to CoresetK).map(r => s"SELECT $r AS rk, vec_id AS cid, v FROM c$r")
    s"""
    WITH $coresetCtes,
    cents AS (
      ${cents.mkString("\n      UNION ALL ")}),
    ad AS (
      SELECT e.vec_id,
        min(struct_pack(dist := ${dist("e.v", "c.v")}, rk := c.rk, cid := c.cid)) AS nr
      FROM e, cents c GROUP BY e.vec_id)
    SELECT cast(nr.rk AS INT) AS rk, nr.cid AS center_id,
      cast(count(*) AS BIGINT) AS members, round(max(nr.dist), 6) AS radius
    FROM ad GROUP BY 1, 2
    ORDER BY rk"""
  }

  /** The corpus ids spread over the session's cores BEFORE the heavy
    * per-row synth+decode mapPartitions: the sf parquet files are one
    * row group each, so the scan is ONE partition and everything narrow
    * above it — including the whole media decode — ran on a single
    * core. The exchange moves ids only (the payload is synthesized
    * after), so at cluster scale it stays a trivial linear shuffle;
    * round-robin is deterministic (sort-before-repartition is on).
    * Delegates to [[graft.operators.Relational.spreadToCores]] for the
    * ≥cores identity guard: at cluster scale, where the id scan already
    * yields more partitions than defaultParallelism, the repartition
    * would otherwise SHRINK parallelism and always pay a shuffle.
    */
  private def spreadIds(spark: SparkSession, d: DataFrame): DataFrame =
    graft.operators.Relational.spreadToCores(d)

  /** Synthesized audio corpus for the near-dup surface: every doc gets
    * a deterministic WAV clip ([[graft.operators.Multimodal.synthToneWav]]
    * — the corpus parquet carries no real audio; the RIFF/PCM decode
    * path the fingerprints run through is real). PLANTED near-dups:
    * docs with doc_id % 7 = 3 reuse doc (d−3)'s melody pitch-shifted
    * ×1.02 — (d−3) % 7 = 0, so seed groups never chain.
    *
    * Round 15 widens the planted transformations beyond the clean
    * shift (the "constants are synth-tuned" caveat at
    * `Multimodal.audioSignature` — vibrato and polyphony were the
    * named untested realisms), split by residue mod 21 (dup docs are
    * 3/10/17; their seeds are 0/7/14):
    *   - d % 21 = 3  → plain ×1.02 (the original class);
    *   - d % 21 = 10 → ×1.02 + 6 Hz vibrato, depth 0.02, on the DUP
    *     side only (a re-performance with vibrato);
    *   - d % 21 = 17 → ×1.02 of a POLYPHONIC melody — both sides carry
    *     a major third (every doc with id % 21 = 14 is chorded), the
    *     same-arrangement-shifted-performance class.
    * Measured per class over 200 pairs (VibratoChordSpec): the contour
    * CANDIDATE key is untouched (0 band misses under vibrato; 97 % of
    * cells identical, drift ≤ 1 half-semitone cell — the cell width
    * HOLDS, no re-parametrization needed); losses are Hamming-verify
    * only (vibrato's spectral smear flips share bits: single-sided
    * vibrato 77 %, both-sided chord 93 %, plain 92 %). Corpus recall
    * floors stay ≥ 70 (`audio_neardup_recall`).
    */
  private def audioPayloads(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spreadIds(spark, docs(spark, dir).select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { id =>
        val dup = id % 7 == 3 && id >= 3
        val seed = if (dup) id - 3 else id
        val pitch = if (dup) 1.02 else 1.0
        val vib = if (dup && id % 21 == 10) 0.02 else 0.0
        val chord = seed % 21 == 14 // both sides of a 17-class pair chorded
        // noisy re-recording class (dup side only, amp 0.05 ≈ 21 dB
        // SNR): measured 91 % admits vs 92 % plain — the FFT peaks the
        // signature reads sit far above a white-noise floor
        val noise = if (dup && id % 28 == 24) 0.05 else 0.0
        // inharmonic-percussive DISTRACTORS (id ≡ 5 mod 28 is never a
        // dup nor a pair seed): timbre diversity the precision floor
        // must absorb — rich clips must false-match NOTHING (the
        // measured cross-timbre admit is 0/100, RichTimbre cases in
        // VibratoChordSpec)
        // COVER renditions (id ≡ 19 mod 28, also never dup nor seed):
        // the same melody as doc id−6 played ×1.05 on the rich
        // inharmonic timbre — invisible to the near-dup verify (share
        // bits differ), the planted truth for `audio_cover`
        val cover = id % 28 == 19 && id >= 6
        val seed2 = if (cover) id - 6 else seed
        val pitch2 = if (cover) 1.05 else pitch
        val chord2 = !cover && chord
        val rich = id % 28 == 5 || cover
        val wav = Multimodal.synthToneWav(seed2, pitch2, vib, chord2, rich, noise)
        // lossy-codec distribution class (round 16, dup side only,
        // id ≡ 31 mod 35 — ≡ 3 mod 7, so always a dup): the shifted
        // re-performance circulated as a G.711 μ-law companded file.
        // Measured ≤ 1 share-bit cost and admit-at-plain-rate
        // (VibratoChordSpec); may stack with the vibrato/noise classes
        // at CRT overlaps — realistic compounding the floors absorb.
        val mulaw = dup && id % 35 == 31
        (id, "audio", if (mulaw) Multimodal.toMulawWav(wav) else wav)
      })
      .toDF("doc_id", "kind", "payload")
  }

  /** `audio_neardup` — the audio sibling of the image aHash/pHash
    * near-dup joins: per-row signatures
    * ([[graft.operators.Multimodal.audioSignature]], executor-local
    * FFT DSP) into the pitch-invariant MELODY-CONTOUR candidate join
    * (round-14 scale fix — the previous hash-slice banding measured a
    * QUADRATIC candidate curve on this coarse synthetic melody space:
    * 70M candidate pairs at 50k clips, the 15.9×/decade row in
    * SCALING.md; contour candidates are dup-structure-sized), exact
    * h ≤ 3 share-fingerprint verify. Rows-only by design (engine-local
    * DSP DuckDB cannot replay); `audio_neardup_recall` is the
    * oracle-checked companion auditing it against the planted truth.
    */
  def audioNearDup(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioNearDups(audioPayloads(spark, dir), maxHamming = 3)

  /** Floor 70: measured planted-pair recall through the contour
    * candidates + h ≤ 3 verify and the full WAV round-trip:
    * 91.5 / 91.5 / 89.8 % at sf0.001/0.01/0.1 — identical to the
    * pre-fix slice-banded recall at every SF (the log-parabolic
    * contour's band hit is ~100 %, so the Hamming verify is the
    * binding constraint at both candidate schemes), and the sf0.1
    * coincidental tail (145 same-fingerprint accidents) is GONE:
    * found = planted ∩ accept exactly. `n_true` (the planted-pair
    * count) is the exact oracle-checked quantity; curves in
    * SCALING.md's round-14 audio section.
    */
  def audioNearDupRecall(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"))
    val truth = d.select(col("doc_id").as("b_id")).filter(col("b_id") % 7 === 3)
      .join(d.select(col("doc_id").as("a_id")), col("a_id") === col("b_id") - 3)
      .select("a_id", "b_id")
    recallRow(truth, audioNearDup(spark, dir).select("a_id", "b_id"), minPct = 70)
  }

  val audioNearDupRecallSql: String = """
    SELECT cast(count(*) AS BIGINT) AS n_true, cast(1 AS BIGINT) AS recall_ok
    FROM documents a JOIN documents b ON a.doc_id = b.doc_id - 3
    WHERE b.doc_id % 7 = 3"""

  /** `audio_cover` — melody-level (cover) matching
    * ([[graft.operators.Multimodal.audioCoverMatches]]): the contour
    * bands candidate, the CONTOUR itself verifies (every interval cell
    * within ±1), so "same melody, different instrument" pairs — which
    * the near-dup share-bit verify measured at 0 % admits, correctly —
    * are accepted here. The planted truth is the id ≡ 19 (mod 28)
    * class: a ×1.05 rich-timbre rendition of doc id−6's melody.
    * Rows-only by design (engine-local FFT DSP); `audio_cover_recall`
    * is the oracle-checked companion.
    */
  def audioCover(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioCoverMatches(audioPayloads(spark, dir))

  /** Floor 70: the contour survives the cross-timbre ×1.05 rendition
    * (0 band misses, drift ≤ 1 measured on the rich class), so cover
    * pairs are recovered through the same banded candidates the
    * near-dup join uses — no new join shape, only a different verify.
    */
  def audioCoverRecall(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"))
    val truth = d.select(col("doc_id").as("b_id"))
      .filter(col("b_id") % 28 === 19 && col("b_id") >= 6)
      .join(d.select(col("doc_id").as("a_id")), col("a_id") === col("b_id") - 6)
      .select("a_id", "b_id")
    recallRow(truth, audioCover(spark, dir).select("a_id", "b_id"), minPct = 70)
  }

  val audioCoverRecallSql: String = """
    SELECT cast(count(*) AS BIGINT) AS n_true, cast(1 AS BIGINT) AS recall_ok
    FROM documents a JOIN documents b ON a.doc_id = b.doc_id - 6
    WHERE b.doc_id % 28 = 19"""

  /** `audio_neardup_groups` — the GROUP contract for the audio family
    * ([[graft.operators.Multimodal.audioNearDupGroups]]): identical
    * signatures collapse to one family row before the candidate join,
    * so the output is sized by DISTINCT signatures (one row per
    * family or near-edge, never per member pair — the `dup_clusters`
    * shape). Same accept set as the pair shape (family reps carry the
    * members' exact signatures through the same contour bands +
    * Hamming verify). Rows-only by design (engine-local FFT DSP);
    * `audio_neardup_groups_recall` is the oracle-checked companion.
    */
  def audioNearDupGroups(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioNearDupGroups(audioPayloads(spark, dir), maxHamming = 3)

  /** Floor 70 (the pair-shape floor — group coverage of a planted pair
    * is EXACTLY pair-shape discovery: same fingerprint → same family,
    * different fingerprints → the family-rep near edge fires iff the
    * member pair would): a planted pair counts as recovered when its
    * docs share a family or their families are joined by a near edge.
    */
  def audioNearDupGroupsRecall(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"))
    val truth = d.select(col("doc_id").as("b_id")).filter(col("b_id") % 7 === 3)
      .join(d.select(col("doc_id").as("a_id")), col("a_id") === col("b_id") - 3)
      .select("a_id", "b_id")
    // ONE decode pass: the Materialized signature frame feeds both the
    // group operator and the doc→family mapping (decode dominates this
    // family's cost; measured 4.8 s → ~2.5 s at bench SF)
    val fp = Materialize(Multimodal.audioSignatureFrame(audioPayloads(spark, dir)))
    val rep = fp.join(fp.groupBy("h64", "c").agg(min("doc_id").as("rep_id")),
        Seq("h64", "c"))
      .select(col("doc_id"), col("rep_id"))
    val t2 = truth
      .join(rep.select(col("doc_id").as("a_id"), col("rep_id").as("ra")), "a_id")
      .join(rep.select(col("doc_id").as("b_id"), col("rep_id").as("rb")), "b_id")
    // Near edges are the a_id =!= b_id rows (exact-family rows are the
    // only a_id == b_id rows). Do NOT filter on hamming > 0: a cross-
    // family near edge can carry hamming = 0 — same 64-bit share
    // fingerprint h64, different contour c, exactly what a planted
    // pitch shift that drifts one contour cell produces — and dropping
    // those would undercount genuine recoveries.
    val edges = Multimodal.audioNearDupGroupsFromSignatures(fp, maxHamming = 3)
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id").as("ea"), col("b_id").as("eb"))
    val same = t2.filter(col("ra") === col("rb")).select("a_id", "b_id")
    val nearHit = t2.filter(col("ra") =!= col("rb"))
      .join(edges,
        least(col("ra"), col("rb")) === col("ea") &&
          greatest(col("ra"), col("rb")) === col("eb"),
        "left_semi")
      .select("a_id", "b_id")
    recallRow(truth, same.unionByName(nearHit), minPct = 70)
  }

  val audioNearDupGroupsRecallSql: String = """
    SELECT cast(count(*) AS BIGINT) AS n_true, cast(1 AS BIGINT) AS recall_ok
    FROM documents a JOIN documents b ON a.doc_id = b.doc_id - 3
    WHERE b.doc_id % 7 = 3"""

  /** `audio_neardup_precision` — the other half of the contour
    * operator's audit (round 14): every found pair must be a PLANTED
    * pair. Floor 90; measured 100 % at all three SFs — the former
    * slice banding admitted a 145-pair coincidental tail at sf0.1
    * (same-fingerprint accidents of the coarse melody space), and the
    * contour gate eliminates it exactly because random melodies'
    * pitch-interval sequences don't collide. Oracle-checked via the
    * planted-count + flag shape the recall companions use.
    */
  def audioNearDupPrecision(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"))
    val truth = d.select(col("doc_id").as("b_id")).filter(col("b_id") % 7 === 3)
      .join(d.select(col("doc_id").as("a_id")), col("a_id") === col("b_id") - 3)
      .select("a_id", "b_id")
    precisionRow(truth, audioNearDup(spark, dir).select("a_id", "b_id"), minPct = 90)
  }

  val audioNearDupPrecisionSql: String = """
    SELECT cast(count(*) AS BIGINT) AS n_true, cast(1 AS BIGINT) AS precision_ok
    FROM documents a JOIN documents b ON a.doc_id = b.doc_id - 3
    WHERE b.doc_id % 7 = 3"""

  /** Synthesized image corpus for the near-dup surface: every doc gets
    * a deterministic block-pattern PNG
    * ([[graft.operators.Multimodal.synthBlockPng]] — the corpus
    * parquet carries no real images; the PNG encode/decode the hashes
    * run through is real JDK ImageIO). PLANTED near-dups: docs with
    * doc_id % 7 = 3 reuse doc (d−3)'s pattern under the jitter
    * transformation (per-block ±3 wobble + global +6 lift). Docs with
    * doc_id % 5 = 1 encode as JPEG (quality 0.9) instead of PNG, so
    * the corpus is MIXED-FORMAT and some planted pairs cross codecs
    * (e.g. ids 10→13, 45→48: one side lossless, one lossy) — the
    * re-encode duplicate class the perceptual hash exists for.
    */
  private def imagePayloads(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spreadIds(spark, docs(spark, dir).select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { id =>
        val dup = id % 7 == 3 && id >= 3
        val seed = if (dup) id - 3 else id
        val bytes =
          if (id % 5 == 1) Multimodal.synthBlockJpeg(seed, jitter = dup)
          else Multimodal.synthBlockPng(seed, jitter = dup)
        (id, "image", bytes)
      })
      .toDF("doc_id", "kind", "payload")
  }

  /** `image_neardup` — the registered DCT-pHash near-dup join (the
    * round-12 surface had it spec-only for want of decodable corpus
    * images; the synthesized corpus closes that the way
    * `audio_neardup` did for audio): per-row decode + 64-bit pHash,
    * banded Hamming candidates, h ≤ 3 accept. Rows-only by design
    * (executor-local DCT DSP DuckDB cannot replay);
    * `image_neardup_recall` is the oracle-checked companion.
    */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame =
    Multimodal.imagePhashNearDups(imagePayloads(spark, dir), maxHamming = 3)

  /** Floor 90: measured planted-pair pHash distances over 400 planted
    * pairs — 98.5% within h ≤ 3 (max observed 4) — and the smallest
    * CROSS-seed distance over 4 950 pairs is 18, so unlike the coarse
    * audio melody space the block-pattern space admits no coincidental
    * tail at all: found = planted ∩ (h ≤ 3), exactly.
    */
  def imageNearDupRecall(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"))
    val truth = d.select(col("doc_id").as("b_id")).filter(col("b_id") % 7 === 3)
      .join(d.select(col("doc_id").as("a_id")), col("a_id") === col("b_id") - 3)
      .select("a_id", "b_id")
    recallRow(truth, imageNearDup(spark, dir).select("a_id", "b_id"), minPct = 90)
  }

  val imageNearDupRecallSql: String = """
    SELECT cast(count(*) AS BIGINT) AS n_true, cast(1 AS BIGINT) AS recall_ok
    FROM documents a JOIN documents b ON a.doc_id = b.doc_id - 3
    WHERE b.doc_id % 7 = 3"""

  /** `image_neardup_groups` — the dup_clusters-shape GROUP contract for
    * the image modality ([[graft.operators.Multimodal.imageNearDupGroups]]):
    * identical pHashes collapse to one family row before the banded
    * candidate join, so output is sized by distinct hashes. Same
    * accept set as `image_neardup`. Rows-only by design (JVM DCT);
    * `image_neardup_groups_recall` is the oracle-checked companion.
    */
  def imageNearDupGroups(spark: SparkSession, dir: String): DataFrame =
    Multimodal.imageNearDupGroups(imagePayloads(spark, dir), maxHamming = 3)

  /** Floor 90 (the pair-shape floor — family coverage of a planted
    * pair is exactly pair-shape discovery, see the audio twin). ONE
    * decode pass: the Materialized hash frame feeds the group edges
    * and the doc→family mapping.
    */
  def imageNearDupGroupsRecall(spark: SparkSession, dir: String): DataFrame =
    hashedGroupsRecall(spark, dir,
      Materialize(Multimodal.imagePhashFrame(imagePayloads(spark, dir))), minPct = 90)

  val imageNearDupGroupsRecallSql: String = imageNearDupRecallSql

  /** Shared groups-recall audit for the 64-bit hash modalities: a
    * planted pair counts as recovered when its docs share a hash
    * family or their family REPS are joined by a near edge (a_id =!=
    * b_id — exact-family rows are the only a_id == b_id rows; near
    * edges can carry hamming = 0 only in multi-key spaces, which the
    * single-key h64 grouping excludes, but the predicate stays the
    * audio-proven one).
    */
  private def hashedGroupsRecall(spark: SparkSession, dir: String,
      fp: DataFrame, minPct: Int): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"))
    val truth = d.select(col("doc_id").as("b_id")).filter(col("b_id") % 7 === 3)
      .join(d.select(col("doc_id").as("a_id")), col("a_id") === col("b_id") - 3)
      .select("a_id", "b_id")
    val rep = fp.join(fp.groupBy("h64").agg(min("doc_id").as("rep_id")), Seq("h64"))
      .select(col("doc_id"), col("rep_id"))
    val t2 = truth
      .join(rep.select(col("doc_id").as("a_id"), col("rep_id").as("ra")), "a_id")
      .join(rep.select(col("doc_id").as("b_id"), col("rep_id").as("rb")), "b_id")
    val edges = Multimodal.hashedNearDupGroups(fp, maxHamming = 3)
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id").as("ea"), col("b_id").as("eb"))
    val same = t2.filter(col("ra") === col("rb")).select("a_id", "b_id")
    val nearHit = t2.filter(col("ra") =!= col("rb"))
      .join(edges,
        least(col("ra"), col("rb")) === col("ea") &&
          greatest(col("ra"), col("rb")) === col("eb"),
        "left_semi")
      .select("a_id", "b_id")
    recallRow(truth, same.unionByName(nearHit), minPct = minPct)
  }

  /** Synthesized Y4M corpus: deterministic 32×32 C420 clips
    * ([[graft.operators.Multimodal.synthY4m]]) with the same planted
    * layout as the image/audio surfaces (doc_id % 7 = 3 replays
    * (d−3)'s clip regraded).
    */
  private def videoPayloads(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spreadIds(spark, docs(spark, dir).select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { id =>
        val dup = id % 7 == 3 && id >= 3
        val seed = if (dup) id - 3 else id
        (id, "video", Multimodal.synthY4m(seed, jitter = dup))
      })
      .toDF("doc_id", "kind", "payload")
  }

  /** `video_neardup` — completes the modality symmetry (image pHash,
    * audio FFT fingerprint, now video): 64-bit spatio-temporal
    * fingerprint (8 sampled frames × 8 luma bands, bit = band > frame
    * mean — TIRI shape) through the real codec-free Y4M decode, into
    * the shared banded Hamming join at h ≤ 3. Rows-only by design;
    * `video_neardup_recall` is the oracle-checked companion.
    */
  def videoNearDup(spark: SparkSession, dir: String): DataFrame =
    Multimodal.videoNearDups(videoPayloads(spark, dir), maxHamming = 3)

  /** Floor 90: measured 100% of 400 planted regrades within h ≤ 3
    * (max 3) and smallest cross-seed distance 19 over 4 950 pairs —
    * like the image block patterns, the (segment × band) space admits
    * no coincidental tail.
    */
  def videoNearDupRecall(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"))
    val truth = d.select(col("doc_id").as("b_id")).filter(col("b_id") % 7 === 3)
      .join(d.select(col("doc_id").as("a_id")), col("a_id") === col("b_id") - 3)
      .select("a_id", "b_id")
    recallRow(truth, videoNearDup(spark, dir).select("a_id", "b_id"), minPct = 90)
  }

  val videoNearDupRecallSql: String = """
    SELECT cast(count(*) AS BIGINT) AS n_true, cast(1 AS BIGINT) AS recall_ok
    FROM documents a JOIN documents b ON a.doc_id = b.doc_id - 3
    WHERE b.doc_id % 7 = 3"""

  /** `video_neardup_groups` — the GROUP contract for the video
    * modality (TIRI-bit families); see [[imageNearDupGroups]].
    * Rows-only by design; `video_neardup_groups_recall` audits it.
    */
  def videoNearDupGroups(spark: SparkSession, dir: String): DataFrame =
    Multimodal.videoNearDupGroups(videoPayloads(spark, dir), maxHamming = 3)

  /** Floor 90, single decode pass — the video twin of
    * [[imageNearDupGroupsRecall]].
    */
  def videoNearDupGroupsRecall(spark: SparkSession, dir: String): DataFrame =
    hashedGroupsRecall(spark, dir,
      Materialize(Multimodal.videoHashFrame(videoPayloads(spark, dir))), minPct = 90)

  val videoNearDupGroupsRecallSql: String = videoNearDupRecallSql

  /** Cross-modal join: text-side quality metadata joined with the
    * vector-side norm for the overlapping ids — the shape of a curation
    * pass that gates on BOTH text quality and embedding sanity.
    */
  def multimodalJoin(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("n_chars_m"))
    val e = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
      .select(col("id").as("doc_id"), round(col("nrm"), 6).as("emb_norm"))
    d.join(e, "doc_id").orderBy("doc_id")
  }

  val multimodalJoinSql: String = """
    SELECT doc_id, lang, cast(length(text) AS BIGINT) AS n_chars_m,
      round(sqrt(list_inner_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))), 6) AS emb_norm
    FROM documents JOIN embeddings ON doc_id = vec_id
    ORDER BY doc_id"""

  /** Per-label embedding centroids, long format (label, dimension,
    * mean): posexplode + codegen'd grouped decimal means — the vector
    * aggregation shape k-means training uses, oracle-checked here.
    * Floats widen to double BEFORE the decimal cast on both engines, so
    * the decimal rounding sees identical values.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    embs(spark, dir)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(round(
        sum(col("col").cast("double").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .cast("double") / count(lit(1)).cast("double"), 6).as("m"))
      .select(col("label").cast("long").as("label"), col("pos").cast("long").as("pos"), col("m"))
      .orderBy("label", "pos")

  val labelCentroidsSql: String = """
    SELECT cast(label AS BIGINT) AS label, cast(i - 1 AS BIGINT) AS pos,
      round(cast(sum(cast(cast(embedding[i] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
        / cast(count(*) AS DOUBLE), 6) AS m
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    GROUP BY label, i
    ORDER BY label, pos"""

  /** SemDeDup-style semantic dedup over the embedding corpus: 16-cell
    * k-means index (1 Lloyd round, deterministic init = 16 lowest ids),
    * then a within-cell cosine ≥ 0.35 collapse keeping each near-dup
    * chain's minimal-id representative. Fully oracle-checked — the
    * whole pipeline (init, one Lloyd round with exact-decimal means,
    * final assignment with the (aff desc, c_id desc) tie-break, pair
    * collapse) unrolls into SQL, same discipline as pagerank.
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val cent = Similarity.kmeansCentroids(prepped, k = 16, iters = 1)
    Similarity.semDedup(prepped, cent, tau = 0.35).orderBy("vec_id")
  }

  /** Shared unrolled k-means CTE prefix (init from the 16 lowest ids,
    * ONE Lloyd round with exact-decimal means, final assignment with
    * the (aff desc, c_id desc) tie-break) — the exact mirror of
    * `Similarity.kmeansCentroids(k=16, iters=1)` + `assignCells`, used
    * by the sem_dedup AND knn_ivf oracles.
    */
  private val kmeansCtePrefix: String = """
    WITH e AS (
      SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c_id, v AS cv, nrm AS cn
      FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)),
    a1 AS (
      SELECT e.vec_id, e.v, c.c_id,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY list_inner_product(e.v, c.cv) / (e.nrm * c.cn) DESC, c.c_id DESC) AS rn
      FROM e, c0 c
      QUALIFY rn = 1),
    m1 AS (
      SELECT c_id, i,
        cast(sum(cast(v[i] AS DECIMAL(28,12))) AS DOUBLE) / cast(count(*) AS DOUBLE) AS m
      FROM a1, unnest(range(1, len(v) + 1)) AS u(i)
      GROUP BY c_id, i),
    c1 AS (
      SELECT c_id, cv, sqrt(list_inner_product(cv, cv)) AS cn
      FROM (SELECT c_id, list(m ORDER BY i) AS cv FROM m1 GROUP BY c_id)),
    a2 AS (
      SELECT e.vec_id, e.label, e.v, e.nrm, c.c_id,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY list_inner_product(e.v, c.cv) / (e.nrm * c.cn) DESC, c.c_id DESC) AS rn
      FROM e, c1 c
      QUALIFY rn = 1)"""

  /** Clustering-vs-labels agreement report: purity (share of vectors
    * under their cell's majority label) and the Adjusted Rand Index of
    * the k-means cells against the embedding labels — the "is this
    * unsupervised structure real" eval run before anyone trusts
    * cluster-based curation. ARI is computed ENTIRELY from exact
    * integer pair counts in DECIMAL(38,0)/HUGEINT — with every C(x,2)
    * carried as x(x−1) and the ½ cleared by doubling, the single
    * double division at the end is the only inexact step:
    * ARI = (2·C₂·S₂ − 2·A₂·B₂) / (C₂·(A₂+B₂) − 2·A₂·B₂). The
    * contingency table is (cells × labels) rows — dim-sized; nothing
    * after the one assignment pass grows with data.
    */
  def clusterPurity(spark: SparkSession, dir: String): DataFrame = {
    val raw = embs(spark, dir)
    val prepped = Similarity.prep(raw, "vec_id", "embedding")
    val cent = Similarity.kmeansCentroids(prepped, k = 16, iters = 1)
    val lab = Similarity.assignCells(prepped, cent)
      .select(col("id"), col("c_id"))
      .join(raw.select(col("vec_id").as("id"), col("label")), Seq("id"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    def p2(c: org.apache.spark.sql.Column) = dec(c) * (dec(c) - 1)
    val cl = lab.groupBy("c_id", "label").agg(count(lit(1)).as("n"))
    val s2 = cl.agg(sum(p2(col("n"))).as("s2"),
      count(lit(1)).as("n_pairs_cells"))
    val a2 = cl.groupBy("c_id").agg(sum("n").as("a"), max("n").as("top_n"))
      .agg(sum(p2(col("a"))).as("a2"), sum(dec(col("a"))).as("n_vecs"),
        count(lit(1)).as("n_cells"), sum(dec(col("top_n"))).as("pure"))
    val b2 = cl.groupBy("label").agg(sum("n").as("b"))
      .agg(sum(p2(col("b"))).as("b2"))
    a2.crossJoin(broadcast(s2.select("s2"))).crossJoin(broadcast(b2))
      .select(
        col("n_vecs").cast("long").as("n_vecs"),
        col("n_cells").cast("long").as("n_cells"),
        round(col("pure").cast("double") / col("n_vecs").cast("double"), 6)
          .as("purity"),
        round((lit(2) * p2(col("n_vecs")) * col("s2")
            - lit(2) * col("a2") * col("b2")).cast("double")
          / (p2(col("n_vecs")) * (col("a2") + col("b2"))
            - lit(2) * col("a2") * col("b2")).cast("double"), 6).as("ari"))
  }

  val clusterPuritySql: String = s"""$kmeansCtePrefix,
    lab AS (
      SELECT a.vec_id, a.c_id, emb.label
      FROM a2 a JOIN embeddings emb ON a.vec_id = emb.vec_id),
    cl AS (SELECT c_id, label, cast(count(*) AS HUGEINT) AS n
           FROM lab GROUP BY 1, 2),
    s2 AS (SELECT sum(n * (n - 1)) AS s2 FROM cl),
    arow AS (SELECT c_id, sum(n) AS a, max(n) AS top_n FROM cl GROUP BY 1),
    aa AS (SELECT sum(a * (a - 1)) AS a2, sum(a) AS n_vecs,
             cast(count(*) AS BIGINT) AS n_cells, sum(top_n) AS pure
           FROM arow),
    brow AS (SELECT label, sum(n) AS b FROM cl GROUP BY 1),
    bb AS (SELECT sum(b * (b - 1)) AS b2 FROM brow)
    SELECT cast(n_vecs AS BIGINT) AS n_vecs, n_cells,
      round(cast(pure AS DOUBLE) / cast(n_vecs AS DOUBLE), 6) AS purity,
      round(cast(2 * n_vecs * (n_vecs - 1) * s2 - 2 * a2 * b2 AS DOUBLE)
            / cast(n_vecs * (n_vecs - 1) * (a2 + b2) - 2 * a2 * b2 AS DOUBLE),
            6) AS ari
    FROM aa CROSS JOIN s2 CROSS JOIN bb"""

  /** Exact SQL mirror of [[knnIvf]]/[[knnIvfHi]]: probe cells ranked by
    * centroid affinity with the (aff desc, c_id ASC) probe tie-break
    * (note: OPPOSITE c_id direction from the assignment argmax — the
    * engine's array_sort on (negaff, c_id) breaks ties toward the
    * lowest cell), candidates from the probed Voronoi cells, exact
    * top-5 by (cos desc, n_id). Possible because the IVF path has NO
    * JVM-specific hashing anywhere — centroids, probes and scores are
    * pure arithmetic.
    */
  private def knnIvfOracleSql(nProbe: Int): String = s"""$kmeansCtePrefix,
    probe AS (
      SELECT q.vec_id AS q_id, q.v AS qv, q.nrm AS qn, c.c_id
      FROM e q, c1 c
      WHERE q.vec_id % 50 = 0
      QUALIFY row_number() OVER (PARTITION BY q.vec_id
        ORDER BY list_inner_product(q.v, c.cv) / (q.nrm * c.cn) DESC, c.c_id) <= $nProbe),
    scored AS (
      SELECT p.q_id, a.vec_id AS n_id,
        list_inner_product(p.qv, a.v) / (p.qn * a.nrm) AS cos
      FROM probe p JOIN a2 a ON a.c_id = p.c_id AND a.vec_id != p.q_id),
    ranked AS (
      SELECT q_id, n_id, cos,
        cast(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rk
      FROM scored)
    SELECT q_id, n_id, round(cos, 6) AS cosine, rk
    FROM ranked WHERE rk <= 5
    ORDER BY q_id, rk"""

  val knnIvfSql: String = knnIvfOracleSql(nProbe = 6)
  val knnIvfHiSql: String = knnIvfOracleSql(nProbe = 12)

  /** Exact SQL mirror of [[knnPq]], GENERATED from the same constants
    * the Spark query reads (`PqSubLen`/`PqSubK`/`PqK`/`PqRerank`/
    * `PqQueryMod`/`pqLos`), so the two sides cannot desync: one
    * codebook chain per subspace, per-query ADC tables as a query ×
    * sub-centroid join, the ADC cut at rank `PqRerank` with the
    * (a desc, n_id) tie-break, then the exact re-rank — every score
    * pure arithmetic, so the whole search path hash-checks like the
    * IVF family. Addition order matches the Spark side's left-assoc
    * reduce exactly.
    */
  /** One L2-k-means CTE chain over a NORMALIZED sub-vector slice —
    * the SQL mirror of [[pqSubspaces]]'s training + [[Similarity
    * .knnPq]]'s code assignment for subspace `s`: unit-sphere
    * projection, deterministic lowest-id init, L2 assignment
    * (argmax v·c − ‖c‖²/2, ties to highest c_id), exact-decimal mean
    * recompute, final assignment (a2\$s = the code column). Distinct
    * from [[pqChainCore]], which mirrors the emb_pq REPORT's
    * cosine-trained codebooks.
    */
  private def pqL2ChainCore(lo: Int, hi: Int, s: Int, k: Int): String =
    pqL2Chain(s, k, s"""
      SELECT vec_id, list_transform(cast(embedding[$lo:$hi] AS DOUBLE[]),
        x -> x / sqrt(list_inner_product(cast(embedding AS DOUBLE[]),
                                         cast(embedding AS DOUBLE[])))) AS v
      FROM embeddings""")

  /** The same L2 chain over an arbitrary (vec_id, v) source — the
    * residual-slice variant feeds the IVF+PQ oracle.
    */
  private def pqL2Chain(s: Int, k: Int, srcSql: String): String = s"""
    e$s AS ($srcSql),
    c0$s AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c_id, v AS cv,
        sqrt(list_inner_product(v, v)) AS cn
      FROM (SELECT * FROM e$s ORDER BY vec_id LIMIT $k)),
    a1$s AS (
      SELECT e.vec_id, e.v, c.c_id,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY (list_inner_product(e.v, c.cv) - c.cn * c.cn / 2) DESC, c.c_id DESC) AS rn
      FROM e$s e, c0$s c
      QUALIFY rn = 1),
    m1$s AS (
      SELECT c_id, i,
        cast(sum(cast(v[i] AS DECIMAL(28,12))) AS DOUBLE) / cast(count(*) AS DOUBLE) AS m
      FROM a1$s, unnest(range(1, len(v) + 1)) AS u(i)
      GROUP BY c_id, i),
    c1$s AS (
      SELECT c_id, cv, sqrt(list_inner_product(cv, cv)) AS cn
      FROM (SELECT c_id, list(m ORDER BY i) AS cv FROM m1$s GROUP BY c_id)),
    a2$s AS (
      SELECT e.vec_id, c.c_id,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY (list_inner_product(e.v, c.cv) - c.cn * c.cn / 2) DESC, c.c_id DESC) AS rn
      FROM e$s e, c1$s c
      QUALIFY rn = 1)"""

  /** DuckDB planner guard for the generated many-CTE oracles: mark
    * every CTE `AS MATERIALIZED`. Without it DuckDB 1.0 INLINES each
    * CTE reference, and the PQ oracles' ~40 inlined relations blow up
    * join-order planning (measured: knn_pq >5 min / knn_ivfpq >70 GB
    * at sf0.01); with it both run in ~0.5 s. Purely a planner hint —
    * results are identical. Anchored to line-start CTE headers
    * (optionally after WITH) so a future non-CTE `<alias> AS (` inside
    * an expression can never be rewritten by accident; every CTE the
    * PQ generators emit starts its own line by construction — and a
    * MISS is now loud, not silent: the rewrite count is required to
    * equal the count of `<word> AS (` occurrences ANYWHERE in the
    * input (the generated SQL contains no non-CTE `AS (`), so a future
    * comma-led or same-line CTE header that escapes the line anchor
    * throws at class-init instead of quietly reintroducing the
    * measured planner blowup.
    */
  private[queries] def materializeCtes(sql: String): String = {
    val out = sql.replaceAll("""(?m)^(\s*)(WITH\s+)?(\w+) AS \(""",
      "$1$2$3 AS MATERIALIZED (")
    val headers = """\w+ AS \(""".r.findAllIn(sql).size
    val rewritten = """\w+ AS MATERIALIZED \(""".r.findAllIn(out).size
    require(rewritten == headers,
      s"materializeCtes missed ${headers - rewritten} CTE header(s) — " +
        "a header not at line start would silently skip AS MATERIALIZED")
    out
  }

  val knnPqSql: String = materializeCtes {
    val ss = pqLos.indices
    val chains = ss.map(s =>
      pqL2ChainCore(pqLos(s), pqLos(s) + PqSubLen - 1, s, PqSubK).trim)
    val codeCols = ss.map(s => s"a2$s.c_id AS code$s").mkString(", ")
    val codeJoins = ss.tail.map(s => s"JOIN a2$s USING (vec_id)").mkString("\n      ")
    val qds = ss.map(s => s"""qd$s AS (
      SELECT q.vec_id AS q_id, c.c_id, list_inner_product(q.v, c.cv) AS d
      FROM e$s q, c1$s c WHERE q.vec_id % $PqQueryMod = 0)""")
    val qdJoins = ss.tail.map(s =>
      s"JOIN qd$s q$s ON q$s.q_id = q0.q_id AND q$s.c_id = x.code$s")
      .mkString("\n      ")
    val dSum = ss.map(s => s"q$s.d").mkString(" + ")
    s"""
    WITH ${chains.mkString(",\n    ")},
    e AS (
      SELECT vec_id, cast(embedding AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    codes AS (
      SELECT a20.vec_id, $codeCols
      FROM a20 $codeJoins),
    ${qds.mkString(",\n    ")},
    adc AS (
      SELECT q0.q_id, x.vec_id AS n_id,
        ($dSum) AS a
      FROM codes x
      JOIN qd0 q0 ON q0.c_id = x.code0
      $qdJoins
      WHERE x.vec_id != q0.q_id),
    cand AS (
      SELECT q_id, n_id FROM adc
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY a DESC, n_id) <= $PqRerank),
    scored AS (
      SELECT c.q_id, c.n_id,
        list_inner_product(q.v, x.v) / (q.nrm * x.nrm) AS cos
      FROM cand c
      JOIN e q ON q.vec_id = c.q_id
      JOIN e x ON x.vec_id = c.n_id),
    ranked AS (
      SELECT q_id, n_id, cos,
        cast(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rk
      FROM scored)
    SELECT q_id, n_id, round(cos, 6) AS cosine, rk
    FROM ranked WHERE rk <= $PqK
    ORDER BY q_id, rk"""
  }

  /** Shared CTE block for the IVF+PQ coding chain — the residual frame
    * (û − ĉ(cell), element divisions in the same order as
    * `Similarity.residualFrame`), one residual-slice L2 chain per
    * subspace ([[pqL2Chain]]) and the final `codes` CTE. `withLabel`
    * mirrors [[Similarity.ivfPqCodes]]'s `keep = Seq("label")`: the
    * attribute column rides IN the codes rows, exactly as the
    * persisted index stores it.
    */
  private def ivfPqCodesCtes(withLabel: Boolean): String = {
    val ss = pqLos.indices
    val labA = if (withLabel) ", a.label" else ""
    val labR = if (withLabel) ", r.label" else ""
    val residSql = s"""
    resid AS (
      SELECT a.vec_id, a.c_id$labA,
        list_transform(range(1, len(a.v) + 1),
          i -> a.v[i] / a.nrm - c.cv[i] / c.cn) AS r
      FROM a2 a JOIN c1 c ON a.c_id = c.c_id)"""
    val chains = ss.map(s => pqL2Chain(s, PqSubK,
      s"SELECT vec_id, r[${pqLos(s)}:${pqLos(s) + PqSubLen - 1}] AS v FROM resid").trim)
    val codeCols = ss.map(s => s"a2$s.c_id AS code$s").mkString(", ")
    val codeJoins = ss.map(s => s"JOIN a2$s USING (vec_id)").mkString("\n      ")
    s"""${residSql.trim},
    ${chains.mkString(",\n    ")},
    codes AS (
      SELECT r.vec_id, r.c_id$labR, $codeCols
      FROM resid r $codeJoins)"""
  }

  /** Exact SQL mirror of the IVF+PQ search ([[knnIvfPq]] and the
    * persisted-index `ann_index_search`, which CellIndexSpec/
    * AnnIndexSpec prove value-identical), generated from the shared PQ
    * constants plus [[IvfPqNProbe]]: the coarse k-means chain
    * (`kmeansCtePrefix`), the coding chain ([[ivfPqCodesCtes]]), probes
    * with the (aff desc, c_id ASC) tie-break carrying the exact
    * affinity term, ADC = aff + Σ d_s in the Spark side's left-assoc
    * order, rank cuts tie-broken on n_id in both lanes.
    * `labelFiltered` additionally mirrors
    * [[Similarity.knnIvfPqFilteredOnCodes]]: the query's label rides
    * the probe CTE and the ADC scan keeps only label-equal candidates
    * (filter-before-rank), with `rerank` parameterized so the filtered
    * operating point can move independently.
    */
  private def ivfPqSearchSql(labelFiltered: Boolean, rerank: Int): String =
    materializeCtes {
    val ss = pqLos.indices
    val qds = ss.map { s =>
      val (lo, hi) = (pqLos(s), pqLos(s) + PqSubLen - 1)
      s"""qd$s AS (
      SELECT q.vec_id AS q_id, c.c_id,
        list_inner_product(list_transform(q.v[$lo:$hi], x -> x / q.nrm), c.cv) AS d
      FROM e q, c1$s c WHERE q.vec_id % $PqQueryMod = 0)"""
    }
    val qdJoins = ss.map(s =>
      s"JOIN qd$s q$s ON q$s.q_id = p.q_id AND q$s.c_id = x.code$s")
      .mkString("\n      ")
    val dSum = ss.map(s => s"q$s.d").mkString(" + ")
    val qlab = if (labelFiltered) ", q.label AS qlab" else ""
    val labFilter = if (labelFiltered) " AND x.label = p.qlab" else ""
    s"""$kmeansCtePrefix,
    ${ivfPqCodesCtes(labelFiltered)},
    probe AS (
      SELECT q.vec_id AS q_id, c.c_id$qlab,
        list_inner_product(q.v, c.cv) / (q.nrm * c.cn) AS aff
      FROM e q, c1 c
      WHERE q.vec_id % $PqQueryMod = 0
      QUALIFY row_number() OVER (PARTITION BY q.vec_id
        ORDER BY list_inner_product(q.v, c.cv) / (q.nrm * c.cn) DESC, c.c_id) <= $IvfPqNProbe),
    ${qds.mkString(",\n    ")},
    adc AS (
      SELECT p.q_id, x.vec_id AS n_id,
        (p.aff + $dSum) AS a
      FROM codes x
      JOIN probe p ON p.c_id = x.c_id AND x.vec_id != p.q_id$labFilter
      $qdJoins),
    cand AS (
      SELECT q_id, n_id FROM adc
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY a DESC, n_id) <= $rerank),
    scored AS (
      SELECT c.q_id, c.n_id,
        list_inner_product(q.v, x.v) / (q.nrm * x.nrm) AS cos
      FROM cand c
      JOIN e q ON q.vec_id = c.q_id
      JOIN e x ON x.vec_id = c.n_id),
    ranked AS (
      SELECT q_id, n_id, cos,
        cast(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rk
      FROM scored)
    SELECT q_id, n_id, round(cos, 6) AS cosine, rk
    FROM ranked WHERE rk <= $PqK
    ORDER BY q_id, rk"""
  }

  val knnIvfPqSql: String = ivfPqSearchSql(labelFiltered = false, rerank = PqRerank)

  /** `ann_index_search` reads back the index [[annIndexBuild]] wrote and
    * must return exactly what the inline-trained search returns (the
    * training is deterministic and parquet round-trips doubles
    * bit-exactly — asserted in CellIndexSpec/AnnIndexSpec), so it
    * shares the inline mirror.
    */
  val annIndexSearchSql: String = knnIvfPqSql

  val knnFilteredSql: String =
    ivfPqSearchSql(labelFiltered = true, rerank = FilteredRerank)

  /** Mirror of [[annIndexBuild]]'s persisted codes frame: the full
    * coding chain, dumped as one row per vector with the stored label
    * attribute — the on-disk truth the search side scans.
    */
  val annIndexBuildSql: String = materializeCtes {
    val codeCols = pqLos.indices.map(s => s"code$s").mkString(", ")
    s"""$kmeansCtePrefix,
    ${ivfPqCodesCtes(withLabel = true)}
    SELECT vec_id AS n_id, $codeCols, label, cast(c_id AS BIGINT) AS c_id
    FROM codes
    ORDER BY n_id"""
  }

  val semDedupSql: String = s"""$kmeansCtePrefix,
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM a2 a JOIN a2 b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
      WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35)
    SELECT a2.vec_id, cast(a2.c_id AS BIGINT) AS c_id,
      (d.vec_id IS NULL) AS kept
    FROM a2 LEFT JOIN dropped d ON a2.vec_id = d.vec_id
    ORDER BY a2.vec_id"""

  /** K-means index health report — the go/no-go check before trusting
    * the sem_dedup / IVF cell structure: per cell, member count and
    * mean cosine affinity to the centroid (exact-decimal mean, so
    * partition order can't show in the doubles). A cell with low mean
    * affinity or a lopsided count is where IVF recall leaks and where
    * SemDeDup's within-cell collapse under-reaches. Assignment is the
    * map-only literal-bank projection; the only shuffle is the 16-group
    * aggregate.
    */
  def kmeansQuality(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val cent = Similarity.kmeansCentroids(prepped, k = 16, iters = 1)
    Similarity.assignCells(prepped, cent)
      .join(broadcast(cent), "c_id")
      .select(col("c_id"),
        Similarity.cosine(col("v"), col("nrm"), col("cv"), col("cn")).as("aff"))
      .groupBy("c_id")
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("aff").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .cast("double") / count(lit(1)).cast("double"), 6).as("mean_aff"))
      .select(col("c_id").cast("long").as("c_id"), col("n_members"), col("mean_aff"))
      .orderBy("c_id")
  }

  val kmeansQualitySql: String = s"""$kmeansCtePrefix
    SELECT cast(a.c_id AS BIGINT) AS c_id, count(*) AS n_members,
      round(cast(sum(cast(list_inner_product(a.v, c.cv) / (a.nrm * c.cn)
          AS DECIMAL(28,12))) AS DOUBLE) / cast(count(*) AS DOUBLE), 6) AS mean_aff
    FROM a2 a JOIN c1 c USING (c_id)
    GROUP BY a.c_id
    ORDER BY c_id"""

  /** Product-quantization codebook report: split the 64-dim embedding
    * into 2 subspaces of 32 dims, train an 8-cell codebook per
    * subspace (1 Lloyd round, deterministic lowest-id init — the
    * established k-means pipeline on SUB-vectors), and report per
    * (subspace, cell) member count + exact-decimal mean affinity. PQ
    * is THE vector-compression layer of a 100 TB ANN deployment: a
    * vector's code is its pair of cell ids (here 2×3 bits vs 64×32-bit
    * floats), distances decompose per subspace, and this report is the
    * codebook-health check run after training. Everything reuses the
    * [[Similarity]] machinery — map-only assignment against literal
    * sub-centroid banks, one aggregation per subspace; the whole
    * pipeline (slices included) unrolls into SQL like `sem_dedup`.
    */
  def embPq(spark: SparkSession, dir: String): DataFrame = {
    val raw = embs(spark, dir)
    def subReport(lo: Int, len: Int, space: Int): DataFrame = {
      val prepped = raw.select(col("vec_id").as("id"),
          slice(col("embedding"), lit(lo), lit(len)).as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val cent = Similarity.kmeansCentroids(prepped, k = 8, iters = 1)
      Similarity.assignCells(prepped, cent)
        .join(broadcast(cent), "c_id")
        .select(lit(space.toLong).as("subspace"), col("c_id"),
          Similarity.cosine(col("v"), col("nrm"), col("cv"), col("cn")).as("aff"))
    }
    subReport(1, 32, 0).union(subReport(33, 32, 1))
      .groupBy("subspace", "c_id")
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("aff").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .cast("double") / count(lit(1)).cast("double"), 6).as("mean_aff"))
      .select(col("subspace"), col("c_id").cast("long").as("c_id"),
        col("n_members"), col("mean_aff"))
      .orderBy("subspace", "c_id")
  }

  /** One k-means CTE chain over a sub-vector slice, tables suffixed by
    * subspace — the [[kmeansCtePrefix]] shape parameterized for PQ.
    * [[pqChainCore]] ends at the trained codebook (c1\$s) + final
    * assignment (a2\$s) — shared by the emb_pq report and the knn_pq
    * search oracle; [[pqChain]] appends the report aggregate.
    */
  private def pqChainCore(lo: Int, hi: Int, s: Int, k: Int = 8): String = s"""
    e$s AS (
      SELECT vec_id, cast(embedding[$lo:$hi] AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding[$lo:$hi] AS DOUBLE[]),
          cast(embedding[$lo:$hi] AS DOUBLE[]))) AS nrm
      FROM embeddings),
    c0$s AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c_id, v AS cv, nrm AS cn
      FROM (SELECT * FROM e$s ORDER BY vec_id LIMIT $k)),
    a1$s AS (
      SELECT e.vec_id, e.v, c.c_id,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY list_inner_product(e.v, c.cv) / (e.nrm * c.cn) DESC, c.c_id DESC) AS rn
      FROM e$s e, c0$s c
      QUALIFY rn = 1),
    m1$s AS (
      SELECT c_id, i,
        cast(sum(cast(v[i] AS DECIMAL(28,12))) AS DOUBLE) / cast(count(*) AS DOUBLE) AS m
      FROM a1$s, unnest(range(1, len(v) + 1)) AS u(i)
      GROUP BY c_id, i),
    c1$s AS (
      SELECT c_id, cv, sqrt(list_inner_product(cv, cv)) AS cn
      FROM (SELECT c_id, list(m ORDER BY i) AS cv FROM m1$s GROUP BY c_id)),
    a2$s AS (
      SELECT e.vec_id, e.v, e.nrm, c.c_id,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY list_inner_product(e.v, c.cv) / (e.nrm * c.cn) DESC, c.c_id DESC) AS rn
      FROM e$s e, c1$s c
      QUALIFY rn = 1)"""

  private def pqChain(lo: Int, hi: Int, s: Int): String =
    pqChainCore(lo, hi, s) + s""",
    q$s AS (
      SELECT cast($s AS BIGINT) AS subspace, cast(a.c_id AS BIGINT) AS c_id,
        count(*) AS n_members,
        round(cast(sum(cast(list_inner_product(a.v, c.cv) / (a.nrm * c.cn)
            AS DECIMAL(28,12))) AS DOUBLE) / cast(count(*) AS DOUBLE), 6) AS mean_aff
      FROM a2$s a JOIN c1$s c USING (c_id)
      GROUP BY a.c_id)"""

  val embPqSql: String = s"""
    WITH ${pqChain(1, 32, 0).trim},
    ${pqChain(33, 64, 1).trim}
    SELECT * FROM (SELECT * FROM q0 UNION ALL SELECT * FROM q1)
    ORDER BY subspace, c_id"""

  /** Symmetric int8 embedding quantization, long format: per-vector
    * scale = 127 / max|v|, q = round-half-up(v·scale) — the compression
    * step an ANN index at 100 TB actually ships (4× smaller vectors, dot
    * products in integer SIMD). Row-local except the final sort: the
    * scale is an in-row array fold, quantized elements posexplode from
    * the row — no shuffle touches vector data.
    *
    * Cross-engine determinism: both sides round via floor(x + 0.5)
    * (identical double arithmetic; library round() differs on .5 ties
    * between engines), and the max|v| comparison happens on exact float
    * values before one double division.
    */
  def embQuantize(spark: SparkSession, dir: String): DataFrame =
    embs(spark, dir)
      .select(col("vec_id"),
        (lit(127.0) / greatest(
          array_max(transform(col("embedding"), x => abs(x))).cast("double"),
          lit(1e-12))).as("scale"),
        posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        floor(col("col").cast("double") * col("scale") + 0.5).cast("long").as("q"),
        round(col("scale"), 6).as("scale"))
      .orderBy("vec_id", "pos")

  val embQuantizeSql: String = """
    WITH s AS (
      SELECT vec_id, embedding,
        127.0 / greatest(cast(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE), 1e-12) AS scale
      FROM embeddings)
    SELECT vec_id, cast(i - 1 AS BIGINT) AS pos,
      cast(floor(cast(embedding[i] AS DOUBLE) * scale + 0.5) AS BIGINT) AS q,
      round(scale, 6) AS scale
    FROM s, unnest(range(1, len(embedding) + 1)) AS u(i)
    ORDER BY vec_id, pos"""

  /** Per-dimension z-score normalization of the embedding table — the
    * feature-scaling pass run before distance-based anything (kmeans,
    * IVF, cosine thresholds) when dimensions arrive on different
    * scales. Cross-engine determinism: each float snaps to
    * DECIMAL(18,8) once, per-dim moments (n, Σv, Σv²) accumulate
    * EXACTLY, and z = (n·v − Σv)/√(n·Σv² − Σv²) is ONE agreed double
    * expression over those exact sums (identical IEEE ops both sides).
    * A zero-variance dimension yields NULL, never ±Inf. Scale shape:
    * the stats frame is `dim` rows — a broadcast — so normalization is
    * one map pass after one map-side-combined aggregation.
    */
  def embNormalize(spark: SparkSession, dir: String): DataFrame = {
    val ex = embs(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        col("col").cast("double").cast("decimal(18,8)").as("v"))
    val st = ex.groupBy("pos").agg(
      count(lit(1)).cast("double").as("n"),
      sum("v").cast("double").as("s"),
      sum(col("v") * col("v")).cast("double").as("ss"))
    val denomSq = col("n") * col("ss") - col("s") * col("s")
    ex.join(broadcast(st), Seq("pos"))
      .select(col("vec_id"), col("pos"),
        when(denomSq > 0,
          round((col("n") * col("v").cast("double") - col("s"))
            / sqrt(denomSq), 6)).as("z"))
      .orderBy("vec_id", "pos")
  }

  val embNormalizeSql: String = """
    WITH ex AS (
      SELECT vec_id, cast(i - 1 AS BIGINT) AS pos,
        cast(cast(embedding[i] AS DOUBLE) AS DECIMAL(18,8)) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
    st AS (
      SELECT pos, cast(count(*) AS DOUBLE) AS n, cast(sum(v) AS DOUBLE) AS s,
        cast(sum(v * v) AS DOUBLE) AS ss
      FROM ex GROUP BY 1)
    SELECT vec_id, ex.pos,
      CASE WHEN n * ss - s * s > 0 THEN
        round((n * cast(v AS DOUBLE) - s) / sqrt(n * ss - s * s), 6) END AS z
    FROM ex JOIN st ON ex.pos = st.pos
    ORDER BY vec_id, ex.pos"""

  /** Random-projection dimensionality reduction (64 → 16 dims): the
    * Johnson–Lindenstrauss prefilter an ANN stack runs before exact
    * rescoring — 4× less data per distance, distances preserved within
    * the JL bound. The ±1 projection matrix derives from md5 parity, so
    * BOTH engines rebuild the identical matrix from nothing (no
    * side-channel state); it rides as a 1024-row broadcast (model
    * parameters, like the IVF centroid banks). Terms go through the
    * exact-decimal path so the 64-term sums are shuffle-order-free.
    */
  def embProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Int = {
      val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xFF}%02x").mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
    }
    val matrix = broadcast(
      (for (i <- 0 until Dim; j <- 0 until 16) yield (i, j, sign(i, j)))
        .toDF("i", "j", "sign"))
    embs(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")))
      .join(matrix, col("pos") === col("i"))
      .groupBy(col("vec_id"), col("j").cast("long").as("dim"))
      .agg(sum((col("col").cast("double") * col("sign")).cast("decimal(18,6)"))
        .cast("double").as("p"))
      .orderBy("vec_id", "dim")
  }

  val embProjectSql: String = """
    WITH m AS (
      SELECT r1.range AS i, r2.range AS j,
        CASE WHEN CAST(concat('0x', substr(md5(concat(CAST(r1.range AS VARCHAR),
               '_', CAST(r2.range AS VARCHAR))), 1, 8)) AS BIGINT) % 2 = 0
             THEN 1 ELSE -1 END AS sign
      FROM range(0, 64) r1, range(0, 16) r2),
    e AS (
      SELECT vec_id, k - 1 AS i, cast(embedding[k] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(k))
    SELECT vec_id, cast(j AS BIGINT) AS dim,
      cast(sum(cast(v * sign AS DECIMAL(18,6))) AS DOUBLE) AS p
    FROM e JOIN m ON e.i = m.i
    GROUP BY vec_id, j
    ORDER BY vec_id, dim"""

  /** Z-order layout quality report: Morton-code lineitem on
    * (l_partkey, l_suppkey), cut the curve into segments (code >> 20),
    * and show each segment's bounding box in both dimensions. The boxes
    * being TIGHT in part AND supplier simultaneously is the property
    * that makes a z-ordered write prunable on either predicate at
    * 100 TB ([[graft.operators.ZOrder]]); a lexicographic sort would
    * show tight partkey ranges but full-width suppkey ranges. Pure
    * bitwise arithmetic — bit-identical in the DuckDB oracle.
    */
  def zorderBuckets(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"),
        graft.operators.ZOrder.mortonCode(col("l_partkey"), col("l_suppkey")).as("z"))
      .groupBy(shiftright(col("z"), 20).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .orderBy("z_bucket")

  val zorderBucketsSql: String = """
    WITH g AS (
      SELECT l_partkey, l_suppkey,
        (l_partkey & 65535) AS gx, (l_suppkey & 65535) AS gy
      FROM lineitem),
    s1 AS (SELECT *, ((gx | (gx << 8)) & 16711935) AS ax,
                     ((gy | (gy << 8)) & 16711935) AS ay FROM g),
    s2 AS (SELECT *, ((ax | (ax << 4)) & 252645135) AS bx,
                     ((ay | (ay << 4)) & 252645135) AS by FROM s1),
    s3 AS (SELECT *, ((bx | (bx << 2)) & 858993459) AS cx,
                     ((by | (by << 2)) & 858993459) AS cy FROM s2),
    s4 AS (SELECT *, ((cx | (cx << 1)) & 1431655765) AS dx,
                     ((cy | (cy << 1)) & 1431655765) AS dy FROM s3),
    z AS (SELECT l_partkey, l_suppkey, (dx | (dy << 1)) AS z FROM s4)
    SELECT (z >> 20) AS z_bucket, count(*) AS n,
      min(l_partkey) AS min_part, max(l_partkey) AS max_part,
      min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
    FROM z
    GROUP BY 1
    ORDER BY z_bucket"""

  // ------------------------------------------------- tolerance recalls

  /** Tolerance-oracle recall for the Spark-hash-specific ANN paths: the
    * exact half (brute-force top-k pair count) is engine-portable and
    * hash-checked; the approximate half reduces to a deterministic
    * in-bounds flag (xxhash64 planes + kmeans are seed-fixed, so recall
    * at a given SF is a constant, not a distribution). Same convention
    * as `approx_quantiles`: oracle emits the exact value + literal 1.
    * The ≥-comparison is exact integers (cross-multiplied percent).
    */
  private def annRecall(spark: SparkSession, dir: String,
                        approx: (DataFrame, DataFrame) => DataFrame,
                        minPct: Int): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding")
    val queries = prepped.filter(col("id") % 50 === 0)
    // NOT materialized: the brute subtree is referenced twice (probe +
    // denominator), but it is a broadcast-query map-only scan whose
    // exchange stages AQE reuses within the one job — bench-methodology
    // A/B at sf0.1 showed eager checkpointing serializes the DAG for
    // no gain (round 17, within the ±0.5 s noise band trending worse);
    // round 18 re-tried it OVERLAPPED with the index chain on a second
    // driver thread (Materialize.par2) and it still regressed (5-query
    // knn-recall subset 8.58 -> 9.19 s): ReuseExchange already dedups
    // the brute scan inside the one final job, so the checkpoint only
    // adds a job and pins blocks.
    val brute = Similarity.knnBrute(queries, prepped, k = 5)
      .select(col("q_id"), col("n_id"))
    val hits = brute.join(approx(queries, prepped).select(col("q_id"), col("n_id")),
      Seq("q_id", "n_id"), "left_semi")
    brute.agg(count(lit(1)).as("n_brute"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("n_brute").cast("long").as("n_brute"),
        (col("n_hit") * 100 >= col("n_brute") * minPct).cast("long").as("recall_ok"))
  }

  /** Floor 50: RecallSweep measured 62/74/76.5% across the three SFs at
    * this (4-plane, 8-table) config — 12pp of honest margin. tables=12
    * reaches 80-88% at +50% candidate cost (curve in RecallSweep).
    */
  def knnLshRecall(spark: SparkSession, dir: String): DataFrame =
    annRecall(spark, dir,
      (q, c) => Similarity.knnLsh(q, c, k = 5, dim = Dim, planes = 4, tables = 8),
      minPct = 50)

  def knnIvfRecall(spark: SparkSession, dir: String): DataFrame =
    annRecall(spark, dir, (q, c) =>
      Similarity.knnIvf(q, c, k = 5, nProbe = 6,
        centroids = Some(Similarity.kmeansCentroids(c, k = 16, iters = 1))),
      minPct = 50)

  /** The ≥90%-recall configuration a production consumer expects to
    * exist (measured 94.5–98% across SFs; see [[knnIvfHi]]).
    */
  def knnIvfHiRecall(spark: SparkSession, dir: String): DataFrame =
    annRecall(spark, dir, (q, c) =>
      Similarity.knnIvf(q, c, k = 5, nProbe = 12,
        centroids = Some(Similarity.kmeansCentroids(c, k = 16, iters = 1))),
      minPct = 90)

  /** Recall floor for the PQ/ADC path at the search-grade codebooks
    * (8×8-dim, 64 cells, rerank = PqRerank = 40·k). Floor set from the
    * RecallSweep measurements at all three SFs (minimum 93.5 at sf0.1,
    * quoted at [[PqSubK]]) with ≥23pp margin — re-run the sweep before
    * changing this.
    */
  def knnPqRecall(spark: SparkSession, dir: String): DataFrame =
    annRecall(spark, dir, (q, c) =>
      Similarity.knnPq(q, c, k = PqK, rerank = PqRerank, pqSubspaces(c)),
      minPct = PqMinPct)

  /** Recall floor for the composed IVF+PQ index at (nProbe=12/16,
    * rerank = PqRerank). Floor set from the RecallSweep measurements
    * at all three SFs (minimum 82 at sf0.1, quoted at [[IvfPqNProbe]])
    * with ≥12pp margin — re-run the sweep before changing this.
    */
  def knnIvfPqRecall(spark: SparkSession, dir: String): DataFrame =
    annRecall(spark, dir, (q, c) => {
      val coarse = Similarity.kmeansCentroids(c, k = 16, iters = 1)
      Similarity.knnIvfPq(q, c, k = PqK, rerank = PqRerank,
        nProbe = IvfPqNProbe, coarse = coarse,
        subspaces = ivfPqSubspaces(c, coarse))
    }, minPct = IvfPqMinPct)

  /** Recall floor for the label-filtered search (`knn_filtered`) vs
    * the FILTERED brute truth ([[Similarity.knnBruteFiltered]]) — the
    * truth set itself is the exact hash-checked quantity, same audit
    * contract as the other recall rows. Floor at [[FilteredMinPct]],
    * set from RecallSweep's filtered section across all three SFs.
    */
  def knnFilteredRecall(spark: SparkSession, dir: String): DataFrame = {
    val prepped = Similarity.prep(embs(spark, dir), "vec_id", "embedding",
      keep = Seq("label"))
    val queries = prepped.filter(col("id") % PqQueryMod === 0)
    val brute = Similarity.knnBruteFiltered(queries, prepped, k = PqK,
        labCol = "label")
      .select(col("q_id"), col("n_id"))
    val hits = brute.join(
      knnFiltered(spark, dir).select(col("q_id"), col("n_id")),
      Seq("q_id", "n_id"), "left_semi")
    brute.agg(count(lit(1)).as("n_brute"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("n_brute").cast("long").as("n_brute"),
        (col("n_hit") * 100 >= col("n_brute") * FilteredMinPct)
          .cast("long").as("recall_ok"))
  }

  val knnFilteredRecallSql: String = s"""
    WITH e AS (
      SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM e q JOIN e c ON q.vec_id % $PqQueryMod = 0
        AND c.vec_id != q.vec_id AND c.label = q.label),
    ranked AS (
      SELECT q_id, n_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      FROM scored)
    SELECT cast(count(*) AS BIGINT) AS n_brute, cast(1 AS BIGINT) AS recall_ok
    FROM ranked WHERE rk <= $PqK"""

  private val annRecallSql: String = """
    WITH e AS (
      SELECT vec_id, cast(embedding AS DOUBLE[]) AS v,
        sqrt(list_inner_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM e q JOIN e c ON q.vec_id % 50 = 0 AND c.vec_id != q.vec_id),
    ranked AS (
      SELECT q_id, n_id,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
      FROM scored)
    SELECT cast(count(*) AS BIGINT) AS n_brute, cast(1 AS BIGINT) AS recall_ok
    FROM ranked WHERE rk <= 5"""

  val knnLshRecallSql: String = annRecallSql
  val knnIvfRecallSql: String = annRecallSql

  /** Tolerance-oracle recall for MinHash-LSH near-dup detection over the
    * RARE-GRAM universe: both the truth set and the MinHash run drop
    * grams appearing in > 20 docs (`capGramDocFreq`, mirrored as a
    * QUALIFY in the oracle), so the sparse pair join is never quadratic
    * in a boilerplate gram — the same scale guard `dedup_ngram` uses,
    * and the config you'd run at 100 TB. Found pairs are exact-Jaccard
    * verified on the identical capped universe, so found ⊆ truth and
    * recall = |found| / |truth| is deterministic (xxhash64 signatures
    * are seed-fixed). Oracle: exact truth count + literal flag. Truth is
    * built with the grouped-intersection shape (one pair join straight
    * into the aggregate — no candidate materialization + re-join).
    */
  /** Materialized rare-gram (docFreq ≤ 20) exploded gram frame plus the
    * exact truth pairs (Jaccard ≥ 0.5 on that universe) — shared by both
    * near-dup recall audits.
    *
    * Truth uses the GROUPED-INTERSECTION shape, not a gram-frame
    * self-join: collect the (≤ maxDocFreq) doc ids per gram and expand
    * ordered pairs ROW-LOCALLY via two codegen'd explodes — one
    * aggregation exchange in, one out, vs. the self-join's two exchanges
    * + SMJ sorts + two more for the same pair counts (A/B'd at sf0.1:
    * 2.1 s → 0.1 s). Fan-out is bounded by the doc-freq cap (≤ C(20,2)
    * rows per gram), so the shape holds at corpus scale. The tiny
    * verified pair set is MATERIALIZED because recall audits reference
    * it twice (semi-join probe + denominator count) — unmaterialized,
    * the whole truth build would replay per reference.
    */
  private[graft] def raregramTruth(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val grams = raregramGrams(spark, dir)
    (grams, raregramTruthFrom(grams))
  }

  /** The capped rare-gram frame, materialized. Split from
    * [[raregramTruth]] so audits can overlap the truth build with their
    * detection pipeline ([[Materialize.par2]], guide §2.6).
    */
  private def raregramGrams(spark: SparkSession, dir: String): DataFrame = {
    // raw gram frame materialized FIRST: capGramDocFreq reads its input
    // twice (hot-count aggregate + anti-join), and an unmaterialized
    // input re-runs the whole gram build per read (the dedup_ngram
    // rationale). A/B at sf0.1 is a wash (checkpoint write ≈ rebuild at
    // this size); the point is the 100× regime, where recomputing the
    // tokenize+hash pass over the full text twice dominates one linear
    // gram-frame write
    val raw = Materialize(Dedup.explodedNgrams(docs(spark, dir), "doc_id", "text"))
    Materialize(Dedup.capGramDocFreq(raw, maxDocFreq = 20))
  }

  /** Exact rare-gram J ≥ 0.5 truth pairs over a capped gram frame —
    * the second half of [[raregramTruth]].
    */
  private def raregramTruthFrom(grams: DataFrame): DataFrame = {
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).cast("double").as("n"))
    val na = sizes.select(col("id").as("na_id"), col("n").as("na_n"))
    val nb = sizes.select(col("id").as("nb_id"), col("n").as("nb_n"))
    val byGram = grams.groupBy("gh").agg(collect_set(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
    Materialize(byGram
      .select(col("ids"), explode(col("ids")).as("a_id"))
      .select(col("a_id"), explode(col("ids")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).cast("double").as("inter"))
      .join(na, col("a_id") === col("na_id"))
      .join(nb, col("b_id") === col("nb_id"))
      .filter(col("inter") / (col("na_n") + col("nb_n") - col("inter")) >= 0.5)
      .select(col("a_id"), col("b_id")))
  }

  private def recallRow(truth: DataFrame, found: DataFrame, minPct: Int): DataFrame = {
    val hits = truth.join(found, Seq("a_id", "b_id"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("n_true").cast("long").as("n_true"),
        (col("n_hit") * 100 >= col("n_true") * minPct).cast("long").as("recall_ok"))
  }

  private def precisionRow(truth: DataFrame, found: DataFrame, minPct: Int): DataFrame =
    // found is referenced twice (semi-join probe + n_found count); the
    // callers pass full detection pipelines, so materialize the tiny
    // verified pair set instead of replaying the pipeline tail per use
    precisionRowOn(truth, Materialize(found), minPct)

  /** [[precisionRow]] over an ALREADY-materialized found set — the
    * entry for callers that materialize it on a [[Materialize.par2]]
    * thread so the truth chain overlaps the detection pipeline.
    */
  private def precisionRowOn(truth: DataFrame, foundM: DataFrame,
                             minPct: Int): DataFrame = {
    val hits = foundM.join(truth, Seq("a_id", "b_id"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(foundM.agg(count(lit(1)).as("n_found")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("n_true").cast("long").as("n_true"),
        (col("n_hit") * 100 >= col("n_found") * minPct).cast("long").as("precision_ok"))
  }

  /** Floor 80: measured 100% at ALL three SFs (RecallSweep pair-recall
    * section) — at J ≥ 0.5 the banded signature essentially cannot miss
    * on this corpus; the 20pp slack absorbs a future corpus
    * regeneration, not expected variance.
    */
  def minhashRecall(spark: SparkSession, dir: String): DataFrame = {
    val grams = raregramGrams(spark, dir)
    // truth and detection both read the MATERIALIZED gram frame and are
    // otherwise independent — their blocking chains (truth pair build vs
    // banded-signature checkpoint) overlap on two driver threads
    // (guide §2.6); each chain computes exactly what it computed serially
    val (truth, found) = Materialize.par2(
      raregramTruthFrom(grams),
      Dedup.minhashNearDupsFromGrams(grams, threshold = 0.5)
        .select(col("a_id"), col("b_id")))
    recallRow(truth, found, minPct = 80)
  }

  /** SimHash recall against the same rare-gram Jaccard truth set. Unlike
    * MinHash, SimHash-found pairs are NOT Jaccard-verified (hamming ≤
    * [[SimhashMaxHamming]] on the 64-bit sketch is the accept rule), so
    * this measures the sketch's agreement with set-overlap truth:
    * 64.3/44/59% at sf0.001/0.01/0.1 at h ≤ 2 (full curve at
    * [[SimhashMaxHamming]]), bounded at ≥ 40%. The sf0.01 margin is the
    * thinnest (4pp) — the price of the h ≤ 2 precision fix; the curve
    * is committed so a corpus regeneration has a measured baseline. All
    * inputs are xxhash64-seed-fixed — the flag is a constant per SF.
    */
  def simhashRecall(spark: SparkSession, dir: String): DataFrame = {
    // truth chain (raw grams → cap → pair build, three checkpoints) and
    // the simhash pipeline (signature checkpoint) share only the doc
    // scan — overlapped on two driver threads (guide §2.6)
    val (truth, found) = Materialize.par2(
      raregramTruth(spark, dir)._2,
      Dedup.simhashNearDups(docs(spark, dir), "doc_id", "text",
          maxHamming = SimhashMaxHamming)
        .select(col("a_id"), col("b_id")))
    recallRow(truth, found, minPct = 40)
  }

  /** Precision companion to [[simhashRecall]]: the share of simhash-
    * REPORTED pairs that the rare-gram J ≥ 0.5 truth confirms. MinHash
    * has no precision question (its pairs are exact-Jaccard-verified);
    * SimHash admits on sketch Hamming distance alone, so its pair set
    * genuinely over-reaches set-overlap truth — measured 100 / 91.7 /
    * 74.8 % at sf0.001/0.01/0.1 at the shipped h ≤ 2 point (the round-9
    * h ≤ 3 point measured 36% at sf0.1; full curve at
    * [[SimhashMaxHamming]]). Floor 60 sits ≥ 14.8pp under every
    * measurement; `n_true` rides along as the exact oracle-checked
    * quantity, the audit-row contract used by every recall query.
    */
  def simhashPrecision(spark: SparkSession, dir: String): DataFrame = {
    // same overlap as simhashRecall; the found side is materialized
    // inside the background thunk (precisionRow reads it twice)
    val (truth, foundM) = Materialize.par2(
      raregramTruth(spark, dir)._2,
      Materialize(Dedup.simhashNearDups(docs(spark, dir), "doc_id", "text",
          maxHamming = SimhashMaxHamming)
        .select(col("a_id"), col("b_id"))))
    precisionRowOn(truth, foundM, minPct = 60)
  }

  private val minhashRecallSqlBase: String = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS g
      FROM toks, unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)),
    kept AS (
      SELECT doc_id, g FROM grams
      QUALIFY count(*) OVER (PARTITION BY g) <= 20),
    sizes AS (
      SELECT doc_id, cast(count(*) AS DOUBLE) AS n FROM kept GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, cast(count(*) AS DOUBLE) AS i
      FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT cast(count(*) AS BIGINT) AS n_true, cast(1 AS BIGINT) AS recall_ok
    FROM inter
    JOIN sizes na ON inter.a_id = na.doc_id
    JOIN sizes nb ON inter.b_id = nb.doc_id
    WHERE i / (na.n + nb.n - i) >= 0.5"""

  val minhashRecallSql: String = minhashRecallSqlBase
  // same truth set, same exact count — only the Spark-side flag differs
  val simhashRecallSql: String = minhashRecallSqlBase
  val simhashPrecisionSql: String =
    minhashRecallSqlBase.replace("AS recall_ok", "AS precision_ok")

  // ----------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_minhash_md5" -> (dedupMinhashMd5 _),
    "dedup_ledger_build" -> (dedupLedgerBuild _),
    "dedup_ledger_probe" -> (dedupLedgerProbe _),
    "dedup_ledger_stats" -> (dedupLedgerStats _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_ngram"   -> (dedupNgram _),
    "dedup_sweep"   -> (dedupSweep _),
    "novelty_rate"  -> (noveltyRate _),
    "knn_brute"     -> (knnBrute _),
    "knn_lsh"       -> (knnLsh _),
    "knn_ivf"       -> (knnIvf _),
    "knn_ivf_hi"    -> (knnIvfHi _),
    "knn_pq"        -> (knnPq _),
    "knn_pq_recall" -> (knnPqRecall _),
    "knn_ivfpq"     -> (knnIvfPq _),
    "knn_ivfpq_recall" -> (knnIvfPqRecall _),
    "ann_index_build"  -> (annIndexBuild _),
    "ann_index_search" -> (annIndexSearch _),
    "ann_index_health" -> (annIndexHealth _),
    "ann_index_stats"  -> (annIndexStats _),
    "knn_filtered"     -> (knnFiltered _),
    "knn_filtered_recall" -> (knnFilteredRecall _),
    "ann_range"        -> (annRange _),
    "ann_range_recall" -> (annRangeRecall _),
    "ann_range_filtered" -> (annRangeFiltered _),
    "ann_range_filtered_recall" -> (annRangeFilteredRecall _),
    "decon_semantic"   -> (deconSemantic _),
    "linear_probe"       -> (linearProbe _),
    "linear_probe_score" -> (linearProbeScore _),
    "probe_calibration"  -> (probeCalibration _),
    "probe_auc"          -> (probeAuc _),
    "probe_pr_curve"     -> (probePrCurve _),
    "text_probe"         -> (textProbe _),
    "text_probe_eval"    -> (textProbeEval _),
    "emb_pca"        -> (embPca _),
    "emb_pca_power"  -> (embPcaPower _),
    "emb_pca_project" -> (embPcaProject _),
    "emb_pca2"       -> (embPca2 _),
    "emb_pca_map"    -> (embPcaMap _),
    "emb_whiten"       -> (embWhiten _),
    "emb_whiten_check" -> (embWhitenCheck _),
    "emb_whiten_full_check" -> (embWhitenFullCheck _),
    "emb_jl_project"   -> (embJlProject _),
    "emb_jl_check"     -> (embJlCheck _),
    "emb_outliers"     -> (embOutliers _),
    "label_scatter_pc1"   -> (labelScatterPc1 _),
    "label_scatter_power" -> (labelScatterPower _),
    "label_scatter_project" -> (labelScatterProject _),
    "label_scatter_contrib" -> (labelScatterContrib _),
    "coreset_kcenter"     -> (coresetKcenter _),
    "coreset_cover"       -> (coresetCover _),
    "sem_dedup"     -> (semDedup _),
    "kmeans_quality" -> (kmeansQuality _),
    "emb_pq"         -> (embPq _),
    "fingerprint_winnow" -> (fingerprintWinnow _),
    "multimodal_join" -> (multimodalJoin _),
    "audio_neardup"   -> (audioNearDup _),
    "audio_neardup_recall" -> (audioNearDupRecall _),
    "audio_cover"          -> (audioCover _),
    "audio_cover_recall"   -> (audioCoverRecall _),
    "audio_neardup_groups" -> (audioNearDupGroups _),
    "audio_neardup_groups_recall" -> (audioNearDupGroupsRecall _),
    "audio_neardup_precision" -> (audioNearDupPrecision _),
    "image_neardup"   -> (imageNearDup _),
    "image_neardup_recall" -> (imageNearDupRecall _),
    "image_neardup_groups" -> (imageNearDupGroups _),
    "image_neardup_groups_recall" -> (imageNearDupGroupsRecall _),
    "video_neardup"   -> (videoNearDup _),
    "video_neardup_recall" -> (videoNearDupRecall _),
    "video_neardup_groups" -> (videoNearDupGroups _),
    "video_neardup_groups_recall" -> (videoNearDupGroupsRecall _),
    "emb_near_dup"  -> (embNearDup _),
    "emb_quantize"  -> (embQuantize _),
    "emb_normalize" -> (embNormalize _),
    "cluster_purity" -> (clusterPurity _),
    "zorder_buckets" -> (zorderBuckets _),
    "emb_project"   -> (embProject _),
    "label_centroids" -> (labelCentroids _),
    "knn_lsh_recall" -> (knnLshRecall _),
    "knn_ivf_recall" -> (knnIvfRecall _),
    "knn_ivf_hi_recall" -> (knnIvfHiRecall _),
    "minhash_recall" -> (minhashRecall _),
    "simhash_recall" -> (simhashRecall _),
    "simhash_precision" -> (simhashPrecision _))

  val oracle: Map[String, String] = Map(
    "dedup_minhash_md5" -> dedupMinhashMd5Sql,
    "dedup_ledger_build" -> dedupLedgerBuildSql,
    "dedup_ledger_probe" -> dedupLedgerProbeSql,
    "dedup_ledger_stats" -> dedupLedgerStatsSql,
    "dedup_ngram"  -> dedupNgramSql,
    "dedup_sweep"  -> dedupSweepSql,
    "novelty_rate" -> noveltyRateSql,
    "fingerprint_winnow" -> fingerprintWinnowSql,
    "multimodal_join" -> multimodalJoinSql,
    "audio_neardup_recall" -> audioNearDupRecallSql,
    "audio_cover_recall"   -> audioCoverRecallSql,
    "audio_neardup_groups_recall" -> audioNearDupGroupsRecallSql,
    "audio_neardup_precision" -> audioNearDupPrecisionSql,
    "image_neardup_recall" -> imageNearDupRecallSql,
    "image_neardup_groups_recall" -> imageNearDupGroupsRecallSql,
    "video_neardup_recall" -> videoNearDupRecallSql,
    "video_neardup_groups_recall" -> videoNearDupGroupsRecallSql,
    "knn_brute"    -> knnBruteSql,
    "emb_near_dup" -> embNearDupSql,
    "emb_quantize" -> embQuantizeSql,
    "emb_normalize" -> embNormalizeSql,
    "cluster_purity" -> clusterPuritySql,
    "zorder_buckets" -> zorderBucketsSql,
    "emb_project"   -> embProjectSql,
    "label_centroids" -> labelCentroidsSql,
    "knn_lsh_recall" -> knnLshRecallSql,
    "knn_ivf"       -> knnIvfSql,
    "knn_ivf_hi"    -> knnIvfHiSql,
    "knn_pq"        -> knnPqSql,
    "knn_ivfpq"     -> knnIvfPqSql,
    "ann_index_build"  -> annIndexBuildSql,
    "ann_index_search" -> annIndexSearchSql,
    "ann_index_health" -> annIndexHealthSql,
    "ann_index_stats"  -> annIndexStatsSql,
    "knn_filtered"     -> knnFilteredSql,
    "knn_filtered_recall" -> knnFilteredRecallSql,
    "ann_range_recall" -> annRangeRecallSql,
    "ann_range_filtered_recall" -> annRangeFilteredRecallSql,
    "decon_semantic"   -> deconSemanticSql,
    "linear_probe"       -> linearProbeSql,
    "linear_probe_score" -> linearProbeScoreSql,
    "probe_calibration"  -> probeCalibrationSql,
    "probe_auc"          -> probeAucSql,
    "probe_pr_curve"     -> probePrCurveSql,
    "text_probe"         -> textProbeSql,
    "text_probe_eval"    -> textProbeEvalSql,
    "emb_pca"        -> embPcaSql,
    "emb_pca_power"  -> embPcaPowerSql,
    "emb_pca_project" -> embPcaProjectSql,
    "emb_pca2"       -> embPca2Sql,
    "emb_pca_map"    -> embPcaMapSql,
    "emb_whiten"       -> embWhitenSql,
    "emb_whiten_check" -> embWhitenCheckSql,
    "emb_whiten_full_check" -> embWhitenFullCheckSql,
    "emb_jl_project"   -> embJlProjectSql,
    "emb_jl_check"     -> embJlCheckSql,
    "emb_outliers"     -> embOutliersSql,
    "label_scatter_pc1"   -> labelScatterPc1Sql,
    "label_scatter_power" -> labelScatterPowerSql,
    "label_scatter_project" -> labelScatterProjectSql,
    "label_scatter_contrib" -> labelScatterContribSql,
    "coreset_kcenter"     -> coresetKcenterSql,
    "coreset_cover"       -> coresetCoverSql,
    "knn_ivf_recall" -> knnIvfRecallSql,
    "knn_ivf_hi_recall" -> knnIvfRecallSql,
    "knn_pq_recall" -> knnIvfRecallSql,
    "knn_ivfpq_recall" -> knnIvfRecallSql,
    "sem_dedup"     -> semDedupSql,
    "kmeans_quality" -> kmeansQualitySql,
    "emb_pq"         -> embPqSql,
    "minhash_recall" -> minhashRecallSql,
    "simhash_recall" -> simhashRecallSql,
    "simhash_precision" -> simhashPrecisionSql)
}
