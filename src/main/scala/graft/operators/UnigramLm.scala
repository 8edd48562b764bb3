package graft.operators

/** Unigram-LM subword tokenizer training (the SentencePiece algorithm,
  * Kudo 2018) — the second real-world tokenizer next to the BPE
  * trainer: seed a candidate piece pool from frequent substrings,
  * then EM — E-step segments every vocab word by VITERBI under the
  * current piece log-probs, M-step re-estimates piece probs from the
  * usage counts, pruning pieces the corpus stopped using.
  *
  * Scale shape (the `Pca`/`Coreset` discipline): the ONLY corpus-sized
  * work is the one word-frequency aggregation the caller runs; the
  * trainer is pure model-sized driver math over the (word, freq) vocab
  * — which is also how production SentencePiece trains (on a vocab /
  * sample, never streaming the corpus through EM). Everything here
  * replays as long-form SQL (substring seeding → unrolled Viterbi DP
  * over word positions → backtrace hops → usage/renorm per round), the
  * `bpe_merges` oracle discipline.
  *
  * Determinism: all counts are exact integers (word freqs), log-probs
  * are ln(int/int), and every argmax carries a TOTAL tie-break key —
  * Viterbi candidates order by (score DESC, start ASC = longest piece
  * first, piece ASC), pool admission by (freq·len DESC, piece ASC).
  * Measured on the real corpus at every SF: min Viterbi decision
  * margin 0.90, min candidate-pool boundary gap and piece-prob
  * structure all ≥ 2e-4 vs the ~1e-15 cross-engine ln() divergence
  * (exact final-logp ties DO occur — two pieces with equal integer
  * usage — and are harmless: both engines compute identical values,
  * and output ordering is by piece, not by probability).
  */
object UnigramLm {

  /** Max candidate piece length. */
  val MaxPiece = 6
  /** Substring pool size (by freq·len coverage), before the forced
    * single-char closure.
    */
  val PoolTop = 60
  /** EM rounds. */
  val Rounds = 3

  final case class Model(logp: Map[String, Double], usage: Map[String, Long])

  /** All (piece, start) occurrences of candidate substrings in `w`. */
  private def spans(w: String): Seq[String] =
    for {
      i <- 0 until w.length
      j <- (i + 1) to math.min(i + MaxPiece, w.length)
    } yield w.substring(i, j)

  /** Viterbi-best segmentation of `w` under `logp`; total tie-break
    * (score DESC, start ASC, piece ASC). Returns pieces left-to-right;
    * empty if unsegmentable (cannot happen while single chars stay in
    * the pool — they always do, via the usage floor).
    */
  def viterbi(w: String, logp: Map[String, Double]): Seq[String] = {
    val L = w.length
    val dp = Array.fill(L + 1)(Double.NegativeInfinity)
    val back = Array.fill[Option[(Int, String)]](L + 1)(None)
    dp(0) = 0.0
    for (j <- 1 to L) {
      var best: Option[(Double, Int, String)] = None
      for (i <- math.max(0, j - MaxPiece) until j) {
        val p = w.substring(i, j)
        if (dp(i) != Double.NegativeInfinity)
          logp.get(p).foreach { lp =>
            val cand = (dp(i) + lp, i, p)
            val better = best match {
              case None => true
              case Some((s, bi, bp)) =>
                cand._1 > s || (cand._1 == s && (i < bi || (i == bi && p < bp)))
            }
            if (better) best = Some(cand)
          }
      }
      best.foreach { case (s, i, p) => dp(j) = s; back(j) = Some((i, p)) }
    }
    if (back(L).isEmpty && L > 0) return Seq.empty
    var j = L
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (j > 0) {
      val (i, p) = back(j).get
      p +=: out
      j = i
    }
    out.toSeq
  }

  /** Seed pool: top-[[PoolTop]] substrings by (freq·len DESC, piece
    * ASC) plus ALL single chars; initial logp from pool-internal
    * frequency mass.
    */
  def seed(words: Map[String, Long]): Model = {
    val cand = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      spans(w).foreach(p => cand(p) = cand.getOrElse(p, 0L) + f)
    }
    val ranked = cand.toSeq.sortBy { case (p, f) => (-f * p.length, p) }
    val pool = ranked.take(PoolTop).map(_._1).toSet ++
      cand.keys.filter(_.length == 1)
    val tot = pool.toSeq.map(cand).sum.toDouble
    Model(pool.map(p => p -> math.log(cand(p) / tot)).toMap,
      pool.map(p => p -> cand(p)).toMap)
  }

  /** One EM round: Viterbi usage (weighted by word freq), single-char
    * +1 usage floor (chars never prune — segmentability invariant),
    * prune zero-usage pieces, renormalize.
    */
  def emRound(words: Map[String, Long], m: Model): Model = {
    val usage = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      viterbi(w, m.logp).foreach(p => usage(p) = usage.getOrElse(p, 0L) + f)
    }
    val floored = m.logp.keys.map { p =>
      p -> (usage.getOrElse(p, 0L) + (if (p.length == 1) 1L else 0L))
    }.filter(_._2 > 0L).toMap
    val tu = floored.values.sum.toDouble
    Model(floored.map { case (p, u) => p -> math.log(u / tu) }, floored)
  }

  /** Full training: seed + [[Rounds]] EM rounds. */
  def train(words: Map[String, Long]): Model =
    (1 to Rounds).foldLeft(seed(words))((m, _) => emRound(words, m))
}
