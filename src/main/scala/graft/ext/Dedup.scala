package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Deduplication operators for large-scale text corpora (BASELINE.json
 * north-star extensions; SURVEY.md §2.3 E17-E18).
 *
 * Scale design: every stage is a pure column pipeline (codegen-friendly,
 * no UDFs) followed by key-partitioned shuffles. The pairwise work is never
 * all-pairs: exact Jaccard joins on shared shingles, MinHash joins on LSH
 * band buckets, SimHash joins on 8-bit chunks — so at 100 TB the shuffle
 * keys stay selective and the candidate set stays near-linear in the
 * number of true duplicates.
 */
object Dedup {

  /** Exact full-row / keyed distinct (E17). */
  def exactDistinct(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** Keyed dedup with deterministic survivor: keep first by `order` within
    * each key group (E17) — `dropDuplicates` picks an arbitrary row;
    * a ranked window makes the survivor reproducible. */
  def keepFirstByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---- shingling ---------------------------------------------------------

  /** Distinct word n-gram shingles per document: (idCol, shingle).
    * Pure array ops (split → transform over an index sequence → explode) —
    * stays inside whole-stage codegen, no window, no UDF. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // tokenize into a NAMED column first: a split subtree captured inside
    // the transform lambda would re-tokenize the document per shingle
    // position (O(len²) per doc — the q_text_ngrams lesson, measured 25×).
    // CollapseProject keeps the boundary because `toks` is referenced from
    // several places.
    val toks = col("__toks")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array())
    df.select(col(idCol), split(lower(col(textCol)), " ").as("__toks"))
      .select(col(idCol), explode(array_distinct(grams)).as("shingle"))
  }

  /** Exact pairwise Jaccard over shingle sets, joined on shared shingles
    * (selective at scale: a pair is compared only if it shares ≥1 shingle).
    * Shingles are 64-bit-hashed before the self-join — the shuffle carries
    * 8-byte keys instead of strings and the equi-compare is a long compare
    * (collision probability ~n²/2^65: negligible).
    * Output: (d1, d2, jaccard) for jaccard ≥ threshold, d1 < d2. */
  /** The 64-bit-hashed shingle frame (idCol, shash) every pairwise operator
    * reuses. Exposed so callers who run several dedup passes over one corpus
    * can persist it themselves (or materialize it to a zone table — the form
    * that survives 100 TB). The pairwise operators below persist it through
    * [[graft.ops.BoundedCache]]: scanned 3× per query, shared across repeat
    * invocations by plan equality, LRU-bounded so a long-lived session never
    * accumulates unowned cache entries. */
  def hashedShingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    shingles(docs, idCol, textCol, n)
      .select(col(idCol), xxhash64(col("shingle")).as("shash"))

  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = graft.ops.BoundedCache.cached(hashedShingles(docs, idCol, textCol, n))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    // rename the key on one side: both frames project the SAME cached
    // plan, so a bare shash === shash would resolve to one attribute
    // (Spark's self-join disambiguation rescues it, with a warning)
    val a = sh.select(col(idCol).as("d1"), col("shash").as("s1"))
    val b = sh.select(col(idCol).as("d2"), col("shash").as("s2"))
    val inter = a.join(b, col("s1") === col("s2") && col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col(idCol).as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col(idCol).as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jaccard",
        col("i").cast(DoubleType) / (col("sz1") + col("sz2") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /**
   * Exact-threshold Jaccard similarity join via PREFIX FILTERING — the
   * AllPairs/PPJoin family (Bayardo et al. WWW'07, Xiao et al. WWW'08):
   * the third dedup scale path beside the full inverted-index join
   * ([[jaccardPairs]]) and probabilistic LSH ([[minhashNearDupPairs]]),
   * and the only one that is BOTH exact and sub-inverted-index.
   *
   * Under any fixed global token order, two sets with J ≥ t must share a
   * token within their first `sz − ⌈t·sz⌉ + 1` tokens — so only that
   * prefix is indexed. With rarest-first order (document frequency asc)
   * the indexed tokens are also the most selective ones, so at 100 TB the
   * candidate join shuffles ≈ (1−t) of the token volume on keys whose
   * posting lists are the corpus's SHORTEST — where jaccardPairs shuffles
   * every token and pays Σ df² on the most common ones. A size filter
   * (J ≥ t ⟹ t·max ≤ min) prunes candidates before verification, and
   * verification computes exact Jaccard from per-document sorted shingle
   * sets (cost ∝ candidates × doc length). No global rank table is ever
   * materialized: the order is realized as a per-document window.
   *
   * The ⌈t·sz⌉ terms subtract a 1e-9 guard before ceil: if IEEE rounds
   * t·sz one ulp above an exact integer, the un-guarded prefix would be
   * one token too short (can MISS pairs) — the guard errs toward a
   * longer prefix / looser size filter, which only adds candidates that
   * exact verification then rejects.
   *
   * Output: (d1, d2, jaccard), d1 < d2, jaccard ≥ threshold — identical
   * to [[jaccardPairs]]; the shared oracle proves the filter loses
   * nothing.
   */
  def prefixFilterPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = graft.ops.BoundedCache.cached(hashedShingles(docs, idCol, textCol, n))
    val dfTok = sh.groupBy("shash").agg(count(lit(1)).as("__df"))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__df"), col("shash"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__sz"))
    val prefix = sh.join(dfTok, "shash")
      .withColumn("__pos", row_number().over(wDoc))
      .join(sizes, idCol)
      .filter(col("__pos") <=
        col("__sz") - ceil(lit(threshold) * col("__sz") - lit(1e-9)) + 1)
    val a = prefix.select(col(idCol).as("d1"), col("shash").as("s1h"), col("__sz").as("sz1"))
    val b = prefix.select(col(idCol).as("d2"), col("shash").as("s2h"), col("__sz").as("sz2"))
    val cand = a.join(b, col("s1h") === col("s2h") && col("d1") < col("d2")
        && least(col("sz1"), col("sz2")) >=
          ceil(lit(threshold) * greatest(col("sz1"), col("sz2")) - lit(1e-9)))
      .select("d1", "d2").distinct()
    val sets = sh.groupBy(col(idCol))
      .agg(collect_set(col("shash")).as("__set"), count(lit(1)).as("__n"))
    cand
      .join(sets.select(col(idCol).as("d1"), col("__set").as("s1"), col("__n").as("n1")), "d1")
      .join(sets.select(col(idCol).as("d2"), col("__set").as("s2"), col("__n").as("n2")), "d2")
      .withColumn("i", size(array_intersect(col("s1"), col("s2"))).cast(LongType))
      .withColumn("jaccard",
        col("i").cast(DoubleType) / (col("n1") + col("n2") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /**
   * Per-document duplicated-shingle fraction: of a document's distinct
   * shingles, the share that appear in at least `minDocs` documents — the
   * corpus-level duplication signal (RefinedWeb/Gopher-style) that ranks
   * HOW duplicated each document is, where the pairwise operators only
   * say WHETHER two documents collide. Documents with fewer than n tokens
   * have no shingles and are absent from the output.
   *
   * Scale shape: one document-frequency aggregate over hashed shingles,
   * one join back, one per-document aggregate — all equi-key shuffles on
   * the 8-byte shingle hash; nothing pairwise, nothing windowed.
   */
  def dupFraction(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minDocs: Int = 2): DataFrame = {
    val sh = graft.ops.BoundedCache.cached(hashedShingles(docs, idCol, textCol, n))
    val docFreq = sh.groupBy("shash").agg(count(lit(1)).as("__df"))
    sh.join(docFreq, "shash")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= minDocs, 1L).otherwise(0L)).as("__dup"))
      .withColumn("dup_frac", col("__dup").cast(DoubleType) / col("n_shingles"))
      .drop("__dup")
  }

  // ---- MinHash + banded LSH ---------------------------------------------

  /** Universal-hash family h_i(x) = (a_i*x + b_i) mod p over a 31-bit base
    * hash — all arithmetic stays within Long range (no ANSI overflow) and
    * all coefficients derive from `seed`, so signatures are deterministic
    * across runs and cluster sizes.
    *
    * p MUST be comparable to the 31-bit input domain: with a large p
    * (e.g. 2^61-1) the product a*x never wraps the modulus, h_i is
    * monotonic in x, every "independent" hash picks the same minimum
    * element, and the minhash property silently collapses (pairs agree
    * on all hashes or none). With p = 2^31-1 the product wraps ~2^31
    * times and the family mixes properly. */
  private val MersennePrime = (1L << 31) - 1

  private def hashCoefficients(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature per document: (idCol, mh_0 .. mh_{k-1}).
    * One explode + one hash-aggregate; the k min() aggregates stay in
    * whole-stage codegen over primitive columns and combine map-side, so
    * the shuffle carries one row per document. (A typed-Aggregator
    * variant exists in MinHashAggregator — measured no faster at k=64
    * because ObjectHashAggregate forfeits codegen; kept as the escape
    * hatch for much larger k.) */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, seed: Long = 42L): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
      // 31-bit non-negative base hash of the shingle
      .withColumn("h", hash(col("shingle")).cast(LongType).bitwiseAND(lit(0x7fffffffL)))
    val mins = hashCoefficients(numHashes, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MersennePrime))).as(s"mh_$i")
    }
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** Aggregator-based variant of minhashSignatures: identical math, one
    * buffer instead of k aggregate slots — (idCol, sig array<long>). */
  def minhashSignaturesAgg(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, seed: Long = 42L): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
      .withColumn("h", hash(col("shingle")).cast(LongType).bitwiseAND(lit(0x7fffffffL)))
    val coef = hashCoefficients(numHashes, seed)
    val agg = udaf(
      new MinHashAggregator(coef.map(_._1).toArray, coef.map(_._2).toArray, MersennePrime),
      org.apache.spark.sql.Encoders.scalaLong)
    sh.groupBy(col(idCol)).agg(agg(col("h")).as("sig"))
  }

  /** Banded LSH candidate pairs from signatures: split k hashes into
    * `bands` bands, bucket-join on (band, hash(band slice)). */
  def lshCandidatePairs(signatures: DataFrame, idCol: String,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandHashes = (0 until bands).map { bIdx =>
      val slice = (0 until rowsPerBand).map(r => col(s"mh_${bIdx * rowsPerBand + r}"))
      hash(slice: _*)
    }
    val buckets = signatures
      .select(col(idCol), posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")))
    val l = buckets.select(col(idCol).as("d1"), col("band"), col("bucket"))
    val r = buckets.select(col(idCol).as("d2"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
  }

  /** MinHash+LSH near-dup pairs, candidates verified with exact Jaccard —
    * the classic shingle→minhash→band→bucket-join→verify pipeline. With
    * 21 bands × 3 rows the detection probability at jaccard 0.8 is
    * 1-(1-0.8³)²¹ ≈ 1-3e-7 (borderline-threshold pairs exist in real
    * corpora, so the miss rate must be negligible, not merely small);
    * shorter bands admit more false candidates, but the exact-Jaccard
    * verify step removes all of them, so output still matches the exact
    * operator while candidate work stays proportional to collisions. */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 21,
      threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    // ONE shingle pass feeds both the signature aggregation and the
    // exact-Jaccard verification join — persisted via BoundedCache (scanned
    // 4×; plan-deduped across invocations, LRU-bounded, no unowned leak)
    val sh = graft.ops.BoundedCache.cached(
      shingles(docs, idCol, textCol, n)
        .select(col(idCol), xxhash64(col("shingle")).as("shash"),
          hash(col("shingle")).cast(LongType).bitwiseAND(lit(0x7fffffffL)).as("h")))
    val mins = hashCoefficients(numHashes, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MersennePrime))).as(s"mh_$i")
    }
    val sigs = sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
    val cands = lshCandidatePairs(sigs, idCol, numHashes, bands)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("d1"), col("shash").as("s1"))
    val b = sh.select(col(idCol).as("d2b"), col("shash").as("s2"))
    val inter = cands.join(a, "d1")
      .join(b, col("d2") === col("d2b") && col("s1") === col("s2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col(idCol).as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col(idCol).as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jaccard",
        col("i").cast(DoubleType) / (col("sz1") + col("sz2") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  // ---- cluster assignment ------------------------------------------------

  /**
   * Connected components over a near-dup pair list: every document in a
   * transitively-connected group gets the group's minimum id as
   * `cluster_id` — the canonical-survivor assignment step that turns
   * pairwise dedup output into "keep one per cluster".
   *
   * Iterative min-label propagation: each round every vertex adopts the
   * smallest label among itself and its neighbors; converges in
   * O(component diameter) rounds. Each round is one join + one aggregate
   * (both key-partitioned), and the label frame is localCheckpoint'd so
   * the plan doesn't grow with iterations. Near-dup components are
   * overwhelmingly small and shallow (dup clusters, not social graphs), so
   * diameter stays tiny at corpus scale; a two-phase large-star/small-star
   * variant is the drop-in upgrade if ever faced with adversarial chains.
   *
   * Input: (d1, d2) pairs. Output: (doc_id, cluster_id), one row per
   * distinct document appearing in any pair.
   */
  def clusterAssignments(pairs: DataFrame, d1: String = "d1", d2: String = "d2",
      maxIterations: Int = 64): DataFrame = {
    // materialize the edge list ONCE — it is consumed every propagation
    // round, and without this the (possibly expensive) pair-generation
    // pipeline upstream would re-execute per iteration
    val edges = pairs.select(col(d1).as("src"), col(d2).as("dst"))
      .union(pairs.select(col(d2).as("src"), col(d1).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    // per-round label snapshots are lazy local checkpoints; their storage
    // blocks live until the frames become unreachable after this method
    // returns, at which point the ContextCleaner reclaims them (explicit
    // early eviction is unsafe: a lazily checkpointed snapshot may still
    // back a recompute of its successor)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "nl"), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(false)
      // full count (no limit-short-circuit) so this action materializes
      // EVERY partition of the lazy checkpoint in one pass
      val changed = updated.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    // silent non-convergence would return a component split across several
    // cluster ids — wrong answers are worse than failing loudly
    if (!converged) throw new IllegalStateException(
      s"clusterAssignments did not converge in $maxIterations rounds — " +
        "a component's diameter exceeds the cap; raise maxIterations")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /**
   * Cross-corpus (incremental) near-dup detection: which documents of a
   * NEW batch duplicate a document of the EXISTING corpus — the shape an
   * append-only training pipeline runs every ingest. Same selective
   * shared-shingle join as [[jaccardPairs]], but across two frames, so
   * cost scales with the new batch, not the corpus². Output:
   * (new_id, corpus_id, jaccard).
   */
  def jaccardAgainstCorpus(newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // each side is scanned twice (sizes + intersection join)
    val shNew = graft.ops.BoundedCache.cached(hashedShingles(newDocs, idCol, textCol, n))
    val shOld = graft.ops.BoundedCache.cached(hashedShingles(corpus, idCol, textCol, n))
    val sizesNew = shNew.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val sizesOld = shOld.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = shNew.select(col(idCol).as("new_id"), col("shash"))
      .join(shOld.select(col(idCol).as("corpus_id"), col("shash")), "shash")
      .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("i"))
    inter
      .join(sizesNew.select(col(idCol).as("new_id"), col("sz").as("sz1")), "new_id")
      .join(sizesOld.select(col(idCol).as("corpus_id"), col("sz").as("sz2")), "corpus_id")
      .withColumn("jaccard",
        col("i").cast(DoubleType) / (col("sz1") + col("sz2") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "corpus_id", "jaccard")
  }

  /**
   * Benchmark-decontamination check: for each (training doc, test doc)
   * pair sharing at least one n-gram shingle, the fraction of the TEST
   * item's distinct shingles found in the training doc. Asymmetric
   * containment, not Jaccard — a short benchmark item embedded verbatim in
   * a long training page scores near-zero Jaccard (the page's size
   * dominates the union) but containment 1.0, and containment is what
   * leaks. Normalizing by the test side is the point: the score never
   * dilutes as the training page grows.
   * Same selective shared-shingle join shape as [[jaccardAgainstCorpus]]:
   * cost scales with shared shingles, never |train|·|test|. Output:
   * (train_id, test_id, contain_frac) for pairs ≥ minContain.
   */
  def contaminationAgainstCorpus(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, minContain: Double = 0.5): DataFrame = {
    // train shingles are single-use here, but producing them (interpreted
    // higher-order array ops) dominates the query — registering the frame
    // lets repeat invocations and sibling operators over the same corpus
    // (jaccardAgainstCorpus, the corpus-clean composite) share one pass
    val tr = graft.ops.BoundedCache.cached(hashedShingles(train, idCol, textCol, n))
    // test shingles feed both the per-item sizes and the hit join
    val te = graft.ops.BoundedCache.cached(hashedShingles(test, idCol, textCol, n))
    val teSizes = te.groupBy(col(idCol)).agg(count(lit(1)).as("te_sz"))
    val inter = tr.select(col(idCol).as("train_id"), col("shash"))
      .join(te.select(col(idCol).as("test_id"), col("shash")), "shash")
      .groupBy("train_id", "test_id").agg(count(lit(1)).as("i"))
    inter
      .join(teSizes.select(col(idCol).as("test_id"), col("te_sz")), "test_id")
      .withColumn("contain_frac", col("i").cast(DoubleType) / col("te_sz"))
      .filter(col("contain_frac") >= minContain)
      .select("train_id", "test_id", "contain_frac")
  }

  // ---- SimHash -----------------------------------------------------------

  /** SimHash per document from 60-bit token hashes, weighted by term
    * frequency (tokens kept with multiplicity — frequency profiles
    * discriminate far better than token sets on small vocabularies): bit j
    * of the signature is the sign of Σ_tokens (2*bit_j(hash)-1).
    *
    * Token hash = the first 15 hex chars of md5 (60 bits). md5 is the one
    * 64-bit-grade hash portable verbatim across engines, which makes the
    * WHOLE operator reproducible in plain SQL — the DuckDB oracle computes
    * identical signatures, upgrading simhash from a rows-only check to a
    * hash-matched one. Bits 60-63 of the signature are structurally zero. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", graft.ops.ApproxDistinct.kmvHash(col("tok")))
    // Σ(±1) per bit ≡ 2·(count of ones) − n: summing the raw bit is a
    // branch-free shift+and per row (the ±1 CASE WHEN form costs a
    // conditional in each aggregate update per token). The 64 per-bit
    // counters are lane-packed two to an accumulator — lane l∈{0,1} of
    // group g counts bit j=2g+l in the 32-bit halves of one long — so the
    // aggregation buffer carries 32 sums instead of 64 and every token row
    // does half the aggregate updates. Lanes cannot carry into each other
    // below 2^30 tokens per document (a >6 GB single doc), so the packed
    // form is bit-for-bit the per-bit form.
    val bitSums = (0 until 32).map { g =>
      val lane0 = shiftright(col("h"), 2 * g).bitwiseAND(lit(1L))
      val lane1 = shiftleft(shiftright(col("h"), 2 * g + 1).bitwiseAND(lit(1L)), 32)
      sum(lane0.bitwiseOR(lane1)).as(s"p_$g")
    }
    val agg = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n"), bitSums: _*)
    val sig = (0 until 64).map { j =>
      val cnt = shiftright(col(s"p_${j >> 1}"), 32 * (j & 1)).bitwiseAND(lit(0xffffffffL))
      when(cnt * 2 > col("n"), shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDistance. Candidate
    * generation bands the 64 bits into 8 chunks of 8 — any pair within
    * Hamming distance 7 shares at least one chunk (pigeonhole), so the
    * join is on chunk equality, not all-pairs. (With 60-bit md5 hashes the
    * top chunk has 4 structurally-zero bits — slightly coarser buckets
    * there, recall guarantee unchanged.) */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 6): DataFrame = {
    require(maxDistance < 8, "chunk banding guarantees recall only for distance < 8")
    val sigs = simhashSignatures(docs, idCol, textCol)
    val chunks = (0 until 8).map(c =>
      shiftright(col("simhash"), c * 8).bitwiseAND(lit(0xffL)).as(s"c_$c"))
    val withChunks = sigs.select((col(idCol) +: col("simhash").as("sig") +: chunks): _*)
    val exploded = withChunks.select(col(idCol), col("sig"),
      posexplode(array((0 until 8).map(c => col(s"c_$c")): _*)).as(Seq("chunk_idx", "chunk")))
    val l = exploded.select(col(idCol).as("d1"), col("sig").as("sig1"), col("chunk_idx"), col("chunk"))
    val r = exploded.select(col(idCol).as("d2"), col("sig").as("sig2"), col("chunk_idx"), col("chunk"))
    // Hamming-filter BEFORE deduplicating candidates: the bit_count is a
    // cheap map-side expression, and rejecting far pairs first means the
    // distinct's shuffle carries only the (rare) near-dup survivors
    // instead of every banded collision
    l.join(r, Seq("chunk_idx", "chunk")).filter(col("d1") < col("d2"))
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))))
      .filter(col("hamming") <= maxDistance)
      .select("d1", "d2", "hamming").distinct()
  }

  /**
   * Dedup threshold sweep — the curve a corpus owner reads BEFORE picking
   * a Jaccard cutoff: for each candidate threshold, how many near-dup
   * pairs fire and how many documents would be dropped under the
   * keep-lowest-id convention (a doc is dropped iff it is the d2 of some
   * surviving pair). One pass: the pair set is computed ONCE at the
   * loosest threshold (the same shared-shingle join as [[jaccardPairs]]),
   * then each pair fans out only to the thresholds it clears — the sweep
   * costs one small explode over the pair set, never a per-threshold
   * rescan of the corpus. Distinct-doc counts are exact.
   *
   * Output: (threshold, n_pairs, n_docs_dropped) per threshold, including
   * zero rows for thresholds nothing clears.
   */
  def thresholdSweep(docs: DataFrame, idCol: String, textCol: String,
      thresholds: Seq[Double], n: Int = 3): DataFrame = {
    require(thresholds.nonEmpty)
    val base = jaccardPairs(docs, idCol, textCol, n, thresholds.min)
    val fired = base
      .withColumn("threshold", explode(array(thresholds.map(lit): _*)))
      .filter(col("jaccard") >= col("threshold"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("d2")).as("n_docs_dropped"))
    val all = docs.sparkSession
      .createDataset(thresholds)(org.apache.spark.sql.Encoders.scalaDouble)
      .toDF("threshold")
    all.join(fired, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_dropped"), lit(0L)).as("n_docs_dropped"))
  }
}
