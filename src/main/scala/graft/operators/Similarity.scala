package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2 #41–43): near-duplicate pair
  * mining, brute-force cosine top-k, and random-hyperplane-LSH ANN.
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * over the corpus scan — one pass, no shuffle of the corpus. The
  * near-dup pair path never runs all-pairs: it joins within coarse
  * buckets (the label column plays the IVF coarse-quantizer role; at
  * real scale that's a k-means assignment computed the same way). The
  * LSH path buckets both sides on a signature key. All dot products are
  * Catalyst `aggregate`/`zip_with` folds over the vector arrays — left
  * folds with a 0.0 seed, so results are bitwise-reproducible.
  */
object Similarity {

  /** Vector as double array (float→double widening is exact). */
  private def vd(c: Column): Column = c.cast("array<double>")

  /** Native codegen'd dot product (graft.functions.DotProduct): same
    * sequential 0-seeded summation order as the HOF fold it replaced —
    * bitwise-identical results, primitive loop instead of interpreted
    * per-element lambdas.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.vec_dot(a, b)

  def l2norm(a: Column): Column = graft.functions.VectorOps.vec_norm(a)

  /** Corpus with precomputed double vector + norm (computed once, reused
    * by every pair the row participates in).
    */
  private def withNorm(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("v", vd(col("embedding")))
      .withColumn("nrm", l2norm(col("v")))
      .filter(col("nrm") > 0)

  /** #41 embed_near_dup: cosine ≥ τ pairs within the same coarse bucket
    * (label). Never all-pairs: the join key is the bucket id — but the
    * candidate count is still QUADRATIC in per-label density, so a
    * degenerate label silently turns this into all-pairs. The guard
    * makes that misuse fail loudly: any label wider than `maxLabelRows`
    * raises before the join expands (the same fail-don't-degrade
    * contract as `Dedup.cappedPairs`, except exactness here forbids
    * star-capping — capped output would break the operator's "every
    * qualifying pair" semantics and its oracle). For corpora past the
    * guard, [[nearDupPairsLsh]] is the scale path.
    */
  def nearDupPairs(embeddings: DataFrame, minCosine: Double = 0.4,
                   maxLabelRows: Int = 10000): DataFrame = {
    val e = withNorm(embeddings)
    // Tiny frame (one row per label); the raise_error is kept alive by
    // the filter so column pruning can't drop the check.
    val guard = e.groupBy(col("label")).agg(count(lit(1)).as("__n"))
      .withColumn("__chk",
        when(col("__n") > maxLabelRows, raise_error(concat(
          lit(s"nearDupPairs: label bucket wider than maxLabelRows=$maxLabelRows (n="),
          col("__n").cast("string"),
          lit(") — the within-label join would go quadratic; " +
            "use nearDupPairsLsh at this density"))))
          .otherwise(lit(1)))
    val a = e.select(col("label"), col("vec_id").as("id1"),
      col("v").as("v1"), col("nrm").as("n1"))
      .join(broadcast(guard), Seq("label"))
      .filter(col("__chk") === 1).drop("__n", "__chk")
    val b = e.select(col("label"), col("vec_id").as("id2"),
      col("v").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq("label"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos_sim", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos_sim") >= minCosine)
      .select(col("label"), col("id1"), col("id2"), col("cos_sim"))
  }

  /** Scale-safe near-dup pair emitter: banded random-hyperplane LSH —
    * the default emitter for cluster resolution at corpus scale. The
    * label-bucketed [[nearDupPairs]] is oracle-checkable but quadratic
    * in per-label density; here candidates come from `bands` independent
    * signature tables of `planesPerBand` hyperplanes each (the minhash
    * banding scheme applied to hyperplane bits), so a pair is a
    * candidate iff some band agrees on all its bits: recall =
    * 1 − (1 − p^r)^L with p the per-plane agreement — ≈0.998 at cosine
    * 0.9 with r=4, L=8. Exact cosine then verifies every candidate, so
    * false positives cost time, never correctness.
    *
    * Shape: ONE signature computation per vector, exploded into L
    * narrow (band, bandSig, id) rows; candidates come from a bucket
    * collect + local pair expansion (the minhash plan — computes the
    * signature subtree once, where a self-join would derive it twice),
    * star-capped at `maxBucket` so one degenerate bucket can never go
    * quadratic; verification joins vectors back for the (distinct)
    * candidate set only. Never all-pairs, never label-density-quadratic.
    *
    * Sizing contract: random (non-dup) pairs collide per band at rate
    * 2^(−r), so candidate volume ≈ L·n²/2^r + true-pair volume — `r`
    * (planesPerBand) must grow with log₂(corpus density) to keep buckets
    * bounded, exactly like any LSH index. The defaults (r=7, L=4) fit
    * the test corpus; at 100 TB they are config, not code.
    */
  def nearDupPairsLsh(embeddings: DataFrame, minCosine: Double = 0.4,
                      planesPerBand: Int = 7, bands: Int = 4,
                      maxBucket: Int = 512): DataFrame = {
    require(planesPerBand * bands <= 30, "signature must fit a positive int")
    val e = withNorm(embeddings)
    val mask = (1 << planesPerBand) - 1
    val bandKeys = e
      .withColumn("sig", lshSignature(col("v"), planesPerBand * bands))
      .select(col("vec_id"), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * planesPerBand)
            .bitwiseAND(lit(mask)).as("bsig"))): _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.bsig").as("bsig"))
    val cands = bandKeys
      .groupBy(col("band"), col("bsig"))
      .agg(sort_array(collect_list(col("vec_id"))).as("xs"))
      .filter(size(col("xs")) >= 2)
      .select(explode(Dedup.cappedPairs(col("xs"), maxBucket)).as("pr"))
      // A pair can agree in several bands — dedupe before the (heavier)
      // vector verify so the dot product runs once per pair.
      .select(col("pr.a").as("id1"), col("pr.b").as("id2")).distinct()
    val vecs = e.select(col("vec_id"), col("v"), col("nrm"))
    cands
      .join(vecs.select(col("vec_id").as("id1"), col("v").as("v1"),
        col("nrm").as("n1")), Seq("id1"))
      .join(vecs.select(col("vec_id").as("id2"), col("v").as("v2"),
        col("nrm").as("n2")), Seq("id2"))
      .withColumn("cos_sim", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos_sim") >= minCosine)
      .select(col("id1"), col("id2"), col("cos_sim"))
  }

  /** #42 ann_cosine_topk: brute-force exact top-k per query vector. The
    * query side (vec_id < nQueries) is broadcast; ranking is per-query
    * over rounded cosine with id tie-break (deterministic across
    * engines) via the bounded [[TopK.groupedWithRank]] aggregate — the
    * map side truncates to k per query before the shuffle, so the
    * corpus scan never funnels into nQueries reducer tasks.
    */
  def cosineTopK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = withNorm(embeddings)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
      col("nrm").as("cn"), col("label"))
    val cand = broadcast(queries).join(corpus, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .select(col("query_id"), col("neighbor_id"), col("label"), col("cos_sim"))
    TopK.groupedWithRank(cand, Seq(col("query_id")), k,
        Seq(TopK.descNum(col("cos_sim")), col("neighbor_id")))
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("label"),
        col("cos_sim"))
  }

  /** Hyperplane component r_p[i] = xxhash64("p#i") mapped to [−1, 1] —
    * deterministic, no RNG state. Evaluated ONCE on the driver (the
    * value depends only on (plane, index), never on data) via the same
    * Catalyst XxHash64 the executor-side formula used, so signatures are
    * bit-identical to the old per-row evaluation.
    */
  private[operators] def planeComponent(p: Int, i: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    // seed 42L = the `xxhash64` SQL function's default
    XxHash64(Seq(Literal(s"$p#$i")), 42L).eval(null).asInstanceOf[Long].toDouble /
      9.223372036854776e18
  }

  /** Random-hyperplane signature: bit p = sign of ⟨v, r_p⟩. Each
    * hyperplane ships as a LITERAL array into the codegen'd `vec_dot`
    * loop — the original formulation computed the hash per element per
    * row inside an interpreted HOF lambda (planes × dim × rows string
    * hashes; the profile-dominant cost of every LSH operator at sf0.1).
    * `maxDim` bounds the shipped literals; a vector longer than it
    * would project onto the first `maxDim` coordinates ONLY — that
    * silently changes bucketing, so it raises at runtime instead
    * (raise_error in the signature path): widen `maxDim` for wider
    * embeddings (cost is plan-size only).
    */
  def lshSignature(v: Column, planes: Int, maxDim: Int = 128): Column = {
    val bits = (0 until planes).map { p =>
      val plane = typedlit(Array.tabulate(maxDim)(i => planeComponent(p, i)))
      when(dot(v, plane) > 0, lit(1 << p)).otherwise(lit(0))
    }
    when(size(v) > maxDim,
      raise_error(concat(
        lit(s"lshSignature: vector wider than maxDim=$maxDim (dim="),
        size(v).cast("string"),
        lit(") — signature would silently truncate; raise maxDim"))))
      .otherwise(bits.reduce(_ + _))
  }

  /** #43 ann_lsh_topk: queries probe their signature bucket plus every
    * bucket at hamming distance 1 (multi-probe — planes+1 probes per
    * query, the standard recall lever that avoids growing the table);
    * exact cosine ranks the bucket survivors. Planes=4 ⇒ 16 buckets —
    * sized for the test corpus's weak cosine structure (per-plane
    * agreement ≈ 0.57 at cos 0.2, so recall falls geometrically with
    * planes); at scale, planes and probe radius are parameter changes,
    * same plan shape.
    */
  def lshTopK(embeddings: DataFrame, planes: Int = 4, nQueries: Int = 10,
              k: Int = 5, multiProbe: Boolean = true): DataFrame = {
    val e = withNorm(embeddings)
      .withColumn("sig", lshSignature(col("v"), planes))
    val probes =
      if (multiProbe) array(col("sig") +:
        (0 until planes).map(p => col("sig").bitwiseXOR(lit(1 << p))): _*)
      else array(col("sig"))
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), explode(probes).as("sig"))
    val cand = broadcast(queries)
      .join(e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
        col("nrm").as("cn"), col("sig")), Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      // no dedup needed: probe sigs are pairwise distinct and a neighbor
      // has exactly one sig, so each (query, neighbor) matches once.
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    TopK.groupedWithRank(cand, Seq(col("query_id")), k,
        Seq(TopK.descNum(col("cos_sim")), col("neighbor_id")))
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos_sim"))
  }

  /** #43b ann_ivf_topk: inverted-file ANN — the production scale path
    * next to [[lshTopK]]. Build: a k-means coarse quantizer is fit on a
    * corpus SAMPLE (at 100 TB you train the quantizer on a sample and
    * assign everything — the fit input is bounded, not corpus-sized);
    * each corpus vector lands in its nearest centroid's cell via a
    * broadcast of the (tiny) centroid table + map-side-combinable
    * min_by aggregate — no UDF in the corpus-scale path. Search: each
    * query ranks the centroids, probes its `nProbe` nearest cells, and
    * ranks the survivors by exact cosine. Cost per query ≈
    * nProbe/nCells of one corpus scan — the recall/cost dial.
    * Deterministic: fixed seed, (distance, cell) and (cos, id)
    * tie-breaks.
    */
  def ivfTopK(embeddings: DataFrame, nCells: Int = 16, nProbe: Int = 4,
              nQueries: Int = 10, k: Int = 5, sampleFraction: Double = 1.0,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val e = withNorm(embeddings)
    val feat = e.select(array_to_vector(col("v")).as("features"))
    val train = if (sampleFraction >= 1.0) feat
                else feat.sample(withReplacement = false, sampleFraction, seed)
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("features").fit(train)
    val cents = model.clusterCenters.map(_.toArray)
    ivfSearch(e, cents, nProbe, nQueries, k)
  }

  /** IVF with a PRECOMPUTED quantizer: the deployment mode where the
    * coarse quantizer ships as a model artifact and assignment/search
    * reuse it unchanged. The seeded artifact here is the first `nCells`
    * nonzero-norm vectors by vec_id — sampled data points as centroids
    * (k-means with zero Lloyd iterations), a standard cheap quantizer
    * init. Deterministic and engine-neutral, so this variant carries the
    * cross-engine oracle for the IVF search machinery (assignment
    * argmin, probe ranking, in-cell exact ranking); the k-means fit path
    * above keeps its recall-floor spec as the production quantizer.
    */
  def ivfTopKSeeded(embeddings: DataFrame, nCells: Int = 16, nProbe: Int = 4,
                    nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = withNorm(embeddings)
    val cents = e.orderBy(col("vec_id")).limit(nCells).select(col("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(cents.length == nCells,
      s"corpus has only ${cents.length} nonzero vectors; need $nCells centroids")
    ivfSearch(e, cents, nProbe, nQueries, k)
  }

  /** Shared IVF search over driver-known centroids (tiny by contract —
    * a quantizer is a model artifact, never corpus-sized).
    */
  private def ivfSearch(e: DataFrame, cents: Array[Array[Double]],
                        nProbe: Int, nQueries: Int, k: Int): DataFrame = {
    // Nearest cell per corpus vector: |c|² − 2⟨v,c⟩ ranks cells (the
    // |v|² term is constant per vector). Centroids are DRIVER-known,
    // so the argmin is a narrow projection over a
    // literal (cell, |c|², centroid) table — array_min over per-cell
    // structs with (d2, cell) lexicographic tie-break. No crossJoin, no
    // per-vector groupBy: zero Exchange between the corpus scan and its
    // cell assignment.
    val cellStructs = cents.zipWithIndex.map { case (c, i) =>
      // driver-side |c|²: same left-to-right 0.0-seeded sum as vec_dot
      val n2 = c.foldLeft(0.0)((s, x) => s + x * x)
      struct((lit(n2) - lit(2.0) * dot(col("v"), typedlit(c))).as("d2"),
        lit(i).as("cell"))
    }
    val assigned = e
      .withColumn("m", array_min(array(cellStructs: _*)))
      .select(col("vec_id").as("neighbor_id"), col("m.cell").as("cell"),
        col("v").as("cv"), col("nrm").as("cn"))

    // Query-side probe ranking reuses the same literal structs; the
    // nProbe smallest cells come from slicing the sorted struct array —
    // driver-small input (nQueries rows), no window needed.
    val probed = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(slice(sort_array(array(cellStructs: _*)), 1, nProbe)).as("pc"))
      .select(col("query_id"), col("qv"), col("qn"), col("pc.cell").as("cell"))

    val cand = broadcast(probed).join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("cos_sim"))
    TopK.groupedWithRank(cand, Seq(col("query_id")), k,
        Seq(TopK.descNum(col("cos_sim")), col("neighbor_id")))
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cell"),
        col("cos_sim"))
  }
}
