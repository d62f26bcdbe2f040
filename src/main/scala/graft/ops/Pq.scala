package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the ANN memory tier below int8: each
  * vector becomes `m` small centroid codes (here m=4 codes of 3 bits
  * over a 64-dim float vector ≈ 64× compression vs float32 at test
  * parameters; production uses m=8..64, kSub=256 → 1 byte/code), and
  * search never touches float vectors per pair — a per-query lookup
  * table turns scoring into `m` array reads ([[graft.functions.PqAdc]]).
  *
  * How the pieces map to cosine: cos(q, x) = Σ_j dot(q_j, x_j) /
  * (|q|·|x|). PQ approximates each subvector x_j by its subspace
  * centroid c_{j,code}; then Σ_j dot(q_j, c_{j,code_j}) is a table
  * lookup, and |x̂|² = Σ_j |c_{j,code_j}|² is precomputed at encode
  * time. Subspace centroids are learned with L2 k-means (the PQ
  * objective: minimize reconstruction error per subspace).
  *
  * Determinism (the DuckDB oracle reproduces everything bit-for-bit):
  * init = subvectors of the first `kSub` ids; assignment = min
  * round(dist², 6), ties to the lower centroid id; means decimal-exact
  * then rounded to 6; every cross-subspace sum is DECIMAL (associative)
  * or a pinned-order fold.
  *
  * Scale shape:
  *  - build: the subspace explode multiplies ROWS by m but not BYTES
  *    (each row carries d/m dims); per iteration one broadcast join +
  *    one (sub, cent, pos)-keyed partial-agg exchange of cell rows.
  *    At 100 TB you train on a sample (the op takes any corpus frame) —
  *    k-means quality saturates long before the full corpus.
  *  - encode: one broadcast join + one (sub, v_id)-keyed exchange whose
  *    rows are (ids + one code) — never vectors.
  *  - search: pure scan of (codes, |x̂|²) × broadcast query LUTs with the
  *    compiled ADC kernel, bounded-heap top-k — the exchange carries
  *    ≤ queries × k × partitions heap rows, zero vector arithmetic per
  *    pair, zero corpus shuffle.
  */
object Pq {

  // ---------- shared frames ----------

  private def base(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.functions.VectorFunctions.attach(corpus)
      .select(col(idCol).as("v_id"), col(vecCol).as("vec"))

  /** (v_id, sub, svec): the m subvectors of every vector, elements cast
    * to DOUBLE (inputs are ARRAY<FLOAT>).
    */
  private def subFrame(b: DataFrame, m: Int, w: Int): DataFrame =
    b.select(col("v_id"), explode(expr(s"sequence(0, ${m - 1})")).as("sub"), col("vec"))
      .select(col("v_id"), col("sub"),
        expr(s"transform(slice(vec, sub * $w + 1, $w), x -> cast(x AS DOUBLE))").as("svec"))

  /** Per-subspace L2 k-means centroids: (sub, cent_id, c_vec). All m
    * subspaces train TOGETHER — one broadcast join + one cell-keyed
    * exchange per iteration covers every subspace, not m driver loops.
    */
  def pqCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int, kSub: Int, iters: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val w = dim / m
    val b0 = base(corpus, idCol, vecCol)
    // init = the kSub rows with the smallest portable-hash of their id
    // (the [[Similarity.kmeansCentroids]] de-adversarialization — first-k
    // ids would collapse the codebooks on an id-sorted corpus), REMAPPED
    // to cent_id 0..kSub-1 by (hash, id) rank: ADC flat-LUT indexing
    // (`gi = sub * kSub + cent_id`) requires the dense code domain
    val seeds = b0
      .withColumn("hk",
        expr(graft.ops.PortableHash.sparkStringHash("cast(v_id AS STRING)")))
      .orderBy(col("hk"), col("v_id")).limit(kSub)
      .select(col("v_id"), (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("hk"), col("v_id")))
        - 1).cast("int").as("cent_id"))
    val b = subFrame(b0, m, w)
    var cent = b.join(seeds, Seq("v_id"))
      .select(col("sub"), col("cent_id"), col("svec").as("c_vec"))
    for (_ <- 1 to iters) {
      val assigned = b.join(broadcast(cent), Seq("sub"))
        .withColumn("d2", round(expr("graft_dist2(svec, c_vec)"), 6))
        .groupBy(col("sub"), col("v_id"))
        .agg(min_by(struct(col("svec"), col("cent_id")),
          struct(col("d2"), col("cent_id"))).as("m"))
        .select(col("sub"), col("m.svec").as("svec"), col("m.cent_id").as("cent_id"))
      cent = assigned
        .select(col("sub"), col("cent_id"), posexplode(col("svec")))
        .groupBy(col("sub"), col("cent_id"), col("pos"))
        .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("v"))
        .groupBy(col("sub"), col("cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("s"))
        .select(col("sub"), col("cent_id"), expr("transform(s, x -> round(x.v, 6))").as("c_vec"))
        // truncate lineage per iteration (see Similarity.kmeansCentroids)
        .localCheckpoint(true)
    }
    cent
  }

  /** PQ code words: (v_id, codes ARRAY<INT> in subspace order,
    * xn2 = |x̂|² via exact decimal sum of the chosen centroids' |c|²).
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               cent: DataFrame, m: Int, w: Int): DataFrame = {
    val b = subFrame(base(corpus, idCol, vecCol), m, w)
    val centB = broadcast(cent.withColumn("c2", expr("graft_dot(c_vec, c_vec)")))
    b.join(centB, Seq("sub"))
      .withColumn("d2", round(expr("graft_dist2(svec, c_vec)"), 6))
      .groupBy(col("sub"), col("v_id"))
      .agg(min_by(struct(col("cent_id"), col("c2")),
        struct(col("d2"), col("cent_id"))).as("m"))
      .groupBy(col("v_id"))
      .agg(
        array_sort(collect_list(struct(col("sub"), col("m.cent_id").as("code")))).as("cs"),
        sum(col("m.c2").cast("decimal(28,12)")).cast("double").as("xn2"))
      .select(col("v_id"), expr("transform(cs, x -> x.code)").as("codes"), col("xn2"))
  }

  /** Per-query flat ADC tables: (q_id, flat, q2). The LUT covers the
    * FULL (sub × kSub) grid — a centroid that lost all members mid-train
    * leaves a zero-filled hole that no code references, keeping
    * positional indexing aligned cross-engine.
    */
  private[ops] def queryLutsFor(queries: DataFrame, cent: DataFrame,
                        m: Int, kSub: Int, w: Int): DataFrame = {
    val qdots = subFrame(queries, m, w).join(broadcast(cent), Seq("sub"))
      .select(col("v_id").as("q_id"),
        (col("sub") * kSub + col("cent_id")).cast("int").as("gi"),
        expr("graft_dot(svec, c_vec)").as("dot"))
    // zero-fill the (sub × kSub) grid by MAP LOOKUP over one aggregate
    // (r21): the old shape exploded a full grid frame and left-joined
    // it back on (q_id, gi) — two extra exchanges per LUT build purely
    // to materialize holes a transform(sequence(...)) fills for free.
    // (q_id, gi) is unique by construction (gi = sub·kSub + cent_id),
    // so map_from_entries cannot collide; transform over the ascending
    // sequence IS the array_sort-by-gi order, and absent keys yield the
    // same 0.0 the left join's coalesce produced — value-identical.
    // try_element_at, not gm[gi]: ANSI mode makes plain map access
    // THROW on the missing keys the zero-fill exists for.
    val flat = qdots.groupBy(col("q_id"))
      .agg(map_from_entries(collect_list(struct(col("gi"), col("dot")))).as("gm"))
      .select(col("q_id"), expr(
        s"transform(sequence(0, ${m * kSub - 1}), gi -> coalesce(try_element_at(gm, gi), cast(0.0 AS DOUBLE)))").as("flat"))
    val qn = queries.select(col("v_id").as("q_id"), expr("graft_dot(vec, vec)").as("q2"))
    flat.join(qn, Seq("q_id"))
  }

  /** sim = num / (|q|·|x̂|) with the engine-wide zero-magnitude
    * convention (see [[Similarity.duckCosine]]): a zero query or a
    * zero-norm encoded vector scores 0 — Spark's 0/0 NaN and DuckDB's
    * x/0 NULL sort to OPPOSITE ends, so the guard is cross-engine
    * correctness, not style.
    */
  private[ops] def normSim(num: Column): Column =
    round(when(col("q2") * col("xn2") === 0.0, 0.0)
      .otherwise(num / (sqrt(col("q2")) * sqrt(col("xn2")))), 6)

  private def adcSim(kSub: Int): Column =
    normSim(expr(s"graft_pq_adc(codes, flat, $kSub)"))

  /** ADC top-k: approximate cosine neighbors from codes alone.
    * `queryPred` selects queries over `v_id` (the [[pqCentroids]]
    * convention shared with the IVF ops).
    */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
             dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
             queryPred: Column = lit(false)): DataFrame = {
    val w = dim / m
    val cent = pqCentroids(corpus, idCol, vecCol, dim, m, kSub, iters)
    val enc = pqEncode(corpus, idCol, vecCol, cent, m, w)
    val queries = base(corpus, idCol, vecCol).where(queryPred)
    val qrows = broadcast(queryLutsFor(queries, cent, m, kSub, w))
    val scored = enc.crossJoin(qrows)
      .where(col("q_id") =!= col("v_id"))
      .withColumn("sim", adcSim(kSub))
      .select(col("q_id"), col("v_id").as("c_id"), col("sim"))
    Similarity.topkByQuery(scored, k)
  }

  /** [[pqEncode]] over an already-ASSIGNED frame (v_id, vec, cluster),
    * carrying `cluster` through both aggregates as a group key —
    * cluster is functionally dependent on v_id, so the keys' grain is
    * unchanged and the output rows equal `pqEncode ⋈ (v_id → cluster)`
    * exactly (PqIndexSpec pins it). WHY (r21, guide §2.4): the join
    * form re-shuffled the assigned frame by v_id and sorted both sides
    * purely to re-attach a column that was already ON the input rows —
    * one whole exchange + SMJ removed from every clustered index build.
    */
  private[graft] def pqEncodeAssigned(assigned: DataFrame, cent: DataFrame,
                                    m: Int, w: Int): DataFrame = {
    val b = assigned
      .select(col("v_id"), col("cluster"),
        explode(expr(s"sequence(0, ${m - 1})")).as("sub"), col("vec"))
      .select(col("v_id"), col("cluster"), col("sub"),
        expr(s"transform(slice(vec, sub * $w + 1, $w), x -> cast(x AS DOUBLE))").as("svec"))
    val centB = broadcast(cent.withColumn("c2", expr("graft_dot(c_vec, c_vec)")))
    b.join(centB, Seq("sub"))
      .withColumn("d2", round(expr("graft_dist2(svec, c_vec)"), 6))
      .groupBy(col("sub"), col("v_id"), col("cluster"))
      .agg(min_by(struct(col("cent_id"), col("c2")),
        struct(col("d2"), col("cent_id"))).as("m"))
      .groupBy(col("v_id"), col("cluster"))
      .agg(
        array_sort(collect_list(struct(col("sub"), col("m.cent_id").as("code")))).as("cs"),
        sum(col("m.c2").cast("decimal(28,12)")).cast("double").as("xn2"))
      .select(col("v_id"), expr("transform(cs, x -> x.code)").as("codes"),
        col("xn2"), col("cluster"))
  }

  /** [[pqEncode]] with the code word BYTE-PACKED (`graft_pack_i8` —
    * kSub ≤ 256): (v_id, qcodes BINARY, xn2). The at-rest search payload
    * becomes literally m bytes + 8 per vector.
    */
  def pqEncodePacked(corpus: DataFrame, idCol: String, vecCol: String,
                     cent: DataFrame, m: Int, w: Int): DataFrame =
    pqEncode(corpus, idCol, vecCol, cent, m, w)
      .select(col("v_id"), expr("graft_pack_i8(codes)").as("qcodes"), col("xn2"))

  /** [[pqTopK]] over PACKED codes: the compiled `graft_pq_adc_packed`
    * kernel scans 1-byte codes straight out of the binary — same fold
    * order, bit-equal results (the oracle runs the int-list form).
    */
  def pqTopKPacked(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                   dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
                   queryPred: Column = lit(false)): DataFrame = {
    val w = dim / m
    val cent = pqCentroids(corpus, idCol, vecCol, dim, m, kSub, iters)
    val enc = pqEncodePacked(corpus, idCol, vecCol, cent, m, w)
    val queries = base(corpus, idCol, vecCol).where(queryPred)
    val qrows = broadcast(queryLutsFor(queries, cent, m, kSub, w))
    val scored = enc.crossJoin(qrows)
      .where(col("q_id") =!= col("v_id"))
      .withColumn("sim",
        normSim(expr(s"graft_pq_adc_packed(qcodes, flat, $kSub)")))
      .select(col("q_id"), col("v_id").as("c_id"), col("sim"))
    Similarity.topkByQuery(scored, k)
  }

  /** IVF-PQ: the production ANN pairing — a coarse quantizer (cosine
    * k-means, [[Similarity.kmeansCentroids]]) routes each query to its
    * `nprobe` nearest clusters, and PQ/ADC scores only those clusters'
    * candidates. Candidates per query ≈ nprobe × corpus / nCoarse, each
    * scored with m array reads: at 100 TB the corpus at rest is (codes,
    * norm, cluster) — ~m bytes + 12 per vector — ideally bucketed BY
    * cluster ([[CorpusIO.writeBucketed]]) so a probe touches only its
    * clusters' files.
    *
    * This is the NON-RESIDUAL IVFADC variant: PQ codes quantize the raw
    * vectors, not (x − coarse centroid). Residual encoding recovers
    * extra precision per code bit but couples the codebooks to the
    * coarse assignment; the non-residual form keeps the codebooks
    * cluster-independent (one LUT per query, not per (query, cluster))
    * — the standard memory/recall trade, documented rather than hidden.
    *
    * Plan shape: coarse centroids and query LUTs broadcast; the corpus
    * side is one scan of the code frame hash-joined (map-side) to the
    * broadcast probe list on `cluster`; bounded-heap top-k. The encode
    * join (codes ⋈ assignment on v_id) shuffles compact id rows once at
    * index-build time.
    */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
                nCoarse: Int = 8, coarseIters: Int = 2, nprobe: Int = 2,
                queryPred: Column = lit(false)): DataFrame = {
    val w = dim / m
    val coarse = broadcast(
      Similarity.kmeansCentroids(corpus, idCol, vecCol, nCoarse, coarseIters))
    val b = base(corpus, idCol, vecCol)
    val assigned = Similarity.assignClusters(b, coarse)
      .transform(Caches.lease(_))
    val cent = pqCentroids(corpus, idCol, vecCol, dim, m, kSub, iters)
    val enc = pqEncode(corpus, idCol, vecCol, cent, m, w)
      .join(assigned.select(col("v_id"), col("cluster")), Seq("v_id"))
    val queries = assigned.where(queryPred)
      .select(col("v_id"), col("vec"))
    val probes = queries.crossJoin(coarse)
      .withColumn("csim", round(expr(Similarity.nativeCosine("vec", "c_vec")), 6))
      .groupBy(col("v_id"))
      .agg(expr(s"graft_topk(csim, cent_id, $nprobe)").as("top"))
      .select(col("v_id").as("q_id"), explode(col("top.c_id")).as("cluster"))
    val qrows = broadcast(probes.join(queryLutsFor(queries, cent, m, kSub, w), Seq("q_id")))
    val scored = enc.join(qrows, Seq("cluster"))
      .where(col("q_id") =!= col("v_id"))
      .withColumn("sim", adcSim(kSub))
      .select(col("q_id"), col("v_id").as("c_id"), col("sim"))
    Similarity.topkByQuery(scored, k)
  }

  /** RESIDUAL IVF-PQ — the standard IVFADC construction (Jégou et al.):
    * PQ codes quantize the residual `r = x − c(x)` against the coarse
    * centroid instead of the raw vector, recovering precision per code
    * bit because residual magnitudes are a fraction of vector magnitudes
    * (the codebooks only have to cover within-cluster variation).
    *
    * For cosine the ADC decomposition stays one-LUT-per-QUERY (not the
    * per-(query, cluster) LUTs L2 IVFADC needs):
    *   dot(q, x̂) = dot(q, c) + Σ_j dot(q_j, r̂_j)
    * — the first term is a per-(query, probed-cluster) SCALAR computed
    * with the broadcast coarse table, the second is the same flat-LUT
    * ADC kernel over RESIDUAL codebooks. The reconstruction norm
    * |x̂|² = |c|² + 2·dot(c, r̂) + |r̂|² is exact at encode time (both
    * dot terms are over chosen centroids, summed as DECIMAL).
    *
    * Same scale shape as [[ivfPqTopK]] plus one extra broadcast join at
    * ENCODE time (residual = vec − its cluster's centroid); search-side
    * cost is identical: broadcast probes+LUTs × one code scan.
    */
  def ivfPqResidualTopK(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                        dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
                        nCoarse: Int = 8, coarseIters: Int = 2, nprobe: Int = 2,
                        queryPred: Column = lit(false)): DataFrame = {
    val w = dim / m
    val coarse = broadcast(
      Similarity.kmeansCentroids(corpus, idCol, vecCol, nCoarse, coarseIters))
    val b = base(corpus, idCol, vecCol)
    val assigned = Similarity.assignClusters(b, coarse)
      .transform(Caches.lease(_))
    val ccn = coarseWithNorms(coarse)
    val resid = residualFrame(assigned, ccn).transform(Caches.lease(_))
    val cent = pqCentroids(resid, "v_id", "rvec", dim, m, kSub, iters)
    val enc = residualEncode(resid, ccn, cent, m, w)
    val queries = assigned.where(queryPred).select(col("v_id"), col("vec"))
    val qrows = broadcast(
      residualProbes(queries, coarse, ccn, nprobe)
        .join(queryLutsFor(queries, cent, m, kSub, w), Seq("q_id")))
    Similarity.topkByQuery(residualScore(enc, qrows, kSub), k)
  }

  private[ops] def coarseWithNorms(coarse: DataFrame): DataFrame =
    coarse.withColumn("cc2", expr("graft_dot(c_vec, c_vec)"))

  /** (v_id, cluster, rvec = vec − its cluster's coarse centroid). */
  private[ops] def residualFrame(assigned: DataFrame, ccn: DataFrame): DataFrame =
    assigned
      .join(ccn.select(col("cent_id").as("cluster"), col("c_vec").as("cc_vec")),
        Seq("cluster"))
      .select(col("v_id"), col("cluster"),
        expr("zip_with(vec, cc_vec, (x, c) -> cast(x AS DOUBLE) - c)").as("rvec"))

  /** Residual encode: nearest residual centroid per subspace; carries
    * that centroid's |c|² and its dot with the cluster's coarse
    * subvector so the reconstruction norm |c + r̂|² assembles exactly.
    * Returns (v_id, cluster, codes, xn2).
    *
    * `cluster` rides in from `resid` itself ([[residualFrame]] already
    * carries it) through both aggregates as a group key — cluster is
    * functionally dependent on v_id, so the grain is unchanged. WHY
    * (r21, guide §2.4): the old `⋈ assigned(v_id → cluster)` join
    * re-shuffled the subspace rows by v_id and sorted both sides purely
    * to re-attach a column the input already had — one exchange + SMJ
    * gone from every residual build (PqIndexSpec pins append ≡ rebuild
    * over this path; cross-engine values pinned by the oracle twins).
    */
  private[ops] def residualEncode(resid: DataFrame,
                                  ccn: DataFrame, cent: DataFrame,
                                  m: Int, w: Int): DataFrame = {
    val coarseSub = broadcast(ccn
      .select(col("cent_id").as("cluster"), col("cc2"),
        explode(expr(s"sequence(0, ${m - 1})")).as("sub"), col("c_vec"))
      .select(col("cluster"), col("cc2"), col("sub"),
        expr(s"slice(c_vec, sub * $w + 1, $w)").as("cs_vec")))
    val centB = broadcast(cent.withColumn("c2", expr("graft_dot(c_vec, c_vec)")))
    resid
      .select(col("v_id"), col("cluster"),
        explode(expr(s"sequence(0, ${m - 1})")).as("sub"), col("rvec"))
      .select(col("v_id"), col("cluster"), col("sub"),
        expr(s"transform(slice(rvec, sub * $w + 1, $w), x -> cast(x AS DOUBLE))").as("svec"))
      .join(centB, Seq("sub"))
      .join(coarseSub, Seq("cluster", "sub"))
      .withColumn("d2", round(expr("graft_dist2(svec, c_vec)"), 6))
      .withColumn("dotcs", expr("graft_dot(cs_vec, c_vec)"))
      .groupBy(col("sub"), col("v_id"), col("cluster"))
      .agg(min_by(struct(col("cent_id"), col("c2"), col("dotcs")),
        struct(col("d2"), col("cent_id"))).as("m"),
        max(col("cc2")).as("cc2"))
      .groupBy(col("v_id"), col("cluster"))
      .agg(
        array_sort(collect_list(struct(col("sub"), col("m.cent_id").as("code")))).as("cs"),
        sum(col("m.c2").cast("decimal(28,12)")).cast("double").as("sumc2"),
        sum(col("m.dotcs").cast("decimal(28,12)")).cast("double").as("sumdot"),
        max(col("cc2")).as("cc2"))
      .select(col("v_id"), col("cluster"),
        expr("transform(cs, x -> x.code)").as("codes"),
        (col("cc2") + lit(2.0) * col("sumdot") + col("sumc2")).as("xn2"))
  }

  /** Probe selection + the residual form's per-(query, cluster) scalar:
    * (q_id, cluster, dotqc = dot(q, coarse centroid)). `queries` must
    * expose (v_id, vec).
    */
  private[ops] def residualProbes(queries: DataFrame, coarse: DataFrame,
                                  ccn: DataFrame, nprobe: Int): DataFrame = {
    val probes = queries.crossJoin(broadcast(coarse))
      .withColumn("csim", round(expr(Similarity.nativeCosine("vec", "c_vec")), 6))
      .groupBy(col("v_id"))
      .agg(expr(s"graft_topk(csim, cent_id, $nprobe)").as("top"))
      .select(col("v_id").as("q_id"), explode(col("top.c_id")).as("cluster"))
    probes
      .join(queries.select(col("v_id").as("q_id"), col("vec")), Seq("q_id"))
      .join(ccn.select(col("cent_id").as("cluster"), col("c_vec")), Seq("cluster"))
      .withColumn("dotqc",
        expr("graft_dot(transform(vec, x -> cast(x AS DOUBLE)), c_vec)"))
      .select(col("q_id"), col("cluster"), col("dotqc"))
  }

  /** Residual ADC scoring: enc(v_id, cluster, codes, xn2) × broadcast
    * qrows(q_id, cluster, dotqc, flat, q2) joined map-side on cluster.
    * `packed` scans the byte-packed `qcodes` word via the bit-equal
    * packed kernel.
    */
  private[ops] def residualScore(enc: DataFrame, qrows: DataFrame,
                                 kSub: Int, packed: Boolean = false): DataFrame = {
    val adc =
      if (packed) expr(s"graft_pq_adc_packed(qcodes, flat, $kSub)")
      else expr(s"graft_pq_adc(codes, flat, $kSub)")
    enc.join(qrows, Seq("cluster"))
      .where(col("q_id") =!= col("v_id"))
      .withColumn("sim", normSim(col("dotqc") + adc))
      .select(col("q_id"), col("v_id").as("c_id"), col("sim"))
  }

  // ---------- DuckDB twins ----------

  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len($a)), " +
      s"i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE)), (acc, v) -> acc + v)"

  private def duckDist2(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len($a)), " +
      s"i -> (($a)[i]::DOUBLE - ($b)[i]::DOUBLE) * (($a)[i]::DOUBLE - ($b)[i]::DOUBLE))), " +
      "(acc, v) -> acc + v)"

  /** CTE chain ending in `${p}centf(sub, cent_id, c_vec, c2)` and
    * `${p}enc(v_id, codes, xn2)` — the build+encode half shared by the
    * code dump and the search twins. `p` prefixes every CTE name so the
    * chain composes with the coarse-quantizer CTEs in the IVF-PQ twin
    * (both would otherwise define `base`/`cent0`).
    */
  private def pqCtes(table: String, idCol: String, vecCol: String,
                     dim: Int, m: Int, kSub: Int, iters: Int,
                     p: String = ""): String =
    s"""${pqTrainCtes(table, idCol, vecCol, dim, m, kSub, iters, p)},
       |${p}enc AS (
       |  SELECT v_id, list(code ORDER BY sub) AS codes,
       |         CAST(sum(CAST(c2 AS DECIMAL(28,12))) AS DOUBLE) AS xn2 FROM (
       |    SELECT sub, v_id, cent_id AS code, c2 FROM (
       |      SELECT s.sub, s.v_id, c.cent_id, c.c2, row_number() OVER (
       |        PARTITION BY s.sub, s.v_id
       |        ORDER BY round(${duckDist2("s.svec", "c.c_vec")}, 6) ASC, c.cent_id ASC) AS rn
       |      FROM ${p}sub s JOIN ${p}centf c ON s.sub = c.sub) WHERE rn = 1)
       |  GROUP BY v_id)""".stripMargin

  /** The codebook-training half of [[pqCtes]]: CTE chain ending in
    * `${p}centf(sub, cent_id, c_vec, c2)` (plus the `${p}sub` subvector
    * frame), without the encode CTE — so encode variants (residual
    * IVF-PQ) can append their own.
    */
  private def pqTrainCtes(table: String, idCol: String, vecCol: String,
                          dim: Int, m: Int, kSub: Int, iters: Int,
                          p: String = ""): String = {
    val w = dim / m
    val ctes = new StringBuilder
    ctes.append(
      s"""${p}base AS (SELECT $idCol AS v_id, $vecCol AS vec FROM $table),
         |${p}sub AS (SELECT v_id, j AS sub,
         |          list_transform(list_slice(vec, j * $w + 1, (j + 1) * $w), x -> x::DOUBLE) AS svec
         |        FROM ${p}base, UNNEST(generate_series(0, ${m - 1})) AS t(j)),
         |${p}seed AS (
         |  SELECT v_id, (row_number() OVER (ORDER BY hk ASC, v_id ASC) - 1)::INT AS cent_id
         |  FROM (SELECT v_id, ${graft.ops.PortableHash.duckStringHash("v_id::VARCHAR")} AS hk
         |        FROM ${p}base ORDER BY hk ASC, v_id ASC LIMIT $kSub) t),
         |${p}cent0 AS (SELECT s.sub, sd.cent_id, s.svec AS c_vec
         |          FROM ${p}sub s JOIN ${p}seed sd ON s.v_id = sd.v_id)""".stripMargin)
    for (i <- 1 to iters) {
      ctes.append(
        s""",
           |${p}assign$i AS (
           |  SELECT sub, v_id, svec, cent_id FROM (
           |    SELECT s.sub, s.v_id, s.svec, c.cent_id, row_number() OVER (
           |      PARTITION BY s.sub, s.v_id
           |      ORDER BY round(${duckDist2("s.svec", "c.c_vec")}, 6) ASC, c.cent_id ASC) AS rn
           |    FROM ${p}sub s JOIN ${p}cent${i - 1} c ON s.sub = c.sub) WHERE rn = 1),
           |${p}cent$i AS (
           |  SELECT sub, cent_id, list(round(v, 6) ORDER BY pos) AS c_vec FROM (
           |    SELECT sub, cent_id, pos,
           |           CAST(sum(CAST(svec[pos] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS v
           |    FROM ${p}assign$i, UNNEST(generate_series(1, len(svec))) AS t(pos)
           |    GROUP BY sub, cent_id, pos) GROUP BY sub, cent_id)""".stripMargin)
    }
    ctes.append(
      s""",
         |${p}centf AS (SELECT sub, cent_id, c_vec, ${duckDot("c_vec", "c_vec")} AS c2 FROM ${p}cent$iters)""".stripMargin)
    ctes.toString
  }

  /** Twin of [[pqEncode]]∘[[pqCentroids]] with codes CSV-serialized. */
  def pqCodesSql(table: String, idCol: String, vecCol: String,
                 dim: Int, m: Int, kSub: Int, iters: Int): String =
    s"""WITH ${pqCtes(table, idCol, vecCol, dim, m, kSub, iters)}
       |SELECT v_id, array_to_string(codes, ',') AS codes_csv, round(xn2, 6) AS xn2
       |FROM enc""".stripMargin

  /** Twin of [[ivfPqTopK]]: the coarse-quantizer CTE chain
    * ([[Similarity.kmeansCtes]] — `a(v_id, vec, cluster)`) composed with
    * the `p`-prefixed PQ chain, probes by coarse cosine, ADC within
    * probed clusters only.
    */
  def ivfPqTopKSql(table: String, idCol: String, vecCol: String, k: Int,
                   dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
                   nCoarse: Int = 8, coarseIters: Int = 2, nprobe: Int = 2,
                   queryPred: String = "false"): String = {
    val w = dim / m
    val adc = s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $m), " +
      s"j -> f.flat[(j - 1) * $kSub + e.codes[j] + 1])), (acc, v) -> acc + v)"
    s"""WITH ${Similarity.kmeansCtes(table, idCol, vecCol, nCoarse, coarseIters)},
       |${pqCtes(table, idCol, vecCol, dim, m, kSub, iters, p = "p")},
       |q AS (SELECT v_id AS q_id, vec FROM a WHERE $queryPred),
       |probes AS (
       |  SELECT q_id, cluster FROM (
       |    SELECT q.q_id, c.cent_id AS cluster, row_number() OVER (
       |      PARTITION BY q.q_id
       |      ORDER BY round(${Similarity.duckCosine("q.vec", "c.c_vec")}, 6) DESC, c.cent_id ASC) AS prn
       |    FROM q CROSS JOIN cent$coarseIters c) WHERE prn <= $nprobe),
       |qdots AS (
       |  SELECT q.q_id, (c.sub * $kSub + c.cent_id) AS gi,
       |         ${duckDot(s"list_transform(list_slice(q.vec, c.sub * $w + 1, (c.sub + 1) * $w), x -> x::DOUBLE)", "c.c_vec")} AS dot
       |  FROM q CROSS JOIN pcentf c),
       |grid AS (SELECT q_id, gi FROM (SELECT DISTINCT q_id FROM q),
       |         UNNEST(generate_series(0, ${m * kSub - 1})) AS t(gi)),
       |qflat AS (
       |  SELECT g.q_id, list(coalesce(d.dot, 0.0::DOUBLE) ORDER BY g.gi) AS flat
       |  FROM grid g LEFT JOIN qdots d ON g.q_id = d.q_id AND g.gi = d.gi
       |  GROUP BY g.q_id),
       |qn AS (SELECT q_id, ${duckDot("vec", "vec")} AS q2 FROM q),
       |scored AS (
       |  SELECT f.q_id, e.v_id AS c_id,
       |         round(CASE WHEN n.q2 * e.xn2 = 0 THEN 0.0 ELSE $adc / (sqrt(n.q2) * sqrt(e.xn2)) END, 6) AS sim
       |  FROM penc e JOIN a ON e.v_id = a.v_id
       |  JOIN probes p ON p.cluster = a.cluster
       |  JOIN qflat f ON f.q_id = p.q_id
       |  JOIN qn n ON n.q_id = f.q_id
       |  WHERE f.q_id <> e.v_id),
       |ranked AS (
       |  SELECT q_id, c_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, c_id, sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Twin of [[ivfPqResidualTopK]]: coarse CTE chain + residual frame +
    * `r`-prefixed codebook training over residuals + cluster-aware
    * encode (codes, |c+r̂|²) + per-(query, cluster) dot(q, c) scalar +
    * flat residual LUT ADC within probed clusters.
    */
  def ivfPqResidualTopKSql(table: String, idCol: String, vecCol: String, k: Int,
                           dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
                           nCoarse: Int = 8, coarseIters: Int = 2, nprobe: Int = 2,
                           queryPred: String = "false"): String = {
    val w = dim / m
    val adc = s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $m), " +
      s"j -> f.flat[(j - 1) * $kSub + x.codes[j] + 1])), (acc, v) -> acc + v)"
    s"""WITH ${Similarity.kmeansCtes(table, idCol, vecCol, nCoarse, coarseIters)},
       |ccn AS (SELECT cent_id, c_vec, ${duckDot("c_vec", "c_vec")} AS cc2 FROM cent$coarseIters),
       |resid AS (
       |  SELECT a.v_id, a.cluster,
       |    list_transform(generate_series(1, $dim), i -> a.vec[i]::DOUBLE - cc.c_vec[i]) AS rvec
       |  FROM a JOIN ccn cc ON a.cluster = cc.cent_id),
       |${pqTrainCtes("resid", "v_id", "rvec", dim, m, kSub, iters, p = "r")},
       |coarsesub AS (
       |  SELECT cent_id AS cluster, cc2, j AS sub,
       |         list_transform(list_slice(c_vec, j * $w + 1, (j + 1) * $w), x -> x::DOUBLE) AS cs_vec
       |  FROM ccn, UNNEST(generate_series(0, ${m - 1})) AS t(j)),
       |renc AS (
       |  SELECT v_id, cluster, list(code ORDER BY sub) AS codes, max(cc2) AS cc2,
       |         CAST(sum(CAST(c2 AS DECIMAL(28,12))) AS DOUBLE) AS sumc2,
       |         CAST(sum(CAST(dotcs AS DECIMAL(28,12))) AS DOUBLE) AS sumdot
       |  FROM (
       |    SELECT sub, v_id, cluster, cent_id AS code, c2, dotcs, cc2 FROM (
       |      SELECT s.sub, s.v_id, cs.cluster, c.cent_id, c.c2, cs.cc2,
       |             ${duckDot("cs.cs_vec", "c.c_vec")} AS dotcs,
       |             row_number() OVER (PARTITION BY s.sub, s.v_id
       |               ORDER BY round(${duckDist2("s.svec", "c.c_vec")}, 6) ASC, c.cent_id ASC) AS rn
       |      FROM rsub s
       |      JOIN rcentf c ON s.sub = c.sub
       |      JOIN resid rr ON s.v_id = rr.v_id
       |      JOIN coarsesub cs ON rr.cluster = cs.cluster AND s.sub = cs.sub) WHERE rn = 1)
       |  GROUP BY v_id, cluster),
       |xn AS (SELECT v_id, cluster, codes, cc2 + 2 * sumdot + sumc2 AS xn2 FROM renc),
       |q AS (SELECT v_id AS q_id, vec FROM a WHERE $queryPred),
       |probes AS (
       |  SELECT q_id, cluster FROM (
       |    SELECT q.q_id, c.cent_id AS cluster, row_number() OVER (
       |      PARTITION BY q.q_id
       |      ORDER BY round(${Similarity.duckCosine("q.vec", "c.c_vec")}, 6) DESC, c.cent_id ASC) AS prn
       |    FROM q CROSS JOIN cent$coarseIters c) WHERE prn <= $nprobe),
       |probed AS (
       |  SELECT p.q_id, p.cluster, ${duckDot("q.vec", "cc.c_vec")} AS dotqc
       |  FROM probes p JOIN q ON p.q_id = q.q_id JOIN ccn cc ON p.cluster = cc.cent_id),
       |qdots AS (
       |  SELECT q.q_id, (c.sub * $kSub + c.cent_id) AS gi,
       |         ${duckDot(s"list_transform(list_slice(q.vec, c.sub * $w + 1, (c.sub + 1) * $w), x -> x::DOUBLE)", "c.c_vec")} AS dot
       |  FROM q CROSS JOIN rcentf c),
       |grid AS (SELECT q_id, gi FROM (SELECT DISTINCT q_id FROM q),
       |         UNNEST(generate_series(0, ${m * kSub - 1})) AS t(gi)),
       |qflat AS (
       |  SELECT g.q_id, list(coalesce(d.dot, 0.0::DOUBLE) ORDER BY g.gi) AS flat
       |  FROM grid g LEFT JOIN qdots d ON g.q_id = d.q_id AND g.gi = d.gi
       |  GROUP BY g.q_id),
       |qn AS (SELECT q_id, ${duckDot("vec", "vec")} AS q2 FROM q),
       |scored AS (
       |  SELECT f.q_id, x.v_id AS c_id,
       |         round(CASE WHEN n.q2 * x.xn2 = 0 THEN 0.0 ELSE (p.dotqc + $adc) / (sqrt(n.q2) * sqrt(x.xn2)) END, 6) AS sim
       |  FROM xn x
       |  JOIN probed p ON p.cluster = x.cluster
       |  JOIN qflat f ON f.q_id = p.q_id
       |  JOIN qn n ON n.q_id = f.q_id
       |  WHERE f.q_id <> x.v_id),
       |ranked AS (
       |  SELECT q_id, c_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, c_id, sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Twin of the INCREMENTAL residual index: coarse centroids and
    * codebooks trained on the `trainPred` subset only (the original
    * build), the FULL corpus encoded against those frozen parameters
    * (build half + appended half), searched identically to
    * [[ivfPqResidualTopKSql]]. This is the from-scratch-encode-of-the-
    * union formulation that `PqIndex.appendResidual` must reproduce.
    */
  def ivfPqResidualIncrementalSql(table: String, idCol: String, vecCol: String,
                                  k: Int, dim: Int, m: Int = 4, kSub: Int = 8,
                                  iters: Int = 2, nCoarse: Int = 8,
                                  coarseIters: Int = 2, nprobe: Int = 2,
                                  trainPred: String = "true",
                                  queryPred: String = "false"): String = {
    val w = dim / m
    val adc = s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $m), " +
      s"j -> f.flat[(j - 1) * $kSub + x.codes[j] + 1])), (acc, v) -> acc + v)"
    s"""WITH ${Similarity.kmeansCtes(s"(SELECT * FROM $table WHERE $trainPred)",
           idCol, vecCol, nCoarse, coarseIters)},
       |ccn AS (SELECT cent_id, c_vec, ${duckDot("c_vec", "c_vec")} AS cc2 FROM cent$coarseIters),
       |fbase AS (SELECT $idCol AS v_id, $vecCol AS vec FROM $table),
       |af AS (
       |  SELECT v_id, vec, cluster FROM (
       |    SELECT b.v_id, b.vec, c.cent_id AS cluster, row_number() OVER (
       |      PARTITION BY b.v_id
       |      ORDER BY round(${Similarity.duckCosine("b.vec", "c.c_vec")}, 6) DESC, c.cent_id ASC) AS rn
       |    FROM fbase b CROSS JOIN cent$coarseIters c) WHERE rn = 1),
       |residt AS (
       |  SELECT a.v_id, a.cluster,
       |    list_transform(generate_series(1, $dim), i -> a.vec[i]::DOUBLE - cc.c_vec[i]) AS rvec
       |  FROM a JOIN ccn cc ON a.cluster = cc.cent_id),
       |${pqTrainCtes("residt", "v_id", "rvec", dim, m, kSub, iters, p = "r")},
       |residf AS (
       |  SELECT a.v_id, a.cluster,
       |    list_transform(generate_series(1, $dim), i -> a.vec[i]::DOUBLE - cc.c_vec[i]) AS rvec
       |  FROM af a JOIN ccn cc ON a.cluster = cc.cent_id),
       |esub AS (SELECT v_id, j AS sub,
       |          list_transform(list_slice(rvec, j * $w + 1, (j + 1) * $w), x -> x::DOUBLE) AS svec
       |        FROM residf, UNNEST(generate_series(0, ${m - 1})) AS t(j)),
       |coarsesub AS (
       |  SELECT cent_id AS cluster, cc2, j AS sub,
       |         list_transform(list_slice(c_vec, j * $w + 1, (j + 1) * $w), x -> x::DOUBLE) AS cs_vec
       |  FROM ccn, UNNEST(generate_series(0, ${m - 1})) AS t(j)),
       |renc AS (
       |  SELECT v_id, cluster, list(code ORDER BY sub) AS codes, max(cc2) AS cc2,
       |         CAST(sum(CAST(c2 AS DECIMAL(28,12))) AS DOUBLE) AS sumc2,
       |         CAST(sum(CAST(dotcs AS DECIMAL(28,12))) AS DOUBLE) AS sumdot
       |  FROM (
       |    SELECT sub, v_id, cluster, cent_id AS code, c2, dotcs, cc2 FROM (
       |      SELECT s.sub, s.v_id, cs.cluster, c.cent_id, c.c2, cs.cc2,
       |             ${duckDot("cs.cs_vec", "c.c_vec")} AS dotcs,
       |             row_number() OVER (PARTITION BY s.sub, s.v_id
       |               ORDER BY round(${duckDist2("s.svec", "c.c_vec")}, 6) ASC, c.cent_id ASC) AS rn
       |      FROM esub s
       |      JOIN rcentf c ON s.sub = c.sub
       |      JOIN residf rr ON s.v_id = rr.v_id
       |      JOIN coarsesub cs ON rr.cluster = cs.cluster AND s.sub = cs.sub) WHERE rn = 1)
       |  GROUP BY v_id, cluster),
       |xn AS (SELECT v_id, cluster, codes, cc2 + 2 * sumdot + sumc2 AS xn2 FROM renc),
       |q AS (SELECT v_id AS q_id, vec FROM af WHERE $queryPred),
       |probes AS (
       |  SELECT q_id, cluster FROM (
       |    SELECT q.q_id, c.cent_id AS cluster, row_number() OVER (
       |      PARTITION BY q.q_id
       |      ORDER BY round(${Similarity.duckCosine("q.vec", "c.c_vec")}, 6) DESC, c.cent_id ASC) AS prn
       |    FROM q CROSS JOIN cent$coarseIters c) WHERE prn <= $nprobe),
       |probed AS (
       |  SELECT p.q_id, p.cluster, ${duckDot("q.vec", "cc.c_vec")} AS dotqc
       |  FROM probes p JOIN q ON p.q_id = q.q_id JOIN ccn cc ON p.cluster = cc.cent_id),
       |qdots AS (
       |  SELECT q.q_id, (c.sub * $kSub + c.cent_id) AS gi,
       |         ${duckDot(s"list_transform(list_slice(q.vec, c.sub * $w + 1, (c.sub + 1) * $w), x -> x::DOUBLE)", "c.c_vec")} AS dot
       |  FROM q CROSS JOIN rcentf c),
       |grid AS (SELECT q_id, gi FROM (SELECT DISTINCT q_id FROM q),
       |         UNNEST(generate_series(0, ${m * kSub - 1})) AS t(gi)),
       |qflat AS (
       |  SELECT g.q_id, list(coalesce(d.dot, 0.0::DOUBLE) ORDER BY g.gi) AS flat
       |  FROM grid g LEFT JOIN qdots d ON g.q_id = d.q_id AND g.gi = d.gi
       |  GROUP BY g.q_id),
       |qn AS (SELECT q_id, ${duckDot("vec", "vec")} AS q2 FROM q),
       |scored AS (
       |  SELECT f.q_id, x.v_id AS c_id,
       |         round(CASE WHEN n.q2 * x.xn2 = 0 THEN 0.0 ELSE (p.dotqc + $adc) / (sqrt(n.q2) * sqrt(x.xn2)) END, 6) AS sim
       |  FROM xn x
       |  JOIN probed p ON p.cluster = x.cluster
       |  JOIN qflat f ON f.q_id = p.q_id
       |  JOIN qn n ON n.q_id = f.q_id
       |  WHERE f.q_id <> x.v_id),
       |ranked AS (
       |  SELECT q_id, c_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, c_id, sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Twin of [[pqEncodePacked]]∘[[pqCentroids]] with the binary word
    * hex-serialized (same byte-hex fold as the packed-int8 oracle).
    */
  def pqCodesPackedHexSql(table: String, idCol: String, vecCol: String,
                          dim: Int, m: Int, kSub: Int, iters: Int): String =
    s"""WITH ${pqCtes(table, idCol, vecCol, dim, m, kSub, iters)}
       |SELECT v_id,
       |  list_reduce(list_prepend('', list_transform(codes,
       |    c -> upper(lpad(to_hex((c + 256) % 256), 2, '0')))),
       |    (a, b) -> a || b) AS codes_hex,
       |  round(xn2, 6) AS xn2
       |FROM enc""".stripMargin

  /** Twin of [[pqTopK]]. */
  def pqTopKSql(table: String, idCol: String, vecCol: String, k: Int,
                dim: Int, m: Int = 4, kSub: Int = 8, iters: Int = 2,
                queryPred: String = "false"): String = {
    val w = dim / m
    val adc = s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $m), " +
      s"j -> f.flat[(j - 1) * $kSub + e.codes[j] + 1])), (acc, v) -> acc + v)"
    s"""WITH ${pqCtes(table, idCol, vecCol, dim, m, kSub, iters)},
       |q AS (SELECT v_id AS q_id, vec FROM base WHERE $queryPred),
       |qdots AS (
       |  SELECT q.q_id, (c.sub * $kSub + c.cent_id) AS gi,
       |         ${duckDot(s"list_transform(list_slice(q.vec, c.sub * $w + 1, (c.sub + 1) * $w), x -> x::DOUBLE)", "c.c_vec")} AS dot
       |  FROM q CROSS JOIN centf c),
       |grid AS (SELECT q_id, gi FROM (SELECT DISTINCT q_id FROM q),
       |         UNNEST(generate_series(0, ${m * kSub - 1})) AS t(gi)),
       |qflat AS (
       |  SELECT g.q_id, list(coalesce(d.dot, 0.0::DOUBLE) ORDER BY g.gi) AS flat
       |  FROM grid g LEFT JOIN qdots d ON g.q_id = d.q_id AND g.gi = d.gi
       |  GROUP BY g.q_id),
       |qn AS (SELECT q_id, ${duckDot("vec", "vec")} AS q2 FROM q),
       |scored AS (
       |  SELECT f.q_id, e.v_id AS c_id,
       |         round(CASE WHEN n.q2 * e.xn2 = 0 THEN 0.0 ELSE $adc / (sqrt(n.q2) * sqrt(e.xn2)) END, 6) AS sim
       |  FROM enc e CROSS JOIN qflat f JOIN qn n ON f.q_id = n.q_id
       |  WHERE f.q_id <> e.v_id),
       |ranked AS (
       |  SELECT q_id, c_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, c_id, sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }
}
