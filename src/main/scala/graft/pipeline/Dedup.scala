package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Large-scale deduplication operators for a training-data pipeline.
  *
  * All operators are pure DataFrame→DataFrame, shuffle-aware, and
  * keep no driver-side state — the candidate-generation stages are
  * the classic linear-shuffle shapes (hash groupBy, MinHash-LSH band
  * buckets, SimHash chunk buckets, blocking keys) that avoid the
  * O(n²) all-pairs comparison at 100 TB; the exact verification step
  * only runs on the candidate pairs those stages emit.
  */
object Dedup {

  // ------------------------------------------------------------ exact

  /** Exact-duplicate groups by content hash: one shuffle on the hash.
    * At scale this is the cheapest dedup pass and runs first.
    */
  def exactHashGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))

  /** Keep one representative per exact-content group (arbitrary
    * survivor — cheapest form, Spark picks per-partition-first).
    */
  def dropExactDuplicates(docs: DataFrame): DataFrame =
    docs.withColumn("__h", md5(col("text"))).dropDuplicates("__h").drop("__h")

  /** Deterministic variant: keep the minimum doc_id per content
    * group (one extra window shuffle; required when downstream
    * results must be reproducible, e.g. the oracle-verified
    * curation pipeline).
    */
  def dropExactDuplicatesKeepFirst(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ------------------------------------------------------------ minhash + LSH

  val NumHashes = 128
  val Bands = 32
  val RowsPerBand = NumHashes / Bands

  /** k-word shingle sets per document (distinct). */
  def wordShingles(docs: DataFrame, k: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(
        col("doc_id"),
        expr(s"array_distinct(transform(sequence(0, size(w) - $k), " +
          s"i -> concat_ws(' ', ${(0 until k).map(j => s"w[i + $j]").mkString(", ")})))")
          .as("shingles"))

  /** 128-hash MinHash signature per doc: one explode + one groupBy
    * shuffle on doc_id. Each shingle string is hashed once; the k-th
    * hash function is xxhash64(h1, k) over the fixed-width long
    * (single mixing round), same independence for LSH banding.
    *
    * Shape note: a 128-column `min(...)` aggregate exceeds Spark's
    * default whole-stage-codegen field limit
    * (spark.sql.codegen.maxFields=100) and would drop to the
    * interpreted aggregate path; we raise the limit so the buffer
    * updates stay compiled. (The higher-order-function alternative —
    * one array column, 128 array_min(transform(...)) — is worse:
    * lambda bodies are interpreted per element.)
    */
  def minhashSignatures(shingled: DataFrame, numHashes: Int = NumHashes): DataFrame = {
    shingled.sparkSession.conf.set("spark.sql.codegen.maxFields", "256")
    val ex = shingled
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h1"))
    val mins = (0 until numHashes).map(k =>
      min(xxhash64(col("h1"), lit(k))).as(s"h$k"))
    ex.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(k => col(s"h$k")): _*).as("sig"))
  }

  /** LSH banding: hash each band of the signature, bucket-join docs
    * sharing a (band, bandSig) bucket. Shuffles on the bucket key —
    * candidate volume is ~linear for any realistic duplicate rate.
    * (A production run at 100 TB would additionally cap pathological
    * bucket sizes; the synthetic fixtures don't produce any.)
    */
  def lshCandidatePairs(signatures: DataFrame, bands: Int = Bands, rowsPerBand: Int = RowsPerBand): DataFrame = {
    val bandTbl = signatures
      .select(
        col("doc_id"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> struct(b AS band, hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand), b) AS bsig))")).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
    bandTbl.as("x")
      .join(bandTbl.as("y"), Seq("band", "bsig"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-duplicate detection with exact-Jaccard
    * verification of the candidates. With 128 hashes / 32 bands of 4
    * the probability of missing a pair at jaccard ≥ 0.8 is
    * 1-(1-0.8⁴)³² ≈ 5e-8, so the output equals the brute-force
    * ground truth (which the DuckDB oracle computes).
    */
  def nearDuplicates(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    // the shingle table feeds three consumers (signatures + both
    // sides of the exact-verify join) — persist it once instead of
    // re-tokenizing the corpus thrice (at scale: a checkpoint of the
    // shingle table, the standard shape for multi-pass dedup)
    val sh = wordShingles(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = lshCandidatePairs(minhashSignatures(sh))
    // verify on xxhash64'd shingle sets: integer intersection instead
    // of UTF8-string hashing per element; distinct-set sizes (hence
    // jaccard) are unchanged barring a 64-bit collision (~1e-14 over
    // this corpus — far below any other nondeterminism floor)
    val hashed = sh.select(col("doc_id"), expr("transform(shingles, s -> xxhash64(s))").as("hs"))
    val sa = hashed.select(col("doc_id").as("id_a"), col("hs").as("sa"))
    val sb = hashed.select(col("doc_id").as("id_b"), col("hs").as("sb"))
    pairs
      .join(sa, "id_a")
      .join(sb, "id_b")
      .select(
        col("id_a"), col("id_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jac0"))
      .filter(col("jac0") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac0"), 4).as("jac"))
  }

  // ------------------------------------------------------------ simhash

  /** 64-bit SimHash over word hashes: per-bit vote sums (one groupBy
    * shuffle), bits recombined into a single long.
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("hw", xxhash64(col("w")))
    val votes = (0 until 64).map(i =>
      sum(when(expr(s"shiftright(hw, $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i"))
    val bits = (0 until 64).map(i =>
      expr(s"IF(b$i > 0, CAST(${1L << i} AS BIGINT), CAST(0 AS BIGINT))"))
    tok.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ bitwiseOR _).as("sig"))
  }

  /** SimHash near-dup pairs at hamming distance ≤ maxHamming: bucket
    * by 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ some chunk of 4 is
    * identical), verify with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhashSignatures(docs)
    val chunks = sig.select(
      col("doc_id"), col("sig"),
      explode(expr("transform(sequence(0, 3), c -> struct(c AS chunk, shiftright(sig, c * 16) & 65535 AS cv))")).as("ch"))
      .select(col("doc_id"), col("sig"), col("ch.chunk").as("chunk"), col("ch.cv").as("cv"))
    chunks.as("x")
      .join(chunks.as("y"), Seq("chunk", "cv"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        expr("bit_count(x.sig ^ y.sig)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------------ n-gram jaccard (blocked)

  /** Character-n-gram Jaccard over *blocked* pairs — provenance
    * blocking (same lang + source) plus a length window, the
    * standard near-linear dedup shape when a natural blocking key
    * exists. (Unblocked near-dup discovery is [[nearDuplicates]]'s
    * MinHash-LSH job; character n-grams have too much background
    * similarity for LSH to separate thresholds below ~0.8.)
    *
    * The *predicate* (same lang+source, |n_chars diff| ≤ maxLenDiff,
    * jaccard ≥ threshold) is deterministic so the oracle reproduces
    * the exact pair set; the *execution* equi-joins on
    * (lang, source, length-band) — banding n_chars by maxLenDiff
    * multiplies the key space so no single block becomes one skewed
    * task. A qualifying pair differs by at most one band, so the
    * left side emits bands {k-1, k, k+1} and the residual
    * |diff| ≤ maxLenDiff filter restores exactness — each qualifying
    * pair matches on exactly one of the three keys.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5, maxLenDiff: Int = 20): DataFrame = {
    // grams carried as xxhash64 ints: set sizes (hence jaccard) are
    // unchanged barring a 64-bit collision; integer intersection is
    // several times cheaper than string intersection per pair
    val g = docs
      .filter(length(col("text")) >= n)
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        (col("n_chars") / maxLenDiff).cast("int").as("band"),
        expr(s"array_distinct(transform(sequence(1, length(text) - ${n - 1}), " +
          s"i -> xxhash64(substr(text, i, $n))))").as("g"))
    val left = g
      .select(
        col("doc_id").as("id_a"), col("lang"), col("source"), col("n_chars").as("nc_a"), col("g").as("ga"),
        explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
    val right = g.select(
      col("doc_id").as("id_b"), col("lang"), col("source"), col("n_chars").as("nc_b"), col("g").as("gb"), col("band"))
    left.join(right, Seq("lang", "source", "band"))
      .where(col("id_a") < col("id_b") && abs(col("nc_a") - col("nc_b")) <= maxLenDiff)
      .select(
        col("id_a"), col("id_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb")))).as("jac0"))
      .filter(col("jac0") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac0"), 4).as("jac"))
  }

  // ------------------------------------------------------------ embedding cosine

  /** Embedding-space near-duplicates: cosine ≥ threshold over all
    * id-ordered pairs. Norms are computed once per vector; the
    * pairing is a theta join (BroadcastNestedLoop locally; at 100 TB
    * this operator is the *verification* stage behind
    * [[graft.pipeline.Similarity.signBuckets]]-style candidate
    * generation, never an all-pairs scan).
    */
  def embeddingNearDuplicates(embs: DataFrame, threshold: Double = 0.45): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding"), Vectors.norm("embedding").as("nrm"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        round(Vectors.cosine("va", "vb", col("na"), col("nb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
