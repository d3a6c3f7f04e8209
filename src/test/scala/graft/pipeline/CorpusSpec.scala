package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$Sf/documents.parquet")

  test("deterministic split is stable under partitioning and corpus growth") {
    val full = Corpus.deterministicSplit(docs)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same assignment regardless of partition layout
    val reparted = Corpus.deterministicSplit(docs.repartition(7))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full === reparted)
    // a subset corpus assigns identically — growth never reassigns
    val subset = Corpus.deterministicSplit(docs.filter(col("doc_id") < 50))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset.forall { case (id, s) => full(id) == s })
    // fractions land near 80/10/10 (hash uniformity; loose bounds)
    val n = full.size.toDouble
    val frac = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.65 && frac("train") < 0.95)
    assert(frac.getOrElse("val", 0.0) < 0.25 && frac.getOrElse("test", 0.0) < 0.25)
  }

  test("sequence packing matches a sequential driver-side packer per stratum") {
    val got = Corpus.packSequences(docs, 200)
      .select("lang", "source", "doc_id", "n_tok", "bin").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    val input = docs
      .select(col("lang"), col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    assert(got.keySet === input.keySet)
    for ((stratum, rows) <- input) {
      var offset = 0L
      val want = rows.map { case (id, n) =>
        val bin = offset / 200
        offset += n
        (id, n, bin)
      }
      assert(got(stratum).toSeq === want.toSeq, s"stratum $stratum")
    }
  }

  test("negative sampling: k per anchor, never self, partition-invariant, hash-exact") {
    val got = Corpus.negativeSamples(docs, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = docs.count()
    assert(got.length === n * 3)
    assert(got.forall { case (a, _, neg) => neg != a && neg >= 0 && neg < n })
    // partition layout must not change the draw
    val reparted = Corpus.negativeSamples(docs.repartition(7), 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet === reparted.toSet)
    // replay the ring arithmetic driver-side for a few anchors
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val byKey = got.map(t => (t._1, t._2) -> t._3).toMap
    for (a <- Seq(0L, 7L, 42L); j <- 1 to 3) {
      val off = 1L + java.lang.Long.parseLong(md5hex(s"$a:$j").take(6), 16) % (n - 1)
      assert(byKey((a, j)) === (a + off) % n)
    }
  }

  test("temperature sampling keeps ceil(sqrt(cnt*mn)) per language, in md5 order") {
    val input = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = input.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val mn = counts.values.min
    def md5hex(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val want = input.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      val tgt = math.ceil(math.sqrt(counts(lang).toDouble * mn)).toLong
      rows.toSeq.map(_._1).sortBy(id => (md5hex(id), id)).take(tgt.toInt).map(id => (id, lang))
    }.toSet
    val got = Corpus.temperatureSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === want)
    // the smallest language is never cut: tgt = ceil(sqrt(mn*mn)) = mn
    val smallestLang = counts.minBy(_._2)._1
    assert(got.count(_._2 == smallestLang).toLong === mn)
  }
}
