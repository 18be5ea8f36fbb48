package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** T63 goldens: the batch-perceptron trajectory matches an
  * independent pure-Scala replay bit-for-bit (same md5 bucketing,
  * same tie rule), the error trace falls on a separable fixture,
  * confusion cells partition the corpus, and reruns are identical. */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sw = Seq("the", "a", "of", "and", "is", "to", "in", "it")

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  /** The operator's md5-uniform feature hash, replayed locally. */
  private def bucket(word: String, buckets: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(word.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 7)
    (java.lang.Long.parseLong(hex, 16) % buckets).toInt
  }

  /** Pure-Scala batch perceptron over the same design matrix. */
  private def replay(
      texts: Seq[String], buckets: Int, epochs: Int, minHits: Int)
      : (Array[Long], Long, Seq[(Int, Long, Long, Long, Long, Long)]) = {
    val docs = texts.map(_.toLowerCase.split("\\s+").toSeq
      .filter(_.nonEmpty)).filter(_.nonEmpty)
    val labeled = docs.map { ws =>
      val y = if (ws.count(sw.contains) >= minHits) 1L else -1L
      val x = ws.groupBy(w => bucket(w, buckets))
        .map { case (b, g) => b -> g.size.toLong }
      (y, x)
    }
    val w = new Array[Long](buckets)
    var bias = 0L
    val trace = Seq.newBuilder[(Int, Long, Long, Long, Long, Long)]
    for (e <- 1 to epochs) {
      val mis = labeled.filter { case (y, x) =>
        val m = bias + x.map { case (b, c) => w(b) * c }.sum
        y * m <= 0L
      }
      mis.foreach { case (y, x) =>
        x.foreach { case (b, c) => w(b) += y * c }
      }
      bias += mis.map(_._1).sum
      trace += ((e, labeled.size.toLong, mis.size.toLong, bias,
        w.map(math.abs).sum,
        w.zipWithIndex.map { case (v, i) => v * (i + 1L) }.sum))
    }
    (w, bias, trace.result())
  }

  test("train: trajectory matches the independent pure-Scala replay " +
      "bit-for-bit; errors fall on a separable fixture; rerun " +
      "identical") {
    val texts = Seq(
      "the cat is in the hat and it is good",
      "a dog of the house is to be found in it",
      "qq ww ee rr tt yy uu",
      "zz xx cc vv bb nn mm qq ww",
      "the quick brown fox is a friend of it",
      "lorem ipsum dolor sit amet consectetur",
      "it is the best of times and the worst of it",
      "alpha beta gamma delta epsilon zeta")
    val df = corpus(texts: _*)
    val got = QualityClassifier.train(df, "doc_id", "text",
      buckets = 64, epochs = 4, stopwords = sw, minHits = 2)
    val (ew, ebias, etrace) = replay(texts, 64, 4, 2)
    assert(got.weights.toSeq === ew.toSeq)
    assert(got.bias === ebias)
    assert(got.trace.map(s => (s.epoch, s.nDocs, s.nMis, s.biasAfter,
      s.wL1After, s.wDotAfter)) === etrace)
    // epoch 1 updates on everything (w = 0 => ties are errors)
    assert(got.trace.head.nMis === texts.size.toLong)
    // the heuristic is linearly realizable over these buckets: the
    // error count must fall below the all-wrong start
    assert(got.trace.last.nMis < got.trace.head.nMis,
      s"no learning: ${got.trace}")
    // rerun identical
    val again = QualityClassifier.train(df, "doc_id", "text",
      buckets = 64, epochs = 4, stopwords = sw, minHits = 2)
    assert(again.weights.toSeq === got.weights.toSeq &&
      again.trace === got.trace)
  }

  test("confusion: cells partition the labeled corpus; margin sign " +
      "matches per-doc margins; zero margin predicts -1") {
    val texts = Seq(
      "the cat is in the hat",
      "qq ww ee rr",
      "a dog of the house is it",
      "zz xx cc vv bb")
    val df = corpus(texts: _*)
    val m = QualityClassifier.train(df, "doc_id", "text",
      buckets = 64, epochs = 3, stopwords = sw, minHits = 2)
    val cells = QualityClassifier.confusion(df, "doc_id", "text", m,
        stopwords = sw, minHits = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(cells.map(_._3).sum === texts.size.toLong)
    assert(cells.forall(c => c._1 == 1L || c._1 == -1L))
    assert(cells.forall(c => c._2 == 1L || c._2 == -1L))
    // a freshly-zero model (0 epochs is refused; emulate via a
    // zero-weight Trained) ties every margin at 0 -> predicts -1
    val zero = QualityClassifier.Trained(
      new Array[Long](64), 0L, Nil)
    val zc = QualityClassifier.confusion(df, "doc_id", "text", zero,
        stopwords = sw, minHits = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(zc.forall(_._2 === -1L))
    assert(zc.forall(_._4 === 0L))
  }
}
