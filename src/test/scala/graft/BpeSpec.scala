package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("train: frequency-weighted argmax, greedy non-overlap, early stop") {
    // vocab {aaaa x2, aab x1}:
    //   round 1: (a,a) weighted 3*2 + 1 = 7 beats (a,b) 1 → aaaa = [aa,aa]
    //            (greedy left-to-right: candidates 1,2,3 → chosen 1,3),
    //            aab = [aa,b]
    //   round 2: (aa,aa) 2 beats (aa,b) 1 → aaaa = [aaaa]
    //   round 3: (aa,b) → aab = [aab]
    //   round 4: no adjacent pairs anywhere → early stop
    val vocab = Seq(("aaaa", 2L), ("aab", 1L)).toDF("w", "c")
    val t = Bpe.train(vocab, rounds = 8)
    assert(t.merges === Seq(("a", "a"), ("aa", "aa"), ("aa", "b")))
    val seg = t.vocabSeg.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sub")).toMap
    assert(seg === Map("aaaa" -> 1L, "aab" -> 1L))
  }

  test("train: lexicographic tie-break makes the merge order deterministic") {
    // equal counts → (a,b) < (c,d) lexicographically, both engines'
    // ASCII ordering — the property the oracle replay depends on
    val vocab = Seq(("cd", 1L), ("ab", 1L)).toDF("w", "c")
    val t = Bpe.train(vocab, rounds = 1)
    assert(t.merges === Seq(("a", "b")))
  }

  test("trainDriver equals relational train: merges and segmentation (randomized vocab)") {
    // deterministic pseudo-random vocabulary with engineered repeat
    // structure so several merge rounds have real competition and
    // ties; both trainers must agree round-for-round.
    val words = (0 until 60).map { i =>
      val base = "abcab" * (1 + i % 3) + ("xy" * (i % 4)) + s"${i % 10}"
      (base, (1L + (i * 7) % 5))
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
    val vocab = words.toDF("w", "c")
    val rel = Bpe.train(vocab, rounds = 6)
    val drv = Bpe.trainDriver(vocab, rounds = 6)
    assert(drv.merges == rel.merges,
      s"merge tables differ: ${drv.merges} vs ${rel.merges}")
    val relSeg = rel.vocabSeg.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val drvSeg = drv.vocabSeg.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(drvSeg == relSeg, s"segmentations differ")
  }

  test("applyMerge: odd-run greedy ('aaa' merges once, head-first)") {
    val state = Bpe.charState(Seq(("aaa", 1L)).toDF("w", "c"))
    val out = Bpe.applyMerge(state, "a", "a")
      .orderBy("pos").collect().map(_.getAs[String]("sym")).toSeq
    assert(out === Seq("aa", "a"))
  }
}
