package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashKernels, NGramKernels}
import graft.operators.TopKBuffer

/** Property-style tests (seeded random trials) for the hand-written
  * kernels — the pieces with imperative loops where an off-by-one
  * survives example tests.
  */
class KernelPropertySpec extends AnyFunSuite {
  private val trials = 300

  test("TopKBuffer equals sort-take for arbitrary inputs, ties included") {
    val rnd = new Random(7)
    (1 to trials).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      val rows = Seq.fill(n)((rnd.nextInt(10).toDouble, rnd.nextInt(31).toLong))
      val buf = new TopKBuffer(k)
      rows.foreach { case (s, i) => buf.add(s, i) }
      val expect = rows.sorted.take(k).map(_._2)
      assert(buf.sortedIds.toSeq == expect, s"k=$k rows=$rows")
    }
  }

  test("TopKBuffer merge equals union add") {
    val rnd = new Random(8)
    (1 to trials).foreach { _ =>
      val k = 1 + rnd.nextInt(6)
      def mk(n: Int) = Seq.fill(n)((rnd.nextInt(500).toDouble / 100, rnd.nextInt(100).toLong))
      val a = mk(20); val b = mk(20)
      val b1 = new TopKBuffer(k); a.foreach { case (s, i) => b1.add(s, i) }
      val b2 = new TopKBuffer(k); b.foreach { case (s, i) => b2.add(s, i) }
      b1.mergeFrom(b2)
      val all = new TopKBuffer(k); (a ++ b).foreach { case (s, i) => all.add(s, i) }
      assert(b1.sortedIds.toSeq == all.sortedIds.toSeq)
    }
  }

  test("TopKBuffer preserves ids beyond 2^53 exactly, including through serde") {
    // a Double-typed id slot silently collapses 2^53+1 and 2^53+2
    val base = 1L << 53
    val ids = Seq(base + 1, base + 2, base + 3, base + 5, base + 8)
    val buf = new TopKBuffer(4)
    ids.foreach(id => buf.add(1.0, id)) // equal scores → pure id tiebreak
    assert(buf.sortedIds.toSeq == ids.sorted.take(4))
    val agg = graft.operators.TopKByScore(null, null, 4)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sortedIds.toSeq == ids.sorted.take(4))
  }

  test("TopKDistinctBuffer kth equals kth over distinct ids, dup streams and merges included") {
    // the union-of-rings bound phase (r16) feeds the SAME candidate from
    // both ring projections: score is a function of id (the buffer's
    // contract), duplicates arrive both within one stream and across
    // merged partials, and the kth must count each id once
    val rnd = new Random(22)
    (1 to trials).foreach { _ =>
      val k = 1 + rnd.nextInt(6)
      val score = (0 until 40).map(id => id.toLong -> rnd.nextInt(9).toDouble).toMap
      def mk(n: Int) = Seq.fill(n)(rnd.nextInt(40).toLong).map(id => (score(id), id))
      val a = mk(rnd.nextInt(30)); val b = mk(rnd.nextInt(30))
      val b1 = new graft.operators.TopKDistinctBuffer(k); a.foreach { case (s, i) => b1.add(s, i) }
      val b2 = new graft.operators.TopKDistinctBuffer(k); b.foreach { case (s, i) => b2.add(s, i) }
      b1.mergeFrom(b2)
      val distinct = (a ++ b).distinct.map(_._1).sorted
      val expect =
        if (distinct.length < k) Double.PositiveInfinity else distinct(k - 1)
      assert(b1.kthScore == expect, s"k=$k a=$a b=$b")
      // serde round-trip preserves the kept set
      val agg = graft.operators.KthSmallestDistinctScore(null, null, k)
      assert(agg.deserialize(agg.serialize(b1)).kthScore == expect)
    }
  }

  test("kthScore equals the kth smallest score, +inf below k rows") {
    val rnd = new Random(21)
    (1 to trials).foreach { _ =>
      val k = 1 + rnd.nextInt(6)
      val rows = Seq.fill(rnd.nextInt(20))((rnd.nextInt(9).toDouble, rnd.nextInt(50).toLong))
      val buf = new TopKBuffer(k)
      rows.foreach { case (s, i) => buf.add(s, i) }
      val expect =
        if (rows.length < k) Double.PositiveInfinity else rows.map(_._1).sorted.apply(k - 1)
      assert(buf.kthScore == expect, s"k=$k rows=$rows")
    }
  }

  test("sortedHashes output is sorted, deduped, set-equal to input") {
    val rnd = new Random(9)
    (1 to trials).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(80))(rnd.nextLong() % 100)
      val out = NGramKernels.sortedHashes(xs.toArray)
      assert(out.toSeq == xs.distinct.sorted)
    }
  }

  test("intersectSize equals set intersection") {
    val rnd = new Random(10)
    (1 to trials).foreach { _ =>
      def mk = Seq.fill(rnd.nextInt(60))(rnd.nextInt(101).toLong - 50)
      val a = mk; val b = mk
      val sa = NGramKernels.sortedHashes(a.toArray)
      val sb = NGramKernels.sortedHashes(b.toArray)
      val got = NGramKernels.intersectSize(
        new GenericArrayData(sa), new GenericArrayData(sb))
      assert(got == sa.toSet.intersect(sb.toSet).size)
    }
  }

  test("charGramHashes count matches distinct sliding grams") {
    val rnd = new Random(11)
    (1 to trials).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(30))(('a' + rnd.nextInt(4)).toChar).mkString
      val n = 2 + rnd.nextInt(5)
      val out = NGramKernels.charGramHashes(UTF8String.fromString(s), n)
      val upper = math.max(s.length - n + 1, 1)
      val grams = (0 until upper).map(i => s.substring(i, math.min(i + n, s.length))).toSet
      assert(out.length == grams.size, s"s=$s n=$n")
    }
  }

  test("wordShingleHashes equals sliding-window distinct count") {
    val rnd = new Random(12)
    val vocab = Vector("a", "b", "cc", "dd", "eee")
    (1 to trials).foreach { _ =>
      val ws = Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val n = 1 + rnd.nextInt(4)
      val out = NGramKernels.wordShingleHashes(UTF8String.fromString(ws.mkString(" ")), n)
      val expect =
        if (ws.length < n) 0 else ws.sliding(n).map(_.mkString(" ")).toSet.size
      assert(out.length == expect, s"ws=$ws n=$n")
    }
  }

  test("rollingHash stays within modulus and separates short strings") {
    val rnd = new Random(13)
    val seen = scala.collection.mutable.Map.empty[Long, String]
    (1 to trials).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString
      val h = HashKernels.rollingHash(UTF8String.fromString(s))
      assert(h >= 0 && h < 2147483647L)
      seen.get(h).foreach(prev => assert(prev == s, s"collision: '$prev' vs '$s'"))
      seen(h) = s
    }
  }

  test("simhash is deterministic; empty bag is zero") {
    val rnd = new Random(14)
    (1 to 50).foreach { _ =>
      val tokens = Seq.fill(rnd.nextInt(30))(rnd.nextString(5))
      def arr = new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
      assert(HashKernels.simhash(arr) == HashKernels.simhash(arr))
    }
    assert(HashKernels.simhash(new GenericArrayData(Array.empty[Any])) == 0L)
  }
}

/** Round-4 kernels: seeded random trials against reference
  * implementations written independently of the kernel loops.
  */
class Round4KernelPropertySpec extends AnyFunSuite {
  private val trials = 300

  test("Sq8Encode round-trips within half a step for arbitrary grids and vectors") {
    val rnd = new Random(41)
    (1 to trials).foreach { _ =>
      val dim = 1 + rnd.nextInt(16)
      val lo = Array.fill(dim)(rnd.nextFloat() * 10 - 5)
      val step = Array.fill(dim)(rnd.nextFloat() * 0.1f + 1e-4f)
      val v = Array.tabulate(dim)(i =>
        lo(i) + rnd.nextFloat() * step(i) * 255)
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types._
      val enc = graft.functions.Sq8Encode(
        Literal(new GenericArrayData(v.map(x => x: Any)), ArrayType(FloatType)), lo, step)
      val code = enc.eval(null).asInstanceOf[Array[Byte]]
      assert(code.length == dim)
      code.indices.foreach { i =>
        val deq = lo(i) + (code(i) & 0xff) * step(i)
        assert(math.abs(deq - v(i)) <= step(i) * 0.5f * (1 + 1e-3f) + 1e-6f,
          s"dim $i: deq=$deq v=${v(i)} step=${step(i)}")
      }
    }
  }

  test("RepetitionStats matches a naive reference on random word soups") {
    val rnd = new Random(42)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    (1 to trials).foreach { _ =>
      val n = rnd.nextInt(30)
      val words = Seq.fill(n)(s"w${rnd.nextInt(5)}")
      val text = words.mkString(" ")
      val got = graft.functions.RepetitionStats(
        Literal(UTF8String.fromString(text), StringType))
        .eval(null).asInstanceOf[GenericArrayData].toDoubleArray()
      val ws = text.split(" ", -1).toSeq // "" → [""] like the kernel
      val grams2 = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val grams3 = ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val expect = Array[Double](
        ws.length,
        ws.groupBy(identity).values.map(_.size).max.toDouble / ws.length,
        if (ws.length > 1) grams2.groupBy(identity).values.map(_.size).max.toDouble / grams2.length else 0.0,
        if (ws.length > 2) 1.0 - grams3.distinct.length.toDouble / grams3.length else 0.0)
      assert(got.toSeq == expect.toSeq, s"text='$text'")
    }
  }

  test("BloomMightContain never yields a false negative, any fpp") {
    val rnd = new Random(43)
    (1 to 30).foreach { _ =>
      val n = 1 + rnd.nextInt(500)
      val items = Array.fill(n)(rnd.nextLong())
      val fpp = 0.01 + rnd.nextDouble() * 0.4
      val bf = org.apache.spark.util.sketch.BloomFilter.create(n, fpp)
      items.foreach(bf.putLong)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val expr = graft.functions.BloomMightContain(null, bos.toByteArray)
      items.foreach(x => assert(expr.mightContain(x), s"false negative on $x"))
    }
  }
}

class Round6KernelPropertySpec extends AnyFunSuite {
  private val trials = 200

  test("CovBuffer moments equal direct loops; merge and serde preserve them") {
    val rnd = new Random(61)
    (1 to trials).foreach { t =>
      val d = 1 + rnd.nextInt(8)
      val n = 1 + rnd.nextInt(30)
      val vecs = Seq.fill(n)(Array.fill(d)(rnd.nextFloat() * 2 - 1))
      def toAd(v: Array[Float]) = new GenericArrayData(v)
      // single buffer
      val one = new graft.ann.Pca.CovBuffer(d)
      vecs.foreach(v => one.add(toAd(v)))
      // split + merge at a random cut
      val cut = rnd.nextInt(n + 1)
      val a = new graft.ann.Pca.CovBuffer(d)
      val b = new graft.ann.Pca.CovBuffer(d)
      vecs.take(cut).foreach(v => a.add(toAd(v)))
      vecs.drop(cut).foreach(v => b.add(toAd(v)))
      a.mergeFrom(b)
      // direct reference sums
      val sum = Array.fill(d)(0.0)
      val prod = Array.fill(d * (d + 1) / 2)(0.0)
      vecs.foreach { v =>
        var idx = 0
        for (i <- 0 until d) {
          sum(i) += v(i)
          for (j <- i until d) { prod(idx) += v(i).toDouble * v(j); idx += 1 }
        }
      }
      Seq(("one", one), ("merged", a)).foreach { case (nm, buf) =>
        assert(buf.n == n, s"$nm count")
        (0 until d).foreach(i => assert(math.abs(buf.sum(i) - sum(i)) < 1e-9, s"$nm sum $i"))
        prod.indices.foreach(i => assert(math.abs(buf.prod(i) - prod(i)) < 1e-9, s"$nm prod $i"))
      }
      // serde round-trip
      val agg = graft.ann.Pca.CovMoments(null, d)
      val back = agg.deserialize(agg.serialize(one))
      assert(back.n == one.n && back.sum.sameElements(one.sum) &&
        back.prod.sameElements(one.prod), s"serde trial $t")
    }
  }

  test("audioDsp equals a direct reference loop on random PCM") {
    val rnd = new Random(62)
    (1 to trials).foreach { _ =>
      val n = rnd.nextInt(300)
      val fs = 1000 + rnd.nextInt(47000)
      val data = Array.fill(n)(rnd.nextInt(256).toByte)
      val bb = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
        .putInt(16).putShort(1).putShort(1).putInt(fs).putInt(fs)
        .putShort(1).putShort(8).put("data".getBytes("US-ASCII")).putInt(n)
      bb.put(data)
      val f = graft.multimodal.Multimodal.audioDsp(1L, bb.array())
      val xs = data.map(b => ((b & 0xff) - 128) / 128.0)
      val rms = if (n == 0) 0.0 else math.sqrt(xs.map(x => x * x).sum / n)
      val peak = if (n == 0) 0.0 else xs.map(math.abs).max
      val zcr = if (n <= 1) 0.0
        else xs.sliding(2).count { case Array(a, b) => (a >= 0) != (b >= 0) }.toDouble / (n - 1)
      assert(f.n_samples == n && f.sample_rate == fs)
      assert(math.abs(f.rms - rms) < 1e-12, s"rms ${f.rms} vs $rms")
      assert(math.abs(f.peak - peak) < 1e-12)
      assert(math.abs(f.zcr - zcr) < 1e-12, s"zcr ${f.zcr} vs $zcr")
    }
  }

  test("power iteration recovers a planted spectrum with orthonormal vectors") {
    val rnd = new Random(63)
    (1 to 40).foreach { t =>
      val d = 4 + rnd.nextInt(8)
      val k = 1 + rnd.nextInt(3)
      // random orthonormal Q via Gram-Schmidt on random vectors
      val q = Array.ofDim[Double](d, d)
      for (i <- 0 until d) {
        var v = Array.fill(d)(rnd.nextGaussian())
        for (j <- 0 until i) {
          val dp = (0 until d).map(x => v(x) * q(j)(x)).sum
          v = v.zipWithIndex.map { case (x, idx) => x - dp * q(j)(idx) }
        }
        val nrm = math.sqrt(v.map(x => x * x).sum)
        q(i) = v.map(_ / nrm)
      }
      // planted spectrum with clear gaps: d, d-1, ..., 1 scaled
      val lam = Array.tabulate(d)(i => (d - i).toDouble)
      val a = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- 0 until d)
        a(i)(j) = (0 until d).map(c => lam(c) * q(c)(i) * q(c)(j)).sum
      val (vals, vecs) = graft.ann.Pca.topEigen(a, k)
      (0 until k).foreach { c =>
        assert(math.abs(vals(c) - lam(c)) < 1e-6, s"trial $t eig $c: ${vals(c)} vs ${lam(c)}")
        val align = math.abs((0 until d).map(i => vecs(c)(i) * q(c)(i)).sum)
        assert(align > 1 - 1e-6, s"trial $t vec $c alignment $align")
        for (c2 <- 0 until c) {
          val dp = (0 until d).map(i => vecs(c)(i) * vecs(c2)(i)).sum
          assert(math.abs(dp) < 1e-6, s"trial $t vecs $c,$c2 not orthogonal")
        }
      }
    }
  }
}
