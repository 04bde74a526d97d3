package graft

import graft.functions.VectorKernels
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/**
 * Beam-tree nearest-cell kernel (r18, VERDICT r17 #1): assignment
 * quality vs the exact O(k·dims) scan. The tree is the scale path for
 * dynamic-k quantizers (k = n/1024 grows with the corpus, so Lloyd
 * assignment was n²/1024 per iteration); it is APPROXIMATE above the
 * dispatch threshold, so these specs pin the deviation bound: top-1
 * agreement and top-3 recall floors on clustered data (the regime
 * every consumer — IVF blocking, feature stores, semantic dedup —
 * operates in), exact equality in the single-leaf regime, and
 * build determinism.
 */
class CentTreeSpec extends AnyFunSuite {

  private def ad(v: Array[Float]): ArrayData = ArrayData.toArrayData(v)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def mkCents(k: Int, dims: Int, seed: Int): Array[Array[Float]] = {
    val r = new scala.util.Random(seed)
    Array.fill(k)(Array.fill(dims)(r.nextFloat()))
  }

  test("cosine tree: top-1 agreement and quality floor on clustered data") {
    val k = 400; val dims = 32; val n = 2000
    val cents = mkCents(k, dims, 7)
    val tree = VectorKernels.buildCentTree(cents)
    val r = new scala.util.Random(11)
    var agree = 0; var quality = 0
    (0 until n).foreach { _ =>
      val v = cents(r.nextInt(k)).map(x =>
        x + (r.nextFloat() - 0.5f) * 0.05f)
      val exact = VectorKernels.nearestCellsJava(ad(v), cents, 1).getInt(0)
      val approx =
        VectorKernels.nearestCellsTreeJava(ad(v), tree, 1).getInt(0)
      if (exact == approx) agree += 1
      // a miss must still land on a NEAR centroid, not a random one —
      // the property candidate blocking actually relies on
      if (cosine(v, cents(approx)) >= cosine(v, cents(exact)) - 0.02)
        quality += 1
    }
    assert(agree.toDouble / n >= 0.95, s"top-1 agreement $agree/$n")
    assert(quality.toDouble / n >= 0.99, s"quality floor $quality/$n")
  }

  test("cosine tree: exact top-1 recalled in tree top-3 (probe blocking)") {
    val k = 400; val dims = 32; val n = 2000
    val cents = mkCents(k, dims, 19)
    val tree = VectorKernels.buildCentTree(cents)
    val r = new scala.util.Random(23)
    var recalled = 0
    (0 until n).foreach { _ =>
      val v = cents(r.nextInt(k)).map(x =>
        x + (r.nextFloat() - 0.5f) * 0.05f)
      val exact = VectorKernels.nearestCellsJava(ad(v), cents, 1).getInt(0)
      val probes = VectorKernels.nearestCellsTreeJava(ad(v), tree, 3)
      val got = (0 until probes.numElements()).map(probes.getInt)
      if (got.contains(exact)) recalled += 1
    }
    assert(recalled.toDouble / n >= 0.96, s"top-3 recall $recalled/$n")
  }

  test("L2 tree: top-1 agreement on clustered data") {
    val k = 400; val dims = 32; val n = 2000
    val cents = mkCents(k, dims, 31)
    val tree = VectorKernels.buildCentTree(cents, l2 = true)
    val r = new scala.util.Random(37)
    var agree = 0
    (0 until n).foreach { _ =>
      val v = cents(r.nextInt(k)).map(x =>
        x + (r.nextFloat() - 0.5f) * 0.05f)
      val exact = VectorKernels.nearestCellL2Java(ad(v), cents)
      val approx =
        VectorKernels.nearestCellsTreeJava(ad(v), tree, 1).getInt(0)
      if (exact == approx) agree += 1
    }
    assert(agree.toDouble / n >= 0.95, s"L2 top-1 agreement $agree/$n")
  }

  test("single-leaf regime (k <= leafCap) is EXACTLY the exhaustive scan") {
    val k = VectorKernels.TreeLeafCap; val dims = 16; val n = 300
    val cents = mkCents(k, dims, 43)
    val tree = VectorKernels.buildCentTree(cents)
    val r = new scala.util.Random(47)
    (0 until n).foreach { _ =>
      val v = Array.fill(dims)(r.nextFloat())
      val exact = VectorKernels.nearestCellsJava(ad(v), cents, 3)
      val approx = VectorKernels.nearestCellsTreeJava(ad(v), tree, 3)
      assert((0 until 3).forall(i => exact.getInt(i) == approx.getInt(i)))
    }
  }

  test("tree build is deterministic (pure function of the matrix)") {
    val cents = mkCents(500, 24, 53)
    val t1 = VectorKernels.buildCentTree(cents)
    val t2 = VectorKernels.buildCentTree(cents)
    val r = new scala.util.Random(59)
    (0 until 500).foreach { _ =>
      val v = Array.fill(24)(r.nextFloat())
      val a = VectorKernels.nearestCellsTreeJava(ad(v), t1, 2)
      val b = VectorKernels.nearestCellsTreeJava(ad(v), t2, 2)
      assert((0 until a.numElements()).forall(i =>
        a.getInt(i) == b.getInt(i)))
    }
    assert(t1.nodeVec.length == t2.nodeVec.length)
  }

  test("candidate shortfall falls back to the exhaustive scan") {
    // n larger than any leaf's candidate pool forces the fallback
    val cents = mkCents(200, 8, 61)
    val tree = VectorKernels.buildCentTree(cents, leafCap = 4)
    val v = Array.fill(8)(0.5f)
    val out = VectorKernels.nearestCellsTreeJava(ad(v), tree, 150)
    val exact = VectorKernels.nearestCellsJava(ad(v), cents, 150)
    assert(out.numElements() == 150)
    assert((0 until 150).forall(i => out.getInt(i) == exact.getInt(i)))
  }
}
