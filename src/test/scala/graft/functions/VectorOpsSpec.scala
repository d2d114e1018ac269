package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import VectorOps._

class VectorOpsSpec extends AnyFunSuite {

  test("dot, norm, cosine on dense doubles") {
    val a = Array(1.0, 2.0, 3.0)
    val b = Array(4.0, 5.0, 6.0)
    assert(dot(a, b) === 32.0)
    assert(math.abs(l2Norm(a) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(cosine(a, a) - 1.0) < 1e-12)
    assert(cosine(a, Array(0.0, 0.0, 0.0)) === 0.0) // zero vector → 0, not NaN
    val orth = cosine(Array(1.0, 0.0), Array(0.0, 1.0))
    assert(orth === 0.0)
  }

  test("sparse merge dot matches dense dot") {
    val ia = Array(0, 3, 7); val va = Array(1.0, 2.0, 3.0)
    val ib = Array(3, 5, 7); val vb = Array(10.0, 20.0, 30.0)
    assert(dotSparse(ia, va, ib, vb) === 2.0 * 10.0 + 3.0 * 30.0)
    assert(dotSparse(Array(), Array(), ib, vb) === 0.0)
  }

  test("cosineFloat matches double computation") {
    val a = Array(0.5f, 0.25f, 0.125f)
    val b = Array(0.25f, 0.5f, 1.0f)
    val exp = cosine(a.map(_.toDouble), b.map(_.toDouble))
    assert(math.abs(cosineFloat(a, b) - exp) < 1e-12)
  }

  test("analyze signature components are sane") {
    val dims = 8
    val u = 1.0 / math.sqrt(dims.toDouble)
    val unit = Array.fill(dims)(u)
    val ia = Array(1, 4); val va = Array(0.6, 0.8) // unit-norm sparse
    val sig = analyzeSparseVsDense(ia, va, unit, dims)
    assert(sig.length === 10)
    val cos = sig(0)
    assert(cos >= -1.0 && cos <= 1.0)
    assert(math.abs(sig(1) - math.acos(cos)) < 1e-12) // angleRad
    assert(math.abs(sig(2) - (0.6 * u + 0.8 * u)) < 1e-12) // dot
    assert(math.abs(sig(3) - 1.0) < 1e-12) // normA
    assert(math.abs(sig(4) - 1.0) < 1e-12) // normB (unit)
    assert(sig(5) >= 0.0 && sig(6) >= 0.0) // euclidean, manhattan
    assert(sig(8) === 2.0) // overlap = nnz of sparse side (unit is all-nonzero)
    assert(math.abs(sig(9) - 2.0 / 8.0) < 1e-12) // jaccard = 2/(2+8-2)
  }

  test("angleOfIdentity is deterministic and bounded") {
    val ia = Array(1, 4); val va = Array(0.6, 0.8)
    val a1 = angleOfIdentity(ia, va, 512)
    val a2 = angleOfIdentity(ia, va, 512)
    assert(a1 === a2)
    assert(a1 >= -1.0 && a1 <= 1.0)
    // the key depends on the value multiset (signature vs a uniform unit
    // vector is index-agnostic — same as the reference computation):
    assert(angleOfIdentity(Array(2, 5), Array(0.6, 0.8), 512) === a1)
    // ...so different value patterns must give different keys
    val b = angleOfIdentity(Array(1, 4), Array(0.8, 0.6), 512)
    val c = angleOfIdentity(Array(1, 4, 7), Array(0.5, 0.5, 0.7071), 512)
    assert(a1 !== c)
    assert(b === a1) // multiset {0.6,0.8} identical → same key
  }

  test("approximates tolerance compare") {
    assert(approximates(1.0, 1.005, 0.01))
    assert(!approximates(1.0, 1.02, 0.01))
  }
}
