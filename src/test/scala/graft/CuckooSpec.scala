package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Cuckoo

/** Unit contract of the cuckoo seen-sketch (graft.engine.Cuckoo): no
  * false negatives (including under overflow degradation), sane fp
  * rate, deletion, and equal-size merge. The engine-level bloom/cuckoo
  * golden parity lives in EngineGoldenSpec. */
class CuckooSpec extends AnyFunSuite {

  private def keys(n: Int, seed: Long): Array[Long] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextLong())
  }

  test("no false negatives at sized load") {
    val ks = keys(20000, 1L)
    val f = Cuckoo.sizeFor(ks.length)
    ks.foreach(Cuckoo.add(f, _))
    assert(!Cuckoo.overflowed(f), "sized filter must not overflow")
    assert(ks.forall(Cuckoo.mightContain(f, _)))
  }

  test("false-positive rate well under 1% with 16-bit fingerprints") {
    val ks = keys(20000, 2L)
    val f = Cuckoo.sizeFor(ks.length)
    ks.foreach(Cuckoo.add(f, _))
    val probes = keys(20000, 99L)
    val fps = probes.count(Cuckoo.mightContain(f, _))
    assert(fps < 200, s"fp count $fps") // expect ~0.01%, allow 1%
  }

  test("remove deletes an inserted key; the rest stay present") {
    val ks = keys(5000, 3L)
    val f = Cuckoo.sizeFor(ks.length)
    ks.foreach(Cuckoo.add(f, _))
    val (gone, kept) = ks.splitAt(2500)
    gone.foreach(k => assert(Cuckoo.remove(f, k), s"remove $k"))
    // one remove deletes exactly one copy of the key's fingerprint, so
    // every still-inserted key keeps its own copy — never a false
    // negative on survivors (the cuckoo-filter deletion contract)
    assert(kept.forall(Cuckoo.mightContain(f, _)))
  }

  test("equal-size merge is a union; mixed-size merge degrades, never loses") {
    val a = keys(4000, 4L); val b = keys(4000, 5L)
    val fa = Cuckoo.sizeFor(8000); val fb = Cuckoo.sizeFor(8000)
    a.foreach(Cuckoo.add(fa, _)); b.foreach(Cuckoo.add(fb, _))
    val m = Cuckoo.merge(fa, fb)
    assert((a ++ b).forall(Cuckoo.mightContain(m, _)))
    // mixed sizes: conservative degradation (answers true for all)
    val small = Cuckoo.sizeFor(100)
    Cuckoo.add(small, 42L)
    val mixed = Cuckoo.merge(m, small)
    assert(Cuckoo.overflowed(mixed))
    assert((a ++ b :+ 42L).forall(Cuckoo.mightContain(mixed, _)))
  }

  test("property: arbitrary insert/remove interleavings never yield a false negative") {
    import GenCheck.forAllGen
    import org.scalacheck.Gen
    // ops: (key, insert|remove-inserted); a removed key leaves the
    // live set, every key in the live set must stay present
    val opsGen = for {
      n <- Gen.choose(50, 400)
      keys <- Gen.listOfN(n, Gen.long)
      removeMask <- Gen.listOfN(n, Gen.prob(0.3))
    } yield (keys, removeMask)
    forAllGen(opsGen, n = 60) { case (keys, removeMask) =>
      val f = Cuckoo.sizeFor(keys.length)
      val live = scala.collection.mutable.Set.empty[Long]
      keys.foreach { k => Cuckoo.add(f, k); live += k }
      keys.zip(removeMask).foreach { case (k, rm) =>
        if (rm && live.remove(k)) Cuckoo.remove(f, k)
      }
      live.foreach(k => assert(Cuckoo.mightContain(f, k), s"lost $k"))
    }
  }

  test("overflow is sticky and degrades to always-true (no false negatives ever)") {
    val f = Cuckoo.sizeFor(64) // tiny table
    val ks = keys(20000, 6L)
    ks.foreach(Cuckoo.add(f, _))
    assert(Cuckoo.overflowed(f))
    assert(ks.forall(Cuckoo.mightContain(f, _)))
    assert(keys(1000, 77L).forall(Cuckoo.mightContain(f, _)))
  }
}
