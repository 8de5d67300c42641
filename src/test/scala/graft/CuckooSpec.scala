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
    // a TRUE interleaving in the engine's regime (keys are UNIQUE url
    // hashes — at most one live copy each; the upstream dedup never
    // re-adds a live key): inserts and removes interleave freely,
    // removed keys get re-inserted later, relocation churn happens
    // against a part-filled table. Every live key must probe true and
    // the sized table must never degrade. (Multiset saturation — many
    // COPIES of one fingerprint exceeding its pair's 8 slots — is a
    // genuine capacity bound, exercised by the overflow test below.)
    val opsGen = for {
      pool <- Gen.listOfN(300, Gen.long)
      n <- Gen.choose(200, 700)
      ops <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 299), Gen.prob(0.35)))
    } yield (pool, ops)
    forAllGen(opsGen, n = 60) { case (pool, ops) =>
      val f = Cuckoo.sizeFor(300)
      val live = scala.collection.mutable.Set.empty[Long]
      ops.foreach { case (ki, wantRemove) =>
        val k = pool(ki)
        if (wantRemove && live(k)) {
          assert(Cuckoo.remove(f, k), s"remove of live $k failed")
          live -= k
        } else if (!live(k)) {
          Cuckoo.add(f, k)
          live += k
        }
      }
      assert(!Cuckoo.overflowed(f),
        s"sized table degraded at ${live.size} live keys")
      live.foreach(k => assert(Cuckoo.mightContain(f, k), s"lost $k"))
    }
  }

  test("property: a deliberately OVER-CAP table (driven far past the 50% " +
    "design load) never false-negatives under insert/remove interleavings") {
    import GenCheck.forAllGen
    import org.scalacheck.Gen
    // the round-7 cap-degradation regime: the table is sized for 64
    // keys and the interleaving drives thousands through it, so sticky
    // overflow MUST fire mid-run — removes stop landing (remove
    // returns false once overflowed, the key conservatively stays
    // live), inserts become no-ops, and the contract that survives is
    // exactly the engine's: every key inserted and not successfully
    // removed still probes true, before, across, and after the
    // degradation point.
    val opsGen = for {
      pool <- Gen.listOfN(4000, Gen.long)
      ops <- Gen.listOfN(6000, Gen.zip(Gen.choose(0, 3999), Gen.prob(0.25)))
    } yield (pool, ops)
    forAllGen(opsGen, n = 20) { case (pool, ops) =>
      val f = Cuckoo.sizeFor(64) // deliberately over-cap for this drive
      val live = scala.collection.mutable.Set.empty[Long]
      var degradedAt = -1
      ops.zipWithIndex.foreach { case ((ki, wantRemove), i) =>
        val k = pool(ki)
        if (wantRemove && live(k)) {
          val did = Cuckoo.remove(f, k)
          if (did) live -= k // un-removed keys stay live (conservative)
          else assert(Cuckoo.overflowed(f),
            s"remove of live $k failed on a non-degraded table")
        } else if (!live(k)) {
          Cuckoo.add(f, k)
          live += k
        }
        if (degradedAt < 0 && Cuckoo.overflowed(f)) {
          degradedAt = i
          // the degradation boundary itself must not lose anything
          live.foreach(x => assert(Cuckoo.mightContain(f, x),
            s"lost $x at the degradation point"))
        }
      }
      assert(degradedAt >= 0,
        "drive never degraded the over-cap table — the property is vacuous")
      live.foreach(k => assert(Cuckoo.mightContain(f, k),
        s"false negative $k on the degraded table"))
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
