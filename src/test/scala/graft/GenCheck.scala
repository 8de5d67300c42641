package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic forAll over a ScalaCheck Gen (the
  * scalatestplus bridge isn't in the offline cache; build.sbt is fixed,
  * so we drive Gen directly with a pinned seed). */
object GenCheck {
  def forAllGen[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
}
