package graft.catalog

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import BandPools._
import EnsureRealmConfig.HRange

/** Property pins for the round-10 pure folds: random pool forests and
  * grant sets must uphold the reference's structural invariants
  * (placement.rs band-owner dominance; handle_allocation.rs fail-closed
  * directory; shard/mod.rs digest permutation invariance). Deterministic
  * seeds — scalacheck generators drawn via pureApply. */
class PoolPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int, base: Long): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(base + i)))

  private val nodeGen = Gen.oneOf("a", "b", "c", "d")
  private val bandGen = Gen.choose(0L, 40L)

  private val poolGen: Gen[BPool] = for {
    id <- Gen.choose(0, 11).map("p" + _)
    parent <- Gen.option(Gen.choose(0, 11).map("p" + _))
    issuer <- nodeGen
    owner <- nodeGen
    b1 <- bandGen
    w <- Gen.choose(1L, 10L)
  } yield BPool(id, parent, issuer, owner, bandStart(b1), bandStart(b1 + w))

  private val forestGen = Gen.listOfN(8, poolGen)

  test("spans are per-owner disjoint and lie inside an owned valid pool") {
    samples(forestGen, 200, 42L).foreach { pools =>
      val spans = allSpans(pools)
      // pairwise disjoint across ALL owners: a band has at most one owner
      for (Seq((o1, s1, e1), (o2, s2, e2)) <- spans.combinations(2))
        assert(e1 <= s2 || e2 <= s1,
          s"overlapping spans ($o1,$s1,$e1) ($o2,$s2,$e2) in $pools")
      // every span sits inside SOME valid pool owned by its owner
      spans.foreach { case (o, s, e) =>
        assert(pools.exists(p => poolIsValid(pools, p) && p.owner == o &&
          p.start <= s && e <= p.end),
          s"span ($o,$s,$e) escapes owned pools in $pools")
      }
    }
  }

  test("spans are input-order independent") {
    samples(forestGen, 200, 7L).foreach { pools =>
      assert(allSpans(pools.reverse).toSet == allSpans(pools).toSet)
    }
  }

  test("removing invalid pools never invalidates a valid pool") {
    samples(forestGen, 200, 99L).foreach { pools =>
      val validSet = pools.filter(poolIsValid(pools, _))
      val keptIds = validSet.map(_.id).toSet
      val dropped = pools.filterNot(poolIsValid(pools, _))
        .filterNot(p => keptIds.contains(p.id))
      if (dropped.nonEmpty) {
        val remaining = pools.diff(dropped)
        validSet.foreach { p =>
          assert(poolIsValid(remaining, p),
            s"removing invalid ${dropped.map(_.id)} flipped ${p.id} in $pools")
        }
      }
    }
  }

  private val grantGen: Gen[HRange] = for {
    id <- Gen.choose(0, 9).map("g" + _)
    owner <- nodeGen
    s <- Gen.choose(3L, 5000L)
    w <- Gen.choose(1L, 2000L)
  } yield HRange(id, owner, s, s + w)

  test("granted_to ranges are pairwise disjoint and owner-pure") {
    samples(Gen.listOfN(8, grantGen), 300, 5L).foreach { grants =>
      for (n <- Seq("a", "b")) {
        val g = EnsureRealmConfig.grantedTo(grants, n)
        assert(g.forall(_.owner == n))
        for (Seq(x, y) <- g.combinations(2))
          assert(x.end <= y.start || y.end <= x.start,
            s"granted_to returned overlap $x $y from $grants")
      }
    }
  }

  test("free band never intersects any stored grant and is band-aligned") {
    samples(Gen.listOfN(6, grantGen), 300, 17L).foreach { grants =>
      val spans = Seq((3L, 3L + 8 * 1024L))
      EnsureRealmConfig.freeBandIn(spans, grants).foreach { case (s, e) =>
        assert(e - s == 1024L && (s - 3) % 1024 == 0)
        assert(!grants.exists(r => r.start < e && s < r.end),
          s"free band ($s,$e) intersects $grants")
      }
    }
  }

  test("manifest digest is permutation-invariant and injective on sets") {
    val entryGen = for {
      doc <- Gen.choose(1, 30)
      gen <- Gen.choose(1L, 4L)
    } yield ShardVerify.canonicalEntryBytes(
      s"doc-$doc".getBytes("UTF-8"), gen,
      Array.fill[Byte](16)(doc.toByte), Array.fill[Byte](32)(7), gen)
    val listGen = Gen.listOfN(12, entryGen)
    samples(Gen.zip(listGen, listGen), 200, 31L).foreach { case (xs, ys) =>
      val dx = ShardVerify.entrySetDigest(xs)
      val shuffled = new scala.util.Random(xs.length.toLong)
        .shuffle(xs)
      assert(ShardVerify.entrySetDigest(shuffled).sameElements(dx))
      val dy = ShardVerify.entrySetDigest(ys)
      val same = xs.map(_.toSeq).sorted(SeqByteOrd) ==
        ys.map(_.toSeq).sorted(SeqByteOrd)
      assert(dx.sameElements(dy) == same,
        "digest equality must coincide with multiset equality")
    }
  }

  private object SeqByteOrd extends Ordering[Seq[Byte]] {
    def compare(a: Seq[Byte], b: Seq[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }
}
