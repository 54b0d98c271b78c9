package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import ScalableSessionReader.{compose, HeaderState, SegmentSummary}

/** The per-(partition, file) fold of the scalable reader's two-level
  * prefix scan is only sound if [[ScalableSessionReader.compose]] is
  * (a) associative and (b) equivalent to chaining the segments one by
  * one: the composed summary must report the same emitted-tail count
  * and final header state against EVERY possible incoming state. */
class SegmentMonoidSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var checked = 0
    (0 until n * 3).foreach { i =>
      if (checked < n) gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach { a => checked += 1; f(a) }
    }
    assert(checked > n / 2, s"generator too sparse: $checked of $n")
  }

  private val genSeg: Gen[SegmentSummary] = for {
    log <- Gen.option(Gen.choose(1, 5))
    arm <- Gen.option(Gen.oneOf("Actuators enabled", "Actuators disabled"))
    iv <- Gen.option(Gen.oneOf(0.001, 0.01))
    op <- Gen.choose(0L, 3L)
    t0 <- Gen.choose(0L, 9L)
    tl <- Gen.choose(0L, 9L)
    ta <- Gen.choose(0L, 9L)
    tb <- Gen.choose(0L, 9L)
  } yield SegmentSummary(0, 0, "f", log, arm, iv, op, t0, tl, ta, tb)

  private val incomings: Seq[HeaderState] = for {
    l <- Seq(None, Some(7))
    a <- Seq(None, Some("Actuators enabled"))
    i <- Seq(None, Some(0.005))
  } yield HeaderState(l, a, i)

  /** Reference: chain segments sequentially from `inc`, tracking the
    * running header state and the open-run row count the way phase 2
    * used to (one step per segment). */
  private def chain(segs: Seq[SegmentSummary], inc: HeaderState)
      : (HeaderState, Long, Long) =
    segs.foldLeft((inc, 0L, 0L)) { case ((st, opens, tail), s) =>
      val st2 = HeaderState(s.lastLogId.orElse(st.logId),
        s.lastArm.orElse(st.arm), s.lastInterval.orElse(st.interval))
      val tail2 =
        if (s.runOpeners > 0) s.emittedTail(st)
        else tail + s.emittedTail(st)
      (st2, opens + s.runOpeners, tail2)
    }

  private def viaCompose(segs: Seq[SegmentSummary], inc: HeaderState)
      : (HeaderState, Long, Long) = {
    val c = segs.reduce(compose)
    (HeaderState(c.lastLogId.orElse(inc.logId),
      c.lastArm.orElse(inc.arm), c.lastInterval.orElse(inc.interval)),
      c.runOpeners, c.emittedTail(inc))
  }

  test("compose == sequential chaining for every incoming state") {
    forAll(Gen.nonEmptyListOf(genSeg)) { segs =>
      incomings.foreach { inc =>
        assert(viaCompose(segs, inc) == chain(segs, inc),
          s"segs=$segs inc=$inc")
      }
    }
  }

  test("compose is associative") {
    forAll(Gen.zip(genSeg, genSeg, genSeg)) { case (a, b, c) =>
      assert(compose(compose(a, b), c) == compose(a, compose(b, c)))
    }
  }
}
