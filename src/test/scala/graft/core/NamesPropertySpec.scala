package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative round-trips for the name grammars: any name built from the
  * accepted alphabet survives format → parse unchanged (the reference
  * documents the grammar only by example; this pins the space). Generators
  * run under fixed seeds so failures reproduce. */
class NamesPropertySpec extends AnyFunSuite {

  private val Trials = 200
  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def checkAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until Trials).foreach(i => f(sample(g, i.toLong)))

  // names can hold spaces and word chars — the delimiters (.~*[],&) are what
  // the grammar reserves
  private val namePart: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(7, Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
  } yield (head :: tail).mkString.trim

  private val member: Gen[String] = Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString)

  test("bracketed 3-part level names round-trip") {
    checkAll(Gen.zip(namePart, namePart, namePart)) { case (d, h, l) =>
      val ln = LevelName(d, h, l)
      assert(LevelName.parse(ln.toString) == Right(ln))
    }
  }

  test("2-part shorthand always equals dim==hier form") {
    checkAll(Gen.zip(namePart, namePart)) { case (d, l) =>
      assert(LevelName.parse(s"$d.$l") == Right(LevelName(d, d, l)))
    }
  }

  test("cuts round-trip members, masks and match mode") {
    val gen = Gen.zip(namePart, namePart, Gen.nonEmptyListOf(member),
      Gen.oneOf(true, false), Gen.oneOf(true, false))
    checkAll(gen) { case (d, l, ms, exclude, forMatch) =>
      val prefix = (if (exclude) "~" else "") + (if (forMatch) "*" else "")
      val raw = s"$prefix$d.$l.${ms.mkString(",")}"
      val want = CutSpec(LevelName(d, d, l), ms,
        if (exclude) Mask.Exclude else Mask.Include, forMatch)
      assert(CutSpec.parse(raw) == Right(want))
    }
  }

  test("constraints round-trip doubles") {
    val gen = Gen.zip(Gen.oneOf("eq", "neq", "lt", "lte", "gt", "gte"),
      Gen.chooseNum(-1e9, 1e9))
    checkAll(gen) { case (cmp, n) =>
      val c = Constraint.parse(s"$cmp.$n").toOption.get
      assert(c.n == n.toString.toDouble)
    }
  }

  test("limit parses any non-negative pair") {
    val gen = Gen.zip(Gen.chooseNum(0L, Long.MaxValue / 2), Gen.chooseNum(0L, Long.MaxValue / 2))
    checkAll(gen) { case (off, n) =>
      assert(LimitQuery.parse(s"$off,$n") == Right(LimitQuery(Some(off), n)))
      assert(LimitQuery.parse(s"$n") == Right(LimitQuery(None, n)))
    }
  }
}
