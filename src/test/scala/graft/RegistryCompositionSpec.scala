package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Queries split (round-16 ask #9) must be behavior-neutral: the
  * composed registry is the same entries, same order, no duplicates,
  * and the family slices cover it exactly.
  */
class RegistryCompositionSpec extends AnyFunSuite {

  test("composed registry has no duplicate names and full oracle coverage") {
    val names = Queries.registry.map(_._1)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate registry names: ${dups.mkString(",")}")
    assert(Queries.queries.size === names.size)
    assert(Queries.oracleSql.size === names.size,
      "every registry query is oracle-gated (the round-10 invariant)")
  }

  test("registry count matches the declared round-19 surface") {
    // 273 at round 18 + ann_nsw_beam_sweep = 274
    assert(Queries.registry.size === 274,
      s"got ${Queries.registry.size}: update this pin when adding queries")
  }
}
