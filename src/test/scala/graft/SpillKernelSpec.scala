package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spill probe's conclusion ("spilling changed nothing") is only as
  * strong as the kernel's determinism: if two clean runs could disagree,
  * fingerprint equality across heap sizes would prove nothing. Pinned
  * here at small n; SPILL.json records the forked tight-vs-ample runs. */
class SpillKernelSpec extends AnyFunSuite {
  import SparkTestSession._

  test("spill-probe kernel is deterministic across runs") {
    val a = SpillProbeMain.kernel(spark, 50000L).collect()(0).getString(0)
    val b = SpillProbeMain.kernel(spark, 50000L).collect()(0).getString(0)
    assert(a == b)
    assert(a.matches("[0-9a-f]{32}"))
  }

  test("spill-probe kernel fingerprint depends on every row") {
    val a = SpillProbeMain.kernel(spark, 50000L).collect()(0).getString(0)
    val c = SpillProbeMain.kernel(spark, 50001L).collect()(0).getString(0)
    assert(a != c)
  }
}
