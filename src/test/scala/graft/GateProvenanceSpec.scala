package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RecallReport

/** Threshold provenance: `GATES_r16.json` (written by
  * `tools.GateRecord`) records the measured value behind every
  * recall/error gate at each shipped SF. This spec ties the committed
  * evidence to the live constants: a `GateThresholds` edit without
  * regenerated measurements — or a threshold the recorded evidence
  * does not clear at EVERY shipped SF — fails the build. Thresholds
  * change by re-measuring, not by editing a constant.
  */
class GateProvenanceSpec extends AnyFunSuite {

  private val Line =
    """"([a-z0-9_]+)":\s*\{"threshold":\s*(-?\d+)((?:,\s*"sf[0-9.]+":\s*-?\d+)+)\}""".r
  private val Sf = """"(sf[0-9.]+)":\s*(-?\d+)""".r

  private def recorded(): Map[String, (Int, Map[String, Int])] = {
    val src = scala.io.Source.fromFile("GATES_r16.json", "UTF-8")
    val text = try src.mkString finally src.close()
    Line.findAllMatchIn(text).map { m =>
      val sfs = Sf.findAllMatchIn(m.group(3))
        .map(s => s.group(1) -> s.group(2).toInt).toMap
      m.group(1) -> (m.group(2).toInt, sfs)
    }.toMap
  }

  test("every live threshold is backed by committed measurements at all shipped SFs") {
    val rec = recorded()
    val live = RecallReport.GateThresholds.toMap
    assert(rec.keySet === live.keySet,
      "GATES_r16.json must record exactly the live gate set — regenerate with tools.GateRecord")
    for ((gate, t) <- live) {
      val (recT, sfs) = rec(gate)
      assert(recT === t,
        s"$gate: threshold $t differs from the recorded $recT — " +
          "re-run tools.GateRecord so the edit carries measurement evidence")
      assert(sfs.size >= 3, s"$gate: expected measurements at 3 shipped SFs")
      for ((sf, v) <- sfs) {
        assert(v >= 0, s"$gate@$sf: measurement missing (-1)")
        assert(RecallReport.passes(gate, v, t),
          s"$gate: threshold $t is NOT cleared by the recorded $sf measurement $v — " +
            "a threshold must be supported by evidence at every shipped SF")
      }
    }
  }
}
