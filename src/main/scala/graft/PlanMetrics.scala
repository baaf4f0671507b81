package graft

/** Executed-plan metrics shared by the PlanAudit tool and PlanSpec
  * (r12 verdict ask #2: the codegen evidence must come from the FINAL
  * plan — pre-execution AQE strings carry no `*(N)` markers). */
object PlanMetrics {
  /** Distinct whole-stage-codegen stage ids (`*(N)` markers) in an
    * executed plan string — 0 means nothing in the plan runs fused. */
  def wscStages(planStr: String): Int =
    "\\*\\((\\d+)\\)".r.findAllMatchIn(planStr).map(_.group(1)).toSet.size
}
