package graft.planner

/** Pre-flight memory admission — port of the reference's `MemoryGuard`
  * (reference `memory_guard.py:69-195`): complexity-class multiplier ×
  * input size vs available RAM with 80% headroom and a 1 GB floor.
  *
  * On Spark this is advisory (execution spills rather than OOMs), exactly
  * as SURVEY.md §4 notes — but the pre-flight warning is part of the
  * reference's capability surface, so the arithmetic is preserved.
  */
object MemoryGuard {

  /** memory_guard.py:165-171. */
  val multipliers: Map[String, Double] = Map(
    "simple" -> 1.2, "medium" -> 1.5, "complex" -> 2.5, "heavy" -> 4.0)

  final case class Estimate(
      inputGb: Double,
      complexity: String,
      multiplier: Double,
      estimatedGb: Double,
      availableGb: Double,
      fits: Boolean,
      recommendation: String)

  /** Available = 80% of (free - 1 GB floor) (memory_guard.py:100-102). */
  def availableGb(totalGb: Double = defaultTotalGb): Double =
    math.max(0.0, (totalGb - 1.0) * 0.8)

  private def defaultTotalGb: Double =
    Runtime.getRuntime.maxMemory().toDouble / (1L << 30)

  def check(facts: QueryFacts, inputGb: Double,
      totalRamGb: Double = defaultTotalGb): Estimate = {
    val cls = facts.complexityClass
    val mult = multipliers(cls)
    val est = inputGb * mult
    val avail = availableGb(totalRamGb)
    val fits = est <= avail
    Estimate(inputGb, cls, mult, est, avail, fits,
      if (fits) "OK to run locally"
      else f"Estimated $est%.1f GB exceeds available $avail%.1f GB - " +
        "route to cloud or raise executor memory")
  }
}
