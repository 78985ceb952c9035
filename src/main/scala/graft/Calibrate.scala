package graft

/** Dev tool: print the bench's box-speed calibration stamp standalone
  * (`runMain graft.Calibrate`) — lets a measurement session check the
  * box is in its fast regime BEFORE trusting a wall-clock reading,
  * instead of discovering drift from the stamp after a 15-minute run.
  * No Spark session; the probe is pure JVM compute+memory.
  */
object Calibrate {
  def main(args: Array[String]): Unit =
    println(Bench.calibrationJson())
}
