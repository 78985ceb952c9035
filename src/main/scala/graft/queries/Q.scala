package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** One driver-checkable query: a Spark program plus (optionally) the
  * equivalent ANSI SQL for the DuckDB oracle. `oracle == None` → the
  * driver records a weaker rows-only check (used for ops whose semantics
  * DuckDB can't express, e.g. approximate ANN).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracleSql: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracleSql))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  /** Cross-engine-safe decimal cast (DuckDB and Spark agree on
    * double→decimal rounding off ties; we keep 4 fractional digits so the
    * 2-dp synthetic money values are exact).
    */
  def dec(c: Column): Column = c.cast(DecimalType(20, 4))

  /** Final-output decimal: pin precision so Spark's and DuckDB's agg
    * result types line up (DuckDB sum(DECIMAL(p,s)) → DECIMAL(38,s)).
    */
  def dec38(c: Column, scale: Int = 4): Column =
    c.cast(DecimalType(38, scale))
}
