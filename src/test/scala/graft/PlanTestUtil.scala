package graft

import org.apache.spark.sql.DataFrame

/** Shared plan-assertion helper for the plan-contract specs. */
object PlanTestUtil {

  /** Final executed plan string (run the query so AQE finalizes; strip
    * the "== Initial Plan ==" echo so nothing is counted twice). */
  def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }
}
