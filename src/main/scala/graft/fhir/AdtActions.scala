package graft.fhir

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** ADT event-code decoding (ref: ADTActions()/get_action at
  * 01_dbignite_sample.py:410-414,440-441: a struct-returning SQL UDF mapping
  * e.g. "ADT_A01" → {admit, …}; the notebook documents the discharge
  * example at :413).
  */
final case class AdtAction(action: String, description: String)

object AdtActions {

  /** HL7 v2 ADT event codes observed in fixtures + the common set. */
  val actions: Map[String, AdtAction] = Map(
    "ADT_A01" -> AdtAction("admit", "Admit/visit notification"),
    "ADT_A02" -> AdtAction("transfer", "Transfer a patient"),
    "ADT_A03" -> AdtAction("discharge", "Discharge/end visit"),
    "ADT_A04" -> AdtAction("register", "Register a patient"),
    "ADT_A05" -> AdtAction("preadmit", "Pre-admit a patient"),
    "ADT_A08" -> AdtAction("update", "Update patient information"),
    "ADT_A09" -> AdtAction("track_departure", "Patient departing - tracking"),
    "ADT_A11" -> AdtAction("cancel_admit", "Cancel admit/visit notification"),
    "ADT_A28" -> AdtAction("create_person", "Add person information"),
    "ADT_A31" -> AdtAction("update_person", "Update person information"))

  /** Register the `get_action` SQL UDF — constructing the helper registers
    * it as a side effect in the reference; here it's explicit. Returns a
    * named struct so SQL can select `get_action(code).action`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("get_action",
      (code: String) => actions.get(code).orNull)

  /** Optimizer-visible alternative: a literal map lookup instead of an
    * opaque UDF (constant-foldable, codegen-friendly). */
  def getActionColumn(code: Column): Column = {
    val pairs = actions.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), struct(lit(v.action).as("action"),
        lit(v.description).as("description")))
    }
    element_at(map(pairs: _*), code)
  }
}
