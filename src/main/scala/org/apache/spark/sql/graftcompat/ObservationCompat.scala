package org.apache.spark.sql.graftcompat

import org.apache.spark.sql.{Observation, Row}

/** Non-blocking probe of an [[Observation]]'s result. The public API only
  * offers `Observation.get`, which blocks with no timeout — unusable on a
  * streaming driver thread that must bound its wait (see
  * `graft.ops.Transform.LateMarker.commit`). The internal
  * `getRowOrEmpty` is exactly the probe needed but is `private[spark]`;
  * this shim compiles against it from inside the access scope, so a
  * rename in a future Spark upgrade fails at COMPILE time instead of as a
  * runtime NoSuchMethodException mid-stream. */
object ObservationCompat {
  /** None = the observation has not fired yet; Some(row) = fired (fields
    * may be NULL for an empty batch). Never blocks. */
  def rowOption(obs: Observation): Option[Row] = obs.getRowOrEmpty
}
