package geomesa.spark.rules;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;

/**
 * ``spark.sql.extensions`` entry point: Spark instantiates this class
 * (no-arg ctor) and invokes it as ``Function1[SparkSessionExtensions,
 * Unit]`` at session build; it injects {@link SpatialFilterRule} into the
 * operator-optimization batch.  Enable with::
 *
 *   --conf spark.sql.extensions=geomesa.spark.rules.GeoSparkExtensions
 *   --conf spark.driver.extraClassPath=<repo>/jvm/classes
 *
 * (driver classpath only -- optimizer rules never ship to executors).
 */
public class GeoSparkExtensions
    extends scala.runtime.AbstractFunction1<SparkSessionExtensions, scala.runtime.BoxedUnit> {

  @Override
  public scala.runtime.BoxedUnit apply(SparkSessionExtensions ext) {
    ext.injectOptimizerRule(
        new scala.runtime.AbstractFunction1<SparkSession, Rule<LogicalPlan>>() {
          @Override
          public Rule<LogicalPlan> apply(SparkSession session) {
            return new SpatialFilterRule();
          }
        });
    return scala.runtime.BoxedUnit.UNIT;
  }
}
