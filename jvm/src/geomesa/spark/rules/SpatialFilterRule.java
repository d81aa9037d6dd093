package geomesa.spark.rules;

import java.util.ArrayList;
import java.util.List;
import java.util.regex.Matcher;
import java.util.regex.Pattern;

import org.apache.spark.sql.catalyst.expressions.And;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.In;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.PythonUDF;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;

/**
 * The genuine JVM Catalyst rule (SURVEY.md 4.5 stretch goal; GeoMesa's
 * SpatialOptimizationsRule analogue, public tree geomesa-spark-sql/.../
 * SQLRules.scala -- reference mount empty at survey time): arbitrary user
 * SQL whose WHERE clause has a TOP-LEVEL CONJUNCT of the form
 * st_contains/st_intersects/st_within/st_covers over a literal
 * st_geomFromWKT(...) against a table carrying a `cell_bucket` column
 * (the engine's partitioned layouts) gets `cell_bucket IN (covered
 * buckets)` injected invisibly, so Catalyst directory-prunes the scan.
 *
 * Soundness (never changes results):
 *  - only conjuncts that MUST hold are matched (And-split; anything under
 *    OR/NOT is not a conjunct);
 *  - any geometry satisfying one of those predicates against the literal
 *    intersects the literal, hence intersects the bbox of the literal's
 *    vertices (region of a ring is inside its vertex bbox), so the row's
 *    point bucket is one of the buckets covering that (epsilon-padded)
 *    bbox -- the IN list is complete;
 *  - the original predicate stays in the plan as the exact refine; a
 *    pattern miss degrades to a full scan, never a wrong answer;
 *  - the rule is idempotent: a condition already referencing
 *    `cell_bucket` is left untouched.
 *
 * Scope is intentionally the high-value core (literal-vs-column bbox
 * pruning on point layouts at the fixed bucket resolution); the Python
 * SqlEngine remains the richer surface (XZ layouts, attribute index,
 * time bins, corridor covers).  Compiled with plain javac against the
 * pyspark distribution's own jars -- no Scala compiler needed (Scala
 * interop via scala.runtime.AbstractPartialFunction).
 */
public class SpatialFilterRule extends Rule<LogicalPlan> {
  /** must match plans.planner.BUCKET_RES */
  static final int BUCKET_RES = 4;
  static final double PAD = 1e-9;
  static final Pattern COORD = Pattern.compile(
      "(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][-+]?[0-9]+)?)\\s+" +
      "(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][-+]?[0-9]+)?)");

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    return plan.transformUp(
        new scala.runtime.AbstractPartialFunction<LogicalPlan, LogicalPlan>() {
          @Override
          public boolean isDefinedAt(LogicalPlan p) {
            return p instanceof Filter;
          }

          @Override
          @SuppressWarnings("unchecked")
          public <A1 extends LogicalPlan, B1> B1 applyOrElse(
              A1 x, scala.Function1<A1, B1> dflt) {
            if (x instanceof Filter) {
              return (B1) rewrite((Filter) x);
            }
            return dflt.apply(x);
          }
        });
  }

  LogicalPlan rewrite(Filter f) {
    Attribute bucket = null;
    scala.collection.Iterator<Attribute> it = f.child().output().iterator();
    while (it.hasNext()) {
      Attribute a = it.next();
      if (a.name().equals("cell_bucket")) {
        bucket = a;
      }
    }
    if (bucket == null || referencesBucket(f.condition())) {
      return f;
    }
    DataType dt = bucket.dataType();
    boolean isLong = dt.sameType(DataTypes.LongType);
    if (!isLong && !dt.sameType(DataTypes.IntegerType)) {
      return f; // unexpected layout -- leave untouched (sound)
    }
    List<Expression> conjs = new ArrayList<>();
    splitAnd(f.condition(), conjs);
    double[] bbox = null;
    for (Expression c : conjs) {
      bbox = literalBBox(c);
      if (bbox != null) {
        break;
      }
    }
    if (bbox == null) {
      return f;
    }
    List<Expression> lits = new ArrayList<>();
    for (long b : bucketsFor(bbox)) {
      lits.add(isLong
          ? Literal.create(b, DataTypes.LongType)
          : Literal.create((int) b, DataTypes.IntegerType));
    }
    Expression in = new In(bucket, toSeq(lits));
    return new Filter(new And(in, f.condition()), f.child());
  }

  static void splitAnd(Expression e, List<Expression> out) {
    if (e instanceof And) {
      splitAnd(((And) e).left(), out);
      splitAnd(((And) e).right(), out);
    } else {
      out.add(e);
    }
  }

  static boolean referencesBucket(Expression e) {
    if (e instanceof AttributeReference
        && ((AttributeReference) e).name().equals("cell_bucket")) {
      return true;
    }
    scala.collection.Iterator<Expression> it = e.children().iterator();
    while (it.hasNext()) {
      if (referencesBucket(it.next())) {
        return true;
      }
    }
    return false;
  }

  /** bbox of the literal geometry in a matching predicate conjunct, or null. */
  static double[] literalBBox(Expression conj) {
    if (!(conj instanceof PythonUDF)) {
      return null;
    }
    PythonUDF udf = (PythonUDF) conj;
    String n = udf.name().toLowerCase();
    if (!(n.equals("st_contains") || n.equals("st_intersects")
        || n.equals("st_within") || n.equals("st_covers"))) {
      return null;
    }
    scala.collection.Iterator<Expression> it = udf.children().iterator();
    while (it.hasNext()) {
      Expression child = it.next();
      String wkt = literalWkt(child);
      if (wkt != null) {
        double[] b = wktBBox(wkt);
        if (b != null) {
          return b;
        }
      }
    }
    return null;
  }

  /** child is st_geomFromWKT/<alias>(Literal string) -> the WKT text, else null. */
  static String literalWkt(Expression e) {
    if (!(e instanceof PythonUDF)) {
      return null;
    }
    PythonUDF udf = (PythonUDF) e;
    String n = udf.name().toLowerCase();
    if (!(n.equals("st_geomfromwkt") || n.equals("st_geomfromtext")
        || n.equals("st_geometryfromtext"))) {
      return null;
    }
    if (udf.children().size() != 1) {
      return null;
    }
    Expression arg = udf.children().head();
    if (arg instanceof Literal && ((Literal) arg).value() != null) {
      return ((Literal) arg).value().toString();
    }
    return null;
  }

  static double[] wktBBox(String wkt) {
    Matcher m = COORD.matcher(wkt);
    double lon0 = Double.POSITIVE_INFINITY, lat0 = Double.POSITIVE_INFINITY;
    double lon1 = Double.NEGATIVE_INFINITY, lat1 = Double.NEGATIVE_INFINITY;
    boolean any = false;
    while (m.find()) {
      double x = Double.parseDouble(m.group(1));
      double y = Double.parseDouble(m.group(2));
      lon0 = Math.min(lon0, x);
      lat0 = Math.min(lat0, y);
      lon1 = Math.max(lon1, x);
      lat1 = Math.max(lat1, y);
      any = true;
    }
    return any ? new double[] {lon0, lat0, lon1, lat1} : null;
  }

  static List<Long> bucketsFor(double[] bbox) {
    long n = 1L << BUCKET_RES;
    long x0 = grid(bbox[0] - PAD, -180.0, 360.0, n);
    long x1 = grid(bbox[2] + PAD, -180.0, 360.0, n);
    long y0 = grid(bbox[1] - PAD, -90.0, 180.0, n);
    long y1 = grid(bbox[3] + PAD, -90.0, 180.0, n);
    List<Long> out = new ArrayList<>();
    for (long x = x0; x <= x1; x++) {
      for (long y = y0; y <= y1; y++) {
        out.add(morton(x, y));
      }
    }
    return out;
  }

  static long grid(double v, double lo, double span, long n) {
    long g = (long) Math.floor((v - lo) / span * n);
    return Math.max(0, Math.min(n - 1, g));
  }

  static long morton(long x, long y) {
    long r = 0;
    for (int i = 0; i < 32; i++) {
      r |= ((x >> i) & 1L) << (2 * i);
      r |= ((y >> i) & 1L) << (2 * i + 1);
    }
    return r;
  }

  static scala.collection.immutable.Seq<Expression> toSeq(List<Expression> l) {
    return scala.jdk.javaapi.CollectionConverters.asScala(l).toSeq();
  }
}
