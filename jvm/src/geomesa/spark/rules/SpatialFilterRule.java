package geomesa.spark.rules;

import java.util.ArrayList;
import java.util.List;
import java.util.regex.Matcher;
import java.util.regex.Pattern;

import org.apache.spark.sql.catalyst.expressions.And;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.Cast;
import org.apache.spark.sql.catalyst.expressions.EqualTo;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GreaterThan;
import org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.In;
import org.apache.spark.sql.catalyst.expressions.LessThan;
import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.PythonUDF;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.execution.datasources.LogicalRelation;
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
 *  - the Filter must sit DIRECTLY on the scan relation (LogicalRelation),
 *    so `lon`/`lat`/`cell_bucket` are the relation's own stored columns --
 *    a subquery aliasing `lon+100 AS lon` interposes a Project and is
 *    (correctly) not matched;
 *  - only conjuncts that MUST hold are matched (And-split; anything under
 *    OR/NOT is not a conjunct);
 *  - the matched conjunct must pair a literal geometry with the row's OWN
 *    indexed position `st_point(lon, lat)` (bare column refs -- the
 *    write_partitioned layout contract).  A predicate over a derived
 *    point (`st_point(lon+100, lat)`) or over two literals constrains
 *    nothing about the row's bucket and is not matched;
 *  - any row point satisfying contains/intersects/within/covers against
 *    the literal intersects the literal, hence lies inside the bbox of
 *    the literal's vertices (region of a ring is inside its vertex bbox),
 *    so the row's bucket is one of the buckets covering that
 *    (epsilon-padded) bbox -- the IN list is complete;
 *  - st_dwithin(point, literal, r_meters) additionally pads the literal's
 *    bbox by the great-circle radius on the engine's sphere
 *    (R = 6371008.8 m, geo/kernels.py): exact latitude pad r/R rad; the
 *    longitude pad inverts the haversine at the worst padded latitude
 *    (sin(dLam/2) = sin(r/2R)/cos(phi_max)), falling back to the full
 *    longitude range when the pad crosses the antimeridian or reaches a
 *    pole (haversine wraps in longitude; the bucket grid does not);
 *  - on the Z3 layout (`time_bin=W/cell_bucket=B` dirs) literal timestamp
 *    conjuncts on the relation's timestamp column additionally inject
 *    `time_bin >= / <=` bounds (one-second slack each way, so
 *    unix_timestamp truncation semantics never matter).  The binned
 *    source column is identifiable only when the relation has EXACTLY
 *    one timestamp column -- with several, bounding the wrong one would
 *    drop rows, so the rule stands down;
 *  - the original predicate stays in the plan as the exact refine; a
 *    pattern miss degrades to a full scan, never a wrong answer;
 *  - the rule is idempotent: a condition already referencing
 *    `cell_bucket` (resp. `time_bin`) is left untouched, and an IN list
 *    that would cover every bucket is not injected.
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
  /** must match geo.kernels.EARTH_RADIUS_M */
  static final double EARTH_RADIUS_M = 6371008.8;
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
    // only rewrite a Filter sitting directly on the scan: that is the one
    // place where `lon`/`lat`/`cell_bucket`/`time_bin` are guaranteed to
    // be the STORED columns the layout was bucketed from (a Project in
    // between could alias a derived expression to those names).
    if (!(f.child() instanceof LogicalRelation)) {
      return f;
    }
    Attribute bucket = null;
    Attribute timeBin = null;
    Attribute tsCol = null;
    int nTsCols = 0;
    scala.collection.Iterator<Attribute> it = f.child().output().iterator();
    while (it.hasNext()) {
      Attribute a = it.next();
      if (a.name().equals("cell_bucket")) {
        bucket = a;
      } else if (a.name().equals("time_bin")) {
        timeBin = a;
      } else if (a.dataType().sameType(DataTypes.TimestampType)) {
        nTsCols++;
        tsCol = a;
      }
    }
    List<Expression> conjs = new ArrayList<>();
    splitAnd(f.condition(), conjs);
    List<Expression> injected = new ArrayList<>();

    if (bucket != null && !referencesName(f.condition(), "cell_bucket")) {
      Expression in = bucketIn(bucket, conjs);
      if (in != null) {
        injected.add(in);
      }
    }
    // Z3 layout: hive dirs time_bin=W/cell_bucket=B.  The binned source
    // column is only identifiable when the relation has EXACTLY ONE
    // timestamp column (write_partitioned keeps all columns, and its
    // time_col is necessarily one of them) -- with several, bounding the
    // wrong one would drop rows, so we stand down.
    if (timeBin != null && tsCol != null && nTsCols == 1
        && !referencesName(f.condition(), "time_bin")) {
      injected.addAll(timeBinBounds(timeBin, tsCol, conjs));
    }
    if (injected.isEmpty()) {
      return f;
    }
    Expression cond = f.condition();
    for (Expression e : injected) {
      cond = new And(e, cond);
    }
    return new Filter(cond, f.child());
  }

  /** the `cell_bucket IN (covered buckets)` conjunct for the first
   *  matching spatial predicate, or null. */
  static Expression bucketIn(Attribute bucket, List<Expression> conjs) {
    DataType dt = bucket.dataType();
    boolean isLong = dt.sameType(DataTypes.LongType);
    if (!isLong && !dt.sameType(DataTypes.IntegerType)) {
      return null; // unexpected layout -- leave untouched (sound)
    }
    double[] bbox = null;
    for (Expression c : conjs) {
      bbox = literalBBox(c);
      if (bbox != null) {
        break;
      }
    }
    if (bbox == null) {
      return null;
    }
    List<Long> buckets = bucketsFor(bbox);
    if (buckets.size() >= (1L << BUCKET_RES) * (1L << BUCKET_RES)) {
      return null; // covers every bucket -- nothing to prune
    }
    List<Expression> lits = new ArrayList<>();
    for (long b : buckets) {
      lits.add(isLong
          ? Literal.create(b, DataTypes.LongType)
          : Literal.create((int) b, DataTypes.IntegerType));
    }
    return new In(bucket, toSeq(lits));
  }

  /** seconds per time_bin -- must match plans.planner.TIME_BIN_DAYS. */
  static final long BIN_SECONDS = 86400L * 7;

  /** `time_bin >= lo` / `time_bin <= hi` conjuncts implied by literal
   *  timestamp bounds on the layout's (unique) timestamp column.  Bounds
   *  are slack by one second each way so the exact truncation semantics
   *  of unix_timestamp never matter (one extra bin at worst -- sound). */
  static List<Expression> timeBinBounds(
      Attribute timeBin, Attribute tsCol, List<Expression> conjs) {
    Long lo = null, hi = null;
    for (Expression c : conjs) {
      Expression l = null, r = null;
      boolean geq = false, leq = false, eq = false;
      if (c instanceof GreaterThanOrEqual) {
        l = ((GreaterThanOrEqual) c).left(); r = ((GreaterThanOrEqual) c).right(); geq = true;
      } else if (c instanceof GreaterThan) {
        l = ((GreaterThan) c).left(); r = ((GreaterThan) c).right(); geq = true;
      } else if (c instanceof LessThanOrEqual) {
        l = ((LessThanOrEqual) c).left(); r = ((LessThanOrEqual) c).right(); leq = true;
      } else if (c instanceof LessThan) {
        l = ((LessThan) c).left(); r = ((LessThan) c).right(); leq = true;
      } else if (c instanceof EqualTo) {
        l = ((EqualTo) c).left(); r = ((EqualTo) c).right(); eq = true;
      } else {
        continue;
      }
      Long micros = null;
      boolean colLeft;
      if (isNamedAttr(l, tsCol.name()) && (micros = tsMicros(r)) != null) {
        colLeft = true;
      } else if (isNamedAttr(r, tsCol.name()) && (micros = tsMicros(l)) != null) {
        colLeft = false;
      } else {
        continue;
      }
      long sec = Math.floorDiv(micros, 1_000_000L);
      long binLo = Math.floorDiv(sec - 1, BIN_SECONDS);
      long binHi = Math.floorDiv(sec + 1, BIN_SECONDS);
      // col >= lit (geq, colLeft) or lit >= col (geq, !colLeft == col <= lit)
      boolean lower = eq || (geq && colLeft) || (leq && !colLeft);
      boolean upper = eq || (leq && colLeft) || (geq && !colLeft);
      if (lower) {
        lo = (lo == null) ? binLo : Math.max(lo, binLo);
      }
      if (upper) {
        hi = (hi == null) ? binHi : Math.min(hi, binHi);
      }
    }
    List<Expression> out = new ArrayList<>();
    boolean isLong = timeBin.dataType().sameType(DataTypes.LongType);
    if (!isLong && !timeBin.dataType().sameType(DataTypes.IntegerType)) {
      return out; // unexpected layout -- leave untouched (sound)
    }
    if (lo != null && (isLong || (lo >= Integer.MIN_VALUE && lo <= Integer.MAX_VALUE))) {
      out.add(new GreaterThanOrEqual(timeBin, binLit(lo, isLong)));
    }
    if (hi != null && (isLong || (hi >= Integer.MIN_VALUE && hi <= Integer.MAX_VALUE))) {
      out.add(new LessThanOrEqual(timeBin, binLit(hi, isLong)));
    }
    return out;
  }

  static Literal binLit(long v, boolean isLong) {
    return isLong
        ? (Literal) Literal.create(v, DataTypes.LongType)
        : (Literal) Literal.create((int) v, DataTypes.IntegerType);
  }

  static boolean isNamedAttr(Expression e, String name) {
    return e instanceof AttributeReference
        && ((AttributeReference) e).name().equals(name);
  }

  /** micros-since-epoch of a TimestampType literal, else null. */
  static Long tsMicros(Expression e) {
    if (!(e instanceof Literal)) {
      return null;
    }
    Literal lit = (Literal) e;
    if (!lit.dataType().sameType(DataTypes.TimestampType) || lit.value() == null) {
      return null;
    }
    Object v = lit.value();
    return (v instanceof Long) ? (Long) v : null;
  }

  static void splitAnd(Expression e, List<Expression> out) {
    if (e instanceof And) {
      splitAnd(((And) e).left(), out);
      splitAnd(((And) e).right(), out);
    } else {
      out.add(e);
    }
  }

  static boolean referencesName(Expression e, String name) {
    if (e instanceof AttributeReference
        && ((AttributeReference) e).name().equals(name)) {
      return true;
    }
    scala.collection.Iterator<Expression> it = e.children().iterator();
    while (it.hasNext()) {
      if (referencesName(it.next(), name)) {
        return true;
      }
    }
    return false;
  }

  /** bbox the row's point must fall in for a matching conjunct, or null.
   *  Requires BOTH a literal geometry arg AND the row's own indexed
   *  position st_point(lon, lat) (bare column refs) -- a conjunct over
   *  two literals or a derived point constrains nothing about the row's
   *  bucket and must not prune. */
  static double[] literalBBox(Expression conj) {
    if (!(conj instanceof PythonUDF)) {
      return null;
    }
    PythonUDF udf = (PythonUDF) conj;
    String n = udf.name().toLowerCase();
    boolean isRelate = n.equals("st_contains") || n.equals("st_intersects")
        || n.equals("st_within") || n.equals("st_covers");
    boolean isDwithin = n.equals("st_dwithin");
    if (!isRelate && !isDwithin) {
      return null;
    }
    String wkt = null;
    boolean rowPoint = false;
    Double radius = null;
    scala.collection.Iterator<Expression> it = udf.children().iterator();
    while (it.hasNext()) {
      Expression child = it.next();
      String w = literalWkt(child);
      if (w != null && wkt == null) {
        wkt = w;
        continue;
      }
      if (isRowPoint(child)) {
        rowPoint = true;
        continue;
      }
      Double r = literalNumber(child);
      if (r != null && radius == null) {
        radius = r;
      }
    }
    if (wkt == null || !rowPoint) {
      return null;
    }
    double[] b = wktBBox(wkt);
    if (b == null) {
      return null;
    }
    if (isDwithin) {
      if (radius == null || !(radius >= 0.0) || Double.isInfinite(radius)) {
        return null;
      }
      return padForRadius(b, radius);
    }
    return b;
  }

  /** child is st_point(lon, lat) over BARE column refs with exactly the
   *  layout-contract names -- the only shape whose bucket the layout
   *  indexed. */
  static boolean isRowPoint(Expression e) {
    if (!(e instanceof PythonUDF)) {
      return false;
    }
    PythonUDF udf = (PythonUDF) e;
    String n = udf.name().toLowerCase();
    if (!(n.equals("st_point") || n.equals("st_makepoint"))) {
      return false;
    }
    if (udf.children().size() != 2) {
      return false;
    }
    Expression a = udf.children().apply(0);
    Expression b = udf.children().apply(1);
    return a instanceof AttributeReference
        && ((AttributeReference) a).name().equals("lon")
        && b instanceof AttributeReference
        && ((AttributeReference) b).name().equals("lat");
  }

  /** numeric Literal (int/long/float/double/decimal) as a double, else
   *  null.  Unwraps Cast: SQL `300000.0` parses as a Decimal literal and
   *  the UDF's double param wraps it in Cast(Literal) -- value-preserving
   *  for a radius. */
  static Double literalNumber(Expression e) {
    while (e instanceof Cast) {
      e = ((Cast) e).child();
    }
    if (!(e instanceof Literal)) {
      return null;
    }
    Object v = ((Literal) e).value();
    if (v == null) {
      return null;
    }
    if (v instanceof Number) {
      return ((Number) v).doubleValue();
    }
    try { // org.apache.spark.sql.types.Decimal is not a java.lang.Number
      return Double.parseDouble(v.toString());
    } catch (NumberFormatException ex) {
      return null;
    }
  }

  /** pad a lon/lat bbox so it contains every point within r_m great-circle
   *  meters (engine sphere R = EARTH_RADIUS_M) of the original box.  The
   *  latitude pad is exact (r/R radians); the longitude pad inverts the
   *  haversine at the worst |latitude| the padded box can reach
   *  (sin(dLam/2) = sin(r/2R) / cos(phi_max)).  When that pad crosses the
   *  antimeridian or a pole the returned lon range exceeds [-180, 180],
   *  which bucketsFor() reads as "every longitude column" (haversine
   *  wraps in longitude; the bucket grid does not).  1.001 safety factor:
   *  padding MORE is always sound. */
  static double[] padForRadius(double[] b, double rM) {
    double latPad = Math.toDegrees(rM / EARTH_RADIUS_M) * 1.001 + PAD;
    double lat0 = b[1] - latPad, lat1 = b[3] + latPad;
    double phiMax = Math.toRadians(
        Math.min(90.0, Math.max(Math.abs(lat0), Math.abs(lat1))));
    double s = Math.sin(Math.min(Math.PI / 2.0, rM / (2.0 * EARTH_RADIUS_M)));
    double c = Math.cos(phiMax);
    double lonPad;
    if (c <= 1e-12 || s / c >= 1.0) {
      lonPad = 361.0; // reaches a pole: every longitude is in range
    } else {
      lonPad = Math.toDegrees(2.0 * Math.asin(s / c)) * 1.001 + PAD;
    }
    return new double[] {
        b[0] - lonPad, Math.max(-90.0, lat0), b[2] + lonPad, Math.min(90.0, lat1)
    };
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
    if (bbox[0] < -180.0 || bbox[2] > 180.0) {
      x0 = 0; // padded range wraps the antimeridian: take every lon column
      x1 = n - 1;
    }
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
