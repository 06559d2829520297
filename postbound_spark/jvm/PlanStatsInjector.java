package postboundspark;

import org.apache.spark.sql.ExperimentalMethods;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.Statistics;
import org.apache.spark.sql.catalyst.trees.TreeNodeTag;
import org.apache.spark.sql.execution.SparkPlan;
import org.apache.spark.sql.execution.SparkStrategy;
import scala.Option;
import scala.collection.immutable.Seq;
import scala.math.BigInt;

/**
 * JVM-side plan-time statistics injection for Catalyst.
 *
 * Why a compiled helper: py4j flattens {@code scala.math.BigInt} (a
 * java.lang.Number) to a Python int in BOTH directions, so a
 * {@link Statistics} object can neither be built nor copied from the
 * Python side. Every BigInt stays strictly inside the JVM; the bridge
 * only carries decimal strings and plan references.
 *
 * Why a strategy: {@code QueryExecution.sparkPlan} plans against a
 * {@code clone()} of the optimized plan, and the clone resets every
 * node's {@code statsCache} - but it preserves tree-node TAGS. So the
 * Python side tags target nodes with the doctored Statistics, and this
 * class doubles as a {@link SparkStrategy} registered through
 * {@code ExperimentalMethods.extraStrategies}: extra strategies run
 * FIRST in every planning pass, so {@link #apply} walks the (cloned)
 * subtree, copies each tag into the node's statsCache, and declines to
 * produce a physical plan (empty Seq). Join-strategy selection and
 * build-side choice then read the injected numbers through the very
 * cache that was just seeded - zero writes, zero plan rewrites.
 *
 * Mirrors rbergm/PostBOUND's pg_lab cardinality hints
 * (postbound/postgres.py:2343-2460) which patch the planner's row
 * estimates for arbitrary intermediates at plan time.
 */
public final class PlanStatsInjector extends SparkStrategy {

    /** Tag carrying injected Statistics across plan clones. */
    public static final TreeNodeTag<Statistics> TAG =
            new TreeNodeTag<>("postbound_spark.injected_stats");

    private static BigInt big(String decimal) {
        return new BigInt(new java.math.BigInteger(decimal));
    }

    // ---- tagging API (called from Python before planning) ----

    /** Tag {@code plan} so every planning pass sees the injected numbers.
     *  Column-level stats are dropped on purpose: a researcher-chosen row
     *  count invalidates whatever histograms the default estimate had. */
    public void tag(LogicalPlan plan, String sizeInBytes, String rowCount) {
        Statistics doctored = new Statistics(
                big(sizeInBytes),
                Option.apply(big(rowCount)),
                Statistics.apply$default$3(),
                Statistics.apply$default$4());
        plan.setTagValue(TAG, doctored);
    }

    /** Remove injection tags and stale stats caches from the whole tree. */
    public void clearAll(LogicalPlan plan) {
        plan.unsetTagValue(TAG);
        plan.statsCache_$eq(Option.empty());
        Seq<LogicalPlan> kids = plan.children();
        for (int i = 0; i < kids.size(); i++) {
            clearAll((LogicalPlan) kids.apply(i));
        }
    }

    // ---- strategy side: seed statsCache from tags, never plan ----

    private void seed(LogicalPlan node) {
        Option<Statistics> tagged = node.getTagValue(TAG);
        if (tagged.isDefined()) {
            node.statsCache_$eq(tagged);
        }
        Seq<LogicalPlan> kids = node.children();
        for (int i = 0; i < kids.size(); i++) {
            seed((LogicalPlan) kids.apply(i));
        }
    }

    @Override
    @SuppressWarnings("unchecked")
    public Seq<SparkPlan> apply(LogicalPlan plan) {
        seed(plan);
        return (Seq<SparkPlan>) (Seq<?>) scala.collection.immutable.Nil$.MODULE$;
    }

    /** Register this instance as an extra planning strategy (idempotent:
     *  one registration per class name survives re-instantiation). */
    public void register(ExperimentalMethods experimental) {
        Seq<SparkStrategy> current = experimental.extraStrategies();
        java.util.ArrayList<SparkStrategy> next = new java.util.ArrayList<>();
        for (int i = 0; i < current.size(); i++) {
            SparkStrategy s = current.apply(i);
            if (s.getClass().getName().equals(getClass().getName())) {
                continue; // replace any previously loaded copy of us
            }
            next.add(s);
        }
        next.add(this);
        experimental.extraStrategies_$eq(
                scala.jdk.javaapi.CollectionConverters.asScala(next).toSeq());
    }

    /** Remove every registered copy of this strategy class, restoring the
     *  session's planner to its pre-injection state. Without this, the
     *  strategy keeps walking every plan tree on every planning pass for
     *  the rest of the session even after the experiment ends. */
    public void deregister(ExperimentalMethods experimental) {
        Seq<SparkStrategy> current = experimental.extraStrategies();
        java.util.ArrayList<SparkStrategy> next = new java.util.ArrayList<>();
        for (int i = 0; i < current.size(); i++) {
            SparkStrategy s = current.apply(i);
            if (!s.getClass().getName().equals(getClass().getName())) {
                next.add(s);
            }
        }
        experimental.extraStrategies_$eq(
                scala.jdk.javaapi.CollectionConverters.asScala(next).toSeq());
    }

    /** Number of registered copies of this strategy class (test hook). */
    public int registeredCount(ExperimentalMethods experimental) {
        Seq<SparkStrategy> current = experimental.extraStrategies();
        int n = 0;
        for (int i = 0; i < current.size(); i++) {
            if (current.apply(i).getClass().getName()
                    .equals(getClass().getName())) {
                n++;
            }
        }
        return n;
    }

    // ---- introspection (decimal strings keep BigInt JVM-side) ----

    /** The row count the planner would see for {@code plan} after tag
     *  seeding ("" when no estimate is available). */
    public String visibleRowCount(LogicalPlan plan) {
        seed(plan);
        Option<BigInt> rc = plan.stats().rowCount();
        return rc.isEmpty() ? "" : rc.get().toString();
    }

    /** The sizeInBytes the planner would see for {@code plan}. */
    public String visibleSizeInBytes(LogicalPlan plan) {
        seed(plan);
        return plan.stats().sizeInBytes().toString();
    }
}
