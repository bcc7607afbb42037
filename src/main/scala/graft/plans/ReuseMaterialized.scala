package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Analysis rule: substitute a named materialization for a plan subtree.
  *
  * `df.hint("GRAFT_REUSE", "name")` marks a subtree; if
  * `spark.graft.materializer.dir/<name>` holds a completed parquet
  * materialization (written via [[Materializer]] / `saveNamed`), the whole
  * subtree is replaced by a scan of it — Spark's optimizer then gets
  * column pruning and predicate pushdown on the cached copy instead of
  * recomputing the fragment. This is the declarative, planner-integrated
  * form of the reference Icache's "replay cached pairs instead of running
  * the map task" (`/root/reference/src/file_distributor/
  * fileserver.hh:556-585, 2259-2377`), minus its unsound keying.
  *
  * Attribute identity: the substituted scan is wrapped in a Project that
  * re-aliases its columns to the original subtree's exprIds, so references
  * above the hint keep resolving. If the cache is absent or its schema no
  * longer matches, the hint is a no-op (the subtree computes normally).
  */
case class ReuseMaterializedRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.materializer.dir"

  private def cacheComplete(dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.exists(new Path(dir, "_SUCCESS"))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, Seq(Literal(tag: UTF8String, _)), child)
        if name.equalsIgnoreCase("GRAFT_REUSE") && child.resolved =>
      val base = spark.conf.getOption(confKey).getOrElse("")
      val target = s"$base/${tag.toString}"
      if (base.isEmpty || !cacheComplete(target)) child
      else {
        val scan = spark.read.parquet(target).queryExecution.analyzed
        val byName = scan.output.map(a => a.name -> a).toMap
        // decline when the subtree has duplicate output names: two distinct
        // attributes would collapse onto one scan column and silently yield
        // wrong data rather than an analysis error
        val dupNames = child.output.map(_.name).size != child.output.map(_.name).distinct.size
        val sameSchema = !dupNames && child.output.forall(o =>
          byName.get(o.name).exists(_.dataType == o.dataType))
        if (!sameSchema) child
        else Project(
          child.output.map { o =>
            // parquet reads back nullable; where the original output was
            // non-nullable, restore that contract with a runtime-checked
            // AssertNotNull so downstream null-aware optimizations stay sound
            val a = byName(o.name)
            val e = if (a.nullable && !o.nullable) AssertNotNull(a) else a
            Alias(e, o.name)(exprId = o.exprId)
          },
          scan)
      }
  }
}

/** Companion helpers for the named-materialization workflow. */
object ReuseMaterialized {

  /** Write a completed materialization under the configured cache dir. */
  def saveNamed(spark: SparkSession, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val base = spark.conf.get("spark.graft.materializer.dir")
    df.write.mode("overwrite").parquet(s"$base/$name")
  }
}
