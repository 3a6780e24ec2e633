package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.model.TestData

/** Schema-bound loaders for the driver-supplied parquet tables.
  *
  * Scale posture: every read binds an explicit schema — mirroring the
  * reference's Glue job, which binds a pre-inferred schema to its staging
  * read (reference: toy_example/toy_glue.py:34-38) — so a 100 TB tree
  * never pays per-file schema inference/merging, and column pruning +
  * filter pushdown resolve against a stable schema.
  */
object Tables {
  private val schemas: Map[String, StructType] = Map(
    "events" -> TestData.eventRaw,
    "documents" -> TestData.document,
    "embeddings" -> TestData.embedding)

  /** Read `<dir>/<name>.parquet`, schema-bound when we model the table. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    schemas.get(name) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None    => spark.read.parquet(path) // TPC-H-ish dims: footer-only
    }
  }

  /** The events table's `ts` decode branches on the parquet footer's
    * declared timestamp unit instead of assuming one. The producer has
    * shipped the column as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * across testdata generations; hard-coding either silently corrupts the
    * other (a micros value put through the nanos path lands in January
    * 1970 — the same wrong-but-plausible failure class as the reference's
    * unvalidated hour-glob assumption, toy_glue.py:31 vs
    * toy_lambda_function.py:14). One bounded footer read (a few KB, cached
    * per path) resolves the unit; unknown units fail loudly rather than
    * decode garbage.
    *
    *  - NANOS: illegal for Spark's micros-based timestamp types, so bind
    *    LONG epoch-nanos via the documented `nanosAsLong` escape hatch and
    *    convert with integer division (double division would lose
    *    precision: 2024 epoch-nanos ≈ 1.7e18 > 2^53; the generator emits
    *    whole microseconds so the truncation is exact). The nanos flag is a
    *    per-read datasource option, NOT `spark.conf.set` — a session-wide
    *    set would silently change nanos semantics for every later parquet
    *    read in the session.
    *  - MICROS, isAdjustedToUTC=false: bind TIMESTAMP_NTZ — the lossless
    *    parquet mapping — then cast to TimestampType so downstream
    *    operators see one stable type. Every session in this engine pins
    *    `spark.sql.session.timeZone=UTC` (see EventOps Scaladoc), under
    *    which the NTZ→LTZ cast is the identity on the stored micros value,
    *    matching what DuckDB (the oracle) reads from the same file.
    *  - MICROS, isAdjustedToUTC=true: bind TimestampType DIRECTLY — the
    *    canonical parquet mapping for instant semantics. Forcing NTZ here
    *    would throw (Spark's reader refuses an adjusted column as NTZ:
    *    `ParquetSchemaConverter.validateTimestampNTZType`), so the adjusted
    *    flag must branch the bound schema, not just the unit. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    eventsTsUnit(spark, path) match {
      case (TimeUnit.NANOS, _) =>
        spark.read.schema(schemas("events"))
          .option("spark.sql.legacy.parquet.nanosAsLong", "true")
          .parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case (TimeUnit.MICROS, false) =>
        spark.read.schema(TestData.eventRawMicros)
          .parquet(path)
          .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case (TimeUnit.MICROS, true) =>
        spark.read.schema(TestData.eventRawMicrosAdjusted).parquet(path)
      case (other, adj) =>
        throw new IllegalStateException(
          s"events.parquet at $path stores ts as TIMESTAMP($other, isAdjustedToUTC=$adj); " +
            "this engine decodes NANOS and MICROS only - refusing to guess.")
    }
  }

  /** Footer-declared (time unit, isAdjustedToUTC) of the `ts` column,
    * cached per path (the footer is immutable for a given file set; one
    * probe per path per JVM). Probes the first parquet file when the path
    * is a directory. */
  private val tsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, (org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit, Boolean)]()

  private def eventsTsUnit(
      spark: SparkSession, path: String): (org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit, Boolean) =
    tsUnitCache.computeIfAbsent(path, { p =>
      import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
      footerReads.incrementAndGet()
      val conf = spark.sessionState.newHadoopConf()
      val hPath = new org.apache.hadoop.fs.Path(p)
      val fs = hPath.getFileSystem(conf)
      val file =
        if (fs.getFileStatus(hPath).isDirectory)
          fs.listStatus(hPath).map(_.getPath)
            .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).headOption
            .getOrElse(throw new IllegalStateException(s"no parquet files under $p"))
        else hPath
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val schema = r.getFooter.getFileMetaData.getSchema
        schema.getType(schema.getFieldIndex("ts")).asPrimitiveType().getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation => (t.getUnit, t.isAdjustedToUTC)
          case other => throw new IllegalStateException(
            s"events.parquet ts column is not a parquet TIMESTAMP (found: $other) in $file")
        }
      } finally r.close()
    })

  /** Fan a small-but-compute-heavy input out to all cores — but ONLY when
    * the scan itself is under-parallel. The local test files are
    * single-row-group parquet (the row group is the minimum scan split),
    * so expression-heavy per-row work (md5 shingling, json encode/decode,
    * cosine) would otherwise run on ONE task regardless of
    * `maxPartitionBytes`. A real multi-row-group/multi-file 100 TB table
    * already scans at ≥ defaultParallelism, so the exchange must become a
    * no-op there — repartitioning it would be a pointless full shuffle of
    * the fact table.
    *
    * The gate reads SCAN-LEVEL facts, not `df.rdd.getNumPartitions`:
    * byte-range splitting can report ≥ parallelism partitions while every
    * row sits in the single split holding the lone row group (a
    * single-row-group file larger than maxPartitionBytes), and `.rdd` on
    * an AQE shuffle-bearing plan materializes query stages as a side
    * effect. Order of checks, cheapest first:
    *  1. file inventory from the ANALYZED plan (no physical planning):
    *     ≥ parallelism files → certainly parallel, no-op;
    *  2. few parquet files → count row groups from their footers (capped
    *     at `target` files, each footer a few KB): row groups are the
    *     real minimum split unit, ≥ parallelism of them → no-op;
    *  3. non-file input (test-local relations): fall back to the planned
    *     partition count — such plans are scan-only, so no AQE stages
    *     can materialize.
    */
  def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project, SubqueryAlias}
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val plan = df.queryExecution.analyzed
    // spread is a SCAN-side knob: anything with a wide operator (join,
    // aggregate, repartition, ...) already owns its partitioning, and
    // probing `.rdd` there would materialize AQE query stages as a side
    // effect. Such plans pass through untouched rather than being probed.
    val narrowOnly = plan.collect { p =>
      p match {
        case _: Project | _: Filter | _: SubqueryAlias | _: LeafNode => true
        case _ => false
      }
    }.forall(identity)
    if (!narrowOnly) df
    else scanFiles(plan) match {
      case Some(files) if files.length >= target => df
      case Some(files) if files.nonEmpty && files.forall(_.endsWith(".parquet")) =>
        if (parquetRowGroups(spark, files, needed = target) >= target) df
        else df.repartition(target)
      case Some(_) => df // pruned-to-empty or non-parquet: nothing to gain
      case None =>
        // Narrow-only but not file-backed (test-local relations): the
        // physical plan is exchange-free, so the partition probe is safe.
        if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }

  /** PRUNED file inventory of the (single) file scan under the analyzed
    * plan: filter conjuncts that touch only partition columns are pushed
    * into `FileIndex.listFiles`, so a partition-pruned scan is gated on
    * the files it will actually read, not the whole table's listing
    * (`location.inputFiles` ignores pruning). Callers guarantee the plan
    * is narrow-only. */
  private def scanFiles(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    plan.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] => l
    } match {
      case Seq(rel) =>
        val fsRel = rel.relation.asInstanceOf[HadoopFsRelation]
        val partCols = fsRel.partitionSchema.fieldNames.toSet
        val partAttrs = AttributeSet(rel.output.filter(a => partCols.contains(a.name)))
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case And(l, r) => conjuncts(l) ++ conjuncts(r)
          case other     => Seq(other)
        }
        val partFilters = plan.collect { case f: Filter => conjuncts(f.condition) }
          .flatten
          .filter(c => c.deterministic && c.references.nonEmpty &&
            c.references.subsetOf(partAttrs))
        Some(fsRel.location.listFiles(partFilters, Nil)
          .flatMap(_.files.map(_.getPath.toString)))
      case _ => None
    }
  }

  /** Per-file row-group counts, cached for the JVM lifetime. Safe to key
    * by bare path: Spark part files carry a per-write UUID in the name
    * and are never mutated in place, so a path seen once keeps its
    * footer verdict — which makes REPEATED builds of the same query
    * footer-read-free ([[spread]] gates at every query build; at a
    * 109-query registry the probe ran per build). The observable
    * [[footerReads]] counter exists so TablesSpreadCacheSpec can assert
    * exactly that. File LISTINGS are separately cached by Spark's shared
    * FileStatusCache; only the footer opens were uncached. */
  private val rowGroupCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private[graft] val footerReads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Total row groups across `files` footers, early-exiting once `needed`
    * is reached (footers are KB-sized; this runs only when the file count
    * is already below parallelism, so at most `needed`-1 uncached reads). */
  private def parquetRowGroups(spark: SparkSession, files: Seq[String], needed: Int): Int = {
    val conf = spark.sessionState.newHadoopConf()
    var total = 0
    val it = files.iterator
    while (total < needed && it.hasNext) {
      total += rowGroupCache.computeIfAbsent(it.next(), { p =>
        footerReads.incrementAndGet()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try Integer.valueOf(r.getRowGroups.size) finally r.close()
      })
    }
    total
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
}
