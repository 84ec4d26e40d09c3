package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a DETERMINISTIC synthetic corpus generator —
  * `spark.read.format("synthdocs").option("rows", …).load()` yields a
  * reproducible documents table with zero storage, at any scale, from
  * any number of executors (the rate-source idea, but for corpus
  * load-testing: soak a 1000-executor dedup job on 10 B rows without
  * first paying to write 10 B rows).
  *
  * Layout: `rows` ids split evenly across `partitions` generator
  * splits (each split is pure compute — no shuffle, no skew, linear
  * scaling). Content derives from md5(seed|id|…): engine-portable, so
  * an external system can REPLAY the exact table (the q160 oracle
  * regenerates it in SQL from `generate_series` + `md5`).
  *
  * Implements `SupportsPushDownRequiredColumns`: a query touching only
  * `doc_id` never pays for text generation (column pruning reaches
  * the generator, spec-pinned). Implements `SupportsPushDownAggregates`
  * (complete pushdown): group-less COUNT / COUNT(col) / MIN(doc_id) /
  * MAX(doc_id) are answered closed-form from the id spine — counting a
  * 10 B-row soak corpus is O(1), not minutes of md5. Implements
  * `SupportsPushDownLimit` / `SupportsPushDownTopN`: LIMIT n and
  * ORDER BY doc_id [DESC] LIMIT n collapse to an id sub-range, so
  * `.limit(5)` on 10 B rows generates 5. Implements
  * `SupportsPushDownFilters`: doc_id range predicates tighten the
  * generated sub-range (the partition-pruning analog — a BETWEEN
  * slice of 10 B rows generates the slice), with every filter kept as
  * a Spark-side residual so range tightening stays pure pruning and
  * aggregate pushdown can never answer over an ignored predicate.
  *
  * Schema: doc_id LONG, source STRING, text STRING where
  * source = "src" + (id % 20) and text = the first-8-hex-chars words
  * of md5(seed|id|j) for j in 0..(2 + id % 4). */
class SynthDocs extends TableProvider with DataSourceRegister {
  override def shortName(): String = "synthdocs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.FullSchema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthDocsTable(properties.asScala.toMap)
}

object SynthDocs {
  val FullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private[graft] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  private[sources] def sourceOf(id: Long): String = "src" + (id % 20)

  private[sources] def textOf(seed: String, id: Long): String =
    (0L to (2 + id % 4)).map(j => md5Hex(s"$seed|$id|$j").take(8))
      .mkString(" ")
}

private[sources] class SynthDocsTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "synthdocs"
  override def schema(): StructType = SynthDocs.FullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val merged = props ++ options.asScala
    new SynthScanBuilder(
      merged.getOrElse("rows", "1000").toLong,
      merged.getOrElse("partitions", "0").toInt,
      merged.getOrElse("seed", "synth"))
  }
}

private[sources] class SynthScanBuilder(rows: Long, partitions: Int,
    seed: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  require(rows >= 0, s"synthdocs: rows must be >= 0, got $rows")
  private var required: StructType = SynthDocs.FullSchema
  private var pushedAggs: Seq[SynthAgg] = Nil
  private var idLo = 0L
  private var idHi = rows
  private var accepted: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  // Filter pushdown: doc_id range predicates tighten the generated id
  // sub-range — the partition-pruning analog for a generator (a
  // `doc_id BETWEEN a AND b` slice of a 10 B-row corpus generates
  // b−a ids, not 10 B rows a Filter then discards). Conservative
  // residual contract: EVERY filter is also returned for Spark-side
  // re-evaluation (range tightening is pure pruning), which also keeps
  // aggregate pushdown from ever answering over an ignored filter —
  // Spark only pushes aggregates when no residual filters remain.
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    def asLong(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue)
      case _ => None
    }
    def tighten(f: Filter): Boolean = f match {
      case GreaterThanOrEqual("doc_id", v) => asLong(v).exists { x =>
        idLo = math.max(idLo, x); true }
      case GreaterThan("doc_id", v) => asLong(v).exists { x =>
        idLo = math.max(idLo, x + 1); true }
      case LessThan("doc_id", v) => asLong(v).exists { x =>
        idHi = math.min(idHi, x); true }
      case LessThanOrEqual("doc_id", v) => asLong(v).exists { x =>
        idHi = math.min(idHi, x + 1); true }
      case EqualTo("doc_id", v) => asLong(v).exists { x =>
        idLo = math.max(idLo, x); idHi = math.min(idHi, x + 1); true }
      case IsNotNull("doc_id") => true // non-null by construction
      case And(l, r) =>
        val a = tighten(l); val b = tighten(r); a && b
      case _ => false
    }
    accepted = filters.filter(tighten)
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    // an empty projection (e.g. count(*)) still needs row COUNTS;
    // keep the empty struct — the reader emits empty rows
    required = requiredSchema

  // Limit / top-N pushdown: the id spine is ordered, so LIMIT n is the
  // id range [0, n) and ORDER BY doc_id DESC LIMIT n is [rows−n, rows)
  // — `.limit(5)` on a 10 B-row generator creates 5 ids, not 10 B rows
  // that a Limit node then discards. `isPartiallyPushed` stays at its
  // conservative default (true): Spark keeps the Limit/Sort on top
  // (cheap at n rows), which also means the DESC case never depends on
  // this scan's emission order.
  override def pushLimit(limit: Int): Boolean = {
    idHi = math.min(idHi, idLo + limit)
    true
  }
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean =
    orders match {
      case Array(o) if refName(o.expression()).contains("doc_id") =>
        if (o.direction() == SortDirection.ASCENDING) {
          idHi = math.min(idHi, idLo + limit)
        } else {
          idLo = math.max(idLo, idHi - limit)
        }
        true // null ordering is irrelevant: doc_id is non-null
      case _ => false // non-id or multi-column sorts: generate + sort
    }
  // both pushdown traits default this; Scala requires one resolution.
  // true = Spark keeps the Limit/Sort node (n-row cost) — required for
  // the DESC case, whose sub-range is emitted ascending
  override def isPartiallyPushed(): Boolean = true

  // Aggregate pushdown: the generator's id spine is closed-form
  // (ids are exactly 0..rows-1, every column non-null), so COUNT /
  // COUNT(col) / MIN(doc_id) / MAX(doc_id) with no GROUP BY need not
  // generate a single row — the scan answers from arithmetic. At the
  // soak scales this source exists for (10 B rows), that is the
  // difference between O(1) and minutes of md5 generation just to
  // count. Anything else (group-bys, sums, distinct, non-id min/max)
  // is declined and planned as a normal generate-then-aggregate.
  private def refName(e: org.apache.spark.sql.connector.expressions
      .Expression): Option[String] = e match {
    case n: NamedReference if n.fieldNames.length == 1 =>
      Some(n.fieldNames.head)
    case _ => None
  }
  private def translate(f: AggregateFunc): Option[SynthAgg] = f match {
    case _: CountStar => Some(AggCount)
    case c: Count if !c.isDistinct && refName(c.column)
        .exists(SynthDocs.FullSchema.fieldNames.contains) =>
      Some(AggCount) // every generated column is non-null
    case m: Min if refName(m.column).contains("doc_id") => Some(AggMinId)
    case m: Max if refName(m.column).contains("doc_id") => Some(AggMaxId)
    case _ => None
  }
  private def translateAll(agg: Aggregation): Option[Seq[SynthAgg]] =
    if (agg.groupByExpressions.nonEmpty) None
    else {
      val t = agg.aggregateExpressions.toSeq.map(translate)
      if (t.nonEmpty && t.forall(_.isDefined)) Some(t.flatten) else None
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAll(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean =
    translateAll(agg) match {
      case Some(t) => pushedAggs = t; true
      case None => false
    }

  override def build(): Scan =
    if (pushedAggs.nonEmpty) new SynthAggScan(rows, pushedAggs)
    else new SynthScan(idLo, idHi, partitions, seed, required)
}

/** Closed-form aggregates the generator can answer without generating. */
private[sources] sealed trait SynthAgg extends Serializable
private[sources] case object AggCount extends SynthAgg
private[sources] case object AggMinId extends SynthAgg
private[sources] case object AggMaxId extends SynthAgg

/** One-partition, one-row scan carrying the pushed aggregate answers;
  * `description()` surfaces the pushed list so plans (and specs) show
  * the pushdown happened. */
private[sources] class SynthAggScan(rows: Long, aggs: Seq[SynthAgg])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (AggCount, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    "synthdocs PushedAggregates: [" + aggs.map {
      case AggCount => "COUNT"
      case AggMinId => "MIN(doc_id)"
      case AggMaxId => "MAX(doc_id)"
    }.mkString(", ") + "]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthAggPartition(rows, aggs))
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthAggReaderFactory
}

private[sources] case class SynthAggPartition(rows: Long,
    aggs: Seq[SynthAgg]) extends InputPartition

private[sources] class SynthAggReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthAggPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(p.aggs.map {
        case AggCount => p.rows: java.lang.Long
        // min/max over zero rows is NULL, like any other source
        case AggMinId =>
          if (p.rows > 0) (0L: java.lang.Long) else null
        case AggMaxId =>
          if (p.rows > 0) ((p.rows - 1): java.lang.Long) else null
      })
      override def close(): Unit = ()
    }
  }
}

private[sources] class SynthScan(lo: Long, hi: Long, partitions: Int,
    seed: String, required: StructType) extends Scan with Batch {
  private val rows = math.max(0L, hi - lo)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"synthdocs ids [$lo, $hi)" // pushed limit/top-N ranges show in plans
  override def planInputPartitions(): Array[InputPartition] = {
    // default split count SCALES with the row count (~1M rows per
    // generator split, floor 32, cap 10k) — a fixed 32 would hand a
    // 10B-row soak 300M rows per task
    val p = math.max(1,
      if (partitions > 0) partitions
      else math.min(math.min(math.max(32L, rows / 1000000L), 10000L),
        math.max(rows, 1L)).toInt)
    (0 until p).map { i =>
      SynthRange(lo + rows * i / p, lo + rows * (i + 1) / p, seed)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

private[sources] case class SynthRange(start: Long, end: Long,
    seed: String) extends InputPartition

private[sources] class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SynthRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow = {
        val vals = required.fields.map(_.name).map {
          case "doc_id" => id: java.lang.Long
          case "source" => UTF8String.fromString(SynthDocs.sourceOf(id))
          case "text" =>
            UTF8String.fromString(SynthDocs.textOf(r.seed, id))
          case other => throw new IllegalStateException(
            s"synthdocs: unknown column '$other'")
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
