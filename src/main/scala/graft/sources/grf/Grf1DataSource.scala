package graft.sources.grf

import java.io.{DataInputStream, FileInputStream}
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 provider for GRF1 media containers: surfaces typed
  * METADATA (kind, dimensions, payload size) by reading only each
  * file's fixed-size header — the pixel/sample payload is never pulled
  * off disk. `spark.read.format("graft.sources.grf.Grf1DataSource")
  * .load(dir)`.
  *
  * This is the custom-source counterpart of the engine's HTTP/object-
  * store ingestion (SURVEY.md §2.1 S1/S3): a real TableProvider →
  * ScanBuilder → Batch → PartitionReader chain with column pruning
  * AND kind-predicate pushdown into the reader (a pruned scan
  * materializes only the requested fields; a pushed `kind` filter is
  * fully enforced at the 5-byte header peek, so non-matching files
  * emit no row and Spark plans no residual Filter). One input
  * partition per file keeps listing on
  * the driver trivial while letting a directory of millions of blobs
  * fan out across executors; a production variant would coalesce
  * small files into multi-file splits exactly like Spark's own
  * binaryFile source.
  */
class Grf1DataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Grf1Table.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new Grf1Table(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object Grf1Table {
  /** kind: 0=image, 1=audio, 2=video; -1 = unrecognized container. */
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("kind", IntegerType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sampleRate", IntegerType),
    StructField("frames", IntegerType),
    StructField("payloadBytes", LongType, nullable = false)))
}

class Grf1Table(path: String) extends Table with SupportsRead {
  override def name(): String = s"grf1:$path"
  override def schema(): StructType = Grf1Table.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Grf1ScanBuilder(path)
}

class Grf1ScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = Grf1Table.schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accepts kind = x / kind IN (...) — the dispatch predicate every
    * media pipeline starts with — and enforces them IN the reader
    * (returned residual excludes them, so Spark plans no Filter node
    * on top). Everything else stays residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("kind", _: Int) => true
      case In("kind", _) => true
      case _ => false
    }
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new Grf1Scan(path, required, pushed)
}

class Grf1Scan(path: String, required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"Grf1Scan path=$path PushedFilters=${pushed.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    val files =
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.filter(Files.isRegularFile(_)).map(_.toString).toArray.sorted
      else Array(path)
    files.map(f => Grf1Partition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = new Grf1ReaderFactory(required, pushed)
}

case class Grf1Partition(file: String) extends InputPartition

class Grf1ReaderFactory(required: StructType, pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Grf1Reader(partition.asInstanceOf[Grf1Partition].file, required, pushed)
}

/** Reads exactly the 17-byte header (magic + kind + three ints); the
  * payload length comes from file size arithmetic, not a payload read.
  * A pushed kind predicate is evaluated right after the 5-byte peek:
  * a non-matching file produces no row at all.
  */
class Grf1Reader(file: String, required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _

  private def kindMatches(kind: Int): Boolean = pushed.forall {
    case EqualTo("kind", v: Int) => kind == v
    case In("kind", vs) => vs.exists {
      case v: Int => v == kind
      case _ => false
    }
    case _ => true
  }

  override def next(): Boolean = {
    if (done) return false
    done = true
    val size = Files.size(Paths.get(file))
    val in = new DataInputStream(new FileInputStream(file))
    try {
      val magic = new Array[Byte](4)
      val validMagic = in.read(magic) == 4 && new String(magic, "US-ASCII") == "GRF1"
      val kind = if (validMagic) in.read() else -1
      if (!kindMatches(kind)) return false
      val (w, h, c, rate, frames, headerLen) = kind match {
        case 0 => (in.readInt(), in.readInt(), in.readInt(), -1, -1, 17)
        case 1 => val r = in.readInt(); val n = in.readInt(); (-1, -1, -1, r, n, 13)
        case 2 => val f = in.readInt(); val ww = in.readInt(); val hh = in.readInt(); (ww, hh, -1, -1, f, 17)
        case _ => (-1, -1, -1, -1, -1, 0)
      }
      val all = Map[String, Any](
        "path" -> UTF8String.fromString(file), "kind" -> kind,
        "width" -> (if (w >= 0) w else null),
        "height" -> (if (h >= 0) h else null),
        "channels" -> (if (c >= 0) c else null),
        "sampleRate" -> (if (rate >= 0) rate else null),
        "frames" -> (if (frames >= 0) frames else null),
        "payloadBytes" -> (size - headerLen))
      row = InternalRow.fromSeq(required.fieldNames.toSeq.map(all(_)))
      true
    } finally in.close()
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
