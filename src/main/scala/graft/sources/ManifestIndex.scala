package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, GenericInternalRow, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Manifest-mode storage for [[Layout]]'s versioned roots: a version is a
  * FILE LIST, not a directory tree.
  *
  * `root/vNNNNN.manifest` records, for version N, the table's data schema,
  * partition schema, and one (leaf, path, size) entry per data file — where
  * `path` is either relative to `root` (normal case) or absolute (zero-copy
  * clones referencing another root). Carry-forward of an untouched
  * partition is a MANIFEST ENTRY COPY: zero filesystem operations, which is
  * the shape that works on object stores, where the hardlink mode's
  * fallback physically copies every untouched leaf of a 100 TB table
  * (`Layout.carryForward`). Change-feed pruning compares manifests — file
  * paths are immutable once written, so equal entry sets prove equal bytes
  * without stat-ing anything.
  *
  * The read path is a custom [[FileIndex]] over the manifest (the
  * Delta/Iceberg integration shape): ONE parquet scan node for the whole
  * snapshot, partition pruning evaluated against manifest-derived partition
  * values — no directory listing, no footer sampling for schema (the
  * manifest's data schema is authoritative, so files written before a
  * schema-evolving merge null-fill the added columns by name).
  */
object ManifestIndex {

  val FormatFile = "_format"
  val FormatTag = "graft-manifest-v1"

  /** One data file of a version: hive leaf fragment (`a=1/b=2`), path
    * (root-relative, or absolute for cross-root clone references), exact
    * length in bytes (the parquet reader trusts it for footer location).
    */
  case class Entry(leaf: String, path: String, size: Long)

  case class TableManifest(dataSchema: StructType, partitionSchema: StructType,
                           entries: Seq[Entry]) {
    def leaves: Set[String] = entries.iterator.map(_.leaf).toSet
    /** Entries grouped per leaf — the unit of carry-forward and pruning. */
    def byLeaf: Map[String, Seq[Entry]] = entries.groupBy(_.leaf)
  }

  // ------------------------------------------------------------- file format

  def manifestPath(root: String, version: String) = new Path(root, s"$version.manifest")

  /** TSV body after a tag line and two one-line schema JSONs. Written to a
    * temp name then renamed so a crashed writer never leaves a torn
    * manifest where a reader (or vacuum) could trust it.
    */
  def write(spark: SparkSession, root: String, version: String,
            m: TableManifest): Unit = {
    val sb = new StringBuilder
    sb.append(FormatTag).append('\n')
    sb.append(m.dataSchema.json).append('\n')
    sb.append(m.partitionSchema.json).append('\n')
    m.entries.foreach(e =>
      sb.append(e.leaf).append('\t').append(e.path).append('\t')
        .append(e.size).append('\n'))
    val dst = manifestPath(root, version)
    val tmp = new Path(root, s"$version.manifest.tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"manifest commit rename failed: $dst")
  }

  def read(spark: SparkSession, root: String, version: String): TableManifest = {
    val p = manifestPath(root, version)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no manifest for $version under $root " +
      "(never committed, or already vacuumed)")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val lines = text.split('\n')
    require(lines.nonEmpty && lines(0) == FormatTag,
      s"$p is not a $FormatTag manifest")
    val dataSchema = DataType.fromJson(lines(1)).asInstanceOf[StructType]
    val partitionSchema = DataType.fromJson(lines(2)).asInstanceOf[StructType]
    val entries = lines.iterator.drop(3).filter(_.nonEmpty).map { l =>
      val Array(leaf, path, size) = l.split('\t')
      Entry(leaf, path, size.toLong)
    }.toSeq
    TableManifest(dataSchema, partitionSchema, entries)
  }

  def exists(spark: SparkSession, root: String, version: String): Boolean = {
    val p = manifestPath(root, version)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Is `root` a manifest-mode versioned root? (Marker written at init —
    * every Layout writer/reader branches on this, so call sites never
    * thread a mode flag.)
    */
  def isManifestRoot(spark: SparkSession, root: String): Boolean = {
    val p = new Path(root, FormatFile)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def writeFormatMarker(spark: SparkSession, root: String): Unit = {
    val p = new Path(root, FormatFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(FormatTag.getBytes("UTF-8")) finally out.close()
  }

  /** Inventory a freshly-written version dir as root-relative entries —
    * called once per commit on the files the writer just produced (exact
    * lengths from the listing; the manifest is the last listing this
    * version will ever need).
    */
  def listVersionFiles(fs: FileSystem, root: String,
                       version: String): Seq[Entry] = {
    val vdir = new Path(root, version)
    if (!fs.exists(vdir)) return Nil
    val acc = Seq.newBuilder[Entry]
    def rec(p: Path, leaf: String): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory)
          rec(st.getPath, if (leaf.isEmpty) n else s"$leaf/$n")
        else if (!n.startsWith("_") && !n.startsWith("."))
          acc += Entry(leaf, s"$version/${if (leaf.isEmpty) n else s"$leaf/$n"}",
            st.getLen)
      }
    rec(vdir, "")
    acc.result().sortBy(_.path)
  }

  // --------------------------------------------------------------- read path

  /** Snapshot DataFrame over a manifest (optionally restricted to a leaf
    * subset): one [[HadoopFsRelation]] scan with partition values decoded
    * from leaf names. Output columns = data schema ++ partition schema,
    * the same shape as a hive-discovered read of the hardlink mode.
    */
  def dataFrame(spark: SparkSession, root: String, m: TableManifest,
                onlyLeaves: Option[Set[String]] = None): DataFrame = {
    val kept = onlyLeaves match {
      case Some(ls) => m.entries.filter(e => ls.contains(e.leaf))
      case None => m.entries
    }
    val index = new ManifestFileIndex(new Path(root), m.partitionSchema,
      partitionDirectories(spark, root, m.partitionSchema, kept))
    val relation = HadoopFsRelation(index, m.partitionSchema, m.dataSchema,
      None, new ParquetFileFormat, Map.empty)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation)
  }

  private def partitionDirectories(spark: SparkSession, root: String,
                                   partitionSchema: StructType,
                                   entries: Seq[Entry])
      : Seq[(InternalRow, Seq[FileStatusWithMetadata])] = {
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    entries.groupBy(_.leaf).toSeq.sortBy(_._1).map { case (leaf, es) =>
      val values = parseLeaf(leaf, partitionSchema, zone)
      val files = es.map { e =>
        val p = if (e.path.startsWith("/") || e.path.contains("://"))
          new Path(e.path)
        else new Path(root, e.path)
        FileStatusWithMetadata(
          new FileStatus(e.size, false, 0, 0, 0L, p), Map.empty)
      }
      (values, files)
    }
  }

  /** Decode `a=1/b=2` into an InternalRow ordered by `partitionSchema` —
    * hive escaping and the null sentinel handled exactly as the writer
    * produced them, values cast to the ORIGINAL column types the manifest
    * preserved (so no int/long narrowing round-trip, unlike partition
    * inference).
    */
  private[sources] def parseLeaf(leaf: String, partitionSchema: StructType,
                                 zone: String): InternalRow = {
    if (partitionSchema.isEmpty) return InternalRow.empty
    val kv = leaf.split('/').map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"malformed hive leaf segment '$seg' in '$leaf'")
      ExternalCatalogUtils.unescapePathName(seg.substring(0, i)) ->
        seg.substring(i + 1)
    }.toMap
    val values = partitionSchema.fields.map { f =>
      val raw = kv.getOrElse(f.name,
        throw new IllegalArgumentException(
          s"leaf '$leaf' missing partition column ${f.name}"))
      if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
      else {
        val s = ExternalCatalogUtils.unescapePathName(raw)
        Cast(Literal(UTF8String.fromString(s), StringType), f.dataType,
          Option(zone)).eval()
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }
}

/** Manifest-backed [[FileIndex]]: the per-leaf file lists and partition
  * values are fixed at construction (a snapshot is immutable), so `listFiles`
  * is pure in-memory partition pruning — the same bound-predicate filter
  * `InMemoryFileIndex` applies after its directory crawl, minus the crawl.
  */
final class ManifestFileIndex(
    root: Path,
    override val partitionSchema: StructType,
    partitions: Seq[(InternalRow, Seq[FileStatusWithMetadata])])
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) partitions
      else {
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val i = partitionSchema.fieldIndex(a.name)
              BoundReference(i, partitionSchema(i).dataType, nullable = true)
          })
        partitions.filter { case (values, _) => bound.eval(values) }
      }
    selected.map { case (values, files) => PartitionDirectory(values, files) }
  }

  override def inputFiles: Array[String] =
    partitions.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = partitions.flatMap(_._2.map(_.getLen)).sum
}
