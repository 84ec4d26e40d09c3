package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.ParquetFileWriter.Mode
import org.apache.parquet.io.{LocalInputFile, LocalOutputFile}

/** Parquet footer key/value metadata, mirroring the reference's
  * `parquet_kv_metadata` read (`src/QuackIO.jl:134-147`) and
  * `KV_METADATA` write option (`src/QuackIO.jl:126-132`;
  * round-trip test `test/runtests.jl:153-173`).
  *
  * Spark has no public `DataFrameWriter` hook for custom footer KV, so the
  * write path re-writes the finished file with `ParquetFileWriter.appendFile`
  * — row groups are copied as-is (no re-encode) and only the footer is
  * re-serialized with the merged metadata. Uses `LocalInputFile`/
  * `LocalOutputFile` (java.nio paths, no URI parsing) so adversarial
  * filenames with spaces/quotes/backslashes work (`test/runtests.jl:52`).
  */
object ParquetMetadata {

  /** Keys the engine itself writes; excluded from [[read]] like the
    * reference excludes DuckDB's own `ARROW:schema` key
    * (`src/QuackIO.jl:142-145`). */
  private val engineKeys: String => Boolean = k =>
    k == "ARROW:schema" || k.startsWith("org.apache.spark.")

  /** Read user KV pairs from a parquet file footer. */
  def read(path: String): Map[String, String] = {
    val in = new LocalInputFile(Paths.get(path))
    val reader = ParquetFileReader.open(in)
    try {
      reader.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
        .filter { case (k, _) => !engineKeys(k) }
    } finally reader.close()
  }

  /** Merge `kv` into an existing parquet file's footer metadata in place
    * (atomically via a sibling temp file). Values are stored stringified,
    * like the reference (`test/runtests.jl:159-165`). */
  def attach(path: String, kv: Map[String, String]): Unit = {
    if (kv.isEmpty) return
    val src = Paths.get(path)
    val in = new LocalInputFile(src)
    val reader = ParquetFileReader.open(in)
    val (schema, existing) =
      try {
        val fmd = reader.getFooter.getFileMetaData
        (fmd.getSchema, fmd.getKeyValueMetaData.asScala.toMap)
      } finally reader.close()

    val tmp = Files.createTempFile(src.toAbsolutePath.getParent,
      ".quackio-kv-", ".parquet")
    Files.delete(tmp) // ParquetFileWriter Mode.CREATE wants it absent
    val writer = new ParquetFileWriter(new LocalOutputFile(tmp), schema,
      Mode.CREATE, org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE,
      8388608 /* parquet's MAX_PADDING_SIZE_DEFAULT */)
    writer.start()
    writer.appendFile(new LocalInputFile(src))
    writer.end((existing ++ kv).asJava)
    Files.move(tmp, src, StandardCopyOption.REPLACE_EXISTING)
    // Hadoop's LocalFileSystem writes a `.<name>.crc` sidecar next to
    // files it creates (directory writes do; single-file staging moves
    // don't) — after the footer rewrite the old checksum is stale and
    // every subsequent read fails with ChecksumException. Drop it.
    val crc = src.toAbsolutePath.getParent
      .resolve("." + src.getFileName.toString + ".crc")
    Files.deleteIfExists(crc)
  }
}
