package graft

import graft.osm.{PointReader, VersionedTable}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import scala.jdk.CollectionConverters._

/** Dev diagnostic: phase-timing breakdown of one PointReader probe.
  * Usage: SPARK_GRAFT_LOOKUP_DB=<store> sbt 'runMain graft.ProbeDebug'
  */
object ProbeDebug {
  def main(args: Array[String]): Unit = {
    val root = sys.env("SPARK_GRAFT_LOOKUP_DB")
    val m = VersionedTable.current(root).get
    val table = sys.env.getOrElse("PROBE_TABLE", "locations")
    val spec = m.buckets(table)
    val key = sys.env.getOrElse("PROBE_KEY", "1234570").toLong
    val b = VersionedTable.bucketOfValue(key, spec.nBuckets)
    val conf = new Configuration()
    conf.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    val pconf = new org.apache.parquet.conf.HadoopParquetConfiguration(conf)
    val dir = new org.apache.hadoop.fs.Path(
      s"$root/v=${spec.versions(b)}/$table/__bucket=$b")
    val fs = dir.getFileSystem(conf)
    val f = fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).head
    // warm everything once, then time phases over reps
    val pf = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
    val footer = pf.getFooter
    val schema = footer.getFileMetaData.getSchema
    val columnIO = new org.apache.parquet.io.ColumnIOFactory()
      .getColumnIO(schema)
    val block0 = footer.getBlocks.get(0)
    val keyChunk = block0.getColumns.asScala
      .find(_.getPath.toDotString == spec.key).get
    val oi = pf.readOffsetIndex(keyChunk)
    if (oi != null) {
      val pc = oi.getPageCount
      val rowCounts = (0 until pc).map { i =>
        val first = oi.getFirstRowIndex(i)
        val last = if (i + 1 < pc) oi.getFirstRowIndex(i + 1) - 1
                   else block0.getRowCount - 1
        last - first + 1
      }
      println(s"key-column pages=$pc rowCounts=${rowCounts.take(12)}")
    }
    pf.close()
    println(s"table=$table key=$key bucket=$b file=${f.getName}")
    for (rep <- 1 to 5) {
      val t0 = System.nanoTime()
      val filter = FilterCompat.get(FilterApi.eq(
        FilterApi.longColumn(spec.key), java.lang.Long.valueOf(key)))
      val opts = ParquetReadOptions.builder(pconf)
        .withRecordFilter(filter).build()
      val reader = new ParquetFileReader(conf, f, footer, opts)
      val t1 = System.nanoTime()
      var total = 0L; var matched = 0
      var tPages = 0L; var tLoop = 0L
      var p0 = System.nanoTime()
      var pages = reader.readNextFilteredRowGroup()
      tPages += System.nanoTime() - p0
      while (pages != null) {
        val l0 = System.nanoTime()
        val rr = columnIO.getRecordReader(pages,
          new org.apache.parquet.example.data.simple.convert
            .GroupRecordConverter(schema), filter)
        val n = pages.getRowCount
        total += n
        var i = 0L
        while (i < n) {
          val g = rr.read()
          if (g != null && !rr.shouldSkipCurrentRecord) matched += 1
          i += 1
        }
        tLoop += System.nanoTime() - l0
        p0 = System.nanoTime()
        pages = reader.readNextFilteredRowGroup()
        tPages += System.nanoTime() - p0
      }
      reader.close()
      val t2 = System.nanoTime()
      println(f"rep$rep open=${(t1 - t0) / 1e6}%.2fms " +
        f"pages=${tPages / 1e6}%.2fms loop=${tLoop / 1e6}%.2fms " +
        f"total=${(t2 - t0) / 1e6}%.2fms rowsSeen=$total matched=$matched")
    }
    // and the assembled PointReader path for comparison
    val pr = new PointReader(root, m)
    for (rep <- 1 to 5) {
      val t0 = System.nanoTime()
      val n = pr.rows(table, spec.key, key).size
      println(f"pointreader rep$rep ${(System.nanoTime() - t0) / 1e6}%.2fms rows=$n")
    }
  }
}
