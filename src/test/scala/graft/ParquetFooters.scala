package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Test helper: read per-row-group min/max statistics for a numeric
  * (or timestamp-as-int64) column straight from the parquet footers —
  * the exact inputs the reader's row-group filter consumes.
  */
object ParquetFooters {
  def spans(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = new Configuration()
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
      .flatMap { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try r.getFooter.getBlocks.asScala.toList.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column)
            .flatMap { c =>
              val st = c.getStatistics
              if (st == null || !st.hasNonNullValue) None
              else Some((st.genericGetMin.asInstanceOf[Number].longValue(),
                st.genericGetMax.asInstanceOf[Number].longValue()))
            }
        } finally r.close()
      }
  }

  /** How many row groups a [lo, hi) range scan must read. */
  def touched(spans: Seq[(Long, Long)], lo: Long, hi: Long): Int =
    spans.count { case (mn, mx) => mx >= lo && mn < hi }
}
