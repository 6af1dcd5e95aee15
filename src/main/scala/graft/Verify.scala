package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val spark = Engine.session("graft-verify")
    Engine.quietSweepLogging() // the between-query RDD sweep is intentional
    new java.io.File(outDir).mkdirs()
    // extra args (local dev only — the driver passes two) restrict the dump
    // to the named queries for a fast edit→duckdb-compare loop
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release operator-cached intermediates (see Bench) between queries;
      // the tagged sweep also reaps scratch-checkpoint blocks
      // (Checkpoints.scratch) without waiting for a GC+ContextCleaner
      // cycle, while leaving any non-scratch checkpoint-rooted frame
      // (whose blocks could never be recomputed) alone
      spark.catalog.clearCache()
      graft.operators.Checkpoints.sweepScratch(spark.sparkContext,
        blocking = true)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // adjudication notes for oracle-less queries (r12 VERDICT #6): lands
    // next to oracle_sql.json so a no_oracle correctness row is
    // self-explaining to any reader of the verify output
    val notes = SparkEntry.queryNotes
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/notes.json"), notes)
    spark.stop()
  }
}
