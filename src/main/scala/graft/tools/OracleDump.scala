package graft.tools

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as JSON without starting a Spark session —
  * the oracle map is plain strings, and the optimization rounds need to
  * profile the DuckDB side of expensive gates (er_incremental was 26.5 s
  * of the 71.6 s r14 oracle pass) without paying a full Verify sweep.
  * Usage: tools/run.sh graft.tools.OracleDump <outFile>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args(0)), json)
    println(s"[oracledump] ${graft.SparkEntry.oracleSql.size} oracle SQLs -> ${args(0)}")
  }
}
