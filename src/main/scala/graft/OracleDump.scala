package graft

/** Dump `SparkEntry.oracleSql` as JSON WITHOUT running any Spark query —
  * the fast half of the verify recipe, for iterating on oracle SQL cost
  * (`tools/oracle_check.py` + ORACLE_COST.json) against an existing
  * Verify output directory: edit an oracle, `runMain graft.OracleDump
  * out/oracle_sql.json`, re-run the DuckDB compare. A full `graft.Verify`
  * is only needed when the SPARK side of a query changes. */
object OracleDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: OracleDump <out.json>")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      json.getBytes("UTF-8"))
    println(s"wrote ${SparkEntry.oracleSql.size} oracles to ${args(0)}")
  }
}
