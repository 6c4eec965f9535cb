package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5: the templated-SQL directory runner — the reference's analysis
  * extensibility mechanism: every `.sql` template in a directory is
  * rendered and executed against the engine, in order
  * (reference: etl_project/assets/assets.py:166-170, wired at
  * pipelines/stock_bars.py:127-129 over assets/sql/transform/).
  *
  * Spark-first shape: files are listed and read through the Hadoop
  * `FileSystem` API (local/HDFS/S3A alike), rendered with simple
  * `{{ var }}` substitution (the subset of Jinja the reference's
  * templates actually use — its only template renders with no
  * variables), split into statements, and run through `spark.sql` —
  * so a script's CTAS/INSERT goes through Catalyst like any other
  * plan, with pushdown and AQE intact.
  */
object SqlScripts {

  /** `.sql` files under `dir` in filename order (the reference relies on
    * Jinja's sorted `list_templates()` ordering). */
  def listScripts(spark: SparkSession, dir: String): Seq[Path] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(d).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".sql"))
      .sortBy(_.getPath.getName)
      .map(_.getPath)
  }

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private val Var = raw"\{\{\s*([A-Za-z0-9_]+)\s*\}\}".r

  /** Render `{{ name }}` placeholders; unknown names fail fast. */
  def render(template: String, vars: Map[String, String]): String =
    Var.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(m.group(1),
          sys.error(s"unbound template variable: ${m.group(1)}"))))

  /** Split a script into statements on top-level `;`. One pass tracks
    * single- AND double-quoted literals (both are strings in Spark's
    * default non-ANSI mode), backslash escapes, `--` line comments, and
    * `/* */` bracketed comments (supported by Spark since 3.0), with
    * quote state spanning lines — so a quoted `;`, a quoted `--`, a
    * `;` or quote inside a bracketed comment, or a multi-line literal
    * never splits or truncates a statement. */
  def splitStatements(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inS = false
    var inD = false
    var inComment = false
    var bracketDepth = 0 // Spark SQL (3.0+) bracketed comments NEST
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (bracketDepth > 0) {
        cur += c
        if (c == '*' && i + 1 < sql.length && sql.charAt(i + 1) == '/') {
          cur += '/'; i += 1; bracketDepth -= 1
        } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
          cur += '*'; i += 1; bracketDepth += 1
        }
      } else if (inComment) {
        if (c == '\n') { inComment = false; cur += c }
      } else if (inS || inD) {
        cur += c
        if (c == '\\' && i + 1 < sql.length) { cur += sql.charAt(i + 1); i += 1 }
        else if (inS && c == '\'') inS = false
        else if (inD && c == '"') inD = false
      } else c match {
        case '\'' => inS = true; cur += c
        case '"' => inD = true; cur += c
        case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
          inComment = true; i += 1
        case '/' if i + 1 < sql.length && sql.charAt(i + 1) == '*' =>
          bracketDepth = 1; cur += c; cur += '*'; i += 1
        case ';' => out += cur.toString; cur.clear()
        case other => cur += other
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Run every script in `dir` in filename order; returns the result of
    * the last statement of each file, keyed by filename. */
  def run(spark: SparkSession, dir: String,
          vars: Map[String, String] = Map.empty): Seq[(String, DataFrame)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    listScripts(spark, dir).map { p =>
      val fs = p.getFileSystem(conf)
      val stmts = splitStatements(render(readFully(fs, p), vars))
      require(stmts.nonEmpty, s"empty sql script: $p")
      p.getName -> stmts.map(spark.sql).last
    }
  }
}
