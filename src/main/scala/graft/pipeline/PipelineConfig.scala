package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S6: pipeline configuration file, mirroring the reference's
  * per-pipeline YAML (reference: etl_project/pipelines/stock_bars.yaml:1-6,
  * loaded by get_yaml_config at pipelines/stock_bars.py:22-31 — table
  * names, load method, dimension CSV path all come from config, never
  * code).
  *
  * Parser covers the YAML subset those configs actually use — scalar
  * `key: value` pairs and nested maps by 2-space indentation — with no
  * external dependency (the sandbox resolver is offline). Keys are
  * exposed dot-joined: `config.load_method`. Files are read through the
  * Hadoop FileSystem API like every other input.
  */
final class PipelineConfig(val entries: Map[String, String]) {
  def get(key: String): Option[String] = entries.get(key)
  def apply(key: String): String = entries.getOrElse(key,
    throw new NoSuchElementException(
      s"missing config key: $key (have: ${entries.keys.toSeq.sorted.mkString(", ")})"))
  def getOrElse(key: String, default: String): String =
    entries.getOrElse(key, default)
}

object PipelineConfig {

  /** Parse the YAML subset: scalars, nested maps by indentation,
    * `#` comments, quoted or bare values. */
  def parse(text: String): PipelineConfig = {
    val Line = raw"^(\s*)([A-Za-z0-9_-]+):\s*(.*?)\s*$$".r
    var stack = List.empty[(Int, String)] // (indent, key-prefix element)
    val out = Map.newBuilder[String, String]
    text.linesIterator
      .map { l =>
        // cut at the first '#' OUTSIDE quotes — a quoted value may
        // legitimately contain one (password: "abc#123"). If the line
        // ends still "inside" a quote, the quote char was literal text
        // (owner: o'brien  # ops), not a delimiter: fall back to a
        // plain cut so the comment is still stripped.
        var inQ = false
        var q = ' '
        var lastOpen = 0 // where the (possibly literal) quote opened
        val cut = l.indices.find { i =>
          val c = l(i)
          if (inQ) { if (c == q) inQ = false; false }
          else if (c == '"' || c == '\'') { inQ = true; q = c; lastOpen = i; false }
          // YAML: '#' starts a comment only at line start or after
          // whitespace — a bare value may contain one (url: a/b#frag)
          else c == '#' && (i == 0 || l(i - 1) == ' ' || l(i - 1) == '\t')
        }
        if (inQ) {
          // the fallback re-scan starts at the UNBALANCED quote, never
          // index 0: everything before it was tracked consistently, and
          // a '#' inside an earlier properly-closed pair (path: "a # b"
          // o'brien) must stay part of the value
          val j = (math.max(lastOpen, 1) until l.length).find(i =>
            l(i) == '#' && (l(i - 1) == ' ' || l(i - 1) == '\t'))
          j.map(l.substring(0, _)).getOrElse(l)
        }
        else cut.map(l.substring(0, _)).getOrElse(l)
      }
      .filter(_.trim.nonEmpty)
      .foreach {
        case Line(ws, key, value) =>
          val indent = ws.length
          stack = stack.dropWhile(_._1 >= indent)
          val path = (stack.map(_._2).reverse :+ key).mkString(".")
          if (value.isEmpty) stack = (indent, key) :: stack
          else out += path -> value.stripPrefix("\"").stripSuffix("\"")
            .stripPrefix("'").stripSuffix("'")
        case other =>
          sys.error(s"unsupported config line: $other")
      }
    new PipelineConfig(out.result())
  }

  def load(spark: SparkSession, path: String): PipelineConfig = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new java.io.FileNotFoundException(
        s"Missing $path file! Please create the yaml file.")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parse(text)
  }
}
