package graft.tools

import graft.core.ConfigLoader

/** Config validation CLI — the rebuild of the reference's
  * configuration_validator.py:1-26: load (only) the given YAML, print a
  * human error and exit non-zero on missing/invalid configuration. */
object ValidateConfig {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse {
      println("pass a configuration file as argument")
      sys.exit(1)
    }
    if (!new java.io.File(path).isFile) {
      println(s"""configuration file "$path" does not exist""")
      sys.exit(1)
    }
    try {
      val cfg = ConfigLoader.loadFile(path)
      println(s"configuration ok: ${cfg.aggregations.size} aggregations, " +
        s"${cfg.operations.size} operations, hash ${cfg.hash}")
    } catch {
      case e: ConfigLoader.ConfigError =>
        println(s"""configuration is invalid: "${e.getMessage}"""")
        sys.exit(1)
    }
  }
}
