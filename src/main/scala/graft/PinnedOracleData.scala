package graft

/** Loader for the pinned-oracle capture (see [[PinnedOracles]] for the
  * mechanism and coupling docs, `graft.tools.PinGen` for regeneration).
  *
  * The captured rows live in `src/main/resources/graft/pinned_oracles.tsv`
  * rather than Scala literals: tier-3 captures run to thousands of rows,
  * and a generated Map literal of that size eventually hits the JVM's
  * 64 KB method-size limit — a flat resource file has no such cliff and
  * keeps the generated data visibly a fixture, not code.
  *
  * Format, one record per line ([[PinnedOracles.Sep]]-separated):
  * {{{
  *   #Q <name> <col:TYPE,col:TYPE,...>     — starts a query block
  *   <tier><Sep><rendered row>             — one captured row
  * }}}
  */
object PinnedOracleData {
  import PinnedOracles.{Pinned, Sep}

  lazy val byName: Map[String, Pinned] = {
    val in = getClass.getResourceAsStream("/graft/pinned_oracles.tsv")
    require(in != null, "graft/pinned_oracles.tsv missing from classpath — run graft.tools.PinGen")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Pinned]
      var name: String = null
      var cols: Seq[(String, String)] = Nil
      var rows = scala.collection.mutable.LinkedHashMap.empty[Int, Vector[String]]
      def flush(): Unit = if (name != null) {
        out(name) = Pinned(cols, rows.toMap)
        rows = scala.collection.mutable.LinkedHashMap.empty
      }
      src.getLines().foreach {
        case l if l.startsWith("#Q ") =>
          flush()
          val Array(_, n, colSpec) = l.split(" ", 3)
          name = n
          cols = colSpec.split(",").toSeq.map { c =>
            val Array(cn, ct) = c.split(":", 2); cn -> ct
          }
        case l if l.nonEmpty =>
          val i = l.indexOf(Sep.toInt)
          val tier = l.substring(0, i).toInt
          rows(tier) = rows.getOrElse(tier, Vector.empty) :+ l.substring(i + 1)
        case _ => ()
      }
      flush()
      out.toMap
    } finally src.close()
  }
}
