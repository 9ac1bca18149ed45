package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Structural lint for the Blobs bug class (VERDICT r9 #6): a raw
  * machine-local write API (`java.nio.file.Files.write`,
  * `FileOutputStream`, …) inside a `foreachPartition`/`mapPartitions`
  * lambda runs on EXECUTORS — on a real cluster it silently scatters
  * output across machines unless the code first resolved the target
  * through the Hadoop FileSystem API and proved the filesystem is the
  * machine-local one (the `Blobs.scala` `case local: LocalFileSystem`
  * pattern). `putAll` shipped exactly that bug for five rounds because
  * only local-mode tests existed; the class is structural, so this spec
  * greps for it: every partition-lambda extent in `src/main` that calls a
  * raw local-write API must contain a resolved-`LocalFileSystem` guard
  * BEFORE the call, and every such site must be on the explicit allowlist
  * below so a new one forces a conscious review. */
class ClusterSafetyLintSpec extends AnyFunSuite {

  // partition-lambda openers we lint; `.foreach` on local collections
  // inside such a lambda is already covered by the enclosing extent
  private val partitionTokens = Seq("foreachPartition", "mapPartitions")
  private val writeTokens = Seq(
    "java.nio.file.Files.write", "Files.write(", "Files.writeString",
    "Files.newOutputStream", "FileOutputStream", "FileWriter",
    "PrintWriter")
  // a real resolved-filesystem guard is a match branch on the resolved FS
  // type — a bare mention of the token elsewhere in the lambda (identifier,
  // import reference) must NOT satisfy the lint
  private val guardPattern =
    """case\s+\w+\s*:\s*(org\.apache\.hadoop\.fs\.)?LocalFileSystem""".r

  /** Allowed (file → guarded-write-site count). Adding a raw local write
    * inside a partition lambda anywhere else — or an extra one here —
    * fails the spec until it is reviewed and listed. */
  private val allowlist = Map(
    "src/main/scala/graft/engine/Blobs.scala" -> 1)

  /** Strips string literals, line comments and block comments so brace
    * matching can't be fooled by a `{` inside a string or scaladoc (the
    * contents are replaced by spaces — indices are preserved). */
  private def blank(src: String): String = {
    val out = src.toCharArray
    var i = 0
    def wipe(from: Int, to: Int): Unit = {
      var j = from
      while (j < to && j < out.length) {
        if (out(j) != '\n') out(j) = ' '; j += 1
      }
    }
    while (i < src.length) {
      // char literals BEFORE string handling: '"' would otherwise flip the
      // string phase for the rest of the file and '{'/'}' would skew brace
      // depth (DslParser-style `case '{' =>` sites are real in this repo).
      // Handles the 'x' and '\x' forms; longer escape forms (unicode)
      // fall through harmlessly (no quote or brace inside them).
      if (src.charAt(i) == '\'' && i + 2 < src.length &&
          (if (src.charAt(i + 1) == '\\') i + 3 < src.length && src.charAt(i + 3) == '\''
           else src.charAt(i + 2) == '\'')) {
        val close = if (src.charAt(i + 1) == '\\') i + 3 else i + 2
        wipe(i + 1, close); i = close + 1
      } else if (src.startsWith("\"\"\"", i)) {
        val end = src.indexOf("\"\"\"", i + 3)
        val stop = if (end < 0) src.length else end + 3
        wipe(i + 3, stop - 3); i = stop
      } else if (src.charAt(i) == '"') {
        var j = i + 1
        while (j < src.length && src.charAt(j) != '"') {
          if (src.charAt(j) == '\\') j += 1
          j += 1
        }
        wipe(i + 1, j); i = math.min(j + 1, src.length)
      } else if (src.startsWith("//", i)) {
        val end = src.indexOf('\n', i)
        val stop = if (end < 0) src.length else end
        wipe(i, stop); i = stop
      } else if (src.startsWith("/*", i)) {
        val end = src.indexOf("*/", i + 2)
        val stop = if (end < 0) src.length else end + 2
        wipe(i, stop); i = stop
      } else i += 1
    }
    new String(out)
  }

  /** Extent [start, end) of the lambda argument that follows a partition
    * token at `tok` in comment/string-blanked source: the first `{` or `(`
    * after the token, matched to its closing delimiter. */
  private def lambdaExtent(blanked: String, tok: Int): Option[(Int, Int)] = {
    var i = tok
    while (i < blanked.length && blanked.charAt(i) != '{' && blanked.charAt(i) != '(')
      i += 1
    if (i >= blanked.length) return None
    val (open, close) = if (blanked.charAt(i) == '{') ('{', '}') else ('(', ')')
    var depth = 0; var j = i
    while (j < blanked.length) {
      val c = blanked.charAt(j)
      if (c == open) depth += 1
      else if (c == close) { depth -= 1; if (depth == 0) return Some((i, j + 1)) }
      j += 1
    }
    None
  }

  private def sourceFiles(): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get("src/main/scala"))
      .iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
  }

  /** Scans one source text: (guarded-site count, violation messages). */
  private def scan(rel: String, src: String): (Int, Seq[String]) = {
    var guardedCount = 0
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val blanked = blank(src)
    for (tok <- partitionTokens;
         idx <- Iterator.iterate(blanked.indexOf(tok))(p => blanked.indexOf(tok, p + 1))
           .takeWhile(_ >= 0).toSeq) {
      lambdaExtent(blanked, idx + tok.length).foreach { case (start, end) =>
        val body = blanked.substring(start, end)
        // all occurrences of every write token, merged by overlap so
        // "java.nio.file.Files.write" and "Files.write(" on the same
        // call count as ONE site (and repeated calls each count)
        val matches = writeTokens.flatMap { w =>
          Iterator.iterate(body.indexOf(w))(p => body.indexOf(w, p + 1))
            .takeWhile(_ >= 0).map(p => (p, p + w.length)).toSeq
        }.sortBy(_._1)
        val sites = matches.foldLeft(List.empty[(Int, Int)]) {
          case (acc @ ((s0, e0) :: rest), (s1, e1)) =>
            if (s1 < e0) (s0, math.max(e0, e1)) :: rest else (s1, e1) :: acc
          case (Nil, m) => m :: Nil
        }.reverse
        for ((wIdx, _) <- sites) {
          val line = blanked.substring(0, start + wIdx).count(_ == '\n') + 1
          val guarded = guardPattern.findFirstIn(body.substring(0, wIdx)).isDefined
          if (!guarded)
            violations += s"$rel:$line raw local-write API inside $tok lambda without a resolved-LocalFileSystem guard"
          else
            guardedCount += 1
        }
      }
    }
    (guardedCount, violations.toSeq)
  }

  test("raw local writes inside partition lambdas are LocalFileSystem-guarded and allowlisted") {
    val found = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    for (path <- sourceFiles()) {
      val rel = path.toString
      val src = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      val (guarded, vs) = scan(rel, src)
      if (guarded > 0) found(rel) += guarded
      violations ++= vs
    }
    assert(violations.isEmpty, violations.mkString("\n"))
    // every guarded site must be consciously allowlisted, and every
    // allowlist entry must still exist (stale entries rot the lint)
    assert(found.toMap === allowlist,
      s"guarded partition-lambda write sites changed: found=$found allowlist=$allowlist")
  }

  test("the blanker preserves indices and wipes strings/comments") {
    val src = "val s = \"{ not a brace }\" // { neither }\nfoo { bar }"
    val b = blank(src)
    assert(b.length === src.length)
    assert(!b.substring(0, src.indexOf('\n')).contains('{'))
    assert(b.indexOf("foo {") === src.indexOf("foo {"))
  }

  test("the blanker survives char literals that would invert its phases") {
    // a '\"' char literal must not open a string; '{' must not add depth
    val src = "case '\"' => q\ncase '{' => b\ncase '\\\\' => e\n" +
      "df.foreachPartition { it =>\n  java.nio.file.Files.write(p, b)\n}"
    val (g, v) = scan("CharLit.scala", src)
    assert(g === 0 && v.size === 1, s"char literals blinded the lint: $v")
    assert(v.head.startsWith("CharLit.scala:5"))
  }

  test("lambda extent matches the enclosing block, not the whole file") {
    val src = "df.foreachPartition { it => val x = { 1 }; use(x) }\nFiles.write(p, b)"
    val b = blank(src)
    val Some((s, e)) = lambdaExtent(b, src.indexOf("foreachPartition") + "foreachPartition".length)
    val body = src.substring(s, e)
    assert(body.contains("use(x)"))
    assert(!body.contains("Files.write"))
  }

  test("the rule itself: unguarded executor write fires, guarded counts, driver write is ignored") {
    // the five-round putAll bug, minimized: raw nio write on executors
    val bad = "df.foreachPartition { it =>\n  java.nio.file.Files.write(p, b)\n}"
    val (g0, v0) = scan("Bad.scala", bad)
    assert(g0 === 0 && v0.size === 1 && v0.head.startsWith("Bad.scala:2"))
    // the Blobs.scala pattern: resolved-LocalFileSystem branch above the write
    val good = "df.foreachPartition { it =>\n  fs match {\n" +
      "    case local: org.apache.hadoop.fs.LocalFileSystem =>\n" +
      "      java.nio.file.Files.write(p, b)\n    case fs => hadoop(fs)\n  }\n}"
    val (g1, v1) = scan("Good.scala", good)
    assert(g1 === 1 && v1.isEmpty)
    // a bare token mention (identifier, import reference) with no
    // resolved-FS match branch must NOT satisfy the lint (ADVICE r10)
    val bare = "df.foreachPartition { it =>\n" +
      "  val useLocalFileSystem = true\n  java.nio.file.Files.write(p, b)\n}"
    val (g2, v2) = scan("Bare.scala", bare)
    assert(g2 === 0 && v2.size === 1, s"bare token satisfied the lint: $v2")
    // a driver-side write OUTSIDE any partition lambda is not this lint's
    // business (Bench/BenchDiff artifact writes)
    val driver = "java.nio.file.Files.write(p, b)\ndf.foreachPartition { it => send(it) }"
    assert(scan("Driver.scala", driver) === ((0, Seq.empty)))
    // two distinct raw calls in one lambda are two sites
    val two = "df.mapPartitions { it =>\n  Files.write(a, x)\n  new FileOutputStream(f)\n  it\n}"
    assert(scan("Two.scala", two)._2.size === 2)
  }
}
