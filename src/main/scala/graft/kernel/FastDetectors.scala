package graft.kernel

/** Hand-rolled literal-anchored scanners for the three detectors that
  * dominate kernel time (profiled: DATE 2.8 s, LOCATION 0.8 s,
  * CONTRACT_NUMBER 0.6 s of a 6.0 s detection budget over 30k docs —
  * java.util.regex scans every position because these patterns have no
  * literal prefix for its Boyer-Moore fast path).
  *
  * Each scanner is **find()-equivalent** to its `core/Spec` pattern:
  * it enumerates, in start order, exactly the match the regex would produce
  * at each feasible start, then applies Matcher.find's consumption rule
  * (next search resumes at the previous match's end). Equivalence is
  * property-fuzzed in KernelProps directly against the compiled patterns on
  * adversarial near-miss inputs, and end-to-end by the kernel-vs-golden
  * parity suite (the golden oracle still runs the real regexes).
  *
  * Boundary semantics: Java's `\b` counts a word character as
  * `'_' || Character.isLetterOrDigit` (Unicode-aware — verified
  * empirically: 'é'/'х'/arabic-indic digits block the boundary, '①' does
  * not), while `\d` / `[A-Z]` / `[a-z]` are ASCII-only.
  */
private[graft] object FastDetectors {

  @inline private def isWord(c: Char): Boolean = c == '_' || Character.isLetterOrDigit(c)
  @inline private def isD(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def boundaryBefore(t: String, i: Int): Boolean =
    i == 0 || !isWord(t.charAt(i - 1))
  @inline private def boundaryAfter(t: String, i: Int): Boolean =
    i >= t.length || !isWord(t.charAt(i))
  /** Length of the ASCII-digit run starting at `i`, capped at `max`. */
  private def digitRun(t: String, i: Int, max: Int = Int.MaxValue): Int = {
    var n = 0
    while (i + n < t.length && n < max && isD(t.charAt(i + n))) n += 1
    n
  }

  /** Matcher.find consumption over start-ordered candidates. */
  private def consume(cands: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    var pos = 0
    val out = Seq.newBuilder[(Int, Int)]
    cands.foreach { case (s, e) => if (s >= pos) { out += ((s, e)); pos = e } }
    out.result()
  }

  private val Months = Array("January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December")
  private val MonthsByInitial: Map[Char, Array[String]] =
    Months.groupBy(_.charAt(0))

  /** DATE: `\b(Month) \d{1,2}, \d{4}\b|\b\d{4}-\d{2}-\d{2}\b`.
    * The two branches start with a letter vs a digit, so at most one
    * candidate exists per start position. */
  def dateMatches(t: String): Seq[(Int, Int)] = {
    val cands = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      // month branch, anchored at the month-name initial
      if (c >= 'A' && c <= 'S' && boundaryBefore(t, i)) {
        MonthsByInitial.get(c).foreach { ms =>
          val m = ms.find(m => t.regionMatches(i, m, 0, m.length))
          m.foreach { month =>
            var j = i + month.length
            if (j < t.length && t.charAt(j) == ' ') {
              j += 1
              val day = digitRun(t, j)
              // greedy \d{1,2} then literal ", ": try 2 digits, then 1
              val dayLen =
                if (day >= 2 && t.regionMatches(j + 2, ", ", 0, 2)) 2
                else if (day >= 1 && t.regionMatches(j + 1, ", ", 0, 2)) 1
                else -1
              if (dayLen > 0) {
                val y = j + dayLen + 2
                if (digitRun(t, y, 5) == 4 && boundaryAfter(t, y + 4))
                  cands += ((i, y + 4))
              }
            }
          }
        }
      }
      // ISO branch, anchored at the year-month dash
      if (c == '-' && i >= 4) {
        val s = i - 4
        if (digitRun(t, s, 5) == 4 && boundaryBefore(t, s) &&
          digitRun(t, i + 1, 3) == 2 && i + 3 < t.length && t.charAt(i + 3) == '-' &&
          digitRun(t, i + 4, 3) == 2 && boundaryAfter(t, i + 6))
          cands += ((s, i + 6))
      }
      i += 1
    }
    consume(cands.result().sortBy(_._1))
  }

  /** Lowercase-run helper: length of [a-z]+ starting at i. */
  private def lowerRun(t: String, i: Int): Int = {
    var n = 0
    while (i + n < t.length && { val c = t.charAt(i + n); c >= 'a' && c <= 'z' }) n += 1
    n
  }

  private val Titles = Array("Mr", "Ms", "Mrs", "Dr") // regex alternation order

  /** PERSON: `\b(?:Mr|Ms|Mrs|Dr)\. [A-Z][a-z]+ [A-Z][a-z]+\b`. The regex
    * tries the title alternatives in order with full continuation; a greedy
    * `[a-z]+` followed by a literal can only succeed run-whole (backtracked
    * positions still face a lowercase next char). */
  def personMatches(t: String): Seq[(Int, Int)] = {
    @inline def isUp(c: Char) = c >= 'A' && c <= 'Z'
    def name(i: Int): Int = { // length of [A-Z][a-z]+ at i, or -1
      if (i < t.length && isUp(t.charAt(i))) {
        val r = lowerRun(t, i + 1)
        if (r >= 1) 1 + r else -1
      } else -1
    }
    val cands = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if ((c == 'M' || c == 'D') && boundaryBefore(t, i)) {
        var hit = -1
        var k = 0
        while (hit < 0 && k < Titles.length) {
          val title = Titles(k)
          if (t.regionMatches(i, title, 0, title.length) &&
            t.regionMatches(i + title.length, ". ", 0, 2)) {
            val f = i + title.length + 2
            val n1 = name(f)
            if (n1 > 0 && f + n1 < t.length && t.charAt(f + n1) == ' ') {
              val n2 = name(f + n1 + 1)
              if (n2 > 0 && boundaryAfter(t, f + n1 + 1 + n2))
                hit = f + n1 + 1 + n2
            }
          }
          k += 1
        }
        if (hit > 0) cands += ((i, hit))
      }
      i += 1
    }
    consume(cands.result())
  }

  private val Cities = Array("Washington", "Arlington", "Springfield", "Denver",
    "Austin", "Phoenix", "Seattle", "Portland", "Chicago", "Boston")
  private val CitiesByInitial: Map[Char, Array[String]] = Cities.groupBy(_.charAt(0))

  /** LOCATION: `\b(City), [A-Z]{2}\b`. */
  def locationMatches(t: String): Seq[(Int, Int)] = {
    val cands = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c >= 'A' && c <= 'W' && boundaryBefore(t, i)) {
        CitiesByInitial.get(c).foreach { cs =>
          cs.find(city => t.regionMatches(i, city, 0, city.length)).foreach { city =>
            val j = i + city.length
            if (t.regionMatches(j, ", ", 0, 2) && j + 4 <= t.length &&
              t.charAt(j + 2).isUpper && t.charAt(j + 2) <= 'Z' && t.charAt(j + 2) >= 'A' &&
              t.charAt(j + 3) >= 'A' && t.charAt(j + 3) <= 'Z' &&
              boundaryAfter(t, j + 4))
              cands += ((i, j + 4))
          }
        }
      }
      i += 1
    }
    consume(cands.result().sortBy(_._1))
  }

  /** CONTRACT_NUMBER: `\b[A-Z]{2,4}-\d{4,}-\d{4,}\b`, anchored at the first
    * dash. With a greedy-then-backtrack `[A-Z]{2,4}` preceded by `\b`, the
    * ONLY viable start is the beginning of the uppercase run (any later
    * start has an uppercase letter immediately before it — no boundary), so
    * a match exists iff the run length is 2..4. Greedy `\d{4,}` must end at
    * a non-digit, so the digit runs are taken whole. */
  def contractMatches(t: String): Seq[(Int, Int)] = {
    val cands = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < t.length) {
      if (t.charAt(i) == '-' && i >= 2) {
        var u = 0
        while (u < i && u < 5 && { val c = t.charAt(i - 1 - u); c >= 'A' && c <= 'Z' }) u += 1
        if (u >= 2 && u <= 4 && boundaryBefore(t, i - u)) {
          val r1 = digitRun(t, i + 1)
          if (r1 >= 4 && i + 1 + r1 < t.length && t.charAt(i + 1 + r1) == '-') {
            val r2 = digitRun(t, i + 2 + r1)
            if (r2 >= 4 && boundaryAfter(t, i + 2 + r1 + r2))
              cands += ((i - u, i + 2 + r1 + r2))
          }
        }
      }
      i += 1
    }
    consume(cands.result().sortBy(_._1))
  }
}
