package graft.tools

/** Prints reference MurmurHash3.stringHash values for cross-engine oracle
  * validation. Dev tool. */
object MurmurRef {
  def main(args: Array[String]): Unit = {
    import scala.util.hashing.MurmurHash3
    val tests = Seq(("hello world foo", 1), ("a", 1), ("", 7),
      ("the quick brown", 0x9e3779b9 + 1), ("xyzzy", 2 * 0x9e3779b9 + 1))
    tests.foreach { case (s, seed) =>
      println(s"MMREF\t$s\t$seed\t${MurmurHash3.stringHash(s, seed)}")
    }
    (0 until 8).foreach(i => println(s"MMSEED\t$i\t${i * 0x9e3779b9 + 1}"))
  }
}
