package graft

/** Seeded regression fuzzer for byte-native extract parity: structural
  * bytes + malformed UTF-8 + multi-byte fragments; shrinks and reports a
  * minimal counterexample on failure. */
class FuzzProbe extends org.scalatest.funsuite.AnyFunSuite {
  test("fuzz byte-native vs reference") {
    import graft.extract.HtmlText
    val rnd = new java.util.Random(12345)
    val interesting = Array('<', '>', '&', ';', '/', '!', '-', 'a', 'p', ' ',
      '\n', '#', 'x', '3').map(_.toByte) ++
      Array(0x80, 0xC2, 0xA0, 0xE2, 0x87, 0xF0, 0x9F, 0x98, 0xFF).map(_.toByte)
    def gen(len: Int): Array[Byte] =
      Array.fill(len)(interesting(rnd.nextInt(interesting.length)))
    var failure: Array[Byte] = null
    var tries = 0
    while (failure == null && tries < 60000) {
      val b = gen(1 + rnd.nextInt(24))
      if (HtmlText.extractCleanBytes(b).toString != HtmlText.extractClean(b))
        failure = b
      tries += 1
    }
    if (failure != null) {
      // shrink: try removing each byte while still failing
      var cur = failure
      var changed = true
      while (changed) {
        changed = false
        var k = 0
        while (k < cur.length && !changed) {
          val cand = cur.take(k) ++ cur.drop(k + 1)
          if (cand.nonEmpty &&
            HtmlText.extractCleanBytes(cand).toString != HtmlText.extractClean(cand)) {
            cur = cand; changed = true
          }
          k += 1
        }
      }
      val hex = cur.map(x => f"${x & 0xFF}%02x").mkString(" ")
      info(s"MINIMAL FAILING: $hex")
      info(s"ref:  <${HtmlText.extractClean(cur)}>")
      info(s"byte: <${HtmlText.extractCleanBytes(cur).toString}>")
      fail(s"divergence on: $hex")
    }
  }
}
