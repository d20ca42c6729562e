package graft

import org.apache.spark.sql.functions._
import graft.scrub.PiiScrub

/** C13 PII/toxicity scrub golden vectors (north_rule mandate). */
class ScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def runCol(in: String): String =
    Seq(in).toDF("t").select(PiiScrub.scrub(col("t")).as("r")).head().getString(0)

  val vectors: Seq[(String, String)] = Seq(
    ("mail me at john.doe+x@sub.example.co.uk today",
      "mail me at <EMAIL> today"),
    ("server 10.0.255.7 and 192.168.1.1 up", "server <IP> and <IP> up"),
    ("call +1 (555) 123-4567 or 555-867-5309", "call <PHONE> or <PHONE>"),
    ("card 4111111111111111 charged", "card <CARD> charged"),
    ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
    ("what an idiot move", "what an <TOXIC> move"),
    ("Idiot and MORON both", "<TOXIC> and <TOXIC> both"),
    ("no pii here at all", "no pii here at all"),
    ("", "")
  )

  test("scrub golden vectors — Column and String forms agree") {
    for ((in, want) <- vectors) {
      assert(PiiScrub.scrubStr(in) == want, s"Str <$in>")
      assert(runCol(in) == want, s"Col <$in>")
    }
  }

  test("scrub never reveals the original PII substrings") {
    val in = "a@b.co 1.2.3.4 123-45-6789"
    val out = PiiScrub.scrubStr(in)
    assert(!out.contains("a@b.co") && !out.contains("1.2.3.4"))
  }

  test("scrub is idempotent") {
    for ((in, _) <- vectors) {
      val once = PiiScrub.scrubStr(in)
      assert(PiiScrub.scrubStr(once) == once, s"<$in>")
    }
  }
}
