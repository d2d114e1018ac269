package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Scrub.redactPii($"t")).as[String].head()

  test("emails, IPs, SSNs and phones are redacted") {
    assert(redact("mail bob.smith+x@corp.example.co.uk now") === "mail <EMAIL> now")
    assert(redact("from 192.168.0.12 port 80") === "from <IP> port 80")
    assert(redact("ssn 123-45-6789.") === "ssn <SSN>.")
    assert(redact("call +44 207 946 0958 today") === "call <PHONE> today")
  }

  test("mixed PII in one document redacts every type") {
    val got = redact("a@b.io at 10.0.0.1 ssn 111-22-3333 tel +1 555 010 0100 end")
    assert(got === "<EMAIL> at <IP> ssn <SSN> tel <PHONE> end")
  }

  test("clean text passes through unchanged and the scrub is idempotent") {
    val clean = "the quick brown fox has 12 legs and 3.5 tails"
    assert(redact(clean) === clean)
    val dirty = "a@b.io at 10.0.0.1"
    assert(redact(redact(dirty)) === redact(dirty))
  }

  test("counts are measured pre-redaction, one per type") {
    val row = Scrub.scrub(
      Seq((1L, "a@b.io and c@d.io from 10.0.0.1")).toDF("id", "text"),
      "id", "text")
      .select("n_email", "n_ipv4", "n_ssn", "n_phone")
      .as[(Int, Int, Int, Int)].head()
    assert(row === ((2, 1, 0, 0)))
  }

  test("version-like and decimal numbers are not false positives") {
    // 3-part versions and decimals must survive; 4-part dotted quads do not
    assert(redact("v1.2.3 and pi 3.14159") === "v1.2.3 and pi 3.14159")
    assert(redact("release 1.2.3.4") === "release <IP>")
  }

  test("SQL pii_redact matches the column path char-for-char") {
    Scrub.registerUdfs(spark)
    val texts = Seq("mail a@b.io from 10.0.0.1 ssn 123-45-6789 tel +44 207 946 0958",
      "clean", "", "x a@b.io y c@d.io z")
    val viaSql = texts.toDF("t").selectExpr("pii_redact(t)").as[String].collect().toSeq
    val viaCol = texts.toDF("t").select(Scrub.redactPii($"t")).as[String].collect().toSeq
    assert(viaSql === viaCol)
  }

  test("scrub stays a single codegen'd projection over the scan") {
    val plan = Scrub.scrub(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrub must not shuffle:\n$plan")
    // the "*(1)" prefix marks the projection as whole-stage-codegen'd
    assert(plan.startsWith("*("), s"scrub must stay codegen'd:\n$plan")
  }
}
