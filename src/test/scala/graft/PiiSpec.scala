package graft

import graft.ops.Pii

/** PII redaction: every pattern family, boundary behavior, and the
  * count-on-original-text contract.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("scrub: redacts emails, IPs and SSNs; counts measured pre-redaction") {
    val docs = Seq(
      (0L, "mail a.user+tag@sub.example.org and b@x.io now"),
      (1L, "servers 10.0.0.1 and 192.168.255.254 are up"),
      (2L, "ssn 123-45-6789 on file"),
      (3L, "mixed: c@d.com at 8.8.8.8 ssn 000-11-2222"),
      (4L, "clean text with nothing sensitive 12345 1.2 a-b")
    ).toDF("doc_id", "text")
    val out = Pii.scrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(out(0L) == (("mail [EMAIL] and [EMAIL] now", 2, 0, 0)))
    assert(out(1L) == (("servers [IP] and [IP] are up", 0, 2, 0)))
    assert(out(2L) == (("ssn [SSN] on file", 0, 0, 1)))
    assert(out(3L) == (("mixed: [EMAIL] at [IP] ssn [SSN]", 1, 1, 1)))
    assert(out(4L) == (("clean text with nothing sensitive 12345 1.2 a-b", 0, 0, 0)))
  }

  test("scrub: word boundaries keep near-misses intact") {
    val docs = Seq(
      // 5 octets — the leading 4 still match (\b sits between digit and
      // dot-digit? no: boundary requires a non-word edge; 1.2.3.4.5 has
      // no internal boundary break, but the regex is unanchored and \b
      // holds at the string edges) — pin the actual behavior explicitly:
      (0L, "ver 1.2.3.4.5 end"),
      (1L, "code X123-45-6789Y stays")    // letters glue: no \b → no match
    ).toDF("doc_id", "text")
    val out = Pii.scrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(3), r.getInt(4)))).toMap
    // 1.2.3.4.5: the IPv4 regex matches the prefix 1.2.3.4 (\b at '1',
    // \b between '4' and '.'? '.' is a non-word char so yes) — redacted.
    assert(out(0L) == (("ver [IP].5 end", 1, 0)))
    assert(out(1L) == (("code X123-45-6789Y stays", 0, 0)))
  }
}
