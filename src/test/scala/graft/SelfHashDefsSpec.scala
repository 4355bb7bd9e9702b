package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 ADVICE gate: the committed `SELFHASH.json`'s per-query
  * DEFINITION fingerprints (sha256 of each oracle SQL) must equal what the
  * CURRENT source produces. Round 12 proved the failure mode: a stale
  * committed artifact whose def hashes matched neither the base nor the
  * head code silently blinded the cross-round drift gate
  * (`scripts/selfhash_drift.py`) for `text_gopher`/`quality_ablation` —
  * moved-hash detection keyed on defs that tracked nothing. This spec
  * makes that state unrepresentable in a green tree: edit an oracle SQL
  * and the test stays red until `graft.Verify` regenerates SELFHASH.json
  * from the same source (the round-close flow), so the committed artifact
  * always fingerprints the committed code.
  *
  * Queries added since the artifact was written are allowed (they appear
  * at the next regeneration); queries REMOVED from source while still in
  * the artifact fail — a removal is exactly the kind of silent surface
  * shrink the drift gate exists to catch. No Spark session needed: this
  * is pure string hashing, the same bytes `Verify.main` writes.
  */
class SelfHashDefsSpec extends AnyFunSuite {

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("committed SELFHASH.json def fingerprints match current oracle SQL") {
    val path = Paths.get("SELFHASH.json")
    assume(Files.exists(path), "no committed SELFHASH.json (fresh clone)")
    val text = Files.readString(path)
    // minimal extraction of the flat "defs" object — the artifact is
    // machine-written by Verify.main with only hex values, no nesting
    val defsBlock = text.split("\"defs\":", 2) match {
      case Array(_, rest) => rest.split("\\}", 2)(0)
      case _              => fail("SELFHASH.json has no defs field")
    }
    val committed = "\"([^\"]+)\"\\s*:\\s*\"([0-9a-f]{64})\"".r
      .findAllMatchIn(defsBlock).map(m => m.group(1) -> m.group(2)).toMap
    assert(committed.nonEmpty, "defs block parsed empty — artifact malformed?")
    val current = SparkEntry.oracleSql
    val stale = committed.collect {
      case (name, hash) if current.contains(name) && sha(current(name)) != hash =>
        name
    }.toSeq.sorted
    assert(stale.isEmpty,
      s"SELFHASH.json defs are STALE for ${stale.mkString(", ")} — the " +
        "oracle SQL changed since the artifact was written; regenerate " +
        "with graft.Verify at sf0.01 before committing (a stale artifact " +
        "blinds scripts/selfhash_drift.py)")
    val removed = (committed.keySet -- current.keySet).toSeq.sorted
    assert(removed.isEmpty,
      s"queries in SELFHASH.json but gone from source: ${removed.mkString(", ")}" +
        " — regenerate the artifact (or restore the queries)")
  }
}
