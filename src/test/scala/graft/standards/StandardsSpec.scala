package graft.standards

import org.scalatest.funsuite.AnyFunSuite

/** Embedded-IG loader matrix, mirroring the reference's loader tests
  * (`sdtm_ig.rs:244-310`, `adam_ig.rs` structure mapping) across the three
  * standards behind the selector. */
class StandardsSpec extends AnyFunSuite {

  test("SDTM-IG v3.4 loads 60+ domains") {
    assert(Standards.sdtmIg.size >= 60,
      s"expected at least 60 SDTM domains, got ${Standards.sdtmIg.size}")
  }

  test("DM variables are ordered and STUDYID/USUBJID present") {
    val dm = Standards.domain("DM").get
    val orders = dm.orderedVariables.flatMap(_.order)
    assert(orders == orders.sorted)
    assert(dm.variable("STUDYID").exists(_.isRequired))
    assert(dm.variable("USUBJID").exists(_.isRequired))
  }

  test("special-purpose and relationship domains load with variables") {
    val co = Standards.domain("CO").get
    assert(co.className.contains("Special-Purpose"))
    assert(co.variables.size >= 10)
    for (code <- Seq("RELREC", "RELSPEC", "RELSUB")) {
      val d = Standards.domain(code).get
      assert(d.className.contains("Relationship"))
      assert(d.variables.nonEmpty, s"$code should have variables")
    }
    // the columns the X4/X5 cross-domain checks key on
    assert(Standards.domain("RELSPEC").get.variable("PARENT").isDefined)
    assert(Standards.domain("RELREC").get.variable("IDVARVAL").isDefined)
  }

  test("SEND-IG v3.1.1 loads behind the selector") {
    assert(Standards.domains("send").size >= 25,
      s"expected at least 25 SEND domains, got ${Standards.sendIg.size}")
    // EX exists in both standards but with standard-specific structure text
    val ex = Standards.domain("send", "EX").get
    assert(ex.variables.exists(_.name == "EXSTDTC"))
    assert(Standards.domain("send", "MA").isDefined) // SEND-only (Macroscopic Findings)
  }

  test("ADaM-IG v1.3 maps long structure names to ADSL/BDS/TTE") {
    val adam = Standards.domains("adam")
    assert(adam.map(_.name).toSet == Set("ADSL", "BDS", "TTE"))
    val adsl = Standards.domain("adam", "ADSL").get
    assert(adsl.variables.exists(_.name == "USUBJID"))
    assert(adsl.variables.size >= 30)
    val bds = Standards.domain("adam", "BDS").get
    assert(bds.variables.exists(_.name == "PARAMCD"))
    // file order becomes variable order, numbered 1..n WITHIN the structure
    val orders = bds.orderedVariables.flatMap(_.order)
    assert(orders == orders.sorted)
    assert(orders.headOption.contains(1),
      s"BDS order should restart at 1, got ${orders.take(3)}")
  }

  test("unknown standard is rejected, lookups are case-insensitive") {
    intercept[IllegalArgumentException](Standards.domains("madeup"))
    assert(Standards.domain("sdtm", "dm").map(_.name).contains("DM"))
    assert(Standards.domain("SEND", "ex").isDefined)
  }

  // ---- Controlled Terminology: full embedded quarterly exports -------------

  test("CT catalogs load each publication's full embedded set") {
    // each quarterly release ships a different catalog mix
    // (embedded.rs:152-189): default 2024-03-29 carries DDF/MRCT,
    // 2025-03-28 swaps them for CDASH, 2025-09-26 adds Glossary
    assert(Standards.ctCatalogs.map(_.label).toSet == Set("SDTM CT",
      "ADaM CT", "DDF CT", "Define-XML CT", "MRCT CT", "Protocol CT", "SEND CT"))
    assert(Standards.ctCatalogs("2025-03-28").map(_.label).toSet == Set("SDTM CT",
      "ADaM CT", "CDASH CT", "Define-XML CT", "Protocol CT", "SEND CT"))
    assert(Standards.ctCatalogs("2025-09-26").map(_.label).toSet == Set("SDTM CT",
      "ADaM CT", "DDF CT", "Define-XML CT", "Glossary CT", "MRCT CT",
      "Protocol CT", "SEND CT"))
    val send = Standards.ctCatalogs.find(_.label == "SEND CT").get
    assert(send.version.contains(Standards.DefaultCtVersion))
    assert(send.publishingSet.contains("SEND"))
    // every release's full SEND CT quarterly export carries 139+ codelists
    assert(send.codelists.size >= 139,
      s"expected >=139 SEND CT codelists, got ${send.codelists.size}")
    assert(Standards.ct("sdtm").codes.size >= 150)
  }

  test("the same codelist resolves differently under two pinned CT versions") {
    val old = Standards.ct("send", "2024-03-29")
    val newer = Standards.ct("send", Standards.LatestCtVersion)
    // DPDTNAVG joined SEND Cardiovascular Test Code (C120532) after the
    // 2024-03-29 release — a study pinned to the launch-era terminology
    // must NOT resolve it, one on the newer release must
    assert(old.get("C120532").exists(_.resolve("DPDTNAVG").isEmpty))
    assert(newer.get("C120532").exists(_.resolve("DPDTNAVG").contains("DPDTNAVG")))
    // a codelist first published 2025-09-26 doesn't exist under older pins
    assert(old.get("C204416").isEmpty)
    assert(newer.get("C204416").isDefined)
    // the default-version surface is the reference's production default
    assert(Standards.DefaultCtVersion == "2024-03-29")
    assert(Standards.ct("send") eq Standards.ct("send", "2024-03-29"))
    // unknown versions are rejected loudly, not resolved to empty registries
    val e = intercept[IllegalArgumentException](Standards.ct("sdtm", "2019-01-01"))
    assert(e.getMessage.contains("2024-03-29"))
  }

  test("CT registry resolves realistic vocabularies (UNIT/ROUTE/FREQ via fallback)") {
    val sdtm = Standards.ct("sdtm")
    // SDTM-specific lists come from the curated catalog
    assert(sdtm.get("C74457").exists(_.terms.size >= 5)) // RACE
    assert(sdtm.get("C66790").exists(!_.extensible)) // ETHNIC
    // shared lists (UNIT/ROUTE/FREQ, r8: also VSTESTCD/LBTESTCD) now live
    // in the curated catalog — resolvable under EVERY version pin, with
    // realistic term counts
    assert(sdtm.get("C71620").exists(_.terms.size >= 900), "UNIT")
    assert(sdtm.get("C66729").exists(_.terms.size >= 100), "ROUTE")
    assert(sdtm.get("C71113").exists(_.terms.size >= 80), "FREQ")
    assert(sdtm.lookupMap("C71620").contains("MG/DL"))
    assert(sdtm.get("C66741").exists(_.terms.size >= 30), "VSTESTCD")
    assert(sdtm.get("C65047").exists(_.terms.size >= 100), "LBTESTCD")
    // ...which means a 2025-03-28-pinned SDTM study still resolves a
    // codelist that publication's sibling exports don't ship (DDF is
    // absent from 2025-03-28, so C171445 has no fallback there)
    assert(Standards.ct("sdtm", "2025-03-28").get("C171445").isDefined,
      "Mode of Subject Contact under a DDF-less pin")
  }

  test("curated SDTM-only codelists carry realistic term sets") {
    val sdtm = Standards.ct("sdtm")
    // full OMB race categories + NOT REPORTED/UNKNOWN
    val race = sdtm.get("C74457").get
    assert(race.terms.size >= 8, race.terms.map(_.submissionValue).toString)
    assert(race.resolve("not reported").contains("NOT REPORTED"))
    assert(sdtm.get("C66790").exists(_.terms.size >= 4), "ETHNIC")
    assert(sdtm.lookupMap("C66768").contains("RECOVERED/RESOLVED WITH SEQUELAE"), "OUT")
    // DSDECOD (NCOMPLT), EPOCH, DSCAT — SDTM-only lists absent from every
    // sibling publication, now resolvable
    val ncomplt = sdtm.get("C66727").get
    assert(ncomplt.extensible && ncomplt.terms.size >= 10)
    assert(ncomplt.resolve("Subject Withdrew Consent").contains("WITHDRAWAL BY SUBJECT"))
    assert(sdtm.get("C99079").exists(_.terms.size >= 7), "EPOCH")
    assert(sdtm.lookupMap("C74558").contains("PROTOCOL MILESTONE"), "DSCAT")
    // r6 tier: the most-referenced IG codelists previously unresolvable
    assert(sdtm.lookupMap("C66728").contains("DURING/AFTER"), "STENRF")
    assert(sdtm.get("C66728").exists(!_.extensible), "STENRF is closed")
    assert(sdtm.get("C78735").exists(_.resolve("Investigator").contains("INVESTIGATOR")), "EVAL")
    assert(sdtm.get("C78734").exists(_.resolve("CSF").contains("CEREBROSPINAL FLUID")), "SPEC synonym")
    assert(sdtm.get("C78736").exists(_.terms.size == 4), "NRIND")
    assert(sdtm.get("C66797").exists(_.terms.map(_.submissionValue).toSet ==
      Set("INCLUSION", "EXCLUSION")), "IECAT")
    assert(sdtm.get("C96777").exists(_.terms.size == 9), "EVALID")
    assert(sdtm.get("C85492").exists(_.resolve("Magnetic Resonance Imaging").contains("MRI")), "METHOD")
    // r7 tier: full term sets lifted from the public 2025-03-28 catalog
    // (same NCI codelists; all seven are extensible)
    assert(sdtm.get("C71153").exists(_.terms.size >= 100), "EGTESTCD")
    assert(sdtm.get("C71153").exists(
      _.resolve("QT Interval, Aggregate").contains("QTAG")), "EGTESTCD synonym")
    assert(sdtm.get("C66729").exists(_.resolve("Intravenous").contains("INTRAVENOUS")), "ROUTE")
    assert(sdtm.get("C71113").exists(_.resolve("Twice Daily; BID").nonEmpty ||
      sdtm.lookupMap("C71113").contains("BID")), "FREQ")
    assert(sdtm.get("C71148").exists(_.terms.size >= 15), "POSITION")
    assert(sdtm.get("C74456").exists(_.terms.size >= 1000), "LOC")
    assert(sdtm.lookupMap("C99073").contains("BILATERAL"), "LAT")
    assert(sdtm.get("C99074").exists(_.terms.size >= 40), "DIR")
    // r8 tier: 25 codelists / 8523 terms lifted verbatim from the
    // embedded public catalogs (SDTM-branded NCI preferred terms in the
    // SEND/DDF/Define-XML exports) — full UNIT, lab/vitals/ECG test
    // code+name pairs, dosage form, PK units, specimen condition
    assert(sdtm.get("C71620").exists(_.terms.size >= 930), "UNIT full")
    assert(sdtm.get("C65047").exists(_.terms.size >= 2400), "LBTESTCD full")
    assert(sdtm.get("C67154").exists(_.terms.size >= 2400), "LBTEST full")
    assert(sdtm.get("C65047").exists(
      _.resolve("Alanine Aminotransferase").contains("ALT")), "LBTESTCD synonym")
    assert(sdtm.get("C66741").exists(
      _.resolve("Systolic Blood Pressure").contains("SYSBP")), "VSTESTCD synonym")
    assert(sdtm.get("C66726").exists(_.terms.size >= 190), "DOSFRM")
    assert(sdtm.get("C71152").exists(_.terms.size >= 100), "EGTEST")
    assert(sdtm.get("C90013").exists(_.terms.size >= 20), "EGLEAD")
    assert(sdtm.get("C85493").exists(_.terms.size >= 380), "PKPARM")
    assert(sdtm.get("C85839").exists(_.terms.size >= 380), "PKPARMCD")
    assert(sdtm.get("C85494").exists(_.terms.size >= 600), "PKUNIT")
    assert(sdtm.get("C78733").exists(_.terms.size >= 20), "SPECCOND")
    assert(sdtm.get("C66789").exists(
      _.terms.map(_.submissionValue) == Seq("NOT DONE")), "ND")
    assert(sdtm.get("C78737").exists(_.terms.size == 2), "RELTYPE")
    // RDOMAIN terms generated from the embedded IG dataset list itself
    val rdomain = sdtm.get("C66734").get
    assert(rdomain.terms.size >= 60, s"DOMAIN terms: ${rdomain.terms.size}")
    assert(rdomain.resolve("ae").contains("AE"))
  }

  test("CT resolution order follows the study standard") {
    // SDTM studies resolve SEX from the curated SDTM catalog (4 terms incl.
    // INTERSEX); SEND studies resolve it from the SEND CT export
    val viaSdtm = Standards.ct("sdtm").get("C66731").get
    assert(viaSdtm.resolve("Male").contains("M"))
    val viaSend = Standards.ct("send").get("C66731").get
    assert(viaSend.terms.nonEmpty)
    // ADaM-only codelists (Date Imputation Flag) exist only through the ADaM
    // CT export and resolve for every standard via the alphabetical tail
    assert(Standards.ct("adam").get("C81223").exists(_.name == "Date Imputation Flag"))
    assert(Standards.ct("sdtm").get("C81223").isDefined)
    // ADaM registry puts its own publication first
    assert(Standards.ct("adam").catalogs.head.label == "ADaM CT")
    assert(Standards.ct("send").catalogs.head.label == "SEND CT")
    assert(Standards.ct("sdtm").catalogs.head.label == "SDTM CT")
  }
}
