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
}
