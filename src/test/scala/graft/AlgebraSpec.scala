package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.catalog.{SourcePermission, Transformation}

/** Laws of the two pure algebras (SURVEY §7.2.2): Transformation
  * render/compose (`core/src/model/mappings.rs:124-150`) and the
  * SourcePermission policy algebra (`core/src/model/access_control.rs`).
  * Property checks run through plain ScalaCheck (no scalatestplus bridge in
  * the offline cache). */
class AlgebraSpec extends AnyFunSuite {

  private def assertProp(p: Prop): Unit = {
    val res = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("render substitutes the placeholder with parenthesized inner") {
    assert(Transformation("{v} * 100").render("l_tax") == "(l_tax) * 100")
    assert(Transformation.identity.render("x") == "(x)")
  }

  test("compose substitutes self (parenthesized) into other: f first, then g") {
    val f = Transformation("{v} / 10")
    val g = Transformation("{v} + 5")
    // reference semantics (`mappings.rs:137-149`): h = g(f(x))
    assert(f.compose(g).template == "({v} / 10) + 5")
    assert(f.compose(g).render("x") == "((x) / 10) + 5")
  }

  test("compose/render equivalence law: f.compose(g).render == g.render(f.render)") {
    def canon(s: String) = s.replaceAll("[()\\s]", "")
    assertProp(Prop.forAll(Gen.chooseNum(-99, 99), Gen.chooseNum(-99, 99)) { (a, b) =>
      val f = Transformation(s"{v} * $a")
      val g = Transformation(s"{v} + $b")
      canon(f.compose(g).render("c")) == canon(g.render(f.render("c")))
    })
  }

  test("compose is associative (modulo parens)") {
    def canon(s: String) = s.replaceAll("[()\\s]", "")
    assertProp(Prop.forAll(Gen.chooseNum(1, 9), Gen.chooseNum(1, 9), Gen.chooseNum(1, 9)) {
      (a, b, c) =>
        val f = Transformation(s"{v} * $a")
        val g = Transformation(s"{v} + $b")
        val h = Transformation(s"{v} - $c")
        canon(f.compose(g).compose(h).render("x")) ==
          canon(f.compose(g.compose(h)).render("x"))
    })
  }

  test("capture-brace escaping: {{...}} renders literal braces, no substitution") {
    // reference `num_capture_braces` semantics (`test/queries.py:17-21`):
    // doubled braces make brace literals unambiguous against the {v} token
    assert(Transformation("CASE WHEN '{{tax_val}}'='{{tax_val}}' THEN {v} END")
      .render("l_tax") ==
      "CASE WHEN '{tax_val}'='{tax_val}' THEN (l_tax) END")
    // an escaped placeholder itself is NOT a substitution site
    assert(Transformation("concat('{{v}}', {v})").render("x") == "concat('{v}', (x))")
  }

  test("capture-brace escapes survive compose (any number of hops)") {
    val f = Transformation("concat({v}, '{{tag}}')")
    val g = Transformation("upper({v})")
    val fg = f.compose(g)
    // still doubled in the composed TEMPLATE...
    assert(fg.template == "upper((concat({v}, '{{tag}}')))")
    // ...and literal only at the final render
    assert(fg.render("x") == "upper((concat((x), '{tag}')))")
    // {{v}} contains the {v} token — compose must not corrupt it
    val h = Transformation("concat('{{v}}', {v})")
    assert(h.compose(g).render("x") == "upper((concat('{v}', (x))))")
  }

  private def perm(cols: Set[String], rows: String) = SourcePermission(cols, rows)

  test("union widens, intersection narrows") {
    val p1 = perm(Set("a", "b"), "x > 1")
    val p2 = perm(Set("b", "c"), "y < 2")
    assert(p1.union(p2).allowedColumns == Set("a", "b", "c"))
    assert(p1.union(p2).allowedRows == "(x > 1) OR (y < 2)")
    assert(p1.intersection(p2).allowedColumns == Set("b"))
    assert(p1.intersection(p2).allowedRows == "(x > 1) AND (y < 2)")
  }

  test("policy evaluation: default ∪ (user ∩ relay), degrading when absent") {
    val d = perm(Set("a"), "false")
    val u = perm(Set("a", "b", "c"), "true")
    val r = perm(Set("b", "d"), "z = 1")
    assert(SourcePermission.evaluate(d, Some(u), Some(r)).allowedColumns == Set("a", "b"))
    assert(SourcePermission.evaluate(d, Some(u), Some(r)).allowedRows ==
      "(false) OR ((true) AND (z = 1))")
    assert(SourcePermission.evaluate(d, Some(u), None).allowedColumns == Set("a", "b", "c"))
    assert(SourcePermission.evaluate(d, None, Some(r)).allowedColumns == Set("a", "b", "d"))
    assert(SourcePermission.evaluate(d, None, None) == d)
  }

  test("column algebra laws: commutativity + idempotence") {
    val genCols = Gen.containerOf[Set, Byte](Gen.chooseNum(0, 20))
    assertProp(Prop.forAll(genCols, genCols) { (s1, s2) =>
      val p1 = perm(s1.map(_.toString), "r1")
      val p2 = perm(s2.map(_.toString), "r2")
      p1.union(p2).allowedColumns == p2.union(p1).allowedColumns &&
      p1.intersection(p2).allowedColumns == p2.intersection(p1).allowedColumns &&
      p1.union(p1).allowedColumns == p1.allowedColumns
    })
  }
}
