package graft.util

import org.scalatest.funsuite.AnyFunSuite

class JsTextSpec extends AnyFunSuite {

  private val BOM = '\ufeff'
  private val NBSP = '\u00a0'
  private val IDSP = '\u3000'
  private val GS = '\u001d' // group separator: Java whitespace, NOT JS

  test("jsTrim trims JS whitespace incl BOM, not U+001C..1F") {
    assert(JsText.jsTrim("  a b  ") == "a b")
    assert(JsText.jsTrim(NBSP + "x" + BOM) == "x")
    assert(JsText.jsTrim(IDSP + "y ") == "y")
    // JS does NOT treat file/group/record/unit separators as whitespace
    assert(JsText.jsTrim(GS + "z" + GS) == GS + "z" + GS)
  }

  test("whitespace classes: JS \\s vs Java differences") {
    assert(JsText.isJsWhitespace(BOM)) // BOM: JS yes, Java no
    assert(!JsText.isJsWhitespace(GS)) // GS: JS no, Java yes
    assert(JsText.isJsWhitespace(NBSP)) // NBSP: JS yes, Character.isWhitespace no
    assert(JsText.isJsWhitespace('\u2004')) // three-per-em space
    assert(JsText.isJsWhitespace('\u2028')) // line separator
    assert(JsText.isJsWhitespace('\u205f'))
    assert(!JsText.isJsWhitespace('\u200b')) // zero-width space is NOT \s
  }

  test("removeFirstColon removes only the first colon") {
    assert(JsText.removeFirstColon("a:b:c") == "ab:c")
    assert(JsText.removeFirstColon("abc") == "abc")
    assert(JsText.removeFirstColon(":x:") == "x:")
  }

  test("sanitizeKey matches reference chain (lambda.ts:184-191)") {
    // toLowerCase -> trim -> \s/g -> "_" -> first ":" removed
    assert(JsText.sanitizeKey("  Well Name:  ") == "well_name")
    assert(JsText.sanitizeKey("A:B: C ") == "ab:_c")
    assert(JsText.sanitizeKey("Tab\tand\nnewline") == "tab_and_newline")
    assert(JsText.sanitizeKey(BOM + "Bom Key x") == "bom_key_x")
    assert(JsText.sanitizeKey("UPPER") == "upper")
    // inner (non-edge) whitespace becomes _, edge whitespace trimmed first
    assert(JsText.sanitizeKey(" a " + NBSP + " b ") == "a___b")
  }
}
