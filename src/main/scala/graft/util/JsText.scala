package graft.util

import java.util.Locale

/** JavaScript string-semantics helpers.
  *
  * The reference's sanitization kernel (`send-textract-result-to-dynamo/
  * lambda.ts:184-191`) is
  * {{{ key.toLowerCase().trim().replace(/\s/g, "_").replace(":", "") }}}
  * and the byte-identical-output invariant requires matching *JS* semantics,
  * which differ from the JVM defaults (SURVEY.md section 7.3 hard part (c)):
  *  - JS `\s` and `String.prototype.trim` include U+FEFF (BOM) and exclude
  *    U+001C..U+001F; Java's `Character.isWhitespace` does the opposite.
  *  - JS `String.replace(":", ...)` with a *string* pattern replaces only
  *    the FIRST occurrence; Java/Spark `replace`/`regexp_replace` are global.
  *  - JS `toLowerCase` is the Unicode default (locale-insensitive) mapping,
  *    i.e. Java's `toLowerCase(Locale.ROOT)`.
  */
object JsText {

  /** Exactly ECMA-262 WhiteSpace union LineTerminator (what JS `\s` matches):
    * TAB LF VT FF CR SP NBSP OGHAM-SP EN-QUAD..HAIR-SP LS PS NNBSP MMSP
    * IDEOGRAPHIC-SP BOM. Codepoints spelled numerically to keep the source
    * free of invisible characters.
    */
  def isJsWhitespace(c: Char): Boolean = {
    val i = c.toInt
    (i >= 0x09 && i <= 0x0d) || i == 0x20 || i == 0xa0 || i == 0x1680 ||
    (i >= 0x2000 && i <= 0x200a) ||
    i == 0x2028 || i == 0x2029 || i == 0x202f || i == 0x205f ||
    i == 0x3000 || i == 0xfeff
  }

  /** JS `String.prototype.trim()`. */
  def jsTrim(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isJsWhitespace(s.charAt(i))) i += 1
    while (j > i && isJsWhitespace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** JS `s.replace(/\s/g, "_")`. */
  def jsWhitespaceToUnderscore(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (isJsWhitespace(c)) '_' else c)
      i += 1
    }
    sb.toString
  }

  /** JS `s.replace(":", "")` - first occurrence only. */
  def removeFirstColon(s: String): String = {
    val i = s.indexOf(':')
    if (i < 0) s else s.substring(0, i) + s.substring(i + 1)
  }

  /** The reference's full key-sanitization chain,
    * `send-textract-result-to-dynamo/lambda.ts:184-191`. */
  def sanitizeKey(key: String): String =
    removeFirstColon(jsWhitespaceToUnderscore(jsTrim(key.toLowerCase(Locale.ROOT))))
}
