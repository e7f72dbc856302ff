package graft.functions.kernels

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.util.JsText

/** The engine's document-extraction kernel: a faithful transcription of the
  * reference's stage-4 compute (`send-textract-result-to-dynamo/lambda.ts`),
  * applied as a *pure function of the page bytes* — the async
  * Textract/SNS/DynamoDB hop collapses into one deterministic kernel
  * (north_star: "the Textract stage becomes a deterministic
  * Catalyst-expression text-extraction UDF ... byte-identical extracted text
  * per url").
  *
  * Pages carry their OCR-style block graph as an embedded
  * `<script type="application/x-textract">{"Blocks":[...]}</script>`
  * payload (engine convention; see `graft.synth.PageSynth`). Block shape
  * mirrors the Textract response consumed at `lambda.ts:51-70`:
  * `{Id, BlockType, EntityTypes?, Text?, SelectionStatus?,
  *   Relationships: [{Type, Ids}]?}`.
  *
  * Reference behaviors replicated exactly:
  *  - block-cap truncation: only the first [[BlockCap]] blocks are processed,
  *    mirroring the single `getDocumentAnalysis` call with no `NextToken`
  *    pagination (`lambda.ts:148-162` — only the first response page, ≤1000
  *    blocks, is ever consumed);
  *  - key/value/block map build in array order (`getKvMap`, `lambda.ts:51-70`);
  *  - KEY→VALUE graph join with **last VALUE id winning**
  *    (`find_value_block`, `lambda.ts:11-21`);
  *  - ordered CHILD text assembly: `WORD` → `text += Text + " "`,
  *    `SELECTION_ELEMENT` + `SELECTED` → `text += "X "`, trailing space
  *    retained, non-SELECTED skipped (`get_text`, `lambda.ts:25-47`);
  *  - KV fold with **later key block winning** on duplicate key text
  *    (`getKvRelationship`, `lambda.ts:74-89`; JS object assignment keeps
  *    first insertion position — LinkedHashMap.put matches);
  *  - key sanitization via [[JsText.sanitizeKey]] (`lambda.ts:184-191`);
  *  - empty-value filter on the *trimmed* value while storing the
  *    **untrimmed** original (`lambda.ts:193-199`).
  *
  * Documented divergence: a KEY block with no `Relationships` yields value
  * `""` here; in JS it would throw and silently drop the whole record
  * (`find_value_block` has no guard). Per Op-25 the engine never lets one
  * malformed row kill a batch.
  */
object BlockGraphKernel {

  /** First-response-page cap (Textract returns ≤1000 blocks per page). */
  final val BlockCap = 1000

  final val PayloadOpen = "<script type=\"application/x-textract\">"
  final val PayloadClose = "</script>"

  private val mapper = new ObjectMapper()

  final case class ExtractResult(text: String, data: Seq[(String, String)])

  val Empty: ExtractResult = ExtractResult("", Nil)

  /** Full extraction over page bytes: document text + sanitized KV map. */
  def extract(html: Array[Byte], blockCap: Int = BlockCap): ExtractResult = {
    if (html == null) Empty
    else extractStr(new String(html, StandardCharsets.UTF_8), blockCap)
  }

  /** Same, over an already-decoded body — lets the fused page expression
    * ([[graft.functions.ExtractPage]]) decode the fat html column once. */
  def extractStr(html: String, blockCap: Int = BlockCap): ExtractResult =
    findPayload(html) match {
      case None       => Empty
      case Some(json) => extractFromJson(json, blockCap)
    }

  def findPayload(html: String): Option[String] = {
    val start = html.indexOf(PayloadOpen)
    if (start < 0) return None
    val bodyStart = start + PayloadOpen.length
    val end = html.indexOf(PayloadClose, bodyStart)
    if (end < 0) None else Some(html.substring(bodyStart, end))
  }

  def extractFromJson(json: String, blockCap: Int = BlockCap): ExtractResult = {
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return Empty } // malformed payload → empty (Op-25)
    val blocksNode = root.get("Blocks")
    if (blocksNode == null || !blocksNode.isArray) return Empty

    val nBlocks = math.min(blocksNode.size(), blockCap)

    // getKvMap (lambda.ts:51-70): one pass, insertion order preserved.
    val blockMap = new mutable.LinkedHashMap[String, JsonNode]
    val keyMap = new mutable.LinkedHashMap[String, JsonNode]
    val valueMap = new mutable.LinkedHashMap[String, JsonNode]
    val lines = new mutable.ArrayBuffer[JsonNode]
    var i = 0
    while (i < nBlocks) {
      val block = blocksNode.get(i)
      val id = textOf(block, "Id")
      blockMap.put(id, block)
      textOf(block, "BlockType") match {
        case "KEY_VALUE_SET" =>
          if (hasEntityType(block, "KEY")) keyMap.put(id, block)
          else valueMap.put(id, block)
        case "LINE" => lines += block
        case _      => ()
      }
      i += 1
    }

    // getKvRelationship (lambda.ts:74-89): later key block wins.
    val kvs = new mutable.LinkedHashMap[String, String]
    for ((_, keyBlock) <- keyMap) {
      val valueBlock = findValueBlock(keyBlock, valueMap)
      val key = getText(keyBlock, blockMap)
      val v = valueBlock.map(getText(_, blockMap)).getOrElse("")
      kvs.put(key, v)
    }

    // sanitize + empty-filter (lambda.ts:172-200): later sanitized key wins,
    // stored value is the UNTRIMMED original.
    val sanitized = new mutable.LinkedHashMap[String, String]
    for ((key, v) <- kvs) {
      val sanitizedKey = JsText.sanitizeKey(key)
      if (JsText.jsTrim(v) != "") sanitized.put(sanitizedKey, v)
    }

    // Document text: get_text over LINE blocks in block order (engine-defined
    // document-level invariant; same get_text kernel as the KV path).
    val text = {
      val sb = new java.lang.StringBuilder
      lines.foreach(l => sb.append(getText(l, blockMap)))
      sb.toString
    }

    ExtractResult(text, sanitized.toSeq)
  }

  /** find_value_block (lambda.ts:11-21): last VALUE id wins; missing target
    * ids resolve to nothing (JS `value_map[id]` → undefined).
    */
  private def findValueBlock(
      keyBlock: JsonNode,
      valueMap: mutable.LinkedHashMap[String, JsonNode]): Option[JsonNode] = {
    var result: Option[JsonNode] = None
    val rels = keyBlock.get("Relationships")
    if (rels != null && rels.isArray) {
      var i = 0
      while (i < rels.size()) {
        val rel = rels.get(i)
        if (textOf(rel, "Type") == "VALUE") {
          val ids = rel.get("Ids")
          if (ids != null && ids.isArray) {
            var j = 0
            while (j < ids.size()) {
              result = valueMap.get(ids.get(j).asText()) // last id wins, even if absent
              j += 1
            }
          }
        }
        i += 1
      }
    }
    result
  }

  /** get_text (lambda.ts:25-47). */
  def getText(result: JsonNode, blockMap: collection.Map[String, JsonNode]): String = {
    val sb = new java.lang.StringBuilder
    val rels = result.get("Relationships")
    if (rels != null && rels.isArray) {
      var i = 0
      while (i < rels.size()) {
        val rel = rels.get(i)
        if (textOf(rel, "Type") == "CHILD") {
          val ids = rel.get("Ids")
          if (ids != null && ids.isArray) {
            var j = 0
            while (j < ids.size()) {
              blockMap.get(ids.get(j).asText()).foreach { word =>
                textOf(word, "BlockType") match {
                  case "WORD" =>
                    sb.append(textOf(word, "Text")).append(' ')
                  case "SELECTION_ELEMENT" =>
                    if (textOf(word, "SelectionStatus") == "SELECTED") sb.append("X ")
                  case _ => ()
                }
              }
              j += 1
            }
          }
        }
        i += 1
      }
    }
    sb.toString
  }

  @inline private def textOf(node: JsonNode, field: String): String = {
    val f = node.get(field)
    if (f == null || f.isNull) "" else f.asText()
  }

  private def hasEntityType(block: JsonNode, t: String): Boolean = {
    val ets = block.get("EntityTypes")
    if (ets == null || !ets.isArray) return false
    var i = 0
    while (i < ets.size()) {
      if (ets.get(i).asText() == t) return true
      i += 1
    }
    false
  }
}
