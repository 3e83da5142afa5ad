package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{Extractor, FlatTrie}
import graft.schema.CatalogEntry
import graft.text.{CharScan, TextNorm}

/** Differential lock for the fused allocation-free extraction kernel
  * ([[CharScan]] + [[FlatTrie]]) against the String-based forms it replaced:
  * the buffer clean must equal `TextNorm.parseForJson` char-for-char, the
  * offset tokenizer must equal `TextNorm.fastTokens`, and the full kernel
  * (mention scan + marker adjacency + distinct mention edges) must emit the
  * same rows as an independent Map-trie model over randomized catalogs,
  * markers, canon maps and stress texts. */
class FusedKernelSpec extends AnyFunSuite {

  private val stressAlphabet: IndexedSeq[Char] =
    ('a' to 'f') ++ Seq('"', '\\', '\n', '\r', '\t', 'x', 'F', '0', '9', ' ',
      '\u000B', '\f', '\u0000', 'é', '中')

  private def randomText(rnd: scala.util.Random, maxLen: Int): String =
    Seq.fill(rnd.nextInt(maxLen))(stressAlphabet(rnd.nextInt(stressAlphabet.size))).mkString

  test("clean buffer equals parseForJson char-for-char (20k stress strings)") {
    val rnd = new scala.util.Random(1)
    val s = new CharScan.Scratch
    (1 to 20000).foreach { _ =>
      val raw = randomText(rnd, 60)
      val len = CharScan.clean(raw, s)
      val got = new String(s.buf, 0, len)
      val want = TextNorm.parseForJson(raw)
      assert(got == want, s"input=" + raw.map(_.toInt))
    }
  }

  test("offset tokenizer equals fastTokens, and slice hashes equal String.hashCode") {
    val rnd = new scala.util.Random(2)
    val s = new CharScan.Scratch
    (1 to 20000).foreach { _ =>
      val raw = randomText(rnd, 60)
      val len = CharScan.clean(raw, s)
      CharScan.tokenize(s, len)
      val got = (0 until s.nTok).map(i => new String(s.buf, s.tokStart(i), s.tokEnd(i) - s.tokStart(i)))
      val want = TextNorm.fastTokens(TextNorm.parseForJson(raw)).toSeq
      assert(got == want, s"input=" + raw.map(_.toInt))
      (0 until s.nTok).foreach { i =>
        assert(s.tokHash(i) == got(i).hashCode, s"hash mismatch on token '${got(i)}'")
      }
    }
  }

  /** The pre-fusion kernel logic, kept verbatim as the differential model:
    * parseForJson + fastTokens + greedy longest-match walk over the
    * Map-based [[Extractor.TrieNode]], then marker adjacency, optional
    * context rows, and per-turn distinct mention edges. */
  private def modelExtract(
      convId: String, turnIdx: Int, rawText: String,
      trie: Extractor.TrieNode, markers: Map[String, String],
      emitContext: Boolean): Seq[Extractor.Extracted] = {
    val text = if (rawText == null) "" else TextNorm.parseForJson(rawText)
    val toks = TextNorm.fastTokens(text)
    val mentions = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    val marks = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    var i = 0
    while (i < toks.length) {
      var node = trie
      var j = i
      var bestEnd = -1
      var bestEnt: String = null
      var continue = true
      while (continue && j < toks.length) {
        node.children.getOrElse(toks(j), null) match {
          case null => continue = false
          case child =>
            if (child.entity != null) { bestEnd = j; bestEnt = child.entity }
            node = child
            j += 1
        }
      }
      if (bestEnd >= 0) { mentions += ((i, bestEnt)); i = bestEnd + 1 }
      else {
        markers.get(toks(i)).foreach(p => marks += ((i, p)))
        i += 1
      }
    }
    val out = scala.collection.mutable.ArrayBuffer[Extractor.Extracted]()
    marks.foreach { case (pos, pred) =>
      val left = mentions.filter(_._1 < pos).lastOption
      val right = mentions.find(_._1 > pos)
      (left, right) match {
        case (Some((_, l)), Some((_, r))) =>
          out += Extractor.Extracted(convId, turnIdx, l, pred, r)
        case (None, Some((_, r))) if emitContext =>
          out += Extractor.Extracted(convId, turnIdx, Extractor.OrphanSubj, pred, r)
        case _ =>
      }
    }
    if (emitContext && mentions.nonEmpty)
      out += Extractor.Extracted(convId, turnIdx,
        "__ctx__", Extractor.LastMentionPred, mentions.last._2)
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    mentions.foreach { case (_, e) => seen += e }
    seen.foreach { e =>
      out += Extractor.Extracted(convId, turnIdx, s"urn:conv:$convId",
        Extractor.MentionsPred, e)
    }
    out.toSeq
  }

  private def randomCatalogAndMarkers(rnd: scala.util.Random)
      : (Seq[CatalogEntry], Map[String, String], Map[String, String]) = {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "aa'", "a_b", "\\\\", "''")
    def alias(): String =
      Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val catalog = (1 to (3 + rnd.nextInt(8))).map { i =>
      CatalogEntry(s"urn:e:${rnd.nextInt(6)}", alias(), "L", rnd.nextInt(3))
    }
    val markers = (1 to (1 + rnd.nextInt(3)))
      .map(_ => vocab(rnd.nextInt(vocab.size)) -> s"urn:p:${rnd.nextInt(3)}").toMap
    val canon = if (rnd.nextBoolean()) Map.empty[String, String]
      else (0 to 5).map(i => s"urn:e:$i" -> s"urn:e:${i / 2}").toMap
    (catalog, markers, canon)
  }

  /** Mention-bearing text: words drawn from the catalog/marker vocabulary so
    * trie hits, multi-token spans and marker adjacency actually occur. */
  private def mentionText(rnd: scala.util.Random,
      catalog: Seq[CatalogEntry], markers: Map[String, String]): String = {
    val words = catalog.flatMap(_.alias.split(" ")) ++ markers.keys ++
      Seq("zz", "yy", "\t", "\"q\"")
    Seq.fill(rnd.nextInt(14))(words(rnd.nextInt(words.size)))
      .mkString(if (rnd.nextBoolean()) " " else "  ")
  }

  test("fused kernel output equals the Map-trie model (randomized, via Spark)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    (1 to 25).foreach { round =>
      val (catalog, markers, canon) = randomCatalogAndMarkers(rnd)
      val sentinel = rnd.nextBoolean()
      val emitCtx = rnd.nextBoolean()
      val turns = (1 to 40).map { i =>
        graft.schema.Turn(s"c${i % 7}", i, "user", mentionText(rnd, catalog, markers),
          null, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      }
      val got = Extractor.extract(turns.toDS(), catalog, markers,
        emitContext = emitCtx, canon = canon, sentinelAmbiguous = sentinel)
        .collect().toSeq
        .sortBy(e => (e.conv_id, e.turn_idx, e.subj, e.pred, e.obj))
      val trie = Extractor.buildTrie(catalog, canon, sentinel)
      val want = turns.flatMap(t =>
        modelExtract(t.conv_id, t.turn_idx, t.text, trie, markers, emitCtx))
        .sortBy(e => (e.conv_id, e.turn_idx, e.subj, e.pred, e.obj))
      assert(got == want, s"round=$round sentinel=$sentinel emitCtx=$emitCtx")
    }
  }

  test("buffer growth paths: multi-KB texts and >64-token turns reuse one scratch") {
    // exercises Scratch.ensureBuf (clean output > 256 chars), ensureTok
    // (mid-scan copyOf beyond 64 tokens) and ScanState's nTok > cap resize —
    // the exact paths short random inputs never reach
    val rnd = new scala.util.Random(7)
    val s = new CharScan.Scratch
    (1 to 300).foreach { _ =>
      val raw = randomText(rnd, 4000) // up to ~16 KB cleaned (tab fan-out)
      val len = CharScan.clean(raw, s)
      assert(new String(s.buf, 0, len) == TextNorm.parseForJson(raw))
      CharScan.tokenize(s, len)
      val got = (0 until s.nTok).map(i =>
        new String(s.buf, s.tokStart(i), s.tokEnd(i) - s.tokStart(i)))
      assert(got == TextNorm.fastTokens(TextNorm.parseForJson(raw)).toSeq)
    }
  }

  test("fused kernel equals the model on long turns (growth inside mapPartitions)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val rnd = new scala.util.Random(8)
    val (catalog, markers, canon) = randomCatalogAndMarkers(rnd)
    val words = catalog.flatMap(_.alias.split(" ")) ++ markers.keys ++ Seq("zz", "\tq\t")
    // 200-500 tokens per turn: forces ScanState past its 64-slot arrays and
    // the scratch past 256 chars, repeatedly, within one partition
    val turns = (1 to 12).map { i =>
      val text = Seq.fill(200 + rnd.nextInt(300))(words(rnd.nextInt(words.size))).mkString(" ")
      graft.schema.Turn(s"c${i % 3}", i, "user", text,
        null, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }
    val got = Extractor.extract(turns.toDS().coalesce(1), catalog, markers,
      emitContext = true, canon = canon)
      .collect().toSeq.sortBy(e => (e.conv_id, e.turn_idx, e.subj, e.pred, e.obj))
    val trie = Extractor.buildTrie(catalog, canon)
    val want = turns.flatMap(t =>
      modelExtract(t.conv_id, t.turn_idx, t.text, trie, markers, emitContext = true))
      .sortBy(e => (e.conv_id, e.turn_idx, e.subj, e.pred, e.obj))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("hash collisions resolve by chars: Aa/BB aliases and markers") {
    assert("Aa".hashCode == "BB".hashCode) // the classic Java collision pair
    val catalog = Seq(
      CatalogEntry("urn:e:aa", "Aa", "L", 0),
      CatalogEntry("urn:e:bb", "BB", "L", 0),
      CatalogEntry("urn:e:ab", "Aa BB", "L", 0))
    val (flat, values) = FlatTrie.fromTrie(Extractor.buildTrie(catalog))
    val s = new CharScan.Scratch
    def matchOne(text: String): String = {
      val len = CharScan.clean(text, s)
      CharScan.tokenize(s, len)
      var node = 0
      var j = 0
      var best: String = null
      var continue = true
      while (continue && j < s.nTok) {
        val c = flat.child(node, s.buf, s.tokStart(j), s.tokEnd(j), s.tokHash(j))
        if (c < 0) continue = false
        else {
          if (flat.payload(c) >= 0) best = values(flat.payload(c))
          node = c; j += 1
        }
      }
      best
    }
    assert(matchOne("Aa") == "urn:e:aa")
    assert(matchOne("BB") == "urn:e:bb")
    assert(matchOne("Aa BB") == "urn:e:ab") // longest match through a colliding edge
    assert(matchOne("AaBB") == null)

    val tm = CharScan.TokenMap.build(Array("Aa", "BB"), Array(1, 2))
    val len = CharScan.clean("Aa BB Ab", s)
    CharScan.tokenize(s, len)
    val got = (0 until s.nTok).map(i =>
      tm.lookup(s.buf, s.tokStart(i), s.tokEnd(i), s.tokHash(i)))
    assert(got == Seq(1, 2, -1))
  }

  test("encoded kernel equals string kernel under dictionary decode (randomized)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    (1 to 8).foreach { round =>
      val (catalog, markers, canon0) = randomCatalogAndMarkers(rnd)
      // extractEncoded requires a total canon map over catalog entities
      val canon = catalog.map(_.entityId).distinct
        .map(e => e -> canon0.getOrElse(e, e)).toMap
      val turns = (1 to 30).map { i =>
        graft.schema.Turn(s"c${i % 5}", i, "user", mentionText(rnd, catalog, markers),
          null, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      }
      val (rows, ents, preds) =
        Extractor.extractEncoded(turns.toDS(), catalog, markers, canon)
      val got = rows.collect().toSeq.map { r =>
        (r.conv_id,
         if (r.subjC == -1) s"urn:conv:${r.conv_id}" else ents(r.subjC),
         preds(r.predC), ents(r.objC))
      }.sorted
      val want = Extractor.extract(turns.toDS(), catalog, markers, canon = canon)
        .collect().toSeq.map(e => (e.conv_id, e.subj, e.pred, e.obj)).sorted
      assert(got == want, s"round=$round")
    }
  }
}
