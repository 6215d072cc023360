package graft

import org.apache.spark.sql.functions._
import graft.expressions.BpeVocab
import graft.ops.Cost

/** Real-BPE tokenizer: merge order follows rank, merges.txt parsing,
  * and the DataFrame expression path.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = BpeVocab.fromMerges(
    """#version: test
      |h e
      |l l
      |he ll
      |hell o
      |i n
      |""".stripMargin.linesIterator)

  test("encode merges the lowest-rank adjacent pair first, to fixpoint") {
    // hello: h e l l o → (h e)→he → (l l)→ll → (he ll)→hell → (hell o)→hello
    assert(vocab.encodePreToken("hello") == Seq("hello"))
    // partial coverage: "help" → he l p (no (l p) merge)
    assert(vocab.encodePreToken("help") == Seq("he", "l", "p"))
    // rank order matters: in "lll" the (l l) merge applies left-to-right
    assert(vocab.encodePreToken("lll") == Seq("ll", "l"))
    assert(vocab.encodePreToken("x") == Seq("x"))
  }

  test("tokenize pre-splits like the regex estimate, then merges within pre-tokens") {
    // "hello in 42!" → pretokens [hello][in][42][!]; no ("4","2") merge
    // rule, so the digit run stays two symbols
    assert(vocab.tokenize("hello in 42!") == Seq("hello", "in", "4", "2", "!"))
    assert(vocab.countTokens("hello in 42!") == 5)
    // the merge never crosses a pre-token boundary
    assert(vocab.countTokens("he llo") == 3) // [he] [ll, o]
  }

  test("expression path counts per row and handles nulls") {
    val df = Seq(Some("hello hello"), Some(""), None).toDF("t")
    val got = df.select(Cost.bpeVocabTokenCount(col("t"), vocab).as("n"))
      .as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(2), Some(0), None))
  }

  test("'#'-left merge rules are real; only the #version header is skipped") {
    val v = BpeVocab.fromMerges("#version: 0.2\n# #\n## #\n".linesIterator)
    assert(v.encodePreToken("###") == Seq("###"))
    assert(v.encodePreToken("##") == Seq("##"))
  }

  test("supplementary-plane characters stay one symbol (no surrogate splitting)") {
    val party = new String(Character.toChars(0x1F389)) // one non-BMP code point
    val v = BpeVocab.fromMerges(Iterator.empty)
    assert(v.encodePreToken(party) == Seq(party))
    assert(v.encodePreToken(party + party).size == 2)
    // and a merge rule naming the code point applies
    val v2 = BpeVocab.fromMerges(Iterator(s"$party $party"))
    assert(v2.encodePreToken(party + party) == Seq(party + party))
  }

  test("merges file round-trips through load") {
    val f = java.nio.file.Files.createTempFile("merges", ".txt")
    java.nio.file.Files.write(f, "h e\nl l\n".getBytes("UTF-8"))
    val v = BpeVocab.load(f.toString)
    assert(v.encodePreToken("hello") == Seq("he", "ll", "o"))
  }
}
