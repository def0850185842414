package graft.ops

import graft.SparkSpec

/** BPE trainer + segmentation kernel: hand-computed merges, the
  * rank-sequential apply contract (incl. the symbol-boundary and
  * overlapping-pair corners the delimited SQL oracle mirrors), early
  * stop, dict cap, and encode counts. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // words: ab×3 (from "ab ab ab"), abc×1 → pairs (a,b)=4, (b,c)=1
  private val docs = Seq((0L, "ab ab ab"), (1L, "abc")).toDF("doc_id", "text")

  test("train: hand-computed merge order and early stop") {
    // merge1 = (a,b) count 4 → words [ab]x3, [ab,c]x1; merge2 = (ab,c)
    // count 1 → below the occurs-twice bar → early stop after 1 merge?
    // No: bestC starts at 1 so a pair needs count >= 2. (ab,c)=1 stops.
    assert(Bpe.train(docs, numMerges = 5) == Seq(("a", "b")))
  }

  test("train: frequency-weighted pair counts and deterministic ties") {
    // words: xy×2, yz×2 → pairs (x,y)=2, (y,z)=2 tie → lexicographically
    // smallest pair (x,y) wins rank 1, then (y,z) rank 2
    val d = Seq((0L, "xy xy yz yz")).toDF("doc_id", "text")
    assert(Bpe.train(d, numMerges = 2) == Seq(("x", "y"), ("y", "z")))
  }

  test("train: maxWords cap keeps the most frequent words") {
    // cap=1 keeps only ab (count 3): merges learn (a,b) then stop
    assert(Bpe.train(docs, numMerges = 5, maxWords = 1) == Seq(("a", "b")))
  }

  test("encode: rank-sequential apply, symbol boundaries, empty words") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val out = Bpe
      .encode(
        Seq(
          (0L, "abc ab xaby"), // abc → ln rank1 [ab,c] rank2 [abc]; xaby: inner (a,b) merges
          (1L, "aab"), // [a,a,b] → (a,b) at j=1 → [a, ab]
          (2L, "b a") // no adjacent pair inside a word → untouched chars
        ).toDF("doc_id", "text"),
        merges
      )
      .orderBy("doc_id")
      .collect()
    assert(out(0).getString(1) == "abc ab x ab y")
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 5L)
    assert(out(1).getString(1) == "a ab")
    assert(out(2).getString(1) == "b a")
    assert(out(2).getLong(3) == 2L)
  }

  test("encode: overlapping pair replaced non-overlapping left-to-right") {
    val out = Bpe
      .encode(Seq((0L, "aaa aaaa")).toDF("doc_id", "text"), Seq(("a", "a")))
      .collect()
    // aaa → [aa, a]; aaaa → [aa, aa]
    assert(out(0).getString(1) == "aa a aa aa")
  }

  test("encode: in-vocab words reproduce their training segmentation") {
    val merges = Bpe.train(docs, numMerges = 5)
    val out = Bpe.encode(docs, merges).orderBy("doc_id").collect()
    assert(out(0).getString(1) == "ab ab ab")
    assert(out(1).getString(1) == "ab c")
  }
}
