package graft

import org.scalatest.funsuite.AnyFunSuite

class MemoSpec extends AnyFunSuite {

  test("lru caps size and evicts the least-recently-used entry") {
    val m = Memo.lru[String, Integer](3)
    m.put("a", 1); m.put("b", 2); m.put("c", 3)
    assert(m.size() === 3)
    m.get("a") // touch: a becomes most-recent, b is now eldest
    m.put("d", 4)
    assert(m.size() === 3)
    assert(!m.containsKey("b"))
    assert(m.containsKey("a") && m.containsKey("c") && m.containsKey("d"))
  }

  test("computeIfAbsent memoizes and runs the body once per key") {
    val m = Memo.lru[String, Integer](8)
    var calls = 0
    def get(k: String): Int =
      m.computeIfAbsent(k, _ => { calls += 1; Integer.valueOf(42) }).intValue()
    assert(get("k") === 42)
    assert(get("k") === 42)
    assert(calls === 1)
  }

  test("eviction only costs a recompute, not a wrong answer") {
    val m = Memo.lru[String, Integer](2)
    var calls = 0
    def get(k: String): Int =
      m.computeIfAbsent(k, kk => { calls += 1; Integer.valueOf(kk.length) }).intValue()
    assert(get("aa") === 2)
    assert(get("bbb") === 3)
    assert(get("cccc") === 4) // evicts "aa"
    assert(get("aa") === 2)   // recomputed, same value
    assert(calls === 4)
  }
}
