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

  test("computeIfAbsent bodies for unrelated keys do not serialize") {
    // ADVICE r9: a map-wide mutex held across the compute body would make
    // key B's lookup wait for key A's multi-second training job. Prove the
    // body runs unlocked: while key A's body is parked, key B completes.
    val m = Memo.lru[String, Integer](8)
    val aEntered = new java.util.concurrent.CountDownLatch(1)
    val bDone = new java.util.concurrent.CountDownLatch(1)
    val ta = new Thread(() => {
      m.computeIfAbsent("a", _ => {
        aEntered.countDown()
        assert(bDone.await(5, java.util.concurrent.TimeUnit.SECONDS),
          "key B blocked behind key A's compute body")
        Integer.valueOf(1)
      })
    })
    ta.start()
    assert(aEntered.await(5, java.util.concurrent.TimeUnit.SECONDS))
    assert(m.computeIfAbsent("b", _ => Integer.valueOf(2)).intValue() === 2)
    bDone.countDown()
    ta.join(5000)
    assert(m.get("a").intValue() === 1)
  }

  test("same-key race keeps one stable winner") {
    val m = Memo.lru[String, Integer](8)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        results.add(m.computeIfAbsent("k", _ => {
          barrier.await(5, java.util.concurrent.TimeUnit.SECONDS)
          Integer.valueOf(i)
        }))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(5000))
    // both computes may run, but putIfAbsent keeps one winner: both callers
    // return the same value, and it is what the map holds afterwards
    val seen = results.toArray(new Array[Integer](0)).map(_.intValue()).toSet
    assert(seen.size === 1)
    assert(m.get("k").intValue() === seen.head)
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
