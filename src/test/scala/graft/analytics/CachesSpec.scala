package graft.analytics

import java.util.concurrent.CountDownLatch

import graft.SparkSuite
import org.apache.spark.storage.StorageLevel

class CachesSpec extends SparkSuite {
  import spark.implicits._

  private def freshDf(tag: Int) = Seq(tag, tag + 1).toDF("n")

  test("scoped unpersists exactly the frames persisted inside it") {
    Caches.clear()
    val outside = Caches.persist(freshDf(0))
    outside.count()
    var inside: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      inside = Caches.persist(freshDf(10))
      inside.count()
      assert(inside.storageLevel != StorageLevel.NONE)
    }
    assert(inside.storageLevel == StorageLevel.NONE,
      "scope exit must unpersist its own frames")
    assert(outside.storageLevel != StorageLevel.NONE,
      "scope exit must not touch frames persisted outside it")
    Caches.clear()
    assert(outside.storageLevel == StorageLevel.NONE)
  }

  test("a concurrent pipeline's fresh caches survive another scope's exit " +
    "(two foreachBatch pipelines persisting in parallel)") {
    Caches.clear()
    // the co-resident pipeline lives on its own long-lived thread, started
    // BEFORE this scope opens (as streaming query threads are)
    val ready = new CountDownLatch(1)
    val go = new CountDownLatch(1)
    @volatile var other: org.apache.spark.sql.DataFrame = null
    val t = new Thread(() => {
      go.await()
      other = Caches.persist(freshDf(100))
      other.count()
      ready.countDown()
    })
    t.start()
    Caches.scoped {
      val mine = Caches.persist(freshDf(200))
      mine.count()
      go.countDown() // other pipeline persists WHILE this scope is open
      ready.await()
    }
    t.join()
    assert(other.storageLevel != StorageLevel.NONE,
      "the other pipeline's cache must survive this scope's exit")
    Caches.clear()
    assert(other.storageLevel == StorageLevel.NONE)
  }

  test("a thread SPAWNED inside a scope does not inherit it: its persists " +
    "register globally and the next clear() releases them (no orphaned " +
    "registry after the scope exits)") {
    Caches.clear()
    val go = new CountDownLatch(1)
    val done = new CountDownLatch(1)
    @volatile var child: org.apache.spark.sql.DataFrame = null
    var t: Thread = null
    Caches.scoped {
      // the streaming-query pattern: a long-lived worker thread created
      // INSIDE the scope that keeps persisting after the scope is gone
      t = new Thread(() => {
        go.await()
        child = Caches.persist(freshDf(500))
        child.count()
        done.countDown()
      })
      t.start()
    }
    // scope has exited and drained; the child persists only now
    go.countDown()
    done.await()
    t.join()
    assert(child.storageLevel != StorageLevel.NONE)
    Caches.clear()
    assert(child.storageLevel == StorageLevel.NONE,
      "child-thread persist must land in the global registry, not the " +
        "dead scope's queue")
  }

  test("scopes nest: the inner scope releases only its own frames") {
    Caches.clear()
    var outerDf: org.apache.spark.sql.DataFrame = null
    var innerDf: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      outerDf = Caches.persist(freshDf(300))
      outerDf.count()
      Caches.scoped {
        innerDf = Caches.persist(freshDf(400))
        innerDf.count()
      }
      assert(innerDf.storageLevel == StorageLevel.NONE)
      assert(outerDf.storageLevel != StorageLevel.NONE)
    }
    assert(outerDf.storageLevel == StorageLevel.NONE)
  }
}
