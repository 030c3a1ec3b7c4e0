package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention stamp must trip on NON-JVM contenders too
  * (r14 verdict #2): a python data-gen, DuckDB oracle, or compile job
  * contends without ever showing up in the live-JVM count. The widened
  * condition samples foreign processes' cpu time twice and flags any
  * burning > ~half a core — loadavg is recorded but deliberately not a
  * trip (back-to-back segment JVMs leave the 1-min average carrying
  * the PREVIOUS leg's own work, so a threshold on it would stamp every
  * healthy window contended). */
class HostContentionSpec extends AnyFunSuite {

  test("a foreign busy-loop process trips the contention stamp") {
    // sh is not java: invisible to the JVM count, caught by the
    // cpu-burn window. Spawned via ProcessBuilder => it IS a
    // descendant of this JVM... so re-parent it: sh forks a
    // grandchild and exits; the orphan is adopted by init and is no
    // longer in our family.
    val p = new ProcessBuilder("sh", "-c",
      "( while :; do :; done ) & echo $!").start()
    val pid = try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream)).readLine()
      p.waitFor()
      r.trim.toLong
    } finally p.destroy()
    try {
      // wait until the orphaned spinner is visibly outside our family
      val deadline = System.currentTimeMillis + 10000
      var s = HostContention.sample()
      while (s.busy.isEmpty && System.currentTimeMillis < deadline) {
        Thread.sleep(100)
        s = HostContention.sample()
      }
      assert(s.busy.nonEmpty,
        s"busy-loop pid $pid not caught: $s")
      assert(s.contended)
    } finally ProcessHandle.of(pid).ifPresent(_.destroyForcibly())
  }

  test("an idle host (modulo the spinner being gone) does not trip on " +
    "loadavg alone") {
    // loadavg may still be recovering from the suite's own work — the
    // sample must not flag contended unless a foreign process is
    // actually burning or a foreign JVM is alive. sbt's own JVM chain
    // is family; a CI runner with a sibling JVM would legitimately
    // trip, so only assert the NEGATIVE property loadavg-wise: the
    // stamp never trips with zero foreign JVMs and zero busy procs.
    val s = HostContention.sample()
    if (s.otherJvms == 0 && s.busy.isEmpty)
      assert(!s.contended, s"tripped with no contender: $s")
    assert(s.load >= -1.0) // loadavg recorded (or -1 sentinel)
  }
}
