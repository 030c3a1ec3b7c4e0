package graft

import java.nio.file.{Files, Paths}

/** Host-contention sampling for bench legs (r13 verdict #1, widened
  * per r14 verdict #2): a bench cannot stop other processes, but it
  * can refuse to pretend the host was quiet. Two trip conditions:
  *
  *   - another live JVM outside this process's own ancestor/descendant
  *     family (sbt forks the bench, so the parent chain is ours) — a
  *     JVM is presumed about-to-work even if idle at sample time;
  *   - any OTHER non-family process observed actually BURNING CPU
  *     (> ~50% of a core across a short two-point cpu-time window) —
  *     this catches the non-JVM contenders the JVM count is blind to
  *     (a python data-gen, a DuckDB oracle, a compiler).
  *
  * The 1-min loadavg is RECORDED in every sample but deliberately not
  * a trip condition: segmented windows run legs back-to-back, so at
  * every leg start the 1-min average still carries the PREVIOUS
  * segment's own 32-thread work — a loadavg threshold would stamp
  * every healthy window contended. The two-point cpu-time delta
  * measures who is burning cycles NOW, which is the question.
  */
object HostContention {

  /** One host sample. `busy` holds the (deduplicated, capped) command
    * paths of non-family processes caught burning CPU in the window. */
  final case class Sample(otherJvms: Int, load: Double,
                          busy: Seq[String]) {
    def contended: Boolean = otherJvms > 0 || busy.nonEmpty
  }

  /** Sample the host: count foreign live JVMs, read loadavg, and take
    * a two-point totalCpuDuration reading over `windowMs` to catch
    * foreign processes consuming > half a core. Never throws — a
    * bench must not die on a /proc hiccup. */
  def sample(windowMs: Long = 250L): Sample = {
    try {
      val self = ProcessHandle.current()
      val family = scala.collection.mutable.Set[Long](self.pid)
      var p = self.parent()
      while (p.isPresent) { family += p.get.pid; p = p.get.parent() }
      self.descendants().forEach(d => family += d.pid)
      var others = 0
      // pid -> (command, cpu millis at first reading)
      val first = scala.collection.mutable.Map[Long, (String, Long)]()
      ProcessHandle.allProcesses().forEach { h =>
        if (!family(h.pid)) {
          val info = h.info()
          val cmd = info.command().orElse("")
          if (cmd.endsWith("/java") || cmd == "java") others += 1
          val cpu = info.totalCpuDuration()
          if (cmd.nonEmpty && cpu.isPresent)
            first(h.pid) = (cmd, cpu.get.toMillis)
        }
      }
      Thread.sleep(windowMs)
      val burning = scala.collection.mutable.ListBuffer[String]()
      ProcessHandle.allProcesses().forEach { h =>
        first.get(h.pid).foreach { case (cmd, t0) =>
          val cpu = h.info().totalCpuDuration()
          if (cpu.isPresent && cpu.get.toMillis - t0 > windowMs / 2)
            burning += cmd
        }
      }
      val load =
        try Files.readString(Paths.get("/proc/loadavg"))
          .split(" ")(0).toDouble
        catch { case _: Throwable => -1.0 }
      Sample(others, load, burning.distinct.take(5).toSeq)
    } catch { case _: Throwable => Sample(0, -1.0, Seq.empty) }
  }
}
