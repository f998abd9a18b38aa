package graft.core

/** Host load sampling shared by the benchmark mains: this box is
  * co-tenanted and steal shows up in the guest's load average, so every
  * timing artifact records it instead of narrating it. */
object HostLoad {
  /** 1-minute load average (whole host, co-tenants included); -1 if
    * unreadable. */
  def load1: Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }
}
