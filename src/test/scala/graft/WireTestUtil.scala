package graft

import java.net.{InetAddress, ServerSocket}

/** Shared scaffolding for the wire-client chaos tests. */
object WireTestUtil {

  /** Rebind `port` with SO_REUSEADDR + a short retry: the killed
    * listener's socket can linger briefly and a BindException here
    * would be a test flake, not a finding. */
  def rebind(port: Int): ServerSocket = {
    var last: java.io.IOException = null
    var i = 0
    while (i < 50) {
      try {
        val s = new ServerSocket()
        s.setReuseAddress(true)
        s.bind(new java.net.InetSocketAddress(
          InetAddress.getLoopbackAddress, port), 16)
        return s
      } catch { case e: java.net.BindException => last = e; Thread.sleep(20) }
      i += 1
    }
    throw last
  }
}
