package graft.sources

import java.net.URL

import org.scalatest.funsuite.AnyFunSuite

/** Redirect-hop policy: cross-protocol hops only ever UPGRADE. An
  * https:// URL 301-ing to http:// must be refused, not silently
  * followed onto plaintext (ADVICE r04); http→https and same-protocol
  * hops (absolute or relative Location) resolve normally. */
class HttpConnectSpec extends AnyFunSuite {

  test("http to https upgrade and same-protocol hops resolve") {
    assert(HttpConnect.nextHop(new URL("http://a.example/x"),
      "https://a.example/x").toString == "https://a.example/x")
    assert(HttpConnect.nextHop(new URL("http://a.example/x"),
      "/y").toString == "http://a.example/y")
    assert(HttpConnect.nextHop(new URL("https://a.example/x"),
      "https://b.example/z").toString == "https://b.example/z")
    // relative Location on an https URL stays https
    assert(HttpConnect.nextHop(new URL("https://a.example/x"),
      "y").toString == "https://a.example/y")
  }

  test("https to http downgrade is refused") {
    val e = intercept[java.io.IOException] {
      HttpConnect.nextHop(new URL("https://a.example/x"), "http://a.example/x")
    }
    assert(e.getMessage.contains("downgrade"))
  }
}
