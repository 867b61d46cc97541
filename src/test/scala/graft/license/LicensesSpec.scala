package graft.license

import org.scalatest.funsuite.AnyFunSuite

/** License-resolution tests, porting the semantics asserted in
  * common/licenses/test_licenses.py:35-233 (with the network
  * redirect/rewrite mocked to identity, as the reference tests do).
  * Pure-Scala — no Spark session needed. */
class LicensesSpec extends AnyFunSuite {

  private def info(url: String = null, lic: String = null, ver: String = null) =
    Licenses.getLicenseInfo(url, lic, ver) match {
      case (l, v, u) => (l.orNull, v.orNull, u.orNull)
    }

  test("valid URL wins over pair (test_licenses.py url-derived cases)") {
    assert(info("https://creativecommons.org/licenses/by/4.0/", "by-nc", "2.0") ==
      ("by", "4.0", "https://creativecommons.org/licenses/by/4.0"))
  }

  test("URL is lowercased and scheme-upgraded") {
    assert(info("HTTP://CreativeCommons.org/licenses/BY-SA/3.0/") ==
      ("by-sa", "3.0", "https://creativecommons.org/licenses/by-sa/3.0"))
  }

  test("schemeless URL accepted") {
    assert(info("creativecommons.org/publicdomain/zero/1.0/") ==
      ("cc0", "1.0", "https://creativecommons.org/publicdomain/zero/1.0"))
  }

  test("special-case paths map (constants.py:94-113)") {
    assert(info("https://creativecommons.org/publicdomain/mark/1.0/")._1 == "pdm")
    assert(info("https://creativecommons.org/licenses/mark/1.0/")._1 == "pdm")
    assert(info("https://creativecommons.org/licenses/by-nd-nc/1.0/")._1 == "by-nc-nd")
    assert(info("https://creativecommons.org/licenses/publicdomain/") ==
      ("publicdomain", "N/A", "https://creativecommons.org/licenses/publicdomain"))
  }

  test("non-CC netloc falls back to pair") {
    assert(info("https://example.com/licenses/by/4.0/", "by-sa", "2.0") ==
      ("by-sa", "2.0", "https://creativecommons.org/licenses/by-sa/2.0/"))
  }

  test("CC url without licenses|publicdomain falls back to pair") {
    assert(info("https://creativecommons.org/about/", "by", "4.0") ==
      ("by", "4.0", "https://creativecommons.org/licenses/by/4.0/"))
  }

  test("version cast: floats, ints, N/A (licenses.py:208-222)") {
    assert(Licenses.ensureVersionString("4") == Some("4.0"))
    assert(Licenses.ensureVersionString("4.0") == Some("4.0"))
    assert(Licenses.ensureVersionString("N/A") == Some("N/A"))
    assert(Licenses.ensureVersionString("junk") == None)
  }

  test("2.1 pair downgrades to unported 2.0 URL, keeps 2.1 version (constants.py:116-122)") {
    assert(info(null, "by-nc-sa", "2.1") ==
      ("by-nc-sa", "2.1", "https://creativecommons.org/licenses/by-nc-sa/2.0/"))
  }

  test("jurisdiction URLs resolve (constants.py:65-92)") {
    assert(info("https://creativecommons.org/licenses/by/2.1/jp/") ==
      ("by", "2.1", "https://creativecommons.org/licenses/by/2.1/jp"))
  }

  test("unknown pair and no URL yields all nulls") {
    assert(info(null, "not-a-license", "4.0") == (null, null, null))
    assert(info() == (null, null, null))
  }

  test("reverse map round-trip: every reversible pair rebuilds a resolvable URL") {
    Licenses.reverseLicensePathMap.foreach { case ((lic, ver), path) =>
      val url = Licenses.buildLicenseUrl(path)
      val (l2, _, _) = Licenses.infoFromUrl(url)
      assert(l2.isDefined, s"pair ($lic,$ver) -> $url did not resolve")
    }
  }
}
