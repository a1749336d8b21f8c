package graft.flights

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[DotEnv]] to python-decouple's `config()` behavior — the
  * reference's configuration surface (README.md:38-44 `.env` example). */
class DotEnvSpec extends AnyFunSuite {

  test("parses KEY = VALUE with trimming, comments, blanks, quotes") {
    val m = DotEnv.parse(
      """# file .env
        |PATH_FLIGHTS = path/to/data.csv
        |PATH_AIRPORT=  "quoted path.csv"
        |PATH_AIRLINE = 'single.csv'
        |
        |just words
        |EMBEDDED = a=b=c
        |""".stripMargin)
    assert(m("PATH_FLIGHTS") == "path/to/data.csv")
    assert(m("PATH_AIRPORT") == "quoted path.csv")
    assert(m("PATH_AIRLINE") == "single.csv")
    // value splits at the FIRST equals, like decouple
    assert(m("EMBEDDED") == "a=b=c")
    assert(!m.contains("just words"))
    assert(m.size == 4)
  }

  test("search order: process env wins over the .env file; missing raises") {
    val f = Files.createTempFile("graft_dotenv", ".env")
    Files.writeString(f, "SOME_GRAFT_KEY = from_file\nPATH = shadowed\n")
    try {
      // PATH is always set in the process env — env must win
      assert(DotEnv.config("PATH", f) == sys.env("PATH"))
      assert(DotEnv.config("SOME_GRAFT_KEY", f) == "from_file")
      intercept[NoSuchElementException] {
        DotEnv.config("GRAFT_DEFINITELY_UNDEFINED", f)
      }
    } finally Files.delete(f)
  }

  test("unreadable .env file degrades to env-only, not an IO error") {
    val missing = Paths.get("/nonexistent/graft/.env")
    assert(DotEnv.load(missing).isEmpty)
    assert(DotEnv.config("PATH", missing) == sys.env("PATH"))
  }
}
