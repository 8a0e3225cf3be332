package graft

import org.scalatest.Tag

/** Tag for tests whose runtime is dominated by deliberately degenerate
  * volume (e.g. a 10k-member LSH bucket emitting ~50.5 M pairs). Excluded
  * from the default `sbt test` run via `Test / testOptions` in build.sbt;
  * run them explicitly with
  * `sbt 'set Test/testOptions := Seq(); testOnly * -- -n graft.Slow'`
  * (the exclude filter must be cleared — ScalaTest lets `-l` veto `-n`).
  */
object Slow extends Tag("graft.Slow")
