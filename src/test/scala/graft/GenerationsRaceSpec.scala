package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The RACING-READER law for [[Generations]] — the concurrency
  * complement to GenerationSwapSpec's kill-point walk (which proves
  * every CRASH boundary leaves a complete directory served; this proves
  * every INTERLEAVING of publish / gcOld / vacuum with reader
  * resolution does too).
  *
  * The mechanism's operations are single FS calls with no shared driver
  * state, so "concurrency" is exactly step interleaving — which makes
  * the law checkable deterministically: scalacheck generates schedules
  * that splice reader actions (resolve now / verify a past resolution)
  * between the atomic steps of a writer program (stage, write data file
  * 1, write data file 2, commit, then sometimes gcOld or vacuum), and
  * every interleaving must satisfy:
  *
  *   1. SERVE-COMPLETE: at every step with ≥1 committed generation, the
  *      directory `currentDir` resolves is complete (both data files,
  *      content = its generation number) — an uncommitted staged dir is
  *      never visible, a half-written one never current.
  *   2. GRACE: a reader that resolved generation G can still read ALL
  *      of G's files at any later step, as long as at most ONE further
  *      commit has landed since (gcOld keeps current + previous — the
  *      in-flight-reader grace period). Two or more commits later the
  *      files MAY be gone; that is the documented bound, not a bug.
  *   3. VACUUM-CONTRACT: vacuum is the explicit "no readers older than
  *      the last commit" reclaim, so the model drops outstanding
  *      resolutions when it runs (exactly the operator rule its
  *      scaladoc states) — and the CURRENT generation must survive it.
  */
class GenerationsRaceSpec extends AnyFunSuite {

  private val BaseName = "data"

  sealed private trait Step
  private case object SStage extends Step
  private case object SWriteA extends Step
  private case object SWriteB extends Step
  private case object SCommit extends Step
  private case object SGcOld extends Step
  private case object SVacuum extends Step

  private def forSamples[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .foreach(body)
    }

  /** A schedule: per publish cycle a maintenance choice (0 = none,
    * 1 = gcOld, 2 = vacuum), plus reader-action insertion points.
    */
  private val genSchedule: Gen[(List[Int], List[Int])] = for {
    nCycles <- Gen.chooseNum(2, 6)
    gcs <- Gen.listOfN(nCycles, Gen.chooseNum(0, 2))
    nReaders <- Gen.chooseNum(2, 10)
    // each reader action picks the writer-step index it runs before
    slots <- Gen.listOfN(nReaders * 2, Gen.chooseNum(0, nCycles * 5))
  } yield (gcs, slots)

  private def complete(fs: FileSystem, dir: Path, gen: Long): Boolean = {
    def has(name: String): Boolean = {
      val p = new Path(dir, name)
      fs.exists(p) && {
        val in = fs.open(p)
        val buf = new Array[Byte](64)
        val n = in.read(buf); in.close()
        n > 0 && new String(buf, 0, n, "UTF-8") == s"gen=$gen"
      }
    }
    has("part-a.txt") && has("part-b.txt")
  }

  test("every publish/gc/vacuum interleaving serves complete generations (law)") {
    forSamples(genSchedule, 24) { case (gcs, slots) =>
      val root = new Path(
        java.nio.file.Files.createTempDirectory("graft-gen-race").toString)
      val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.mkdirs(root)

      // writer program: per cycle stage → write a → write b → commit →
      // one maintenance step (possibly a no-op placeholder to keep the
      // step indexing uniform for the schedule generator)
      val writerSteps: List[Step] = gcs.flatMap { g =>
        List(SStage, SWriteA, SWriteB, SCommit,
          g match { case 1 => SGcOld; case 2 => SVacuum; case _ => SStage })
      }
      // interpreter state
      var staged: Option[(Path, Long)] = None
      var commits = 0
      // outstanding reader resolutions: (dir, gen, commitsAtResolve)
      var pending = List.empty[(Path, Long, Int)]
      val byStep = slots.zipWithIndex.groupBy(_._1)

      def write(name: String): Unit = staged.foreach { case (dir, gen) =>
        val out = fs.create(new Path(dir, name), true)
        out.write(s"gen=$gen".getBytes("UTF-8")); out.close()
      }
      def readerActions(stepIdx: Int): Unit =
        byStep.getOrElse(stepIdx, Nil).foreach { case (_, readerIdx) =>
          if (readerIdx % 2 == 0) { // resolve
            if (commits > 0) {
              val g = Generations.currentGen(fs, root, BaseName)
              pending ::= ((Generations.currentDir(fs, root, BaseName), g, commits))
            }
          } else pending match { // verify the OLDEST outstanding resolution
            case Nil => ()
            case _ =>
              val (dir, gen, at) = pending.last
              pending = pending.dropRight(1)
              if (commits - at <= 1)
                assert(complete(fs, dir, gen),
                  s"reader resolved gen $gen at $at commits; at $commits commits " +
                    s"its directory $dir is incomplete (schedule gcs=$gcs slots=$slots)")
          }
        }

      writerSteps.zipWithIndex.foreach { case (step, i) =>
        readerActions(i)
        step match {
          case SStage if staged.isEmpty =>
            staged = Some(Generations.stage(fs, root, BaseName))
          case SStage => () // placeholder maintenance slot
          case SWriteA => write("part-a.txt")
          case SWriteB => write("part-b.txt")
          case SCommit =>
            staged.foreach { case (_, gen) =>
              Generations.commit(fs, root, BaseName, gen)
              commits += 1
            }
            staged = None
          case SGcOld => Generations.gcOld(fs, root, BaseName)
          case SVacuum =>
            // the operator contract: vacuum runs only when no reader can
            // be older than the last commit — outstanding resolutions end
            pending = Nil
            Generations.vacuum(fs, root, BaseName)
        }
        // SERVE-COMPLETE after every single step
        if (commits > 0) {
          val g = Generations.currentGen(fs, root, BaseName)
          assert(g > 0, s"current fell back to gen 0 after $commits commits")
          assert(complete(fs, Generations.currentDir(fs, root, BaseName), g),
            s"current gen $g incomplete after step $i (${writerSteps(i)}; " +
              s"gcs=$gcs slots=$slots)")
        }
      }
      // drain: every still-outstanding in-grace reader must verify
      pending.foreach { case (dir, gen, at) =>
        if (commits - at <= 1) assert(complete(fs, dir, gen))
      }
      fs.delete(root, true)
    }
  }
}
