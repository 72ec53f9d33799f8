package graft.run

import org.apache.spark.sql.{Dataset, Encoders, SaveMode, SparkSession}
import graft.io.Mpf
import graft.schema.MpProfileRow

/** Profile persistence (ref io/__io.py:40-245): JSON for interchange,
  * Parquet as the engine's binary format, and the reference's protobuf
  * `.mpf` for migration interop (read AND write — see graft.io.Mpf).
  * Format is inferred from the path extension like the reference's
  * to_disk/from_disk dispatch.
  */
object ProfileIO {

  def write(profiles: Dataset[MpProfileRow], path: String): Unit =
    if (path.endsWith(".json"))
      profiles.write.mode(SaveMode.Overwrite).json(path)
    else if (path.endsWith(".mpf"))
      writeMpf(profiles, path)
    else
      profiles.write.mode(SaveMode.Overwrite).parquet(path)

  def read(spark: SparkSession, path: String): Dataset[MpProfileRow] = {
    val enc = Encoders.product[MpProfileRow]
    if (path.endsWith(".mpf")) return readMpf(spark, path)
    val df =
      if (path.endsWith(".json")) spark.read.schema(enc.schema).json(path)
      else spark.read.parquet(path)
    df.as[MpProfileRow](enc)
  }

  /** Distributed `.mpf` scan: each file (one profile per file, the
    * reference's layout) is a `binaryFile` row decoded executor-side —
    * a directory of millions of migrated profiles never funnels through
    * the driver. `path` may be a single file or a directory (as written
    * by [[writeMpf]] — the exact path you wrote reads back). File names
    * written by this engine encode (conv, kind, tier, w) and are parsed
    * back; foreign names fall back to basename-as-conv_id with defaults.
    */
  def readMpf(spark: SparkSession, path: String): Dataset[MpProfileRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.mpf")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val base = p.substring(p.lastIndexOf('/') + 1).stripSuffix(".mpf")
        base.split("__") match {
          case Array(conv, kind, tier, _) =>
            Mpf.toProfileRows(Mpf.fromBytes(bytes), conv, kind, tier)
          case _ =>
            Mpf.toProfileRows(Mpf.fromBytes(bytes), convId = base)
        }
      }
  }

  /** Export to the reference's one-profile-per-file `.mpf` layout
    * (executor-local writes; `dir` must be a shared filesystem path, and
    * is used VERBATIM as the directory so read(write path) round-trips).
    * File names carry the full row key — a dataset with several rows per
    * conversation (kinds, tiers, windows) writes distinct files.
    */
  def writeMpf(profiles: Dataset[MpProfileRow], dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    profiles.foreachPartition { (it: Iterator[MpProfileRow]) =>
      it.foreach { r =>
        val o = fromProfileRow(r)
        Mpf.writeFile(s"$dir/${r.conv_id}__${r.kind}__${r.tier}__w${r.w}.mpf", o)
      }
    }
  }

  /** One profile row → MPFOutput (ts/query are not carried by profile
    * rows; the reference's from_mpf treats absent matrices as None).
    */
  def fromProfileRow(r: MpProfileRow): Mpf.MpfOutput = {
    def dm(a: Array[Double]): Option[Mpf.DMatrix] =
      if (a.isEmpty) None else Some(Mpf.DMatrix(a.length.toLong, 0L, a))
    def im(a: Array[Long]): Option[Mpf.IMatrix] =
      if (a.isEmpty) None else Some(Mpf.IMatrix(a.length.toLong, 0L, a))
    Mpf.MpfOutput(
      klass = "MatrixProfile", algorithm = r.algorithm, metric = r.metric,
      samplePct = 1.0, windows = Seq(r.w.toLong),
      ts = None, query = None,
      mp = Some(Mpf.MpMsg(dm(r.mp), im(r.pi), dm(r.lmp), im(r.lpi),
        dm(r.rmp), im(r.rpi), r.ez.toLong, r.join)),
      pmp = None, motifs = Seq.empty, discords = Seq.empty,
      cmp = None, av = None, avType = "")
  }
}
