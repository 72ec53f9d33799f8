package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.orc.protobuf.{Descriptors, DynamicMessage}
import org.apache.orc.protobuf.DescriptorProtos._
import org.apache.orc.protobuf.DescriptorProtos.FieldDescriptorProto.{Label, Type}

import graft.io.Mpf

/** External cross-validation of the hand-rolled `.mpf` proto3 codec
  * against Google's own protobuf runtime — the SAME implementation the
  * reference's generated `proto_messages_pb2` drives (ref
  * io/protobuf/protobuf_utils.py:156-476). The sandbox has no protobuf
  * package for Python and no protoc, but orc-core ships the full shaded
  * Java runtime (`org.apache.orc.protobuf`), so the reference schema
  * (proto_messages.proto:9-111) is rebuilt here descriptor-by-descriptor
  * and exercised through `DynamicMessage` in both directions:
  *
  *   - our writer's bytes must parse under Google's parser with every
  *     field intact (write-path validation),
  *   - our writer must be byte-identical to Google's canonical proto3
  *     serialization of the same message (strongest form),
  *   - Google-serialized bytes must decode through `Mpf.fromBytes` to
  *     exactly the original message (read-path validation).
  *
  * This closes the r4/r5 "external validation blocked" carry item to the
  * extent possible without the reference's own Python writer: the wire
  * bytes are now pinned against the canonical implementation, not just
  * the independent pure-Python encoder fixtures of MpfSpec.
  */
class MpfExternalSpec extends AnyFunSuite {

  // ---- the reference schema, rebuilt as protobuf descriptors ------------

  private def fld(name: String, num: Int, tpe: Type,
      label: Label = Label.LABEL_OPTIONAL,
      typeName: String = null): FieldDescriptorProto = {
    val b = FieldDescriptorProto.newBuilder()
      .setName(name).setNumber(num).setType(tpe).setLabel(label)
    if (typeName != null) b.setTypeName(typeName)
    b.build()
  }

  private def msg(name: String, fields: FieldDescriptorProto*): DescriptorProto =
    fields.foldLeft(DescriptorProto.newBuilder().setName(name))(_ addField _).build()

  /** proto_messages.proto rebuilt field-for-field (same numbers, types,
    * labels; proto3 ⇒ repeated scalars packed by default, matching the
    * `[packed=true]` annotations).
    */
  private lazy val schema: Descriptors.FileDescriptor = {
    val fp = FileDescriptorProto.newBuilder()
      .setName("proto_messages.proto").setPackage("mpf").setSyntax("proto3")
      .addMessageType(msg("DoubleMatrix",
        fld("rows", 1, Type.TYPE_UINT64),
        fld("cols", 2, Type.TYPE_UINT64),
        fld("data", 3, Type.TYPE_DOUBLE, Label.LABEL_REPEATED)))
      .addMessageType(msg("IntMatrix",
        fld("rows", 1, Type.TYPE_UINT64),
        fld("cols", 2, Type.TYPE_UINT64),
        fld("data", 3, Type.TYPE_INT64, Label.LABEL_REPEATED)))
      .addMessageType(msg("Location",
        fld("row", 1, Type.TYPE_UINT64),
        fld("col", 2, Type.TYPE_UINT64)))
      .addMessageType(msg("Motif",
        fld("motifs", 1, Type.TYPE_MESSAGE, Label.LABEL_REPEATED, ".mpf.Location"),
        fld("neighbors", 2, Type.TYPE_MESSAGE, Label.LABEL_REPEATED, ".mpf.Location")))
      .addMessageType(msg("MatrixProfile",
        fld("mp", 1, Type.TYPE_MESSAGE, typeName = ".mpf.DoubleMatrix"),
        fld("pi", 2, Type.TYPE_MESSAGE, typeName = ".mpf.IntMatrix"),
        fld("lmp", 3, Type.TYPE_MESSAGE, typeName = ".mpf.DoubleMatrix"),
        fld("lpi", 4, Type.TYPE_MESSAGE, typeName = ".mpf.IntMatrix"),
        fld("rmp", 5, Type.TYPE_MESSAGE, typeName = ".mpf.DoubleMatrix"),
        fld("rpi", 6, Type.TYPE_MESSAGE, typeName = ".mpf.IntMatrix"),
        fld("ez", 9, Type.TYPE_UINT64),
        fld("join", 10, Type.TYPE_BOOL)))
      .addMessageType(msg("PanMatrixProfile",
        fld("pmp", 1, Type.TYPE_MESSAGE, typeName = ".mpf.DoubleMatrix"),
        fld("pmpi", 2, Type.TYPE_MESSAGE, typeName = ".mpf.IntMatrix")))
      .addMessageType(msg("MPFOutput",
        fld("klass", 1, Type.TYPE_STRING),
        fld("algorithm", 2, Type.TYPE_STRING),
        fld("metric", 3, Type.TYPE_STRING),
        fld("sample_pct", 4, Type.TYPE_DOUBLE),
        fld("windows", 5, Type.TYPE_UINT64, Label.LABEL_REPEATED),
        fld("ts", 6, Type.TYPE_MESSAGE, typeName = ".mpf.DoubleMatrix"),
        fld("query", 7, Type.TYPE_MESSAGE, typeName = ".mpf.DoubleMatrix"),
        fld("mp", 8, Type.TYPE_MESSAGE, typeName = ".mpf.MatrixProfile"),
        fld("pmp", 9, Type.TYPE_MESSAGE, typeName = ".mpf.PanMatrixProfile"),
        fld("motifs", 10, Type.TYPE_MESSAGE, Label.LABEL_REPEATED, ".mpf.Motif"),
        fld("discords", 11, Type.TYPE_MESSAGE, Label.LABEL_REPEATED, ".mpf.Location"),
        fld("cmp", 12, Type.TYPE_MESSAGE, typeName = ".mpf.DoubleMatrix"),
        fld("av", 13, Type.TYPE_MESSAGE, typeName = ".mpf.DoubleMatrix"),
        fld("av_type", 14, Type.TYPE_STRING)))
      .build()
    Descriptors.FileDescriptor.buildFrom(fp, Array.empty[Descriptors.FileDescriptor])
  }

  private def desc(name: String): Descriptors.Descriptor =
    schema.findMessageTypeByName(name)

  // ---- Mpf case classes → Google DynamicMessage mirror ------------------

  private def boxL(v: Long): AnyRef = java.lang.Long.valueOf(v)
  private def boxD(v: Double): AnyRef = java.lang.Double.valueOf(v)

  private def gDM(m: Mpf.DMatrix): DynamicMessage = {
    val d = desc("DoubleMatrix"); val b = DynamicMessage.newBuilder(d)
    b.setField(d.findFieldByName("rows"), boxL(m.rows))
    b.setField(d.findFieldByName("cols"), boxL(m.cols))
    m.data.foreach(v => b.addRepeatedField(d.findFieldByName("data"), boxD(v)))
    b.build()
  }
  private def gIM(m: Mpf.IMatrix): DynamicMessage = {
    val d = desc("IntMatrix"); val b = DynamicMessage.newBuilder(d)
    b.setField(d.findFieldByName("rows"), boxL(m.rows))
    b.setField(d.findFieldByName("cols"), boxL(m.cols))
    m.data.foreach(v => b.addRepeatedField(d.findFieldByName("data"), boxL(v)))
    b.build()
  }
  private def gLoc(l: Mpf.Location): DynamicMessage = {
    val d = desc("Location"); val b = DynamicMessage.newBuilder(d)
    b.setField(d.findFieldByName("row"), boxL(l.row))
    b.setField(d.findFieldByName("col"), boxL(l.col))
    b.build()
  }
  private def gMotif(m: Mpf.Motif): DynamicMessage = {
    val d = desc("Motif"); val b = DynamicMessage.newBuilder(d)
    m.motifs.foreach(l => b.addRepeatedField(d.findFieldByName("motifs"), gLoc(l)))
    m.neighbors.foreach(l => b.addRepeatedField(d.findFieldByName("neighbors"), gLoc(l)))
    b.build()
  }
  private def gMp(m: Mpf.MpMsg): DynamicMessage = {
    val d = desc("MatrixProfile"); val b = DynamicMessage.newBuilder(d)
    m.mp.foreach(x => b.setField(d.findFieldByName("mp"), gDM(x)))
    m.pi.foreach(x => b.setField(d.findFieldByName("pi"), gIM(x)))
    m.lmp.foreach(x => b.setField(d.findFieldByName("lmp"), gDM(x)))
    m.lpi.foreach(x => b.setField(d.findFieldByName("lpi"), gIM(x)))
    m.rmp.foreach(x => b.setField(d.findFieldByName("rmp"), gDM(x)))
    m.rpi.foreach(x => b.setField(d.findFieldByName("rpi"), gIM(x)))
    b.setField(d.findFieldByName("ez"), boxL(m.ez))
    b.setField(d.findFieldByName("join"), java.lang.Boolean.valueOf(m.join))
    b.build()
  }
  private def gPmp(p: Mpf.PmpMsg): DynamicMessage = {
    val d = desc("PanMatrixProfile"); val b = DynamicMessage.newBuilder(d)
    p.pmp.foreach(x => b.setField(d.findFieldByName("pmp"), gDM(x)))
    p.pmpi.foreach(x => b.setField(d.findFieldByName("pmpi"), gIM(x)))
    b.build()
  }
  private def gOut(o: Mpf.MpfOutput): DynamicMessage = {
    val d = desc("MPFOutput"); val b = DynamicMessage.newBuilder(d)
    b.setField(d.findFieldByName("klass"), o.klass)
    b.setField(d.findFieldByName("algorithm"), o.algorithm)
    b.setField(d.findFieldByName("metric"), o.metric)
    b.setField(d.findFieldByName("sample_pct"), boxD(o.samplePct))
    o.windows.foreach(w => b.addRepeatedField(d.findFieldByName("windows"), boxL(w)))
    o.ts.foreach(x => b.setField(d.findFieldByName("ts"), gDM(x)))
    o.query.foreach(x => b.setField(d.findFieldByName("query"), gDM(x)))
    o.mp.foreach(x => b.setField(d.findFieldByName("mp"), gMp(x)))
    o.pmp.foreach(x => b.setField(d.findFieldByName("pmp"), gPmp(x)))
    o.motifs.foreach(m => b.addRepeatedField(d.findFieldByName("motifs"), gMotif(m)))
    o.discords.foreach(l => b.addRepeatedField(d.findFieldByName("discords"), gLoc(l)))
    o.cmp.foreach(x => b.setField(d.findFieldByName("cmp"), gDM(x)))
    o.av.foreach(x => b.setField(d.findFieldByName("av"), gDM(x)))
    b.setField(d.findFieldByName("av_type"), o.avType)
    b.build()
  }

  // ---- deterministic sample messages ------------------------------------

  private def seq(seed: Int, len: Int): Array[Double] =
    Array.tabulate(len)(i => ((seed * 2654435761L + i * 40503L) % 1000).toDouble / 64.0)

  private val mpSample = Mpf.MpfOutput(
    klass = "MatrixProfile", algorithm = "mpx", metric = "euclidean",
    samplePct = 0.75, windows = Seq(8L),
    ts = Some(Mpf.DMatrix(32, 0, seq(1, 32))),
    query = Some(Mpf.DMatrix(16, 0, seq(2, 16))),
    mp = Some(Mpf.MpMsg(
      mp = Some(Mpf.DMatrix(25, 0, seq(3, 25))),
      pi = Some(Mpf.IMatrix(25, 0, Array.tabulate(25)(i => (i * 7 % 25).toLong))),
      lmp = Some(Mpf.DMatrix(25, 0, seq(4, 25))),
      lpi = Some(Mpf.IMatrix(25, 0, Array.tabulate(25)(_.toLong))),
      rmp = None, rpi = None, ez = 2L, join = true)),
    pmp = None,
    motifs = Seq(Mpf.Motif(
      Seq(Mpf.Location(3, 0), Mpf.Location(17, 0)), Seq(Mpf.Location(29, 0)))),
    discords = Seq(Mpf.Location(9, 0), Mpf.Location(41, 0)),
    cmp = Some(Mpf.DMatrix(25, 0, seq(5, 25))),
    av = Some(Mpf.DMatrix(25, 0, seq(6, 25))),
    avType = "complexity")

  private val pmpSample = Mpf.MpfOutput(
    klass = "PMP", algorithm = "skimp", metric = "pearson",
    samplePct = 1.0, windows = Seq(8L, 16L, 24L),
    ts = Some(Mpf.DMatrix(64, 0, seq(7, 64))),
    query = None,
    mp = None,
    pmp = Some(Mpf.PmpMsg(
      pmp = Some(Mpf.DMatrix(3, 57, seq(8, 171))),
      pmpi = Some(Mpf.IMatrix(3, 57, Array.tabulate(171)(i => (i % 57).toLong))))),
    motifs = Nil, discords = Nil, cmp = None, av = None, avType = "")

  /** Array-safe structural view (the case classes hold Arrays, whose ==
    * is reference equality).
    */
  private def dm(m: Option[Mpf.DMatrix]) = m.map(x => (x.rows, x.cols, x.data.toSeq))
  private def im(m: Option[Mpf.IMatrix]) = m.map(x => (x.rows, x.cols, x.data.toSeq))
  private def norm(o: Mpf.MpfOutput) = (
    o.klass, o.algorithm, o.metric, o.samplePct, o.windows,
    dm(o.ts), dm(o.query),
    o.mp.map(m => (dm(m.mp), im(m.pi), dm(m.lmp), im(m.lpi), dm(m.rmp),
      im(m.rpi), m.ez, m.join)),
    o.pmp.map(p => (dm(p.pmp), im(p.pmpi))),
    o.motifs, o.discords, dm(o.cmp), dm(o.av), o.avType)

  // ---- the gates ---------------------------------------------------------

  test("our MatrixProfile bytes are byte-identical to Google protobuf's " +
      "canonical proto3 serialization") {
    val ours = Mpf.toBytes(mpSample)
    val google = gOut(mpSample).toByteArray
    assert(java.util.Arrays.equals(ours, google),
      s"wire bytes diverge: ours=${ours.length}B google=${google.length}B")
  }

  test("our PMP bytes are byte-identical to Google protobuf's serialization") {
    val ours = Mpf.toBytes(pmpSample)
    val google = gOut(pmpSample).toByteArray
    assert(java.util.Arrays.equals(ours, google),
      s"wire bytes diverge: ours=${ours.length}B google=${google.length}B")
  }

  test("our writer's bytes parse under Google's parser with every field intact") {
    val parsed = DynamicMessage.parseFrom(desc("MPFOutput"), Mpf.toBytes(mpSample))
    assert(parsed == gOut(mpSample))
    val parsedPmp = DynamicMessage.parseFrom(desc("MPFOutput"), Mpf.toBytes(pmpSample))
    assert(parsedPmp == gOut(pmpSample))
  }

  test("Google-serialized bytes decode through Mpf.fromBytes exactly " +
      "(read-path cross-validation)") {
    assert(norm(Mpf.fromBytes(gOut(mpSample).toByteArray)) == norm(mpSample))
    assert(norm(Mpf.fromBytes(gOut(pmpSample).toByteArray)) == norm(pmpSample))
  }

  test("negative int64 survives both directions (10-byte varints)") {
    val withNeg = pmpSample.copy(pmp = Some(Mpf.PmpMsg(
      pmp = Some(Mpf.DMatrix(1, 3, Array(1.5, -2.5, 0.0))),
      pmpi = Some(Mpf.IMatrix(1, 3, Array(-1L, Long.MinValue, 42L))))))
    val ours = Mpf.toBytes(withNeg)
    val google = gOut(withNeg).toByteArray
    assert(java.util.Arrays.equals(ours, google))
    assert(norm(Mpf.fromBytes(google)) == norm(withNeg))
  }

  test("a directory of profiles WRITTEN BY GOOGLE'S RUNTIME scans back " +
      "through ProfileIO.readMpf's distributed binaryFile path intact") {
    // reference-shaped analyze outputs (ref tests/test_io.py:73-128: mp +
    // pmp + motifs + discords + av) serialized by DynamicMessage — the
    // canonical runtime, not our writer — into the one-profile-per-file
    // layout ProfileIO scans; the engine must decode every row equal to
    // the source messages without any file passing through the driver.
    val dir = java.nio.file.Files.createTempDirectory("graft_mpf_runtime")
    val msgs = (0 until 5).map { k =>
      val name = f"conv$k%03d__v__1m__w8"
      val m = mpSample.copy(
        mp = mpSample.mp.map(_.copy(
          mp = Some(Mpf.DMatrix(25, 0, seq(30 + k, 25))),
          pi = Some(Mpf.IMatrix(25, 0, Array.tabulate(25)(i => ((i + k) % 25).toLong))))))
      (name, m)
    } ++ (0 until 3).map { k =>
      val name = f"pan$k%03d__v__raw__w8"
      val p = pmpSample.copy(
        pmp = pmpSample.pmp.map(_.copy(
          pmp = Some(Mpf.DMatrix(3, 57, seq(60 + k, 171))))))
      (name, p)
    }
    msgs.foreach { case (name, m) =>
      java.nio.file.Files.write(dir.resolve(s"$name.mpf"), gOut(m).toByteArray)
    }

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-mpf-runtime-scan")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val rows = graft.run.ProfileIO.readMpf(spark, dir.toString).collect()
      def key(r: graft.schema.MpProfileRow) = (r.conv_id, r.kind, r.tier, r.w)
      def flat(r: graft.schema.MpProfileRow) = (key(r), r.ez, r.algorithm,
        r.metric, r.join, r.mp.toSeq, r.pi.toSeq, r.lmp.toSeq, r.lpi.toSeq,
        r.rmp.toSeq, r.rpi.toSeq)
      val expected = msgs.flatMap { case (name, m) =>
        val Array(conv, kind, tier, _) = name.split("__")
        Mpf.toProfileRows(m, conv, kind, tier)
      }
      // 5 MP files -> 1 row each; 3 PMP files -> one row per window (3)
      assert(rows.length == 5 + 3 * pmpSample.windows.length)
      assert(rows.map(flat).sortBy(_._1.toString()).toSeq ==
        expected.map(flat).sortBy(_._1.toString()).toSeq)
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("reference fixture (independent pure-Python encoder) parses under " +
      "Google's parser — the two external validators agree") {
    val in = getClass.getResourceAsStream("/ref/fixture_mp.mpf")
    require(in != null, "missing fixture")
    val bytes = try in.readAllBytes() finally in.close()
    val parsed = DynamicMessage.parseFrom(desc("MPFOutput"), bytes)
    val d = desc("MPFOutput")
    assert(parsed.getField(d.findFieldByName("klass")) == "MatrixProfile")
    assert(parsed.getField(d.findFieldByName("algorithm")) == "mpx")
    // and Google's parse agrees with OUR parse of the same fixture bytes
    val ours = Mpf.fromBytes(bytes)
    assert(java.util.Arrays.equals(gOut(ours).toByteArray, Mpf.toBytes(ours)))
  }
}
