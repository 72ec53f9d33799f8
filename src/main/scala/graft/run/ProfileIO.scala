package graft.run

import org.apache.spark.sql.{Dataset, Encoders, SaveMode, SparkSession}
import graft.schema.MpProfileRow

/** Profile persistence (ref io/__io.py:40-245): JSON for interchange,
  * Parquet as the binary format (replacing the reference's protobuf
  * `.mpf`). Format is inferred from the path extension like the
  * reference's to_disk/from_disk dispatch.
  */
object ProfileIO {

  def write(profiles: Dataset[MpProfileRow], path: String): Unit =
    if (path.endsWith(".json"))
      profiles.write.mode(SaveMode.Overwrite).json(path)
    else
      profiles.write.mode(SaveMode.Overwrite).parquet(path)

  def read(spark: SparkSession, path: String): Dataset[MpProfileRow] = {
    val enc = Encoders.product[MpProfileRow]
    val df =
      if (path.endsWith(".json")) spark.read.schema(enc.schema).json(path)
      else spark.read.parquet(path)
    df.as[MpProfileRow](enc)
  }
}
