package graft.schema

import org.apache.spark.sql.types._

/** The reference's canonical 12-column Binance kline record
  * (`/root/reference/components/process_data.py:93-106`; header names
  * `components/btcusdt_ingest_data.py:37-41`). CSV ships header-less with
  * positional columns; `Open time`/`Close time` are epoch milliseconds.
  */
object KlineSchema {

  val names: Seq[String] = Seq(
    "Open time", "Open", "High", "Low", "Close", "Volume",
    "Close time", "Quote asset volume", "Number of trades",
    "Taker buy base asset volume", "Taker buy quote asset volume", "Ignore")

  val schema: StructType = StructType(Seq(
    StructField("Open time", LongType),
    StructField("Open", DoubleType),
    StructField("High", DoubleType),
    StructField("Low", DoubleType),
    StructField("Close", DoubleType),
    StructField("Volume", DoubleType),
    StructField("Close time", LongType),
    StructField("Quote asset volume", DoubleType),
    StructField("Number of trades", LongType),
    StructField("Taker buy base asset volume", DoubleType),
    StructField("Taker buy quote asset volume", DoubleType),
    // Binance ships "0" strings in some months (the reference's dead
    // header-fix code acknowledges it, btcusdt_ingest_data.py:51,66-74):
    // read as string, drop after ingest (SURVEY §4.3.4).
    StructField("Ignore", StringType)))

  /** Typed view for Dataset[Kline] use in tests. */
  case class Kline(
      openTime: Long, open: Double, high: Double, low: Double, close: Double,
      volume: Double, closeTime: Long, quoteVolume: Double, trades: Long,
      takerBase: Double, takerQuote: Double)
}
